"""Graph operators: connected components over a candidate-pair edge
set — the clustering step every near-dup pipeline needs between
pair-finding and survivor selection.

Min-label propagation as a driver loop of join+min rounds, each round
``localCheckpoint``-ed so the plan stays O(1) deep (without it the
lineage doubles per round and Catalyst re-optimizes an exponentially
growing tree). Iterations needed = graph diameter; near-dup clusters
are small and dense, so convergence is 2-4 rounds in practice. At web
scale the same loop with alternating large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond")
bounds rounds at O(log n) — the loop body below is the primitive both
variants share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MIN node
    id of its component. Returns (node, label); nodes that appear in
    no pair are absent (callers treat them as their own singleton
    component). The pair edge set is localCheckpoint-ed eagerly so the
    (possibly expensive) pair-mining plan runs exactly once, not once
    per propagation round.

    CONVERGENCE CONTRACT: the loop runs until a fixed point (the
    per-round label checksum stops moving) and raises RuntimeError if
    ``max_rounds`` is exhausted while labels are still changing —
    silently returning unconverged labels would hand downstream
    consumers (leakage-safe split assignment, survivorship reports)
    wrong cluster ids with no error raised. Rounds needed = graph
    diameter; a duplicate chain with diameter > 50 (pathological for
    near-dup graphs, whose clusters are dense) should be clustered
    with large-star/small-star contraction instead — raise the cap
    explicitly if that topology is genuinely expected."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )

    def checksum(lbls: DataFrame) -> int:
        # labels only ever DECREASE pointwise, so the label sum is
        # strictly monotone under change: equal sums ⟺ converged.
        # One cheap aggregate over the just-checkpointed frame — no
        # per-round old-vs-new join probe.
        # decimal accumulation: exact and overflow-free for any node
        # count (an int64 sum could overflow — ANSI would throw)
        row = lbls.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s")).first()
        return int(row["s"]) if row["s"] is not None else 0

    prev_sum = checksum(labels)
    converged = False
    for _ in range(max_rounds):
        msgs = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), F.col("label")
        )
        new_labels = (
            labels.select("node", "label")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        new_sum = checksum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds (labels still changing) — the pair graph's diameter "
            "exceeds the round cap; returning would yield wrong cluster "
            "ids. Raise max_rounds or switch to star-contraction."
        )
    return labels
