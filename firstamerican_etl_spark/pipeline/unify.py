"""The unified merge (fa-etl.py:429-483) as one Spark plan.

ranked_valhist ⟕ prop (on PropertyID)
              ⟕ ranked_deed (PropertyID, Year = RecordingYear)
              ⟕ taxhist     (PropertyID, Year = TaxYear)
→ filter SaleAmt IS NOT NULL → drop helper columns.

Scale design (100 TB): every probe-side join keys on PropertyID, so the
valhist side shuffles once and the exchange is reused across J3-J5; the
trailing null-reject lets Catalyst's EliminateOuterJoin rewrite the deed
join to inner, shrinking the build side before the taxhist join. AQE
splits skewed PropertyIDs (dense counties) at runtime. Output is 17
columns (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Helper columns dropped before the final sink (fa-etl.py:480-481).
#: AssessmentUsed is already consumed inside valhist_long; the reference
#: lists it in the drop anyway (Polars ignores the missing name).
_DROP_COLS = [
    "PropertyClassID",
    "FATimeStamp",
    "SitusGeoStatusCode",
    "FIPS_SitusCensusTract",
    "AssessmentUsed",
]

#: The 17-column unified schema (SURVEY.md §1.4; scratch.ipynb cell-8).
MERGED_COLUMNS = [
    "PropertyID", "Year", "Value", "MarketTotalValue", "ApprTotalValue",
    "SitusLatitude", "SitusLongitude", "SitusFullStreetAddress", "SitusCity",
    "SitusState", "SitusZIP5", "FIPS", "SitusCensusTract", "SitusCensusBlock",
    "SaleAmt", "TaxAmt", "TaxAmtAdjusted",
]


def _assert_unique(df: DataFrame, keys: list[str], side: str) -> None:
    """Distributed uniqueness probe: one aggregation, early-outs on the
    first duplicate group (limit-1 under isEmpty), no driver collect."""
    dupes = df.groupBy(*keys).count().filter(F.col("count") > 1)
    if not dupes.isEmpty():
        raise ValueError(
            f"m:1 join validation failed: {side} side has duplicate {keys} keys"
        )


def unify(
    ranked_valhist: DataFrame,
    prop: DataFrame,
    ranked_deed: DataFrame,
    taxhist: DataFrame,
    broadcast_prop: bool = False,
    validate_m1: bool = False,
    shuffle_hash_builds: bool = True,
) -> DataFrame:
    """4-way left-join cascade + sale filter (fa-etl.py:459-482).

    ``broadcast_prop=True`` hints a broadcast-hash join for the prop
    side when a county's prop table fits in executor memory — the
    analogue of the reference's ``force_parallel=True`` (fa-etl.py:463),
    except Catalyst/AQE picks the strategy when the hint is absent.

    ``validate_m1=True`` promotes the reference's commented-out
    ``validate='m:1'`` (fa-etl.py:464) into a real assertion: every
    build side must be unique on its join key, otherwise the left
    joins would multiply valhist rows. Costs one aggregation per side;
    run it on first ingest of a new county, skip on trusted re-runs.

    ``shuffle_hash_builds`` (default on) hints SHUFFLE_HASH for the
    three build sides instead of Catalyst's sort-merge default. The
    r12 20M-property decade probe measured the merge's three SMJ
    sorts as its top cost — 15.3 s and a 7.25 GiB sorter spill on the
    quiet-host merge-only A/B vs 12.1 s and ZERO spill with the hints
    (identical 6,447,907 output rows; see BASELINE.md r12). SHJ is
    safe on exactly this shape, by construction: the build sides are
    the m:1-validated per-entity tables (unique on their join keys,
    so per-partition hash maps are bounded by build_bytes /
    shuffle_partitions and stay bounded as partitions scale with
    data), and FA skew lives on the valhist PROBE side, which SHJ
    streams (AQE's OptimizeSkewedJoin also covers SHJ since Spark
    3.2). Set False to fall back to Catalyst's choice for an
    un-validated ingest where a duplicate-key build side could
    otherwise blow a hash partition past executor memory."""
    if validate_m1:
        _assert_unique(prop, ["PropertyID"], "prop")
        _assert_unique(ranked_deed, ["PropertyID", "RecordingYear"], "ranked_deed")
        _assert_unique(taxhist, ["PropertyID", "TaxYear"], "taxhist")
    if shuffle_hash_builds:
        if not broadcast_prop:  # an explicit broadcast hint wins anyway
            prop = prop.hint("shuffle_hash")
        ranked_deed = ranked_deed.hint("shuffle_hash")
        taxhist = taxhist.hint("shuffle_hash")
    prop_side = F.broadcast(prop) if broadcast_prop else prop

    merged = (
        ranked_valhist.join(prop_side, on="PropertyID", how="left")
        .join(
            ranked_deed.withColumnRenamed("RecordingYear", "Year"),
            on=["PropertyID", "Year"],
            how="left",
        )
        .join(
            taxhist.withColumnRenamed("TaxYear", "Year"),
            on=["PropertyID", "Year"],
            how="left",
        )
        .filter(F.col("SaleAmt").isNotNull())
    )
    keep = [c for c in merged.columns if c not in _DROP_COLS]
    return merged.select(*keep)
