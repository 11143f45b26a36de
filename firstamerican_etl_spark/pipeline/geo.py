"""Geographic standardization stage — the spatial-join validation the
reference PROMISES in its pipeline contract but never implements
("validates/standardizes the geographic elements using spatil [sic] join",
fa-etl.py:492; the staged Prop conversion stops at null-ing zero
coordinates and whitelisting SitusGeoStatusCode, fa-etl.py:168-174).

``standardize_geo`` point-in-polygon-joins each property's situs
coordinates against reference tract polygons and appends:

- ``GeoTractID``     — min id of the containing tract (LONG, null when
                       coordinates are missing or fall in no tract)
- ``SitusGeoMatch``  — 'V' validated (inside a tract), 'O' out-of-area
                       (coordinates present, no containing tract),
                       null when coordinates are missing

Physical shape: tract polygons are a metadata-sized DIMENSION, so both
derived tables broadcast — candidates via a broadcast hash join on the
point's grid cell, the exact ray cast via a second broadcast join on
tract id, then one (property, tract) aggregate whose ≤|edges| fan-out
collapses map-side. The property scan is never shuffled; at 100 TB the
stage costs one pass over Prop. Same plan as the oracled
``geo_point_in_polygon_join`` operator (plans/geoplans.py), which
value-pins the ray-cast kernel against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.sources.io import local_df

#: Default tracts: a 2×2 rectangle grid over the FA test fixture's
#: situs box (lat 34–35, lon −119 – −118; tools/fa_bench_data.py), in
#: integer centidegrees. Boundaries sit at x.5·10⁻³-degree offsets so
#: no fixture point lies exactly on an edge. Production callers pass
#: their real tract rings in the same (tract_id, [(x, y), ...]) shape.
FA_TRACTS: list[tuple[int, list[tuple[int, int]]]] = [
    (101, [(-11905, 3395), (-11850, 3395), (-11850, 3455), (-11905, 3455)]),
    (102, [(-11850, 3395), (-11795, 3395), (-11795, 3455), (-11850, 3455)]),
    (103, [(-11905, 3455), (-11850, 3455), (-11850, 3505), (-11905, 3505)]),
    (104, [(-11850, 3455), (-11795, 3455), (-11795, 3505), (-11850, 3505)]),
]

_CELL = 1000  # candidate grid edge, centidegrees

#: Sub-vertex lattice factor: property coordinates are snapped to an
#: int64 lattice of 1/(100·_Q) degree = 10⁻⁵ deg (~1.1 m) before the
#: crossing test, and ring vertices (centidegrees) are scaled by _Q
#: onto the same lattice. The test then runs on EXACT int64
#: arithmetic — the same kernel the oracled geo_point_in_polygon_join
#: value-pins against DuckDB — instead of floats, where a point within
#: float-rounding distance of an edge could classify differently from
#: the exact kernel. Residual approximation: the ≤5·10⁻⁶-degree
#: (~0.6 m) snap itself, which matters only for points genuinely ON a
#: tract boundary (where any assignment is defensible).
_Q = 1000


def load_tracts(path: str) -> list[tuple[int, list[tuple[int, int]]]]:
    """Load tract rings from a JSON file shaped
    ``[[tract_id, [[lon_centideg, lat_centideg], ...]], ...]`` —
    vertex coordinates are INTEGER centidegrees (deg × 100), rings in
    either orientation, no closing repeat vertex required. This is the
    production entry point for real tract polygons; the in-code
    ``FA_TRACTS`` default is a test fixture only."""
    import json

    with open(path) as f:
        raw = json.load(f)
    tracts: list[tuple[int, list[tuple[int, int]]]] = []
    for item in raw:
        tid, ring = item
        vs = [(int(x), int(y)) for x, y in ring]
        if len(vs) < 3:
            raise ValueError(f"tract {tid}: ring needs >=3 vertices")
        tracts.append((int(tid), vs))
    if not tracts:
        raise ValueError(f"no tract rings in {path}")
    return tracts


def standardize_geo(
    prop: DataFrame,
    tracts: list[tuple[int, list[tuple[int, int]]]] | None = None,
    lat_col: str = "SitusLatitude",
    lon_col: str = "SitusLongitude",
) -> DataFrame:
    """Append GeoTractID / SitusGeoMatch to ``prop`` via a broadcast
    point-in-polygon join against ``tracts`` (vertex coordinates in
    integer centidegrees, rings in either orientation, star-shaped or
    convex — any simple polygon works for the crossing-number test).
    Points are snapped to the 10⁻⁵-degree int64 lattice (see ``_Q``)
    so the crossing test is exact integer arithmetic."""
    spark: SparkSession = prop.sparkSession
    tracts = FA_TRACTS if tracts is None else tracts

    edges = [
        (
            t,
            vs[k][0] * _Q,
            vs[k][1] * _Q,
            vs[(k + 1) % len(vs)][0] * _Q,
            vs[(k + 1) % len(vs)][1] * _Q,
        )
        for t, vs in tracts
        for k in range(len(vs))
    ]
    cells = sorted(
        {
            (cx, cy, t)
            for t, vs in tracts
            for cx in range(
                min(x for x, _ in vs) // _CELL, max(x for x, _ in vs) // _CELL + 1
            )
            for cy in range(
                min(y for _, y in vs) // _CELL, max(y for _, y in vs) // _CELL + 1
            )
        }
    )
    edges_df = local_df(
        spark, edges, "tract_id INT, x1 LONG, y1 LONG, x2 LONG, y2 LONG"
    )
    cells_df = local_df(spark, cells, "cell_x INT, cell_y INT, tract_id INT")

    # stable row key for the re-join: PropertyID is unique in staged
    # Prop (fa-etl.py:164 filters null ids; m:1 uniqueness is asserted
    # downstream in unify), so the containment frame is keyed on it.
    # round-then-cast snaps onto the shared int64 lattice; everything
    # downstream is exact integer arithmetic.
    pts = prop.select(
        "PropertyID",
        F.round(F.col(lat_col) * (100.0 * _Q)).cast("long").alias("py"),
        F.round(F.col(lon_col) * (100.0 * _Q)).cast("long").alias("px"),
    ).filter(F.col("py").isNotNull() & F.col("px").isNotNull())

    cand = (
        pts.withColumn(
            "cell_x", F.floor(F.col("px") / (_CELL * _Q)).cast("int")
        )
        .withColumn(
            "cell_y", F.floor(F.col("py") / (_CELL * _Q)).cast("int")
        )
        .join(F.broadcast(cells_df), ["cell_x", "cell_y"])
    )
    straddle = (F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py"))
    t_num = (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1")) - (
        F.col("px") - F.col("x1")
    ) * (F.col("y2") - F.col("y1"))
    # sign COMPARISON, not a third multiplication: t_num*(y2-y1) is a
    # triple product of lattice-scaled int64s and a continent-sized
    # ring loaded via load_tracts could push it past 2^63 (silent wrap
    # under ANSI-off, throw under ANSI-on). t_num == 0 (point exactly
    # on the edge line) stays a non-crossing, as before.
    crossing = (
        straddle
        & (t_num != 0)
        & ((t_num > 0) == (F.col("y2") > F.col("y1")))
    )
    contained = (
        cand.join(F.broadcast(edges_df), "tract_id")
        .groupBy("PropertyID", "tract_id")
        .agg(F.sum(F.when(crossing, 1).otherwise(0)).alias("k"))
        .filter(F.col("k") % 2 == 1)
        .groupBy("PropertyID")
        .agg(F.min("tract_id").cast("long").alias("GeoTractID"))
    )

    # contained is |properties-in-a-tract|-sized — NOT metadata-sized —
    # so no broadcast hint: AQE picks broadcast for county-scale
    # batches and falls back to a shuffle join on a national backfill.
    out = prop.join(contained, "PropertyID", "left")
    has_coords = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    return out.withColumn(
        "SitusGeoMatch",
        F.when(~has_coords, F.lit(None).cast("string"))
        .when(F.col("GeoTractID").isNotNull(), F.lit("V"))
        .otherwise(F.lit("O")),
    )
