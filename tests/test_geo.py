"""Geo-family behavioral pins beyond the DuckDB oracles: grid-KNN
recall against the brute-force baseline, haversine metric sanity, and
Morton-code locality/bijectivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from firstamerican_etl_spark.plans.geoplans import (
    _haversine_km,
    geo_haversine_knn,
    geo_knn_grid_bucketed,
    morton_code,
)


def test_grid_knn_recall_vs_brute_force(spark, sf_dir):
    """The grid path is an *approximation by candidate pruning* — the
    density-independent invariant (the geo twin of the LSH exact-dup
    recall pin): (a) every brute-force top-5 neighbor that lies inside
    the query's 3×3 probe window MUST appear in the grid result with
    the identical rounded distance (the grid may only drop candidates
    the window already excludes), and (b) every grid row's distance
    must equal the independently recomputed haversine."""
    import math

    from firstamerican_etl_spark.plans.geoplans import (
        _CELL_DEG,
        _QPOINTS,
        geo_morton_bucket,  # noqa: F401 — import check
    )

    def syn(ck):
        return ((ck * 7919 % 18000) / 100.0 - 90.0, (ck * 104729 % 36000) / 100.0 - 180.0)

    def in_window(q_lat, q_lon, ck):
        lat, lon = syn(ck)
        return (
            abs(math.floor(lat / _CELL_DEG) - math.floor(q_lat / _CELL_DEG)) <= 1
            and abs(math.floor(lon / _CELL_DEG) - math.floor(q_lon / _CELL_DEG)) <= 1
        )

    def hav(q_lat, q_lon, ck):
        lat, lon = syn(ck)
        p1, l1, p2, l2 = map(math.radians, (q_lat, q_lon, lat, lon))
        a = (
            math.sin((p2 - p1) / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin((l2 - l1) / 2) ** 2
        )
        d = 2 * 6371.0 * math.asin(math.sqrt(a))
        return math.floor(d * 1000 + 0.5) / 1000

    qp = {i: (la, lo) for i, la, lo in _QPOINTS}
    brute = geo_haversine_knn(spark, sf_dir).collect()
    grid = {
        (r["q_id"], r["c_custkey"]): r["dist_km"]
        for r in geo_knn_grid_bucketed(spark, sf_dir).collect()
    }
    assert grid, "grid path returned nothing at test density"
    for r in brute:
        la, lo = qp[r["q_id"]]
        if in_window(la, lo, r["c_custkey"]):
            key = (r["q_id"], r["c_custkey"])
            assert key in grid and grid[key] == r["dist_km"], key
    for (qid, ck), d in grid.items():
        la, lo = qp[qid]
        assert abs(hav(la, lo, ck) - d) < 1e-6, (qid, ck)


def test_haversine_metric_sanity(spark):
    """d(p, p) = 0; symmetry; a known reference distance (equator
    1° of longitude ≈ 111.19 km on the R=6371 sphere)."""
    df = spark.createDataFrame(
        [(10.0, 20.0, 10.0, 20.0), (0.0, 0.0, 0.0, 1.0), (0.0, 1.0, 0.0, 0.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    rows = df.select(
        _haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("d")
    ).collect()
    assert rows[0]["d"] == 0.0
    assert abs(rows[1]["d"] - rows[2]["d"]) < 1e-9  # symmetry
    assert abs(rows[1]["d"] - 111.19) < 0.01


def test_morton_code_bijective_and_local(spark):
    """Every (ybin, xbin) pair in [0,256)² maps to a distinct code in
    [0, 65536) (bijectivity on a sampled sublattice), and a unit step
    in either dimension changes the code but keeps both coordinates
    recoverable — checked by de-interleaving the code back."""
    pairs = [(y, x) for y in range(0, 256, 17) for x in range(0, 256, 17)]
    df = spark.createDataFrame(pairs, "ybin long, xbin long")
    rows = df.select(
        "ybin", "xbin", morton_code(F.col("ybin"), F.col("xbin")).alias("m")
    ).collect()
    codes = {r["m"] for r in rows}
    assert len(codes) == len(pairs)  # injective on the sample
    for r in rows:
        m = r["m"]
        assert 0 <= m < 1 << 16
        y = sum(((m >> (2 * i + 1)) & 1) << i for i in range(8))
        x = sum(((m >> (2 * i)) & 1) << i for i in range(8))
        assert (y, x) == (r["ybin"], r["xbin"])
