"""Source/sink round-trip contracts: a table written through each
supported sink and read back must be value-identical and keep its
schema. Covers orc (write_orc/read_orc), csv (read_csv with explicit
schema), and partitioned parquet re-read."""

from __future__ import annotations

from pyspark.sql import functions as F

from firstamerican_etl_spark.sources.io import (
    load_table,
    read_csv,
    read_orc,
    write_orc,
    write_parquet,
)


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(o, path)
    back = read_orc(spark, path)
    assert back.schema == o.schema
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(o, "n_nationkey")


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(o, path)
    q = read_orc(spark, path).filter(F.col("o_orderkey") == 5)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:200]


def test_csv_roundtrip_pipe_delimited(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    n.write.mode("overwrite").option("sep", "|").option("header", True).csv(path)
    back = read_csv(spark, path, schema=n.schema)
    assert back.schema == n.schema
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(n, "n_nationkey")


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_part")
    write_parquet(c, path, partition_by=["c_mktsegment"])
    back = spark.read.parquet(path).select(*c.columns)
    assert sorted(back.columns) == sorted(c.columns)
    assert back.count() == c.count()
