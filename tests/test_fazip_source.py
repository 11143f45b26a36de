"""Custom fazip DataSource: zipped pipe-CSV read distributed across
zip members, equal to the unzip-then-read path."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def zipped_deeds(tmp_path_factory):
    d = tmp_path_factory.mktemp("fazip")
    header = "PropertyID|SaleAmt|FIPS"
    files = {
        "Deed36061": ["1|100|36061", "2|200|36061", "3||36061"],
        "Deed06037": ["10|500|6037", "11|600|6037"],
    }
    for name, rows in files.items():
        txt = d / f"{name}.txt"
        txt.write_text(header + "\n" + "\n".join(rows) + "\n")
        with zipfile.ZipFile(d / f"{name}.txt.zip", "w") as zf:
            zf.write(txt, arcname=f"{name}.txt")
        os.remove(txt)
    return str(d)


def test_fazip_reads_all_members(spark, zipped_deeds):
    from firstamerican_etl_spark.sources.fazip import FaZipDataSource

    spark.dataSource.register(FaZipDataSource)
    df = (
        spark.read.format("fazip")
        .option("path", os.path.join(zipped_deeds, "*.txt.zip"))
        .load()
    )
    assert df.columns == ["PropertyID", "SaleAmt", "FIPS"]
    rows = {r["PropertyID"]: r for r in df.collect()}
    assert len(rows) == 5
    assert rows["10"]["SaleAmt"] == "500"
    assert rows["3"]["SaleAmt"] is None  # empty cell -> null
    # one partition per zip member -> parallel decompress
    assert df.rdd.getNumPartitions() == 2
    # composes with the engine's clean transforms
    cleaned = df.filter(F.col("SaleAmt").cast("long") > 150)
    assert cleaned.count() == 3
