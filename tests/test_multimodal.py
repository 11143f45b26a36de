"""Multimodal plumbing tests: binary columns survive the round trip,
mapInPandas batch shapes are right, stages chain, the explode
multiplies rows correctly, and the gated real decoder fails loudly.
(The oracle parity of the fake-decode math is covered by
tests/test_oracle.py via the registry.)"""

from __future__ import annotations

import math
import zlib

import pytest
from pyspark.sql import functions as F

from firstamerican_etl_spark.operators.multimodal import (
    decode_assets,
    decode_image_real,
    documents_as_assets,
    featurize,
    frame_sample,
    resize_assets,
)
from firstamerican_etl_spark.sources.io import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return documents_as_assets(load_table(spark, sf_dir, "documents"))


def test_binary_round_trip(spark, assets, tmp_path):
    """payload is a real BinaryType column and survives parquet."""
    path = str(tmp_path / "assets")
    assets.write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["payload"] == "binary"
    row = back.filter(F.col("asset_id") == 1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_stats_match_python(assets):
    got = {r["asset_id"]: r for r in decode_assets(assets).collect()}
    src = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    for aid, payload in list(src.items())[:50]:
        r = got[aid]
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == zlib.crc32(payload)
        assert r["mean_byte"] == pytest.approx(sum(payload) / len(payload))


def test_resize_composes(assets):
    """resize→resize chains (schema-stable) and is idempotent once
    under the max dim."""
    once = resize_assets(assets, max_dim=64)
    twice = resize_assets(once, max_dim=64)
    a = sorted((r["asset_id"], r["meta"]["width"], r["meta"]["n_bytes"]) for r in once.collect())
    b = sorted((r["asset_id"], r["meta"]["width"], r["meta"]["n_bytes"]) for r in twice.collect())
    assert a == b
    assert all(w <= 64 for _, w, _ in a)


def test_frame_sample_explodes(assets):
    frames = frame_sample(assets, frame_bytes=128, every=1)
    per_asset = {
        r["asset_id"]: r["n"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    for r in assets.select("asset_id", "meta.n_bytes").collect():
        assert per_asset[r["asset_id"]] == math.ceil(r["n_bytes"] / 128)


def test_featurize_deterministic_unit_range(assets):
    f1 = {r["asset_id"]: r["features"] for r in featurize(assets, dim=8).collect()}
    f2 = {r["asset_id"]: r["features"] for r in featurize(assets, dim=8).collect()}
    assert f1 == f2
    vec = f1[next(iter(f1))]
    assert len(vec) == 8 and all(0.0 <= v <= 1.0 for v in vec)


def test_real_decoder_gated(assets):
    with pytest.raises(NotImplementedError, match="pillow|codec"):
        decode_image_real(assets)


def test_minhash_np_variant_equals_jvm(spark, sf_dir):
    """The Arrow/numpy MinHash path must produce bit-identical
    signatures to the codegen'd aggregate formulation (int64 wraparound
    parity)."""
    from firstamerican_etl_spark.plans.dedupplans import (
        minhash_signatures,
        minhash_signatures_np,
    )
    from firstamerican_etl_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents")
    s_jvm = sorted(map(tuple, minhash_signatures(d).collect()))
    s_np = sorted(map(tuple, minhash_signatures_np(d).collect()))
    assert s_jvm == s_np
