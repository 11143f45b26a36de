"""Real-codec decode path (VERDICT r2 'Next round' #8): pinned behind a
pillow-availability skip. In this container (no codec libs) the module
skips and `tests/test_multimodal.py::test_real_decoder_gated` pins the
loud NotImplementedError gate instead; anywhere pillow exists, these
tests verify the REAL path honors the same DECODE_SCHEMA contract as
the deterministic fake — decoded (not metadata) dimensions, mean pixel
value, payload crc32."""

from __future__ import annotations

import zlib

import pytest

PIL = pytest.importorskip("PIL")

from pyspark.sql import functions as F  # noqa: E402

from firstamerican_etl_spark.operators.multimodal import (  # noqa: E402
    ASSET_SCHEMA,
    DECODE_SCHEMA,
    decode_image_real,
)


def _png_bytes(width: int, height: int, value: int) -> bytes:
    import io

    from PIL import Image

    img = Image.new("RGB", (width, height), (value, value, value))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def png_assets(spark):
    rows = [
        (1, _png_bytes(4, 3, 0), {"format": "image/png", "width": 4, "height": 3, "n_bytes": 0}),
        (2, _png_bytes(8, 8, 255), {"format": "image/png", "width": 8, "height": 8, "n_bytes": 0}),
        (3, _png_bytes(2, 5, 128), {"format": "image/png", "width": 2, "height": 5, "n_bytes": 0}),
    ]
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def test_real_decode_schema_contract(png_assets):
    out = decode_image_real(png_assets)
    assert out.schema == DECODE_SCHEMA


def test_real_decode_values(png_assets):
    rows = {r["asset_id"]: r for r in decode_image_real(png_assets).collect()}
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in png_assets.collect()}
    expected = {1: (4, 3, 0.0), 2: (8, 8, 255.0), 3: (2, 5, 128.0)}
    assert set(rows) == set(expected)
    for aid, (w, h, mean) in expected.items():
        r = rows[aid]
        assert (r["width"], r["height"]) == (w, h)  # decoded, not meta
        assert r["mean_byte"] == pytest.approx(mean)
        assert r["n_bytes"] == len(payloads[aid])
        assert r["checksum"] == zlib.crc32(payloads[aid])
