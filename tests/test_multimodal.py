"""Multimodal plumbing assertions beyond oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dataengineer_scripts_spark.operators.multimodal import (
    decode_image_real,
    x_mm_binary_decode,
)
from dataengineer_scripts_spark.tables import table
from pyspark.sql import functions as F


def test_decode_backend_dispatch():
    """Exercise whichever decode backend is installed: with PIL present,
    decode_image_real must decode a real (PPM) payload and the dispatch
    must still byte-fake undecodable payloads; without PIL it must raise
    the explicit NotImplementedError and the dispatch must byte-fake
    everything.  Either way _decode_geometry(text-bytes) is identical —
    the property the operator oracles rely on."""
    import dataengineer_scripts_spark.operators.multimodal as mm

    text_payload = b"not an image, just bytes"
    n = len(text_payload)
    assert mm._decode_geometry(text_payload) == (n % 640, (n * 7) % 480)

    # 2x3 binary PPM (P6), decodable by any real codec
    ppm = b"P6\n2 3\n255\n" + bytes(2 * 3 * 3)
    if mm._PILImage is not None:
        d = decode_image_real(ppm)
        assert (d["width"], d["height"]) == (2, 3)
        assert mm._decode_geometry(ppm) == (2, 3)
    else:
        with pytest.raises(NotImplementedError):
            decode_image_real(ppm)
        k = len(ppm)
        assert mm._decode_geometry(ppm) == (k % 640, (k * 7) % 480)


def test_binary_column_flows_as_binary_type(spark, sf_dir):
    df = table(spark, sf_dir, "documents").select(
        F.encode("text", "UTF-8").alias("img")
    )
    assert isinstance(df.schema["img"].dataType, T.BinaryType)


def test_decode_schema_and_empty_doc_null(spark, sf_dir):
    df = x_mm_binary_decode(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "mean_byte"]
    rows = df.filter(F.col("n_bytes") == 0).collect()
    assert all(r.mean_byte is None for r in rows)  # no NaN leakage
