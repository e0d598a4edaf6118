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


def test_real_codec_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


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
