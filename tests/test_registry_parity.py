"""Every registered operator with an oracle must hash-match DuckDB — the
local twin of the driver's CORRECTNESS gate (sf0.001 for speed; the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from dataengineer_scripts_spark import registry

from .oracle_utils import assert_matches_oracle

DEFS = registry.definitions()


@pytest.mark.parametrize("name", sorted(DEFS))
def test_operator(name, spark, duck, sf_dir):
    qd = DEFS[name]
    df = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
    else:
        assert_matches_oracle(df, duck, qd.oracle, name)


def test_type_guard_catches_uncast_integer_sum(spark, duck, sf_dir):
    """The r06 driver-hash failure class: DuckDB integer ``sum()`` returns
    HUGEINT (Arrow ``decimal128(38,0)``) while Spark returns ``bigint``;
    values compare equal at the Python level so only a type-level check can
    see it.  ``assert_matches_oracle`` must now flag an intentionally
    uncast sum — and pass once it is cast ``::BIGINT``."""
    import pyspark.sql.functions as F

    from dataengineer_scripts_spark.tables import table

    df = table(spark, sf_dir, "documents").agg(
        F.sum("n_chars").alias("s")
    )
    with pytest.raises(AssertionError, match="type-kind mismatch"):
        assert_matches_oracle(
            df, duck, "SELECT sum(n_chars) AS s FROM documents", "scratch"
        )
    assert_matches_oracle(
        df, duck, "SELECT sum(n_chars)::BIGINT AS s FROM documents", "scratch"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3
