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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3
