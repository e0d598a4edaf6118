"""Salted-join skew splitting: a hot key's rows must spread across salt
partitions while the join result stays exactly equal to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_scripts_spark.operators.relational import salted_join


def test_salted_join_splits_hot_key(spark):
    n_salt = 8
    # 10_000 fact rows, 95% on ONE hot key.
    fact = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
    )
    dim = spark.createDataFrame(
        [(7, "hot"), (0, "cold0"), (20, "cold20")], "dk long, name string"
    )

    joined = salted_join(fact, dim, "k", "dk", n_salt=n_salt)

    # Correctness: identical to the plain join.
    plain = fact.join(dim, fact.k == dim.dk)
    assert joined.count() == plain.count()
    assert (
        joined.groupBy("k").count().orderBy("k").collect()
        == plain.groupBy("k").count().orderBy("k").collect()
    )

    # Skew splitting: the hot key occupies ALL n_salt salt buckets, with no
    # bucket holding more than ~2x its fair share.
    spread = (
        joined.filter(F.col("k") == 7).groupBy("_salt").count().collect()
    )
    hot_total = sum(r["count"] for r in spread)
    assert len(spread) == n_salt
    assert max(r["count"] for r in spread) < 2 * hot_total / n_salt
