#!/usr/bin/env python
"""Measure the x_llm_ngram_lm_counts context-mass window bound (r10 #4).

The op's docstring argues its w1-partitioned window is safe at 100 TB
because one window partition = one word's distinct-successor set, whose
head size in public web-corpus counts is ~10^5-10^6 types (Google Web
1T) — "a sub-second single-task sort".  The fixture cannot demonstrate
this (synthetic 31-word vocabulary), and the 10x scale-stress corpus
grows the number of partitions, not their size.  This script measures
the claim DIRECTLY: synthesize a bigram-count table whose head word
carries N distinct successors (the worst single partition), run the
exact window+projection shape from the operator, and report wall per N.

Usage: python tools/ngram_window_bound.py [N ...]   # default 1e5 1e6 1e7
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from dataengineer_scripts_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark("ngram-window-bound")
    for n in sizes:
        # head word 'the' with n successor types, Zipf-ish counts, plus a
        # 99-word background tail so the exchange has real key spread.
        cb = spark.range(n).select(
            F.lit("the").alias("w1"),
            F.concat(F.lit("w"), F.col("id")).alias("w2"),
            (F.lit(10_000_000) / (F.col("id") + 1)).cast("bigint").alias("c_bigram"),
        ).unionByName(
            spark.range(n // 10).select(
                F.concat(F.lit("bg"), (F.col("id") % 99)).alias("w1"),
                F.concat(F.lit("w"), F.col("id")).alias("w2"),
                F.lit(3).cast("bigint").alias("c_bigram"),
            )
        ).localCheckpoint()  # isolate the window cost from the generate
        win = Window.partitionBy("w1")
        c_left = F.sum("c_bigram").over(win)
        t0 = time.perf_counter()
        out = cb.select(
            "w1",
            "w2",
            "c_bigram",
            c_left.cast("bigint").alias("c_left"),
            F.floor(F.col("c_bigram") * F.lit(1e6) / c_left + F.lit(0.5))
            .cast("bigint")
            .alias("cond_micro"),
        )
        # aggregate over the WINDOW OUTPUTS: a bare count() lets Catalyst
        # prune the unreferenced window expressions and measures nothing
        row = out.agg(
            F.count("*").alias("rows"), F.sum("cond_micro").alias("chk")
        ).collect()[0]
        print(
            f"head-successors={n:>9,}: window+project wall "
            f"{time.perf_counter() - t0:6.2f}s over {row['rows']:,} rows"
            f" (chk {row['chk']})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
