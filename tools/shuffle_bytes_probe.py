#!/usr/bin/env python
"""Shuffle-byte accounting for the two-phase exact-dedup family (r12
verdict item 4's "done" evidence).

The plan guard proves the corpus-wide exchange keys on ``xxhash64(text)``;
this measures the CONSEQUENCE: total shuffle-write bytes per document must
stay flat as the corpus grows (the stress replicas preserve the per-replica
duplicate structure, so duplicate rows — the only rows whose text ever
shuffles — scale exactly linearly with the corpus).  A text-keyed
single-phase groupBy would instead shuffle ~the full text volume, and any
super-linear growth here would expose a hidden corpus-sized text exchange.

Runs ``x_llm_dedup_exact`` and ``flagship_curation`` against the
``tools/scale_stress.py`` derived corpora at x1/x3/x10 of sf0.1, reading
per-stage ``shuffleWriteBytes`` from the Spark UI REST API (the engine
session normally disables the UI; this probe re-enables it for metrics).
Each op runs once per multiplier in a FRESH session so stage attribution
is exact and session-shared frames don't smear bytes across multipliers.

Usage::

    python tools/shuffle_bytes_probe.py            # writes scale_stress_r13_exact.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shuffle_write_bytes(spark) -> int:
    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    data = json.load(urllib.request.urlopen(url, timeout=30))
    return sum(s.get("shuffleWriteBytes", 0) for s in data)


def _run_one(op: str, sf_dir: str) -> dict:
    """One op in one fresh UI-enabled session: wall, rows, shuffle bytes."""
    from dataengineer_scripts_spark import registry
    from dataengineer_scripts_spark.session import builder

    spark = (
        builder(f"shuffle-probe-{op}")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        fn = registry.queries()[op]
        before = _shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        after = _shuffle_write_bytes(spark)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        return {
            "rows": n,
            "wall_sec": round(wall, 3),
            "shuffle_write_bytes": after - before,
            "n_docs": n_docs,
            "shuffle_bytes_per_doc": round((after - before) / n_docs, 2),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--multipliers", default="1,3,10")
    ap.add_argument("--ops", default="x_llm_dedup_exact,flagship_curation")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "scale_stress_r13_exact.json")
    )
    args = ap.parse_args()
    mults = [int(x) for x in args.multipliers.split(",")]
    ops = [x for x in args.ops.split(",") if x]

    # build corpora with the shared harness (one throwaway session)
    from dataengineer_scripts_spark.session import get_spark
    from tools import scale_stress

    spark = get_spark("shuffle-probe-corpus")
    dirs = {m: scale_stress.build_corpus(spark, args.base, m) for m in mults}
    spark.stop()

    out: dict[str, dict] = {op: {} for op in ops}
    for op in ops:
        for m in mults:
            out[op][f"x{m}"] = r = _run_one(op, dirs[m])
            print(f"# x{m} {op}: {r}", file=sys.stderr)

    result = {
        "base": args.base,
        "multipliers": mults,
        "ops": out,
        "note": (
            "shuffleWriteBytes via UI REST, fresh session per (op, "
            "multiplier); flat shuffle_bytes_per_doc across multipliers "
            "is the two-phase exact-dedup claim (text shuffles only for "
            "duplicate-bucket rows, which scale linearly with the corpus)"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: {m: v["shuffle_bytes_per_doc"] for m, v in d.items()} for k, d in out.items()}))


if __name__ == "__main__":
    main()
