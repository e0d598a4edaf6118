#!/usr/bin/env python
"""Benchmark harness: wall-clock per registered query at a given scale factor.

Runs every operator in ``dataengineer_scripts_spark.registry`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "total_query_wall_clock", "value": <sum sec>, "unit": "sec",
     "queries": {"<id>": sec, ...}, "sf": 0.1}

The timed action is ``df.count()`` — forces the full plan (scans, shuffles,
joins, windows, Python stages) without driver-side materialization cost.
Per BASELINE.md §6 the first recorded run IS the baseline; later rounds must
stay within the driver's 2x envelope.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataengineer_scripts_spark import registry  # noqa: E402
from dataengineer_scripts_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])  # optional: bench just the named queries
    spark = get_spark("bench")

    qs = registry.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # Warm the JVM + parquet footers so q1 doesn't pay session startup,
    # and spawn the Arrow/pandas Python workers so the first Pandas-UDF or
    # Python-DataSource query isn't charged the interpreter+import cost
    # (measured ~1-5 s of pure attribution noise on the first such query).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "a int").mapInPandas(
        lambda it: it, "a int"
    ).count()
    # Warm the stub HTTP server + REST Python DataSource the same way:
    # whichever server-touching query sorts first otherwise absorbs the
    # one-time server boot + datasource planning (~4-5 s) as its "cost".
    try:
        from dataengineer_scripts_spark.operators.etl import _server
        from dataengineer_scripts_spark.sources.rest import login, rest_read

        api = _server(spark, sf_dir)
        rest_read(spark, api.base_url, login(api.base_url), limit=1).count()
    except Exception as ex:  # pragma: no cover - warmup must never fail the run
        print(f"# warmup(rest): skipped ({type(ex).__name__})", file=sys.stderr)

    # Per-query fault isolation: one raising operator must never null the
    # whole artifact — record the error, keep timing the rest, exit nonzero
    # at the end if anything failed.
    #
    # Between queries (OUTSIDE the timed window) drop leftover cached
    # blocks and force a full GC every few queries: with 87 queries in one
    # JVM, accumulated lineage/broadcast garbage otherwise erupts as a
    # 10-50 s full-GC pause inside whichever query happens to be running —
    # measured stalls moved between runs (fn_lower 50 s in one run, 4 s in
    # the next) until housekeeping was made explicit and untimed.
    gc_every = int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "8"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # stdout belongs to the ONE final JSON line (the driver parses it);
    # anything a query prints (snk_stdout_progress's progress sink, by
    # design) must land on stderr instead.
    with contextlib.redirect_stdout(sys.stderr):
        for idx, (name, fn) in enumerate(qs.items()):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                timings[name] = round(time.perf_counter() - t0, 3)
                print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
            except Exception as ex:  # noqa: BLE001
                errors[name] = f"{type(ex).__name__}: {str(ex)[:300]}"
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            if gc_every and (idx + 1) % gc_every == 0:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()

    out = {
        "metric": "total_query_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
