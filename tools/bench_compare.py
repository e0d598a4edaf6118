#!/usr/bin/env python
"""Compare two bench artifacts on wall AND CPU seconds (r13 drift watch).

BASELINE.md's noise methodology distinguishes plan growth from
co-tenant/scheduling noise: a real regression moves CPU seconds with
wall; environmental drift inflates wall while CPU stays flat.  This
tool operationalizes the r14 watch item — given two BENCH_*.json files
(each with ``queries`` and optionally ``cpu_sec`` maps), it prints

- wall totals + ratio, CPU totals + ratio,
- the median per-query wall ratio (the robust envelope signal),
- the top movers by wall ratio among queries with base wall above a
  floor (default 0.3 s, the BASELINE threshold), annotated with each
  mover's CPU ratio so moving-victim stalls (wall up, CPU flat) are
  visible at a glance.

Usage::

    python tools/bench_compare.py BENCH_local_r12.json BENCH_local_r13.json
    python tools/bench_compare.py --floor 0.5 --top 10 OLD.json NEW.json

Exit code is always 0 — this is a diagnostic, not a gate; the action
threshold (solo re-measure any >1.5x mover) stays manual per the
BASELINE methodology (stalls move between victims, so an automated
gate on in-bench walls would flag noise).
"""

from __future__ import annotations

import argparse
import json
import re
import statistics


_TAIL_LINE = re.compile(r"# (\w+): ([0-9.]+)s \(cpu ([0-9.]+)s\)")


def _load(path: str) -> tuple[dict[str, float], dict[str, float]]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d.get("queries", {}), d.get("cpu_sec", {})
    # Driver-side BENCH_r*.json artifacts carry no per-query maps — only a
    # 2000-char stderr tail in which bench.py's per-query
    # ``# name: Ws (cpu Cs)`` lines survive (minus whatever the WARN noise
    # displaced).  Parsing the tail makes driver-vs-local comparison
    # possible for the queries the capture window kept (the r13 verdict's
    # drift item); the `queries: N common` header shows how partial it is.
    wall, cpu = {}, {}
    for name, w, c in _TAIL_LINE.findall(d.get("tail", "")):
        wall[name] = float(w)
        cpu[name] = float(c)
    return wall, cpu


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="min base wall (s) for the movers table")
    ap.add_argument("--top", type=int, default=8)
    args = ap.parse_args()

    w_old, c_old = _load(args.old)
    w_new, c_new = _load(args.new)
    common = sorted(set(w_old) & set(w_new))
    only_old = sorted(set(w_old) - set(w_new))
    only_new = sorted(set(w_new) - set(w_old))

    tw_old = sum(w_old[k] for k in common)
    tw_new = sum(w_new[k] for k in common)
    print(f"queries: {len(common)} common"
          + (f", {len(only_old)} only-old" if only_old else "")
          + (f", {len(only_new)} only-new" if only_new else ""))
    if not common or tw_old == 0:
        # pre-r06 artifacts store timings under a different key; nothing
        # comparable means nothing to ratio, not a traceback
        print("no comparable queries (missing/empty 'queries' maps) — "
              "are both files post-r06 bench artifacts?")
        return
    print(f"wall total:  {tw_old:8.1f} s -> {tw_new:8.1f} s"
          f"  ({tw_new / tw_old:.3f}x)")

    cpu_common = [k for k in common if k in c_old and k in c_new]
    if cpu_common:
        tc_old = sum(c_old[k] for k in cpu_common)
        tc_new = sum(c_new[k] for k in cpu_common)
        ratio = f"{tc_new / tc_old:.3f}x" if tc_old > 0 else "n/a"
        print(f"cpu total:   {tc_old:8.1f} s -> {tc_new:8.1f} s"
              f"  ({ratio} over {len(cpu_common)} queries)")

    ratios = [w_new[k] / w_old[k] for k in common if w_old[k] > 0]
    if ratios:
        print(f"median per-query wall ratio: {statistics.median(ratios):.3f}")

    movers = sorted(
        (k for k in common if w_old[k] >= args.floor and w_old[k] > 0),
        key=lambda k: w_new[k] / w_old[k],
        reverse=True,
    )[: args.top]
    if movers:
        print(f"\ntop wall movers (base >= {args.floor} s):")
        print(f"{'op':40s} {'old':>7s} {'new':>7s} {'wall':>6s} {'cpu':>6s}")
        for k in movers:
            cr = (
                f"{c_new[k] / c_old[k]:5.2f}x"
                if k in c_old and k in c_new and c_old[k] > 0
                else "   n/a"
            )
            print(f"{k:40s} {w_old[k]:6.2f}s {w_new[k]:6.2f}s"
                  f" {w_new[k] / w_old[k]:5.2f}x {cr}")


if __name__ == "__main__":
    main()
