"""Unit tests for tools/bench_compare.py — the drift-watch adjudication
tool.  Its numbers go straight into BASELINE.md's per-round drift
records, so its two loaders (detail-file queries map; driver-artifact
stderr-tail fallback) and ratio arithmetic get pinned here.  Pure
filesystem + stdout; no SparkSession."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "bench_compare.py",
    ),
)
bench_compare = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench_compare)


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)
    return str(path)


def test_load_prefers_queries_map(tmp_path):
    p = _write(tmp_path / "a.json", {
        "queries": {"q1": 1.5, "q2": 0.25},
        "cpu_sec": {"q1": 6.0, "q2": 0.5},
    })
    wall, cpu = bench_compare._load(p)
    assert wall == {"q1": 1.5, "q2": 0.25}
    assert cpu == {"q1": 6.0, "q2": 0.5}


def test_load_falls_back_to_stderr_tail(tmp_path):
    # driver-side BENCH_r*.json: no per-query maps, only the captured
    # stderr tail in which bench.py's per-query lines survive
    tail = (
        "...[truncated]...\n"
        "# x_agg_mode: 0.450s (cpu 1.20s)\n"
        "# some WARN noise line\n"
        "# join_point_lookup: 0.330s (cpu 0.90s)\n"
    )
    p = _write(tmp_path / "d.json", {"value": 281.6, "tail": tail})
    wall, cpu = bench_compare._load(p)
    assert wall == {"x_agg_mode": 0.45, "join_point_lookup": 0.33}
    assert cpu == {"x_agg_mode": 1.2, "join_point_lookup": 0.9}


def test_recap_lines_overwrite_identical_in_loop_values(tmp_path):
    # bench.py re-prints the slowest queries in a recap block with the
    # SAME format — the dict-keyed parse must keep one entry per op
    tail = (
        "# q1: 2.000s (cpu 8.00s)\n"
        "# --- slowest queries recap ---\n"
        "# q1: 2.000s (cpu 8.00s)\n"
    )
    p = _write(tmp_path / "d.json", {"tail": tail})
    wall, _ = bench_compare._load(p)
    assert wall == {"q1": 2.0}


def test_main_prints_ratios_and_movers(tmp_path, capsys, monkeypatch):
    old = _write(tmp_path / "old.json", {
        "queries": {"q1": 1.0, "q2": 0.5, "tiny": 0.1},
        "cpu_sec": {"q1": 4.0, "q2": 2.0, "tiny": 0.4},
    })
    new = _write(tmp_path / "new.json", {
        "queries": {"q1": 2.0, "q2": 0.5, "tiny": 0.4},
        "cpu_sec": {"q1": 8.0, "q2": 2.0, "tiny": 0.4},
    })
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", old, new])
    bench_compare.main()
    out = capsys.readouterr().out
    assert "queries: 3 common" in out
    # totals: 1.6 -> 2.9 over common queries
    assert "(1.812x)" in out
    assert "cpu total:" in out and "(1.625x over 3 queries)" in out
    # q1 doubled and is above the 0.3 s floor; tiny (4x) is below it
    lines = out.splitlines()
    movers = [ln for ln in lines if ln.startswith(("q1", "q2", "tiny"))]
    assert movers and movers[0].startswith("q1")
    assert " 2.00x" in movers[0] and " 2.00x" in movers[0]
    assert not any(ln.startswith("tiny") for ln in movers)


def test_main_handles_disjoint_files_without_traceback(tmp_path, capsys, monkeypatch):
    old = _write(tmp_path / "old.json", {"queries": {"a": 1.0}})
    new = _write(tmp_path / "new.json", {"queries": {"b": 1.0}})
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", old, new])
    bench_compare.main()
    out = capsys.readouterr().out
    assert "no comparable queries" in out
