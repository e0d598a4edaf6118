"""bench.py must preserve an unattended (grading-driver) detail file
before overwriting it — the r15 verdict asked for the round-start manual
``cp bench_detail.json BENCH_r{N}_driver_detail.json`` to be hardened into
the tool itself.  Pure-filesystem tests; no SparkSession."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)


def test_unattended_detail_is_backed_up(tmp_path, capsys):
    p = str(tmp_path / "bench_detail.json")
    _write(p, {"value": 281.6, "context": "unattended"})
    backup = bench._backup_foreign_detail(p)
    assert backup and os.path.exists(backup)
    assert json.load(open(backup))["value"] == 281.6
    # the run's wall value is in the name, so a reader can match the
    # backup to its BENCH_r{N}.json without opening files
    assert ".v281.6." in os.path.basename(backup)
    # idempotent: same content, same hash-keyed name, no duplicate —
    # and the preservation line prints only on the call that WROTE it
    assert "preserved unattended detail" in capsys.readouterr().err
    assert bench._backup_foreign_detail(p) == backup
    assert "preserved" not in capsys.readouterr().err


def test_pre_r16_detail_without_context_field_is_backed_up(tmp_path):
    # every detail written before the field existed must read as unattended
    p = str(tmp_path / "bench_detail.json")
    _write(p, {"value": 233.4, "queries": {}})
    assert bench._backup_foreign_detail(p)


def test_unparseable_detail_is_backed_up_not_crashed_on(tmp_path):
    p = str(tmp_path / "bench_detail.json")
    open(p, "w").write("{truncated")
    backup = bench._backup_foreign_detail(p)
    assert backup and open(backup).read() == "{truncated"


def test_local_detail_is_overwritten_without_backup(tmp_path):
    p = str(tmp_path / "bench_detail.json")
    _write(p, {"value": 230.0, "context": "local"})
    assert bench._backup_foreign_detail(p) is None
    assert list(tmp_path.iterdir()) == [tmp_path / "bench_detail.json"]


def test_missing_detail_is_a_noop(tmp_path):
    assert bench._backup_foreign_detail(str(tmp_path / "absent.json")) is None


def test_distinct_unattended_contents_get_distinct_backups(tmp_path):
    p = str(tmp_path / "bench_detail.json")
    _write(p, {"value": 281.6})
    b1 = bench._backup_foreign_detail(p)
    _write(p, {"value": 282.0})
    b2 = bench._backup_foreign_detail(p)
    assert b1 != b2 and os.path.exists(b1) and os.path.exists(b2)
