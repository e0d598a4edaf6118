"""Opt-in at-scale smoke of the derived-corpus stress harness (r11
verdict item 7): one command runs the corpus construction AND a scaling
probe, so ``tools/scale_stress.py`` cannot rot between rounds.

Deselected by default (``pytest.ini`` addopts); run with::

    python -m pytest -m scale tests/test_scale_stress_at_scale.py

Uses sf0.01 as the base (sf0.1 is the published-exponent run, too slow
for a smoke) and multipliers 1 and 3.  Asserts the invariants the
published exponents rest on — exactly-linear output rows — and a
LOOSE wall bound that catches a quadratic regression (9x at 3x data)
without flaking on shared-JVM noise."""

from __future__ import annotations

import shutil
import time

import pytest

from tests.conftest import SF_MED as BASE
from tests.conftest import load_scale_stress

scale_stress = load_scale_stress()
# one linear-by-construction op per replicated fact table: documents
# (minhash dedup) and events (sessionize)
OPS = ["x_llm_dedup_minhash", "x_win_sessionize"]


@pytest.mark.scale
def test_stress_harness_end_to_end(spark, tmp_path, monkeypatch):
    from dataengineer_scripts_spark import registry

    # own corpus root: never clobber a concurrent tools/scale_stress.py
    # run's corpora under .scale_stress/
    monkeypatch.setattr(scale_stress, "STRESS_DIR", str(tmp_path))
    qs = registry.queries()
    dirs = {}
    try:
        for m in (1, 3):
            dirs[m] = scale_stress.build_corpus(spark, BASE, m, force=True)
        for op in OPS:
            wall, rows = {}, {}
            for m in (1, 3):
                best = None
                for _ in range(2):  # min-of-2, the harness's noise policy
                    t0 = time.perf_counter()
                    n = qs[op](spark, dirs[m]).count()
                    best = min(best or 9e9, time.perf_counter() - t0)
                wall[m], rows[m] = best, n
            # the invariant the published exponents rest on
            assert rows[3] == 3 * rows[1], (op, rows)
            # loose anti-quadratic bound: linear ~3x, quadratic ~9x
            assert wall[3] < 7 * max(wall[1], 0.2), (op, wall)
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
