"""Brute-force Python references for the round-8 analytics operators.

The DuckDB oracle proves cross-ENGINE agreement; these prove the shared
FORMULA is the textbook one, by recomputing each statistic with plain
Python/numpy over the collected sf0.001 fixture (fixture-sized collects
are test-only — the operators themselves never collect data)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dataengineer_scripts_spark import registry

DEFS = registry.definitions()


def _rows(spark, sf_dir, name):
    return [r.asDict() for r in DEFS[name].fn(spark, sf_dir).collect()]


def _events(duck):
    return duck.execute(
        "SELECT event_id, user_id, ts, event_type, value FROM events"
    ).fetchall()


def test_gini_matches_sorted_formula(spark, duck, sf_dir):
    pairs = duck.execute(
        """SELECT c_mktsegment, o_totalprice FROM orders
           JOIN customer ON o_custkey = c_custkey"""
    ).fetchall()
    by_seg: dict[str, list[float]] = {}
    for seg, x in pairs:
        by_seg.setdefault(seg, []).append(x)
    got = {r["segment"]: r for r in _rows(spark, sf_dir, "x_agg_gini")}
    for seg, xs in by_seg.items():
        xs = sorted(xs)
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        expect = num / (n * sum(xs))
        assert got[seg]["n_orders"] == n
        assert got[seg]["gini"] == pytest.approx(expect, abs=2e-6)


def test_entropy_matches_shannon(spark, duck, sf_dir):
    counts: dict[int, dict[str, int]] = {}
    for _eid, uid, _ts, et, _v in _events(duck):
        counts.setdefault(uid, {}).setdefault(et, 0)
        counts[uid][et] += 1
    got = {r["user_id"]: r for r in _rows(spark, sf_dir, "x_agg_entropy")}
    for uid, c in counts.items():
        n = sum(c.values())
        expect = -sum((v / n) * math.log(v / n) for v in c.values())
        assert got[uid]["n_events"] == n
        assert got[uid]["n_types"] == len(c)
        assert got[uid]["entropy"] == pytest.approx(expect, abs=2e-6)
    # entropy is bounded by ln(#types)
    for r in got.values():
        assert -1e-9 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9


def test_twap_matches_interval_weighting(spark, duck, sf_dir):
    by_user_day: dict[tuple, list] = {}
    for eid, uid, ts, _et, v in _events(duck):
        by_user_day.setdefault((uid, ts.date()), []).append((ts, eid, v))
    got = {
        (r["user_id"], r["day"]): r
        for r in _rows(spark, sf_dir, "x_ts_time_weighted_avg")
    }
    checked = 0
    for (uid, day), evs in by_user_day.items():
        evs.sort()
        if len(evs) < 2:
            assert (uid, day) not in got
            continue
        wsum = tsum = 0.0
        for (t1, _e1, v1), (t2, _e2, _v2) in zip(evs, evs[1:]):
            dt = (t2 - t1).total_seconds() * 1e6
            wsum += v1 * dt
            tsum += dt
        r = got[(uid, day)]
        assert r["n_intervals"] == len(evs) - 1
        assert r["twap"] == pytest.approx(wsum / tsum, abs=2e-6)
        checked += 1
    assert checked > 0


def test_regression_stats_match_numpy(spark, duck, sf_dir):
    pairs = duck.execute(
        """SELECT c_mktsegment, c_acctbal, o_totalprice FROM orders
           JOIN customer ON o_custkey = c_custkey"""
    ).fetchall()
    by_seg: dict[str, list] = {}
    for seg, x, y in pairs:
        by_seg.setdefault(seg, []).append((x, y))
    got = {
        r["segment"]: r for r in _rows(spark, sf_dir, "x_agg_regression_stats")
    }
    for seg, xy in by_seg.items():
        x = np.array([a for a, _ in xy])
        y = np.array([b for _, b in xy])
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        assert got[seg]["n"] == len(xy)
        assert got[seg]["slope"] == pytest.approx(slope, abs=1e-6)
        assert got[seg]["intercept"] == pytest.approx(intercept, abs=1e-4)
        assert got[seg]["corr"] == pytest.approx(corr, abs=1e-6)


def test_bm25_matches_textbook_formula(spark, duck, sf_dir):
    from dataengineer_scripts_spark.operators.relevance import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
    )

    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in BM25_QUERY
    }
    got = {r["doc_id"]: r for r in _rows(spark, sf_dir, "x_llm_bm25_rank")}
    checked = 0
    for d, t in toks.items():
        score = 0.0
        hits = 0
        for q in BM25_QUERY:
            tf = t.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            score += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(t) / avgdl)
            )
        if hits == 0:
            assert d not in got
            continue
        assert got[d]["n_terms"] == hits
        assert got[d]["bm25"] == pytest.approx(score, abs=2e-6)
        checked += 1
    assert checked > 0


def test_bfs_depth_matches_python_bfs(spark, duck, sf_dir):
    from collections import deque

    from dataengineer_scripts_spark.operators.llm import (
        _cluster_labels,
        _ndup_pairs,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in _ndup_pairs(spark, sf_dir).collect()
    ]
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in _cluster_labels(spark, sf_dir).collect()
    }
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    depth = {d: 0 for d, c in labels.items() if d == c}
    frontier = deque(depth)
    while frontier:
        node = frontier.popleft()
        for nb in adj.get(node, ()):
            if nb not in depth:
                depth[nb] = depth[node] + 1
                frontier.append(nb)
    got = {
        r["doc_id"]: r["depth"]
        for r in _rows(spark, sf_dir, "x_llm_dedup_bfs_depth")
    }
    assert got == depth
    assert max(depth.values()) >= 1  # fixture has at least one real cluster


def test_weighted_sample_matches_python_reference(spark, duck, sf_dir):
    import hashlib

    from dataengineer_scripts_spark.operators.etl import WSAMPLE_K

    orders = duck.execute(
        "SELECT o_orderkey, o_totalprice FROM orders"
    ).fetchall()
    keyed = []
    for ok, price in orders:
        h = int(hashlib.md5(str(ok).encode()).hexdigest()[:13], 16)
        u = (float(h) + 1.0) / 4503599627370497.0
        keyed.append((round(-math.log(u) / price, 12), ok))
    keyed.sort()
    expect = {ok for _k, ok in keyed[:WSAMPLE_K]}
    got = _rows(spark, sf_dir, "x_etl_sample_weighted")
    assert {r["o_orderkey"] for r in got} == expect
    assert len(got) == WSAMPLE_K
