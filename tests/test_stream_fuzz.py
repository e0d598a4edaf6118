"""Differential fuzz for the streaming-window family (r17 verdict item 4).

The 12 ``x_stream_*`` ops were the last family with fixed-fixture-only
evidence: the TPC-H warehouse fuzz and the corpus fuzz both EXCLUDE the
``windows`` module (their batch-table randomization can't exercise the
micro-batch runtime, and the batch-mode oracles were considered pinned by
``test_streaming.py``'s fixture equivalence).  This file closes that blind
spot in two layers:

**Layer A — oracle parity on randomized event streams.**  Each seed
builds a random ``events`` table whose shapes the fixture never produces:

- duplicate timestamps, including same-(user, ts) pairs (ordering-tie
  probes for the argmax/lag tiebreaks);
- timestamps EXACTLY on tumbling/sliding window boundaries (midnight,
  12:00) — the ``[start, end)`` half-open-interval edge in both engines;
- session-gap boundary triples: a second event at exactly ``SESSION_GAP``
  and a third at gap − 1 µs — FIRST BLOOD: the maiden run caught the
  session oracle splitting at exactly-gap where Spark's ``session_window``
  merges TOUCHING windows (fixed to a strict ``>`` new-session test);
- a burst user (30 events in one minute), a singleton user, seeds with a
  missing event type (empty stream-stream-join side / empty groups);
- event_id assignment SHUFFLED so id order never accidentally encodes
  time order.

Every oracle-bearing ``windows.py`` op then runs through the driver's own
comparator — including the two ops that execute the REAL streaming
runtime inside their batch wrapper (``x_stream_upsert_materialize``'s
multi-micro-batch foreachBatch upsert and ``x_stream_rest_poll``'s
offset-tracked poll), so the micro-batch engine itself gets randomized
input under full value-hash parity.

**Layer B — micro-batch runtime equivalence on staged multi-batch
streams.**  Events are staged as explicit parquet files with pinned
mtimes (file-source arrival order = mtime order), covering what Layer A's
single-batch reads cannot: out-of-order ARRIVAL (arrival order ≠ event
time order), EMPTY micro-batches mid-stream, state continuity across
batches (session merge, stateful counts, stream-stream join buffers), and
append-mode watermark semantics with late arrivals STRADDLING the
watermark — rows into an evicted window must be dropped, equally-late
rows into a still-open window must be aggregated.

Seeds are pinned for reproducibility (same convention as the other two
fuzz batches).  Values are integer cents so double sums round identically
in both engines.
"""

from __future__ import annotations

import datetime as dt
import inspect
import os
import random

import pytest
from pyspark.sql import functions as F

from dataengineer_scripts_spark import registry
from dataengineer_scripts_spark.streaming.runtime import run_to_memory
from dataengineer_scripts_spark.streaming.windows import tumbling_counts
from dataengineer_scripts_spark.tables import table

from .conftest import make_duck
from .oracle_utils import assert_matches_oracle
from .test_tpch_fuzz import _write

DEFS = registry.definitions()

STREAM_IDS = sorted(
    name
    for name, d in DEFS.items()
    if inspect.unwrap(d.fn).__module__
    == "dataengineer_scripts_spark.streaming.windows"
    and d.oracle is not None
)


def test_stream_fuzz_enrollment_pinned():
    """Identity pin (stronger than the other batches' count pins — the
    family is small enough to list): every oracle-bearing windows.py op
    is enrolled; only the rows-only runtime smoke is excluded (it gets
    its own randomized gate below)."""
    assert STREAM_IDS == [
        "x_stream_dedup",
        "x_stream_join",
        "x_stream_rest_poll",
        "x_stream_session",
        "x_stream_sliding",
        "x_stream_stateful",
        "x_stream_stream_join",
        "x_stream_tumbling",
        "x_stream_upsert_materialize",
        "x_stream_watermark_late",
        "x_stream_windowed_topk",
    ]


_T0 = dt.datetime(2024, 1, 1)
_DAY_US = 24 * 3600 * 1_000_000
_GAP_US = 12 * 3600 * 1_000_000  # == windows.SESSION_GAP
_SPAN_DAYS = 14
_TYPES = ["click", "view", "purchase", "signup", "error"]

# State-store provider swap used by the RocksDB equivalence tests below.
# The session is shared, so every setter MUST unset the conf afterwards.
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _fuzz_event_cols(rng: random.Random) -> dict[str, tuple[str, list]]:
    """Random events with the streaming-hostile shapes listed in the
    module docstring.  Returns a column dict in the ``_write`` format."""
    types = list(_TYPES)
    if rng.random() < 0.4:
        # a missing type: empty join sides / empty groups on some seeds
        types.remove(rng.choice(["click", "purchase", "error"]))
    n_users = rng.randint(3, 12)
    stamps: list[dt.datetime] = []
    users: list[int] = []
    etypes: list[str] = []

    def add(off_us: int, uid: int | None = None, et: str | None = None):
        stamps.append(_T0 + dt.timedelta(microseconds=off_us))
        users.append(uid if uid is not None else rng.randrange(n_users))
        etypes.append(et if et is not None else rng.choice(types))

    for _ in range(rng.randint(120, 260)):
        add(rng.randrange(_SPAN_DAYS * _DAY_US))
    # exact tumbling/sliding boundary stamps (midnight / 12:00), with
    # duplicates AT the boundary
    for _ in range(rng.randint(4, 10)):
        off = rng.randrange(_SPAN_DAYS) * _DAY_US + rng.choice([0, _GAP_US])
        for _ in range(rng.randint(1, 3)):
            add(off)
    # same-(user, ts) duplicate pairs — distinct event_ids break the tie
    for _ in range(rng.randint(3, 8)):
        off = rng.randrange(_SPAN_DAYS * _DAY_US)
        uid = rng.randrange(n_users)
        add(off, uid)
        add(off, uid)
    # session-gap boundary triples: +gap exactly (MERGES — Spark's
    # session_window joins touching windows; the maiden run caught the
    # oracle splitting here), then +gap−1µs from the second (also merges)
    for _ in range(rng.randint(2, 5)):
        off = rng.randrange((_SPAN_DAYS - 2) * _DAY_US)
        uid = rng.randrange(n_users)
        add(off, uid)
        add(off + _GAP_US, uid)
        add(off + _GAP_US + _GAP_US - 1, uid)
    # burst user: 30 events inside one minute
    uid = rng.randrange(n_users)
    off = rng.randrange(_SPAN_DAYS * _DAY_US)
    for _ in range(30):
        add(off + rng.randrange(60_000_000), uid)
    # singleton user (an id never drawn above)
    add(rng.randrange(_SPAN_DAYS * _DAY_US), n_users)

    n = len(stamps)
    ids = list(range(n))
    rng.shuffle(ids)
    return {
        "event_id": ("i64", ids),
        "ts": ("ts", stamps),
        "user_id": ("i64", users),
        "event_type": ("str", etypes),
        "value": ("f64", [rng.randint(1, 50000) / 100.0 for _ in range(n)]),
        "props": ("str", ['{"k": %d}' % rng.randint(0, 99) for _ in range(n)]),
    }


def _build_stream_warehouse(rng: random.Random, sf: str) -> None:
    _write(sf, "events", _fuzz_event_cols(rng))
    # everything else is either a static dim (customer for the
    # stream-static join, nation for the REST poll listing) or irrelevant
    # — symlink the fixture so the DuckDB view set binds
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        os.symlink(
            f"/root/testdata/sf0.001/{name}.parquet", f"{sf}/{name}.parquet"
        )


# ---------------------------------------------------------------------
# Layer A: oracle parity on randomized events
# ---------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0x57A0, 0x57A1, 0x57A2])
def test_stream_suite_matches_oracle_on_random_events(spark, tmp_path, seed):
    sf = str(tmp_path)
    _build_stream_warehouse(random.Random(seed), sf)
    con = make_duck(sf)
    try:
        nonempty = 0
        for name in STREAM_IDS:
            df = DEFS[name].fn(spark, sf)
            assert_matches_oracle(df, con, DEFS[name].oracle, name)
            nonempty += bool(df.head(1))
        # empty results still compare above (they are the point for the
        # missing-type seeds) — but never for most of the family
        assert nonempty >= len(STREAM_IDS) - 2, (
            f"seed {seed}: only {nonempty}/{len(STREAM_IDS)} non-empty"
        )
    finally:
        con.close()


def _adv_one_timestamp(rng: random.Random, sf: str) -> None:
    """150 events all at ONE timestamp — and that timestamp an exact
    midnight window boundary: one tumbling window, two sliding windows,
    every session a simultaneous pile, zero-duration everything."""
    _build_stream_warehouse(rng, sf)
    n = 150
    stamp = _T0 + dt.timedelta(days=3)
    _write(sf, "events", {
        "event_id": ("i64", list(range(n))),
        "ts": ("ts", [stamp] * n),
        "user_id": ("i64", [rng.randrange(5) for _ in range(n)]),
        "event_type": ("str", [rng.choice(_TYPES) for _ in range(n)]),
        "value": ("f64", [rng.randint(1, 50000) / 100.0 for _ in range(n)]),
        "props": ("str", ['{"k": 1}'] * n),
    })


def _adv_empty_events(rng: random.Random, sf: str) -> None:
    """Zero events: every window op's empty-input branch, including the
    two real-runtime ops (a stream whose every micro-batch is empty)."""
    _build_stream_warehouse(rng, sf)
    _write(sf, "events", {
        "event_id": ("i64", []),
        "ts": ("ts", []),
        "user_id": ("i64", []),
        "event_type": ("str", []),
        "value": ("f64", []),
        "props": ("str", []),
    })


@pytest.mark.parametrize(
    "shape",
    [_adv_one_timestamp, _adv_empty_events],
    ids=["one_timestamp_events", "empty_events"],
)
def test_stream_suite_survives_adversarial_events(spark, tmp_path, shape):
    sf = str(tmp_path)
    shape(random.Random(0x5ADF), sf)
    con = make_duck(sf)
    try:
        for name in STREAM_IDS:
            df = DEFS[name].fn(spark, sf)
            assert_matches_oracle(df, con, DEFS[name].oracle, name)
    finally:
        con.close()


def test_stream_smoke_finalized_windows_match_batch_on_random_events(
    spark, tmp_path
):
    """Randomized gate for the rows-only runtime smoke: the append-mode
    windows it emits must be EXACTLY the batch tumbling aggregate
    restricted to windows fully below the final watermark (max event
    time − 1 h), with the frontier withheld."""
    sf = str(tmp_path)
    _build_stream_warehouse(random.Random(0x57A0), sf)
    got = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in DEFS["x_stream_smoke"].fn(spark, sf).collect()
    }
    events = table(spark, sf, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=1)
    want = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in tumbling_counts(events).collect()
        if r.window_end <= wm
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------
# Layer B: micro-batch runtime equivalence on staged multi-batch streams
# ---------------------------------------------------------------------


def _stage_batches(
    d: str, cols: dict[str, tuple[str, list]], parts: list[list[int]]
) -> None:
    """Write each row-index subset as its own parquet file with strictly
    increasing mtimes — the file stream source processes files oldest
    mtime first, so ``parts`` order IS micro-batch arrival order.  An
    empty index list stages an EMPTY micro-batch."""
    os.makedirs(d, exist_ok=True)
    t = 1_700_000_000
    for i, idx in enumerate(parts):
        sub = {c: (k, [v[j] for j in idx]) for c, (k, v) in cols.items()}
        _write(d, f"b{i:02d}", sub)
        p = os.path.join(d, f"b{i:02d}.parquet")
        os.utime(p, (t + 100 * i, t + 100 * i))


def _staged_stream(spark, d: str):
    """(stream, batch) readers of a staged dir, ts normalized to
    TimestampType exactly like streaming.runtime.stream_events."""
    from dataengineer_scripts_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)

    def fix(df):
        if dict(df.dtypes)["ts"] == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    batch = spark.read.parquet(d)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return fix(stream), fix(batch)


def _random_parts(rng: random.Random, n: int, n_parts: int) -> list[list[int]]:
    """Shuffle row indices across ``n_parts`` files (arrival order ≠
    event-time order) and splice one EMPTY micro-batch into the middle."""
    idx = list(range(n))
    rng.shuffle(idx)
    parts = [idx[i::n_parts] for i in range(n_parts)]
    parts.insert(n_parts // 2, [])
    return parts


def test_stream_tumbling_complete_out_of_order_arrival(spark, tmp_path):
    """Complete-mode tumbling counts must be arrival-order-independent:
    randomly shuffled micro-batches (plus an empty one) equal the batch
    aggregate of the same rows."""
    rng = random.Random(0xB00)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)
    run_to_memory(tumbling_counts(stream), "fuzz_tumb_out", "complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM fuzz_tumb_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in tumbling_counts(batch).collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_complete_out_of_order_arrival(spark, tmp_path):
    """Session-window state must merge correctly across micro-batch
    boundaries even when a session's events ARRIVE in different batches
    in shuffled order — the hardest state path (merge of previously
    disjoint sessions when a bridging event arrives late)."""
    rng = random.Random(0xB01)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 5))
    stream, batch = _staged_stream(spark, d)

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("ws"), "n")
        )

    run_to_memory(sessions(stream), "fuzz_sess_out", "complete")
    got = {
        (r.user_id, r.ws): r.n
        for r in spark.sql("SELECT * FROM fuzz_sess_out").collect()
    }
    want = {(r.user_id, r.ws): r.n for r in sessions(batch).collect()}
    assert got == want and len(got) > 0


def test_stream_append_watermark_late_arrivals_straddle(spark, tmp_path):
    """Append-mode watermark semantics, pinned against Spark's real
    TWO-WATERMARK model (empirically established while writing this
    test; SPARK-40925): within one micro-batch, LATE-EVENT FILTERING
    uses the PREVIOUS batch's watermark while EVICTION/EMISSION uses the
    current one.  Consequences this test pins:

    - a late row is dropped iff its window END ≤ the previous batch's
      watermark (window-level predicate — a row whose ts is below the
      watermark but whose window is still open IS aggregated);
    - a late row arriving in the very batch whose eviction finalizes its
      window still counts (filter ran with the older watermark);
    - every emitted window appears exactly once with its final count.

    batch 1 (f1): days 0–4, three events each at 00:00/06:00/23:00 (the
    00:00 rows sit exactly ON the window-start boundary).  Runs with
    late-wm = epoch, eviction-wm = epoch → nothing emitted.
    batch 2 (f2): one on-time row at day5 12:00.  late-wm = epoch,
    eviction-wm = day4 22:00 → W0–W3 emitted (3 each) and evicted; W4
    (end day5 00:00 > wm) stays open.
    batch 3 (f3): the straddle — a row into evicted W1 (end day2 ≤
    late-wm day4 22:00 → DROPPED), a row at day4 02:00 into open W4
    (ts below the watermark but window end day5 00:00 > late-wm →
    aggregated), a row at day5 03:00 into W5 (same class), and a
    frontier row on day7.  eviction-wm = day5 11:00 → W4 emitted as 4.
    final no-data batch: eviction-wm = day7 05:00 → W5 emitted as 2;
    W6 empty; W7 frontier withheld."""
    f1 = [
        (dt.timedelta(days=dk, hours=h), 1)
        for dk in range(5)
        for h in (0, 6, 23)
    ]
    f2 = [(dt.timedelta(days=5, hours=12), 2)]
    f3 = [
        (dt.timedelta(days=1, hours=3), 3),   # W1 evicted → dropped
        (dt.timedelta(days=4, hours=2), 3),   # W4 open → aggregated
        (dt.timedelta(days=5, hours=3), 3),   # W5 open → aggregated
        (dt.timedelta(days=7, hours=6), 3),   # frontier, withheld
    ]
    rows = f1 + f2 + f3
    cols = {
        "event_id": ("i64", list(range(len(rows)))),
        "ts": ("ts", [_T0 + off for off, _ in rows]),
        "user_id": ("i64", [uid for _, uid in rows]),
        "event_type": ("str", ["click"] * len(rows)),
        "value": ("f64", [1.0] * len(rows)),
        "props": ("str", ["{}"] * len(rows)),
    }
    d = str(tmp_path / "staged")
    n1, n2 = len(f1), len(f1) + len(f2)
    _stage_batches(d, cols, [list(range(n1)),
                             list(range(n1, n2)),
                             list(range(n2, len(rows)))])
    stream, _ = _staged_stream(spark, d)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    run_to_memory(agg, "fuzz_wm_out", "append")
    emitted = spark.sql("SELECT * FROM fuzz_wm_out").collect()
    got = {r.ws: r.n for r in emitted}
    want = {_T0 + dt.timedelta(days=k): 3 for k in range(4)}
    want[_T0 + dt.timedelta(days=4)] = 4
    want[_T0 + dt.timedelta(days=5)] = 2
    assert got == want
    # exactly-once: no window emitted twice (a re-created evicted window
    # would re-emit under append mode — the drop filter must prevent it)
    assert len(emitted) == len(want)


def test_stream_dedup_within_watermark_out_of_order(spark, tmp_path):
    """dropDuplicatesWithinWatermark with a watermark wider than the
    whole event span must equal batch DISTINCT regardless of arrival
    order — duplicates of one key arriving in different micro-batches
    (including across the empty batch) collapse to one emission."""
    rng = random.Random(0xB02)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)
    dedup = (
        stream.withWatermark("ts", "30 days")
        .select("ts", "user_id", "event_type")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    run_to_memory(dedup, "fuzz_dedup_out", "append")
    got = {
        (r.user_id, r.event_type)
        for r in spark.sql("SELECT * FROM fuzz_dedup_out").collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    # exactly-once emission: one row per key, not one per duplicate
    n_rows = spark.sql("SELECT count(*) AS c FROM fuzz_dedup_out").collect()[0].c
    assert n_rows == len(want)


def test_stream_stream_join_out_of_order_arrival(spark, tmp_path):
    """Real dual-readStream interval join over shuffled arrival: with
    watermarks wider than the span nothing is ever evicted, so the
    result must equal the batch join row-for-row — clicks and purchases
    of one pair arriving in different micro-batches must still meet in
    the join buffers."""
    from dataengineer_scripts_spark.streaming.windows import (
        clickstream_attribution,
    )

    rng = random.Random(0xB03)
    cols = _fuzz_event_cols(rng)
    # guarantee matching pairs (a seed may have dropped 'click' or
    # 'purchase' entirely): append clicks with purchases landing inside
    # AND just outside the 1-day attribution interval, plus an
    # exactly-at-click-ts purchase (the >= boundary)
    stamps, users = cols["ts"][1], cols["user_id"][1]
    n0 = len(stamps)
    new_rows = []
    for i in range(8):
        uid = rng.randrange(12)
        cts = _T0 + dt.timedelta(
            microseconds=rng.randrange((_SPAN_DAYS - 2) * _DAY_US)
        )
        new_rows.append((cts, uid, "click"))
        off = [0,                      # exactly AT click ts: INCLUDED (>=)
               rng.randrange(_DAY_US),  # inside the interval
               _DAY_US,                # exactly +1 day: EXCLUDED (< bound)
               _DAY_US + rng.randrange(_DAY_US)][i % 4]
        new_rows.append((cts + dt.timedelta(microseconds=off), uid, "purchase"))
    for cts, uid, et in new_rows:
        stamps.append(cts)
        users.append(uid)
        cols["event_type"][1].append(et)
        cols["value"][1].append(1.0)
        cols["props"][1].append("{}")
    cols["event_id"] = ("i64", list(range(n0 + len(new_rows))))
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(stamps), 4))

    def side(df, event_type, id_alias, ts_alias, wm):
        df = df.filter(F.col("event_type") == event_type).select(
            "user_id",
            F.col("event_id").alias(id_alias),
            F.col("ts").alias(ts_alias),
        )
        return df.withWatermark(ts_alias, wm) if wm else df

    # two INDEPENDENT reads per mode: a shared plan would make the join
    # a self-join with ambiguous (trivially-true) key resolution
    stream_a, batch_a = _staged_stream(spark, d)
    stream_b, batch_b = _staged_stream(spark, d)
    joined = clickstream_attribution(
        side(stream_a, "click", "click_id", "click_ts", "30 days"),
        side(stream_b, "purchase", "purchase_id", "purchase_ts", "30 days"),
    )
    run_to_memory(joined, "fuzz_ssjoin_out", "append")
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in spark.sql("SELECT * FROM fuzz_ssjoin_out").collect()
    }
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in clickstream_attribution(
            side(batch_a, "click", "click_id", "click_ts", None),
            side(batch_b, "purchase", "purchase_id", "purchase_ts", None),
        ).collect()
    }
    # the two in-window offset classes of the 8 forced pairs are
    # guaranteed matches (plus whatever the random base produced)
    assert got == want and len(got) >= 4


def test_stream_tumbling_rocksdb_state_store(spark, tmp_path):
    """State-store PROVIDER diversity: the same out-of-order multi-batch
    complete-mode aggregation under the RocksDB state store (the
    provider a production cluster runs for large state) must equal the
    batch result exactly like the default HDFS-backed provider does.
    The conf is restored afterwards — the session is shared and every
    other streaming test must keep running under the default provider."""
    rng = random.Random(0xB05)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_to_memory(tumbling_counts(stream), "fuzz_rocks_out", "complete")
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    got = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM fuzz_rocks_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in tumbling_counts(batch).collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_rocksdb_state_store(spark, tmp_path):
    """RocksDB under the hardest state layout: session-window state
    MERGES entries (not just upserts) when a bridging event arrives in a
    later micro-batch — run the shuffled-arrival session test under the
    RocksDB provider and require batch equality."""
    rng = random.Random(0xB06)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("ws"), "n")
        )

    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_to_memory(sessions(stream), "fuzz_rocks_sess_out", "complete")
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    got = {
        (r.user_id, r.ws): r.n
        for r in spark.sql("SELECT * FROM fuzz_rocks_sess_out").collect()
    }
    want = {(r.user_id, r.ws): r.n for r in sessions(batch).collect()}
    assert got == want and len(got) > 0


def test_stream_stream_join_rocksdb_state_store(spark, tmp_path):
    """RocksDB under the dual-buffer layout: a stream-stream interval
    join keeps one state store per side; run a small two-sided join
    under the RocksDB provider and require batch equality.  With the
    tumbling-agg, session-merge, and join-buffer tests, all three state
    layouts the engine uses are provider-diverse."""
    from dataengineer_scripts_spark.streaming.windows import (
        clickstream_attribution,
    )

    rows = []
    for i in range(12):
        cts = _T0 + dt.timedelta(hours=7 * i)
        rows.append((cts, i % 4, "click"))
        rows.append((cts + dt.timedelta(hours=3), i % 4, "purchase"))
    cols = {
        "event_id": ("i64", list(range(len(rows)))),
        "ts": ("ts", [t for t, _, _ in rows]),
        "user_id": ("i64", [u for _, u, _ in rows]),
        "event_type": ("str", [e for _, _, e in rows]),
        "value": ("f64", [1.0] * len(rows)),
        "props": ("str", ["{}"] * len(rows)),
    }
    d = str(tmp_path / "staged")
    rng = random.Random(0xB07)
    _stage_batches(d, cols, _random_parts(rng, len(rows), 3))

    def side(df, event_type, id_alias, ts_alias, wm):
        df = df.filter(F.col("event_type") == event_type).select(
            "user_id",
            F.col("event_id").alias(id_alias),
            F.col("ts").alias(ts_alias),
        )
        return df.withWatermark(ts_alias, wm) if wm else df

    stream_a, batch_a = _staged_stream(spark, d)
    stream_b, batch_b = _staged_stream(spark, d)
    joined = clickstream_attribution(
        side(stream_a, "click", "click_id", "click_ts", "30 days"),
        side(stream_b, "purchase", "purchase_id", "purchase_ts", "30 days"),
    )
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_to_memory(joined, "fuzz_rocks_join_out", "append")
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in spark.sql("SELECT * FROM fuzz_rocks_join_out").collect()
    }
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in clickstream_attribution(
            side(batch_a, "click", "click_id", "click_ts", None),
            side(batch_b, "purchase", "purchase_id", "purchase_ts", None),
        ).collect()
    }
    assert got == want and len(got) >= 12


def test_stream_dedup_rocksdb_state_store(spark, tmp_path):
    """RocksDB under the dedup-key state encoding (r18 verdict item 4):
    ``dropDuplicatesWithinWatermark`` keeps a value-less key store with
    per-key expiry timestamps — a different RocksDB layout from the
    windowed-agg / session-merge / join-buffer stores above.  Randomized
    events arrive shuffled across micro-batches; the watermark delay
    (30 d) exceeds the event span (14 d) so no key is ever evicted and
    append-mode output must be EXACTLY one row per distinct
    (user_id, event_type) — set equality AND count equality against the
    batch distinct."""
    rng = random.Random(0xB08)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)
    dedup = (
        stream.withWatermark("ts", "30 days")
        .select("ts", "user_id", "event_type")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_to_memory(dedup, "fuzz_rocks_dedup_out", "append")
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    emitted = spark.sql(
        "SELECT user_id, event_type FROM fuzz_rocks_dedup_out"
    ).collect()
    got = {(r.user_id, r.event_type) for r in emitted}
    want = {
        (r.user_id, r.event_type)
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert got == want and len(got) > 0
    # exactly-once per key: duplicates seen in LATER micro-batches must
    # hit the restored RocksDB key store, not re-emit
    assert len(emitted) == len(want)


def test_stream_stateful_rocksdb_state_store(spark, tmp_path):
    """RocksDB under the arbitrary-state encoding (r18 verdict item 4):
    ``applyInPandasWithState`` stores a USER-defined state row per key
    (Arrow-encoded tuple), unlike the engine-managed layouts above.  A
    running per-user count kept in GroupState over shuffled micro-batch
    arrival must converge to the batch per-user count (update mode: the
    last update per key is the total)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    rng = random.Random(0xB09)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)

    def count_state(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    counted = (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_state,
            outputStructType="user_id bigint, n bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_to_memory(counted, "fuzz_rocks_state_out", "update")
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    got = {
        r.user_id: r.n
        for r in spark.sql(
            "SELECT user_id, max(n) AS n FROM fuzz_rocks_state_out"
            " GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_upsert_foreachbatch_checkpoint_recovery_rocksdb(
    spark, tmp_path
):
    """foreachBatch CDC upsert across a RESTART with the RocksDB provider
    conf set (r18 verdict item 4, third shape): the
    x_stream_upsert_materialize pattern — per-batch per-key argmax
    APPENDED to a parquet state location — stopped after two files and
    resumed from the checkpoint must (a) NOT replay committed batches
    (the append log grows by exactly the new files' per-file key counts;
    foreachBatch itself is stateless, so this leg pins the OFFSET/COMMIT
    log recovery and proves the provider conf is inert for a stateless
    sink), and (b) compact to exactly the batch latest-row-per-user."""
    rng = random.Random(0xB0A)
    cols = _fuzz_event_cols(rng)
    n = len(cols["ts"][1])
    idx = list(range(n))
    rng.shuffle(idx)
    parts = [idx[i::4] for i in range(4)]
    d = str(tmp_path / "staged")
    # stage only the first two files; the rest land while the query is down
    _stage_batches(d, cols, parts[:2])
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    latest = F.max(F.struct("ts", "event_id", "event_type", "value")).alias(
        "w"
    )

    def upsert(b, bid):
        (
            b.groupBy("user_id")
            .agg(latest)
            .select("user_id", "w.ts", "w.event_id", "w.event_type", "w.value")
            .write.mode("append")
            .parquet(state_dir)
        )

    def run_once():
        stream, _ = _staged_stream(spark, d)
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    users = cols["user_id"][1]
    keys_per_file = [len({users[j] for j in p}) for p in parts]
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_once()
        c1 = spark.read.parquet(state_dir).count()
        assert c1 == sum(keys_per_file[:2])
        for i, p in enumerate(parts[2:], start=2):
            sub = {c: (k, [v[j] for j in p]) for c, (k, v) in cols.items()}
            _write(d, f"b{i:02d}", sub)
            os.utime(
                os.path.join(d, f"b{i:02d}.parquet"),
                (1_700_010_000 + 100 * i, 1_700_010_000 + 100 * i),
            )
        run_once()  # resumes from the checkpoint
    finally:
        spark.conf.unset(_PROVIDER_KEY)
    c2 = spark.read.parquet(state_dir).count()
    assert c2 - c1 == sum(keys_per_file[2:])  # no committed batch replayed

    def compact(df):
        return (
            df.groupBy("user_id")
            .agg(latest)
            .select(
                "user_id", "w.ts", "w.event_id", "w.event_type", "w.value"
            )
        )

    got = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value)
        for r in compact(spark.read.parquet(state_dir)).collect()
    }
    batch = _staged_stream(spark, d)[1]
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value)
        for r in compact(batch).collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.parametrize("rocksdb", [False, True], ids=["hdfs", "rocksdb"])
def test_stream_windowed_agg_checkpoint_recovery(spark, tmp_path, rocksdb):
    """State-store + watermark recovery across a RESTART: a windowed
    append-mode aggregation stopped after its first file and restarted
    from the checkpoint must (a) not re-emit windows finalized before the
    stop, (b) apply the RECOVERED watermark as the late-event filter —
    a late row arriving after the restart into a window evicted before
    the stop is dropped, while a straddler into a still-open window is
    aggregated — and (c) end with exactly the uninterrupted run's
    results.  The layout mirrors the straddle test: f1 = days 0–4
    (3 rows each; run 1 emits W0–W3 and evicts them), f2 appears while
    the query is DOWN with a late W1 row (dropped on resume), a W4
    straddler (kept → 4), a W5 row, and a day-7 frontier row (withheld;
    advances the final watermark so W4/W5 emit).

    Parametrized over the state-store provider (r18 verdict item 4): the
    rocksdb leg is the only place the suite exercises RocksDB state
    RESTORE — run 2 must reload run 1's checkpointed window state and
    watermark into a fresh RocksDB instance, not just keep writing into
    a warm one like the single-run provider tests above."""
    f1 = [
        (dt.timedelta(days=dk, hours=h), 1)
        for dk in range(5)
        for h in (0, 6, 23)
    ]
    f2 = [
        (dt.timedelta(days=1, hours=3), 3),   # late, W1 evicted pre-stop
        (dt.timedelta(days=4, hours=2), 3),   # straddler, W4 open
        (dt.timedelta(days=5, hours=12), 3),  # on-time, W5
        (dt.timedelta(days=7, hours=6), 3),   # frontier, withheld
    ]

    def cols_of(rows, id0):
        return {
            "event_id": ("i64", list(range(id0, id0 + len(rows)))),
            "ts": ("ts", [_T0 + off for off, _ in rows]),
            "user_id": ("i64", [uid for _, uid in rows]),
            "event_type": ("str", ["click"] * len(rows)),
            "value": ("f64", [1.0] * len(rows)),
            "props": ("str", ["{}"] * len(rows)),
        }

    d = str(tmp_path / "staged")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stage_batches(d, cols_of(f1, 0), [list(range(len(f1)))])

    def run_once():
        stream, _ = _staged_stream(spark, d)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    if rocksdb:
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        run_once()  # emits W0–W3, evicts them, checkpoints wm = day4 22:00
        # f2 lands while the query is down (later mtime than every f1 file)
        _write(d, "b99", cols_of(f2, len(f1)))
        os.utime(
            os.path.join(d, "b99.parquet"), (1_700_010_000, 1_700_010_000)
        )
        run_once()  # resumes from the checkpoint
    finally:
        if rocksdb:
            spark.conf.unset(_PROVIDER_KEY)
    emitted = spark.read.parquet(out).collect()
    got = {r.ws: r.n for r in emitted}
    want = {_T0 + dt.timedelta(days=k): 3 for k in range(4)}
    want[_T0 + dt.timedelta(days=4)] = 4
    want[_T0 + dt.timedelta(days=5)] = 1
    assert got == want
    assert len(emitted) == len(want)  # no window emitted twice


def test_stream_stateful_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState per-user running counts must survive
    shuffled multi-batch arrival and an empty micro-batch: the final
    state (max emitted n per user) equals the batch count."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rng = random.Random(0xB04)
    cols = _fuzz_event_cols(rng)
    d = str(tmp_path / "staged")
    _stage_batches(d, cols, _random_parts(rng, len(cols["ts"][1]), 4))
    stream, batch = _staged_stream(spark, d)

    def count_state(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    counted = stream.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        count_state,
        outputStructType="user_id bigint, n bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(counted, "fuzz_state_out", "update")
    got = {
        r.user_id: r.n
        for r in spark.sql(
            "SELECT user_id, max(n) AS n FROM fuzz_state_out GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and len(got) > 0
