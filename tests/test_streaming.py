"""Real Structured Streaming runs of the shared window operators —
memory sink + processAllAvailable (bounded-stream smoke), asserting
stream results equal the batch results of the same definitions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dataengineer_scripts_spark.streaming.runtime import run_to_memory, stream_events
from dataengineer_scripts_spark.streaming.windows import tumbling_counts
from dataengineer_scripts_spark.tables import table


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    run_to_memory(tumbling_counts(stream), "tumbling_out", "complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in tumbling_counts(table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_watermark_append_mode(spark, sf_dir):
    """Append mode with a watermark: only windows fully below the
    advanced watermark are finalized — the frontier window stays open
    (late data could still arrive), every emitted window is final and
    matches the batch result."""
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    run_to_memory(agg, "wm_out", "append")
    got = {r.ws: r.n for r in spark.sql("SELECT * FROM wm_out").collect()}
    want = {
        r.ws: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    # the frontier window (max event time) is withheld; the rest are final
    assert 0 < len(got) < len(want)
    assert max(want) not in got
    assert all(want[ws] == n for ws, n in got.items())


def test_stream_dedup_within_watermark(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    dedup = (
        stream.withWatermark("ts", "1 day")
        .select("ts", "user_id", "event_type")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    run_to_memory(dedup, "dedup_out", "append")
    got = spark.sql("SELECT count(*) AS c FROM dedup_out").collect()[0].c
    want = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got == want


def test_stream_stateful_apply_in_pandas_with_state(spark, sf_dir):
    """Custom stateful operator on a real stream: running per-user event
    count kept in GroupState (the streaming twin of x_stream_stateful)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def count_state(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    stream = stream_events(spark, sf_dir).select("user_id", "ts")
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_state,
        outputStructType="user_id bigint, n bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    run_to_memory(counted, "state_out", "update")
    got = {
        r.user_id: r.n
        for r in spark.sql(
            "SELECT user_id, max(n) AS n FROM state_out GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_session_window_real(spark, sf_dir):
    """Session windows on a real stream (complete mode) equal the batch
    session-window aggregation of the same definition."""
    gap = "30 minutes"

    def sessions(df):
        return (
            df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("ws"), "n")
        )

    stream = stream_events(spark, sf_dir).select("user_id", "ts")
    run_to_memory(sessions(stream), "sess_out", "complete")
    got = {
        (r.user_id, r.ws): r.n
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        (r.user_id, r.ws): r.n
        for r in sessions(
            table(spark, sf_dir, "events").select("user_id", "ts")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_http_foreach_sink(spark, sf_dir):
    """The streaming twin of snk_http_post (SURVEY.md §2.1): a real
    writeStream.foreach sink POSTs each row's /sync endpoint against the
    stub API; the receipts read back must cover every distinct user id
    exactly once per arrival."""
    from dataengineer_scripts_spark.sinks import fetch_receipts, post_sync
    from dataengineer_scripts_spark.sources.stub_api import TOKEN, StubApi

    with StubApi([]) as api:
        base, token = api.base_url, TOKEN
        stream = (
            stream_events(spark, sf_dir)
            .select("user_id")
            .dropDuplicates(["user_id"])
        )

        def process(row):
            post_sync(base, token, int(row.user_id))

        q = (
            stream.writeStream.outputMode("update")
            .foreach(process)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rec = fetch_receipts(base, token)
        want = {
            int(r.user_id)
            for r in table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .collect()
        }
        assert set(rec["synced"]) == want
        assert all(v == 1 for v in rec["attempts"].values())


def test_stream_foreach_batch_sink(spark, sf_dir):
    """foreachBatch — the exactly-once sink adapter (collects per-batch
    row counts driver-side; the real engine pattern for idempotent
    writes)."""
    stream = stream_events(spark, sf_dir).filter(F.col("event_type") == "error")
    seen: list[int] = []

    def sink(df, epoch_id):
        seen.append(df.count())

    q = stream.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .count()
    )
    assert sum(seen) == want


def test_stream_static_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment join: the static dim side is joined to a
    real readStream; results must equal the batch twin's."""
    from dataengineer_scripts_spark.streaming.windows import enriched_window_revenue

    dim = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = stream_events(spark, sf_dir)
    run_to_memory(enriched_window_revenue(stream, dim), "sjoin_out", "complete")
    got = {
        (r.window_start, r.segment): (r.n, r.revenue)
        for r in spark.sql("SELECT * FROM sjoin_out").collect()
    }
    want = {
        (r.window_start, r.segment): (r.n, r.revenue)
        for r in enriched_window_revenue(
            table(spark, sf_dir, "events"), dim
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Real stream-stream interval join: BOTH sides are readStreams with
    watermarks; the inner-join results must equal the batch twin's."""
    from pyspark.sql import functions as F

    from dataengineer_scripts_spark.streaming.windows import (
        clickstream_attribution,
        x_stream_stream_join,
    )

    def side(event_type, id_alias, ts_alias):
        return (
            stream_events(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                "user_id",
                F.col("event_id").alias(id_alias),
                F.col("ts").alias(ts_alias),
            )
            .withWatermark(ts_alias, "1 hour")
        )

    joined = clickstream_attribution(
        side("click", "click_id", "click_ts"),
        side("purchase", "purchase_id", "purchase_ts"),
    )
    run_to_memory(joined, "ssjoin_out", "append")
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in spark.sql("SELECT * FROM ssjoin_out").collect()
    }
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_sec)
        for r in x_stream_stream_join(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_stream_rest_poll_incremental_offsets(spark):
    """The REST stream reader must emit ONLY rows appended since the last
    offset: grow the server's receipts feed between microbatches and
    assert each batch picks up exactly the delta (no replays, no gaps)."""
    import urllib.request

    from dataengineer_scripts_spark.sources.rest import login, rest_read_stream
    from dataengineer_scripts_spark.sources.stub_api import (
        RECEIPTS_LIST_PATH,
        TOKEN,
        StubApi,
    )

    nodes = [
        {"id": i, "name": f"n{i}", "type": "job", "status": "SUCCESS",
         "export_status": "SUCCESS"}
        for i in range(6)
    ]

    def sync(api, node_id):
        req = urllib.request.Request(
            f"{api.base_url}/analytic/nodes/{node_id}/sync",
            data=b"{}",
            headers={"Authorization": TOKEN},
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10).read()

    with StubApi(nodes) as api:
        stream = rest_read_stream(
            spark,
            api.base_url,
            login(api.base_url),
            page_size=2,  # force multi-page fetches within one batch
            path=RECEIPTS_LIST_PATH,
            schema="node_id int, attempts int",
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("rest_poll_out")
            .start()
        )
        try:
            rows = lambda: sorted(  # noqa: E731
                r.node_id for r in spark.sql("SELECT * FROM rest_poll_out").collect()
            )
            q.processAllAvailable()
            assert rows() == []  # nothing synced yet → empty first batch
            sync(api, 0)
            q.processAllAvailable()
            assert rows() == [0]
            # receipts are served in node_id order; sync in increasing id
            # order (the reader's append-ordered-listing contract)
            for i in (1, 2, 3, 4):
                sync(api, i)
            q.processAllAvailable()
            assert rows() == [0, 1, 2, 3, 4]  # delta only — 0 not replayed
        finally:
            q.stop()


def test_stream_rest_poll_survives_token_expiry(spark):
    """The reference logs in once and assumes the token outlives the run
    (sync.py:14-32); a long-running poll stream cannot.  With tokens that
    expire every few listing GETs, the driver-side reader must re-login
    transparently (one login + replay per expiry — pinned at unit level
    in test_connector_fuzz.py) and keep exactly-once delta semantics:
    every synced row appears exactly once, no gaps, no replays."""
    import urllib.request

    from dataengineer_scripts_spark.sources.rest import login, rest_read_stream
    from dataengineer_scripts_spark.sources.stub_api import (
        LOGIN_PATH,
        RECEIPTS_LIST_PATH,
        TOKEN,
        StubApi,
    )

    nodes = [
        {"id": i, "name": f"n{i}", "type": "job", "status": "SUCCESS",
         "export_status": "SUCCESS"}
        for i in range(6)
    ]

    def sync(api, node_id):
        # the constant TOKEN never does listing GETs, so it never expires
        # — POSTs authenticate via the issued set alone
        req = urllib.request.Request(
            f"{api.base_url}/analytic/nodes/{node_id}/sync",
            data=b"{}",
            headers={"Authorization": TOKEN},
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10).read()

    with StubApi(nodes, expire_token_after=4) as api:
        stream = rest_read_stream(
            spark,
            api.base_url,
            login(api.base_url),
            page_size=2,  # multi-page fetches burn the budget faster
            path=RECEIPTS_LIST_PATH,
            schema="node_id int, attempts int",
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("rest_poll_expiry_out")
            .start()
        )
        try:
            rows = lambda: sorted(  # noqa: E731
                r.node_id
                for r in spark.sql(
                    "SELECT * FROM rest_poll_expiry_out"
                ).collect()
            )
            q.processAllAvailable()
            for i in (0, 1, 2):
                sync(api, i)
            q.processAllAvailable()
            assert rows() == [0, 1, 2]
            for i in (3, 4, 5):
                sync(api, i)
            q.processAllAvailable()
            # exactly once across however many expiries the continuous
            # poll burned through — no row lost to a 401, none replayed
            assert rows() == [0, 1, 2, 3, 4, 5]
            relogins = [
                r for r in api.requests_seen if r == f"POST {LOGIN_PATH}"
            ]
            # the continuous poll probes between processAllAvailable
            # calls too, so the exact count is timing-dependent — but at
            # least one automatic re-login beyond the test's own login
            # must have happened for the stream to still be alive
            assert len(relogins) >= 2
        finally:
            q.stop()


def test_stream_rest_poll_checkpoint_recovery(spark, tmp_path):
    """Exactly-once across a restart: offsets recovered from the
    checkpoint must resume the poll where the stopped query left off —
    rows synced while the query was DOWN appear exactly once, rows from
    before the restart are not replayed into the (fault-tolerant) file
    sink."""
    import urllib.request

    from dataengineer_scripts_spark.sources.rest import login, rest_read_stream
    from dataengineer_scripts_spark.sources.stub_api import (
        RECEIPTS_LIST_PATH,
        TOKEN,
        StubApi,
    )

    nodes = [
        {"id": i, "name": f"n{i}", "type": "job", "status": "SUCCESS",
         "export_status": "SUCCESS"}
        for i in range(8)
    ]

    def sync(api, node_id):
        req = urllib.request.Request(
            f"{api.base_url}/analytic/nodes/{node_id}/sync",
            data=b"{}",
            headers={"Authorization": TOKEN},
            method="POST",
        )
        urllib.request.urlopen(req, timeout=10).read()

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with StubApi(nodes) as api:
        def start():
            return (
                rest_read_stream(
                    spark,
                    api.base_url,
                    login(api.base_url),
                    page_size=2,
                    path=RECEIPTS_LIST_PATH,
                    schema="node_id int, attempts int",
                )
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )

        q = start()
        try:
            sync(api, 0)
            sync(api, 1)
            q.processAllAvailable()
        finally:
            q.stop()
        # rows appended while the query is down must be picked up on resume
        sync(api, 2)
        sync(api, 3)
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
    got = [r.node_id for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [0, 1, 2, 3]  # each exactly once: no replay, no gap


def test_stream_smoke_batch_count_is_pinned(spark, sf_dir):
    """Determinism pin (r19 verdict item 3): the registered smoke's
    bounded run must execute a FIXED micro-batch cadence — one data batch
    (the single-file source drains in one trigger) plus at most one
    empty watermark-finalization batch.  An environment-dependent batch
    count would make both the smoke's timing and its append-mode output
    nondeterministic; this pins the cadence at the runtime level so a
    drift (e.g. a maxFilesPerTrigger default change or a source split)
    fails loudly."""
    agg = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = run_to_memory(agg, "smoke_cadence_out", "append")
    progress = q.recentProgress
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) == 1, [
        (p["batchId"], p["numInputRows"]) for p in progress
    ]
    assert len(progress) <= 3, [p["batchId"] for p in progress]
