"""Streaming runtime helpers: build an events stream from the fixture
parquet and run the shared window operators on it.

The file source treats the fixture parquet as a one-file directory glob;
`memory` sink + `processAllAvailable()` drives a bounded stream to
completion synchronously (the local smoke pattern for what would be a
Kafka-fed continuous query on a cluster).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


def _as_source_dir(parquet_file: str) -> str:
    """The file stream source requires a directory; stage a symlink dir
    (one per source file, cached across calls) under the system tmpdir."""
    tag = hashlib.sha1(parquet_file.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(parquet_file))
    if not os.path.exists(link):
        os.symlink(parquet_file, link)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream with a proper TimestampType ts.

    Schema is taken from the batch reader (under nanosAsLong the parquet
    `ts` arrives as a long; converted here exactly like tables.table)."""
    apply_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(_as_source_dir(path))
    ts_dtype = dict(stream.dtypes)["ts"]
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_dtype == "timestamp_ntz":
        # withWatermark requires TimestampType; UTC session makes the cast a
        # value no-op (same normalization as tables.table).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_to_memory(df: DataFrame, name: str, output_mode: str):
    """Drive a bounded stream to completion into a memory table.

    Returns the (stopped) StreamingQuery so callers/tests can inspect
    ``recentProgress`` — e.g. the r20 determinism pin that the smoke run
    executes a fixed micro-batch count."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return q


def stream_events_split(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> tuple[DataFrame, int]:
    """events as a MULTI-micro-batch stream: stage the fixture once as
    ``n_files`` time-range parquet files (range partition = file index =
    time order), then read them with ``maxFilesPerTrigger=1`` so the
    bounded run exercises real batch boundaries instead of one giant
    batch.  Staging is cached per (source file identity, n_files);
    consumers must be batch-boundary-independent (e.g. merge by per-key
    argmax), which is also what makes them replay-safe in production."""
    from ..tables import table

    path = f"{sf_dir}/events.parquet"
    st = os.stat(path)
    tag = hashlib.sha1(
        f"{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}:{n_files}".encode()
    ).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_split_{tag}")
    if not os.path.isfile(os.path.join(d, "_SUCCESS")):
        # Atomic publish: write to a private temp dir, then rename into
        # place.  A concurrent session (pytest + bench share the system
        # tmpdir) either wins the rename or finds the winner's complete
        # dir — never observes (or clobbers) a half-written one, which
        # the old unsynchronized check-then-overwrite allowed.
        tmp = tempfile.mkdtemp(
            prefix=f"spark_graft_split_{tag}_stage_",
        )
        staged = os.path.join(tmp, "data")
        (
            table(spark, sf_dir, "events")
            .repartitionByRange(n_files, "ts", "event_id")
            .write.mode("overwrite")
            .parquet(staged)
        )
        try:
            os.rename(staged, d)
        except OSError:
            if not os.path.isfile(os.path.join(d, "_SUCCESS")):
                # stale half-written dir from a crashed writer: replace it
                shutil.rmtree(d, ignore_errors=True)
                try:
                    os.rename(staged, d)
                except OSError:
                    pass  # lost a concurrent race; winner's dir is complete
            # else: lost the race cleanly — the winner's dir is complete
        shutil.rmtree(tmp, ignore_errors=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    ts_dtype = dict(stream.dtypes)["ts"]
    if ts_dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream, n_files
