"""Streaming jobs over the events table.

Local smoke path: parquet source dir → readStream → windowed agg →
memory sink, driven to completion with processAllAvailable() (the
pattern from the public Spark docs for deterministic tests). In
production the source line changes to Kafka and the sink to a
Delta/parquet writer — the transformation graph is identical.

Scale notes: watermarks bound state (late rows beyond 10 min are
dropped instead of growing the state store); windowed aggs shuffle on
(window, key) like their batch twins; session windows use Spark's
native session_window state merging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arnab_spark.spark_utils import configure, normalize_events_ts

# Schema for test-STAGED drop zones (the stateful/sink tests write their
# source files with ts as int64 epoch-nanos); normalize_events_ts converts
# to a session-tz TIMESTAMP. The fixture-symlink path below infers its
# schema from the actual file instead, so it tracks the driver's vintage
# (TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS)/NTZ since round 2).
_EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file stream source requires a *directory* to monitor; the
    fixtures are read-only single files, so stage a symlink dir (this is
    exactly the drop-zone layout a production file stream would watch)."""
    configure(spark)
    stage = os.path.join(
        "/tmp", "arnab_stream_src", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    fixture_schema = spark.read.parquet(link).schema
    stream = spark.readStream.schema(fixture_schema).parquet(stage)
    return normalize_events_ts(stream)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows with a 10-minute watermark — the
    streaming twin of queries/timeseries.py::tumbling_window (same
    window fn → same buckets as the batch/oracle-checked query)."""
    events = _read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (15-min gap) over the stream — the
    streaming twin of queries/timeseries.py::session_window_native."""
    events = _read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
        )
    )


def run_stream_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming frame to completion against the in-memory sink
    and return the materialized result as a batch DataFrame."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # wait for self-termination: availableNow's final no-data batch
        # (watermark-closing windows, state timers) is part of the run;
        # processAllAvailable() + stop() can race it under load. A False
        # return means the run is still going — the finally-stop() would
        # then truncate it and the memory table would read back PARTIAL
        # results as if complete, so fail loudly instead.
        if not q.awaitTermination(600):
            raise TimeoutError(
                f"availableNow run '{name}' exceeded 600s; memory-sink "
                "contents are incomplete"
            )
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def run_stream_to_parquet(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    watermark: str = "10 minutes",
) -> None:
    """Tumbling-window counts → parquet file sink with a checkpoint:
    the production persistence shape. Append mode emits a window only
    once its watermark closes it, and the checkpoint + file-sink
    manifest give exactly-once output across restarts — re-running
    after new source files arrive appends only newly finalized windows,
    never duplicates (proven in tests by a stop/extend/restart cycle).
    """
    events = spark.readStream.schema(_EVENTS_SCHEMA).parquet(source_dir)
    counts = (
        normalize_events_ts(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # append mode emits a window only when the watermark closes it —
        # that can happen in the final no-data batch; wait for
        # self-termination rather than racing it with stop(), and fail
        # loudly on timeout rather than leaving a silently partial sink
        if not q.awaitTermination(600):
            raise TimeoutError(
                f"availableNow run to {dest} exceeded 600s; parquet sink "
                f"is incomplete (checkpoint {checkpoint} can resume it)"
            )
    finally:
        q.stop()


def stream_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact streaming deduplication: ``dropDuplicates`` on
    (user_id, event_type) keeps one row per key across the whole stream.
    State holds every key seen — exact, but unbounded; use
    :func:`stream_dedup_watermarked` when the key space grows without
    bound and duplicates are known to arrive close together (the
    at-least-once-source case)."""
    events = _read_events_stream(spark, sf_dir)
    return events.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    drops duplicates that arrive within the 10-minute watermark delay
    and EVICTS key state once the watermark passes — so a key recurring
    much later is re-emitted. That trade (possible re-emission, bounded
    state) is the production shape for deduplicating at-least-once
    sources at 100 TB/day; the invariant it does guarantee — the output
    key set equals the input key set, with no adjacent duplicates —
    is what the test asserts."""
    events = _read_events_stream(spark, sf_dir)
    return (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "ts")
    )


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: clicks matched to the
    same user's purchases landing within [click_ts, click_ts + 30 min].
    Both sides carry watermarks and the join condition bounds event time
    on both sides, so Spark can evict join state as watermarks advance —
    without the interval bound the state store grows forever. Inner-join
    matches are emitted as they form; the batch twin (same filters, same
    join) must produce the identical row set."""
    events = _read_events_stream(spark, sf_dir)
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    return clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "click_id",
        F.col("c_user_id").alias("user_id"),
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def _read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the documents fixture — same symlink
    drop-zone staging as :func:`_read_events_stream` (a production
    ingest would watch exactly this layout as crawl batches land)."""
    configure(spark)
    stage = os.path.join(
        "/tmp", "arnab_stream_docs", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "documents.parquet"), link)
    fixture_schema = spark.read.parquet(link).schema
    return spark.readStream.schema(fixture_schema).parquet(stage)


def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest: the exact-dedup operator (md5 digest →
    keep-min-id + copy count) as a STREAMING aggregation over the
    document drop zone — the shape a training-data pipeline runs
    continuously as crawl batches land, instead of re-running batch
    dedup over the whole corpus.

    Determinism: min/count are order-insensitive, so the materialized
    result is independent of file/batch arrival order — byte-equal to
    the batch twin (``dedup_exact``'s shape) and oracle-able, where a
    streaming ``dropDuplicates`` would keep an arrival-order-dependent
    row. State: one row per DISTINCT digest (complete mode, no
    watermark — digests have no event time). That is the honest cost
    of exact streaming dedup at any scale; the bounded-state
    alternatives are :func:`stream_dedup_watermarked` (time-bounded
    eviction, re-emission possible) or periodically compacting the
    state into the snapshot table ``dedup_incremental`` anti-joins
    against."""
    docs = _read_documents_stream(spark, sf_dir)
    return (
        docs.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
