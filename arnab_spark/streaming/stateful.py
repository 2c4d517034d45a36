"""Custom stateful streaming operator via ``applyInPandasWithState``.

Spark's built-in streaming aggregations cover windowed/session counts
(see jobs.py); anything with bespoke per-key state — running totals
that must survive across micro-batches, threshold alerts that fire
exactly once, custom eviction — needs the arbitrary-stateful API. This
module implements the canonical shape: per-user running totals with a
one-shot threshold alert, state carried in the state store across
micro-batches.

Reference parity note: the reference engine (ariaghora/arnab) has no
streaming surface at all — this is part of the beyond-reference
training-pipeline layer (brief: "applyInPandasWithState for custom
stateful operators").

Scale notes:
- State is ONE fixed-width row per user (3 bigints), hash-partitioned
  by the group key across executors — state size is O(distinct users),
  independent of event volume.
- Money accumulates as integer cents (events.value carries exactly 2
  decimals — same quantization contract as queries/aggregates._qlong),
  so running totals are exact and order-independent across batches.
- The Pandas function receives an *iterator* of Arrow batches per key
  and never materializes the full group — per-task memory is bounded
  by the Arrow batch size.
- In production the state store should be RocksDB
  (``spark.sql.streaming.stateStore.providerClass``) so state spills
  to disk instead of executor heap; the transformation is identical.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "last_ts timestamp, alert boolean"
)
# state row: event count, running cents, max event-time micros, alerted flag
_STATE_SCHEMA = "n bigint, cents bigint, last_us bigint, alerted boolean"


def _make_update_fn(threshold_cents: int):
    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, cents, last_us, alerted = state.get
        else:
            n, cents, last_us, alerted = 0, 0, 0, False
        was_alerted = alerted
        for pdf in batches:
            n += len(pdf)
            # exact: value is 2-decimal, so value*100 snaps to int cents
            cents += int((pdf["value"] * 100.0 + 0.5).astype("int64").sum())
            # normalize to ns first: Arrow may hand back datetime64[us]
            # or [ns] depending on pandas version
            ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
            last_us = max(last_us, int(ts_ns.max()) // 1000)
        crossed = cents >= threshold_cents and not was_alerted
        alerted = alerted or crossed
        state.update((n, cents, last_us, alerted))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                # alert=True only on the batch where the threshold is
                # first crossed — at-most-once alerting semantics
                "alert": [crossed],
            }
        )

    return update


def stream_user_running_totals(
    events: DataFrame, threshold_value: float = 1_000.0
) -> DataFrame:
    """Per-user running (n_events, total_value) with a one-shot alert
    when the lifetime total first crosses ``threshold_value``.

    ``events`` is a *streaming* DataFrame with at least
    (user_id bigint, ts timestamp, value double). Emits one updated row
    per user per micro-batch (update output mode).
    """
    threshold_cents = int(round(threshold_value * 100))
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(threshold_cents),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream(
    spark: SparkSession,
    source_dir: str,
    name: str,
    threshold_value: float = 1_000.0,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive :func:`stream_user_running_totals` over a parquet drop-zone
    directory to completion and return the accumulated update log
    (one row per user per micro-batch) as a batch DataFrame.

    ``max_files_per_trigger=1`` forces one micro-batch per file, which
    is how the tests prove state actually carries across batches.
    """
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)

    reader = spark.readStream.schema(_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_events_ts(reader.parquet(source_dir))
    totals = stream_user_running_totals(stream, threshold_value)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # availableNow self-terminates after ALL batches — including the
        # final no-data batch that fires pending event-time timers.
        # processAllAvailable() can return before that batch commits and
        # the subsequent stop() races it (observed as a flaky missing
        # "timeout" session under load), so wait for termination instead;
        # a False return means the finally-stop() would truncate the run
        # and the memory table would read back partial — fail loudly.
        if not q.awaitTermination(600):
            raise TimeoutError(
                f"availableNow run '{name}' exceeded 600s; memory-sink "
                "contents are incomplete"
            )
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_totals_to_parquet(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    threshold_value: float = 1_000.0,
) -> None:
    """:func:`stream_user_running_totals` → a parquet UPDATE LOG with a
    checkpoint. Update output mode has no built-in file sink, so this
    uses the standard idempotent ``foreachBatch`` pattern: each
    micro-batch's update rows overwrite a deterministic
    ``batch=<id>`` directory — a replayed batch after a crash rewrites
    the same directory instead of double-appending, so the log is
    exactly-once under restart. The checkpoint carries the per-user
    (count, cents, last_ts, alerted) state; the ``alerted`` flag is
    what makes the one-shot alert survive a restart without re-firing
    — proven by the stop/extend/restart test."""
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)
    stream = normalize_events_ts(
        spark.readStream.schema(_EVENTS_SCHEMA).parquet(source_dir)
    )
    totals = stream_user_running_totals(stream, threshold_value)

    def write_batch(df, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{dest}/batch={batch_id}")

    q = (
        totals.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(600):
            raise TimeoutError(
                "totals availableNow run exceeded 600s; update log at "
                f"{dest} is incomplete (checkpoint {checkpoint} can resume it)"
            )
    finally:
        q.stop()


# ---------------------------------------------------------------------
# Event-time-timeout sessionizer

_SESSION_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed_by string"
)
# open session per user: start/last event-time micros, event count
_SESSION_STATE = "start_us bigint, last_us bigint, n bigint"


def _session_row(user_id, start_us, last_us, n, closed_by):
    import pandas as pd

    return {
        "user_id": [user_id],
        "session_start": [pd.Timestamp(start_us, unit="us")],
        "session_end": [pd.Timestamp(last_us, unit="us")],
        "n_events": [n],
        "closed_by": [closed_by],
    }


def _make_sessionizer(gap_us: int):
    def fn(key, batches, state: "GroupState"):
        import pandas as pd

        if state.hasTimedOut:
            # watermark passed the open session's end + gap: close it
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(_session_row(key[0], start_us, last_us, n, "timeout"))
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = -1
            n = 0
        closed = []
        for pdf in batches:
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).sort_values()
            for t in ts_us:
                t = int(t)
                if start_us < 0:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append(_session_row(key[0], start_us, last_us, n, "gap"))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        # fire when the watermark passes session end + gap; the
        # timeout must sit above the current watermark
        timeout_ms = max(
            (last_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        for row in closed:
            yield __import__("pandas").DataFrame(row)

    return fn


def stream_sessionize_timeout(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionizer over a stream with EVENT-TIME TIMEOUTS: a
    session closes either when a later event of the same user arrives
    past the gap ("gap") or when the watermark passes the open
    session's end + gap with no new data ("timeout") — the behavior
    Spark's built-in ``session_window`` aggregation cannot express with
    custom per-session output like close reasons.

    ``events`` must carry a watermark on ``ts`` already (the timeout
    clock IS the watermark). State: one open session per user — O(keys),
    closed sessions leave the store immediately."""
    gap_us = gap_minutes * 60 * 1_000_000
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_us),
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    name: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive :func:`stream_sessionize_timeout` over a parquet drop-zone
    to completion; returns the emitted (append-mode) closed sessions."""
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)
    reader = spark.readStream.schema(_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_events_ts(reader.parquet(source_dir)).withWatermark(
        "ts", watermark
    )
    sessions = stream_sessionize_timeout(stream, gap_minutes)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # see run_stateful_stream: termination, not processAllAvailable,
        # is the barrier that includes the timer-firing no-data batch;
        # loud on timeout for the same partial-read reason
        if not q.awaitTermination(600):
            raise TimeoutError(
                f"availableNow run '{name}' exceeded 600s; memory-sink "
                "contents are incomplete"
            )
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def run_sessionize_to_parquet(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> None:
    """:func:`stream_sessionize_timeout` → parquet file sink with a
    checkpoint — the production persistence shape for the STATEFUL
    session job, whose state (open sessions + event-time timers) is the
    fragile kind across restarts. The checkpoint carries the state
    store, the watermark, and the file-source progress; the file-sink
    manifest gives exactly-once output. Restart parity is proven in
    tests by a stop/extend/restart cycle against a single-pass run:
    identical session BOUNDARIES (user, start, end, n_events) with no
    duplicates. ``closed_by`` labels may legitimately differ across the
    cut ("timeout" in the first run where a single pass would say
    "gap"): a session that times out before the restart stays closed —
    by construction an event landing after the cut is past the gap
    anyway, so the boundaries are unaffected."""
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)
    stream = normalize_events_ts(
        spark.readStream.schema(_EVENTS_SCHEMA).parquet(source_dir)
    ).withWatermark("ts", watermark)
    sessions = stream_sessionize_timeout(stream, gap_minutes)
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # termination includes the timer-firing no-data batch; a False
        # return means the availableNow run is still going — the
        # finally-stop() would then kill it mid-batch and silently
        # leave partial output, so fail loudly instead (round-5
        # advice).
        if not q.awaitTermination(600):
            raise TimeoutError(
                "sessionize availableNow run exceeded 600s; output at "
                f"{dest} is incomplete (checkpoint {checkpoint} can resume it)"
            )
    finally:
        q.stop()


# ---------------------------------------------------------------------
# Streaming AS-OF enrichment (round 8): the CDC/enrichment twin of the
# batch `asof_join` headline query — each purchase is enriched with the
# user's latest signup at-or-before its event time, with the latest
# signup carried in the state store across micro-batches.

_ASOF_OUTPUT = (
    "event_id bigint, user_id bigint, ts timestamp, value double, "
    "signup_id bigint, signup_ts timestamp"
)
#: latest signup per user: (event_id, event-time MICROS); -1 = none
#: yet. Micros, not nanos: merge_asof promotes the time column to
#: float64 when any purchase has no match (NaN), and ns epochs
#: (~1.7e18) exceed float64's 2^53 exact-integer range — observed as
#: 1 µs signup_ts drift. µs epochs (~1.7e15) stay exact to ~year 2255.
_ASOF_STATE = "signup_id bigint, signup_us bigint"


def _make_asof_enrich():
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sid, sus = state.get if state.exists else (-1, -1)
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf["_us"] = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        )
        sigs = pdf[pdf["event_type"] == "signup"][
            ["event_id", "_us"]
        ].rename(columns={"event_id": "signup_id", "_us": "_sus"})
        if sid != -1:
            sigs = pd.concat(
                [pd.DataFrame({"signup_id": [sid], "_sus": [sus]}), sigs],
                ignore_index=True,
            )
        # deterministic among equal-time signups: the later event_id
        # wins (merge_asof backward picks the LAST row in sort order) —
        # mirrors the batch carry-forward's last() over (ts, side) sort
        sigs = sigs.sort_values(["_sus", "signup_id"], ignore_index=True)
        purch = pdf[pdf["event_type"] == "purchase"].sort_values(
            ["_us", "event_id"], ignore_index=True
        )
        if len(sigs):
            state.update(
                (int(sigs["signup_id"].iloc[-1]), int(sigs["_sus"].iloc[-1]))
            )
        else:
            state.update((sid, sus))
        if not len(purch):
            return
        merged = pd.merge_asof(
            purch[["event_id", "user_id", "_us", "value"]],
            sigs,
            left_on="_us",
            right_on="_sus",
            direction="backward",
            allow_exact_matches=True,  # signup at ts == purchase ts matches
        )
        yield pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "user_id": merged["user_id"],
                "ts": pd.to_datetime(merged["_us"], unit="us"),
                "value": merged["value"],
                "signup_id": pd.array(merged["signup_id"], dtype="Int64"),
                "signup_ts": pd.to_datetime(merged["_sus"], unit="us"),
            }
        )

    return fn


def stream_asof_enrich(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``asof_join`` headline query: enrich
    each purchase with the user's latest signup at-or-before its event
    time (``NULL`` when none), via ``applyInPandasWithState``.

    Semantics match the batch carry-forward exactly when each user's
    events arrive in event-time order across micro-batches (file
    sources dropping time-ordered files — the CDC shape; proven in
    tests as stream ≡ batch ≡ DuckDB's native ASOF JOIN). Out-of-order
    arrival within ONE micro-batch is handled (the batch is sorted and
    merge_asof'd locally); a late signup arriving whole micro-batches
    after a purchase it should have matched is the inherent streaming
    asof limit — production hardening is a watermark-delay reorder
    buffer in front, same state shape.

    Scale: state is ONE fixed-width row per user (two bigints) —
    O(distinct users), independent of stream volume; per-batch work is
    a vectorized pandas merge_asof over that key's Arrow batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_asof_enrich(),
        outputStructType=_ASOF_OUTPUT,
        stateStructType=_ASOF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_asof_to_parquet(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """:func:`stream_asof_enrich` → parquet file sink with a checkpoint
    — the production persistence shape for the stateful enrichment job.
    The checkpoint carries the per-user latest-signup state and the
    file-source progress; the file-sink manifest gives exactly-once
    output. Restart parity is proven in tests by a stop/extend/restart
    cycle: the accumulated output must equal the batch ``asof_join``
    truth over the full dataset (itself hash-verified against DuckDB's
    native ASOF JOIN), with no enriched purchase duplicated or lost
    across the cut — the state carried through the checkpoint is what
    matches post-restart purchases to pre-restart signups."""
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)
    reader = spark.readStream.schema(_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_events_ts(reader.parquet(source_dir)).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    enriched = stream_asof_enrich(stream)
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # a False return means the availableNow run is still going —
        # the finally-stop() would then kill it mid-batch and silently
        # leave partial output, so fail loudly instead
        if not q.awaitTermination(600):
            raise TimeoutError(
                "asof availableNow run exceeded 600s; output at "
                f"{dest} is incomplete (checkpoint {checkpoint} can resume it)"
            )
    finally:
        q.stop()


def run_asof_stream(
    spark: SparkSession,
    source_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive :func:`stream_asof_enrich` over a parquet drop-zone to
    completion (availableNow) and return the accumulated enriched
    purchases as a batch DataFrame."""
    from arnab_spark.spark_utils import configure, normalize_events_ts
    from arnab_spark.streaming.jobs import _EVENTS_SCHEMA

    configure(spark)
    reader = spark.readStream.schema(_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_events_ts(reader.parquet(source_dir)).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    enriched = stream_asof_enrich(stream)
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # loud on timeout: a truncated availableNow run would read back
        # a silently partial memory table (see run_stateful_stream)
        if not q.awaitTermination(600):
            raise TimeoutError(
                f"availableNow run '{name}' exceeded 600s; memory-sink "
                "contents are incomplete"
            )
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
