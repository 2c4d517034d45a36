"""Structured Streaming extensions (SURVEY.md §7 M5).

The reference is strictly batch (single-shot run loop, reference:
session.rs:203-256; no streaming concept anywhere) — this module is a
pure extension. Design rule: every streaming aggregation REUSES the
batch corpus logic (same bucketing as queries/timeseries.py), so batch
backfill and streaming tail produce byte-identical results — the
lambda-architecture guarantee for free.
"""

from arnab_spark.streaming.jobs import (
    run_stream_to_memory,
    run_stream_to_parquet,
    stream_click_purchase_join,
    stream_dedup_watermarked,
    stream_distinct_pairs,
    stream_sessionized,
    stream_tumbling_counts,
)
from arnab_spark.streaming.stateful import (
    run_sessionize_stream,
    run_stateful_stream,
    stream_sessionize_timeout,
    stream_user_running_totals,
)

__all__ = [
    "stream_tumbling_counts",
    "stream_sessionized",
    "stream_distinct_pairs",
    "stream_dedup_watermarked",
    "stream_click_purchase_join",
    "run_stream_to_memory",
    "run_stream_to_parquet",
    "stream_user_running_totals",
    "run_stateful_stream",
    "stream_sessionize_timeout",
    "run_sessionize_stream",
]
