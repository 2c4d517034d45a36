"""Structured Streaming smoke + batch-equivalence tests: the streaming
jobs must produce exactly the batch corpus results on the same input
(lambda-architecture guarantee, arnab_spark.streaming docstring)."""

from arnab_spark.oracle import compare_frames
from arnab_spark.queries import all_queries
from arnab_spark.streaming import (
    run_stream_to_memory,
    stream_sessionized,
    stream_tumbling_counts,
)

SF = "/root/testdata/sf0.001"
REG = all_queries()


def test_stream_tumbling_equals_batch(spark):
    stream_df = stream_tumbling_counts(spark, SF)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "t_tumbling").toPandas()
    batch = REG["tumbling_window"].fn(spark, SF).toPandas()
    cmp = compare_frames("stream_vs_batch_tumbling", result, batch)
    assert cmp.ok, str(cmp)


def test_stream_sessionized_equals_batch(spark):
    stream_df = stream_sessionized(spark, SF)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "t_sessions").toPandas()
    batch = REG["session_window_native"].fn(spark, SF).toPandas()
    cmp = compare_frames("stream_vs_batch_sessions", result, batch)
    assert cmp.ok, str(cmp)


def test_stream_distinct_pairs_equals_batch_distinct(spark):
    """Exact streaming dedup: output == batch SELECT DISTINCT."""
    from arnab_spark.spark_utils import load_table
    from arnab_spark.streaming import stream_distinct_pairs

    stream_df = stream_distinct_pairs(spark, SF)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "t_distinct", output_mode="append")
    batch = load_table(spark, SF, "events").select("user_id", "event_type").distinct()
    cmp = compare_frames(
        "stream_vs_batch_distinct", result.toPandas(), batch.toPandas()
    )
    assert cmp.ok, str(cmp)


def test_stream_dedup_watermarked_invariants(spark):
    """Watermarked dedup: bounded state trades completeness for
    re-emission of far-apart duplicates — assert the invariants it DOES
    guarantee: key set preserved, row count between distinct and total."""
    from arnab_spark.spark_utils import load_table
    from arnab_spark.streaming import stream_dedup_watermarked

    stream_df = stream_dedup_watermarked(spark, SF)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "t_wm_dedup", output_mode="append")
    got_keys = result.select("user_id", "event_type").distinct()
    batch = load_table(spark, SF, "events")
    want_keys = batch.select("user_id", "event_type").distinct()
    cmp = compare_frames(
        "wm_dedup_key_set", got_keys.toPandas(), want_keys.toPandas()
    )
    assert cmp.ok, str(cmp)
    n_out, n_distinct, n_total = (
        result.count(),
        want_keys.count(),
        batch.count(),
    )
    assert n_distinct <= n_out <= n_total, (n_distinct, n_out, n_total)


def test_stream_stream_join_equals_batch(spark):
    """Watermarked interval join: stream-stream inner join emits exactly
    the batch join's row set."""
    from pyspark.sql import functions as F

    from arnab_spark.spark_utils import load_table
    from arnab_spark.streaming import stream_click_purchase_join

    stream_df = stream_click_purchase_join(spark, SF)
    assert stream_df.isStreaming
    result = run_stream_to_memory(stream_df, "t_ssjoin", output_mode="append")
    ev = load_table(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
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
    assert result.count() > 0
    cmp = compare_frames(
        "stream_vs_batch_ssjoin", result.toPandas(), batch.toPandas()
    )
    assert cmp.ok, str(cmp)
