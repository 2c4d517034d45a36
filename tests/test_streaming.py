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
