"""Checkpointed parquet sink: exactly-once across restarts. Run the
stream over two files, stop, drop in a third, restart from the same
checkpoint — the sink must contain each finalized window exactly once
and match the batch aggregation over finalized windows."""

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
BASE = "/tmp/arnab_sink_test"


@pytest.fixture()
def staged():
    shutil.rmtree(BASE, ignore_errors=True)
    src = os.path.join(BASE, "src")
    hold = os.path.join(BASE, "hold")  # OUTSIDE src: the file stream
    # source ingests every file in its dir regardless of extension
    os.makedirs(src)
    os.makedirs(hold)
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE TABLE e AS
        SELECT * EXCLUDE (ts), CAST(epoch_ns(ts) AS BIGINT) AS ts
        FROM read_parquet('{SF}/events.parquet') ORDER BY ts
        """
    )
    n = con.execute("SELECT count(*) FROM e").fetchone()[0]
    third = n // 3
    for i in range(3):
        lim = third if i < 2 else n - 2 * third
        con.execute(
            f"""
            COPY (SELECT * FROM e ORDER BY ts LIMIT {lim} OFFSET {i * third})
            TO '{hold}/part{i}.parquet' (FORMAT PARQUET)
            """
        )
    # expose only the first two files initially
    for i in (0, 1):
        os.rename(f"{hold}/part{i}.parquet", f"{src}/part{i}.parquet")
    return src


def test_parquet_sink_exactly_once_across_restart(spark, staged):
    from arnab_spark.streaming.jobs import run_stream_to_parquet

    dest = os.path.join(BASE, "out")
    ckpt = os.path.join(BASE, "ckpt")

    run_stream_to_parquet(spark, staged, dest, ckpt)
    first = spark.read.parquet(dest).toPandas()
    assert len(first) > 0  # watermark finalized at least some windows

    # "new data arrives, the job restarts from its checkpoint"
    os.rename(os.path.join(BASE, "hold", "part2.parquet"),
              os.path.join(staged, "part2.parquet"))
    run_stream_to_parquet(spark, staged, dest, ckpt)
    final = spark.read.parquet(dest).toPandas()
    assert len(final) > len(first)

    # exactly-once: no (window, event_type) appears twice
    assert not final.duplicated(["w_start", "event_type"]).any()

    # every emitted window matches the batch aggregation over all rows
    batch = (
        spark.read.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        .parquet(staged)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            F.col("n").alias("n_batch"),
        )
        .toPandas()
    )
    merged = final.merge(batch, on=["w_start", "event_type"], how="left")
    assert (merged["n"] == merged["n_batch"]).all()
