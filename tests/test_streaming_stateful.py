"""applyInPandasWithState: per-user running totals must carry state
across micro-batches and match the batch aggregate at end of stream."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from arnab_spark.spark_utils import load_table
from arnab_spark.streaming.stateful import run_stateful_stream

SF = "/root/testdata/sf0.001"
THRESHOLD = 300.0  # low enough that several of the 15 users cross it


@pytest.fixture(scope="module")
def split_source(spark):
    """Split the events fixture into 3 time-ordered parquet files so
    maxFilesPerTrigger=1 yields 3 micro-batches — users active across
    the whole range appear in multiple batches, exercising state
    carry-over."""
    out = "/tmp/arnab_stateful_src"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    import duckdb

    con = duckdb.connect()
    # keep ts as int64 NANOS — the fixture layout the stream reader
    # expects (DuckDB would otherwise silently downcast to µs TIMESTAMP)
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
            TO '{out}/part{i}.parquet' (FORMAT PARQUET)
            """
        )
    return out


def test_stateful_totals_match_batch(spark, split_source):
    log = run_stateful_stream(
        spark, split_source, "t_stateful", THRESHOLD, max_files_per_trigger=1
    ).toPandas()

    # state carried across batches: at least one user updated more than once
    assert log.groupby("user_id").size().max() > 1

    # final state per user = last emitted update (n_events is monotone)
    final = log.sort_values("n_events").groupby("user_id").tail(1)

    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
    )

    merged = final.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch) == len(final)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["total_value_s"] == merged["total_value_b"]).all()
    assert (
        merged["last_ts_s"].astype("datetime64[us]")
        == merged["last_ts_b"].astype("datetime64[us]")
    ).all()


def test_alert_fires_exactly_once(spark, split_source):
    log = run_stateful_stream(
        spark, split_source, "t_stateful_alert", THRESHOLD, max_files_per_trigger=1
    ).toPandas()

    alerts_per_user = log[log["alert"]].groupby("user_id").size()
    # at-most-once alerting
    assert (alerts_per_user <= 1).all()

    # every user whose lifetime total crossed the threshold alerted once
    final = log.sort_values("n_events").groupby("user_id").tail(1)
    crossed = set(final[final["total_value"] >= THRESHOLD]["user_id"])
    assert crossed, "fixture should produce at least one crossing user"
    assert set(alerts_per_user.index) == crossed

    # the alert row is the FIRST batch update where the running total
    # crossed, not the last
    for uid in crossed:
        user_log = log[log["user_id"] == uid].sort_values("n_events")
        alert_row = user_log[user_log["alert"]].iloc[0]
        pre = user_log[user_log["n_events"] < alert_row["n_events"]]
        assert (pre["total_value"] < THRESHOLD).all()


def test_timeout_sessionizer_matches_batch(spark, split_source):
    """Event-time-timeout sessionizer: gap-closed sessions must equal
    the batch gaps-and-islands answer for every non-final session, and
    final sessions whose end + gap fell below the terminal watermark
    must close as 'timeout'. Sessions still open at end-of-stream are
    (correctly) never emitted."""
    from pyspark.sql import Window

    from arnab_spark.streaming.stateful import run_sessionize_stream

    GAP_MIN = 30
    emitted = run_sessionize_stream(
        spark, split_source, "t_sessions_timeout", GAP_MIN,
        watermark="10 minutes", max_files_per_trigger=1,
    ).toPandas()

    # batch truth: sessionize the same rows with the same gap
    from arnab_spark.operators import sessionize

    e = spark.read.schema(
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(split_source).withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    batch = (
        sessionize(
            e.select("user_id", "ts", "event_id"),
            key="user_id", ts="ts", gap_seconds=GAP_MIN * 60,
            order_tiebreak="event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    import pandas as pd

    final_wm = pd.Timestamp(max_ts) - pd.Timedelta(minutes=10)
    gap = pd.Timedelta(minutes=GAP_MIN)

    last_per_user = batch.groupby("user_id")["session_id"].transform("max")
    is_last = batch["session_id"] == last_per_user
    expect_gap = batch[~is_last]
    expect_timeout = batch[is_last & (batch["session_end"] + gap < final_wm)]

    def keyset(df):
        return {
            (r.user_id, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_events)
            for r in df.itertuples()
        }

    got_gap = keyset(emitted[emitted["closed_by"] == "gap"])
    got_timeout = keyset(emitted[emitted["closed_by"] == "timeout"])
    assert got_gap == keyset(expect_gap)
    assert got_timeout == keyset(expect_timeout)
    assert len(emitted) == len(expect_gap) + len(expect_timeout)


def test_sessionize_restart_parity_exactly_once(spark):
    """Round-4 verdict item 7: the stop/extend/restart proof for the
    STATEFUL session-window job. Run the sessionizer over two source
    files to a checkpointed parquet sink, stop, drop in the third file,
    restart from the same checkpoint — then compare against a fresh
    single-pass run over all three files. Session BOUNDARIES
    (user_id, session_start, session_end, n_events) must match exactly
    and appear exactly once; only the close-reason label may differ
    across the cut (a "timeout" where the single pass says "gap" —
    same boundaries by construction, see run_sessionize_to_parquet)."""
    import shutil

    import duckdb

    from arnab_spark.streaming.stateful import run_sessionize_to_parquet

    base = "/tmp/arnab_sessionize_restart_test"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    full = os.path.join(base, "full")
    hold = os.path.join(base, "hold")
    for d in (src, full, hold):
        os.makedirs(d)
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
        shutil.copy(f"{hold}/part{i}.parquet", f"{full}/part{i}.parquet")
    for i in (0, 1):
        os.rename(f"{hold}/part{i}.parquet", f"{src}/part{i}.parquet")

    dest = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    run_sessionize_to_parquet(spark, src, dest, ckpt)
    first = spark.read.parquet(dest).toPandas()
    assert len(first) > 0  # some sessions closed before the cut

    os.rename(f"{hold}/part2.parquet", f"{src}/part2.parquet")
    run_sessionize_to_parquet(spark, src, dest, ckpt)
    restarted = spark.read.parquet(dest).toPandas()
    assert len(restarted) > len(first)

    # single-pass reference over the identical full dataset
    dest1 = os.path.join(base, "out1")
    run_sessionize_to_parquet(spark, full, dest1, os.path.join(base, "ckpt1"))
    single = spark.read.parquet(dest1).toPandas()

    keys = ["user_id", "session_start", "session_end", "n_events"]
    # exactly-once: no session duplicated (lost would fail the set match)
    assert not restarted.duplicated(keys).any()
    assert not restarted.duplicated(["user_id", "session_start"]).any()
    a = restarted[keys].sort_values(keys).reset_index(drop=True)
    b = single[keys].sort_values(keys).reset_index(drop=True)
    assert a.equals(b), (
        f"restart produced {len(a)} sessions vs single-pass {len(b)}"
    )
    shutil.rmtree(base, ignore_errors=True)


def test_totals_alert_restart_one_shot(spark):
    """Round-9: restart proof for the running-totals job — the last
    stateful operator without one. The one-shot alert is the fragile
    property: the ``alerted`` flag lives in the checkpointed state, so
    a user who crossed the threshold BEFORE the stop must not re-alert
    after the restart, and a user who crosses only AFTER it must alert
    exactly once off the carried running total. Final totals must
    equal the batch aggregate over all three files; the update log is
    written via idempotent per-batch-directory overwrite."""
    import shutil

    import duckdb

    from arnab_spark.streaming.stateful import run_totals_to_parquet

    base = "/tmp/arnab_totals_restart_test"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    hold = os.path.join(base, "hold")
    for d in (src, hold):
        os.makedirs(d)
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
    for i in (0, 1):
        os.rename(f"{hold}/part{i}.parquet", f"{src}/part{i}.parquet")

    dest = os.path.join(base, "log")
    ckpt = os.path.join(base, "ckpt")
    # threshold picked from the fixture's cumulative shape: at 2400,
    # 4 users cross inside the first two thirds and 11 only in the
    # final third — both alert paths (no re-fire / carried-total fire)
    # are exercised across the restart
    t_restart = 2400.0
    run_totals_to_parquet(spark, src, dest, ckpt, threshold_value=t_restart)
    first = spark.read.parquet(dest).toPandas()
    pre_alerted = set(first[first["alert"]]["user_id"])
    assert pre_alerted, "no user crossed before the cut — fixture too small"

    os.rename(f"{hold}/part2.parquet", f"{src}/part2.parquet")
    run_totals_to_parquet(spark, src, dest, ckpt, threshold_value=t_restart)
    log = spark.read.parquet(dest).toPandas()

    # final state per user = the row with the largest running count
    final = log.sort_values("n_events").groupby("user_id").tail(1)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in final.itertuples()
    }
    exp = {
        row[0]: (row[1], round(row[2], 2))
        for row in con.execute(
            "SELECT user_id, count(*), round(sum(round(value * 100)) / 100.0, 2)"
            " FROM e GROUP BY user_id"
        ).fetchall()
    }
    assert got == exp

    # one-shot across the restart: every user whose lifetime total
    # crosses the threshold alerts EXACTLY once in the whole log —
    # pre-cut alerts don't re-fire, post-cut crossings fire once
    alert_counts = log[log["alert"]].groupby("user_id").size()
    crossers = {u for u, (_n, tot) in exp.items() if tot >= t_restart}
    assert set(alert_counts.index) == crossers
    assert (alert_counts == 1).all(), alert_counts[alert_counts != 1]
    post_alerted = crossers - pre_alerted
    assert post_alerted, (
        "every user crossed before the cut — the carried-total alert "
        "path is unexercised"
    )
    shutil.rmtree(base, ignore_errors=True)


def test_asof_restart_parity_exactly_once(spark):
    """Round-9 (r8 verdict ask #3): the stop/extend/restart proof for
    the stateful AS-OF enrichment twin, same harness as the sessionize
    restart test. Run the enrichment over two time-ordered source files
    to a checkpointed parquet sink, stop, drop in the third file,
    restart from the same checkpoint — the accumulated sink must equal
    the batch ``asof_join`` truth over the full dataset (itself
    hash-verified against DuckDB's native ASOF JOIN), with every
    enriched purchase appearing exactly once. The checkpoint carries
    the per-user latest-signup state, so a post-restart purchase must
    still match a PRE-restart signup (asserted explicitly)."""
    import shutil

    import duckdb
    import pandas as pd

    from arnab_spark.queries import all_queries
    from arnab_spark.streaming.stateful import run_asof_to_parquet

    base = "/tmp/arnab_asof_restart_test"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    hold = os.path.join(base, "hold")
    for d in (src, hold):
        os.makedirs(d)
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
    for i in (0, 1):
        os.rename(f"{hold}/part{i}.parquet", f"{src}/part{i}.parquet")

    dest = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    run_asof_to_parquet(spark, src, dest, ckpt)
    first = spark.read.parquet(dest).toPandas()
    assert len(first) > 0  # purchases enriched before the cut

    cut_max_ns = con.execute(
        f"SELECT max(ts) FROM read_parquet('{src}/part1.parquet')"
    ).fetchone()[0]
    cut_max = pd.Timestamp(cut_max_ns, unit="ns")

    os.rename(f"{hold}/part2.parquet", f"{src}/part2.parquet")
    run_asof_to_parquet(spark, src, dest, ckpt)
    restarted = spark.read.parquet(dest).toPandas()
    assert len(restarted) > len(first)

    # exactly-once across the restart: no enriched purchase duplicated
    assert not restarted.duplicated(["event_id"]).any()

    batch = all_queries()["asof_join"].fn(spark, SF).toPandas()
    cols = ["event_id", "user_id", "ts", "value", "signup_id", "signup_ts"]
    a = restarted[cols].sort_values("event_id").reset_index(drop=True)
    b = batch[cols].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # the state survived the restart: some purchase processed AFTER the
    # cut matched a signup from BEFORE it — only the checkpointed state
    # can supply that signup
    crossed = restarted[
        restarted["signup_id"].notna()
        & (restarted["signup_ts"] <= cut_max)
        & (restarted["ts"] > cut_max)
    ]
    assert len(crossed), "no cross-restart asof match — state recovery unproven"
    shutil.rmtree(base, ignore_errors=True)


def test_asof_stream_matches_batch_and_oracle(spark, split_source):
    """Streaming asof enrichment over 3 time-ordered micro-batches must
    equal the batch `asof_join` headline query on the same events —
    which itself is hash-verified against DuckDB's native ASOF JOIN —
    including purchases whose matching signup arrived in an EARLIER
    micro-batch (the state carry) and purchases with no signup at all
    (NULL enrichment)."""
    from arnab_spark.queries import all_queries
    from arnab_spark.streaming.stateful import run_asof_stream

    got_df = run_asof_stream(
        spark, split_source, "asof_enriched", max_files_per_trigger=1
    )
    got = {
        r.event_id: (r.user_id, r.ts, r.value, r.signup_id, r.signup_ts)
        for r in got_df.collect()
    }
    batch = all_queries()["asof_join"].fn(spark, SF)
    exp = {
        r.event_id: (r.user_id, r.ts, r.value, r.signup_id, r.signup_ts)
        for r in batch.collect()
    }
    assert len(got) == len(exp) and got == exp
    # the state carry actually happened: some purchase in batch 2/3
    # matched a signup from batch 1 (cross-batch pair exists)
    import duckdb

    con = duckdb.connect()
    import pandas as pd

    # the split files carry ts as int64 NANOS (see split_source)
    b0_max = pd.Timestamp(
        con.execute(
            f"SELECT max(ts) FROM read_parquet('{split_source}/part0.parquet')"
        ).fetchone()[0],
        unit="ns",
    )
    crossed = [
        eid
        for eid, (_u, ts, _v, sid, sts) in got.items()
        if sid is not None and sts <= b0_max < ts
    ]
    assert crossed, "no cross-micro-batch asof match — state carry unproven"
