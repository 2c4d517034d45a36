"""Source/sink coverage (SURVEY.md §2.B "Scans / sources / sinks"):
CSV and JSON readers through the engine's dialect shim, COPY-TO-style
exports via df.write, and round-trips back through DuckDB as the
equivalence check."""

import os

import duckdb

from arnab_spark.config import load_config
from arnab_spark.session import Session
from arnab_spark.spark_utils import load_table

SF = "/root/testdata/sf0.001"


def test_csv_source_model(spark, tmp_path):
    """read_csv_auto('x.csv') in a model → csv.`x.csv` via the shim."""
    csv_path = tmp_path / "nation.csv"
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{SF}/nation.parquet')) TO '{csv_path}' (HEADER)"
    )
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "from_csv.sql").write_text(
        f"SELECT * FROM read_csv_auto('{csv_path}')"
    )
    # scope discovery to models/ — the default models_dir "." would treat
    # nation.csv itself as a (rejected) model file
    (tmp_path / "config.yaml").write_text("models_dir: models\n")
    report = Session(load_config(str(tmp_path)), spark).run(quiet=True)
    assert report.ok, report.errors
    # *_auto variants sniff headers/types like DuckDB: 25 rows, real columns
    assert spark.table("from_csv").count() == 25
    assert "n_nationkey" in spark.table("from_csv").columns


def test_json_source_reader(spark, tmp_path):
    json_path = str(tmp_path / "region.json")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{SF}/region.parquet')) TO '{json_path}'"
    )
    df = spark.read.json(json_path)
    assert df.count() == 5 and set(df.columns) == {"r_regionkey", "r_name"}


def test_copy_to_exports(spark, tmp_path):
    """COPY ... TO equivalents: parquet/csv/json writers, verified by
    reading back through DuckDB (cross-engine round trip)."""
    region = load_table(spark, SF, "region")
    pq, csv, js = (str(tmp_path / n) for n in ("r_pq", "r_csv", "r_js"))
    region.write.mode("overwrite").parquet(pq)
    region.write.mode("overwrite").option("header", True).csv(csv)
    region.write.mode("overwrite").json(js)
    assert duckdb.sql(f"SELECT count(*) FROM read_parquet('{pq}/*.parquet')").fetchone()[0] == 5
    assert duckdb.sql(f"SELECT count(*) FROM read_csv_auto('{csv}/*.csv')").fetchone()[0] == 5
    assert duckdb.sql(f"SELECT count(*) FROM read_json_auto('{js}/*.json')").fetchone()[0] == 5


def test_partitioned_write_and_pruning(spark, tmp_path):
    """Hive-style partitioned layout + partition pruning — the at-scale
    table layout (write partitionBy, read with partition filter)."""
    out = str(tmp_path / "orders_by_status")
    load_table(spark, SF, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(out)
    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() > 0
    # partition filter must prune at planning time, not post-scan
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:120]


def test_read_source_write_sink_roundtrip(spark, tmp_path):
    from arnab_spark.sources import read_source, write_sink

    region = load_table(spark, SF, "region")
    out = str(tmp_path / "rt_csv")
    write_sink(region, "csv", out)
    back = read_source(spark, "csv", out)
    assert back.count() == 5 and set(back.columns) == {"r_regionkey", "r_name"}


def test_lakehouse_formats_stubbed_clearly(spark):
    import pytest

    from arnab_spark.errors import ArnabError
    from arnab_spark.sources import read_source

    for fmt in ("delta", "iceberg", "hudi"):
        with pytest.raises(ArnabError, match="classpath"):
            read_source(spark, fmt, "/tmp/nope")
    with pytest.raises(ArnabError, match="unknown source format"):
        read_source(spark, "avro_nope", "/tmp/nope")
