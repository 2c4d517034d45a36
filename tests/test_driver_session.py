"""The round driver runs queries() on ITS OWN SparkSession with stock
confs (200 shuffle partitions, machine-local timezone, no fixture
normalization). arnab_spark.spark_utils.configure must repair any
session it is handed — these tests drive that path through a fresh
``newSession()`` (separate SQLConf, same JVM) deliberately left on
Spark defaults."""

import duckdb

from arnab_spark.oracle import compare_frames
from arnab_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _pristine(spark):
    # configure()'s cache is keyed per session object and the table
    # cache per session, so a fresh newSession() is genuinely
    # unconfigured — no reaching into private caches required.
    fresh = spark.newSession()
    # simulate a stock driver session: Spark's defaults, wrong timezone
    fresh.conf.set("spark.sql.shuffle.partitions", "200")
    fresh.conf.set("spark.sql.session.timeZone", "America/New_York")
    return fresh


def test_configure_repairs_pristine_session(spark):
    qs = all_queries()
    fresh = _pristine(spark)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    # an events/timestamp query (timezone + ts-normalization sensitive)
    # and an agg query (shuffle-partition sensitive)
    for name in ("tumbling_window", "agg_pricing_summary"):
        q = qs[name]
        r = compare_frames(
            name, q.fn(fresh, SF).toPandas(), con.execute(q.oracle).fetchdf()
        )
        assert r.ok, str(r)
    assert fresh.conf.get("spark.sql.session.timeZone") == "UTC"
    assert fresh.conf.get("spark.sql.shuffle.partitions") == "8"
