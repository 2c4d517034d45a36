"""Round-13 (r12 verdict ask #5): decompose join_waiting_suppliers
(the TPC-H Q21 shape) at sf10 — 13.1 s of the tpch8 family's 51.7 s in
the r12 record, ~2x DuckDB — and adopt-or-refute one plan alternative.

Current plan (the audited single-fact-pass): join → groupBy
(orderkey, suppkey, max(late)) [shuffle 1, map-combined] → WINDOW over
orderkey for (n_supp, n_late) [shuffle 2 + per-partition SORT] →
filter → supplier join → top-25.

Alternative measured here ("two-level agg"): the window is replaced by
a second aggregation straight to order level — groupBy(orderkey) of
the pair frame computing n_supp = count(*), n_late = sum(late), and
THE sole late supplier as max(CASE WHEN late THEN suppkey END) (well-
defined exactly when n_late = 1, the only rows kept). Same two
shuffles, but shuffle 2 feeds a hash aggregate instead of a sort-based
window, and no per-pair rows survive past it.

ADOPT RULE (pre-stated): adopt the two-level agg iff it is >= 1.15x
faster at sf10 (min-of-3) AND result-identical to the current spelling
at sf0.1 and sf10 (exact row sets). Otherwise record the structural-
constant verdict with the bucketed metrics naming where the 2x-vs-
DuckDB residual lives.

Usage: python tools/q21_breakdown.py [out.json]  (writes Q21_BREAKDOWN_r13.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "Q21_BREAKDOWN_r13.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    import duckdb
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import configure, load_table
    from tools.gen_scale import generate, generate_sf10
    from tools.query_breakdown import breakdown_last_execution

    sf1 = generate(src="/root/testdata/sf0.1")
    sf10 = generate_sf10(sf1)

    reg = all_queries()
    q = reg["join_waiting_suppliers"]

    out: dict = {
        "round": 13,
        "adopt_rule": (
            ">=1.15x faster at sf10 (min-of-3) AND result-identical at "
            "sf0.1+sf10, else structural-constant verdict"
        ),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    # DuckDB denominator first (before the JVM exists)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf10}/{t}.parquet')"
        )
    con.execute(q.oracle).fetchall()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(q.oracle).fetchall()
        walls.append(time.perf_counter() - t0)
    out["duckdb_sf10_min"] = round(min(walls), 2)
    con.close()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("q21_breakdown")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", os.environ["ARNAB_SPARK_DRIVER_MEM"])
        .getOrCreate()
    )
    configure(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    # the bench's tpch8-scoped star-join broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def alt_two_level_agg(sf_dir: str):
        """The window-free spelling (see module docstring)."""
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem")
        s = load_table(spark, sf_dir, "supplier")
        pairs = (
            l.join(
                o.filter(F.col("o_orderstatus") == "F"),
                l.l_orderkey == o.o_orderkey,
            )
            .groupBy("l_orderkey", "l_suppkey")
            .agg(
                F.max(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
                ).alias("late")
            )
        )
        per_order = pairs.groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.col("late").cast("int")).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("l_suppkey"),
        )
        waiting = per_order.filter(
            (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        ).select("l_orderkey", "l_suppkey")
        return (
            waiting.join(s, waiting.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(25)
        )

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(1)

    def min3(build, d) -> float:
        """build: sf_dir -> DataFrame; warm + min-of-3 noop walls."""
        _noop(build(d))
        gc()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(build(d))
            walls.append(time.perf_counter() - t0)
            gc()
        return round(min(walls), 2)

    current = lambda d: q.fn(spark, d)  # noqa: E731

    # result identity at both scales
    ident = {}
    for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf10", sf10)):
        cur = sorted(tuple(r) for r in q.fn(spark, d).collect())
        alt = sorted(tuple(r) for r in alt_two_level_agg(d).collect())
        ident[label] = cur == alt
    out["result_identical"] = ident

    # sf10 walls + bucketed metrics for the current spelling
    out["current_sf10_min"] = min3(current, sf10)
    _noop(q.fn(spark, sf10))
    out["current_breakdown"] = breakdown_last_execution(spark)
    out["alt_sf10_min"] = min3(alt_two_level_agg, sf10)
    _noop(alt_two_level_agg(sf10))
    out["alt_breakdown"] = breakdown_last_execution(spark)
    out["speedup"] = round(out["current_sf10_min"] / out["alt_sf10_min"], 2)
    out["ratio_vs_duckdb_current"] = round(
        out["current_sf10_min"] / out["duckdb_sf10_min"], 2
    )
    out["ratio_vs_duckdb_alt"] = round(
        out["alt_sf10_min"] / out["duckdb_sf10_min"], 2
    )
    out["verdict"] = (
        "ADOPT"
        if out["speedup"] >= 1.15 and all(ident.values())
        else "REFUTE"
    )
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("verdict:", out["verdict"], "speedup:", out["speedup"], "->", out_path)


if __name__ == "__main__":
    main()
