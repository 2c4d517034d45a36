"""Round-15 (beyond the r14 asks, applying the verdict's own lesson):
decompose the WORST tpch8-family sf10 ratios — which are NOT Q21.

The r15 per-query DuckDB sf10 splits (recorded in-band since this
round) invert the family's story: Q21 `join_waiting_suppliers` (10.36 s
vs DuckDB 2.94) is the family's BEST ratio at 3.5x, while
`join_returned_item_revenue` (Q10 shape) runs 6.15 s vs 0.355 —
**17x** — `join_local_supplier_volume` (Q5) 5.21 vs 0.347 = 15x, and
`agg_priority_late_orders` (Q4) 4.37 vs 0.503 = 8.7x. The family's
"shuffle/serialization structural constant" verdict was earned for Q21
only; BM25 and the funnel showed such residuals are often avoidable
plan structure. Q21 itself is TERMINAL and is NOT re-measured here.

CANDIDATE REWRITES (oracle text unchanged; verified oracle-identical
at sf0.01 before measurement):
- q10 `lateattr` (late attribute materialization, the BM25/funnel
  move): the current spelling joins customer (1.5M rows at sf10) and
  carries (c_name, c_acctbal, n_name) string payloads through the
  fact join AND the group-by shuffle. c_custkey is a key of customer,
  so grouping by (custkey, name, acctbal, n_name) == grouping by
  custkey: aggregate revenue per custkey FIRST (map-side partial agg
  on compact (custkey, BIGINT) pairs), take the top-20 via
  TakeOrderedAndProject (revenue ties broken by custkey, identical to
  the current cut), and only THEN attach customer + nation attributes
  to 20 rows with a broadcast of the 20-row side. The fact-side
  shuffle payload drops from ~60 bytes/row of strings to 16.
- q4 `maxship`: EXISTS(l.shipdate > o.date+90) == max(l.shipdate) >
  o.date+90. Pre-aggregate lineitem to (orderkey, max_shipdate) —
  partial agg shrinks 60M rows to 15M compact pairs before the
  shuffle — then join the one-year orders and COUNT(*) per priority
  (rows already unique per order). Trades the current plan's 60M-row
  broadcast probe + two-phase distinct for one pair shuffle.
- q5 `latename`: group by the INT c_nationkey instead of carrying
  n_name through the co build, the 60M-row fact probe, and the
  group-by; attach n_name to the ~5 aggregated rows from the
  25-row broadcast at the end; prune the supplier build to its two
  key columns.

ADOPT RULE (pre-stated, identical to EVENTS_DECOMP_r15): adopt a
variant iff >= 1.15x faster than the current spelling at sf10 in BOTH
measurement orders (session A baseline-then-variant; session B, fresh
JVM, variant-then-baseline; min-of-3 after a warm run) AND
result-identical (exact row sets) at sf0.1 and sf10. Sessions run
spark.sql.autoBroadcastJoinThreshold=256MB — the same per-family knob
bench.py applies to tpch8 — so the measured plans are the graded
plans. No variant passing -> TERMINAL for that query, not re-measured.

Usage: python tools/tpch8_decomp.py [out.json]
       (writes TPCH8_DECOMP_r15.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _q10_lateattr(spark, sf_dir):
    from pyspark.sql import functions as F

    from arnab_spark.queries import qlong
    from arnab_spark.spark_utils import broadcast_if_small, load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    lo = F.lit("1997-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    rev_units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    o_q = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    l_r = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev_units.alias("units")
    )
    per_cust = (
        l_r.join(broadcast_if_small(o_q, sf_dir, "orders"), l_r.l_orderkey == o_q.o_orderkey)
        .groupBy("o_custkey")
        .agg((F.sum("units").cast("double") / 10_000.0).alias("revenue"))
    )
    top = per_cust.orderBy(F.col("revenue").desc(), "o_custkey").limit(20)
    return (
        F.broadcast(top)
        .join(c, top.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_custkey"), "c_name", "revenue", "c_acctbal", "n_name"
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
    )


def _q4_maxship(spark, sf_dir):
    from pyspark.sql import functions as F

    from arnab_spark.spark_utils import load_table

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    o_year = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l_max = (
        l.select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        o_year.join(l_max, o_year.o_orderkey == l_max.l_orderkey)
        .filter(F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _q5_latename(spark, sf_dir):
    from pyspark.sql import functions as F

    from arnab_spark.queries import qlong
    from arnab_spark.spark_utils import load_table, table_bytes

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    rev_units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    asia = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey", "n_name")
    c_asia = c.join(
        F.broadcast(asia.select("n_nationkey")), c.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey")
    co = c_asia.join(
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
        c_asia.c_custkey == o.o_custkey,
    ).select("o_orderkey", "c_nationkey")
    if table_bytes(sf_dir, "customer") + table_bytes(sf_dir, "orders") < 64 * 1024 * 1024:
        co = F.broadcast(co)
    s2 = s.select("s_suppkey", "s_nationkey")
    per_nation = (
        l.select("l_orderkey", "l_suppkey", rev_units.alias("units"))
        .join(co, F.col("l_orderkey") == co.o_orderkey)
        .join(
            F.broadcast(s2),
            (F.col("l_suppkey") == s2.s_suppkey)
            & (co.c_nationkey == s2.s_nationkey),
        )
        .groupBy("c_nationkey")
        .agg((F.sum("units").cast("double") / 10_000.0).alias("revenue"))
    )
    return (
        per_nation.join(F.broadcast(asia), per_nation.c_nationkey == asia.n_nationkey)
        .select("n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---- stage prefixes of the CURRENT spellings (sf10 stage walls) -----


def _q10_stage_factjoin(spark, sf_dir):
    """Current Q10 up to the fact join output, attributes carried —
    isolates how much of the wall is the pre-aggregation join graph."""
    from pyspark.sql import functions as F

    from arnab_spark.spark_utils import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        c.join(
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            c.c_custkey == o.o_custkey,
        )
        .join(l.filter(F.col("l_returnflag") == "R"), o.o_orderkey == l.l_orderkey)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey", "l_extendedprice")
    )


def _q4_stage_probe(spark, sf_dir):
    """Current Q4 up to the lineitem-through-orders probe output."""
    from pyspark.sql import functions as F

    from arnab_spark.spark_utils import broadcast_if_small, load_table

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    o_year = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return l.join(
        broadcast_if_small(o_year, sf_dir, "orders"),
        (l.l_orderkey == o_year.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
    ).select("o_orderkey", "o_orderpriority")


def _q5_stage_factjoin(spark, sf_dir):
    """Current Q5 up to lineitem x (customer x orders), n_name carried."""
    from pyspark.sql import functions as F

    from arnab_spark.spark_utils import load_table, table_bytes

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    asia = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey", "n_name")
    c_asia = c.join(F.broadcast(asia), c.c_nationkey == asia.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    co = c_asia.join(
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
        c_asia.c_custkey == o.o_custkey,
    ).select("o_orderkey", "c_nationkey", "n_name")
    if table_bytes(sf_dir, "customer") + table_bytes(sf_dir, "orders") < 64 * 1024 * 1024:
        co = F.broadcast(co)
    return l.join(co, l.l_orderkey == co.o_orderkey).select(
        "n_name", "c_nationkey", "l_suppkey", "l_extendedprice"
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _min3(fn):
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 2), [round(r, 2) for r in runs]


def _session(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(app)
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        # the tpch8-family knob bench.py grades under (see its sf1/sf10
        # loops): measured plans == graded plans
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("ARNAB_SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "TPCH8_DECOMP_r15.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()

    targets = {
        "join_returned_item_revenue": {"lateattr": _q10_lateattr},
        "agg_priority_late_orders": {"maxship": _q4_maxship},
        "join_local_supplier_volume": {"latename": _q5_latename},
    }
    stages = {
        "join_returned_item_revenue": {"factjoin_with_attrs": _q10_stage_factjoin},
        "agg_priority_late_orders": {"probe_through_orders": _q4_stage_probe},
        "join_local_supplier_volume": {"factjoin_with_name": _q5_stage_factjoin},
    }

    out: dict = {
        "round": 15,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variant; "
            "B fresh JVM: variant-then-baseline; min-of-3 after warm, "
            "autoBroadcastJoinThreshold=256MB as bench grades tpch8) "
            "AND result-identical at sf0.1+sf10, else TERMINAL per query"
        ),
        "duckdb_sf10_reference": {
            "join_returned_item_revenue": 0.355,
            "agg_priority_late_orders": 0.503,
            "join_local_supplier_volume": 0.347,
            "join_waiting_suppliers": "2.936 (Q21 — terminal, NOT re-measured)",
        },
        "loadavg_start": list(os.getloadavg()),
        "queries": {},
    }

    # ---- session A: identity checks, stage walls, baseline-then-variant
    spark = _session("tpch8_decomp_a")
    for qname, variants in targets.items():
        cur_fn = reg[qname].fn
        rec: dict = {"variants": {}}
        cur_01, cur_10 = _rows(cur_fn(spark, sf01)), _rows(cur_fn(spark, sf10))
        base_min, base_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
        rec["current_sf10_a"] = {"min": base_min, "runs": base_runs}
        rec["stages_sf10"] = {}
        for sname, sfn in stages[qname].items():
            smin, sruns = _min3(lambda: _noop(sfn(spark, sf10)))
            rec["stages_sf10"][sname] = {"min": smin, "runs": sruns}
        for vname, vfn in variants.items():
            v: dict = {
                "identical": {
                    "sf0.1": _rows(vfn(spark, sf01)) == cur_01,
                    "sf10": _rows(vfn(spark, sf10)) == cur_10,
                }
            }
            vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
            v["sf10_a"] = {
                "min": vmin,
                "runs": vruns,
                "speedup_a": round(base_min / vmin, 2),
            }
            rec["variants"][vname] = v
        out["queries"][qname] = rec
    spark.stop()

    # ---- session B (fresh JVM): REVERSED order — variant(s) first
    spark = _session("tpch8_decomp_b")
    for qname, variants in targets.items():
        cur_fn = reg[qname].fn
        rec = out["queries"][qname]
        for vname, vfn in variants.items():
            vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
            rec["variants"][vname]["sf10_b"] = {"min": vmin, "runs": vruns}
        base_min, base_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
        rec["current_sf10_b"] = {"min": base_min, "runs": base_runs}
        for vname in variants:
            v = rec["variants"][vname]
            v["sf10_b"]["speedup_b"] = round(base_min / v["sf10_b"]["min"], 2)
    spark.stop()

    for qname, rec in out["queries"].items():
        adopted = None
        for vname, v in rec["variants"].items():
            ok = (
                v["identical"]["sf0.1"]
                and v["identical"]["sf10"]
                and v["sf10_a"]["speedup_a"] >= 1.15
                and v["sf10_b"]["speedup_b"] >= 1.15
            )
            v["passes_adopt_rule"] = ok
            if ok and (
                adopted is None
                or v["sf10_b"]["min"]
                < rec["variants"][adopted]["sf10_b"]["min"]
            ):
                adopted = vname
        rec["adopted"] = adopted
        rec["verdict"] = (
            f"ADOPT {adopted}"
            if adopted
            else (
                "TERMINAL: pre-stated variant refuted in at least one "
                "order — residual attributed per the stage walls"
            )
        )

    out["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        json.dumps({q: r["verdict"] for q, r in out["queries"].items()}, indent=1)
    )


if __name__ == "__main__":
    main()
