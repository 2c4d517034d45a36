"""Round-15 (r14 verdict ask #2): decompose the events-family sf10
residual the way BM25 was decomposed in r14 — per-stage walls first,
then candidate plan rewrites measured under the Q21 order-bias
protocol.

Context: the r14 run-of-record has the events family at 2.25x DuckDB
at sf10, with per-query splits (Spark record / DuckDB quiet) of
funnel 2.78/0.44, ohlc 3.32/1.37, retention 4.03/0.73, bm25 2.86/0.69.
BM25's own decomposition found 70% of its wall in avoidable joins, so
"structural constant" must be earned per query. This tool decomposes
the three never-decomposed queries:

STAGE WALLS (current spellings, sf10, min-of-3 noop-sink):
- funnel: filtered scan only -> +first_view agg -> +first_click
  join+agg -> full (3 stages + final union). The current spelling
  scans events once per stage and shuffles each stage's groupBy.
- retention: firsts agg only -> +join back to orders -> full with
  COUNT(DISTINCT). The current spelling shuffles full orders for the
  agg AND for the join probe side, then runs distinct-agg expansion.
- ohlc: bucket+window ranked only -> full. The current spelling
  shuffles all events once but sorts the full set twice (asc+desc
  row_number) inside WindowExec.

CANDIDATE REWRITES (oracle text unchanged — these change only the
Spark-side plan; all four verified oracle-identical at sf0.01 before
measurement):
- funnel_arrays: ONE pass over events, ONE shuffle — groupBy user_id
  collecting min-view + click/purchase ts arrays, funnel resolved with
  array_min(filter(...)) JVM expressions, counts via stack(). Removes
  two events scans, two stage joins, and two stage shuffles. Per-user
  state is O(events-per-user) (bounded in real user streams; the join
  spelling remains the documented unbounded-skew fallback).
- funnel_window: ONE scan, ONE shuffle — three stacked
  MIN(CASE)-over-user windows (no ORDER BY -> no range frames), then a
  per-user dedup agg that reuses the window's partitioning. Same
  semantics, sort-based instead of collect-based.
- retention_dedup: dedup to (custkey, order_month) FIRST (map-side
  combine shrinks the first shuffle from all-orders to distinct
  pairs), then a window MIN(om) over the deduped set replaces the
  orders-to-firsts join, then COUNT(*) replaces COUNT(DISTINCT)
  because rows are already unique per (cust, month). Removes the
  full-orders join shuffle and the distinct-agg expansion.
- ohlc_structagg: pure hash aggregate — open/close via
  MIN/MAX(struct(ts, event_id, value)).value (struct ordering is
  lexicographic and event_id is unique, so the tie-break is identical
  to the row_number spelling). Removes BOTH WindowExec sorts; partial
  agg combines map-side to O(buckets) rows before the shuffle.

ADOPT RULE (pre-stated, Q21 lesson applied): adopt a variant iff it is
>= 1.15x faster than the current spelling at sf10 in BOTH measurement
orders — session A measures baseline-then-variant, session B (fresh
JVM) measures variant-then-baseline, each min-of-3 after a warm run —
AND the variant is result-identical (exact row sets) at sf0.1 and
sf10. A variant that wins only in the order where it runs second is
JVM-maturity bias, not a win (that is exactly how Q21's variant A
initially read 1.18x). If no variant passes for a query, record the
TERMINAL structural-constant verdict for it and stop re-measuring.

Also records (r14 verdict ask #2's in-band residue): per-query DuckDB
sf10 walls for the whole events family, min-of-2, same connection
config as bench.py's _duck_family — the numbers SCALE.md carried in
prose now land in an artifact (and bench.py records them per-run from
this round on).

Usage: python tools/events_decomp.py [out.json]
       (writes EVENTS_DECOMP_r15.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FUNNEL_ARRAYS = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS v,
    collect_list(CASE WHEN event_type = 'click' THEN ts END) AS clicks,
    collect_list(CASE WHEN event_type = 'purchase' THEN ts END) AS purch
  FROM events
  WHERE event_type IN ('view','click','purchase')
  GROUP BY user_id
),
resolved AS (
  SELECT v, array_min(filter(clicks, x -> x > v)) AS c, purch FROM per_user
),
resolved2 AS (
  SELECT v, c, array_min(filter(purch, x -> x > c)) AS p FROM resolved
),
counts AS (SELECT COUNT(v) AS nv, COUNT(c) AS nc, COUNT(p) AS np FROM resolved2)
SELECT stage, n_users FROM counts
LATERAL VIEW stack(3, 'view', nv, 'click', nc, 'purchase', np) s AS stage, n_users
"""

FUNNEL_WINDOW = """
WITH w1 AS (
  SELECT user_id, event_type, ts,
    MIN(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id) AS v
  FROM events WHERE event_type IN ('view','click','purchase')
),
w2 AS (
  SELECT user_id, event_type, ts, v,
    MIN(CASE WHEN event_type = 'click' AND ts > v THEN ts END)
      OVER (PARTITION BY user_id) AS c
  FROM w1
),
w3 AS (
  SELECT user_id, v, c,
    MIN(CASE WHEN event_type = 'purchase' AND ts > c THEN ts END)
      OVER (PARTITION BY user_id) AS p
  FROM w2
),
per_user AS (
  SELECT user_id, MAX(v) AS v, MAX(c) AS c, MAX(p) AS p FROM w3 GROUP BY user_id
),
counts AS (SELECT COUNT(v) AS nv, COUNT(c) AS nc, COUNT(p) AS np FROM per_user)
SELECT stage, n_users FROM counts
LATERAL VIEW stack(3, 'view', nv, 'click', nc, 'purchase', np) s AS stage, n_users
"""

RETENTION_DEDUP = """
WITH m AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS om
  FROM orders GROUP BY o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE)
),
fm AS (
  SELECT o_custkey, om, MIN(om) OVER (PARTITION BY o_custkey) AS first_om
  FROM m
)
SELECT CAST(first_om AS TIMESTAMP) AS cohort_month,
       CAST((year(om) - year(first_om)) * 12
            + (month(om) - month(first_om)) AS BIGINT) AS month_offset,
       COUNT(*) AS n_customers
FROM fm
GROUP BY CAST(first_om AS TIMESTAMP),
         CAST((year(om) - year(first_om)) * 12
              + (month(om) - month(first_om)) AS BIGINT)
"""

OHLC_STRUCTAGG = """
SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
  MIN(struct(ts, event_id, value)).value AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MAX(struct(ts, event_id, value)).value AS close,
  COUNT(*) AS n_events
FROM events
GROUP BY event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP)
"""

# ---- stage prefixes of the CURRENT spellings (sf10 stage walls) -----

FUNNEL_STAGE1 = """
SELECT user_id, MIN(ts) AS view_ts
FROM events WHERE event_type = 'view' GROUP BY user_id
"""

FUNNEL_STAGE2 = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY user_id
)
SELECT e.user_id, MIN(e.ts) AS click_ts
FROM events e JOIN first_view v
  ON e.user_id = v.user_id AND e.ts > v.view_ts
WHERE e.event_type = 'click'
GROUP BY e.user_id
"""

RETENTION_STAGE1 = """
SELECT o_custkey, MIN(o_orderdate) AS first_dt
FROM orders GROUP BY o_custkey
"""

RETENTION_STAGE2 = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey, o.o_orderdate, f.first_dt
FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
"""

OHLC_STAGE1 = """
WITH base AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         value, ts, event_id
  FROM events
)
SELECT event_type, bucket, value,
  row_number() OVER (PARTITION BY event_type, bucket
                     ORDER BY ts, event_id) AS rn_first,
  row_number() OVER (PARTITION BY event_type, bucket
                     ORDER BY ts DESC, event_id DESC) AS rn_last
FROM base
"""


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
        .config("spark.driver.memory", os.environ.get("ARNAB_SPARK_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def _sql_fn(sql: str):
    def fn(spark, sf_dir):
        from arnab_spark.spark_utils import register_views

        register_views(spark, sf_dir, ("events", "orders"))
        return spark.sql(sql)

    return fn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "EVENTS_DECOMP_r15.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()

    targets = {
        "events_funnel": {
            "arrays": _sql_fn(FUNNEL_ARRAYS),
            "window": _sql_fn(FUNNEL_WINDOW),
        },
        "orders_retention_cohort": {"dedup": _sql_fn(RETENTION_DEDUP)},
        "time_resample_ohlc": {"structagg": _sql_fn(OHLC_STRUCTAGG)},
    }
    stages = {
        "events_funnel": {
            "stage1_first_view": _sql_fn(FUNNEL_STAGE1),
            "stage2_plus_first_click": _sql_fn(FUNNEL_STAGE2),
        },
        "orders_retention_cohort": {
            "stage1_firsts_agg": _sql_fn(RETENTION_STAGE1),
            "stage2_plus_join_back": _sql_fn(RETENTION_STAGE2),
        },
        "time_resample_ohlc": {"stage1_double_rownumber": _sql_fn(OHLC_STAGE1)},
    }

    out: dict = {
        "round": 15,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variant; "
            "B fresh JVM: variant-then-baseline; min-of-3 after warm) "
            "AND result-identical at sf0.1+sf10, else TERMINAL per query"
        ),
        "loadavg_start": list(os.getloadavg()),
        "queries": {},
    }

    # ---- session A: identity checks, stage walls, baseline-then-variant
    spark = _session("events_decomp_a")
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
    spark = _session("events_decomp_b")
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

    # ---- verdicts
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
                "TERMINAL: no pre-stated variant passed both orders — "
                "the sf10 residual is the single-box shuffle constant"
            )
        )

    # ---- DuckDB per-query sf10 walls (the in-band residue of ask #2)
    from arnab_spark.oracle import duckdb_connection

    con = duckdb_connection(sf10)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if cpus.isdigit():
        con.execute(f"SET threads={cpus}")
    duck: dict = {}
    for qname in (
        "events_funnel",
        "time_resample_ohlc",
        "orders_retention_cohort",
        "text_bm25_topk",
    ):
        sql = reg[qname].oracle
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            walls.append(time.perf_counter() - t0)
        duck[qname] = round(min(walls), 2)
    con.close()
    out["duckdb_sf10_queries"] = duck
    out["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        json.dumps(
            {q: r["verdict"] for q, r in out["queries"].items()}
            | {"duckdb_sf10": duck},
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
