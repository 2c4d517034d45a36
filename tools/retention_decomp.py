"""Round-16 optimization: a STRUCTURALLY different spelling for
`orders_retention_cohort` (VERDICT r15 "Next round #6" — 3.7 s sf10,
~4.7x DuckDB; the r15 terminal note explicitly invited a structural
rework after the dedup-first variant was refuted 0.89x/0.79x).

The shipped spelling pays TWO full-orders exchanges plus a join: one
groupBy(o_custkey) for the first-order date, an equi-join of orders
back onto it, then the COUNT(DISTINCT custkey) expansion. Both
candidates below collapse that to ONE exchange of the (custkey, month)
stream and remove the join outright (guide §2.4 "remove shuffles
outright", §2.3 "aggregate before you shuffle"):

- `cohortset` — ONE groupBy(o_custkey) computes MIN(month) and
  collect_set(month) together (partial aggregation dedupes months
  map-side), the month offsets are resolved in-row by exploding the
  per-customer set, and COUNT(DISTINCT custkey) degenerates to
  COUNT(*) because each customer contributes each of its distinct
  offsets exactly once. No join, no window; second exchange carries
  only O(customers x months) rows.
- `winfirst` — first_dt as MIN() OVER (PARTITION BY o_custkey): the
  window replaces the aggregate+join pair (the r15 CC adoption's
  window-min move), one exchange of orders establishes the
  partitioning, then the distinct-aggregate rides on top.

Semantics notes (why the rewrites are exact): date_trunc('month', d)
is monotone, so MIN(date_trunc(month, d)) = date_trunc(month, MIN(d));
year()/month() of the truncated month equal year()/month() of the
original date; collect_set is a SET, so per-customer offsets are
distinct and COUNT(*) over (cohort, offset, one-row-per-customer)
equals COUNT(DISTINCT custkey). The DuckDB oracle text is unchanged.

ADOPT RULE (pre-stated, identical to EVENTS_DECOMP_r15): adopt a
variant iff >= 1.15x faster than the current spelling at sf10 in BOTH
measurement orders (session A baseline-then-variants; session B, fresh
JVM, variants-then-baseline; min-of-3 after a warm run) AND
result-identical (exact row sets) at sf0.1 and sf10. Best passing
variant wins; if none pass, TERMINAL (artifact committed either way).

Usage: python tools/retention_decomp.py [out.json]
       (writes measurements/r16/RETENTION_r16.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COHORTSET_SQL = """
WITH m AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mth
  FROM orders
),
g AS (
  SELECT o_custkey, MIN(mth) AS first_m, collect_set(mth) AS months
  FROM m GROUP BY o_custkey
)
SELECT first_m AS cohort_month,
       CAST((year(mth) - year(first_m)) * 12
            + (month(mth) - month(first_m)) AS BIGINT) AS month_offset,
       COUNT(*) AS n_customers
FROM g LATERAL VIEW explode(months) t AS mth
GROUP BY first_m,
         CAST((year(mth) - year(first_m)) * 12
              + (month(mth) - month(first_m)) AS BIGINT)
"""

WINFIRST_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderdate,
         MIN(o_orderdate) OVER (PARTITION BY o_custkey) AS first_dt
  FROM orders
)
SELECT CAST(date_trunc('month', first_dt) AS TIMESTAMP) AS cohort_month,
       CAST((year(o_orderdate) - year(first_dt)) * 12
            + (month(o_orderdate) - month(first_dt)) AS BIGINT) AS month_offset,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM w
GROUP BY CAST(date_trunc('month', first_dt) AS TIMESTAMP),
         CAST((year(o_orderdate) - year(first_dt)) * 12
              + (month(o_orderdate) - month(first_dt)) AS BIGINT)
"""

VARIANTS = {"cohortset": COHORTSET_SQL, "winfirst": WINFIRST_SQL}


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

        register_views(spark, sf_dir, ("orders",))
        return spark.sql(sql)

    return fn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "measurements", "r16", "RETENTION_r16.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()
    cur_fn = reg["orders_retention_cohort"].fn

    out: dict = {
        "round": 16,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variant; "
            "B fresh JVM: variant-then-baseline; min-of-3 after warm) "
            "AND result-identical at sf0.1+sf10, else TERMINAL"
        ),
        "loadavg_start": list(os.getloadavg()),
        "variants": {},
    }

    # ---- session A: identity, baseline-then-variant
    spark = _session("retention_a")
    cur_01, cur_10 = _rows(cur_fn(spark, sf01)), _rows(cur_fn(spark, sf10))
    base10_min, base10_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
    base01_min, base01_runs = _min3(lambda: _noop(cur_fn(spark, sf01)))
    out["current_sf10_a"] = {"min": base10_min, "runs": base10_runs}
    out["current_sf01_a"] = {"min": base01_min, "runs": base01_runs}
    for vname, sql in VARIANTS.items():
        vfn = _sql_fn(sql)
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
            "speedup_a": round(base10_min / vmin, 2),
        }
        vmin01, vruns01 = _min3(lambda: _noop(vfn(spark, sf01)))
        v["sf01_a"] = {
            "min": vmin01,
            "runs": vruns01,
            "speedup_a": round(base01_min / vmin01, 2),
        }
        out["variants"][vname] = v
    spark.stop()

    # ---- session B (fresh JVM): REVERSED order — variants first
    spark = _session("retention_b")
    for vname, sql in VARIANTS.items():
        vfn = _sql_fn(sql)
        vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
        out["variants"][vname]["sf10_b"] = {"min": vmin, "runs": vruns}
    base10b_min, base10b_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
    out["current_sf10_b"] = {"min": base10b_min, "runs": base10b_runs}
    for vname in VARIANTS:
        v = out["variants"][vname]
        v["sf10_b"]["speedup_b"] = round(base10b_min / v["sf10_b"]["min"], 2)
    spark.stop()

    adopted = None
    for vname, v in out["variants"].items():
        ok = (
            v["identical"]["sf0.1"]
            and v["identical"]["sf10"]
            and v["sf10_a"]["speedup_a"] >= 1.15
            and v["sf10_b"]["speedup_b"] >= 1.15
        )
        v["passes_adopt_rule"] = ok
        if ok and (
            adopted is None
            or v["sf10_b"]["min"] < out["variants"][adopted]["sf10_b"]["min"]
        ):
            adopted = vname
    out["adopted"] = adopted
    out["verdict"] = (
        f"ADOPT {adopted}"
        if adopted
        else "TERMINAL: no pre-stated variant passed both orders"
    )

    out["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"verdict": out["verdict"]}, indent=1))


if __name__ == "__main__":
    main()
