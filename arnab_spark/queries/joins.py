"""Join operators (SURVEY.md §2.B "Joins").

The reference delegates all joins to DuckDB (its dep-extractor only walks
JOIN lists for referenced names, reference: src/node.rs:245-255). Here
each join type is a first-class Spark query.

Scale notes: Catalyst+AQE picks broadcast-hash / shuffled-hash /
sort-merge physically. We hint `broadcast()` for the provably-tiny dims
(region=5, nation=25 rows at every SF — dimension tables grow far slower
than facts) and let AQE decide for mid-size sides; skewed fact keys are
handled by `spark.sql.adaptive.skewJoin`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arnab_spark.queries import DEC, dsum, qexpr, qlong, query
from arnab_spark.spark_utils import (
    broadcast_if_small,
    load_table,
    register_views,
    table_bytes,
)

_STAR_ORACLE = """
SELECT n_name, r_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


@query("join_star_revenue", oracle=_STAR_ORACLE, headline=True, tags=("join", "tpch"))
def join_star_revenue(spark, sf_dir):
    """TPC-H Q5-shaped star join: fact → orders → dimension rollup.

    Plan shape: the three dimension tables are pre-joined into one
    (c_custkey, n_name, r_name) dim — nation/region force-broadcast
    (constant 25/5 rows at ANY sf); customer gets a size-AWARE hint
    (`broadcast_if_small`): broadcast while the customer table's real
    on-disk size is under 64 MB, shuffle join beyond. Catalyst's static
    estimate can't see that a joined dim is tiny (product-expanded
    guess), and relying on AQE re-measurement costs stage-
    materialization latency at bench scale. lineitem⋈orders stays the
    only big shuffle, both sides hashed on the same key so AQE can
    co-locate and skew-split. Revenue accumulates as quantized BIGINT
    (aggregates._qlong contract: price·(1-disc) carries exactly 4
    decimals; switch to dsum past ~1e9 rows/group — see that
    docstring for the headroom arithmetic)."""
    from arnab_spark.spark_utils import table_bytes

    register_views(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region"))
    # size-aware broadcast hints — the SQL spelling of broadcast_if_small
    # (nation/region unconditional: constant 25/5 rows at any sf).
    # When ORDERS itself is provably small (< 64 MB on disk) the whole
    # orders⋈dim build side broadcasts too and lineitem is joined with
    # ZERO shuffles — the remaining exchange carries 25 groups. Past the
    # threshold the hint is withheld and lineitem⋈orders degrades to the
    # co-hashed shuffle join, which is the right plan at 100 TB.
    dim_small = table_bytes(sf_dir, "customer") < 64 * 1024 * 1024
    ord_small = dim_small and table_bytes(sf_dir, "orders") < 64 * 1024 * 1024
    dim_hint = "/*+ BROADCAST(dim) */ " if dim_small else ""
    top_hint = "/*+ BROADCAST(ord) */ " if ord_small else ""
    # lineitem pre-aggregates per orderkey BEFORE any join: the map-side
    # combine collapses ~4 line rows to 1 partial sum, so the one fact
    # shuffle carries (orderkey, 2 BIGINTs) — and the orderkey join then
    # REUSES that hash partitioning (zero extra fact shuffle) whether
    # ord broadcasts (small SF) or co-hash-shuffles (100 TB). Measured
    # vs joining raw lineitem: 0.58-0.98 -> 0.52-0.62 s at sf0.1.
    return spark.sql(f"""
WITH dim AS (
  SELECT /*+ BROADCAST(nation), BROADCAST(region) */ c_custkey, n_name, r_name
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
ord AS (
  SELECT {dim_hint}o_orderkey, n_name, r_name
  FROM orders JOIN dim ON o_custkey = c_custkey
),
lagg AS (
  SELECT l_orderkey,
         SUM({qexpr('l_extendedprice * (1 - l_discount)', 10_000)}) AS rev_units,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT {top_hint}n_name, r_name,
       CAST(SUM(rev_units) AS DOUBLE) / 10000.0 AS revenue,
       SUM(n_lines) AS n_items
FROM lagg JOIN ord ON l_orderkey = o_orderkey
GROUP BY n_name, r_name
""")


@query(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
    tags=("join",),
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER join preserving customers with zero orders
    (COUNT(col) skips the null-extended rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC))
            .cast("double")
            .alias("spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
SELECT o_orderkey, c_name
FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
WHERE o_orderkey <= 500
""",
    tags=("join",),
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join (kept rare in practice; Catalyst flips it to a
    left join with sides swapped)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "c_name")
    )


@query(
    "join_full_outer",
    oracle="""
WITH sup AS (SELECT s_nationkey AS nk, COUNT(*) AS n_sup FROM supplier GROUP BY s_nationkey),
     cus AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cus FROM customer GROUP BY c_nationkey)
SELECT COALESCE(sup.nk, cus.nk) AS nationkey, n_sup, n_cus
FROM sup FULL OUTER JOIN cus ON sup.nk = cus.nk
""",
    tags=("join",),
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two aggregated sides (nations having only
    suppliers, only customers, or both)."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_sup"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cus"))
    )
    return s.join(c, s.nk == c.nk_c, "full").select(
        F.coalesce(s.nk, c.nk_c).alias("nationkey"), "n_sup", "n_cus"
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
    tags=("join",),
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join ≡ WHERE EXISTS. Semi joins never duplicate the left
    side, so output ≤ input — cheaper than inner+distinct at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("join",),
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join ≡ WHERE NOT EXISTS (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
    tags=("join",),
)
def join_cross(spark, sf_dir):
    """CROSS JOIN — only ever sane when at least one side is tiny
    (here 5 × 25); Spark requires the explicit crossJoin call."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
SELECT s_suppkey, COUNT(*) AS n_richer_customers
FROM supplier JOIN customer ON s_acctbal > c_acctbal
GROUP BY s_suppkey
""",
    tags=("join",),
)
def join_theta_range(spark, sf_dir):
    """Theta (non-equi) join: inequality-only predicate → broadcast
    nested-loop join. Physical rule at scale: ALWAYS broadcast the small
    side; an un-broadcast BNLJ is O(n·m) across the cluster."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(s)
        .join(c, s.s_acctbal > c.c_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
    )


@query(
    "join_using",
    oracle="""
SELECT nationkey, n.n_name, s.n_sup
FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) n
JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_sup FROM supplier GROUP BY s_nationkey) s
USING (nationkey)
""",
    tags=("join",),
)
def join_using(spark, sf_dir):
    """USING-style join on a shared column name — Spark's list-of-columns
    join form, which also dedupes the join column in the output."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_sup"))
    )
    return n.join(s, ["nationkey"]).select("nationkey", "n_name", "n_sup")


@query(
    "join_lateral",
    oracle="""
SELECT n_name, o_orderkey, o_totalprice
FROM nation,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_nationkey = n_nationkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
""",
    tags=("join", "lateral"),
)
def join_lateral(spark, sf_dir):
    """LATERAL correlated subquery in FROM (top-2 orders per nation).
    Spark 3.2+ supports lateral subqueries in SQL; Catalyst decorrelates
    to a window + filter, which is also the scalable hand-written form."""
    register_views(spark, sf_dir, ("nation", "orders", "customer"))
    return spark.sql(
        """
        SELECT n_name, o_orderkey, o_totalprice
        FROM nation,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_nationkey = n_nationkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )


@query(
    "agg_salted_skew",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "skew"),
)
def agg_salted_skew(spark, sf_dir):
    """Salting for skewed keys: aggregate on (key, salt) first — 16-way
    fan-out of each hot key — then merge the partials per key. The
    oracle is the plain one-level group-by, proving the two-level plan
    is a pure re-association (decimal sums make it exact). At 100 TB
    this caps any single reducer at 1/16th of the hottest key; the same
    trick pre-splits a skewed join side before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    salted = (
        o.withColumn("_salt", (F.col("o_orderkey") % 16).cast("int"))
        .groupBy("o_orderpriority", "_salt")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_part"),
            F.count(F.lit(1)).alias("n_part"),
        )
    )
    return salted.groupBy("o_orderpriority").agg(
        F.sum("rev_part").cast("double").alias("revenue"),
        F.sum("n_part").alias("n"),
    )


@query(
    "join_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume_units) AS DOUBLE) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT) AS volume_units
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name < n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("join", "composite", "tpch"),
)
def join_volume_shipping(spark, sf_dir):
    """TPC-H Q7-shaped composite: 6-table join with the same dimension
    (nation) joined twice under different roles, a cross-dimension
    predicate, year extraction, revenue rollup. The twice-joined tiny
    dim is broadcast twice — still zero extra shuffles. Revenue
    accumulates in qlong 1e-4 units (BIGINT fast path; price·discount
    products carry ≤4dp) with the matching floor spelling in the
    oracle."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    # build the customer side (orders⋈customer⋈n2) separately and hint
    # it when provably broadcastable, so lineitem — the only big table —
    # streams through broadcast probes with zero shuffled joins (the
    # join_star_revenue contract; degrades to co-hashed shuffle past
    # the threshold)
    oc = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.nk2)
        .select("o_orderkey", "cust_nation")
    )
    if table_bytes(sf_dir, "customer") + table_bytes(sf_dir, "orders") < 64 * 1024 * 1024:
        oc = F.broadcast(oc)
    return (
        l.join(broadcast_if_small(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.nk1)
        .join(oc, l.l_orderkey == oc.o_orderkey)
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            (
                F.sum(qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000))
                .cast("double")
                / 10_000.0
            ).alias("revenue")
        )
    )


@query(
    "join_large_orders_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
    tags=("join", "composite", "tpch"),
)
def join_large_orders_customers(spark, sf_dir):
    """TPC-H Q18-shaped composite: IN-subquery over a grouped HAVING,
    then a 3-table join + re-aggregation.

    The naive SQL form (kept verbatim in the oracle) plans the HAVING
    aggregate TWICE (once per semi join) and re-groups the joined
    lineitem on 5 keys — 3 lineitem scans, 2 agg shuffles. Because
    ``o_orderkey`` is unique in orders, the final GROUP BY collapses
    exactly the rows whose quantity sum the HAVING already computed, so
    aggregate-once → filter → join is row-identical: 1 lineitem scan,
    1 shuffle, no regroup (measured 1.59s → 0.7s at sf0.1). The same
    rewrite holds at any SF — the agg shuffles 1 row per order, and the
    dims broadcast. Quantity accumulates in qlong centi-units (BIGINT
    hash-agg fast path; l_quantity carries ≤2dp so /100.0 lands on the
    same double as the oracle's DECIMAL-sum cast)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qlong(F.col("l_quantity"), 100)).alias("qty_units"))
        .filter(F.col("qty_units") > 150 * 100)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qty_units").cast("double") / 100.0).alias("total_qty"),
        )
    )


@query(
    "join_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "tpch"),
)
def join_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped shipping priority: segment-filtered customers →
    unshipped-order revenue → global top-10. Both date filters push to
    the scans; the final ORDER BY + LIMIT compiles to TakeOrdered
    (per-partition top-k, no global sort). Ties break on l_orderkey so
    the cut is total-ordered. Revenue follows the aggregates._qlong
    BIGINT contract."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    rev_units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    # (segment-filtered customer ⋈ date-filtered orders) is the build
    # side: broadcast it while both backing tables are provably small
    # so the lineitem probe runs with zero shuffled joins (the
    # join_star_revenue contract; co-hashed shuffle past the threshold)
    co = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(F.col("o_orderdate") < cutoff), c.c_custkey == o.o_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    if table_bytes(sf_dir, "customer") + table_bytes(sf_dir, "orders") < 64 * 1024 * 1024:
        co = F.broadcast(co)
    return (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(co, co.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev_units).alias("_r"))
        .select(
            "l_orderkey",
            (F.col("_r").cast("double") / 10_000.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "join_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "tpch"),
)
def join_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped local-supplier volume: 6-table join where the
    supplier join carries a second, cross-table equality (customer and
    supplier in the same nation) — Catalyst plans both conjuncts into one
    hash-join key, no post-filter residual.

    The naive order (fact joins first, region filter last) drags ~5x
    the surviving rows through every join. Instead the ASIA nation list
    (broadcast, ≤25 rows at any SF) restricts CUSTOMER up front and
    carries n_name with it, so orders/lineitem survivors shrink by the
    region selectivity immediately and the late nation/region joins
    disappear entirely — semantics identical because the supplier join
    already forces s_nationkey = c_nationkey. The date range pushes to
    the orders scan. Revenue uses the BIGINT-quantized contract
    (aggregates._qlong rationale). Result is nation-count-sized, so the
    final sort is trivial at any SF.

    sf10 residual: TERMINAL (round 15, TPCH8_DECOMP_r15.json). Stage
    walls: the lineitem x (customer x orders) fact join alone is
    3.8 s of the 4.4-4.8 s total (DuckDB split 0.35 s) — the scan +
    probe IS the query. The pre-stated late-name variant (group by
    the INT nationkey, attach n_name post-agg from the 25-row
    broadcast, pruned supplier build) measured 0.96x / 0.99x —
    refuted: the dictionary-encoded n_name payload costs nothing.
    Single-box scan/probe constant; not re-measured after r15."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    rev_units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    asia = (
        n.join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    c_asia = c.join(F.broadcast(asia), c.c_nationkey == asia.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    # when customer+orders are provably broadcastable, hint the whole
    # (customer⋈orders) build side so lineitem — the one table that is
    # actually big — streams through broadcast probes with ZERO shuffled
    # joins (same size-aware contract as join_star_revenue; past the
    # threshold this is the co-hashed shuffle join, the 100 TB plan)
    co = c_asia.join(
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
        c_asia.c_custkey == o.o_custkey,
    ).select("o_orderkey", "c_nationkey", "n_name")
    if table_bytes(sf_dir, "customer") + table_bytes(sf_dir, "orders") < 64 * 1024 * 1024:
        co = F.broadcast(co)
    return (
        l.join(co, l.l_orderkey == co.o_orderkey)
        .join(
            broadcast_if_small(s, sf_dir, "supplier"),
            (l.l_suppkey == s.s_suppkey) & (co.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg((F.sum(rev_units).cast("double") / 10_000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "join_returned_item_revenue",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "tpch"),
)
def join_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10-shaped returned-item report: which customers returned
    the most merchandise last quarter. The returnflag filter pushes to
    the lineitem scan (dictionary-encoded column → row-group pruning at
    scale) and the quarter filter to orders, so the join sees one
    quarter x one flag.

    Round-15 rewrite (TPCH8_DECOMP_r15.json — late attribute
    materialization, the BM25/funnel move): the r13 spelling joined
    customer BEFORE aggregating and carried (c_name, c_acctbal,
    n_name) string payloads through the fact join and the group-by
    shuffle — its isolated stage wall (the attribute-carrying join
    output alone) measured 11.3 s at sf10, ~3x the entire rewritten
    query. c_custkey is a KEY of customer, so grouping by (custkey,
    name, acctbal, n_name) == grouping by custkey: aggregate revenue
    per custkey first (compact (custkey, BIGINT) pairs, map-side
    partial agg), cut to the top 20 via TakeOrderedAndProject (revenue
    ties broken by custkey — the identical total order the old LIMIT
    used), then attach customer + nation attributes to the 20-row
    broadcast side. Adopted under the pre-stated both-orders rule:
    1.23x / 1.88x (fresh-JVM reversed order) at sf10,
    result-identical at sf0.1 and sf10; per-query DuckDB sf10 split
    0.355 s. At 100 TB the fact-side shuffle carries 16 bytes/row
    instead of the attribute strings, and the attribute join touches
    exactly 20 rows."""
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
        l_r.join(
            broadcast_if_small(o_q, sf_dir, "orders"), l_r.l_orderkey == o_q.o_orderkey
        )
        .groupBy("o_custkey")
        .agg((F.sum("units").cast("double") / 10_000.0).alias("revenue"))
    )
    top = per_cust.orderBy(F.col("revenue").desc(), "o_custkey").limit(20)
    return (
        F.broadcast(top)
        .join(c, top.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
    )


@query(
    "join_bracketed_discounts",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "tpch"),
)
def join_bracketed_discounts(spark, sf_dir):
    """TPC-H Q19-shaped disjunctive bracket query: revenue from three
    OR'd (brand, size, quantity) brackets. The interesting part is what
    Catalyst does with the disjunction: it factors the per-side
    implications out of the OR — part gets `p_brand IN (...) AND p_size
    BETWEEN 1 AND 15`, lineitem gets `l_quantity BETWEEN 1 AND 30` —
    and pushes each to its scan, so the join builds on pre-shrunk
    inputs and only the residual OR runs post-join. At 100 TB that
    factored pushdown is the difference between scanning three brands
    and scanning every part."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev_units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev_units).cast("double") / 10_000.0).alias("revenue"),
        )
    )


@query(
    "join_waiting_suppliers",
    oracle="""
WITH ofl AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), waiting AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM ofl b
  WHERE late
    AND EXISTS (SELECT 1 FROM ofl o
                WHERE o.l_orderkey = b.l_orderkey AND o.l_suppkey <> b.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM ofl o
                    WHERE o.l_orderkey = b.l_orderkey AND o.l_suppkey <> b.l_suppkey
                      AND o.late)
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    tags=("join", "tpch"),
)
def join_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21-shaped waiting-supplier report: suppliers who were the
    SOLE late shipper on finished multi-supplier orders. The oracle
    spells it as EXISTS/NOT-EXISTS; executing that literally means
    semi- and anti-joining the orders⨝lineitem frame against itself —
    THREE passes over the fact join. Instead the quantifiers collapse
    into per-order counts over ONE pass: aggregate to (orderkey,
    suppkey, any_late) pairs, then a window over orderkey counts
    suppliers and late suppliers — "another supplier exists" ≡
    n_supp > 1, "no OTHER late supplier" ≡ n_late = 1 for a row that
    is itself late. One scan, two shuffles (pair groupBy, orderkey
    window), and only (orderkey, suppkey, bool) triples ever move. At
    sf0.1 the two shapes time the same (per-stage fixed cost
    dominates); the single-pass form wins with scale because it reads
    and joins the fact table once instead of three times. 60-day ship
    lag stands in
    for the reference schema's receipt-vs-commit lag (no
    l_receiptdate / l_commitdate in the fixture)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    pairs = (
        l.join(broadcast_if_small(o.filter(F.col("o_orderstatus") == "F"), sf_dir, "orders"),
               l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        pairs.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum(F.col("late").cast("int")).over(w))
        .filter(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@query(
    "join_idle_rich_customers",
    oracle="""
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
""",
    tags=("join", "tpch"),
)
def join_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-shaped lapsed-big-spender report: customers with an
    above-average positive balance and no orders in the last year,
    totalled per nation. The global-average scalar is a 1-row aggregate
    cross-joined in (Catalyst broadcasts it — zero-cost scalar
    subquery, no collect); the decimal-accumulated average (davg
    contract) makes the `>` threshold bit-identical across engines so
    boundary customers can't flip. The NOT EXISTS is a left-anti hash
    join against only the date-surviving order keys. Balance total
    follows the dsum decimal contract."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
             / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "join_salted_skew",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("join", "skew"),
)
def join_salted_skew(spark, sf_dir):
    """Salting for a skewed JOIN key (the join twin of agg_salted_skew):
    the fact side gets a deterministic salt in [0,8), the dimension side
    is replicated once per salt value, and the join runs on
    (key, salt) — so a key hot enough to overwhelm one reducer spreads
    across 8. The oracle is the plain unsalted join + rollup, proving
    salting is a pure partitioning change, not a semantic one. This is
    the manual form of what AQE skew-join does adaptively; the manual
    form still matters at 100 TB when skew is KNOWN up front (power-law
    user keys), because it avoids AQE's detect-then-split replan and
    works in plain batch stages. Cost: dim side x8 — only ever applied
    to broadcast-size dims or the provably-hot key subset."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    k = 8
    o_s = o.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(k)).cast("int")
    )
    c_rep = c.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    return (
        o_s.join(c_rep, (o_s.o_custkey == c_rep.c_custkey) & (o_s._salt == c_rep._salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(qlong(F.col("o_totalprice"), 100)).cast("double") / 100.0).alias(
                "revenue"
            ),
        )
    )
