"""The remaining TPC-H query shapes (SURVEY.md §2.B "composite queries").

Round 1 + early round 2 covered Q1/Q3/Q4/Q5/Q7/Q10/Q14/Q18/Q19/Q21/Q22
analogues (aggregates.py, joins.py). This module adds the other eleven
shapes — Q2, Q6, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q20 — so every
one of the 22 classic decision-support patterns has a Spark-first
implementation with an exact DuckDB oracle. The reference delegates all
of this surface to DuckDB SQL verbatim (reference: src/node.rs:176), so
shape coverage — not text parity — is the parity bar.

Fixture adaptations (the driver's schema has no partsupp table, no
l_commitdate/l_receiptdate, no p_mfgr/p_container, no o_comment):
- "supply cost" (Q2) := min lineitem unit price per (part, supplier) —
  a deterministic per-pair aggregate standing in for ps_supplycost.
- "stock value"  (Q11) := lineitem extended-price volume per part from
  one region's suppliers, standing in for supplycost*availqty.
- "availqty threshold" (Q20) := a supplier shipping >30% of a part's
  annual volume, standing in for availqty > half of shipped quantity.
- "receipt lateness" (Q12/Q21) := shipdate > orderdate + 60 days.
- "customer comment filter" (Q13) := order priority != '1-URGENT'.
- "supplier complaints" (Q16) := negative account balance.

Exactness contract: money sums ride the BIGINT quantization in
:func:`arnab_spark.queries.qlong`; averages/decimal sums ride
dsum/davg; fraction thresholds compare in INTEGER arithmetic
(``value*10000 > total`` rather than float fractions) so no boundary
row can flip between engines. See the module docstring in
``arnab_spark/queries/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arnab_spark.queries import DEC, dsum, qlong, query
from arnab_spark.spark_utils import broadcast_if_small, load_table

_TS = lambda s: F.lit(s + " 00:00:00").cast("timestamp")  # noqa: E731


@query(
    "join_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM ps
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 1 AND 25 AND r_name = 'EUROPE'
  AND unit_cost = (
    SELECT MIN(ps2.unit_cost)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey  = ps2.l_suppkey
    JOIN nation   n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region   r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    tags=("join", "tpch"),
)
def join_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped minimum-cost supplier: for each qualifying part,
    the European supplier(s) quoting the lowest unit cost. The oracle's
    correlated MIN subquery decorrelates into a window MIN over
    l_partkey — a high-cardinality partition key, so the window
    shuffles once and never concentrates (no global sort, no
    single-partition stage at any SF). Unit cost is a single IEEE
    division (price/quantity), deterministic and identical across
    engines, and the ``==`` against the window MIN compares two copies
    of the same double — exact by construction. Orders on
    (s_acctbal DESC, n_name, s_name, p_partkey): (s_name, p_partkey)
    is unique per row, so the LIMIT cut is total-ordered.

    Plan shape: the part and supplier filters are applied BEFORE the
    per-pair aggregation (the oracle aggregates first and filters
    after, but a pair's MIN is computed within the pair, so
    restricting WHICH pairs flow never changes a surviving pair's
    value — measured 1.12s → ~0.4s at sf0.1). The dimension
    attributes ride the aggregation keys, so nothing re-joins
    post-agg."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    parts = p.filter((F.col("p_type") == "LARGE") & F.col("p_size").between(1, 25))
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        l.join(parts, l.l_partkey == parts.p_partkey)
        .join(euro_supp, l.l_suppkey == euro_supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "agg_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "tpch"),
)
def agg_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped forecast revenue change: pure scan-filter-agg,
    zero joins — the query whose entire cost is how little of the fact
    table survives the scan. All three predicates push to parquet
    (`.explain` shows them in PushedFilters), so row groups outside the
    ship-year never decompress; at 100 TB that is the difference
    between reading a year and reading the table. The discount
    BETWEEN compares doubles against double literals — both engines
    read the identical stored double, so the boundary is bit-exact.
    Revenue rides the qlong BIGINT contract (price*discount carries
    ≤4 decimals)."""
    l = load_table(spark, sf_dir, "lineitem")
    units = qlong(F.col("l_extendedprice") * F.col("l_discount"), 10_000)
    return (
        l.filter(
            (F.col("l_shipdate") >= _TS("1997-01-01"))
            & (F.col("l_shipdate") < _TS("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(units).cast("double") / 10_000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_national_market_share",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON p_partkey  = l_partkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
""",
    tags=("join", "tpch"),
)
def join_national_market_share(spark, sf_dir):
    """TPC-H Q8-shaped national market share: of the ECONOMY-part
    revenue sold into AMERICA, what fraction came from NATION_3's
    suppliers, per year. Eight-table join where nation appears TWICE
    with different roles (customer's nation gates the region filter,
    supplier's nation feeds the CASE) — the self-aliased dimension is
    the shape's point. Both nation copies and region broadcast; the
    share is a single double division of two BIGINT-quantized sums, so
    the ratio is bit-identical across engines (numerator and
    denominator are exact integers first)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.alias("n1")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    units = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= _TS("1996-01-01"))
                & (F.col("o_orderdate") < _TS("1998-01-01"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(p.filter(F.col("p_type") == "ECONOMY"), l.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
              F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.n2_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("units", units)
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("n2_name") == "NATION_3", F.col("units")).otherwise(F.lit(0))).cast("double")
                / F.sum("units").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "join_product_type_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)
              - CAST(floor(0.5 * p_retailprice * l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
         AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON p_partkey  = l_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
""",
    tags=("join", "tpch"),
)
def join_product_type_profit(spark, sf_dir):
    """TPC-H Q9-shaped product-type profit: per supplier nation per
    year, revenue minus cost over every 'gear' part ever ordered — the
    no-date-filter shape whose scan is the whole fact table, so join
    order and pushdown carry the cost. The p_name LIKE pushes to the
    part scan and the join starts from that shrunken dim. Cost adapts
    the reference's ps_supplycost as 0.5·retailprice·quantity (no
    partsupp in the fixture); revenue and cost quantize to BIGINT
    units SEPARATELY (each product is a ≤4-decimal quantity whose
    snap-to-integer is exact; the difference of two exact integers is
    exact), then one SUM over the difference."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    cost = qlong(F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity"), 10_000)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p.filter(F.col("p_name").like("%gear%")), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(rev - cost).cast("double") / 10_000.0).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "agg_important_part_value",
    oracle="""
WITH vals AS (
  SELECT l_partkey AS p_key,
         SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS units
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA'
  GROUP BY l_partkey
)
SELECT p_key AS l_partkey,
       CAST(units AS DOUBLE) / 100.0 AS part_value
FROM vals
WHERE units * 10000 > (SELECT SUM(units) FROM vals)
ORDER BY part_value DESC, l_partkey
""",
    tags=("agg", "tpch"),
)
def agg_important_part_value(spark, sf_dir):
    """TPC-H Q11-shaped important stock: parts whose traded value
    through one region's suppliers exceeds 0.01% of the region's total
    (stock value adapts ps_supplycost·availqty to lineitem volume — no
    partsupp in the fixture). The global total is a 1-row re-aggregate
    of the per-part frame, broadcast back over it (Catalyst plans the
    1-row side of the cross join as a broadcast nested loop — constant
    cost at any SF, and the per-part frame is computed ONCE and reused
    for both sides). The 0.0001 fraction compares in pure BIGINT
    arithmetic (units·10000 > total) — no float boundary to flip."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # reduce the supplier side to the AFRICA suppkey list BEFORE
    # touching lineitem — the build side shrinks by the region
    # selectivity and broadcasts while supplier is under 64 MB, so the
    # fact table streams through one broadcast probe into the groupBy
    sdim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "AFRICA")),
              n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    vals = (
        l.join(broadcast_if_small(sdim, sf_dir, "supplier"), l.l_suppkey == sdim.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(qlong(F.col("l_extendedprice"), 100)).alias("units"))
    )
    total = vals.agg(F.sum("units").alias("total_units"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("units") * 10_000 > F.col("total_units"))
        .select(
            "l_partkey",
            (F.col("units").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "agg_late_shipment_priority",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "tpch"),
)
def agg_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12-shaped shipment-priority check: among lines shipped
    >60 days after ordering (receipt-vs-commit lateness adapted to the
    fixture's columns), how many belonged to high- vs low-priority
    orders, bucketed by return flag (standing in for ship mode). The
    year filter pushes to the lineitem scan; the lateness predicate is
    a cross-table comparison so it runs as the join's residual —
    exactly where a cost-based engine puts it. Conditional counts are
    integer CASE sums: no float anywhere."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= _TS("1997-01-01"))
            & (F.col("l_shipdate") < _TS("1998-01-01"))
        )
        .join(broadcast_if_small(o, sf_dir, "orders"), l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "tpch"),
)
def join_customer_distribution(spark, sf_dir):
    """TPC-H Q13-shaped customer distribution: histogram of customers
    by how many non-urgent orders they placed, INCLUDING the
    zero-order customers — the left-outer-join-with-filtered-right
    shape (the priority predicate lives in the ON clause, not WHERE,
    so unmatched customers survive with count 0). Two cascaded
    aggregations: the first shuffles on c_custkey (high cardinality,
    scale-safe), the second on the tiny c_count domain — partial
    aggregation collapses it map-side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "join_top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(units AS DOUBLE) / 10000.0 AS total_revenue
FROM rev
JOIN supplier ON s_suppkey = supplier_no
WHERE units = (SELECT MAX(units) FROM rev)
ORDER BY s_suppkey
""",
    tags=("join", "tpch"),
)
def join_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15-shaped top supplier: the supplier(s) with the maximum
    quarterly revenue (the reference phrases it as a view + scalar MAX;
    here the view is a named DataFrame computed once). The MAX is a
    1-row re-aggregate of the per-supplier frame broadcast back over it
    — constant-size build side at any SF, and because revenue is
    BIGINT-quantized the equality against the max cannot suffer a
    float tie-break divergence. Ships ALL tied suppliers, as the spec
    requires."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= _TS("1997-07-01"))
            & (F.col("l_shipdate") < _TS("1997-10-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(qlong(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)).alias("units"))
    )
    best = rev.agg(F.max("units").alias("max_units"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("units") == F.col("max_units"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("units").cast("double") / 10_000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "agg_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("agg", "tpch"),
)
def agg_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16-shaped parts/supplier relationship: how many distinct
    suppliers can provide each surviving (brand, type, size) bucket,
    excluding blacklisted suppliers (negative balance stands in for
    the reference's complaint-comment filter). The exclusion is a
    LEFT ANTI hash join against the tiny blacklist (broadcast), never
    a NOT IN nested loop; lineitem is the part↔supplier bridge (no
    partsupp in the fixture). COUNT(DISTINCT) expands to the standard
    two-level aggregate — both shuffles keyed on high-cardinality
    composites."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    parts = p.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    blacklist = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(broadcast_if_small(parts, sf_dir, "part"), l.l_partkey == p.p_partkey)
        .join(F.broadcast(blacklist), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "agg_small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand IN ('Brand#13', 'Brand#23')
  AND p_type IN ('MEDIUM', 'SMALL')
  AND l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    tags=("agg", "tpch"),
)
def agg_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped small-quantity revenue: yearly revenue lost if
    below-one-fifth-of-average-quantity orders stopped. The oracle's
    correlated per-part AVG decorrelates into a window aggregate over
    l_partkey (high-cardinality partition — one shuffle, no
    concentration); the join only restricts WHICH parts flow, never
    drops a kept part's lineitem rows, so the window's population
    equals the correlated subquery's. The average rides the decimal
    contract (exact sum / count, cast double) and 0.2·avg is one IEEE
    multiply — the `<` boundary is bit-identical across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    parts = p.filter(
        F.col("p_brand").isin("Brand#13", "Brand#23")
        & F.col("p_type").isin("MEDIUM", "SMALL")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        l.join(parts, l.l_partkey == p.p_partkey)
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(qlong(F.col("l_extendedprice"), 100)).cast("double") / 100.0 / 7.0)
            .alias("avg_yearly")
        )
    )


@query(
    "join_majority_part_suppliers",
    oracle="""
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'hot %'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
cand AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT l_suppkey,
               10 * qty > 3 * SUM(qty) OVER (PARTITION BY l_partkey) AS major
        FROM pair)
  WHERE major
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN cand   ON s_suppkey = l_suppkey
WHERE r_name = 'ASIA'
ORDER BY s_suppkey
""",
    tags=("join", "tpch"),
)
def join_majority_part_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped potential part promotion: Asian suppliers who
    shipped more than 30% of some hot-part's 1997 volume (the
    availqty-vs-half-of-shipments test adapted to a share-of-volume
    test — no partsupp in the fixture). Pair quantities aggregate
    once; the per-part total is a window SUM over l_partkey
    (high-cardinality partition); the 30% threshold compares in pure
    BIGINT arithmetic (10·qty > 3·total). The candidate list then
    SEMI-joins supplier — the probe side never duplicates. Quantities
    are integral in the fixture, so CAST AS BIGINT is exact in both
    engines (truncation == rounding on integers)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    pair = (
        l.filter(
            (F.col("l_shipdate") >= _TS("1997-01-01"))
            & (F.col("l_shipdate") < _TS("1998-01-01"))
        )
        .join(p.filter(F.col("p_name").like("hot %")), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    cand = (
        pair.withColumn("total", F.sum("qty").over(w))
        .filter(F.col("qty") * 10 > F.col("total") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == r.r_regionkey)
        .join(cand, s.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
