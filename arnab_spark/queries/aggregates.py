"""Aggregation operators (SURVEY.md §2.B "Aggregation").

Reference behavior: aggregation SQL inside a model reaches DuckDB verbatim
(reference: src/node.rs:176); the shipped example exercises a group-by
count (reference: examples/basic/orders_per_product.sql:1-3). Here each
aggregate capability is a first-class Spark query with a DuckDB oracle.

Scale notes: every groupBy below is a hash aggregate with map-side
partial aggregation (one shuffle of the *aggregated* partials, not raw
rows). Group-key cardinality is low (flags, priorities, nations), so the
shuffle volume is O(groups × partitions) — safe at 100 TB. AQE coalesces
the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arnab_spark.queries import DEC, dsum, qexpr as _qexpr, qlong, query
from arnab_spark.spark_utils import load_table

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
  CAST(SUM(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


#: the shared quantization contract lives in queries.__init__.qlong
_qlong = qlong


_DP = "l_extendedprice * (1 - l_discount)"

#: Spark-dialect spelling of the pricing summary: averages derive from
#: the sums AFTER the aggregate (Catalyst dedups the repeated SUM
#: expressions → 5 agg buffers + count per group, same plan the Column
#: formulation produced). ONE spark.sql parse ≈ 3 py4j round-trips vs
#: ~800 for nested Column ops (~0.25 s/construction, round-3 profile).
_PRICING_SPARK = f"""
WITH sums AS (
  SELECT l_returnflag, l_linestatus,
         SUM(CAST(l_quantity AS BIGINT)) AS _sq,
         SUM({_qexpr('l_extendedprice', 100)}) AS _sp,
         SUM({_qexpr(_DP, 10_000)}) AS _sd,
         SUM({_qexpr(f'{_DP} * (1 + l_tax)', 1_000_000)}) AS _sc,
         SUM({_qexpr('l_discount', 100)}) AS _sdisc,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(_sq AS DOUBLE) AS sum_qty,
       CAST(_sp AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(_sd AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(_sc AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(_sq AS DOUBLE) / count_order AS avg_qty,
       CAST(_sp AS DOUBLE) / 100.0 / count_order AS avg_price,
       CAST(_sdisc AS DOUBLE) / 100.0 / count_order AS avg_disc,
       count_order
FROM sums
"""


@query("agg_pricing_summary", oracle=_PRICING_ORACLE, headline=True, tags=("agg", "tpch"))
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: groupBy two low-cardinality keys,
    eight aggregates. Partial aggregation makes the shuffle tiny. Money
    sums accumulate as quantized BIGINT (see :func:`_qlong`) — exact,
    order-independent, and ~4x cheaper than decimal accumulation."""
    from arnab_spark.spark_utils import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_PRICING_SPARK)


@query(
    "agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 5
""",
    tags=("agg",),
)
def agg_having(spark, sf_dir):
    """GROUP BY + HAVING — post-aggregation filter (Catalyst pushes
    nothing through an agg, same semantics as SQL HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 5)
    )


@query(
    "agg_count_distinct_multi",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_count_distinct_multi(spark, sf_dir):
    """Multiple COUNT(DISTINCT) in one aggregate — Catalyst expands to
    an Expand + two-phase aggregate (single pass over the input)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg",),
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (Expand-based, still one shuffle)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg",),
)
def agg_cube(spark, sf_dir):
    """CUBE over two dimensions."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    tags=("agg",),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS + GROUPING() marker columns.

    DuckDB's GROUPING() returns BIGINT while Spark's returns BYTE; both
    sides cast to INT for schema parity... Spark side casts, oracle's
    BIGINT is cast by DuckDB only if asked — we cast in SQL too.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_filter_clause",
    oracle="""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
       COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_tax > 0.05) AS DOUBLE) AS taxed_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_filter_clause(spark, sf_dir):
    """FILTER (WHERE ...) clause on individual aggregates."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
               COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) FILTER (WHERE l_tax > 0.05) AS DOUBLE) AS taxed_price
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       (abs(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
          <= 0.10 * COUNT(DISTINCT l_orderkey)) AS orders_within_10pct,
       (abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
          <= 0.10 * COUNT(DISTINCT l_partkey)) AS parts_within_10pct
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++). The sketch VALUES differ
    across engines by construction, so the oracle checks the property
    instead: each engine's sketch must land within 10% of ITS OWN exact
    count (HLL++ at default precision is ~2%, so the bound has wide
    margin) — plus the exact counts themselves, which do compare
    hash-exactly. At 100 TB approx is THE way to count distincts — no
    giant shuffle of distinct values, just mergeable sketches."""
    l = load_table(spark, sf_dir, "lineitem")
    exact_o = F.countDistinct("l_orderkey")
    exact_p = F.countDistinct("l_partkey")
    return l.groupBy("l_returnflag").agg(
        exact_o.alias("exact_orders"),
        exact_p.alias("exact_parts"),
        (
            F.abs(F.approx_count_distinct("l_orderkey") - exact_o)
            <= 0.10 * exact_o
        ).alias("orders_within_10pct"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - exact_p) <= 0.10 * exact_p
        ).alias("parts_within_10pct"),
    )


@query(
    "agg_percentile_approx",
    oracle="""
SELECT l_linestatus,
       quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.5) AS p50,
       quantile_disc(l_extendedprice, 0.75) AS p75,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_linestatus
""",
    tags=("agg", "approx"),
)
def agg_percentile_approx(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch) — mergeable,
    single-pass, the 100 TB-safe quantile (exact percentile must
    materialize per-group sorted values; the sketch shuffles O(accuracy)
    summaries instead). With accuracy ≥ the group size the sketch is
    exact and returns the same discrete element as DuckDB's
    quantile_disc (verified rank-identical on n=7/10 and the sf0.01
    groups); beyond that it degrades gracefully to ±1/accuracy rank
    error with an unchanged plan. Scalar output columns (one per
    quantile) so the driver's pandas canonicalizer can hash them —
    round 1's array<double> output crashed it."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", 0.25, 1_000_000).alias("p25"),
        F.percentile_approx("l_extendedprice", 0.5, 1_000_000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.75, 1_000_000).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_string_agg",
    oracle="""
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_name) AS names
FROM (SELECT * FROM customer WHERE c_custkey <= 40) t
GROUP BY c_mktsegment
""",
    tags=("agg",),
)
def agg_string_agg(spark, sf_dir):
    """string_agg / listagg: collect_list sorted deterministically then
    concat — the order-insensitive-safe spelling of string aggregation."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") <= 40)
        .groupBy("c_mktsegment")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("names"))
    )


@query(
    "agg_collect_set_array",
    oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_collect_set_array(spark, sf_dir):
    """collect_set → sorted array (DuckDB: list_distinct + list_sort),
    serialized to a joined string for the driver-facing output — a
    top-level array<> column crashes the driver's pandas canonicalizer
    (round-1 finding); the array-native form stays covered in pytest
    (tests/test_corpus.py runs this same plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_stats_exact",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       sx / n AS mean_qty,
       (sxx - sx * sx / n) / n AS var_pop_qty,
       sqrt((sxx - sx * sx / n) / n) AS stddev_pop_qty
FROM s
""",
    tags=("agg", "stats"),
)
def agg_stats_exact(spark, sf_dir):
    """Variance/stddev via exact decimal moment sums (sum, sum-of-squares)
    so the result is bit-identical across engines. The native F.stddev /
    F.var_pop are also exposed (see agg_stats_native) but are
    order-dependent in IEEE float, so the compared query uses moments.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxx"),
    )
    var_pop = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    return s.select(
        "l_returnflag",
        "n",
        (F.col("sx") / F.col("n")).alias("mean_qty"),
        var_pop.alias("var_pop_qty"),
        F.sqrt(var_pop).alias("stddev_pop_qty"),
    )


@query(
    "agg_stats_native",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       TRUE AS sd_ok, TRUE AS var_ok, TRUE AS corr_ok,
       TRUE AS covar_ok, TRUE AS skew_ok, TRUE AS kurt_ok
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_stats_native(spark, sf_dir):
    """Native statistical aggregates (stddev/var/corr/covar/skew/
    kurtosis). Their raw floats are summation-order-dependent, so they
    can never hash-match another engine run — instead each native value
    is checked IN-ENGINE against the exact decimal-moment computation
    of the same statistic (the agg_stats_exact technique extended to
    3rd/4th moments and co-moments); the booleans must all come out
    TRUE to hash-match the oracle. A native aggregate drifting beyond
    1e-6 relative error flips its boolean. Round 1 shipped this
    rows-only; this gives it a real oracle (VERDICT round 1, task 3)."""
    l = load_table(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")

    def msum(expr, alias):
        # exact decimal accumulation of a per-row double product (the
        # per-row double op is a single IEEE op → identical everywhere)
        return F.sum(expr.cast(DEC)).cast("double").alias(alias)

    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.stddev("l_quantity").alias("sd_qty"),
        F.var_samp("l_extendedprice").alias("var_price"),
        F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        F.covar_pop("l_quantity", "l_discount").alias("covar_qty_disc"),
        F.skewness("l_quantity").alias("skew_qty"),
        F.kurtosis("l_quantity").alias("kurt_qty"),
        msum(q, "sq"),
        msum(q * q, "sqq"),
        msum(q * q * q, "sq3"),
        msum(q * q * q * q, "sq4"),
        msum(p, "sp"),
        msum(p * p, "spp"),
        msum(q * p, "sqp"),
        msum(d, "sd"),
        msum(q * d, "sqd"),
    )
    n = F.col("n").cast("double")
    sq, sqq, sq3, sq4 = F.col("sq"), F.col("sqq"), F.col("sq3"), F.col("sq4")
    sp, spp, sqp, sd_, sqd = F.col("sp"), F.col("spp"), F.col("sqp"), F.col("sd"), F.col("sqd")
    mean_q = sq / n
    m2c_q = sqq - sq * sq / n  # n·(population variance)
    m2c_p = spp - sp * sp / n
    m3 = (sq3 - 3 * mean_q * sqq + 2 * n * mean_q * mean_q * mean_q) / n
    m4 = (
        sq4
        - 4 * mean_q * sq3
        + 6 * mean_q * mean_q * sqq
        - 3 * n * mean_q * mean_q * mean_q * mean_q
    ) / n
    m2 = m2c_q / n

    def close(a, b, tol=1e-6):
        return F.abs(a - b) <= F.lit(tol) * F.greatest(F.lit(1.0), F.abs(b))

    return s.select(
        "l_returnflag",
        "n",
        close(F.col("sd_qty"), F.sqrt(m2c_q / (n - 1))).alias("sd_ok"),
        close(F.col("var_price"), m2c_p / (n - 1), 1e-6).alias("var_ok"),
        close(
            F.col("corr_qty_price"), (sqp - sq * sp / n) / F.sqrt(m2c_q * m2c_p), 1e-6
        ).alias("corr_ok"),
        close(F.col("covar_qty_disc"), (sqd - sq * sd_ / n) / n, 1e-6).alias("covar_ok"),
        close(F.col("skew_qty"), m3 / F.pow(m2, 1.5), 1e-6).alias("skew_ok"),
        close(F.col("kurt_qty"), m4 / (m2 * m2) - 3.0, 1e-6).alias("kurt_ok"),
    )


@query(
    "agg_arg_minmax",
    oracle="""
SELECT l_returnflag,
       min(struct_pack(a := l_shipdate, b := l_orderkey)).b AS first_order,
       max(struct_pack(a := l_shipdate, b := l_orderkey)).b AS last_order,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg",),
)
def agg_arg_minmax(spark, sf_dir):
    """arg_min/arg_max ≡ min_by/max_by via lexicographic struct min —
    BOTH sides order by (shipdate, orderkey) so ties are broken
    identically. (A bare arg_min(l_orderkey, l_shipdate) is
    nondeterministic under shipdate ties in either engine — caught by
    the sf0.01 differential run, where ties exist.)"""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               MIN(struct(l_shipdate, l_orderkey)).l_orderkey AS first_order,
               MAX(struct(l_shipdate, l_orderkey)).l_orderkey AS last_order,
               MIN(l_shipdate) AS min_ship,
               MAX(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "pivot"),
)
def agg_pivot(spark, sf_dir):
    """PIVOT: groupBy().pivot() with explicit value list (never let Spark
    scan for distinct pivot values at 100 TB — pass them)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT p_partkey, kind, val FROM (
  SELECT p_partkey, 'retail' AS kind, p_retailprice AS val FROM part
  UNION ALL
  SELECT p_partkey, 'size' AS kind, CAST(p_size AS DOUBLE) AS val FROM part
) t
""",
    tags=("agg", "pivot"),
)
def agg_unpivot(spark, sf_dir):
    """UNPIVOT via stack() — wide→long without a shuffle at all."""
    p = load_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (kind, val)",
    )


@query(
    "agg_count_star_zeroarg",
    oracle="SELECT count(*) AS item_count FROM orders",
    tags=("agg", "dialect"),
)
def agg_count_star_zeroarg(spark, sf_dir):
    """DuckDB allows zero-arg count() (used by the reference's example
    model, reference: examples/basic/orders_per_product.sql:2). Spark
    requires count(*) — the dialect shim maps count() → count(*)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.count(F.lit(1)).alias("item_count"))


@query(
    "agg_orders_per_product",
    oracle="""
SELECT p_name AS product_name, count(*) AS item_count
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_name
""",
    tags=("agg", "reference-example"),
)
def agg_orders_per_product(spark, sf_dir):
    """The reference demo pipeline's analytical model
    (reference: examples/basic/orders_per_product.sql:1-3): items per
    product name. part is small → broadcast join, no shuffle of lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_name").alias("product_name"))
        .agg(F.count(F.lit(1)).alias("item_count"))
    )


@query(
    "agg_percentile_exact",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       median(l_quantity) AS med_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "stats"),
)
def agg_percentile_exact(spark, sf_dir):
    """Exact percentiles + median (DuckDB quantile_cont). Both engines
    use the same linear-interpolation definition and the arithmetic is a
    couple of IEEE ops on sorted exact values — verified bit-identical.
    (At 100 TB prefer agg_percentile_approx: exact percentile must
    materialize per-group sorted values.)"""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile(l_extendedprice, 0.5) AS p50,
               percentile(l_extendedprice, 0.25) AS p25,
               percentile(l_extendedprice, 0.75) AS p75,
               median(l_quantity) AS med_qty
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_priority_late_orders",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
""",
    tags=("agg", "tpch"),
)
def agg_priority_late_orders(spark, sf_dir):
    """TPC-H Q4-shaped priority check: orders of one year having at
    least one lineitem shipped >90 days after ordering, counted per
    priority. The EXISTS inverts into lineitem ⋈ broadcast(filtered
    orders) + per-priority COUNT(DISTINCT orderkey): a LEFT SEMI with
    lineitem as the build side would hash the FACT table, while this
    shape streams lineitem through a broadcast probe of the one-year
    order slice and the distinct-count shuffle carries only surviving
    (priority, orderkey) pairs. Past the broadcast threshold
    broadcast_if_small withholds the hint and Catalyst plans the
    co-hashed shuffle join — same two-shuffle plan as the semi form,
    with the smaller distinct-pair stream.

    sf10 residual: TERMINAL (round 15, TPCH8_DECOMP_r15.json). Stage
    walls: the lineitem-through-orders probe is 2.2 s of the 4.0-4.8 s
    total (DuckDB split 0.50 s) — the rest is the two-phase distinct.
    The pre-stated max-shipdate pre-aggregation variant (EXISTS ==
    max(l_shipdate) > o_orderdate+90, pair shuffle instead of the
    probe) measured 1.00x / 1.12x — under the 1.15x adopt bar in both
    orders; refuted. The residual is probe + distinct-agg codegen, the
    single-box constant class; not re-measured after r15."""
    from arnab_spark.spark_utils import broadcast_if_small

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    o_year = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = l.join(
        broadcast_if_small(o_year, sf_dir, "orders"),
        (l.l_orderkey == o_year.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
    )
    return late.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderkey").alias("n_orders")
    )


@query(
    "agg_promo_revenue_share",
    oracle="""
SELECT CAST(
  100.0 * (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)
      ELSE 0 END) AS DOUBLE) / 10000.0)
  / (CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0)
AS DOUBLE) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""",
    tags=("agg", "tpch"),
)
def agg_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14-shaped promo share: single-pass ratio of conditional
    to total revenue over one month (two BIGINT accumulators, one scan,
    one tiny shuffle). part joins on its key — at bench sf AQE
    broadcasts it; at production sf it degrades to a shuffle join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev_units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(10_000.0)
        + F.lit(0.5)
    ).cast("bigint")
    month = l.filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    joined = month.join(p, month.l_partkey == p.p_partkey)
    promo_units = F.when(F.col("p_type").like("PROMO%"), rev_units).otherwise(
        F.lit(0).cast("bigint")
    )
    sums = joined.agg(
        F.sum(promo_units).alias("_pr"), F.sum(rev_units).alias("_tr")
    )
    return sums.select(
        (
            100.0
            * (F.col("_pr").cast("double") / 10_000.0)
            / (F.col("_tr").cast("double") / 10_000.0)
        ).alias("promo_share_pct")
    )


_MODE_BOOL_BITS_SQL = """
WITH vc AS (
  SELECT l_returnflag, l_linestatus AS v, COUNT(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
md AS (
  SELECT l_returnflag, v AS mode_status FROM (
    SELECT l_returnflag, v,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c DESC, v) AS rn
    FROM vc
  ) ranked WHERE rn = 1
),
ag AS (
  SELECT l_returnflag,
         bool_and(l_quantity > 0)   AS all_qty_pos,
         bool_or(l_discount > 0.09) AS any_big_disc,
         CAST(bit_and(l_suppkey) AS BIGINT) AS suppkey_band,
         CAST(bit_or(l_suppkey)  AS BIGINT) AS suppkey_bor,
         CAST(bit_xor(l_suppkey) AS BIGINT) AS suppkey_bxor
  FROM lineitem GROUP BY l_returnflag
)
SELECT ag.l_returnflag, mode_status, all_qty_pos, any_big_disc,
       suppkey_band, suppkey_bor, suppkey_bxor
FROM ag JOIN md ON ag.l_returnflag = md.l_returnflag
"""


@query("agg_mode_bool_bits", oracle=_MODE_BOOL_BITS_SQL, tags=("agg",))
def agg_mode_bool_bits(spark, sf_dir):
    """mode / bool_and / bool_or / bit_and / bit_or / bit_xor
    aggregates. Native mode() breaks ties arbitrarily in BOTH engines,
    so the corpus spells it as the deterministic two-level aggregate:
    (group, value) counts → row_number ordered by (count DESC, value) —
    ties go to the smallest value, identically everywhere. The value
    count table is tiny (distinct values per group), so the window costs
    nothing; bool/bit aggregates ride the primitive hash-agg fast path.
    """
    from arnab_spark.spark_utils import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_MODE_BOOL_BITS_SQL)


# ---------------------------------------------------------------------
# Cohort retention (round 13): the canonical product-analytics rollup —
# pure ANSI SQL, identical text on both engines.

_RETENTION_SQL = """
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey
)
SELECT
  CAST(date_trunc('month', f.first_dt) AS TIMESTAMP) AS cohort_month,
  CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
       + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT) AS month_offset,
  COUNT(DISTINCT o.o_custkey) AS n_customers
FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
GROUP BY CAST(date_trunc('month', f.first_dt) AS TIMESTAMP),
         CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
              + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT)
"""


#: Spark-side spelling (round 16, RETENTION_r16.json — the oracle above
#: is unchanged): ONE groupBy(o_custkey) computes MIN(month) and
#: collect_set(month) TOGETHER (partial aggregation dedupes months
#: map-side), the month offsets resolve in-row by exploding the
#: per-customer set, and COUNT(DISTINCT custkey) degenerates to
#: COUNT(*) because each customer contributes each of its distinct
#: offsets exactly once — the join and the second full-orders exchange
#: of the r13 spelling disappear outright (guide §2.4/§2.3). Exactness:
#: date_trunc('month', d) is monotone, so MIN(trunc(d)) = trunc(MIN(d));
#: year()/month() of the truncated month equal those of the raw date;
#: collect_set makes per-customer offsets distinct. Adopted under the
#: pre-stated both-orders rule: 1.26x (quiet-box order A) / 1.94x
#: (fresh-JVM reversed order, drift-inflated baseline — the 1.26x is
#: the conservative read), result-identical at sf0.1 and sf10; the
#: winfirst window variant also passed (1.16x/1.59x) but lost to this.
_RETENTION_SPARK_SQL = """
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


@query("orders_retention_cohort", oracle=_RETENTION_SQL, tags=("agg", "retention"))
def orders_retention_cohort(spark, sf_dir):
    """Cohort retention matrix: customers grouped by the month of their
    FIRST order (the cohort), counted in every month-offset where they
    ordered again — the triangle every growth dashboard draws. The
    month offset is exact integer calendar arithmetic
    ((Δyear)*12 + Δmonth), never a float day-difference, so both
    engines bucket identically across month-length boundaries.

    Scale shape (round 16 rewrite — decomposition and adopt protocol
    in ``_RETENTION_SPARK_SQL``'s header note and RETENTION_r16.json;
    the r15 terminal note invited exactly this structural rework): ONE
    exchange of (custkey, month) rows establishes everything — first
    month and the distinct-month set come out of the same partial
    aggregate — then a second exchange of only O(customers × months)
    exploded offset rows. The r13 spelling paid two full-orders
    exchanges plus an equi-join (stage walls: firsts agg 0.91 s, +join
    back 1.93 s of the 3.4-3.6 s sf10 total); the r15 dedup-first
    variant was refuted (0.89x/0.79x) because its window sort cost more
    than the dedup saved — this spelling dedupes in the aggregate
    WITHOUT a window. Per-customer state is O(distinct months), bounded
    by the calendar (84 months in the fixture's range), so the
    aggregation buffer is skew-safe at any scale."""
    from arnab_spark.spark_utils import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RETENTION_SPARK_SQL)
