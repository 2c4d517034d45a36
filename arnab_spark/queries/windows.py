"""Window functions (SURVEY.md §2.B "Window functions").

Scale notes: a window = one shuffle on partitionBy keys + a
per-partition sort. Partition keys here (custkey, suppkey) are
high-cardinality, so partitions stay small and skew-free; never window
over a constant key at scale (single-task sort) — the one global-order
query below bounds its input first.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arnab_spark.queries import query
from arnab_spark.spark_utils import load_table

# Deterministic total order inside each customer partition.
_ORD = "o_orderdate, o_orderkey"


@query(
    "window_ranking",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       row_number()   OVER w AS rn,
       rank()         OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
       dense_rank()   OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk,
       ntile(4)       OVER w AS quartile,
       CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
       CAST(cume_dist()    OVER w AS DOUBLE) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY {_ORD})
""",
    tags=("window",),
)
def window_ranking(spark, sf_dir):
    """Ranking family: row_number/rank/dense_rank/ntile/percent_rank/
    cume_dist over a per-customer window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_status = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w_status).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_status).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
    )


@query(
    "window_navigation",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       lag(o_orderkey)        OVER w AS prev_order,
       lead(o_orderkey)       OVER w AS next_order,
       lag(o_orderkey, 2, -1) OVER w AS prev2_order,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY {_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY {_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY {_ORD})
""",
    tags=("window",),
)
def window_navigation(spark, sf_dir):
    """Navigation family: lead/lag (+default), first/last/nth_value with
    explicit full-partition frames (the classic last_value pitfall)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@query(
    "window_running_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS window3_spend,
       COUNT(*) OVER (PARTITION BY o_custkey) AS n_cust_orders
FROM orders
""",
    tags=("window",),
)
def window_running_frame(spark, sf_dir):
    """Aggregates over ROWS frames: running total, centered 3-row window,
    plus an unordered full-partition count. Decimal accumulation keeps the
    running double sums bit-identical to the oracle."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias(
            "running_spend"
        ),
        F.sum(dec).over(w.rowsBetween(-1, 1)).cast("double").alias("window3_spend"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_cust_orders"),
    )


@query(
    "window_range_frame",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
            OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_band_sum
FROM lineitem
WHERE l_suppkey <= 3
""",
    tags=("window",),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based: all rows within 5 quantity units below
    the current row's quantity)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double").alias(
            "qty_band_sum"
        ),
    )


@query(
    "qualify_topn_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) t
WHERE rn <= 3
""",
    tags=("window", "dialect"),
)
def qualify_topn_per_group(spark, sf_dir):
    """DuckDB QUALIFY → filter on the windowed column (top-3 customers
    by balance per nation). The canonical scalable top-n-per-group:
    one shuffle, no self-join."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).cast("bigint").alias("rn")
    ).filter(F.col("rn") <= 3)
