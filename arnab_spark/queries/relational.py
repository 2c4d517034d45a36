"""Scans, projection, filtering, distinct, set ops, CTEs, subqueries,
sort/limit (SURVEY.md §2.B rows "Scans", "Projection / filter",
"Set operations", "CTEs / subqueries", "Sort / limit / top-k").

Scale notes: all filters/projections here are expressed declaratively so
Catalyst pushes them into the Parquet scan (`PushedFilters`/`ReadSchema`
in .explain). Top-k uses TakeOrderedAndProject (no global sort). Set ops
are partition-local unions; only the DISTINCT variants shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arnab_spark.queries import query
from arnab_spark.spark_utils import load_table, register_views


@query(
    "scan_project_filter",
    oracle="""
SELECT l_orderkey, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity < 10
""",
    tags=("scan",),
)
def scan_project_filter(spark, sf_dir):
    """Projection + filter — both push down to the Parquet reader
    (ReadSchema lists 4 columns; PushedFilters carries both predicates)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_extendedprice", "l_shipdate")


@query(
    "filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 50000 AND 150000
  AND o_orderpriority LIKE '%URGENT%'
  AND o_custkey IS NOT NULL
""",
    tags=("filter",),
)
def filter_predicates(spark, sf_dir):
    """Compound predicates: IN, BETWEEN, LIKE, IS NOT NULL, AND/OR."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "filter_ilike_nullsafe",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name ILIKE '%GREEN%' OR p_brand IS NOT DISTINCT FROM 'Brand#13'
""",
    tags=("filter", "dialect"),
)
def filter_ilike_nullsafe(spark, sf_dir):
    """ILIKE (case-insensitive LIKE) + null-safe equality
    (DuckDB `IS NOT DISTINCT FROM` ≡ Spark `<=>`)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").ilike("%GREEN%") | F.col("p_brand").eqNullSafe(F.lit("Brand#13"))
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "case_coalesce",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
       GREATEST(o_totalprice, 100000.0) AS floor_price,
       LEAST(o_totalprice, 200000.0) AS cap_price
FROM orders
""",
    tags=("projection",),
)
def case_coalesce(spark, sf_dir):
    """CASE WHEN / COALESCE / NULLIF / GREATEST / LEAST."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_price"),
        F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("cap_price"),
    )


@query(
    "cast_try_cast",
    oracle="""
SELECT c_custkey,
       CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
       CAST(c_custkey AS VARCHAR) AS key_str,
       TRY_CAST(c_mktsegment AS DOUBLE) AS seg_num,
       TRY_CAST(substr(c_name, 10) AS BIGINT) AS name_suffix_num
FROM customer
""",
    tags=("projection", "dialect"),
)
def cast_try_cast(spark, sf_dir):
    """CAST + TRY_CAST (failed casts → NULL, not error).

    Dialect note: Spark's double→integral CAST truncates toward zero
    while DuckDB's rounds half-even, so a portable model must truncate
    explicitly before casting — both sides here cast trunc(x)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey,
               CAST(c_acctbal AS BIGINT) AS bal_int,
               CAST(c_custkey AS STRING) AS key_str,
               TRY_CAST(c_mktsegment AS DOUBLE) AS seg_num,
               TRY_CAST(substr(c_name, 10) AS BIGINT) AS name_suffix_num
        FROM customer
        """
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def distinct_rows(spark, sf_dir):
    """DISTINCT — hash-aggregate shuffle on all projected columns."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()


@query(
    "distinct_on",
    oracle="""
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
FROM orders
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
""",
    tags=("distinct", "dialect"),
)
def distinct_on(spark, sf_dir):
    """DuckDB's DISTINCT ON → the classic Spark rewrite:
    row_number() over (partition by key order by ...) = 1.
    One shuffle on the key; at scale this beats a self-join-on-max.
    Implemented by the reusable :func:`arnab_spark.operators.distinct_on`."""
    from arnab_spark.operators import distinct_on as distinct_on_op

    o = load_table(spark, sf_dir, "orders")
    return distinct_on_op(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@query(
    "select_exclude_replace",
    oracle="""
SELECT * EXCLUDE (c_name, c_acctbal) REPLACE (upper(c_mktsegment) AS c_mktsegment)
FROM customer
""",
    tags=("projection", "dialect"),
)
def select_exclude_replace(spark, sf_dir):
    """DuckDB `SELECT * EXCLUDE (...) REPLACE (...)` → df.drop +
    withColumn."""
    c = load_table(spark, sf_dir, "customer")
    return c.drop("c_name", "c_acctbal").withColumn(
        "c_mktsegment", F.upper(F.col("c_mktsegment"))
    )


@query(
    "values_inline",
    oracle="""
SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag)
""",
    tags=("scan",),
)
def values_inline(spark, sf_dir):
    """Inline VALUES relation (LocalRelation — no scan at all)."""
    return spark.sql("SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') AS t(id, tag)")


@query(
    "range_generator",
    oracle="SELECT CAST(range AS BIGINT) AS id, range * 2 AS doubled FROM range(0, 100)",
    tags=("scan",),
)
def range_generator(spark, sf_dir):
    """range() table function ≡ spark.range — a parallelizable generator
    (each partition generates its slice; no driver materialization)."""
    return spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )


@query(
    "union_all",
    oracle="""
SELECT c_custkey AS key, c_name AS name FROM customer
UNION ALL
SELECT s_suppkey AS key, s_name AS name FROM supplier
""",
    tags=("setop",),
)
def union_all(spark, sf_dir):
    """UNION ALL — pure concatenation, no shuffle."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return c.union(s)


@query(
    "union_distinct_by_name",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop",),
)
def union_distinct_by_name(spark, sf_dir):
    """UNION (distinct) via unionByName + distinct — by-name resolution
    is DuckDB's `UNION BY NAME` extension."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "intersect_except",
    oracle="""
SELECT nk, kind FROM (
  SELECT c_nationkey AS nk, 'both' AS kind FROM customer
  INTERSECT
  SELECT s_nationkey AS nk, 'both' AS kind FROM supplier
) i
UNION ALL
SELECT nk, kind FROM (
  SELECT c_nationkey AS nk, 'cust_only' AS kind FROM customer
  EXCEPT
  SELECT s_nationkey AS nk, 'cust_only' AS kind FROM supplier
) e
""",
    tags=("setop",),
)
def intersect_except(spark, sf_dir):
    """INTERSECT + EXCEPT (distinct set semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.withColumn("kind", F.lit("both")).intersect(s.withColumn("kind", F.lit("both")))
    only = c.withColumn("kind", F.lit("cust_only")).subtract(
        s.withColumn("kind", F.lit("cust_only"))
    )
    return both.unionAll(only)


@query(
    "intersect_except_all",
    oracle="""
SELECT x FROM (
  SELECT l_suppkey AS x FROM lineitem WHERE l_quantity < 5
  INTERSECT ALL
  SELECT l_suppkey AS x FROM lineitem WHERE l_discount > 0.05
) t
""",
    tags=("setop",),
)
def intersect_except_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics (min of multiplicities)."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_quantity") < 5).select(F.col("l_suppkey").alias("x"))
    b = l.filter(F.col("l_discount") > 0.05).select(F.col("l_suppkey").alias("x"))
    return a.intersectAll(b)


@query(
    "cte_chain",
    oracle="""
WITH big_orders AS (
  SELECT * FROM orders WHERE o_totalprice > 150000
),
by_cust AS (
  SELECT o_custkey, COUNT(*) AS n FROM big_orders GROUP BY o_custkey
)
SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS big_order_count
FROM by_cust JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tags=("cte",),
)
def cte_chain(spark, sf_dir):
    """Chained CTEs — like the reference's chained models, these stay
    lazy and collapse into ONE Catalyst plan (cross-model pushdown the
    reference only gets via DuckDB view inlining; SURVEY.md §4)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT * FROM orders WHERE o_totalprice > 150000
        ),
        by_cust AS (
          SELECT o_custkey, COUNT(*) AS n FROM big_orders GROUP BY o_custkey
        )
        SELECT c_mktsegment, SUM(n) AS big_order_count
        FROM by_cust JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@query(
    "scalar_subquery_correlated",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
""",
    tags=("subquery",),
)
def scalar_subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery (above-nation-average balance).
    Catalyst decorrelates to an aggregate + join — the same plan you
    would hand-write at scale."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "in_subquery",
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
""",
    tags=("subquery",),
)
def in_subquery(spark, sf_dir):
    """IN (subquery) — planned as a left-semi join."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        """
    )


@query(
    "order_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 5
""",
    tags=("sort",),
)
def order_limit_offset(spark, sf_dir):
    """ORDER BY + LIMIT + OFFSET. Spark plans LIMIT as
    TakeOrderedAndProject: per-partition top-(k+offset) then a single
    driver merge — no global sort even at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
    )


@query(
    "order_nulls_first_last",
    oracle="""
SELECT c_custkey, TRY_CAST(substr(c_name, 10) AS BIGINT) AS maybe_num
FROM customer
ORDER BY maybe_num DESC NULLS FIRST, c_custkey
LIMIT 50
""",
    tags=("sort",),
)
def order_nulls_first_last(spark, sf_dir):
    """NULLS FIRST/LAST ordering control."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.try_to_number(F.substring(F.col("c_name"), 10, 100), F.lit("999999999"))
            .cast("bigint")
            .alias("maybe_num"),
        )
        .orderBy(F.col("maybe_num").desc_nulls_first(), F.col("c_custkey"))
        .limit(50)
    )


@query(
    "table_sample",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 4) < '1999'
""",
    tags=("sort", "approx"),
)
def table_sample(spark, sf_dir):
    """Deterministic ~10% sample via hash-Bernoulli: keep rows whose
    md5(key) prefix falls in the first 0x1999/0x10000 ≈ 10% of hash
    space. Unlike TABLESAMPLE (engine-RNG, unverifiable), this is
    reproducible and exactly oracle-able, and it is the sampling you'd
    actually run at 100 TB: a partition-local filter, zero shuffle,
    stable under re-runs and retries. The TABLESAMPLE/USING SAMPLE SQL
    syntax itself stays covered by the dialect shim + pytest
    (tests/test_operators.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return l.filter(F.substring(F.md5(key), 1, 4) < "1999").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "recursive_cte",
    oracle="""
WITH RECURSIVE t(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM t WHERE n < 10
)
SELECT CAST(n AS BIGINT) AS n, CAST(n * n AS BIGINT) AS n_sq FROM t
""",
    tags=("cte", "recursive"),
)
def recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4.0+). Falls back to an iterative DataFrame
    union loop on engines without it."""
    try:
        return spark.sql(
            """
            WITH RECURSIVE t(n) AS (
              SELECT 1 AS n
              UNION ALL
              SELECT n + 1 FROM t WHERE n < 10
            )
            SELECT CAST(n AS BIGINT) AS n, CAST(n * n AS BIGINT) AS n_sq FROM t
            """
        )
    except Exception:
        df = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
        frontier, acc = df, df
        for _ in range(9):
            frontier = frontier.select((F.col("n") + 1).alias("n")).filter(F.col("n") <= 10)
            acc = acc.union(frontier)
        return acc.select(
            F.col("n").cast("bigint").alias("n"),
            (F.col("n") * F.col("n")).cast("bigint").alias("n_sq"),
        )
