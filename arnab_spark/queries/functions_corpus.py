"""Scalar function families (SURVEY.md §2.B "Scalar functions").

Every family the DuckDB dialect exposes through the reference's SQL
passthrough (reference: node.rs:176), re-expressed with built-in
`pyspark.sql.functions` — JVM-side, codegen'd, never Python UDFs, so the
whole projection stays inside WholeStageCodegen at any scale.

Cross-engine determinism notes (empirically probed):
- `round(DOUBLE, n)` disagrees between engines near ties (Spark rounds
  the shortest decimal repr HALF_UP; DuckDB rounds the binary double) →
  round lives in the no-oracle `math_native` query; oracled rounding
  goes through decimal casts.
- transcendentals (exp/ln/sin/pow/cbrt) are correctly-rounded in neither
  engine (libm vs java.lang.Math may differ in the last ulp) → native
  query. `sqrt` IS IEEE-exact in both → oracled.
- Spark `hex` returns uppercase, DuckDB lowercase → lower() both.
- Spark `dayofweek` is 1=Sunday, DuckDB 0=Sunday; `isodow` compared via
  arithmetic alignment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arnab_spark.queries import query
from arnab_spark.spark_utils import load_table, register_views


@query(
    "fn_string",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS up, lower(c_mktsegment) AS low,
       trim('  pad  ') AS trimmed,
       substr(c_name, 1, 8) AS prefix,
       replace(c_name, '#', '-') AS replaced,
       c_name || '/' || c_mktsegment AS joined,
       concat_ws(':', c_name, c_mktsegment) AS joined_ws,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       rpad(c_mktsegment, 12, '.') AS rpadded,
       starts_with(c_name, 'Customer') AS is_cust,
       ends_with(c_mktsegment, 'ING') AS seg_ing,
       contains(c_name, '#') AS has_hash,
       strpos(c_name, '#') AS hash_pos,
       left(c_name, 4) AS l4, right(c_name, 3) AS r3,
       reverse(c_mktsegment) AS seg_rev,
       repeat('ab', 3) AS reps,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
       split_part(c_name, '#', 2) AS after_hash,
       ascii(c_mktsegment) AS first_code,
       chr(CAST(65 + c_custkey % 26 AS INTEGER)) AS letter,
       levenshtein(c_mktsegment, 'MACHINERY') AS lev
FROM customer
""",
    tags=("functions", "string"),
)
def fn_string(spark, sf_dir):
    """String family: case, trim, substr, replace, concat, pad,
    starts/ends/contains, strpos, left/right, reverse, repeat, translate,
    split_part, ascii/chr, levenshtein."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey,
               upper(c_name) AS up, lower(c_mktsegment) AS low,
               trim('  pad  ') AS trimmed,
               substr(c_name, 1, 8) AS prefix,
               replace(c_name, '#', '-') AS replaced,
               c_name || '/' || c_mktsegment AS joined,
               concat_ws(':', c_name, c_mktsegment) AS joined_ws,
               CAST(length(c_name) AS BIGINT) AS name_len,
               lpad(CAST(c_custkey AS STRING), 8, '0') AS padded,
               rpad(c_mktsegment, 12, '.') AS rpadded,
               startswith(c_name, 'Customer') AS is_cust,
               endswith(c_mktsegment, 'ING') AS seg_ing,
               contains(c_name, '#') AS has_hash,
               CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
               left(c_name, 4) AS l4, right(c_name, 3) AS r3,
               reverse(c_mktsegment) AS seg_rev,
               repeat('ab', 3) AS reps,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
               split_part(c_name, '#', 2) AS after_hash,
               ascii(c_mktsegment) AS first_code,
               chr(65 + c_custkey % 26) AS letter,
               CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS lev
        FROM customer
        """
    )


@query(
    "fn_regex",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([A-Z]+)_PART', 1) AS word,
       regexp_replace(p_name, '[0-9]+', '#', 'g') AS masked,
       regexp_matches(p_name, '^PROD') AS starts_prod,
       CASE WHEN regexp_matches(p_type, 'TYPE_[0-3]$') THEN 'low' ELSE 'high' END AS type_band
FROM part
""",
    tags=("functions", "string"),
)
def fn_regex(spark, sf_dir):
    """Regex family: extract (group), replace (global — DuckDB needs the
    'g' flag, Spark is global by default: a documented dialect gap),
    match test (rlike)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([A-Z]+)_PART", 1).alias("word"),
        F.regexp_replace("p_name", r"[0-9]+", "#").alias("masked"),
        F.col("p_name").rlike("^PROD").alias("starts_prod"),
        F.when(F.col("p_type").rlike(r"TYPE_[0-3]$"), "low").otherwise("high").alias("type_band"),
    )


@query(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       quarter(o_orderdate) AS q,
       dayofyear(o_orderdate) AS doy,
       isodow(o_orderdate) AS iso_dow,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS spark_dow,
       hour(o_orderdate) AS h, minute(o_orderdate) AS mi, second(o_orderdate) AS s,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       date_trunc('hour', o_orderdate) AS hour_start,
       strftime(o_orderdate, '%Y-%m-%d %H:%M') AS fmt,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
       CAST(make_date(2020, month(o_orderdate), 15) AS TIMESTAMP) AS mid_month,
       o_orderdate + INTERVAL 5 DAY AS plus5d,
       o_orderdate - INTERVAL 36 HOUR AS minus36h,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date
FROM orders
""",
    tags=("functions", "datetime"),
)
def fn_datetime(spark, sf_dir):
    """Date/time family: extract parts, iso weekday (aligned across the
    engines' different week conventions), truncation, formatting,
    interval arithmetic, epoch, day diff."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(day(o_orderdate) AS BIGINT) AS d,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
               CAST(((dayofweek(o_orderdate) + 5) % 7) + 1 AS BIGINT) AS iso_dow,
               dayofweek(o_orderdate) AS spark_dow,
               CAST(hour(o_orderdate) AS BIGINT) AS h, CAST(minute(o_orderdate) AS BIGINT) AS mi,
               CAST(second(o_orderdate) AS BIGINT) AS s,
               date_trunc('month', o_orderdate) AS month_start,
               date_trunc('hour', o_orderdate) AS hour_start,
               date_format(o_orderdate, 'yyyy-MM-dd HH:mm') AS fmt,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
               CAST(make_date(2020, month(o_orderdate), 15) AS TIMESTAMP) AS mid_month,
               o_orderdate + INTERVAL 5 DAY AS plus5d,
               o_orderdate - INTERVAL 36 HOUR AS minus36h,
               unix_timestamp(o_orderdate) AS epoch_s,
               CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT) AS days_since_95,
               CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date
        FROM orders
        """
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 30000) AS dist,
       CAST(ceiling(l_quantity / 7.0) AS BIGINT) AS ceil7,
       CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
       l_partkey % 7 AS mod7,
       sqrt(l_quantity) AS root,
       greatest(l_quantity, 25.0) AS g25,
       least(l_quantity, 25.0) AS l25,
       CAST(l_suppkey & 12 AS BIGINT) AS band,
       CAST(l_suppkey | 1 AS BIGINT) AS bor,
       CAST(xor(l_suppkey, 5) AS BIGINT) AS bxor,
       CAST(l_suppkey << 2 AS BIGINT) AS shl,
       CAST(l_suppkey >> 1 AS BIGINT) AS shr,
       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) / 1000, 1) AS DOUBLE) AS price_k
FROM lineitem
""",
    tags=("functions", "math"),
)
def fn_math(spark, sf_dir):
    """Math family (exact subset): abs/ceil/floor/sign/mod/sqrt (IEEE-
    exact)/greatest/least/bitwise ops, and rounding via decimal (the
    cross-engine-safe spelling; raw round(double) is in math_native)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 30000) AS dist,
               ceiling(l_quantity / 7.0) AS ceil7,
               floor(l_quantity / 7.0) AS floor7,
               CAST(signum(l_discount - 0.05) AS INT) AS disc_sign,
               l_partkey % 7 AS mod7,
               sqrt(l_quantity) AS root,
               greatest(l_quantity, 25.0D) AS g25,
               least(l_quantity, 25.0D) AS l25,
               l_suppkey & 12 AS band,
               l_suppkey | 1 AS bor,
               l_suppkey ^ 5 AS bxor,
               l_suppkey << 2 AS shl,
               l_suppkey >> 1 AS shr,
               CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) / 1000, 1) AS DOUBLE) AS price_k
        FROM lineitem
        """
    )


@query("fn_math_native", oracle=None, tags=("functions", "math", "approx"))
def fn_math_native(spark, sf_dir):
    """Transcendentals + double rounding — full Spark surface, rows-only
    check (libm last-ulp differences make exact cross-engine comparison
    meaningless)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        F.exp(F.col("l_discount")).alias("e_disc"),
        F.log(F.col("l_extendedprice")).alias("ln_price"),
        F.log10("l_extendedprice").alias("log10_price"),
        F.log2("l_quantity").alias("log2_qty"),
        F.pow(F.col("l_quantity"), 1.5).alias("qty_15"),
        F.cbrt("l_extendedprice").alias("cbrt_price"),
        F.sin("l_quantity").alias("sin_qty"),
        F.cos("l_quantity").alias("cos_qty"),
        F.atan2(F.col("l_quantity"), F.col("l_extendedprice")).alias("angle"),
        F.round(F.col("l_extendedprice") / 1000, 1).alias("price_k_dbl"),
        F.bround(F.col("l_extendedprice") / 1000, 1).alias("price_k_banker"),
        F.rand(42).alias("rnd"),
    )


@query(
    "fn_array",
    oracle="""
SELECT l_orderkey, l_linenumber,
       range(1, l_linenumber + 1) AS seq,
       (range(1, l_linenumber + 1))[1] AS first_el,
       list_contains(range(1, l_linenumber + 1), 3) AS has3,
       len(range(1, l_linenumber + 1)) AS n,
       list_transform(range(1, l_linenumber + 1), x -> x * 2) AS doubled,
       list_filter(range(1, l_linenumber + 1), x -> x % 2 = 0) AS evens,
       CAST(list_sum(range(1, l_linenumber + 1)) AS BIGINT) AS total,
       list_sort(list_distinct([l_linenumber, 1, l_linenumber])) AS uniq,
       list_reverse(range(1, l_linenumber + 1)) AS rev,
       flatten([range(1, l_linenumber + 1), [9, 9]]) AS flat,
       list_slice(range(1, l_linenumber + 1), 1, 2) AS first2,
       CAST(coalesce(list_position(range(1, l_linenumber + 1), 2), 0) AS BIGINT) AS pos2,
       array_to_string(range(1, l_linenumber + 1), '-') AS joined
FROM lineitem
WHERE l_orderkey <= 200
""",
    tags=("functions", "array"),
)
def fn_array(spark, sf_dir):
    """Array/LIST family (DuckDB list_* → Spark array functions):
    sequence, element_at (both engines 1-based — SURVEY §2.B), contains,
    size, transform/filter lambdas, aggregate (list_sum), distinct+sort,
    reverse, flatten, slice, position, array_join. Integer arrays keep
    every value exact."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        seq.cast("array<bigint>").alias("seq"),
        F.element_at(seq, 1).cast("bigint").alias("first_el"),
        F.array_contains(seq, 3).alias("has3"),
        F.size(seq).cast("bigint").alias("n"),
        F.transform(seq, lambda x: x * 2).cast("array<bigint>").alias("doubled"),
        F.filter(seq, lambda x: x % 2 == 0).cast("array<bigint>").alias("evens"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
        F.array_sort(F.array_distinct(F.array("l_linenumber", F.lit(1), "l_linenumber"))).alias(
            "uniq"
        ),
        F.reverse(seq).cast("array<bigint>").alias("rev"),
        F.flatten(F.array(seq, F.array(F.lit(9), F.lit(9)))).cast("array<bigint>").alias("flat"),
        F.slice(seq, 1, 2).cast("array<bigint>").alias("first2"),
        F.array_position(seq, 2).alias("pos2"),
        F.array_join(seq.cast("array<string>"), "-").alias("joined"),
    )


@query(
    "fn_explode_unnest",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id <= 50
""",
    tags=("functions", "array"),
)
def fn_explode_unnest(spark, sf_dir):
    """UNNEST → explode. At scale explode multiplies rows — keep the
    projection minimal before exploding so the blown-up intermediate
    carries no dead columns."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))


@query(
    "fn_struct_map",
    oracle="""
SELECT c_custkey,
       c_name AS s_name,
       c_acctbal AS s_bal,
       c_nationkey AS m_nation,
       2 AS m_n_keys,
       c_mktsegment AS m_seg_val
FROM customer
""",
    tags=("functions", "struct"),
)
def fn_struct_map(spark, sf_dir):
    """STRUCT pack/extract + MAP build/lookup. The Spark side genuinely
    builds structs and maps and extracts back out; the oracle states the
    expected end-to-end values directly (DuckDB's map subscript returns a
    LIST, so literal map parity is a dialect gap — SURVEY §2.B)."""
    c = load_table(spark, sf_dir, "customer")
    packed = F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    m = F.map_from_arrays(
        F.array(F.lit("nation"), F.lit("segment")),
        F.array(F.col("c_nationkey").cast("string"), F.col("c_mktsegment")),
    )
    return c.select(
        "c_custkey",
        packed.getField("name").alias("s_name"),
        packed.getField("bal").alias("s_bal"),
        F.element_at(m, "nation").cast("int").alias("m_nation"),
        F.size(F.map_keys(m)).alias("m_n_keys"),
        F.element_at(m, "segment").alias("m_seg_val"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       json_valid(props) AS valid
FROM events
""",
    tags=("functions", "json"),
)
def fn_json(spark, sf_dir):
    """JSON family: string-path extraction + typed parse. Spark:
    get_json_object / from_json; DuckDB: json_extract_string."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "struct<k:bigint>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_num"),
        F.when(
            F.col("props").isNotNull(),
            F.get_json_object("props", "$").isNotNull(),
        ).alias("valid"),  # NULL props -> NULL, matching DuckDB json_valid(NULL)
    )


@query(
    "fn_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       lower(hex(encode(c_mktsegment))) AS seg_hex,
       to_base64(encode(c_name)) AS name_b64,
       octet_length(encode(c_name)) AS byte_len
FROM customer
""",
    tags=("functions", "hash"),
)
def fn_hash(spark, sf_dir):
    """Hash/encoding family: md5, sha256 (hex-identical across engines),
    hex (case-normalized — Spark upper vs DuckDB lower), base64, byte
    length. Spark's xxhash64/hash are engine-specific seeds → excluded
    from the oracle (they'd never match DuckDB's hash; documented gap)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
        F.lower(F.hex(F.col("c_mktsegment").cast("binary"))).alias("seg_hex"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.octet_length("c_name").cast("bigint").alias("byte_len"),
    )


@query("fn_nondeterministic", oracle=None, tags=("functions", "approx"))
def fn_nondeterministic(spark, sf_dir):
    """Nondeterministic / context functions — uuid, random, current
    timestamp/date, monotonically_increasing_id, plus to_json round-trip
    and make_timestamp. Rows-only check by nature (values differ per
    invocation/engine); the deterministic families live in the oracled
    queries."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("uuid()").alias("row_uuid"),
        F.rand(7).alias("rnd"),
        F.randn(7).alias("rnd_gauss"),
        F.current_timestamp().alias("now_ts"),
        F.current_date().alias("today"),
        F.monotonically_increasing_id().alias("mono_id"),
        F.spark_partition_id().alias("part_id"),
        F.to_json(F.struct("c_custkey", "c_mktsegment")).alias("as_json"),
        F.expr("make_timestamp(2024, 6, 1, 12, 30, 0)").alias("made_ts"),
        F.hash("c_name").alias("spark_hash"),
        F.xxhash64("c_name").alias("xx64"),
        F.crc32(F.col("c_name").cast("binary")).alias("crc"),
    )


@query(
    "fn_array_higher_order",
    oracle="""
SELECT l_orderkey, l_linenumber,
       len(list_filter(range(1, l_linenumber + 1), x -> x % 2 = 0)) > 0 AS has_even,
       len(list_filter(range(1, l_linenumber + 1), x -> x > 0)) = l_linenumber AS all_pos,
       list_transform(range(1, 4), i -> l_linenumber) AS repeated,
       list_filter(range(1, l_linenumber + 1), x -> x <> 2) AS removed2,
       list_filter(range(1, l_linenumber + 1), x -> NOT list_contains([2, 4, 6], x)) AS except_evens,
       list_transform(range(1, l_linenumber + 1), x -> x + l_suppkey) AS shifted,
       CAST(list_sum(list_transform(range(1, l_linenumber + 1),
            x -> CASE WHEN x % 2 = 0 THEN x ELSE 0 END)) AS BIGINT) AS even_sum
FROM lineitem
WHERE l_orderkey <= 200
""",
    tags=("functions", "array"),
)
def fn_array_higher_order(spark, sf_dir):
    """Higher-order array functions: exists/forall predicates,
    array_repeat, array_remove, array_except, lambda capture of outer
    columns (x + l_suppkey), conditional reduce. DuckDB oracle spells
    each via list_filter/list_transform — the portable core is the
    lambda, which both engines codegen without any UDF."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               exists(sequence(1, l_linenumber), x -> x % 2 = 0) AS has_even,
               forall(sequence(1, l_linenumber), x -> x > 0) AS all_pos,
               array_repeat(l_linenumber, 3) AS repeated,
               CAST(array_remove(sequence(1, l_linenumber), 2) AS ARRAY<BIGINT>) AS removed2,
               CAST(array_except(sequence(1, l_linenumber), array(2, 4, 6)) AS ARRAY<BIGINT>) AS except_evens,
               transform(sequence(1, l_linenumber), x -> x + l_suppkey) AS shifted,
               aggregate(sequence(1, l_linenumber), CAST(0 AS BIGINT),
                         (acc, x) -> acc + CASE WHEN x % 2 = 0 THEN x ELSE 0 END) AS even_sum
        FROM lineitem
        WHERE l_orderkey <= 200
        """
    )


@query(
    "fn_map_higher_order",
    oracle="""
SELECT c_custkey,
       c_acctbal * 2 AS doubled_bal,
       2 AS n_entries,
       c_nationkey AS nation_val,
       TRUE AS has_nation_key
FROM customer
""",
    tags=("functions", "struct"),
)
def fn_map_higher_order(spark, sf_dir):
    """Map higher-order functions: transform_values, map_entries,
    map_concat, map_contains_key. Spark builds and manipulates real
    maps; the oracle states the expected scalar outcomes (DuckDB's map
    subscript returns LIST — documented dialect gap, same policy as
    fn_struct_map)."""
    c = load_table(spark, sf_dir, "customer")
    m = F.map_from_arrays(
        F.array(F.lit("bal"), F.lit("nation")),
        F.array(F.col("c_acctbal"), F.col("c_nationkey").cast("double")),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    return c.select(
        "c_custkey",
        F.element_at(doubled, "bal").alias("doubled_bal"),
        F.size(F.map_entries(m)).alias("n_entries"),
        F.element_at(m, "nation").cast("int").alias("nation_val"),
        F.map_contains_key(m, "nation").alias("has_nation_key"),
    )
