-- round-8 dialect surface, straight DuckDB idiom: a window beside
-- unnest (evaluates PRE-unnest), an unnest EMBEDDED in an expression
-- (zips positionally with the whole-item one), and a set-op arm with
-- its own unnest
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_orderkey) AS ord_rn,
       unnest(string_split(o_orderpriority, '-')) AS part,
       length(unnest(string_split(o_orderpriority, '-'))) AS part_len
FROM orders_src WHERE o_orderkey < 40
UNION ALL
SELECT -1 AS o_orderkey, 0 AS ord_rn, unnest(['none']) AS part,
       unnest([4]) AS part_len
