-- DuckDB-idiom model: DISTINCT ON + QUALIFY-free top-1-per-group —
-- runs unchanged through the dialect shim (round-2 passthrough)
SELECT DISTINCT ON (l_partkey) l_partkey AS product_key, l_orderkey, l_quantity
FROM source_orders
ORDER BY l_partkey, l_quantity DESC, l_orderkey
