-- Analytic model (reference: examples/basic/orders_per_product.sql) —
-- note the DuckDB zero-arg count(), rewritten by the dialect shim
SELECT l_partkey AS product_key, count() AS item_count
FROM source_orders
GROUP BY l_partkey
