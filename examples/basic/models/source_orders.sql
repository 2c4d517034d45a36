-- Scan model (reference shape: examples/basic/source_orders.sql reads a
-- remote cart.parquet; here the local lineitem fixture via the dialect shim)
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
