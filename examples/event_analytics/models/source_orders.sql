-- Bare-string table scan (DuckDB shorthand, transpiled to Spark's
-- file-query syntax by the dialect shim)
SELECT o_orderkey, o_custkey, o_orderdate
FROM '/root/testdata/sf0.001/orders.parquet'
