-- Bare-string table scan (DuckDB shorthand, transpiled to Spark's
-- file-query syntax by the dialect shim)
SELECT event_id, user_id, ts, event_type, value
FROM '/root/testdata/sf0.001/events.parquet'
