-- Bare-string table scan for the BM25 model (DuckDB shorthand,
-- transpiled to Spark's file-query syntax by the dialect shim)
SELECT doc_id, text
FROM '/root/testdata/sf0.001/documents.parquet'
