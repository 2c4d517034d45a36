-- Bare-string table scan (DuckDB shorthand, transpiled to Spark's
-- file-query syntax by the dialect shim)
SELECT doc_id, lang, source, text
FROM '/root/testdata/sf0.001/documents.parquet'
