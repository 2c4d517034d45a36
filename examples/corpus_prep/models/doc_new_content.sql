-- Incremental ingest: dedupe the new batch internally, then digest
-- anti-join against the previously ingested snapshot (held-out tenth)
WITH prev AS (
  SELECT DISTINCT md5(text) AS content_hash FROM source_documents WHERE doc_id % 10 = 0
),
new_batch AS (
  SELECT doc_id, md5(text) AS content_hash FROM source_documents WHERE doc_id % 10 <> 0
),
new_dedup AS (
  SELECT content_hash, min(doc_id) AS keep_id, count() AS n_copies
  FROM new_batch GROUP BY content_hash
)
SELECT keep_id, content_hash, n_copies
FROM new_dedup d
WHERE NOT EXISTS (SELECT 1 FROM prev p WHERE p.content_hash = d.content_hash)
