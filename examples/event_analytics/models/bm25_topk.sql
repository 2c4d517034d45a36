-- BM25 top-20 lexical ranking (model-SQL twin of
-- queries/llm_text.py::text_bm25_topk — round 15, the one r13
-- analytics query that had no engine-path model). Written in the
-- DuckDB posting-list idiom (unnest tokenization + tf/dl/df joins):
-- the per-(doc,term) scores are floored to integer micro-units before
-- the per-doc SUM, so this relation is the exact associative-BIGINT
-- equal of the registry query's join-free horizontal spelling — the
-- identity pytest compares them row-for-row.
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM source_documents
),
dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf
  FROM tok WHERE word IN ('join', 'filter', 'vector', 'scan')
  GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
),
scored AS (
  SELECT tf.doc_id, CAST(floor(1000000 * (
      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      * (CAST(tf AS DOUBLE) * 2.2)
      / (CAST(tf AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) * n_docs / CAST(total_tokens AS DOUBLE))))
    )) AS BIGINT) AS score_micro
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df ON tf.word = df.word
  CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(score_micro) AS BIGINT) AS bm25_micro
FROM scored
GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id
LIMIT 20
