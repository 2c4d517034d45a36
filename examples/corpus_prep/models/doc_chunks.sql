-- Sliding-window chunks of the final train corpus (embedding/RAG prep):
-- 24-word windows, stride 16 — the model-SQL twin of
-- queries/llm_text.py::text_chunk_windows. The words array binds once
-- in the CTE so it is not re-split per exploded element.
WITH w AS (
  SELECT doc_id, split(text, ' ') AS words FROM train_corpus
),
b AS (
  SELECT doc_id, words,
         1 + GREATEST(CAST(ceil((size(words) - 24) / 16.0) AS BIGINT), 0) AS n_win
  FROM w
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_id,
       array_join(slice(words, CAST(i*16 + 1 AS INT), 24), ' ') AS chunk_text
FROM b
LATERAL VIEW explode(sequence(0, n_win - 1)) s AS i
