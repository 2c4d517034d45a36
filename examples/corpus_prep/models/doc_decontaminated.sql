-- Benchmark decontamination stage (model-SQL twin of
-- queries/llm_text.py::text_decontaminate): drop any training doc
-- sharing a word-8-gram with the val/test splits. The held-out side
-- reduces to DISTINCT n-grams before the anti-join, so at any corpus
-- size the join probes a benchmark-sized broadcast set.
WITH words AS (
  SELECT d.doc_id, s.split, split(d.text, ' ') AS w
  FROM source_documents d JOIN doc_split s USING (doc_id)
),
grams AS (
  SELECT doc_id, split, ngram
  FROM words
  LATERAL VIEW explode(
    CASE WHEN size(w) >= 8
         THEN transform(sequence(1, size(w) - 7),
                        i -> concat_ws(' ', slice(w, i, 8)))
         ELSE array() END) t AS ngram
),
held_out AS (
  SELECT DISTINCT ngram FROM grams WHERE split <> 'train'
),
contaminated AS (
  SELECT DISTINCT g.doc_id
  FROM grams g JOIN held_out h ON g.ngram = h.ngram
  WHERE g.split = 'train'
)
SELECT t.*
FROM train_corpus t
LEFT ANTI JOIN contaminated c ON t.doc_id = c.doc_id
