-- DSIR importance weights (model-SQL twin of
-- queries/llm_text.py::text_dsir_weights, Xie et al. 2023): hashed
-- 256-bucket unigram distributions for the target slice (lang = 'en')
-- vs the raw corpus, per-doc weight = exact integer micro-nat dot
-- product. The bucket stats are 256 rows — a broadcast at any corpus
-- scale.
WITH tok AS (
  SELECT doc_id, explode(split(text, ' ')) AS word FROM source_documents
),
hb AS (
  SELECT t.doc_id, CAST((instr('0123456789abcdef', substring(md5(word), 1, 1)) - 1) * 16 + instr('0123456789abcdef', substring(md5(word), 2, 1)) - 1 AS BIGINT) AS b FROM tok t
),
rcount AS (
  SELECT b, COUNT(*) AS cr FROM hb GROUP BY b
),
tcount AS (
  SELECT hb.b, COUNT(*) AS ct
  FROM hb JOIN source_documents d ON hb.doc_id = d.doc_id
  WHERE d.lang = 'en'
  GROUP BY hb.b
),
totals AS (
  SELECT (SELECT SUM(cr) FROM rcount) AS r_total,
         (SELECT COALESCE(SUM(ct), 0) FROM tcount) AS t_total
),
lr AS (
  SELECT r.b,
         CAST(floor(1000000 * ln(
           (CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) * (r_total + 256))
           / (CAST(r.cr + 1 AS DOUBLE) * (t_total + 256))
         )) AS BIGINT) AS lr_micro
  FROM rcount r LEFT JOIN tcount t ON r.b = t.b CROSS JOIN totals
),
docb AS (
  SELECT doc_id, b, COUNT(*) AS c FROM hb GROUP BY doc_id, b
)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_tokens,
       CAST(SUM(d.c * lr.lr_micro) AS BIGINT) AS log_weight_micro
FROM docb d JOIN lr ON d.b = lr.b
GROUP BY d.doc_id
