-- DSIR importance RESAMPLING (model-SQL twin of
-- queries/llm_text.py::text_dsir_resample, Xie et al. 2023 §2.3):
-- Gumbel-top-k over the weights — the 200 docs maximizing
-- log w + Gumbel(md5-derived exact dyadic uniform), i.e. sampling
-- w-proportionally without replacement, deterministically. Compiles
-- to TakeOrderedAndProject: k rows cross the wire, never a global
-- sort.
WITH scored AS (
  SELECT doc_id, n_tokens, log_weight_micro,
         CAST(floor(1000000 * (-ln(-ln(
           (CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT) + 0.5) / 281474976710656.0
         )))) AS BIGINT) AS gumbel_micro
  FROM doc_dsir_weights
)
SELECT doc_id, n_tokens, log_weight_micro, gumbel_micro,
       log_weight_micro + gumbel_micro AS score_micro
FROM scored
ORDER BY score_micro DESC, doc_id
LIMIT 200
