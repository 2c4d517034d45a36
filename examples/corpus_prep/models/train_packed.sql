-- Context-window packing of the DSIR-resampled corpus (model-SQL twin
-- of queries/llm_text.py::text_pack_sequences): within each source
-- shard, stable doc_id order, 2048-token packs by exclusive running
-- token count. One shuffle on the shard key; shards pack
-- independently at any scale.
WITH t AS (
  SELECT r.doc_id, d.source, r.n_tokens
  FROM doc_dsir_resampled r JOIN source_documents d USING (doc_id)
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens,
       CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS pack_id
FROM c
