-- Deterministic train/val/test assignment: md5 hash bucket 0-255.
-- Pure SQL twin of operators.hash_split (same spelling both engines).
SELECT doc_id,
       (instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16
         + instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1 AS bucket,
       CASE WHEN (instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16
                 + instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1 < 230
            THEN 'train'
            WHEN (instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16
                 + instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1 < 243
            THEN 'val' ELSE 'test' END AS split
FROM source_documents
