-- Final corpus: quality-kept training docs; * EXCLUDE passthrough
-- drops the working columns on the way out
SELECT * EXCLUDE (bucket, keep, word_rep_ratio)
FROM doc_split
JOIN doc_quality USING (doc_id)
JOIN source_documents USING (doc_id)
WHERE split = 'train' AND keep
