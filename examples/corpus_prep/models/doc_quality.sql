-- Cheap quality gate: token count bounds + duplicate-word ratio
SELECT doc_id,
       size(split(text, ' ')) AS n_tokens,
       1.0 - CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
           / size(split(text, ' ')) AS word_rep_ratio,
       size(split(text, ' ')) BETWEEN 20 AND 1000
         AND 1.0 - CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
             / size(split(text, ' ')) < 0.6 AS keep
FROM source_documents
