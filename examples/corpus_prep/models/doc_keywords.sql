-- Per-doc top keywords by TF-IDF (round-4 operator, spelled as plain
-- DuckDB-idiom SQL): corpus document frequencies join back into a
-- QUALIFY'd per-doc ranking; the DF side is vocab-sized and
-- broadcastable at any corpus scale
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM source_documents
),
tf AS (SELECT doc_id, token, count() AS tf FROM tokens GROUP BY ALL),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tokens GROUP BY token),
n AS (SELECT count() AS n_docs FROM source_documents)
SELECT tf.doc_id, tf.token, tf.tf,
       row_number() OVER (PARTITION BY tf.doc_id
                          ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                   tf.token) AS rnk
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
QUALIFY rnk <= 3
