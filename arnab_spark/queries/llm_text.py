"""Text analysis operators over ``documents`` (beyond-reference corpus,
SURVEY.md §7 M4): token counting, quality scoring, language ID,
document fingerprinting.

All pure column expressions (JVM-side, codegen'd — zero Python in the
hot path), each with a DuckDB oracle. Ratios are single IEEE divisions
of exact integers → deterministic across engines.
"""

from __future__ import annotations

from arnab_spark.queries import query
from arnab_spark.spark_utils import register_views

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language "profiles" for the n-gram/stopword-overlap heuristic.
# (The fixture text is synthetic English-ish for every lang label; the
# heuristic is still exercised end-to-end and is deterministic.)
_LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de5", "shi4", "le5", "bu4"),
}


def _tokens_sql(dialect: str) -> str:
    split = "split" if dialect == "spark" else "string_split"
    return f"{split}(text, ' ')"


@query(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len({_tokens_sql('duck')}) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct({_tokens_sql('duck')})) AS INTEGER) AS n_unique_tokens,
       length(text) AS n_chars_actual,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpeish,
       CAST(length(text) AS DOUBLE) / len({_tokens_sql('duck')}) AS chars_per_token
FROM documents
""",
    headline=True,
    tags=("text",),
)
def text_token_count(spark, sf_dir):
    """Token counting: whitespace tokens, unique tokens, a BPE-ish regex
    token count (letters / digits / punctuation runs), chars-per-token.
    Pure projections — scales linearly, no shuffle at all."""
    register_views(spark, sf_dir, ("documents",))
    t = _tokens_sql("spark")
    return spark.sql(
        f"""
        SELECT doc_id,
               size({t}) AS n_tokens,
               size(array_distinct({t})) AS n_unique_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpeish,
               CAST(length(text) AS DOUBLE) / size({t}) AS chars_per_token
        FROM documents
        """
    )


_STOP_DUCK = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_STOP_SPARK = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


@query(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_tokens_sql('duck')} AS toks, length(text) AS nc FROM documents
),
m AS (
  SELECT doc_id, nc,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, w -> list_contains({_STOP_DUCK}, w))) AS BIGINT) AS n_stop,
         octet_length(encode(regexp_replace(text, '[^.!?,;]', '', 'g'))) AS n_punct
  FROM t
)
SELECT doc_id,
       CAST(nc AS DOUBLE) / n_tokens AS mean_word_len,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / nc AS punct_ratio,
       (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
        + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 1 ELSE 0 END
        + CASE WHEN CAST(n_punct AS DOUBLE) / nc < 0.2 THEN 1 ELSE 0 END) AS quality_score
FROM m
""",
    tags=("text",),
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: mean word length, stopword ratio, punctuation
    ratio, and a 0-3 integer quality score from bounds on each — the
    classic cheap pre-filter before expensive model-based scoring."""
    register_views(spark, sf_dir, ("documents",))
    t = _tokens_sql("spark")
    return spark.sql(
        f"""
        WITH t AS (
          SELECT doc_id, text, {t} AS toks, length(text) AS nc FROM documents
        ),
        m AS (
          SELECT doc_id, nc,
                 CAST(size(toks) AS BIGINT) AS n_tokens,
                 CAST(size(filter(toks, w -> array_contains({_STOP_SPARK}, w))) AS BIGINT) AS n_stop,
                 octet_length(regexp_replace(text, '[^.!?,;]', '')) AS n_punct
          FROM t
        )
        SELECT doc_id,
               CAST(nc AS DOUBLE) / n_tokens AS mean_word_len,
               CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
               CAST(n_punct AS DOUBLE) / nc AS punct_ratio,
               (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
                + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 1 ELSE 0 END
                + CASE WHEN CAST(n_punct AS DOUBLE) / nc < 0.2 THEN 1 ELSE 0 END) AS quality_score
        FROM m
        """
    )


def _lang_scores_sql(dialect: str) -> tuple[str, str]:
    """(score columns, argmax CASE chain) for the language-ID heuristic."""
    contains = "array_contains" if dialect == "spark" else "list_contains"
    lfilter = "filter" if dialect == "spark" else "list_filter"
    size = "size" if dialect == "spark" else "len"
    arr = (lambda ws: "array(" + ", ".join(f"'{w}'" for w in ws) + ")") if dialect == "spark" else (
        lambda ws: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    )
    scores = ", ".join(
        f"CAST({size}({lfilter}(toks, w -> {contains}({arr(ws)}, w))) AS BIGINT) AS s_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    # deterministic argmax: highest score wins, ties break alphabetically
    langs = sorted(_LANG_MARKERS)
    best = " AND ".join  # noqa: E731 - built inline below
    chain = []
    for lang in langs:
        conds = [f"s_{lang} >= s_{other}" for other in langs if other != lang]
        # earlier (alphabetical) lang wins ties because of >= + chain order
        chain.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(chain) + " ELSE 'und' END"
    return scores, case


@query(
    "text_lang_id",
    oracle="""
WITH t AS (SELECT doc_id, lang, {tokens} AS toks FROM documents),
s AS (SELECT doc_id, lang, {scores} FROM t)
SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang,
       s_en, s_es, s_de, s_fr, s_zh
FROM s
""".format(
        tokens=_tokens_sql("duck"), scores=_lang_scores_sql("duck")[0],
        case=_lang_scores_sql("duck")[1],
    ),
    tags=("text",),
)
def text_lang_id(spark, sf_dir):
    """Language ID: stopword/marker-overlap scores per language with a
    deterministic arg-max (ties break alphabetically). The real-world
    version swaps marker lists for char-n-gram profiles; the plan — one
    projection, no shuffle — is identical."""
    register_views(spark, sf_dir, ("documents",))
    scores, case = _lang_scores_sql("spark")
    return spark.sql(
        f"""
        WITH t AS (SELECT doc_id, lang, {_tokens_sql("spark")} AS toks FROM documents),
        s AS (SELECT doc_id, lang, {scores} FROM t)
        SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang,
               s_en, s_es, s_de, s_fr, s_zh
        FROM s
        """
    )


@query(
    "text_fingerprint",
    oracle=f"""
WITH words AS (
  SELECT doc_id, {_tokens_sql('duck')} AS w FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
           i -> w[i] || ' ' || w[least(i+1, len(w))] || ' ' || w[least(i+2, len(w))]
                || ' ' || w[least(i+3, len(w))] || ' ' || w[least(i+4, len(w))])) AS g
  FROM words
)
SELECT doc_id,
       MIN(md5(g)) AS fingerprint,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_grams
FROM grams GROUP BY doc_id
""",
    tags=("text",),
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting (winnowing-lite): rolling word 5-grams →
    md5 → per-doc minimum = content fingerprint, robust to small edits.
    Same plan family as MinHash with one band."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        WITH words AS (
          SELECT doc_id, split(text, ' ') AS w FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 explode(transform(sequence(1, greatest(size(w) - 4, 1)),
                   i -> concat_ws(' ', element_at(w, i),
                                  element_at(w, least(i+1, size(w))),
                                  element_at(w, least(i+2, size(w))),
                                  element_at(w, least(i+3, size(w))),
                                  element_at(w, least(i+4, size(w)))))) AS g
          FROM words
        )
        SELECT doc_id,
               MIN(md5(CAST(g AS BINARY))) AS fingerprint,
               COUNT(DISTINCT g) AS n_grams
        FROM grams GROUP BY doc_id
        """
    )
