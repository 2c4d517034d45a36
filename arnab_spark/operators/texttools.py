"""Text shingling and MinHash signatures as reusable operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows of distinct word n-grams per document. Short
    documents (< n words) yield one padded shingle so no doc vanishes."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ",
        *[
            F.element_at(words, F.least(i + j, F.size(words)))
            for j in range(n)
        ],
    )
    return df.select(
        F.col(id_col), F.explode(F.transform(idx, gram)).alias("shingle")
    ).distinct()


def minhash_signatures(
    shingles: DataFrame, id_col: str, n_bands: int = 8
) -> DataFrame:
    """(id, band, sig) MinHash signatures: per band b, min over shingles
    of md5(b || '|' || shingle). Computed as n_bands MIN aggregates in
    ONE pass + stack wide→long (no bands× row blowup — see SCALE.md).
    Docs sharing (band, sig) are near-dup candidates; join on it."""
    mins = [
        F.min(
            F.md5(F.concat(F.lit(f"{b}|"), F.col("shingle")).cast("binary"))
        ).alias(f"m{b}")
        for b in range(n_bands)
    ]
    wide = shingles.groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{b}, m{b}" for b in range(n_bands))
    return wide.selectExpr(
        id_col, f"stack({n_bands}, {stack_args}) AS (band, sig)"
    )
