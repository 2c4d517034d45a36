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
    """(id, band, sig) MinHash signatures: ONE sha256 per shingle, band
    b's signature = min over shingles of digest slice b (one-permutation-
    hashing style — each slice is an independent hash function). n_bands
    MIN aggregates in one pass + stack wide→long: no bands× row blowup
    and the shingle stream is hashed once, not n_bands times (see
    SCALE.md). Docs sharing (band, sig) are near-dup candidates; join on
    it. n_bands ≤ 8 (sha256 yields eight 32-bit hex slices)."""
    if n_bands > 8:
        raise ValueError("n_bands > 8 needs a second digest; sha256 has 8 slices")
    digest = F.sha2(F.col("shingle").cast("binary"), 256)
    mins = [
        F.min(F.substring(digest, b * 8 + 1, 8)).alias(f"m{b}")
        for b in range(n_bands)
    ]
    wide = shingles.groupBy(id_col).agg(*mins)
    stack_args = ", ".join(f"{b}, m{b}" for b in range(n_bands))
    return wide.selectExpr(
        id_col, f"stack({n_bands}, {stack_args}) AS (band, sig)"
    )
