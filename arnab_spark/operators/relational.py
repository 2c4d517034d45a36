"""Generic relational helpers: top-k per group, DISTINCT ON."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str], k: int
) -> DataFrame:
    """Top-k rows per group via row_number over a partitioned window —
    one shuffle on ``keys``, no self-join (the scalable spelling of
    DuckDB's QUALIFY ... row_number() <= k). Include a unique tiebreak
    column in ``order_by`` for deterministic output."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def distinct_on(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """DuckDB ``DISTINCT ON (keys) ... ORDER BY order_by``: the first
    row per key group under the given order."""
    return top_k_per_group(df, keys, order_by, 1)
