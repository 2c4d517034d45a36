"""The operator corpus.

Every capability from SURVEY.md §2 gets a named query registered here:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` and, where the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
string. The driver runs both sides at sf=0.01 and compares row-count +
schema + order-insensitive value hash — so results must match the oracle
EXACTLY, not approximately.

Float determinism contract
--------------------------
Sums/averages of DOUBLE columns are order-dependent in IEEE arithmetic,
and Spark's partial-aggregation order differs from DuckDB's. Every
compared aggregate therefore accumulates in DECIMAL (exact, associative)
and casts the final value back to DOUBLE; per-row arithmetic (mult/div)
stays in DOUBLE because single IEEE ops are deterministic and identical
across engines. Helpers: :func:`dsum`, :func:`davg` (and the matching
SQL spellings in each oracle string).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: decimal type wide enough for sums over ~1e9 rows of money-sized values
DEC = "decimal(18,6)"


@dataclass(frozen=True)
class Query:
    """One corpus entry: Spark implementation + optional DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, headline: bool = False, tags: tuple[str, ...] = ()):
    """Decorator registering a corpus query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


def dsum(col: Column | str, alias: str) -> Column:
    """Exact (decimal-accumulated) sum of a double expression, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def all_queries() -> dict[str, Query]:
    """Import every corpus module (registration side effect) and return
    the full registry."""
    from arnab_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        functions_corpus,
        joins,
        llm_text,
        multimodal,
        relational,
        similarity,
        timeseries,
        windows,
    )

    return REGISTRY
