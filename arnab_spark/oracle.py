"""Differential-testing harness: run a corpus query on Spark AND its
oracle SQL on DuckDB over the same parquet fixtures, and compare
row-count + schema (column names) + order-insensitive values EXACTLY.

This mirrors the driver's correctness gate (see __spark_entry__.py
docstring) so mismatches surface locally before a round is judged.
Comparison is exact (no float tolerance): corpus queries are written so
their float outputs are deterministic (see arnab_spark.queries docstring
— decimal accumulation, per-row IEEE arithmetic only).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from arnab_spark.spark_utils import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "MISMATCH"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for issue in self.issues[:10]:
            msg += f"\n    - {issue}"
        return msg


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables registered as views
    (same registration the driver performs). Tables whose parquet file is
    absent are skipped — partial scale points (the sf10 slope materializes
    TPC-H tables only) still open; a query touching a missing table then
    fails loudly at bind time instead of blocking the connection."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical string form of one value, identical across engines."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # collapse -0.0 / +0.0, but stay in float space so
            return "0.0"  # an int-0 vs float-0 type divergence still surfaces
        # round-trippable shortest repr; 17 significant digits
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        # NOTE: a bare datetime.date canonicalizes to "YYYY-MM-DD" (str below)
        # while a midnight Timestamp keeps its time part — deliberately NOT
        # collapsed, so date-vs-timestamp type divergence between the engines
        # surfaces here (queries must CAST both sides, see functions_corpus).
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """(sorted column names, sorted row tuples of canonical strings).

    Canonicalizes column-by-column (``df[c].tolist()``), NOT via
    ``iterrows()``: row-wise iteration upcasts all-numeric rows to a
    common float dtype, which would silently mask int-vs-float
    divergence between the engines (e.g. DuckDB ceiling(double)→DOUBLE
    vs Spark→BIGINT would stringify equal after upcast)."""
    cols = sorted(pdf.columns)
    col_values = [[_canon_cell(v) for v in pdf[c].tolist()] for c in cols]
    rows = sorted(zip(*col_values)) if col_values and col_values[0] else (
        [] if len(pdf) == 0 else [()]
    )
    return cols, list(rows)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    issues: list[str] = []
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    if s_cols != o_cols:
        issues.append(f"schema: spark={s_cols} oracle={o_cols}")
    if len(s_rows) != len(o_rows):
        issues.append(f"rowcount: spark={len(s_rows)} oracle={len(o_rows)}")
    if not issues:
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            if sr != orow:
                issues.append(f"row {i}: spark={sr} oracle={orow}")
                if len(issues) >= 5:
                    break
    return CompareResult(name, not issues, len(s_rows), len(o_rows), issues)


def run_compare(spark, name: str, fn, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
