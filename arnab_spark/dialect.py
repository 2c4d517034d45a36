"""DuckDB → Spark SQL dialect shim.

The reference passes model SQL verbatim to DuckDB (reference:
node.rs:176), so reference-style models are written in DuckDB's dialect.
Spark SQL covers almost all of it natively (SURVEY.md §2.B); this module
rewrites the purely syntactic gaps so those models run unchanged:

- zero-arg ``count()`` → ``count(*)``
- ``read_parquet('p')`` & friends → Spark file-query syntax
- ``SELECT * EXCLUDE (a, b)`` → Spark's ``* EXCEPT (a, b)``
- top-level ``QUALIFY <pred>`` → subquery + filter (both are common
  DuckDB idioms a reference-style model would reach for)

Each rewrite is conservative: it either applies cleanly or leaves the
text alone so Spark raises a clear parse error. Remaining semantic gaps
(ASOF JOIN, DISTINCT ON, ``* REPLACE``) have documented DataFrame
rewrites in the query corpus instead — rewriting arbitrary SQL for
those would require a full parser, which we refuse on correctness
grounds (a wrong silent rewrite is worse than a clear error).
"""

from __future__ import annotations

import re

# DuckDB allows zero-argument count() (used by the reference's example
# model, reference: examples/basic/orders_per_product.sql:2).
_COUNT_ZERO_ARG = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)

# read_parquet('path') / read_csv_auto('path') / read_json_auto('path')
# → Spark's direct-file-query syntax: parquet.`path` / csv.`path` / ...
_READ_FUNC = re.compile(
    r"\bread_(parquet|csv|csv_auto|json|json_auto)\s*\(\s*'([^']+)'\s*\)",
    re.IGNORECASE,
)

_FORMAT_MAP = {
    "parquet": "parquet",
    "csv": "csv",
    "csv_auto": "csv",
    "json": "json",
    "json_auto": "json",
}

_REMOTE_CACHE = "/tmp/arnab_spark_remote_cache"


def _resolve_path(path: str) -> str:
    """DuckDB's read_parquet accepts plain http(s) URLs (the reference's
    demo model does exactly this, reference:
    examples/basic/source_orders.sql:2). An https URL is not a Hadoop
    filesystem, so fetch it once into a content-addressed local cache
    and scan the cached file. At warehouse scale remote data should land
    in object storage (s3a://…, which Spark scans natively) — this shim
    exists for reference-compatibility, not as a data-transfer path."""
    if not path.lower().startswith(("http://", "https://")):
        return path
    import hashlib
    import os
    import urllib.request

    os.makedirs(_REMOTE_CACHE, exist_ok=True)
    suffix = os.path.splitext(path.split("?")[0])[1] or ".bin"
    dest = os.path.join(
        _REMOTE_CACHE, hashlib.sha256(path.encode()).hexdigest()[:24] + suffix
    )
    if not os.path.exists(dest):
        tmp = dest + ".part"
        urllib.request.urlretrieve(path, tmp)
        os.replace(tmp, dest)
    return dest


# `* EXCLUDE (a, b)` directly after a star is unambiguous; Spark spells
# the same projection `* EXCEPT (a, b)`.
_STAR_EXCLUDE = re.compile(r"(\*\s+)EXCLUDE(\s*\()", re.IGNORECASE)


def _scan_top_level(sql: str, words: tuple[str, ...], start: int = 0) -> tuple[int, str | None]:
    """Find the first occurrence of any keyword in ``words`` at paren
    depth 0 and outside quoted strings/identifiers. Returns (index,
    matched word) or (-1, None). Case-insensitive, whole-word."""
    lowered = sql.lower()
    depth = 0
    quote: str | None = None
    i = start
    n = len(sql)
    while i < n:
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            token = lowered[i:j]
            if token in words:
                return i, token
            i = j
            continue
        i += 1
    return -1, None


def _rewrite_qualify(sql: str) -> str:
    """Rewrite a top-level ``QUALIFY <pred>`` into subquery + filter:

        SELECT * EXCEPT (__arnab_qualify) FROM (
          SELECT *, (<pred>) AS __arnab_qualify FROM ( <head> ) q
        ) qq WHERE __arnab_qualify [ORDER BY …/LIMIT …]

    The predicate may reference select-list aliases or inline window
    functions over columns present in the select output (the common
    DuckDB shapes). A window over a column NOT in the select output is
    out of reach without a full parser — that surfaces as a clear
    Spark analysis error, never a silent wrong result. QUALIFY nested
    inside subqueries is likewise left to Spark's parser to reject."""
    idx, _ = _scan_top_level(sql, ("qualify",))
    if idx < 0:
        return sql
    head = sql[:idx].rstrip()
    rest = sql[idx + len("qualify"):]
    tail_idx, _ = _scan_top_level(rest, ("order", "limit", "offset"))
    pred = rest[:tail_idx] if tail_idx >= 0 else rest
    tail = rest[tail_idx:] if tail_idx >= 0 else ""
    return (
        "SELECT * EXCEPT (__arnab_qualify) FROM ("
        f"SELECT *, ({pred.strip()}) AS __arnab_qualify FROM ({head}) __arnab_q"
        f") __arnab_qq WHERE __arnab_qualify {tail}"
    )


def transpile_statement(sql: str, spark=None) -> str:
    """Apply the DuckDB→Spark rewrites to one statement.

    ``read_parquet``/``read_csv``/``read_json`` map to Spark's
    file-query syntax (``parquet.`path```). The ``*_auto`` variants
    promise DuckDB's sniffing (header detection, type inference), which
    the bare file-query syntax cannot honor — so they require a live
    session (loaded with header/inferSchema options and substituted as
    temp views); without one they raise instead of silently degrading
    to headerless-string semantics (round-2 fix — the silent fallback
    produced wrong column names/types with no signal).
    """
    sql = _COUNT_ZERO_ARG.sub("count(*)", sql)
    sql = _STAR_EXCLUDE.sub(r"\1EXCEPT\2", sql)
    sql = _rewrite_qualify(sql)

    def rewrite(m: re.Match) -> str:
        kind = m.group(1).lower()
        path = _resolve_path(m.group(2))
        fmt = _FORMAT_MAP[kind]
        if kind in ("csv_auto", "json_auto") and spark is None:
            from arnab_spark.errors import ArnabError

            raise ArnabError(
                f"read_{kind}('{path}') needs an active SparkSession to honor "
                "DuckDB's sniffing semantics (header detection / type inference); "
                "pass one to transpile_statement, or use read_csv/read_json for "
                "the optionless file scan."
            )
        if spark is not None and kind in ("csv_auto", "json_auto"):
            import hashlib

            view = "_arnab_src_" + hashlib.md5(f"{kind}|{path}".encode()).hexdigest()[:12]
            reader = spark.read
            if fmt == "csv":
                df = reader.csv(path, header=True, inferSchema=True)
            else:
                df = reader.json(path)
            df.createOrReplaceTempView(view)
            return view
        return f"{fmt}.`{path}`"

    return _READ_FUNC.sub(rewrite, sql)
