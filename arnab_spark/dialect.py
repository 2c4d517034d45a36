"""DuckDB → Spark SQL dialect shim.

The reference passes model SQL verbatim to DuckDB (reference:
node.rs:176), so reference-style models are written in DuckDB's dialect.
Spark SQL covers almost all of it natively (SURVEY.md §2.B); this module
rewrites the handful of purely syntactic gaps so those models run
unchanged. Semantic gaps (ASOF JOIN, DISTINCT ON, QUALIFY, EXCLUDE) have
documented DataFrame rewrites in the query corpus instead — rewriting
arbitrary SQL for those would require a full parser, which we refuse on
correctness grounds (a wrong silent rewrite is worse than a clear error).
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


def transpile_statement(sql: str, spark=None) -> str:
    """Apply the DuckDB→Spark rewrites to one statement.

    ``read_parquet``/``read_csv``/``read_json`` map to Spark's
    file-query syntax (``parquet.`path```). The ``*_auto`` variants
    promise DuckDB's sniffing (header detection, type inference), which
    the bare file-query syntax cannot honor — so when a live session is
    available they are loaded with header/inferSchema options and
    substituted as temp views; without a session they degrade to the
    optionless file query (documented, headerless-string semantics).
    """
    sql = _COUNT_ZERO_ARG.sub("count(*)", sql)

    def rewrite(m: re.Match) -> str:
        kind = m.group(1).lower()
        path = _resolve_path(m.group(2))
        fmt = _FORMAT_MAP[kind]
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
