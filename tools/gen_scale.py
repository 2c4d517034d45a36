"""Generate a 10x scale point (``sf1``) from the driver's sf0.1
fixtures, for the empirical scale-slope measurement in bench.py
(round-5 verdict item 6: one 10x datapoint turns the "per-query floor
amortizes at scale" argument from arithmetic into measurement).

The testdata tree is read-only, so sf1 lands repo-local at
``.scaledata/sf1`` (gitignored; regenerated on demand, content is a
pure function of the sf0.1 inputs). Scaling is 10 key-shifted copies —
NOT 10 verbatim copies, which would distort the workloads being
measured:

- fact/dim keys shift by ``copy * (max_key + 1)`` so cardinalities and
  join fan-outs scale linearly (10 verbatim copies would keep the same
  15k customers with 10x orders each — a different workload);
- name columns get a per-copy suffix so name-grouped aggregates keep
  per-copy granularity (LIKE/prefix filters keep their selectivity);
- document text gets a per-copy word-prefix transform (every space
  becomes " q<i>"), making copies shingle-disjoint: the built-in
  duplicate RATE stays constant instead of every document gaining 9
  cross-copy near-duplicates, which would blow LSH bucket pair counts
  up O(copies^2) and misrepresent the dedup slope (n_chars is
  recomputed to stay consistent);
- embeddings are rotated (np.roll by copy index), preserving norms and
  the coordinate distribution while keeping cross-copy cosine
  similarity unstructured.

nation/region are dimension tables and copy verbatim.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SRC_DEFAULT = "/root/testdata/sf0.1"
DEST_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"
)
COPIES = 10

#: per-table (shift_columns_by_their_own_stride, name_suffix_columns)
_KEYED = {
    "orders": (["o_orderkey", "o_custkey"], []),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "customer": (["c_custkey"], ["c_name"]),
    "supplier": (["s_suppkey"], ["s_name"]),
    "part": (["p_partkey"], ["p_name"]),
}

#: key columns must shift by the stride of the table that OWNS the key,
#: so foreign keys stay aligned across tables (l_custkey shift == the
#: customer table's c_custkey shift).
_KEY_OWNER_COL = {
    "o_orderkey": "o_orderkey",
    "l_orderkey": "o_orderkey",
    "o_custkey": "c_custkey",
    "c_custkey": "c_custkey",
    "l_partkey": "p_partkey",
    "p_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "s_suppkey": "s_suppkey",
}
_OWNER_TABLE = {
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "p_partkey": "part",
    "s_suppkey": "supplier",
}


def generate(src: str = SRC_DEFAULT, dest: str = DEST_DEFAULT, copies: int = COPIES) -> str:
    """Idempotent: a ``_SCALE_OK`` marker short-circuits regeneration."""
    marker = os.path.join(dest, "_SCALE_OK")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)

    # strides from the key-owning tables (max + 1 keeps keys disjoint)
    strides: dict[str, int] = {}
    for owner_col, table in _OWNER_TABLE.items():
        s = pd.read_parquet(os.path.join(src, f"{table}.parquet"), columns=[owner_col])
        strides[owner_col] = int(s[owner_col].max()) + 1

    for table, (key_cols, name_cols) in _KEYED.items():
        df = pd.read_parquet(os.path.join(src, f"{table}.parquet"))
        parts = []
        for i in range(copies):
            c = df.copy(deep=False) if i == 0 else df.copy()
            if i:
                for col in key_cols:
                    c[col] = c[col] + i * strides[_KEY_OWNER_COL[col]]
                for col in name_cols:
                    c[col] = c[col] + f"#{i}"
            parts.append(c)
        pd.concat(parts, ignore_index=True).to_parquet(
            os.path.join(dest, f"{table}.parquet"), index=False
        )

    docs = pd.read_parquet(os.path.join(src, "documents.parquet"))
    doc_stride = int(docs["doc_id"].max()) + 1
    parts = []
    for i in range(copies):
        c = docs.copy(deep=False) if i == 0 else docs.copy()
        if i:
            c["doc_id"] = c["doc_id"] + i * doc_stride
            c["text"] = c["text"].str.replace(" ", f" q{i}", regex=False)
            c["n_chars"] = c["text"].str.len()
        parts.append(c)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(dest, "documents.parquet"), index=False
    )

    emb = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
    vec_stride = int(emb["vec_id"].max()) + 1
    mat = np.stack(emb["embedding"].to_numpy())
    parts = []
    for i in range(copies):
        c = emb.copy(deep=False) if i == 0 else emb.copy()
        if i:
            c["vec_id"] = c["vec_id"] + i * vec_stride
            c["embedding"] = list(np.roll(mat, i, axis=1))
        parts.append(c)
    pd.concat(parts, ignore_index=True).to_parquet(
        os.path.join(dest, "embeddings.parquet"), index=False
    )

    for table in ("nation", "region"):
        pd.read_parquet(os.path.join(src, f"{table}.parquet")).to_parquet(
            os.path.join(dest, f"{table}.parquet"), index=False
        )
    # events isn't used by the scale-slope families but a missing file
    # would break register_views-style whole-directory loads — copy it.
    ev_src = os.path.join(src, "events.parquet")
    if os.path.exists(ev_src):
        pd.read_parquet(ev_src).to_parquet(
            os.path.join(dest, "events.parquet"), index=False
        )

    with open(marker, "w") as fh:
        fh.write(f"copies={copies} src={src}\n")
    return dest


if __name__ == "__main__":
    import sys

    out = generate(*(sys.argv[1:3]))
    for f in sorted(os.listdir(out)):
        p = os.path.join(out, f)
        print(f, os.path.getsize(p))
