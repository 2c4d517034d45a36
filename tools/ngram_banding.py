"""Round-11 measurement for `dedup_ngram_jaccard`'s banding re-derivation
(r10 verdict ask #3 / wrong #3).

The r1-r10 pipeline reused the candidate-generation banding (r=1 row/
band x b=8 bands) whose S-curve threshold is t* = (1/b)^(1/r) = 0.125 —
far below the 0.5 Jaccard verify threshold — so at s=0.1 background
similarity 1-(1-0.1)^8 = 57% of incidental pairs became candidates, and
SCALE.md measured the candidate set growing +18%/decade beyond linear
(783k -> 9.27M for 10x data). Round 11 re-derives the banding from the
target threshold: r=2 x b=4 composite bands (concat of adjacent slice
mins) gives t* = (1/4)^(1/2) = 0.50 exactly; noise at s=0.1 drops to
1-(1-0.01)^4 = 3.9%.

This tool measures BOTH bandings at each scale point:

- candidate-pair count (post-DISTINCT) — the verify stage's cost driver;
- verified-pair count (exact word-set Jaccard >= 0.5);
- recall of the new banding = verified_new / verified_old. Sound as a
  plain count ratio because r2b4 candidates are a SUBSET of r1b8
  candidates (a composite band matches only when both its constituent
  bands match), so verified_new is a subset of verified_old;
- full-query wall (min of N passes).

Usage: python tools/ngram_banding.py [out.json] [passes]
Reads sf0.1 fixtures + .scaledata/sf1 + .scaledata/sf10 (skips absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the r1-r10 candidate CTE, reconstructed verbatim for the comparison
_OLD_CANDS = """
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
),
"""

_VERIFY_TAIL = """
wordsets AS (
  SELECT doc_id, array_distinct(w) AS ws FROM words
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         size(array_intersect(wa.ws, wb.ws)) AS n_common,
         size(array_union(wa.ws, wb.ws)) AS n_union
  FROM cands c
  JOIN wordsets wa ON c.doc_a = wa.doc_id
  JOIN wordsets wb ON c.doc_b = wb.doc_id
)
SELECT COUNT(*) AS n_verified
FROM scored
WHERE CAST(n_common AS DOUBLE) / n_union >= 0.5
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "NGRAM_BANDING_r11.json"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from arnab_spark.queries.dedup import _JACCARD_SPARK, _MINHASH_SPARK
    from arnab_spark.spark_utils import get_spark

    # bench-identical sf10 config shape (local[32]); measurement tool,
    # not the bench run-of-record
    spark = get_spark("ngram_banding", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    new_cands = _JACCARD_SPARK[: _JACCARD_SPARK.index("wordsets AS")]

    def register(sf_dir: str) -> None:
        from arnab_spark.spark_utils import register_spread_views

        register_spread_views(spark, sf_dir, ("documents",))

    def count_sql(sql: str) -> tuple[int, float]:
        best = None
        val = None
        for _ in range(passes):
            t0 = time.perf_counter()
            val = spark.sql(sql).collect()[0][0]
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        return int(val), round(best, 2)

    points = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": os.path.join(REPO, ".scaledata", "sf1"),
        "sf10": os.path.join(REPO, ".scaledata", "sf10"),
    }
    result: dict = {
        "derivation": (
            "t* = (1/b)^(1/r): old r=1,b=8 -> 0.125; new r=2,b=4 -> "
            "0.500 (target = verify threshold 0.5); P(cand|s=0.1): "
            "57% -> 3.9%"
        ),
        "passes": passes,
        "points": {},
    }
    for name, d in points.items():
        if not os.path.isdir(d):
            continue
        register(d)
        row: dict = {}
        for label, cands in (("old_r1b8", _OLD_CANDS), ("new_r2b4", new_cands)):
            n_c, w_c = count_sql(
                _MINHASH_SPARK + cands + "SELECT COUNT(*) AS n FROM cands"
            )
            n_v, w_v = count_sql(_MINHASH_SPARK + cands + _VERIFY_TAIL)
            row[label] = {
                "candidates": n_c,
                "verified": n_v,
                "wall_candidates": w_c,
                "wall_full_verify": w_v,
            }
        ov, nv = row["old_r1b8"]["verified"], row["new_r2b4"]["verified"]
        row["recall_new_vs_old"] = round(nv / ov, 4) if ov else None
        row["candidate_reduction"] = (
            round(row["old_r1b8"]["candidates"] / row["new_r2b4"]["candidates"], 1)
            if row["new_r2b4"]["candidates"]
            else None
        )
        result["points"][name] = row
        print(name, json.dumps(row), flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
