"""Round-11 measurement for `dedup_ngram_jaccard`'s re-derivation
(r10 verdict ask #3 / wrong #3).

Three measurement artifacts tell the story:

1. NGRAM_BANDING_r11_trigram.json (first run of this tool): centering
   the S-curve alone — r=2 x b=4 composite bands (t* = 0.50) over the
   trigram signatures, UNIGRAM verify unchanged — collapsed "recall"
   to 0.9-1.5% of the old verified pairs. Diagnosis: the r1-r10
   pipeline verified UNIGRAM word-set Jaccard against TRIGRAM-shingle
   signatures — two different similarities; the old t* = 0.125
   over-recall had been sweeping unigram-similar pairs in by accident.
2. A fixture probe (recorded in the dedup.py pass comment): the
   unigram metric is itself DEGENERATE on text — ~45% of ALL document
   pairs at sf0.001 score unigram-Jaccard >= 0.5 (and the old
   pipeline "verified" 83-93% of whatever its banding recalled, at
   every scale point — no discriminating power).
3. THIS tool's final form: the round-11 pipeline verifies the SAME
   trigram-shingle sets the signatures sketch (true n-gram Jaccard,
   n=3), banded r=2 x b=4. Against the r=1 x b=8 banding ON THE SAME
   trigram metric, recall is a plain count ratio (r2b4 candidates are
   a SUBSET of r1b8's: a composite band matches only when both its
   constituent bands match), and the candidate count drops ~100x.

Per scale point and banding: candidate count (the verify stage's cost
driver), trigram-verified pair count, recall (new/old — sound by the
subset property), full-query wall (min of N passes).

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

# the r10-shipped candidate stage (r=1 x b=8 over trigram sigs),
# reconstructed verbatim for the same-metric comparison
_OLD_CANDS = """
, cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
)
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "NGRAM_BANDING_r11.json"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from arnab_spark.queries.dedup import _JACCARD_SPARK, _MINHASH_SPARK
    from arnab_spark.spark_utils import get_spark, register_spread_views

    spark = get_spark("ngram_banding", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # shipped round-11 text, split into candidate chain + verify tail so
    # the old banding can be spliced in front of the SAME verifier
    idx = _JACCARD_SPARK.index("wordsets AS")
    new_cands = _JACCARD_SPARK[:idx].rstrip().rstrip(",")
    verify_tail = ",\n" + _JACCARD_SPARK[idx:]

    def best_count(sql: str, wrap_count: bool = False) -> tuple[int, float]:
        if wrap_count:
            sql = f"SELECT COUNT(*) AS n FROM ({sql})"
        walls, val = [], None
        for _ in range(passes):
            t0 = time.perf_counter()
            val = spark.sql(sql).collect()[0][0]
            walls.append(time.perf_counter() - t0)
        return int(val), round(min(walls), 2)

    points = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": os.path.join(REPO, ".scaledata", "sf1"),
        "sf10": os.path.join(REPO, ".scaledata", "sf10"),
    }
    result: dict = {
        "derivation": (
            "t* = (1/b)^(1/r): old r=1,b=8 -> 0.125; new r=2,b=4 -> "
            "0.500 (= the verify threshold). Verify metric: trigram-"
            "shingle Jaccard (same sets the signatures sketch). Recall "
            "= verified_new/verified_old, sound by the subset property."
        ),
        "passes": passes,
        "points": {},
    }
    for name, d in points.items():
        if not os.path.isdir(d):
            continue
        register_spread_views(spark, d, ("documents",))
        row: dict = {}
        for label, cands in (("old_r1b8", _OLD_CANDS), ("new_r2b4", new_cands)):
            n_c, _ = best_count(
                _MINHASH_SPARK + cands + "\nSELECT COUNT(*) AS n FROM cands"
            )
            n_v, w_v = best_count(
                _MINHASH_SPARK + cands + verify_tail, wrap_count=True
            )
            row[label] = {
                "candidates": n_c,
                "verified_trigram": n_v,
                "wall_full_verify": w_v,
            }
        ov, nv = row["old_r1b8"]["verified_trigram"], row["new_r2b4"]["verified_trigram"]
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
