"""Round-11 in-band decomposition of `dedup_connected_groups`' PAIR
BUILD at sf10 (r10 verdict ask #4).

Round 10's star-contraction fix cut the closure 75 -> 19.7 s, which
promoted the pair build (MinHash/LSH candidate pairs feeding the graph)
to the query's dominant cost — 22.8 s of the ~41 s total — recorded in
CC_DECOMP_r10.json as ONE opaque number. This tool splits it in-band
under the bench sf10 configuration:

1. **signature wall** — shingle transform + per-shingle sha256 + 8
   per-row band mins + stack to (doc_id, band, sig): measured by a
   count() over the `sigs` CTE alone (no join);
2. **band-join wall** — the (band, sig) self-equi-join with doc_a <
   doc_b, BEFORE pair dedup: count() over the raw matched pair stream
   (delta over #1 isolates the join's shuffle);
3. **pair-dedup wall** — the full pair build (GROUP BY doc_a, doc_b
   HAVING COUNT(*) >= 2): delta over #2 isolates the pair aggregation.

Each stage is min-of-N of the CUMULATIVE plan (Spark can't materialize
a CTE mid-plan without changing the plan under test), so stage costs
are reported as deltas between cumulative walls — same method as the
bench's floor decomposition.

Also measured: a candidate ALTERNATIVE pair build that aggregates
doc_ids per (band, sig) bucket once and emits in-bucket pairs map-side
(groupBy + sorted collect_list + self-posexplode), shuffling the
signature table ONCE instead of twice — the improvement hypothesis the
verdict asked to either land or refute with numbers.

Usage: python tools/cc_pairbuild.py [sf_dir] [out.json] [passes]
Defaults: .scaledata/sf10, CC_PAIRBUILD_r11.json, 3.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaledata", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "CC_PAIRBUILD_r11.json"
    )
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from arnab_spark.queries.dedup import CC_MIN_BANDS, _MINHASH_SPARK
    from arnab_spark.spark_utils import get_spark, register_spread_views

    spark = get_spark(
        "cc_pairbuild", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    register_spread_views(spark, sf_dir, ("documents",))

    def best_count(sql: str) -> tuple[int, float]:
        walls, val = [], None
        for _ in range(passes):
            t0 = time.perf_counter()
            val = spark.sql(sql).collect()[0][0]
            walls.append(time.perf_counter() - t0)
        return int(val), round(min(walls), 2)

    stages = {
        "signatures": _MINHASH_SPARK + "SELECT COUNT(*) AS n FROM sigs",
        "band_join_raw": _MINHASH_SPARK + """
SELECT COUNT(*) AS n
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
""",
        "pair_dedup_full": _MINHASH_SPARK + f"""
SELECT COUNT(*) AS n FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {CC_MIN_BANDS}
)
""",
    }
    result: dict = {"sf_dir": sf_dir, "passes": passes, "stages": {}}
    prev_wall = 0.0
    for name, sql in stages.items():
        n, w = best_count(sql)
        result["stages"][name] = {
            "rows": n,
            "cumulative_wall": w,
            "stage_delta": round(w - prev_wall, 2),
        }
        prev_wall = w
        print(name, result["stages"][name], flush=True)

    # alternative: bucket-aggregate pair emission (one shuffle of sigs)
    alt_sql = _MINHASH_SPARK + f"""
, buckets AS (
  SELECT band, sig, sort_array(collect_list(doc_id)) AS ids
  FROM sigs GROUP BY band, sig HAVING size(collect_list(doc_id)) > 1
),
raw_pairs AS (
  SELECT a.col AS doc_a, b.col AS doc_b
  FROM buckets
  LATERAL VIEW posexplode(ids) a AS pos, col
  LATERAL VIEW posexplode(ids) b AS pos2, col
  WHERE a.pos < b.pos2
)
SELECT COUNT(*) AS n FROM (
  SELECT doc_a, doc_b FROM raw_pairs
  GROUP BY doc_a, doc_b HAVING COUNT(*) >= {CC_MIN_BANDS}
)
"""
    n, w = best_count(alt_sql)
    result["alternative_bucket_aggregate"] = {"rows": n, "wall": w}
    print("alternative_bucket_aggregate", result["alternative_bucket_aggregate"], flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
