"""Round-13 (r12 verdict ask #4): adopt-or-refute the xxhash64 swap in
the CC pair build's signature stage.

The r11 decomposition (CC_PAIRBUILD_r11.json) measured 86% of the CC
pair build as map-side sha256 shingle hashing (8.95 s of 10.35 s at
sf10). sha256 is the ORACLE contract — DuckDB computes the identical
hex digests, so the oracled corpus queries keep it no matter what this
measures. The question is whether the OPERATOR
(`arnab_spark.operators.minhash_signatures`, now hash-parameterized)
should default to Spark's native xxhash64 (JVM intrinsic, seeded per
band) for non-oracled production use.

ADOPT RULE — stated BEFORE measurement, SemDeDup-style:
  adopt xxhash64 as the operator default iff
  (a) signature-stage wall speedup >= 1.5x at sf10, AND
  (b) true-pair recall(xxhash64) >= 0.99 * recall(sha256) at sf1,
      where truth = pairs in the UNION of both candidate sets whose
      exact 3-word-shingle Jaccard >= 0.5 (the corpus verify
      threshold). Both families are uniform hashes, so the LSH S-curve
      predicts statistically equal recall; the measurement checks the
      prediction instead of asserting it.
On ADOPT the operator default flips (oracled queries pass
shingle_hash="sha256" explicitly); on REFUTE the parameter ships with
the sha256 default and this artifact records both walls.

Usage: python tools/cc_hash_swap.py [out.json]   (writes CC_HASH_SWAP_r13.json)
Protocol: warm + min-of-2 per wall, GC between, shuffle 128 at sf10 /
32 at sf1 — the bench's scale protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CC_HASH_SWAP_r13.json"
    )
    from pyspark.sql import functions as F

    from arnab_spark.queries.dedup import (
        CC_MIN_BANDS,
        N_BANDS,
        _MINHASH_SPARK,
        _SHINGLE_SPARK,
    )
    from arnab_spark.spark_utils import get_spark, register_spread_views
    from tools.gen_scale import generate

    sf1 = generate(src="/root/testdata/sf0.1", tables=("documents",))
    sf10 = generate(
        src=sf1,
        dest=os.path.join(REPO, ".scaledata", "sf10"),
        tables=("documents",),
    )

    spark = get_spark("cc-hash-swap", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.range(1000).selectExpr("sum(id)").collect()

    band_stack = ", ".join(f"{b}, m{b}" for b in range(N_BANDS))
    xx_mins = ", ".join(
        f"array_min(transform(shingles, s -> xxhash64(s, {b}))) AS m{b}"
        for b in range(N_BANDS)
    )
    # xxhash64 twin of the CC query's zero-shuffle signature CTE: same
    # shingling, same per-row band-min shape, xxhash64(s, band) instead
    # of sha256 slice b
    minhash_xx = f"""
WITH words AS (
  SELECT doc_id, split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT doc_id, {_SHINGLE_SPARK} AS shingles FROM words
),
sigw AS (
  SELECT doc_id, {xx_mins} FROM sh
),
sigs AS (
  SELECT doc_id, stack({N_BANDS}, {band_stack}) AS (band, sig) FROM sigw)
"""
    pairs_tail = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {CC_MIN_BANDS}
"""

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(1)

    def wall(sql: str) -> float:
        t0 = time.perf_counter()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def min2(sql: str) -> float:
        wall(sql)  # warm
        gc()
        walls = []
        for _ in range(2):
            walls.append(wall(sql))
            gc()
        return round(min(walls), 2)

    out: dict = {
        "round": 13,
        "adopt_rule": (
            "sf10 signature-stage speedup >= 1.5x AND sf1 true-pair "
            "recall(xx) >= 0.99 * recall(sha); truth = union-candidate "
            "pairs with exact 3-shingle Jaccard >= 0.5"
        ),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    # --- sf10 walls ---------------------------------------------------
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    register_spread_views(spark, sf10, ("documents",))
    out["sf10"] = {
        "sigs_sha256_min": min2(_MINHASH_SPARK + "SELECT * FROM sigs"),
        "sigs_xxhash64_min": min2(minhash_xx + "SELECT * FROM sigs"),
        "pairs_sha256_min": min2(_MINHASH_SPARK + pairs_tail),
        "pairs_xxhash64_min": min2(minhash_xx + pairs_tail),
    }
    out["sf10"]["sigs_speedup"] = round(
        out["sf10"]["sigs_sha256_min"] / out["sf10"]["sigs_xxhash64_min"], 2
    )
    out["sf10"]["pairs_speedup"] = round(
        out["sf10"]["pairs_sha256_min"] / out["sf10"]["pairs_xxhash64_min"], 2
    )
    print("sf10:", out["sf10"], flush=True)

    # --- sf1 quality ----------------------------------------------------
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    register_spread_views(spark, sf1, ("documents",))
    p_sha = spark.sql(_MINHASH_SPARK + pairs_tail)
    p_xx = spark.sql(minhash_xx + pairs_tail)
    union = p_sha.unionByName(p_xx).distinct().localCheckpoint()
    sh = spark.sql(
        f"""
WITH words AS (SELECT doc_id, split(text, ' ') AS w FROM documents)
SELECT DISTINCT doc_id, shingle
FROM words LATERAL VIEW explode({_SHINGLE_SPARK}) t AS shingle
"""
    ).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        union.join(sh.alias("a"), union.doc_a == F.col("a.doc_id"))
        .join(
            sh.alias("b"),
            (union.doc_b == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        union.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.alias("sa"), union.doc_a == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), union.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sa.n") + F.col("sb.n") - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("j"),
        )
    )
    truth = jac.filter(F.col("j") >= 0.5).select("doc_a", "doc_b").localCheckpoint()
    n_truth = truth.count()
    rec_sha = truth.join(p_sha, ["doc_a", "doc_b"], "left_semi").count()
    rec_xx = truth.join(p_xx, ["doc_a", "doc_b"], "left_semi").count()
    out["sf1_quality"] = {
        "candidates_sha256": p_sha.count(),
        "candidates_xxhash64": p_xx.count(),
        "true_pairs_in_union": n_truth,
        "recall_sha256": round(rec_sha / n_truth, 4) if n_truth else None,
        "recall_xxhash64": round(rec_xx / n_truth, 4) if n_truth else None,
    }
    print("sf1 quality:", out["sf1_quality"], flush=True)

    q = out["sf1_quality"]
    adopt = (
        out["sf10"]["sigs_speedup"] >= 1.5
        and q["recall_sha256"] is not None
        and q["recall_xxhash64"] >= 0.99 * q["recall_sha256"]
    )
    out["verdict"] = "ADOPT" if adopt else "REFUTE"
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("verdict:", out["verdict"], "->", out_path)


if __name__ == "__main__":
    main()
