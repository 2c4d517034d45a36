"""Round-13 (r12 verdict ask #3): scale comparison of the two
decontamination spellings — `text_decontaminate` (digest/DISTINCT-
ngram broadcast join) vs `text_decontaminate_bloom`, now with m
DERIVED from the held-out distinct-gram count (next pow2 >= 16x
grams, floor 64 Ki bits) instead of r12's fixed 64 Ki bits that
saturated at sf10 (fill -> 1, FP -> 1, 35.3 s vs digest 12.9 s).

New in this round's artifact: per-decade filter diagnostics (m_bits,
fill fraction — non-saturation evidence) and the FP excess (bloom
flagged-gram total vs the digest join's exact total).

What the measurement pins: the bloom variant's selling point is a
probe side whose broadcast is CONSTANT-size while the digest join's
broadcast grows with the benchmark. At fixture scales both broadcasts
are tiny, so the interesting quantities are (a) the wall trend per
decade and (b) whether the bloom's extra per-gram hashing (3 md5
slices + bit math) costs more than the digest join's bigger broadcast
saves. Honest framing up front: if the digest join stays faster at
every measured decade, the artifact says so — the bloom's advantage
is the MANY-benchmarks deployment (N filters of O(m) bits vs N
growing digest sets), which fixture scale cannot reach.

Usage: python tools/bloom_scale.py [out.json]
Writes BLOOM_SCALE_r13.json. Protocol: warm + min-of-2 per point,
GC between, shuffle 32 at sf0.1/sf1 and 128 at sf10 (the bench's
scale protocol); DuckDB side measured at sf0.1/sf1 (sf10 capped like
the dedup family's oracle side).
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
        REPO, "BLOOM_SCALE_r13.json"
    )
    import duckdb

    from tools.gen_scale import generate

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    sf1 = generate(src="/root/testdata/sf0.1", tables=("documents",))
    sf10 = generate(
        src=sf1,
        dest=os.path.join(REPO, ".scaledata", "sf10"),
        tables=("documents",),
    )
    points = [
        ("sf0.1", "/root/testdata/sf0.1", "32", True),
        ("sf1", sf1, "32", True),
        ("sf10", sf10, "128", False),
    ]
    reg = all_queries()
    qd = reg["text_decontaminate"]
    qb = reg["text_decontaminate_bloom"]

    out: dict = {
        "round": 13,
        "protocol": (
            "warm + min-of-2 + GC; duckdb at sf0.1/sf1 only (same cap as "
            "the dedup-family oracle side)"
        ),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "points": {},
    }

    from arnab_spark.queries.llm_text import _bloom_diag_sql

    # DuckDB side FIRST (before the JVM exists — the bench's honesty rule)
    for label, d, _sh, run_duck in points:
        rec: dict = {}
        if run_duck:
            for key, q in (("digest", qd), ("bloom", qb)):
                walls = []
                for _ in range(2):
                    con = duckdb.connect()
                    con.execute(
                        "CREATE VIEW documents AS SELECT * FROM "
                        f"read_parquet('{d}/documents.parquet')"
                    )
                    t0 = time.perf_counter()
                    con.execute(q.oracle).fetchall()
                    walls.append(time.perf_counter() - t0)
                    con.close()
                rec[f"duckdb_{key}_min"] = round(min(walls), 2)
            # saturation diagnostics (cheap relative to the walls above)
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')"
            )
            m_bits, words_n, bits_set, fill = con.execute(
                _bloom_diag_sql("duckdb")
            ).fetchone()
            con.close()
            rec["m_bits"] = m_bits
            rec["filter_words"] = words_n
            rec["fill_fraction"] = round(fill, 4)
        out["points"][label] = rec

    spark = get_spark("bloom-scale", os.environ.get("ARNAB_BENCH_CPUS", "32"))

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(1)

    spark.range(1000).selectExpr("sum(id)").collect()  # session warm-up

    def wall(q, d) -> float:
        t0 = time.perf_counter()
        q.fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for label, d, shuffle, _run_duck in points:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        rec = out["points"][label]
        for key, q in (("digest", qd), ("bloom", qb)):
            wall(q, d)  # warm
            gc()
            walls = []
            for _ in range(2):
                walls.append(wall(q, d))
                gc()
            rec[f"spark_{key}_min"] = round(min(walls), 2)
            rec[f"spark_{key}_walls"] = [round(w, 2) for w in walls]
        # FP excess: bloom flagged-gram total vs the digest join's exact
        # total (same unit — distinct flagged 8-grams summed over docs);
        # (bloom - exact) / bloom is the fraction of flags that are
        # false positives. r12's saturated filter sat near 1 here.
        ex = qd.fn(spark, d).groupBy().sum("n_contaminated_ngrams").collect()[0][0] or 0
        bl = qb.fn(spark, d).groupBy().sum("n_flagged_ngrams").collect()[0][0] or 0
        rec["exact_flagged_grams"] = int(ex)
        rec["bloom_flagged_grams"] = int(bl)
        rec["fp_excess_fraction"] = round((bl - ex) / bl, 4) if bl else 0.0
        if "m_bits" not in rec:
            # sf10's diagnostics run on the Spark side (the DuckDB side
            # is capped at sf1, same as the dedup-family oracle cap)
            from arnab_spark.queries.llm_text import _bloom_diag_sql
            from arnab_spark.spark_utils import register_spread_views

            register_spread_views(spark, d, ("documents",))
            m_bits, words_n, bits_set, fill = spark.sql(
                _bloom_diag_sql("spark")
            ).collect()[0]
            rec["m_bits"] = int(m_bits)
            rec["filter_words"] = int(words_n)
            rec["fill_fraction"] = round(fill, 4)
        print(label, rec, flush=True)

    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
