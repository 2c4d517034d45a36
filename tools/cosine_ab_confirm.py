"""Round-15: interleaved A/B confirm of the int32_tiles adoption on the
REGISTRY dedup_embedding_cosine query at sf10.

Motivation: the post-adoption family harness read the query at 55-101 s
against the 19 s quiet record, but untouched queries in the same run
swung 2-2.4x between passes (text_boilerplate_ngrams 17.7 -> 42.2 s),
i.e. the box was degrading mid-harness. An ON/OFF/ON/OFF interleave
cancels monotone drift: if int32_tiles regressed the query, OFF beats
ON in most adjacent pairs regardless of box pace; if the slowdown was
pace, the pairs split.

Runs the exact registry function (ON = committed code) against the same
function with the operator flag forced off (OFF), same session, bench
sf10 dedup-family config (shuffle=128). Writes COSINE_AB_r15.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PAIRS = 4  # ON/OFF adjacent pairs


def main() -> None:
    load1 = os.getloadavg()[0]
    if load1 > 2.0:
        print(f"ABORT: box not quiet (1-min loadavg {load1:.2f} > 2.0)")
        sys.exit(2)
    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.operators import bucketed_cosine_pairs
    from arnab_spark.queries import all_queries
    from arnab_spark.queries.dedup import _COSINE_THRESHOLD, _Q, DIM
    from arnab_spark.spark_utils import get_spark, load_table

    sf10 = generate_sf10(generate(src="/root/testdata/sf0.1"))
    spark = get_spark("cosine_ab", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    registry = all_queries()

    def q_off(spark, sf_dir):
        # the pre-adoption spelling: identical quantization, flag off
        q = load_table(spark, sf_dir, "embeddings").selectExpr(
            "vec_id",
            "label",
            f"transform(sequence(1, {DIM}), i -> CAST(floor(CAST(element_at(embedding, i)"
            f" AS DOUBLE) * {_Q}) AS BIGINT)) AS iv",
        )
        return bucketed_cosine_pairs(
            q, bucket_col="label", threshold=_COSINE_THRESHOLD
        )

    def run(fn) -> float:
        gc.collect()
        t0 = time.perf_counter()
        fn(spark, sf10).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    on_fn = registry["dedup_embedding_cosine"].fn
    spark.range(1000).selectExpr("sum(id)").collect()
    run(on_fn)  # warm (codegen, file listing) — discarded
    seq: list[dict] = []
    for i in range(PAIRS):
        seq.append({"variant": "on", "wall": run(on_fn),
                    "loadavg1": round(os.getloadavg()[0], 2)})
        seq.append({"variant": "off", "wall": run(q_off),
                    "loadavg1": round(os.getloadavg()[0], 2)})
    on = [s["wall"] for s in seq if s["variant"] == "on"]
    off = [s["wall"] for s in seq if s["variant"] == "off"]
    pairs_on_wins = sum(1 for a, b in zip(on, off) if a < b)
    out = {
        "round": 15,
        "what": "interleaved ON/OFF confirm of int32_tiles on the registry "
                "dedup_embedding_cosine at sf10 (post-adoption family "
                "harness read 55-101 s on a drifting box)",
        "sequence": seq,
        "on_min": min(on), "off_min": min(off),
        "on_runs": on, "off_runs": off,
        "pairs_on_wins": f"{pairs_on_wins}/{PAIRS}",
        "speedup_min_ratio": round(min(off) / min(on), 2),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(REPO, "COSINE_AB_r15.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("on_min", "off_min", "pairs_on_wins",
                       "speedup_min_ratio")}, indent=1))


if __name__ == "__main__":
    main()
