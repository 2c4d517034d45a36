"""Round-15: does a preceding dedup_connected_groups run degrade
dedup_embedding_cosine in the SAME session?

Motivation: the clean interleaved A/B (COSINE_AB_r15.json) read the
registry cosine query at 12.7-16.7 s standalone, but every post-CC-fuse
FAMILY run reads it at 27-59 s (quiet record before the fuse: 19 s) —
while the untouched queries around it track box pace. The only changed
query that runs BEFORE cosine inside the dedup family is the fused
connected-components closure, whose job-structure rewrite leans on
rebinding + ContextCleaner (instead of eager per-op lifecycle) to
reclaim localCheckpoint blocks. If those blocks linger, the cosine tile
shuffle + Arrow matmul inherit a memory-pressured JVM.

Protocol: one session, bench dedup-family config. Warm cosine, read its
clean wall twice, then alternate CC-run -> cosine-run twice more,
recording the JVM's persistent-RDD count and storage memory before and
after every step. Verdict material: if cosine walls after CC are
systematically above the pre-CC walls (and persistent RDDs linger),
the interaction is real and the CC fuse needs explicit block lifecycle.
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


def main() -> None:
    load1 = os.getloadavg()[0]
    if load1 > 2.0:
        print(f"ABORT: box not quiet (1-min loadavg {load1:.2f} > 2.0)")
        sys.exit(2)
    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    sf10 = generate_sf10(generate(src="/root/testdata/sf0.1"))
    spark = get_spark("cc_interaction", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    registry = all_queries()

    jsc = spark.sparkContext._jsc.sc()

    def jvm_state() -> dict:
        mem = jsc.getExecutorMemoryStatus()
        # local mode: a single driver entry; remaining = free storage mem
        first = mem.values().iterator().next()
        return {
            "persistent_rdds": jsc.getPersistentRDDs().size(),
            "storage_free_mb": round(first._2() / 1e6),
            "storage_max_mb": round(first._1() / 1e6),
        }

    def run(name: str) -> float:
        gc.collect()
        t0 = time.perf_counter()
        registry[name].fn(spark, sf10).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    spark.range(1000).selectExpr("sum(id)").collect()
    seq: list[dict] = []

    def step(label: str, name: str) -> None:
        wall = run(name)
        seq.append({"step": label, "wall": wall,
                    "loadavg1": round(os.getloadavg()[0], 2), **jvm_state()})
        print(json.dumps(seq[-1]), flush=True)

    step("cosine_warm", "dedup_embedding_cosine")
    step("cosine_clean_1", "dedup_embedding_cosine")
    step("cosine_clean_2", "dedup_embedding_cosine")
    for i in (1, 2):
        step(f"cc_{i}", "dedup_connected_groups")
        step(f"cosine_after_cc_{i}", "dedup_embedding_cosine")

    clean = [s["wall"] for s in seq if s["step"].startswith("cosine_clean")]
    after = [s["wall"] for s in seq if s["step"].startswith("cosine_after")]
    out = {
        "round": 15,
        "what": "same-session CC -> cosine interaction probe (family-order "
                "regression vs standalone A/B discrepancy)",
        "sequence": seq,
        "cosine_clean_walls": clean,
        "cosine_after_cc_walls": after,
        "degradation_min_ratio": round(min(after) / min(clean), 2),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    with open(os.path.join(REPO, "CC_INTERACTION_r15.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("cosine_clean_walls", "cosine_after_cc_walls",
                       "degradation_min_ratio")}))


if __name__ == "__main__":
    main()
