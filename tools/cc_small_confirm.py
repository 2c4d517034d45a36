"""Round-16: clean interleaved ON/OFF confirm of the small-graph
union-find fast path on the REGISTRY dedup_connected_groups query at
sf10 — the r15 int32tile lesson applied: every adoption whose harness
sessions saw load drift gets one interleaved confirm before the round
ships it (the CC_FUSE2_r16 session-B loadavg drifted to ~9-11, and the
standalone smallgraph row read 1.39x/1.04x while the adopted `combined`
row — the identical code path at bench scale — read 1.40x/1.22x).

ON  = the shipped registry function (small-graph fast path, default
      ARNAB_CC_SMALL_EDGES=2,000,000 — the sf10 pair graph is ~200k
      canonical edges, far under it).
OFF = the identical pair build + connected_components with
      small_graph_edges=0 (the r15 distributed star contraction).

ADVICE r15 applied: pair starts ALTERNATE (ON/OFF, OFF/ON, ...) so
monotone load drift cannot systematically favor one position; wins are
counted per adjacent pair as laid out.

PRE-STATED KEEP RULE: keep the adoption iff interleaved min-ratio
(off_min/on_min) >= 1.15 AND ON wins >= 3 of 4 pairs; else revert the
operator default to the distributed path (terminal).

Writes measurements/r16/CC_SMALL_CONFIRM_r16.json.
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

PAIRS = 4


def main() -> None:
    load1 = os.getloadavg()[0]
    if load1 > 2.0:
        print(f"ABORT: box not quiet (1-min loadavg {load1:.2f} > 2.0)")
        sys.exit(2)
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.operators import connected_components
    from arnab_spark.queries import all_queries
    from arnab_spark.queries.dedup import _MINHASH_SPARK, CC_MIN_BANDS
    from arnab_spark.spark_utils import get_spark, register_spread_views

    sf10 = generate_sf10(generate(src="/root/testdata/sf0.1"))
    spark = get_spark("cc_small_confirm", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    registry = all_queries()
    on_fn = registry["dedup_connected_groups"].fn

    def _pairs(spark, sf_dir):
        register_spread_views(spark, sf_dir, ("documents",))
        return spark.sql(
            _MINHASH_SPARK
            + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {CC_MIN_BANDS}
"""
        )

    def off_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        comps = connected_components(
            _pairs(spark, sf_dir), "doc_a", "doc_b", small_graph_edges=0
        )
        return comps.select(
            F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id")
        )

    def run(fn) -> float:
        gc.collect()
        t0 = time.perf_counter()
        fn(spark, sf10).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    spark.range(1000).selectExpr("sum(id)").collect()
    run(on_fn)  # warm (codegen, file listing) — discarded
    run(off_fn)  # warm the OFF plan too so neither side pays first-run costs
    seq: list[dict] = []
    for i in range(PAIRS):
        order = ("on", "off") if i % 2 == 0 else ("off", "on")
        walls = {}
        for variant in order:
            walls[variant] = run(on_fn if variant == "on" else off_fn)
            seq.append({"variant": variant, "wall": walls[variant],
                        "loadavg1": round(os.getloadavg()[0], 2)})
        seq[-1]["pair_on_wins"] = walls["on"] < walls["off"]
    on = [s["wall"] for s in seq if s["variant"] == "on"]
    off = [s["wall"] for s in seq if s["variant"] == "off"]
    pairs_on_wins = sum(1 for s in seq if s.get("pair_on_wins"))
    keep = (min(off) / min(on)) >= 1.15 and pairs_on_wins >= 3
    out = {
        "round": 16,
        "what": "interleaved ON/OFF confirm of the CC small-graph fast "
                "path on the registry dedup_connected_groups at sf10; "
                "pair starts alternate per ADVICE r15",
        "keep_rule": "min-ratio >= 1.15 AND ON wins >= 3/4 pairs, else revert",
        "sequence": seq,
        "on_min": min(on), "off_min": min(off),
        "on_runs": on, "off_runs": off,
        "pairs_on_wins": f"{pairs_on_wins}/{PAIRS}",
        "speedup_min_ratio": round(min(off) / min(on), 2),
        "verdict": "KEEP" if keep else "REVERT",
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(REPO, "measurements", "r16", "CC_SMALL_CONFIRM_r16.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("on_min", "off_min", "pairs_on_wins",
                       "speedup_min_ratio", "verdict")}, indent=1))


if __name__ == "__main__":
    main()
