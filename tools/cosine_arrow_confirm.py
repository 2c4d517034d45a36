"""Round-15: clean-box interleaved confirm of the ``arrowgroup`` cosine
variant on the REGISTRY dedup_embedding_cosine query at sf10.

Motivation: COSINE_DECOMP_r15.json measured arrowgroup (grouped
applyInArrow + zero-copy panel build instead of applyInPandas +
``pdf[iv].tolist()``) at 1.44x/1.73x — passing the both-orders rule —
but that whole run was load-degraded (loadavg 0.9 -> 29; baseline runs
of 81-122 s against a 19 s quiet record), and the int32tile adoption
from the SAME run was later refuted by a clean interleaved A/B
(COSINE_AB_r15.json: 0.93x). The arrowgroup reading therefore inherits
the same suspicion and gets the same deciding protocol before any
registry adoption.

Protocol (identical in structure to tools/cosine_ab_confirm.py):
loadavg gate < 2.0 at entry; one discarded warm run; then
ON/OFF/ON/OFF adjacent pairs (ON = arrowgroup spelling from
tools.cosine_decomp, OFF = the shipped registry function), same
session, bench sf10 dedup-family config (shuffle=128). Interleaving
cancels monotone box drift: a real win shows ON beating OFF in most
adjacent pairs regardless of pace.

ADOPT RULE (pre-stated): make arrowgroup the operator's grouped-scoring
path iff (a) exact row-set identity vs the shipped path at sf0.1 AND
sf10, (b) interleaved min-ratio off_min/on_min >= 1.15, and (c) ON wins
>= 3/4 adjacent pairs. Otherwise the shipped applyInPandas path stays
and the variant is TERMINAL for local[32] (same end state as int32tile).

Writes COSINE_ARROW_r15.json.
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
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from tools.cosine_decomp import _query_fn
    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    sf01 = "/root/testdata/sf0.1"
    sf10 = generate_sf10(generate(src=sf01))
    spark = get_spark("cosine_arrow", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    off_fn = all_queries()["dedup_embedding_cosine"].fn
    on_fn = _query_fn(arrow_group=True)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    identical = {
        "sf0.1": rows(on_fn(spark, sf01)) == rows(off_fn(spark, sf01)),
        "sf10": rows(on_fn(spark, sf10)) == rows(off_fn(spark, sf10)),
    }

    def run(fn) -> float:
        gc.collect()
        t0 = time.perf_counter()
        fn(spark, sf10).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    run(on_fn)  # warm (codegen, file listing) — discarded
    seq: list[dict] = []
    for _ in range(PAIRS):
        seq.append({"variant": "on", "wall": run(on_fn),
                    "loadavg1": round(os.getloadavg()[0], 2)})
        seq.append({"variant": "off", "wall": run(off_fn),
                    "loadavg1": round(os.getloadavg()[0], 2)})
    on = [s["wall"] for s in seq if s["variant"] == "on"]
    off = [s["wall"] for s in seq if s["variant"] == "off"]
    pairs_on_wins = sum(1 for a, b in zip(on, off) if a < b)
    ratio = round(min(off) / min(on), 2)
    adopt = identical["sf0.1"] and identical["sf10"] and ratio >= 1.15 \
        and pairs_on_wins >= 3
    out = {
        "round": 15,
        "what": "clean-box interleaved ON/OFF confirm of the arrowgroup "
                "grouped-scoring variant on the registry "
                "dedup_embedding_cosine at sf10 (the COSINE_DECOMP "
                "1.44x/1.73x reading came from a load-degraded run whose "
                "sibling int32tile adoption was refuted 0.93x)",
        "adopt_rule": "identity at sf0.1+sf10 AND off_min/on_min >= 1.15 "
                      "AND on wins >= 3/4 adjacent pairs",
        "identical": identical,
        "sequence": seq,
        "on_min": min(on), "off_min": min(off),
        "on_runs": on, "off_runs": off,
        "pairs_on_wins": f"{pairs_on_wins}/{PAIRS}",
        "speedup_min_ratio": ratio,
        "verdict": "ADOPT arrowgroup" if adopt else
                   "TERMINAL for local[32]: keep applyInPandas",
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(REPO, "COSINE_ARROW_r15.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("identical", "on_min", "off_min", "pairs_on_wins",
                       "speedup_min_ratio", "verdict")}, indent=1))


if __name__ == "__main__":
    main()
