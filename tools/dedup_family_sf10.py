"""Round-11 (r10 verdict ask #8, stretch): re-measure the dedup
family's per-query split at sf10 under BOTH round-10/11 fixes — the
star-contraction connected components (r10) and the S-curve-derived
r=2 x b=4 ngram banding with the trigram-consistent verifier (r11) —
to confirm `dedup_embedding_cosine`'s tiling holds as documented and
that no new dominant spender hides behind the family wall.

Protocol matches bench.py's sf10 dedup section exactly (shuffle
partitions 128, default broadcast threshold — the tpch8-scoped 256 MB
override never applies here, see the round-10 config-leak finding),
but with warm + min-of-2 instead of bench's warm + 1 so the artifact
of record is not a single-pass reading.

Writes DEDUP_FAMILY_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import DEDUP_FAMILY  # the bench family list is the contract


def main() -> None:
    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    sf1 = generate(src="/root/testdata/sf0.1")
    sf10 = generate_sf10(sf1)

    spark = get_spark("dedup-family-sf10", os.environ.get("ARNAB_BENCH_CPUS", "32"))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    registry = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf10)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    per: dict[str, list[float]] = {n: [] for n in DEDUP_FAMILY}
    # session warm-up BEFORE the per-query warm pass (round 12, r11
    # wrong #3): the family's first query used to absorb JVM/codegen/
    # reader init — dedup_incremental's 8.97 s "warm" vs 1.73 s min was
    # exactly this, reproduced + attributed in DEDUP_INCR_GAP_r12.json
    spark.range(1000).selectExpr("sum(id)").collect()
    warm: dict[str, float] = {}
    for n in DEDUP_FAMILY:  # warm pass (JIT, codegen, file listing)
        warm[n] = run(n)
        print(f"warm  {n}: {warm[n]:.2f}s", file=sys.stderr)
    walls = []
    for i in range(2):
        t_pass = 0.0
        for n in DEDUP_FAMILY:
            dt = run(n)
            per[n].append(dt)
            t_pass += dt
            print(f"pass{i + 1} {n}: {dt:.2f}s", file=sys.stderr)
        walls.append(t_pass)

    out = {
        "round": 11,
        "sf": 10,
        "protocol": "warm + min-of-2, shuffle=128, default broadcast threshold",
        "family_wall_min": round(min(walls), 2),
        "family_pass_walls": [round(w, 2) for w in walls],
        "queries_min": {n: round(min(v), 2) for n, v in per.items()},
        "queries_warm": {n: round(v, 2) for n, v in warm.items()},
        "loadavg_end": os.getloadavg(),
    }
    path = os.path.join(REPO, "DEDUP_FAMILY_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
