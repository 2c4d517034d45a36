"""Round-11 skewed-key scale point for the asof family (r10 verdict
ask #7).

The events fixture scales users linearly with constant per-user
fan-out, so the asof slope rounds 8-10 measured never stressed the
skew path. This tool builds a SKEWED variant of a scale point's events
table — every user whose id % SKEW_MOD == 0 is remapped to user 1, so
one user owns ~1/SKEW_MOD of all events — and measures the headline
`asof_join` (union + carry-forward window) and `asof_join_pandas`
(per-key applyInPandas) on uniform vs skewed inputs, min-of-N.

What the measurement can and cannot prove: the carry-forward strategy
shuffles on user_id and sorts WITHIN window partitions; Spark's AQE
skew handling splits skewed SORT-MERGE JOIN partitions, NOT window
partitions, so a hot user is expected to serialize into one task.
The docstring claim "skew handled by AQE" is exactly what this tool
confirms or refutes with numbers — the verdict lands in SCALE.md
either way.

Usage: python tools/asof_skew.py [sf_dir] [out.json] [passes] [skew_mod]
                            [queries]
Defaults: .scaledata/sf10, ASOF_SKEW_r11.json, 3, 10,
"asof_join,asof_join_pandas". The skewed events parquet is cached at
<sf_dir>/../asof_skew_m<mod>/. Round 12 (r11 verdict ask #8): pass
"asof_join,asof_join_bucketed" to pin the bucketed segmented scan —
shipped as the documented hot-key mitigation — against the plain
carry under the same harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKEW_MOD = 10  # default: user 1 absorbs ~10% of all events (arg 4 overrides)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaledata", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "ASOF_SKEW_r11.json"
    )
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    skew_mod = int(sys.argv[4]) if len(sys.argv) > 4 else SKEW_MOD
    qnames = (
        sys.argv[5].split(",")
        if len(sys.argv) > 5
        else ["asof_join", "asof_join_pandas"]
    )

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    spark = get_spark("asof_skew", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reg = all_queries()

    # build the skewed events variant once (deterministic remap)
    skew_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), f"asof_skew_m{skew_mod}")
    marker = os.path.join(skew_dir, "_SKEW_OK")
    if not os.path.exists(marker):
        os.makedirs(skew_dir, exist_ok=True)
        e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        skewed = e.selectExpr(
            "event_id",
            f"IF(user_id % {skew_mod} = 0, CAST(1 AS BIGINT), user_id) AS user_id",
            *[c for c in e.columns if c not in ("event_id", "user_id")],
        )
        skewed.coalesce(8).write.mode("overwrite").parquet(
            os.path.join(skew_dir, "events.parquet")
        )
        open(marker, "w").write("ok\n")

    def best_wall(fn, d: str) -> tuple[float, int]:
        walls, n = [], 0
        for _ in range(passes):
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 2), n

    result: dict = {"sf_dir": sf_dir, "skew_mod": skew_mod, "passes": passes}
    for qname in qnames:
        fn = reg[qname].fn
        w_u, n_u = best_wall(fn, sf_dir)
        w_s, n_s = best_wall(fn, skew_dir)
        result[qname] = {
            "uniform_wall": w_u,
            "skewed_wall": w_s,
            "skew_ratio": round(w_s / w_u, 2) if w_u else None,
            "uniform_rows": n_u,
            "skewed_rows": n_s,
        }
        print(qname, result[qname], flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
