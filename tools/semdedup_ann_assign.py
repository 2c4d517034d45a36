"""Round-12 (r11 verdict ask #5): measure the SemDeDup assign term's
ANN swap — the paper's own move at extreme scale (Abbas et al. 2023:
with k ∝ n the exact n·k centroid argmax grows a decade per decade;
SEMDEDUP_SCALE_r11.json measured it at 5.15 s of the 17.6 s sf10
family wall).

Compares :func:`arnab_spark.operators.ivf_assign` (exact n·k matmul)
against :func:`ivf_assign_coarse` (two-level quantizer: sqrt(k) coarse
groups, probe the ``n_probe`` best, argmax within — O(sqrt(k) +
n_probe·k/sqrt(k)) dots per vector) at the sf10 point (500k vectors,
k=1600, coarse=40 groups), recording per-n_probe:

  - assign-only wall (warm + min-of-2, noop sink, GC between), and
  - CELL-ASSIGNMENT AGREEMENT vs the exact assign (exact join on
    vec_id; the quantity that bounds how much the downstream
    within-cell pair stage can diverge).

Adopt/refute rule stated up front: adopt as the documented 100 TB
assignment knob if some n_probe reaches ≥0.99 agreement at ≥2x
assign-stage speedup; otherwise record the refutation. Either way the
exact assign stays the oracled default (the driver hash pins exact
cells).

Usage: python tools/semdedup_ann_assign.py [out.json]
Writes SEMDEDUP_ASSIGN_r12.json. Requires .scaledata/sf10 (generated
idempotently, same as the r11 scale harness).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 1600  # the r11 sf10 configuration (k scales 10x per decade)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SEMDEDUP_ASSIGN_r12.json"
    )
    from tools.gen_scale import generate

    from arnab_spark.operators import (
        ivf_assign,
        ivf_assign_coarse,
        ivf_centroids,
        quantize_embeddings,
    )
    from arnab_spark.spark_utils import get_spark, load_table

    sf1 = generate(src="/root/testdata/sf0.1", tables=("embeddings",))
    sf10 = generate(
        src=sf1,
        dest=os.path.join(REPO, ".scaledata", "sf10"),
        tables=("embeddings",),
    )

    spark = get_spark(
        "semdedup-ann-assign", os.environ.get("ARNAB_BENCH_CPUS", "32")
    )
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    def gc() -> None:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        time.sleep(1)

    e = quantize_embeddings(load_table(spark, sf10, "embeddings"), "embedding", 64)
    cents = ivf_centroids(e, k=K)

    def wall(frame_fn) -> float:
        t0 = time.perf_counter()
        frame_fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    def min2(frame_fn) -> tuple[float, list[float]]:
        frame_fn().write.format("noop").mode("overwrite").save()  # warm
        gc()
        walls = []
        for _ in range(2):
            walls.append(wall(frame_fn))
            gc()
        return min(walls), walls

    result: dict = {
        "round": 12,
        "sf_dir": sf10,
        "k": K,
        "n_vectors": e.count(),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "adopt_rule": ">=0.99 agreement at >=2x assign speedup",
    }

    exact_min, exact_walls = min2(lambda: ivf_assign(e, cents))
    result["exact"] = {"min": exact_min, "walls": exact_walls}
    print("exact:", result["exact"], flush=True)

    exact_cells = ivf_assign(e, cents).select("vec_id", "cell")
    n_total = None
    result["coarse"] = {}
    for n_probe in (1, 2, 4, 8):
        m, walls = min2(lambda: ivf_assign_coarse(e, cents, n_probe=n_probe))
        approx = ivf_assign_coarse(e, cents, n_probe=n_probe).select(
            "vec_id", "cell"
        )
        joined = exact_cells.alias("a").join(
            approx.alias("b"), on="vec_id"
        )
        agree_row = joined.selectExpr(
            "count(*) AS n",
            "sum(IF(a.cell = b.cell, 1, 0)) AS same",
        ).collect()[0]
        n_total = agree_row["n"]
        rec = {
            "min": m,
            "walls": walls,
            "agreement": round(agree_row["same"] / agree_row["n"], 5),
            "speedup_vs_exact": round(exact_min / m, 2) if m else None,
        }
        result["coarse"][f"n_probe={n_probe}"] = rec
        print(f"n_probe={n_probe}:", rec, flush=True)

    result["n_vectors_joined"] = n_total
    result["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
