"""Per-round decomposition of the dedup_connected_groups closure at
sf10 (round-10, r9 verdict ask #3).

The r9 scale run put dedup_connected_groups at 108.8 s — the dedup
family's dominant sf10 spender. This tool splits that wall in-band into
its three phases under the EXACT bench sf10 configuration (local[32],
shuffle=128, AQE on, 1 MB splits; the only delta is
``spark.ui.enabled=true``, the REST metrics source):

1. **pair build** — the MinHash/LSH candidate-pair SQL feeding the
   graph (shingle → 8-band signature → band equi-join → >=2 shared
   bands), measured to first materialization;
2. **per operation** of the closure — wall, row count (changed rows
   for the old min-label loop; surviving edges for the round-10
   large-star/small-star contraction), and the operation's executor
   shuffle read/write byte deltas (REST ``/executors``), via the
   operator's ``on_round`` hook;
3. **total closure wall** for cross-checking against the bench's
   family number.

This tool's three runs (CC_DECOMP_r10.json) are what motivated the
round-10 algorithm switch: min-label walls were FLAT per round while
changed counts collapsed geometrically — fixed driver cost × diameter
rounds — so the O(log n)-round star contraction replaced it (closure
75 s -> 19.7 s measured).

Usage: ``python tools/cc_decompose.py [sf_dir] [out.json]`` (defaults:
``.scaledata/sf10``, ``CC_DECOMP_r10.json``).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _executors_shuffle(ui: str, app: str) -> tuple[int, int]:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/executors", timeout=10
    ) as r:
        execs = json.load(r)
    return (
        sum(e.get("totalShuffleRead", 0) for e in execs),
        sum(e.get("totalShuffleWrite", 0) for e in execs),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaledata", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "CC_DECOMP_r10.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from pyspark.sql import SparkSession

    from arnab_spark.operators import connected_components
    from arnab_spark.queries.dedup import CC_MIN_BANDS, _MINHASH_SPARK
    from arnab_spark.spark_utils import configure, register_spread_views

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("arnab_cc_decompose")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ["ARNAB_SPARK_DRIVER_MEM"])
        .config("spark.ui.enabled", "true")  # REST source — only bench delta
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
    # the bench's sf10 setting (scale section: 128 partitions)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    spark.range(1000).selectExpr("sum(id)").collect()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    result: dict = {
        "_comment": (
            "dedup_connected_groups at sf10 decomposed: pair-build wall, "
            "per-round wall + changed count + executor shuffle byte "
            "deltas (REST), total closure wall. Bench sf10 config "
            "(shuffle=128, AQE on) + spark.ui for metrics."
        ),
        "sf_dir": sf_dir,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }

    register_spread_views(spark, sf_dir, ("documents",))
    pairs_sql = (
        _MINHASH_SPARK
        + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {CC_MIN_BANDS}
"""
    )
    t_all = time.monotonic()
    t0 = time.monotonic()
    pairs = spark.sql(pairs_sql).localCheckpoint()
    n_pairs = pairs.count()
    result["pair_build"] = {
        "wall_s": round(time.monotonic() - t0, 2),
        "pairs": n_pairs,
    }
    print(f"pair build: {result['pair_build']}", file=sys.stderr)

    rounds: list[dict] = []
    last = {"rw": _executors_shuffle(ui, app)}

    def on_round(i: int, wall: float, changed: int) -> None:
        rd, wr = _executors_shuffle(ui, app)
        prd, pwr = last["rw"]
        last["rw"] = (rd, wr)
        rounds.append(
            {
                "round": i,
                "wall_s": round(wall, 2),
                "changed": changed,
                "shuffle_read_mb": round((rd - prd) / 1e6, 1),
                "shuffle_write_mb": round((wr - pwr) / 1e6, 1),
            }
        )
        print(f"round {rounds[-1]}", file=sys.stderr)

    t0 = time.monotonic()
    comps = connected_components(
        pairs, src="doc_a", dst="doc_b", on_round=on_round
    )
    n_nodes = comps.count()
    closure_wall = time.monotonic() - t0
    result["closure"] = {
        "wall_s": round(closure_wall, 2),
        "rounds": len(rounds),
        "nodes": n_nodes,
        "per_round": rounds,
    }
    result["total_wall_s"] = round(time.monotonic() - t_all, 2)
    result["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(out_path)


if __name__ == "__main__":
    main()
