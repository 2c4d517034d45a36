"""Round-12 (r11 verdict ask #6): attribute `dedup_incremental`'s sf10
warm/min gap — DEDUP_FAMILY_r11.json recorded its first measured pass
at 8.97 s vs a 1.73 s min, a 5.2x spread no other family member shows
(their warm/min gaps are ≤1.6x), with nothing in SCALE.md to name the
cause.

In the family harness the first measured dedup_incremental run is only
the query's SECOND execution ever and lands immediately after
text_boilerplate_ngrams' COLD (heaviest) warm-up run. Candidate causes,
each isolated by one arm below:

  A. second-execution effect (page cache / JIT still cold for this
     plan): arm "isolated" — fresh-session warm + 4 measured runs with
     nothing else running; if run 1 >> runs 2-4 the effect is
     positional warm-up, not interference.
  B. heavy-predecessor carryover (heap/GC debt from boilerplate's
     ~30 s cold pass): arm "after_heavy" — alternate boilerplate →
     dedup_incremental; if the follower inflates, the predecessor is
     the cause.
  C. same as B but collectable: arm "after_heavy_gc" — an explicit
     System.gc() between predecessor and follower; recovery here names
     JVM heap debt specifically, non-recovery points at executor
     page-cache / shuffle-file pressure outside the collector.

Usage: python tools/dedup_incremental_gap.py [sf_dir] [out.json]
Defaults: .scaledata/sf10, DEDUP_INCR_GAP_r12.json. Protocol matches
the family harness: shuffle partitions 128, default broadcast
threshold, noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scaledata", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "DEDUP_INCR_GAP_r12.json"
    )

    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import get_spark

    spark = get_spark(
        "dedup_incr_gap", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    reg = all_queries()
    incr = reg["dedup_incremental"].fn
    heavy = reg["text_boilerplate_ngrams"].fn

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        noop(fn(spark, sf_dir))
        return round(time.perf_counter() - t0, 2)

    result: dict = {
        "round": 12,
        "sf_dir": sf_dir,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
    }

    # arm A: isolated series (run 1 is the second execution ever — the
    # family harness's exact position for the 8.97 s reading)
    warm = timed(incr)
    result["isolated"] = {
        "warmup_first_execution": warm,
        "runs": [timed(incr) for _ in range(4)],
    }

    # arm B: heavy predecessor immediately before, 3 cycles
    after_heavy = []
    for _ in range(3):
        t_h = timed(heavy)
        after_heavy.append({"heavy": t_h, "incr": timed(incr)})
    result["after_heavy"] = after_heavy

    # arm C: same, with an explicit full-GC hint between
    after_heavy_gc = []
    for _ in range(3):
        t_h = timed(heavy)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        after_heavy_gc.append({"heavy": t_h, "incr": timed(incr)})
    result["after_heavy_gc"] = after_heavy_gc

    result["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
