"""One-off measurement harness for two round-5 verdict items.

1. FLOOR BREAKDOWN (verdict item 3): what is the ~0.1 s per-query floor
   made of?  Components measured at sf0.001 on the bench session config:
     - construct: building the DataFrame (pure py4j plan-building, no
       action)
     - submit_noop_reuse: noop-writing a PRE-BUILT DataFrame (planning +
       job submit + stage schedule + sink commit)
     - submit_noop_full: construct + write (the shipped floor probe)
     - collect_reuse_arrow / collect_reuse_noarrow: result fetch path
     - bare_range_noop / bare_range_collect: a 1-row range() job — the
       irreducible scheduler floor with no scan, no shuffle
   If submit_noop_reuse ≈ bare_range_noop the floor is scheduler time,
   not anything the queries can shed.

2. FULL-22 ORDERING A/B (verdict item 2): r4's full-22 pass regressed
   +6% while everything else improved; r4 also added the ann-family
   pass BEFORE the TPC-H blocks. Measure full22 immediately after
   warmup, then run the dedup+ann family passes, then full22 again —
   same session, same box. A delta reproduces the regression as
   session-state/GC accumulation; no delta points at box interference.

Usage: python tools/floor_probe.py  (writes one JSON line to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best(fn, n=7) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def main() -> None:
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from arnab_spark.spark_utils import DEFAULT_SF_DIR, get_spark

    sf_dir = DEFAULT_SF_DIR
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    registry = all_queries()
    spark = get_spark("floor_probe")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    out: dict = {}
    q = registry["agg_pricing_summary"]

    # -- floor breakdown ------------------------------------------------
    q.fn(spark, tiny).write.format("noop").mode("overwrite").save()  # warm

    out["construct"] = best(lambda: q.fn(spark, tiny))
    df = q.fn(spark, tiny)
    out["submit_noop_reuse"] = best(
        lambda: df.write.format("noop").mode("overwrite").save()
    )
    out["submit_noop_full"] = best(
        lambda: q.fn(spark, tiny).write.format("noop").mode("overwrite").save()
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    out["collect_reuse_arrow"] = best(lambda: df.toPandas())
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    out["collect_reuse_noarrow"] = best(lambda: df.toPandas())
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    out["collect_rows_reuse"] = best(lambda: df.collect())
    r1 = spark.range(1)
    r1.write.format("noop").mode("overwrite").save()
    out["bare_range_noop"] = best(
        lambda: r1.write.format("noop").mode("overwrite").save()
    )
    out["bare_range_collect"] = best(lambda: r1.collect())
    # batched submission: all 8 headline DataFrames pre-built, actions
    # fired back-to-back — per-query cost when construction is amortized
    names = sorted(n for n, qq in registry.items() if qq.headline)
    dfs = [registry[n].fn(spark, sf_dir) for n in names]
    for d in dfs:
        d.write.format("noop").mode("overwrite").save()

    def _batch():
        for d in dfs:
            d.write.format("noop").mode("overwrite").save()

    out["headline8_prebuilt_noop_sf01"] = best(_batch, 5)

    # -- full-22 ordering A/B -------------------------------------------
    full22 = sorted(n for n, qq in registry.items() if "tpch" in qq.tags)

    def _run(name: str) -> None:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _pass(qs) -> None:
        for n in qs:
            _run(n)

    _pass(full22)  # warm
    out["full22_early"] = best(lambda: _pass(full22), 2)
    # now the family passes that r4 inserted before the TPC-H blocks
    fam = [
        "dedup_incremental", "dedup_simhash", "dedup_ngram_jaccard",
        "dedup_connected_groups", "dedup_embedding_cosine",
        "text_fingerprint", "text_decontaminate", "text_boilerplate_ngrams",
        "ann_lsh_bucketed", "ann_ivf_cells", "ann_ivf_refined",
        "ann_ivf_recall", "ann_pq_adc",
    ]
    for _ in range(2):
        _pass(fam)
    out["full22_after_families"] = best(lambda: _pass(full22), 2)
    out["floor_after_families"] = best(
        lambda: q.fn(spark, tiny).write.format("noop").mode("overwrite").save()
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
