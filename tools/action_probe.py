"""Deep-warm comparison of action paths for the headline suite
(round-5, verdict item 3): after 3 full warm passes, measure each
headline query at sf0.1 via (a) the noop write sink the bench uses,
(b) Arrow toPandas, (c) plain collect — plus the sf0.001 floor
components again at equal warmth. Decides whether the bench's
per-query floor is sink-protocol cost (switchable) or scheduler time
(irreducible)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best(fn, n=5) -> float:
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
    spark = get_spark("action_probe")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    names = sorted(n for n, q in registry.items() if q.headline)
    # deep warm: 3 full passes
    for _ in range(3):
        for n in names:
            registry[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict = {"noop": {}, "topandas": {}, "collect": {}, "rows": {}}
    for n in names:
        q = registry[n]
        df = q.fn(spark, sf_dir)
        out["rows"][n] = df.count()
        out["noop"][n] = best(
            lambda: q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        )
        out["topandas"][n] = best(lambda: q.fn(spark, sf_dir).toPandas())
        out["collect"][n] = best(lambda: q.fn(spark, sf_dir).collect())
    for k in ("noop", "topandas", "collect"):
        out[k + "_total"] = round(sum(out[k].values()), 4)

    # floor components at matched warmth
    q = registry["agg_pricing_summary"]
    for _ in range(3):
        q.fn(spark, tiny).write.format("noop").mode("overwrite").save()
    df = q.fn(spark, tiny)
    df.collect()
    out["floor_construct"] = best(lambda: q.fn(spark, tiny), 9)
    out["floor_noop_reuse"] = best(
        lambda: df.write.format("noop").mode("overwrite").save(), 9
    )
    out["floor_collect_reuse"] = best(lambda: df.collect(), 9)
    out["floor_noop_full"] = best(
        lambda: q.fn(spark, tiny).write.format("noop").mode("overwrite").save(), 9
    )
    out["floor_collect_full"] = best(lambda: q.fn(spark, tiny).collect(), 9)
    r1 = spark.range(1)
    r1.collect()
    out["bare_collect"] = best(lambda: r1.collect(), 9)
    r1.write.format("noop").mode("overwrite").save()
    out["bare_noop"] = best(
        lambda: r1.write.format("noop").mode("overwrite").save(), 9
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
