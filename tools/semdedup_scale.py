"""Round-11: three-decade scale slope for the NEW ``dedup_semantic``
operator (SemDeDup, Abbas et al. 2023).

SemDeDup's design point is that k (cluster count) grows with n so the
expected cell stays bounded — the fixture query pins k=16 at sf0.1
(cells ~312 vectors); this harness scales k by 10x per decade so every
decade measures the SAME per-cell geometry:

    sf0.1:  5k vectors, k=16    (the corpus query's configuration)
    sf1:   50k vectors, k=160
    sf10: 500k vectors, k=1600

That makes the within-cell pair stage O(n * cell) = linear per decade,
and leaves the n*k centroid-assignment term (O(n^2 / cell)) as the
designed asymptotic cost driver — the paper's own answer at extreme
scale is approximate (ANN) centroid assignment, which changes the
assignment operator, not the plan shape. The harness records both the
measured walls and the assignment-only walls so the decomposition is
in-band, not argued.

DuckDB runs the identical SQL (same deterministic centroids, same
integer-exact cosine) at sf0.1 and sf1; the sf10 DuckDB point is
skipped (its n*k cross-join alone is ~8e8 rows of interpreted
64-element list arithmetic — the same ~20-min-projected cap the dedup
family's oracle side documents) and stated as skipped in the artifact.

Protocol: warm + min-of-2 per point, explicit GC between passes,
shuffle partitions 128 at sf10 / 32 below (bench.py's scale protocol).
Writes SEMDEDUP_SCALE_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    import duckdb

    from tools.gen_scale import generate, generate_sf10

    from arnab_spark.queries.dedup import (
        _COSINE_THRESHOLD,
        _Q,
        _SEMDEDUP_DUCK,
        semantic_dedup_frame,
    )
    from arnab_spark.spark_utils import get_spark

    sf1 = generate(src="/root/testdata/sf0.1", tables=("embeddings",))
    sf10 = generate(
        src=sf1,
        dest=os.path.join(REPO, ".scaledata", "sf10"),
        tables=("embeddings",),
    )
    points = [
        ("sf0.1", "/root/testdata/sf0.1", 16, "32", True),
        ("sf1", sf1, 160, "32", True),
        ("sf10", sf10, 1600, "128", False),
    ]

    spark = get_spark("semdedup-scale", os.environ.get("ARNAB_BENCH_CPUS", "32"))

    def gc() -> None:
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    def spark_wall(sf_dir: str, k: int) -> float:
        t0 = time.perf_counter()
        semantic_dedup_frame(spark, sf_dir, k).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def assign_wall(sf_dir: str, k: int) -> float:
        from arnab_spark.operators import (
            ivf_assign,
            ivf_centroids,
            quantize_embeddings,
        )
        from arnab_spark.spark_utils import load_table

        t0 = time.perf_counter()
        e = quantize_embeddings(load_table(spark, sf_dir, "embeddings"), "embedding", 64)
        ivf_assign(e, ivf_centroids(e, k=k)).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    out: dict = {
        "round": 11,
        "protocol": (
            "warm + min-of-2 + explicit GC; k scales 10x per decade so the "
            "per-cell geometry is constant (~312 vectors/cell); duckdb "
            "measured at sf0.1/sf1, SKIPPED at sf10 (n*k interpreted "
            "cross-join, same cap as the dedup-family oracle side)"
        ),
        "points": {},
    }
    for label, sf_dir, k, shuffle, run_duck in points:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        warm = spark_wall(sf_dir, k)
        gc()
        walls = []
        for _ in range(2):
            walls.append(spark_wall(sf_dir, k))
            gc()
        awalls = []
        for _ in range(2):
            awalls.append(assign_wall(sf_dir, k))
            gc()
        rec = {
            "k": k,
            "spark_warm": round(warm, 2),
            "spark_walls": [round(w, 2) for w in walls],
            "spark_min": round(min(walls), 2),
            "assign_walls": [round(w, 2) for w in awalls],
            "assign_min": round(min(awalls), 2),
        }
        if run_duck:
            sql = _SEMDEDUP_DUCK.format(q=_Q, thr=_COSINE_THRESHOLD, k=k)
            dwalls = []
            for _ in range(2):
                con = duckdb.connect()
                con.execute(
                    "CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/embeddings.parquet')"
                )
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dwalls.append(time.perf_counter() - t0)
                con.close()
            rec["duckdb_walls"] = [round(w, 2) for w in dwalls]
            rec["duckdb_min"] = round(min(dwalls), 2)
            rec["ratio"] = round(min(walls) / min(dwalls), 2)
        print(f"{label}: {rec}", file=sys.stderr)
        out["points"][label] = rec
    out["loadavg_end"] = os.getloadavg()
    path = os.path.join(REPO, "SEMDEDUP_SCALE_r11.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
