"""Round-15 optimization: decompose `connected_components`' JOB and SCAN
structure — the dedup family's dominant spender (`dedup_connected_groups`,
~48 s at sf10, 4.0 s at sf0.1 in the round-15 validation run).

The r10/r11 decompositions priced the pair build (~10.4 s sf10, min-of-3
idle — CC_PAIRBUILD_r11) and the closure (~19.7 s sf10, 11 ops —
CC_DECOMP_r10), which together explain only ~30 s of the ~48 s query.
Reading the operator (operators/relational.py) locates the gap in job
structure, not in any stage's data:

1. **The upstream pair SQL executes TWICE.** `nodes` and `e` are
   checkpointed separately from the same un-materialized upstream — each
   `localCheckpoint` is its own action, and Spark does not reuse
   exchanges across jobs, so the full MinHash/LSH pair build (the
   query's single most expensive stage) runs once for `nodes` and again
   for `e`. CC_DECOMP never saw this: its harness passed
   pre-materialized pairs in. Guide §1.2 ("don't compute things you
   throw away") / §2.4.
2. **Every star operation runs TWO jobs**: an eager `localCheckpoint`
   materialization, then a separate convergence-checksum collect over
   the checkpointed blocks. r10 measured per-op wall as FIXED driver
   overhead (planning + barriers), so job count is the lever: a LAZY
   `localCheckpoint(eager=False)` truncates lineage exactly the same
   way (local checkpointing persists partitions as a side effect of
   the first action over them), letting the checksum aggregate be the
   materializing action — ONE job per op. Guide §1.2 / §5
   (localCheckpoint as the lineage-cut tool).
3. **Each star op computes its neighborhood-min via groupBy+join** —
   the aggregate output is joined back to the same symmetric edge
   frame. A window `MIN() OVER (PARTITION BY key)` computes the same
   column with the partitioning established ONCE (guide §2.4: a window
   partitioned by the same key as a preceding aggregation does not
   need a second shuffle — here it replaces agg+join outright).

CANDIDATE VARIANTS (all result-identical by construction; identity
verified at sf0.1 AND sf10 before timing):
- `singlescan` — checkpoint the raw (u, v) pair list ONCE; derive the
  canonical edge list from the checkpointed pairs and the node set
  lazily (it is only consumed by the final singleton anti-join).
- `fusedsig`  — lazy localCheckpoint + convergence checksum in ONE job
  per star operation (and for the initial edge materialization).
- `winmin`    — window-min spelling of both star operations.
- `combined`  — all three.

ADOPT RULE (pre-stated, identical to EVENTS/TPCH8_DECOMP_r15): adopt a
variant iff >= 1.15x faster than the current spelling at sf10 in BOTH
measurement orders (session A baseline-then-variants; session B, fresh
JVM, variants-then-baseline; min-of-3 after a warm run) AND
result-identical (exact row sets) at sf0.1 and sf10. Sessions use the
bench's graded dedup-family config (get_spark + shuffle partitions 128,
default broadcast threshold). Best passing variant wins; if none pass,
TERMINAL. sf0.1 walls are recorded alongside (informational — the
sf0.1 dedup family wall is also graded).

Usage: python tools/cc_fuse.py [out.json]
       (writes CC_FUSE_r15.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cc_generic(
    edges,
    src: str,
    dst: str,
    max_iter: int = 40,
    single_scan: bool = False,
    fused_sig: bool = False,
    win_min: bool = False,
    on_round=None,
):
    """Parameterized copy of operators/relational.connected_components
    (localCheckpoint durability only — the tool never exercises the
    reliable-checkpoint path)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    par = max(1, spark.sparkContext.defaultParallelism)
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))

    def _checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(c, p))").alias("x"),
        ).collect()[0]
        return int(row["n"]), int(row["x"] or 0)

    if single_scan:
        # ONE upstream execution: materialize the raw pair list, derive
        # everything else from the checkpointed blocks
        base = base.localCheckpoint()
        nodes = (
            base.select(F.col("u").alias("node"))
            .unionByName(base.select(F.col("v").alias("node")))
            .distinct()
        )  # lazy — consumed once by the final anti-join
        canon = (
            base.where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("c"), F.least("u", "v").alias("p"))
            .distinct()
            .coalesce(par)
        )
        if fused_sig:
            e = canon.localCheckpoint(eager=False)
            sig = _checksum(e)
        else:
            e = canon.localCheckpoint()
            sig = _checksum(e)
    else:
        nodes = (
            base.select(F.col("u").alias("node"))
            .unionByName(base.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        canon = (
            base.where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("c"), F.least("u", "v").alias("p"))
            .distinct()
            .coalesce(par)
        )
        if fused_sig:
            e = canon.localCheckpoint(eager=False)
            sig = _checksum(e)
        else:
            e = canon.localCheckpoint()
            sig = _checksum(e)

    stable = 0
    for _op in range(max_iter):
        _t0 = time.monotonic()
        if _op % 2 == 0:
            sym = e.select(F.col("c").alias("x"), F.col("p").alias("y")).unionByName(
                e.select(F.col("p").alias("x"), F.col("c").alias("y"))
            )
            if win_min:
                w = Window.partitionBy("x")
                cand = sym.select(
                    "x", "y", F.least(F.col("x"), F.min("y").over(w)).alias("m")
                )
                new_e = (
                    cand.where(F.col("y") > F.col("x"))
                    .select(F.col("y").alias("c"), F.col("m").alias("p"))
                    .distinct()
                )
            else:
                mm = sym.groupBy("x").agg(F.min("y").alias("my"))
                mm = mm.select("x", F.least("x", "my").alias("m"))
                new_e = (
                    sym.join(mm, on="x")
                    .where(F.col("y") > F.col("x"))
                    .select(F.col("y").alias("c"), F.col("m").alias("p"))
                    .distinct()
                )
        else:
            if win_min:
                w = Window.partitionBy("c")
                we = e.select("c", "p", F.min("p").over(w).alias("m"))
                new_e = (
                    we.where(F.col("p") != F.col("m"))
                    .select(F.col("p").alias("c"), F.col("m").alias("p"))
                    .unionByName(we.select("c", F.col("m").alias("p")))
                    .distinct()
                )
            else:
                mm = e.groupBy("c").agg(F.min("p").alias("m"))
                new_e = (
                    e.join(mm, on="c")
                    .where(F.col("p") != F.col("m"))
                    .select(F.col("p").alias("c"), F.col("m").alias("p"))
                    .unionByName(mm.select(F.col("c"), F.col("m").alias("p")))
                    .distinct()
                )
        if fused_sig:
            new_e = new_e.coalesce(par).localCheckpoint(eager=False)
            new_sig = _checksum(new_e)  # ONE job: materializes + checksums
        else:
            new_e = new_e.coalesce(par).localCheckpoint()
            new_sig = _checksum(new_e)
        if on_round is not None:
            on_round(_op, time.monotonic() - _t0, new_sig[0])
        e = new_e
        if new_sig == sig:
            stable += 1
            if stable >= 2:
                break
        else:
            stable = 0
        sig = new_sig
    else:
        raise RuntimeError("cc variant did not converge")

    labels = e.select(F.col("c").alias("node"), F.col("p").alias("comp")).unionByName(
        e.select(F.col("p").alias("node"), F.col("p").alias("comp")).distinct()
    )
    singletons = nodes.join(labels.select("node"), on="node", how="left_anti").select(
        "node", F.col("node").alias("comp")
    )
    return labels.unionByName(singletons)


def _pairs(spark, sf_dir):
    from arnab_spark.queries.dedup import _MINHASH_SPARK, CC_MIN_BANDS
    from arnab_spark.spark_utils import register_spread_views

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


def _variant_query(**flags):
    def fn(spark, sf_dir, on_round=None):
        from pyspark.sql import functions as F

        comps = _cc_generic(
            _pairs(spark, sf_dir), "doc_a", "doc_b", on_round=on_round, **flags
        )
        return comps.select(
            F.col("node").alias("doc_id"), F.col("comp").alias("canonical_id")
        )

    return fn


VARIANTS = {
    "singlescan": dict(single_scan=True),
    "fusedsig": dict(fused_sig=True),
    "winmin": dict(win_min=True),
    "combined": dict(single_scan=True, fused_sig=True, win_min=True),
}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _min3(fn):
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 2), [round(r, 2) for r in runs]


def _session(app: str):
    from arnab_spark.spark_utils import get_spark

    spark = get_spark(app)
    # the config bench.py grades the sf10 dedup family under
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CC_FUSE_r15.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()
    cur_fn = reg["dedup_connected_groups"].fn

    out: dict = {
        "round": 15,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variant; "
            "B fresh JVM: variant-then-baseline; min-of-3 after warm, "
            "bench dedup-family config: get_spark + shuffle=128, default "
            "broadcast threshold) AND result-identical at sf0.1+sf10, "
            "else TERMINAL"
        ),
        "loadavg_start": list(os.getloadavg()),
        "variants": {},
    }

    # ---- session A: identity, baseline ops walls, baseline-then-variant
    spark = _session("cc_fuse_a")
    cur_01, cur_10 = _rows(cur_fn(spark, sf01)), _rows(cur_fn(spark, sf10))
    base10_min, base10_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
    base01_min, base01_runs = _min3(lambda: _noop(cur_fn(spark, sf01)))
    out["current_sf10_a"] = {"min": base10_min, "runs": base10_runs}
    out["current_sf01_a"] = {"min": base01_min, "runs": base01_runs}
    # one instrumented pass of the CURRENT operator's closure for per-op walls
    op_walls: list = []
    from arnab_spark.operators import connected_components as _cc_current

    _noop(
        _cc_current(
            _pairs(spark, sf10),
            src="doc_a",
            dst="doc_b",
            on_round=lambda i, w, n: op_walls.append(
                {"op": i, "wall": round(w, 2), "edges": n}
            ),
        )
    )
    out["current_sf10_op_walls"] = op_walls
    for vname, flags in VARIANTS.items():
        vfn = _variant_query(**flags)
        v: dict = {
            "identical": {
                "sf0.1": _rows(vfn(spark, sf01)) == cur_01,
                "sf10": _rows(vfn(spark, sf10)) == cur_10,
            }
        }
        vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
        v["sf10_a"] = {
            "min": vmin,
            "runs": vruns,
            "speedup_a": round(base10_min / vmin, 2),
        }
        vmin01, vruns01 = _min3(lambda: _noop(vfn(spark, sf01)))
        v["sf01_a"] = {
            "min": vmin01,
            "runs": vruns01,
            "speedup_a": round(base01_min / vmin01, 2),
        }
        out["variants"][vname] = v
    spark.stop()

    # ---- session B (fresh JVM): REVERSED order — variants first
    spark = _session("cc_fuse_b")
    for vname, flags in VARIANTS.items():
        vfn = _variant_query(**flags)
        vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
        out["variants"][vname]["sf10_b"] = {"min": vmin, "runs": vruns}
    base10b_min, base10b_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
    out["current_sf10_b"] = {"min": base10b_min, "runs": base10b_runs}
    for vname in VARIANTS:
        v = out["variants"][vname]
        v["sf10_b"]["speedup_b"] = round(base10b_min / v["sf10_b"]["min"], 2)
    spark.stop()

    adopted = None
    for vname, v in out["variants"].items():
        ok = (
            v["identical"]["sf0.1"]
            and v["identical"]["sf10"]
            and v["sf10_a"]["speedup_a"] >= 1.15
            and v["sf10_b"]["speedup_b"] >= 1.15
        )
        v["passes_adopt_rule"] = ok
        if ok and (
            adopted is None
            or v["sf10_b"]["min"] < out["variants"][adopted]["sf10_b"]["min"]
        ):
            adopted = vname
    out["adopted"] = adopted
    out["verdict"] = (
        f"ADOPT {adopted}"
        if adopted
        else "TERMINAL: no pre-stated variant passed both orders"
    )

    out["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"verdict": out["verdict"]}, indent=1))


if __name__ == "__main__":
    main()
