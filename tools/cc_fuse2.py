"""Round-16 optimization: attack `connected_components`' remaining per-op
FIXED job overhead (VERDICT r15 "Next round #1") — still the registry's
#1 sf10 wall at 29-31.5 s after the r15 fuse, with the r10/r15
decompositions attributing ~0.5-1 s/op of driver-side planning/codegen/
barrier cost to EVERY star operation over a graph whose edge data is
tiny (~hundreds of KB at sf10).

The declared lever is FEWER SYNCHRONIZATION ROUNDS. Two structurally
different candidates, both result-identical by construction (identity
verified at sf0.1 AND sf10 before timing):

- `fusedpair` — one materialized JOB per large-star+small-star PAIR:
  the small-star consumes the large-star's frame lazily inside the same
  plan (the intermediate `distinct` is dropped — small-star's window
  MIN and its own output `distinct` are duplicate-insensitive, so the
  edge SET is unchanged), halving checkpoint+checksum actions. The
  convergence check moves to pair granularity; because "fused round
  leaves the set unchanged" does not by itself prove a star forest
  (the composition could in principle 2-cycle), fixpoint is CONFIRMED
  with one explicit large-star op and one explicit small-star op under
  the shipped stop criterion — if either changes the set, the fused
  loop resumes. Guide §1.2 (job count IS the measured wall) / §2.4.
- `smallgraph` — the broadcast-join move applied to the fixpoint: the
  canonical edge list is ALREADY materialized and counted by the very
  first convergence checksum (zero extra jobs), so when the count is
  under a memory-justified threshold (default 2,000,000 edges ≈ tens
  of MB in one task; env `ARNAB_CC_SMALL_EDGES`), the whole O(log n)
  round structure — every one of its ~11 planning/barrier cycles — is
  replaced by ONE single-task union-find (path-halving, exact min-id
  labels) over the checkpointed blocks via `mapInPandas`. Above the
  threshold the distributed star contraction runs unchanged; at 100 TB
  the LSH pair graph exceeds any single task and takes that path, on a
  laptop-scale graph a 1000-node cluster ALSO should not pay ~22
  global barriers to close 200k edges. Guide §2.4 "remove shuffles
  outright" / §3.1 (the small side fits: ship the computation, not
  rounds of shuffles).
- `combined` — smallgraph threshold + fusedpair rounds above it (at
  bench scale this exercises the smallgraph path; fusedpair covers the
  >threshold branch on its own row).

ADOPT RULE (pre-stated, identical to CC_FUSE_r15): adopt a variant iff
>= 1.15x faster than the current spelling at sf10 in BOTH measurement
orders (session A baseline-then-variants; session B, fresh JVM,
variants-then-baseline; min-of-3 after a warm run) AND result-identical
(exact row sets) at sf0.1 and sf10. Sessions use the bench's graded
dedup-family config (get_spark + shuffle partitions 128, default
broadcast threshold). Best passing variant wins; if none pass,
TERMINAL. The union-find differential test
(tests/test_operators.py::test_connected_components_random_graphs_match_union_find)
is the safety net for whichever variant ships.

Usage: python tools/cc_fuse2.py [out.json]
       (writes measurements/r16/CC_FUSE2_r16.json)
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
    fused_pair: bool = False,
    small_edges: int = 0,
    on_round=None,
):
    """Parameterized copy of the SHIPPED operators/relational.
    connected_components (r15 combined spelling: single-scan upstream,
    lazy checkpoint + checksum as the one materializing action,
    window-min star ops), extended with the two r16 candidate levers."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    par = max(1, spark.sparkContext.defaultParallelism)
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    nodes = (
        base.select(F.col("u").alias("node"))
        .unionByName(base.select(F.col("v").alias("node")))
        .distinct()
    )
    e = (
        base.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("c"), F.least("u", "v").alias("p"))
        .distinct()
        .coalesce(par)
        .localCheckpoint(eager=False)
    )

    def _checksum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(c, p))").alias("x"),
        ).collect()[0]
        return int(row["n"]), int(row["x"] or 0)

    sig = _checksum(e)

    node_ddl = base.schema["u"].dataType.simpleString()

    if small_edges and sig[0] <= small_edges:
        # single-task union-find over the already-checkpointed blocks
        def _uf(batches):
            import pandas as pd

            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    parent[r] = parent[parent[r]]
                    r = parent[r]
                return r

            cs, ps = [], []
            for b in batches:
                cs.append(b["c"])
                ps.append(b["p"])
            if not cs:
                return
            import itertools

            for c, p in zip(
                itertools.chain.from_iterable(x.tolist() for x in cs),
                itertools.chain.from_iterable(x.tolist() for x in ps),
            ):
                parent.setdefault(c, c)
                parent.setdefault(p, p)
                rc, rp = find(c), find(p)
                if rc != rp:
                    parent[rc] = rp
            best: dict = {}
            for n in parent:
                r = find(n)
                b0 = best.get(r)
                if b0 is None or n < b0:
                    best[r] = n
            yield pd.DataFrame(
                {"node": list(parent), "comp": [best[find(n)] for n in parent]}
            )

        # lazy-checkpointed: the final frame references labels twice
        # (union arm + the singleton anti-join) — the blocks persist on
        # first evaluation so the union-find task is not re-run
        labels = e.coalesce(1).mapInPandas(
            _uf, f"node {node_ddl}, comp {node_ddl}"
        ).localCheckpoint(eager=False)
        singletons = nodes.join(
            labels.select("node"), on="node", how="left_anti"
        ).select("node", F.col("node").alias("comp"))
        return labels.unionByName(singletons)

    def _large_star(frame):
        sym = frame.select(F.col("c").alias("x"), F.col("p").alias("y")).unionByName(
            frame.select(F.col("p").alias("x"), F.col("c").alias("y"))
        )
        w = Window.partitionBy("x")
        cand = sym.select(
            "x", "y", F.least(F.col("x"), F.min("y").over(w)).alias("m")
        )
        return (
            cand.where(F.col("y") > F.col("x"))
            .select(F.col("y").alias("c"), F.col("m").alias("p"))
        )

    def _small_star(frame):
        w = Window.partitionBy("c")
        we = frame.select("c", "p", F.min("p").over(w).alias("m"))
        return (
            we.where(F.col("p") != F.col("m"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .unionByName(we.select("c", F.col("m").alias("p")))
            .distinct()
        )

    if fused_pair:
        converged = False
        for _round in range(max_iter):
            _t0 = time.monotonic()
            # LS output feeds SS lazily in the same plan; its distinct
            # is dropped (SS's window-min and final distinct are
            # duplicate-insensitive, so the SET is unchanged)
            new_e = (
                _small_star(_large_star(e)).coalesce(par).localCheckpoint(eager=False)
            )
            new_sig = _checksum(new_e)
            if on_round is not None:
                on_round(_round, time.monotonic() - _t0, new_sig[0])
            e = new_e
            if new_sig == sig:
                # pair-fixpoint: CONFIRM under the shipped criterion —
                # one explicit LS op, one explicit SS op, both stable
                ls = _large_star(e).distinct().coalesce(par).localCheckpoint(
                    eager=False
                )
                ls_sig = _checksum(ls)
                if ls_sig != sig:
                    e, sig = ls, ls_sig
                    continue
                ss = _small_star(e).coalesce(par).localCheckpoint(eager=False)
                ss_sig = _checksum(ss)
                if ss_sig != sig:
                    e, sig = ss, ss_sig
                    continue
                e = ss
                converged = True
                break
            sig = new_sig
        if not converged:
            raise RuntimeError("fusedpair did not converge")
    else:
        stable = 0
        for _op in range(max_iter):
            _t0 = time.monotonic()
            if _op % 2 == 0:
                new_e = _large_star(e).distinct()
            else:
                new_e = _small_star(e)
            new_e = new_e.coalesce(par).localCheckpoint(eager=False)
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
    "fusedpair": dict(fused_pair=True),
    "smallgraph": dict(small_edges=2_000_000),
    "combined": dict(fused_pair=True, small_edges=2_000_000),
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
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "measurements", "r16", "CC_FUSE2_r16.json"
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
        "round": 16,
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

    # ---- session A: identity, baseline, baseline-then-variant
    spark = _session("cc_fuse2_a")
    cur_01, cur_10 = _rows(cur_fn(spark, sf01)), _rows(cur_fn(spark, sf10))
    base10_min, base10_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
    base01_min, base01_runs = _min3(lambda: _noop(cur_fn(spark, sf01)))
    out["current_sf10_a"] = {"min": base10_min, "runs": base10_runs}
    out["current_sf01_a"] = {"min": base01_min, "runs": base01_runs}
    for vname, flags in VARIANTS.items():
        vfn = _variant_query(**flags)
        rounds: list = []
        v: dict = {
            "identical": {
                "sf0.1": _rows(vfn(spark, sf01)) == cur_01,
                "sf10": _rows(
                    vfn(
                        spark,
                        sf10,
                        on_round=lambda i, w, n: rounds.append(
                            {"op": i, "wall": round(w, 2), "edges": n}
                        ),
                    )
                )
                == cur_10,
            },
            "sf10_rounds_one_pass": rounds,
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
    spark = _session("cc_fuse2_b")
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
