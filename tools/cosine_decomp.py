"""Round-15 optimization: decompose `dedup_embedding_cosine` (19.0 s
quiet sf10 — the #2 dedup-family spender) at the operator level.

Reading the operator (`operators/similarity.bucketed_cosine_pairs`) and
its sf0.1 plan (plans/r15/dedup_embedding_cosine_before.txt):

1. **The tiled shuffle carries every quantized vector nchunks times.**
   Each vector lands in exactly ``nchunks`` chunk-pair tiles (its row
   in tiles_a plus its rows in tiles_b), and nchunks =
   ceil(bucket/2048) grows linearly with bucket size — at sf10 the
   label buckets are ~50k vectors, so the one Exchange moves ~25
   copies of every (64 x int64) vector: ~6.5 GB for a 260 MB table.
   Guide §2.3 (shuffle fewer bytes): quantized elements are bounded by
   Q_SCALE·|x| (~1e7) — far inside int32 — so the tile payload can
   cross the shuffle as array<int> at half the bytes, upcast to int64
   only inside the numpy matmul (which computed in int64 all along).
2. **chunk_size trades replication against per-task memory.**
   Replication = nchunks = bucket/chunk_size; doubling chunk_size to
   4096 halves the shuffle and the dots matrix grows to 4096² x 8 B
   = 134 MB/task transient (x2 for the float cosine copy) — well
   inside a 2-4 GB/core budget at any scale. This is an operator
   parameter (memory-bound constant), not a local[32] tune.
3. **The per-group pandas conversion is row-at-a-time.**
   ``np.array(pdf[iv].tolist())`` materialises ~n·nchunks Python list
   objects per pass. Guide §4.2: Spark 4's grouped ``applyInArrow``
   hands the group as an Arrow table whose list column is one
   contiguous int buffer — ``flatten().to_numpy().reshape(-1, dim)``
   is a zero-copy panel build.

CANDIDATE VARIANTS (all result-identical by construction — same exact
int64 dot products, same IEEE sqrt/multiply/divide — and verified by
exact row-set comparison at sf0.1 AND sf10 before timing):
- ``int32tile``  — tile payload quantized to array<int> (guard: the
  operator keeps int64 whenever Q_SCALE could overflow int32).
- ``chunk4096``  — chunk_size 2048 -> 4096 (halves replication).
- ``arrowgroup`` — grouped applyInArrow + zero-copy panel build.
- ``combined``   — all three.

ADOPT RULE (pre-stated, identical to the other r15 decompositions):
adopt iff >= 1.15x at sf10 in BOTH orders (A baseline-then-variants;
B fresh JVM variants-then-baseline; min-of-3 after warm; bench sf10
family config: get_spark + shuffle=128, default broadcast threshold)
AND result-identical at sf0.1+sf10. Best passing variant wins, else
TERMINAL.

Usage: python tools/cosine_decomp.py [out.json]
       (writes COSINE_DECOMP_r15.json)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _tiles(df, bucket_col, id_col, iv_col, chunk_size, int32):
    counts = df.groupBy(bucket_col).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(chunk_size)).cast("int").alias("__nchunks")
    )
    d = df.join(F.broadcast(counts), bucket_col).withColumn(
        "__c", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nchunks")).cast("int")
    )
    if int32:
        d = d.withColumn(iv_col, F.col(iv_col).cast("array<int>"))
    tiles_a = d.select(
        id_col, iv_col, bucket_col, "__c",
        F.col("__c").alias("__ca"),
        F.explode(F.sequence(F.col("__c"), F.col("__nchunks") - 1)).alias("__cb"),
    )
    tiles_b = d.filter(F.col("__c") > 0).select(
        id_col, iv_col, bucket_col, "__c",
        F.explode(F.sequence(F.lit(0), F.col("__c") - 1)).alias("__ca"),
        F.col("__c").alias("__cb"),
    )
    return tiles_a.unionByName(tiles_b)


def bucketed_cosine_pairs_v(
    df,
    bucket_col: str,
    id_col: str = "vec_id",
    iv_col: str = "iv",
    threshold: float = 0.9,
    chunk_size: int = 2048,
    int32: bool = False,
    arrow_group: bool = False,
):
    """Parameterized copy of operators.bucketed_cosine_pairs (round-15
    decomposition variants)."""
    import numpy as np
    import pandas as pd

    bucket_ddl = df.schema[bucket_col].dataType.simpleString()
    out_schema = (
        f"vec_a bigint, vec_b bigint, {bucket_col} {bucket_ddl}, "
        "dot_int bigint, cosine double"
    )
    tiled = _tiles(df, bucket_col, id_col, iv_col, chunk_size, int32)

    def _emit_np(ids_a, ids_b, bucket_val, dots, cos, same):
        if same:
            i, j = np.triu_indices(len(ids_a), k=1)
            keep = cos[i, j] >= threshold
            a, b = ids_a[i][keep], ids_b[j][keep]
            dk, ck = dots[i, j][keep], cos[i, j][keep]
        else:
            keep = cos >= threshold
            i, j = np.nonzero(keep)
            u, v = ids_a[i], ids_b[j]
            a, b = np.minimum(u, v), np.maximum(u, v)
            dk, ck = dots[i, j], cos[i, j]
        return a, b, dk.astype(np.int64), ck

    if arrow_group:
        import pyarrow as pa

        def pairs_arrow(table: "pa.Table") -> "pa.Table":
            n = table.num_rows
            ids = table.column(id_col).to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            iv = table.column(iv_col).combine_chunks()
            dim = len(iv[0])
            m = (
                iv.flatten()
                .to_numpy(zero_copy_only=False)
                .reshape(n, dim)
                .astype(np.int64, copy=False)[order]
            )
            ids = ids[order]
            cvals = table.column("__c").to_numpy(zero_copy_only=False)[order]
            ca = table.column("__ca")[0].as_py()
            cb = table.column("__cb")[0].as_py()
            bucket_arr = table.column(bucket_col)
            if ca == cb:
                dots = m @ m.T
                nrm = np.sqrt((m * m).sum(axis=1).astype(np.float64))
                cos = dots.astype(np.float64) / (nrm[:, None] * nrm[None, :])
                a, b, dk, ck = _emit_np(ids, ids, None, dots, cos, True)
            else:
                sel_a, sel_b = cvals == ca, cvals == cb
                if not sel_a.any() or not sel_b.any():
                    a = b = dk = np.array([], dtype=np.int64)
                    ck = np.array([], dtype=np.float64)
                else:
                    ma, mb = m[sel_a], m[sel_b]
                    ids_a, ids_b = ids[sel_a], ids[sel_b]
                    dots = ma @ mb.T
                    na = np.sqrt((ma * ma).sum(axis=1).astype(np.float64))
                    nb = np.sqrt((mb * mb).sum(axis=1).astype(np.float64))
                    cos = dots.astype(np.float64) / (na[:, None] * nb[None, :])
                    a, b, dk, ck = _emit_np(ids_a, ids_b, None, dots, cos, False)
            return pa.table(
                {
                    "vec_a": pa.array(a, type=pa.int64()),
                    "vec_b": pa.array(b, type=pa.int64()),
                    bucket_col: bucket_arr.take(
                        pa.array(np.zeros(len(a), dtype=np.int64))
                    )
                    if len(a)
                    else bucket_arr.slice(0, 0),
                    "dot_int": pa.array(dk, type=pa.int64()),
                    "cosine": pa.array(ck, type=pa.float64()),
                }
            )

        return tiled.groupBy(bucket_col, "__ca", "__cb").applyInArrow(
            pairs_arrow, out_schema
        )

    def pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        ca, cb = int(pdf["__ca"].iloc[0]), int(pdf["__cb"].iloc[0])
        if ca == cb:
            ids = pdf[id_col].to_numpy()
            m = np.array(pdf[iv_col].tolist(), dtype=np.int64)
            dots = m @ m.T
            nrm = np.sqrt((m * m).sum(axis=1).astype(np.float64))
            cos = dots.astype(np.float64) / (nrm[:, None] * nrm[None, :])
            a, b, dk, ck = _emit_np(ids, ids, None, dots, cos, True)
        else:
            pa_ = pdf[pdf["__c"] == ca]
            pb = pdf[pdf["__c"] == cb]
            if not len(pa_) or not len(pb):
                return pd.DataFrame(
                    {
                        "vec_a": np.array([], dtype=np.int64),
                        "vec_b": np.array([], dtype=np.int64),
                        bucket_col: pdf[bucket_col].iloc[:0],
                        "dot_int": np.array([], dtype=np.int64),
                        "cosine": np.array([], dtype=np.float64),
                    }
                )
            ids_a, ids_b = pa_[id_col].to_numpy(), pb[id_col].to_numpy()
            ma = np.array(pa_[iv_col].tolist(), dtype=np.int64)
            mb = np.array(pb[iv_col].tolist(), dtype=np.int64)
            dots = ma @ mb.T
            na = np.sqrt((ma * ma).sum(axis=1).astype(np.float64))
            nb = np.sqrt((mb * mb).sum(axis=1).astype(np.float64))
            cos = dots.astype(np.float64) / (na[:, None] * nb[None, :])
            a, b, dk, ck = _emit_np(ids_a, ids_b, None, dots, cos, False)
        return pd.DataFrame(
            {
                "vec_a": a,
                "vec_b": b,
                bucket_col: np.repeat(pdf[bucket_col].iloc[0], len(a)),
                "dot_int": dk,
                "cosine": ck,
            }
        )

    return tiled.groupBy(bucket_col, "__ca", "__cb").applyInPandas(pairs, out_schema)


def _query_fn(**flags):
    def fn(spark, sf_dir):
        from arnab_spark.queries.dedup import _COSINE_THRESHOLD, _Q, DIM
        from arnab_spark.spark_utils import spread_table

        e = spread_table(spark, sf_dir, "embeddings")
        q = e.selectExpr(
            "vec_id",
            "label",
            f"transform(sequence(1, {DIM}), i -> CAST(floor(CAST(element_at(embedding,"
            f" i) AS DOUBLE) * {_Q}) AS BIGINT)) AS iv",
        )
        return bucketed_cosine_pairs_v(
            q, bucket_col="label", threshold=_COSINE_THRESHOLD, **flags
        )

    return fn


def _stage_quantize(spark, sf_dir):
    from arnab_spark.queries.dedup import _Q, DIM
    from arnab_spark.spark_utils import spread_table

    e = spread_table(spark, sf_dir, "embeddings")
    return e.selectExpr(
        "vec_id",
        "label",
        f"transform(sequence(1, {DIM}), i -> CAST(floor(CAST(element_at(embedding,"
        f" i) AS DOUBLE) * {_Q}) AS BIGINT)) AS iv",
    )


def _stage_tiled(spark, sf_dir):
    q = _stage_quantize(spark, sf_dir)
    return _tiles(q, "label", "vec_id", "iv", 2048, False)


VARIANTS = {
    "int32tile": dict(int32=True),
    "chunk4096": dict(chunk_size=4096),
    "arrowgroup": dict(arrow_group=True),
    "combined": dict(int32=True, chunk_size=4096, arrow_group=True),
}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, n):
    fn()
    runs = []
    for _ in range(n):
        gc.collect()
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
        REPO, "COSINE_DECOMP_r15.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()
    cur_fn = reg["dedup_embedding_cosine"].fn

    out: dict = {
        "round": 15,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variants; "
            "B fresh JVM: variants-then-baseline; min-of-3 after warm, "
            "bench sf10 dedup-family config) AND result-identical at "
            "sf0.1+sf10, else TERMINAL"
        ),
        "loadavg_start": list(os.getloadavg()),
        "variants": {},
    }

    spark = _session("cosine_decomp_a")
    cur_01, cur_10 = _rows(cur_fn(spark, sf01)), _rows(cur_fn(spark, sf10))
    base_min, base_runs = _timed(lambda: _noop(cur_fn(spark, sf10)), 3)
    out["current_sf10_a"] = {"min": base_min, "runs": base_runs}
    out["stages_sf10"] = {}
    for sname, sfn in (
        ("quantize_only", _stage_quantize),
        ("tiled_stream_preshuffle", _stage_tiled),
    ):
        smin, sruns = _timed(lambda: _noop(sfn(spark, sf10)), 2)
        out["stages_sf10"][sname] = {"min": smin, "runs": sruns}
    for vname, flags in VARIANTS.items():
        vfn = _query_fn(**flags)
        v: dict = {
            "identical": {
                "sf0.1": _rows(vfn(spark, sf01)) == cur_01,
                "sf10": _rows(vfn(spark, sf10)) == cur_10,
            }
        }
        vmin, vruns = _timed(lambda: _noop(vfn(spark, sf10)), 3)
        v["sf10_a"] = {
            "min": vmin,
            "runs": vruns,
            "speedup_a": round(base_min / vmin, 2),
        }
        out["variants"][vname] = v
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()

    spark = _session("cosine_decomp_b")
    for vname, flags in VARIANTS.items():
        vfn = _query_fn(**flags)
        vmin, vruns = _timed(lambda: _noop(vfn(spark, sf10)), 3)
        out["variants"][vname]["sf10_b"] = {"min": vmin, "runs": vruns}
    base_min, base_runs = _timed(lambda: _noop(cur_fn(spark, sf10)), 3)
    out["current_sf10_b"] = {"min": base_min, "runs": base_runs}
    spark.stop()

    adopted = None
    for vname, v in out["variants"].items():
        v["sf10_b"]["speedup_b"] = round(base_min / v["sf10_b"]["min"], 2)
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
