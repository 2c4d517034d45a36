"""Round-15 optimization: decompose the four heaviest sf10 TEXT/DEDUP
family queries after connected-components — text_decontaminate (16.2 s
quiet sf10), dedup_simhash (16.7), text_boilerplate_ngrams (14.9),
dedup_ngram_jaccard (14.4) — plus a stage floor for text_fingerprint
(4.9). Same Q21/BM25/events protocol: stage walls first, pre-stated
adopt rule, both measurement orders, exact result identity at two
scales.

WHAT THE PLANS SAY (plans/r15/*_before.txt, sf0.1; the sf10 shapes are
re-dumped by this tool into the artifact):

- text_decontaminate scans + re-shingles the corpus TWICE — the grams
  CTE is inlined into both its references (train side and the
  held-out DISTINCT side). Guide §1.2 "don't compute things you throw
  away" / §2.4.
- dedup_ngram_jaccard computes the tokenize+shingle pipeline FOUR
  times (sigs2 self-join left/right + wordsets wa/wb): CTE inlining
  duplicates the whole subtree and no exchange reuse fires across the
  broadcast/shuffle mix. Two of the four passes pay sha256 over every
  shingle. Guide §2.4 / §3.3 (materialise an intermediate to truncate
  repeated subtrees).
- dedup_simhash is one scan, zero shuffle: the wall is per-row
  expression CPU — 16 separate aggregate() folds per document, each
  interpreted (higher-order functions do not codegen), each doing a
  substr + instr STRING op per element: 32 string ops per word-digest.
  Guide §1.2 step 2 (per-task work) — the fold count and the string
  ops are both compressible.
- text_boilerplate_ngrams is already one scan + one shuffle with
  map-side partial agg; its candidate lever is only the gram-stream
  floor itself (measured here as a stage).

CANDIDATE VARIANTS (oracle text untouched; every variant is
result-identical by construction up to the repo's standing
digest-equality contract — dedup_exact already treats md5 equality as
content equality — and identity is VERIFIED by exact row-set
comparison at sf0.1 AND sf10 before any timing):

- decontaminate/onepass: ONE corpus pass — group the exploded gram
  stream by gram, aggregate (has_test, collect_list(train doc_ids)),
  explode survivors. Removes the second scan+shingle pass and the
  sort-merge join sorts; adds one hash aggregate.
- decontaminate/onepassdigest: onepass, but the group key is the
  16-byte unhex(md5(gram)) computed in-row — ~3x fewer shuffle key
  bytes, fixed-width hash-agg keys (guide §2.3 "narrower types").
- decontaminate/digestjoin: keep the two-pass join shape, join on the
  16-byte digest instead of the ~48-char gram string.
- simhash/packfold: per-digest bit mask built ONCE via conv(hex,16,10)
  (2 string ops per digest instead of 32), then FOUR packed-lane
  integer folds (16-bit lanes, 4 counts per fold) instead of 16
  string folds; per-row CASE guard falls back to per-bit mask folds
  for documents over 65535 words (lane-overflow bound; fixture max is
  100 words, the guard keeps the operator general).
- simhash/structfold: control variant — the same 16 string ops per
  element but in ONE aggregate() with a 16-field struct accumulator;
  isolates fold-machinery overhead from string-op cost.
- jaccard/fused_digest: ONE tokenize+sha256 pass producing BOTH the
  band minima and the verify sets (ws = distinct 32-hex digest
  prefixes, 128-bit — smaller elements, cheaper intersects),
  localCheckpointed and referenced three times (sigs2 a/b + wa/wb).
- jaccard/fused_raw: same single-pass + checkpoint, but ws keeps the
  raw shingle strings (no digest-prefix transform) — separates the
  reuse win from the digest-element win.

ADOPT RULE (pre-stated, identical to EVENTS/TPCH8/CC_FUSE r15): adopt
a variant iff >= 1.15x faster than the current spelling at sf10 in
BOTH measurement orders (session A baseline-then-variants; session B,
fresh JVM, variants-then-baseline; min-of-3 after a warm run; bench
sf10 family config: get_spark + shuffle partitions 128, default
broadcast threshold) AND result-identical (exact row sets) at sf0.1
and sf10. Best passing variant per query wins; if none pass, TERMINAL.

Usage: python tools/dedup_decomp.py [out.json]
       (writes DEDUP_DECOMP_r15.json)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from arnab_spark.queries.dedup import (  # noqa: E402
    _PAIR_BAND_STACK,
    _ROW_BAND_MINS,
    _SHINGLE_SPARK,
)
from arnab_spark.queries.llm_text import _NGRAM_SPARK  # noqa: E402

# ---------------------------------------------------------------- SQL

_WORDS = "SELECT doc_id, split(text, ' ') AS w FROM documents"

DECON_ONEPASS = f"""
WITH words AS ({_WORDS}),
grams AS (
  SELECT doc_id, explode(array_distinct({_NGRAM_SPARK})) AS ngram FROM words
),
per_gram AS (
  SELECT max(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS has_test,
         collect_list(CASE WHEN doc_id % 10 <> 0 THEN doc_id END) AS train_ids
  FROM grams GROUP BY ngram
)
SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
FROM (SELECT explode(train_ids) AS doc_id FROM per_gram WHERE has_test = 1)
GROUP BY doc_id
"""

DECON_ONEPASS_DIGEST = f"""
WITH words AS ({_WORDS}),
grams AS (
  SELECT doc_id,
         explode(transform(array_distinct({_NGRAM_SPARK}),
                           g -> unhex(md5(CAST(g AS BINARY))))) AS h
  FROM words
),
per_gram AS (
  SELECT max(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS has_test,
         collect_list(CASE WHEN doc_id % 10 <> 0 THEN doc_id END) AS train_ids
  FROM grams GROUP BY h
)
SELECT doc_id, COUNT(*) AS n_contaminated_ngrams
FROM (SELECT explode(train_ids) AS doc_id FROM per_gram WHERE has_test = 1)
GROUP BY doc_id
"""

DECON_DIGEST_JOIN = f"""
WITH words AS ({_WORDS}),
grams AS (
  SELECT doc_id,
         explode(transform(array_distinct({_NGRAM_SPARK}),
                           g -> unhex(md5(CAST(g AS BINARY))))) AS h
  FROM words
),
test_grams AS (
  SELECT DISTINCT h FROM grams WHERE doc_id % 10 = 0
)
SELECT g.doc_id, COUNT(*) AS n_contaminated_ngrams
FROM grams g JOIN test_grams t ON g.h = t.h
WHERE NOT (g.doc_id % 10 = 0)
GROUP BY g.doc_id
"""

DECON_STAGE_GRAMS = f"""
WITH words AS ({_WORDS})
SELECT doc_id, explode(array_distinct({_NGRAM_SPARK})) AS ngram FROM words
"""

DECON_STAGE_TEST = f"""
WITH words AS ({_WORDS}),
grams AS (
  SELECT doc_id, explode(array_distinct({_NGRAM_SPARK})) AS ngram FROM words
)
SELECT DISTINCT ngram FROM grams WHERE doc_id % 10 = 0
"""

# ---- simhash ---------------------------------------------------------

_MASK_EXPR = (
    "CAST(conv(substr(d, 1, 15), 16, 10) AS BIGINT) * 2 + "
    "(CASE WHEN instr('89abcdef', substr(d, 16, 1)) > 0 THEN 1 ELSE 0 END)"
)


def _lane_fold(shifts: list[int]) -> str:
    terms = " + ".join(
        f"shiftleft(shiftright(m, {sh}) & 1, {16 * lane})"
        for lane, sh in enumerate(shifts)
    )
    return f"aggregate(masks, CAST(0 AS BIGINT), (a, m) -> a + {terms})"


# bit j (1..16) of the packed mask sits at shift 4*(15-j)+4 (j<=15) / 0
_BIT_SHIFT = {j: (4 * (15 - j) + 4 if j <= 15 else 0) for j in range(1, 17)}
_PACK_ACCS = ", ".join(
    _lane_fold([_BIT_SHIFT[j] for j in range(4 * k + 1, 4 * k + 5)]) + f" AS a{k + 1}"
    for k in range(4)
)


def _packed_sj(j: int) -> str:
    acc = f"a{(j - 1) // 4 + 1}"
    lane = (j - 1) % 4
    packed = f"2 * (shiftright({acc}, {16 * lane}) & 65535) - n"
    # documents beyond the 16-bit lane capacity (never in the fixture,
    # possible in a general corpus) fall back to one mask-bit fold
    fallback = (
        f"2 * aggregate(masks, CAST(0 AS BIGINT), "
        f"(a, m) -> a + (shiftright(m, {_BIT_SHIFT[j]}) & 1)) - n"
    )
    return f"CASE WHEN n <= 65535 THEN {packed} ELSE {fallback} END AS s{j}"


def _simhash_assemble() -> str:
    return " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << (j - 1)} ELSE 0 END)"
        for j in range(1, 17)
    )


SIMHASH_PACKFOLD = f"""
WITH dg AS (
  SELECT doc_id, transform(split(text, ' '), w -> md5(CAST(w AS BINARY))) AS digests
  FROM documents
),
mk AS (
  SELECT doc_id, size(digests) AS n,
         transform(digests, d -> {_MASK_EXPR}) AS masks
  FROM dg
),
acc AS (
  SELECT doc_id, n, masks, {_PACK_ACCS} FROM mk
),
bitsums AS (
  SELECT doc_id, {", ".join(_packed_sj(j) for j in range(1, 17))} FROM acc
),
hashes AS (
  SELECT doc_id, CAST({_simhash_assemble()} AS BIGINT) AS simhash FROM bitsums
)
SELECT simhash, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM hashes GROUP BY simhash
"""

_STRUCT_INIT = "named_struct(" + ", ".join(
    f"'s{j}', CAST(0 AS BIGINT)" for j in range(1, 17)
) + ")"
_STRUCT_STEP = "named_struct(" + ", ".join(
    f"'s{j}', a.s{j} + (CASE WHEN instr('89abcdef', substr(d, {j}, 1)) > 0 "
    f"THEN 1 ELSE -1 END)"
    for j in range(1, 17)
) + ")"

SIMHASH_STRUCTFOLD = f"""
WITH dg AS (
  SELECT doc_id, transform(split(text, ' '), w -> md5(CAST(w AS BINARY))) AS digests
  FROM documents
),
bitsums AS (
  SELECT doc_id, st.* FROM (
    SELECT doc_id,
           aggregate(digests, {_STRUCT_INIT}, (a, d) -> {_STRUCT_STEP}) AS st
    FROM dg
  )
),
hashes AS (
  SELECT doc_id, CAST({_simhash_assemble()} AS BIGINT) AS simhash FROM bitsums
)
SELECT simhash, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
FROM hashes GROUP BY simhash
"""

SIMHASH_STAGE_MD5 = """
SELECT doc_id, transform(split(text, ' '), w -> md5(CAST(w AS BINARY))) AS digests
FROM documents
"""

# ---- jaccard ---------------------------------------------------------

JAC_BASE_DIGEST = f"""
WITH words AS ({_WORDS}),
dg AS (
  SELECT doc_id,
         transform({_SHINGLE_SPARK}, s -> sha2(CAST(s AS BINARY), 256)) AS digests
  FROM words
)
SELECT doc_id,
       array_distinct(transform(digests, d -> substr(d, 1, 32))) AS ws,
       {_ROW_BAND_MINS}
FROM dg
"""

JAC_BASE_RAW = f"""
WITH words AS ({_WORDS}),
sh AS (SELECT doc_id, {_SHINGLE_SPARK} AS sharr FROM words),
dg AS (
  SELECT doc_id, sharr,
         transform(sharr, s -> sha2(CAST(s AS BINARY), 256)) AS digests
  FROM sh
)
SELECT doc_id, array_distinct(sharr) AS ws, {_ROW_BAND_MINS} FROM dg
"""

JAC_TAIL = f"""
WITH sigs2 AS (
  SELECT doc_id, stack(4, {_PAIR_BAND_STACK}) AS (band2, sig2) FROM __jac_base
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sigs2 a JOIN sigs2 b ON a.band2 = b.band2 AND a.sig2 = b.sig2
  WHERE a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         size(array_intersect(wa.ws, wb.ws)) AS n_common,
         size(array_union(wa.ws, wb.ws)) AS n_union
  FROM cands c
  JOIN __jac_base wa ON c.doc_a = wa.doc_id
  JOIN __jac_base wb ON c.doc_b = wb.doc_id
)
SELECT doc_a, doc_b, n_common, n_union,
       CAST(n_common AS DOUBLE) / n_union AS jaccard
FROM scored
WHERE CAST(n_common AS DOUBLE) / n_union >= 0.5
"""

JAC_STAGE_CANDS = f"""
WITH words AS ({_WORDS}),
dg AS (
  SELECT doc_id,
         transform({_SHINGLE_SPARK}, s -> sha2(CAST(s AS BINARY), 256)) AS digests
  FROM words
),
sigw AS (
  SELECT doc_id, {_ROW_BAND_MINS} FROM dg
),
sigs2 AS (
  SELECT doc_id, stack(4, {_PAIR_BAND_STACK}) AS (band2, sig2) FROM sigw
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs2 a JOIN sigs2 b ON a.band2 = b.band2 AND a.sig2 = b.sig2
WHERE a.doc_id < b.doc_id
"""

JAC_STAGE_WORDSETS = f"""
WITH words AS ({_WORDS})
SELECT doc_id, array_distinct({_SHINGLE_SPARK}) AS ws FROM words
"""

# ---- fingerprint -----------------------------------------------------

FP_STAGE_GRAMS = """
WITH words AS (
  SELECT doc_id, split(text, ' ') AS w FROM documents
)
SELECT doc_id,
       transform(sequence(1, greatest(size(w) - 4, 1)),
         i -> concat_ws(' ', element_at(w, i),
                        element_at(w, least(i+1, size(w))),
                        element_at(w, least(i+2, size(w))),
                        element_at(w, least(i+3, size(w))),
                        element_at(w, least(i+4, size(w))))) AS gs
FROM words
"""


# ----------------------------------------------------------- harness


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, n):
    fn()  # warm
    runs = []
    for _ in range(n):
        gc.collect()
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 2), [round(r, 2) for r in runs]


def _min3(fn):
    return _timed(fn, 3)


def _min2(fn):
    return _timed(fn, 2)


def _session(app: str):
    from arnab_spark.spark_utils import get_spark

    spark = get_spark(app)
    # the config bench.py grades the sf10 dedup family under
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    return spark


def _sql_fn(sql: str):
    def fn(spark, sf_dir):
        from arnab_spark.spark_utils import register_spread_views

        register_spread_views(spark, sf_dir, ("documents",))
        return spark.sql(sql)

    return fn


def _jac_fused_fn(base_sql: str):
    def fn(spark, sf_dir):
        from arnab_spark.spark_utils import register_spread_views

        register_spread_views(spark, sf_dir, ("documents",))
        base = spark.sql(base_sql).localCheckpoint()
        base.createOrReplaceTempView("__jac_base")
        return spark.sql(JAC_TAIL)

    return fn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "DEDUP_DECOMP_r15.json"
    )
    os.environ.setdefault("ARNAB_SPARK_DRIVER_MEM", "16g")
    from arnab_spark.queries import all_queries
    from tools.gen_scale import generate, generate_sf10

    sf01 = "/root/testdata/sf0.1"
    sf1 = generate(src=sf01)
    sf10 = generate_sf10(sf1)
    reg = all_queries()

    targets = {
        "text_decontaminate": {
            "onepass": _sql_fn(DECON_ONEPASS),
            "onepassdigest": _sql_fn(DECON_ONEPASS_DIGEST),
            "digestjoin": _sql_fn(DECON_DIGEST_JOIN),
        },
        "dedup_simhash": {
            "packfold": _sql_fn(SIMHASH_PACKFOLD),
            "structfold": _sql_fn(SIMHASH_STRUCTFOLD),
        },
        "dedup_ngram_jaccard": {
            "fused_digest": _jac_fused_fn(JAC_BASE_DIGEST),
            "fused_raw": _jac_fused_fn(JAC_BASE_RAW),
        },
        "text_boilerplate_ngrams": {},
        "text_fingerprint": {},
    }
    stages = {
        "text_decontaminate": {
            "gram_stream": _sql_fn(DECON_STAGE_GRAMS),
            "test_side_distinct": _sql_fn(DECON_STAGE_TEST),
        },
        "dedup_simhash": {"md5_transform": _sql_fn(SIMHASH_STAGE_MD5)},
        "dedup_ngram_jaccard": {
            "cands_only": _sql_fn(JAC_STAGE_CANDS),
            "wordsets_only": _sql_fn(JAC_STAGE_WORDSETS),
        },
        "text_boilerplate_ngrams": {"gram_stream": _sql_fn(DECON_STAGE_GRAMS)},
        "text_fingerprint": {"grams_only": _sql_fn(FP_STAGE_GRAMS)},
    }

    out: dict = {
        "round": 15,
        "adopt_rule": (
            ">=1.15x at sf10 in BOTH orders (A: baseline-then-variants; "
            "B fresh JVM: variants-then-baseline; min-of-3 after warm, "
            "bench sf10 dedup-family config: get_spark + shuffle=128, "
            "default broadcast threshold) AND result-identical at "
            "sf0.1+sf10, else TERMINAL per query"
        ),
        "loadavg_start": list(os.getloadavg()),
        "queries": {},
    }

    # ---- session A: identity, stage walls, baseline-then-variants
    spark = _session("dedup_decomp_a")
    for qname, variants in targets.items():
        cur_fn = reg[qname].fn
        rec: dict = {"variants": {}}
        cur_01 = _rows(cur_fn(spark, sf01))
        cur_10 = _rows(cur_fn(spark, sf10))
        base_min, base_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
        rec["current_sf10_a"] = {"min": base_min, "runs": base_runs}
        rec["stages_sf10"] = {}
        for sname, sfn in stages[qname].items():
            smin, sruns = _min2(lambda: _noop(sfn(spark, sf10)))
            rec["stages_sf10"][sname] = {"min": smin, "runs": sruns}
        for vname, vfn in variants.items():
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
                "speedup_a": round(base_min / vmin, 2),
            }
            rec["variants"][vname] = v
        out["queries"][qname] = rec
        with open(out_path, "w") as fh:  # checkpoint progress
            json.dump(out, fh, indent=1)
    spark.stop()

    # ---- session B (fresh JVM): REVERSED order — variants first
    spark = _session("dedup_decomp_b")
    for qname, variants in targets.items():
        cur_fn = reg[qname].fn
        rec = out["queries"][qname]
        for vname, vfn in variants.items():
            vmin, vruns = _min3(lambda: _noop(vfn(spark, sf10)))
            rec["variants"][vname]["sf10_b"] = {"min": vmin, "runs": vruns}
        base_min, base_runs = _min3(lambda: _noop(cur_fn(spark, sf10)))
        rec["current_sf10_b"] = {"min": base_min, "runs": base_runs}
        for vname in variants:
            v = rec["variants"][vname]
            v["sf10_b"]["speedup_b"] = round(base_min / v["sf10_b"]["min"], 2)
        adopted = None
        for vname, v in rec["variants"].items():
            ok = (
                v["identical"]["sf0.1"]
                and v["identical"]["sf10"]
                and v["sf10_a"]["speedup_a"] >= 1.15
                and v["sf10_b"]["speedup_b"] >= 1.15
            )
            v["passes_adopt_rule"] = ok
            if ok and (
                adopted is None
                or v["sf10_b"]["min"] < rec["variants"][adopted]["sf10_b"]["min"]
            ):
                adopted = vname
        rec["adopted"] = adopted
        rec["verdict"] = (
            f"ADOPT {adopted}"
            if adopted
            else (
                "TERMINAL: no pre-stated variant passed both orders"
                if rec["variants"]
                else "stage-walls-only (no variant defined)"
            )
        )
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()

    out["loadavg_end"] = list(os.getloadavg())
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({q: r["verdict"] for q, r in out["queries"].items()}, indent=1))


if __name__ == "__main__":
    main()
