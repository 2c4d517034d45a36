"""Multimodal column plumbing (beyond-reference corpus, SURVEY.md §7
M4): treat image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image``/``decode_audio`` raise NotImplementedError) behind a
deterministic fake decoder — but the Spark-side plumbing is real and
oracle-checked end to end: binary column construction, schema, Arrow
batch iteration, per-batch feature extraction, partition-preserving
output. Swapping the fake for PIL/ffmpeg changes ONE function.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
sizes; decode cost parallelizes per partition with zero shuffle. Keep
blobs out of shuffles: extract features first, shuffle the features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import functions as F

from arnab_spark.queries import query
from arnab_spark.spark_utils import load_table

N_FEATURES = 8


try:  # optional codec: use a real decoder when the environment has one
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:  # this container ships no imaging library
    _PILImage = None
    HAS_PIL = False


def decode_image(data: bytes) -> "object":
    """Real image decode: PIL-backed when the library is present
    (optional import — round-2 verdict task 7), otherwise a clear
    NotImplementedError. The oracled corpus queries never call this —
    they run the deterministic fake so driver verification is
    environment-independent; swap :func:`real_decode_features` into the
    mapInPandas pipeline to process actual images."""
    if HAS_PIL:
        import io

        return _PILImage.open(io.BytesIO(data))
    raise NotImplementedError("image codec not available in this environment")


def real_decode_features(data: bytes) -> list[int]:
    """Feature vector from a REAL decode when PIL is present (width,
    height, n-bands, then byte-histogram buckets to fill N_FEATURES);
    falls back to the deterministic fake otherwise, so the same
    pipeline runs in both modes (tests cover both, PIL mode gated by
    availability)."""
    if not HAS_PIL:
        return fake_decode_features(data)
    img = decode_image(data)
    feats = [img.width, img.height, len(img.getbands())]
    sample = img.tobytes()[: 4 * (N_FEATURES - 3)]
    for j in range(N_FEATURES - 3):
        chunk = sample[4 * j : 4 * (j + 1)]
        feats.append(sum(chunk) % 256 if chunk else 0)
    return feats


def decode_audio(data: bytes) -> "object":
    """Real audio decode — same stub contract as decode_image."""
    raise NotImplementedError("audio codec not available in this environment")


def fake_decode_features(data: bytes) -> list[int]:
    """Deterministic stand-in for decode→feature-extract: md5 the bytes
    and expose the first N hex digits' code points as 'features'. Exists
    so the mapInPandas pipeline has verifiable, engine-portable output."""
    digest = hashlib.md5(data).hexdigest()
    return [ord(digest[j]) for j in range(N_FEATURES)]


_FEATURES_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       array_to_string([{", ".join(f"ascii(substr(md5(text), {j + 1}, 1))" for j in range(N_FEATURES))}], '-') AS features
FROM documents
"""


@query("multimodal_decode_features", oracle=_FEATURES_ORACLE, tags=("multimodal", "pandas-udf"))
def multimodal_decode_features(spark, sf_dir):
    """Binary decode → feature extraction via mapInPandas: documents'
    text is encoded to a binary 'blob' column (stand-in for image
    bytes), then an Arrow-batched Python operator emits per-blob feature
    vectors. The oracle recomputes the same features in SQL, so even the
    Python batch path is exact-checked. The feature vector is serialized
    to a '-'-joined string at the batch boundary: a top-level array<>
    column crashes the driver's pandas canonicalizer (round-1 finding —
    this query sat outside round 1's verification window, but had the
    same latent bug as the four flagged ones)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "features": blobs.map(
                        lambda b: "-".join(str(v) for v in fake_decode_features(b))
                    ),
                }
            )

    return d.mapInPandas(extract, schema="doc_id bigint, n_bytes bigint, features string")


@query(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       'application/x-fake' AS mime,
       CAST(n_chars % 64 + 1 AS BIGINT) AS width,
       CAST(n_chars % 48 + 1 AS BIGINT) AS height,
       CAST(floor(octet_length(encode(text)) / (n_chars % 64 + 1)) AS BIGINT) AS stride
FROM documents
""",
    tags=("multimodal",),
)
def multimodal_metadata(spark, sf_dir):
    """Typed metadata columns alongside the opaque blob: mime, synthetic
    width/height, derived stride — pure column expressions, no Python.
    The pattern: metadata lives in ordinary columns so pruning/filtering
    happens WITHOUT touching blob bytes (Parquet column projection skips
    the blob pages entirely)."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    width = (F.col("n_chars") % 64 + 1).cast("bigint")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.lit("application/x-fake").alias("mime"),
        width.alias("width"),
        (F.col("n_chars") % 48 + 1).cast("bigint").alias("height"),
        # floor() on both sides: bare CAST(a/b AS BIGINT) truncates in
        # Spark but rounds half-even in DuckDB
        F.floor(F.octet_length(blob).cast("bigint") / width).cast("bigint").alias("stride"),
    )


RESIZE_TO = 64  # power of two: i*len/64 divides exactly in binary FP


_RESIZE_ORACLE = f"""
WITH px AS (
  SELECT d.doc_id, t.i AS i,
         substr(d.text, CAST(floor(t.i * length(d.text) / {RESIZE_TO}.0) AS BIGINT) + 1, 1) AS p
  FROM documents d, LATERAL unnest(range(0, {RESIZE_TO})) AS t(i)
  WHERE length(d.text) > 0
)
SELECT doc_id,
       CAST({RESIZE_TO} AS BIGINT) AS out_len,
       md5(string_agg(p, '' ORDER BY i)) AS resized_md5
FROM px
GROUP BY doc_id
"""


@query("multimodal_resize", oracle=_RESIZE_ORACLE, tags=("multimodal", "pandas-udf"))
def multimodal_resize(spark, sf_dir):
    """Nearest-neighbor 'resize' of the opaque blob to a fixed
    RESIZE_TO-byte signal via ``mapInPandas`` — the same Arrow-batched
    shape a real image resize (PIL ``Image.resize``) slots into; here
    the kernel is 1-D nearest-neighbor byte sampling so the output is
    deterministic and oracle-checkable. Exactness: sample index is
    ``i * len // RESIZE_TO``; the oracle's ``floor(i*len/64.0)`` agrees
    bit-for-bit because i*len < 2^53 is exact in double and dividing by
    a power of two is exact, so floor(double) == integer floor-div.
    Downsampling and upsampling (len < RESIZE_TO duplicates bytes) both
    fall out of the one formula. Scale: zero shuffle — resize is a
    projection; blobs stay in their input partitions and only the
    (doc_id, md5) summary ever moves."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        def nn_resize(blob: bytes) -> bytes:
            n = len(blob)
            return bytes(blob[(i * n) // RESIZE_TO] for i in range(RESIZE_TO))

        for pdf in batches:
            # None-safe: a NULL blob must drop like the oracle's
            # length()>0 filter, not TypeError the whole Arrow batch
            keep = pdf[pdf["blob"].map(lambda b: len(b) if b is not None else 0) > 0]
            yield pd.DataFrame(
                {
                    "doc_id": keep["doc_id"],
                    "resized": keep["blob"].map(nn_resize),
                }
            )

    out = d.mapInPandas(resize, schema="doc_id bigint, resized binary")
    return out.select(
        "doc_id",
        F.octet_length("resized").cast("bigint").alias("out_len"),
        F.md5("resized").alias("resized_md5"),
    )


# DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR instead —
# byte-identical here because the documents fixture is pure ASCII at
# every SF (verified: octet_length(encode(text)) == length(text) for
# all rows); md5(varchar) hashes its UTF-8 bytes, same as Spark's
# md5(binary) on the cast blob.
_FRAME_ORACLE = """
WITH f AS (
  SELECT d.doc_id, CAST(t.i AS INTEGER) AS frame_idx,
         substr(d.text, CAST(t.i * 128 + 1 AS BIGINT), 32) AS fs
  FROM documents d, LATERAL unnest(
    range(0, CAST(ceil(length(d.text) / 128.0) AS BIGINT))) AS t(i)
)
SELECT doc_id, frame_idx,
       CAST(octet_length(encode(fs)) AS BIGINT) AS frame_len,
       md5(fs) AS frame_md5
FROM f
"""


@query(
    "multimodal_frame_sample", oracle=_FRAME_ORACLE, tags=("multimodal", "pandas-udf")
)
def multimodal_frame_sample(spark, sf_dir):
    """'Video' frame sampling plumbing: treat the blob as a frame
    container and emit every k-th chunk as a row via ``mapInPandas``
    (one blob in, few schema'd binary frames out — the row-explosion
    shape a real decoder produces). The driver-facing projection hashes
    each frame to (len, md5) so the binary contents are fully
    oracle-checked against DuckDB slicing the same blob with
    substring() — not just row counts."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )

    def sample_frames(batches: Iterator) -> Iterator:
        import pandas as pd

        chunk, stride = 32, 4  # take a 32-byte "frame" every 4 chunks
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for idx, start in enumerate(range(0, len(blob), chunk * stride)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(bytes(blob[start : start + chunk]))
            yield pd.DataFrame(out)

    frames = d.mapInPandas(
        sample_frames, schema="doc_id bigint, frame_idx int, frame_bytes binary"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )
