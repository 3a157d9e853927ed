"""Multimodal column handling (north-star ops, BASELINE.json): opaque
``binary`` payloads + typed metadata structs, with decode/feature-extract
as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the payloads are the documents'
UTF-8 bytes standing in for media blobs; the *decode* step is a clearly
marked deterministic fake (STUB) while everything Spark-side — binary
column, metadata struct schema, mapInPandas batch shape, partition flow —
is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table


# --- metadata over binary payloads (oracle-checkable) ----------------------


@register(
    "mm_metadata",
    oracle="""
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS payload_bytes,
       md5(text) AS checksum,
       'text/plain' AS mime,
       CAST(octet_length(CAST(text AS BLOB)) > 256 AS INT) AS is_large
FROM documents
""",
    tags=("multimodal",),
    doc="binary payload + typed metadata (size/checksum/mime) as prunable top-level columns",
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.md5("text").alias("checksum"),
        F.lit("text/plain").alias("mime"),
        (F.octet_length(payload) > 256).cast("int").alias("is_large"),
    )


# --- decode / feature-extract via mapInPandas (rows-only) ------------------

_DECODE_SCHEMA = (
    "doc_id long, payload_bytes int, fake_width int, fake_height int, "
    "fake_n_frames int, feature array<double>"
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: a real deployment would decode image/audio bytes here
    (PIL/ffmpeg are not in this container). Deterministic fake: dimensions
    derived from payload length, a 4-dim 'feature' from byte statistics —
    stable across runs/partitions so the driver's rows-only check is stable.
    """
    for pdf in batches:
        n = pdf["payload"].str.len()
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
        last = pdf["payload"].map(lambda b: b[-1] if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": n.astype("int32"),
                "fake_width": (n % 640).astype("int32"),
                "fake_height": (n % 480).astype("int32"),
                "fake_n_frames": ((n % 24) + 1).astype("int32"),
                "feature": [
                    [float(a), float(z), float(ln % 256), float((a + z) % 256)]
                    for a, z, ln in zip(first, last, n)
                ],
            }
        )


# --- resize via mapInPandas (oracle-checkable geometry) ---------------------

_RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, resized_bytes int"
)
_DST_W, _DST_H = 224, 224  # the ubiquitous vision-model input size


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: a real deployment decodes + resamples pixels here (no
    codecs in this container). The fake materializes a dst_w×dst_h-byte
    payload by tiling the source bytes, so the output SIZE is the real
    contract a downstream batch loader sees — and is oracle-checkable."""
    for pdf in batches:
        n = pdf["payload"].str.len()
        src_w = (n % 640).astype("int32")
        src_h = (n % 480).astype("int32")
        resized = pdf["payload"].map(
            lambda b: (b * (_DST_W * _DST_H // max(len(b), 1) + 1))[: _DST_W * _DST_H]
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": src_w,
                "src_h": src_h,
                "dst_w": _DST_W,
                "dst_h": _DST_H,
                "resized_bytes": resized.str.len().astype("int32"),
            }
        )


@register(
    "mm_resize",
    oracle=f"""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS src_w,
       CAST(octet_length(CAST(text AS BLOB)) % 480 AS INT) AS src_h,
       {_DST_W} AS dst_w, {_DST_H} AS dst_h,
       {_DST_W * _DST_H} AS resized_bytes
FROM documents
""",
    tags=("multimodal",),
    doc=f"mapInPandas resize stage: fake-decode dims → tile payload to a "
    f"{_DST_W}×{_DST_H}-byte buffer (STUB pixels, real batch shape); the oracle "
    "reproduces the geometry + output size arithmetically from the raw table",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(_fake_resize, schema=_RESIZE_SCHEMA)


# --- video frame sampling (explode shape, fully oracle-checkable) -----------

_FRAME_BYTES = 64  # fake frame = 64-byte slice of the payload
_FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "mm_frame_sample",
    oracle=f"""
WITH meta AS (
  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
         octet_length(CAST(text AS BLOB)) // {_FRAME_BYTES} AS n_frames
  FROM documents
)
SELECT m.doc_id, m.n_frames, u.i AS frame_idx,
       u.i * {_FRAME_BYTES} AS byte_offset
FROM meta m, unnest(range(0, m.n_frames, {_FRAME_STRIDE})) AS u(i)
WHERE m.n_frames > 0
""",
    tags=("multimodal",),
    doc=f"video-as-binary frame sampling: treat the payload as {_FRAME_BYTES}-byte "
    f"frames, keep every {_FRAME_STRIDE}th (sequence + explode — pure Column ops, "
    "the decode of each sampled frame being the STUB step); one row per sampled "
    "frame with its byte offset, the shape a frame-extraction pipeline shuffles on",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("n_bytes")
    )
    d = d.withColumn("n_frames", (F.col("n_bytes") / _FRAME_BYTES).cast("int")).filter(
        F.col("n_frames") > 0
    )
    return d.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STRIDE))
        ).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * _FRAME_BYTES)


@register(
    "mm_decode_features",
    # the STUB decode is a deterministic arithmetic function of the payload
    # bytes, so the oracle reproduces it from the raw table: the fixture text
    # is pure ASCII (asserted in tests/test_multimodal.py), hence byte length
    # == char length, first/last byte == ascii() of first/last char.
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INT) AS payload_bytes,
       CAST(length(text) % 640 AS INT) AS fake_width,
       CAST(length(text) % 480 AS INT) AS fake_height,
       CAST((length(text) % 24) + 1 AS INT) AS fake_n_frames,
       printf('%.1f,%.1f,%.1f,%.1f',
              CAST(ascii(text) AS DOUBLE),
              CAST(ascii(right(text, 1)) AS DOUBLE),
              CAST(length(text) % 256 AS DOUBLE),
              CAST((ascii(text) + ascii(right(text, 1))) % 256 AS DOUBLE)
       ) AS feature_csv
FROM documents
""",
    tags=("multimodal",),
    doc="mapInPandas decode + feature extraction over binary payloads (Arrow batches; "
    "decode itself is a deterministic STUB — no codecs in this container — which "
    "makes it arithmetically oracle-checkable from the raw table)",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    decoded = d.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)
    # render the vector to one sortable string column: the driver's rows-only
    # canonicalizer sorts output columns in pandas, which cannot hash a raw
    # array<double> cell (r2 ERR) — components are small exact integers, so
    # a fixed "%.1f" rendering is lossless
    return decoded.select(
        "doc_id",
        "payload_bytes",
        "fake_width",
        "fake_height",
        "fake_n_frames",
        F.array_join(
            F.transform("feature", lambda x: F.format_string("%.1f", x)), ","
        ).alias("feature_csv"),
    )
