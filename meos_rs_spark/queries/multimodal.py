"""Multimodal column handling (north-star ops, BASELINE.json): opaque
``binary`` payloads + typed metadata structs, with decode/feature-extract
as Arrow-batched ``mapInPandas`` stages.

The container has no PIL/cv2/ffmpeg, but the image-decode stage is REAL
anyway: ``mm_decode_features`` materializes each document as a genuine
grayscale PNG (the fixture ships no media blobs, so the blob is
synthesized deterministically from the text bytes) and then actually
decodes it — signature + chunk + CRC parse, zlib inflate, scanline
unfilter — via the pure-stdlib codec in ``functions/media.py``. The
decoded pixels are oracle-checked end-to-end (their md5 equals what DuckDB
computes arithmetically from the raw table, which only holds if the
encode→decode round trip is bit-exact). Since r7 the *resize* stage is
pixel-real too (decode → numpy nearest-neighbor resample → re-encode →
re-decode, resized-pixel md5 oracled) and *frame-sample* really decodes
each sampled frame as an 8×8 PNG. JPEG is real as well:
``mm_jpeg_features`` runs a genuine baseline-JPEG encode→decode (marker
parse, Annex K.3 Huffman entropy coding, dequantize + IDCT) whose decoded
pixels are still exactly oracle-checkable because the synthesized images
are flat 8×8 tiles (DC-only blocks reconstruct in closed integer form).
And the video path goes through a REAL container: ``mm_frame_sample``
writes the frames into a genuine YUV4MPEG2 (Cmono) stream, seeks to the
sampled frames JVM-side (fixed record size → substring arithmetic), and
parses each sampled record with the actual Y4M decoder before the
per-frame PNG round trip. Compressed video write→parse exists too
(functions/media.py: MJPEG frames in a real AVI/RIFF container, pinned at
codec level); the query-level carrier stays Y4M because it is lossless —
exact-hash oracles need bit-identical frames. Only inter-frame codecs
(H.26x/AV1) are out of scope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table


#: The payload envelope, explicit in BOTH legs of every codec twin (r12
#: adversarial sweep; same pattern as the WKT source's NULL-position
#: envelope): a document participates in media synthesis iff its text is
#: non-NULL and pure single-byte (octet length == char length, i.e. ASCII
#: — the documented bytes==chars contract every arithmetic oracle relies
#: on; it also keeps every byte < 128, which the PCM16 peak needs for
#: signed == unsigned). A NULL-text doc has no payload to synthesize and a
#: multi-byte doc has no char-addressable byte stream; both previously
#: ABORTED the Spark leg (bytes(None)) or silently diverged.
_PAYLOAD_ENVELOPE_DUCK = (
    "text IS NOT NULL AND octet_length(encode(text)) = length(text)"
)
_DOCS = f"(SELECT * FROM documents WHERE {_PAYLOAD_ENVELOPE_DUCK})"


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as (doc_id, payload) for the codec stages — restricted to
    the payload envelope above — spread across the session's parallelism
    when the fixture scan is under-split (functions/staging.fan_out — the
    shared guard the shingle pipeline also uses)."""
    from meos_rs_spark.functions.staging import fan_out

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.octet_length(F.encode("text", "utf-8")) == F.length("text"))
        )
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return fan_out(d, "doc_id")


# --- metadata over binary payloads (oracle-checkable) ----------------------


@register(
    "mm_metadata",
    # encode(), not CAST(AS BLOB): the cast ABORTS DuckDB on any non-ascii
    # character (r12 adversarial sweep) while encode() is the UTF-8 byte
    # conversion Spark's encode(text, 'utf-8') performs. Total: a NULL text
    # yields NULL bytes/checksum in both legs.
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       md5(text) AS checksum,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) > 256 AS INT) AS is_large
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


# --- decode / feature-extract via mapInPandas (REAL PNG decode) -------------

_DECODE_SCHEMA = (
    "doc_id long, payload_bytes int, width int, height int, "
    "n_pixels int, pixel_md5 string"
)
# image geometry derived from the payload length — small enough that the
# oracle can reproduce the pixel stream arithmetically, large enough that
# the zlib/filter machinery does real work per row
_PNG_W_MOD, _PNG_H_MOD = 64, 48


def _png_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode stage: each payload is materialized as a genuine
    grayscale-8 PNG (pixels = the payload bytes tiled to width*height) and
    then decoded with the spec-complete codec in functions/media.py —
    signature + per-chunk CRC verification, multi-IDAT zlib inflate,
    scanline unfilter. The emitted width/height/pixel-md5 come from the
    DECODED image, so the oracle's arithmetic reproduction of the pixel
    stream verifies the whole encode→decode round trip bit-for-bit. The
    encoder emits filter-0 scanlines, so the per-row unfilter stays on the
    vectorless fast path; filters 1-4 are exercised by tests/test_media.py.
    """
    import hashlib

    from meos_rs_spark.functions.media import png_decode_gray, png_encode_gray

    for pdf in batches:
        out: dict = {k: [] for k in (
            "doc_id", "payload_bytes", "width", "height", "n_pixels", "pixel_md5"
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n = len(payload)
            w, h = n % _PNG_W_MOD + 1, n % _PNG_H_MOD + 1
            if n == 0:
                # degenerate empty payload (the fixtures pin non-emptiness,
                # but a task crash is never an acceptable failure mode):
                # emit exactly what the oracle's arithmetic yields — its
                # repeat count is `... // n`, an integer division by zero
                # is NULL in DuckDB, and repeat/substr/md5 all propagate it,
                # so the oracle's pixel_md5 is NULL there (verified against
                # duckdb directly; the r6 md5(b'') here was wrong — latent,
                # unreachable while the non-empty-text pin holds)
                out["doc_id"].append(doc_id)
                out["payload_bytes"].append(0)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["pixel_md5"].append(None)
                continue
            pixels = (payload * ((w * h) // n + 1))[: w * h]
            blob = png_encode_gray(pixels, w, h)  # the media blob a real pipeline stores
            dw, dh, decoded = png_decode_gray(blob)  # the REAL decode under test
            out["doc_id"].append(doc_id)
            out["payload_bytes"].append(n)
            out["width"].append(dw)
            out["height"].append(dh)
            out["n_pixels"].append(len(decoded))
            out["pixel_md5"].append(hashlib.md5(decoded).hexdigest())
        yield pd.DataFrame(out)


# --- audio decode via mapInPandas (REAL WAV decode) --------------------------

_AUDIO_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, n_channels int, "
    "pcm_md5 string, peak int"
)
_AUDIO_RATE = 16000


def _wav_audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio decode stage: each payload's byte pairs become PCM16
    samples in a genuine mono WAV container (stdlib wave writer), which is
    then decoded back through the RIFF parser (functions/media.py
    wav_decode_pcm16) — the decoded frame bytes and their count/rate/
    channels are what this stage emits, so the oracle's arithmetic
    reproduction of the PCM stream verifies the container round trip."""
    import hashlib
    import io
    import struct
    import wave

    from meos_rs_spark.functions.media import wav_decode_pcm16

    for pdf in batches:
        out: dict = {k: [] for k in (
            "doc_id", "n_samples", "sample_rate", "n_channels", "pcm_md5", "peak"
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            frames = payload[: 2 * (len(payload) // 2)]
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(_AUDIO_RATE)
                w.writeframes(frames)
            nch, rate, nf, pcm = wav_decode_pcm16(buf.getvalue())  # REAL decode
            # one C call over the whole frame buffer, not a per-sample loop
            peak = max(struct.unpack(f"<{nf}h", pcm), default=0)
            out["doc_id"].append(doc_id)
            out["n_samples"].append(nf)
            out["sample_rate"].append(rate)
            out["n_channels"].append(nch)
            out["pcm_md5"].append(hashlib.md5(pcm).hexdigest())
            out["peak"].append(peak)
        yield pd.DataFrame(out)


@register(
    "mm_audio_features",
    # PCM16 samples ARE the payload's leading byte pairs, so the oracle
    # rebuilds the frame stream from the raw VARCHAR (ASCII fixture: bytes
    # == chars, and every high byte < 128 keeps signed == unsigned for the
    # peak). A hash match proves the WAV container write→parse round trip.
    oracle=f"""
WITH a AS (
  SELECT doc_id, text, length(text) // 2 AS k FROM {_DOCS}
)
SELECT doc_id,
       CAST(k AS INT) AS n_samples,
       {_AUDIO_RATE} AS sample_rate,
       1 AS n_channels,
       md5(substr(text, 1, 2 * k)) AS pcm_md5,
       CAST(COALESCE(list_max(list_transform(range(k), i ->
              ascii(substr(text, 2 * CAST(i AS INT) + 1, 1))
            + 256 * ascii(substr(text, 2 * CAST(i AS INT) + 2, 1)))), 0)
            AS INT) AS peak
FROM a
""",
    tags=("multimodal",),
    doc="mapInPandas audio decode over binary payloads: byte pairs as PCM16 "
    "samples in a REAL mono WAV container (stdlib wave writer), decoded back "
    "through the RIFF parser (functions/media.py) — frame bytes, count, rate, "
    "channels and peak all come from the DECODED stream and are oracle-checked "
    "against an arithmetic reproduction from the raw table",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _payloads(spark, sf_dir)
    return d.mapInPandas(_wav_audio_features, schema=_AUDIO_SCHEMA)


# --- resize via mapInPandas (REAL pixel resample) ---------------------------

_RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "resized_px int, resized_md5 string"
)
_DST_W, _DST_H = 224, 224  # the ubiquitous vision-model input size


def _png_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL resize stage: decode the document's PNG blob (the same
    synthesized grayscale image mm_decode_features stores — pixels = payload
    bytes tiled to w×h), nearest-neighbor resample to dst_w×dst_h with numpy
    fancy indexing (``src[(y*h)//dst_h][(x*w)//dst_w]``), re-encode the
    resized image as a PNG, and decode THAT back — the emitted md5 is of the
    re-decoded resized pixels, so a hash match proves decode → resample →
    re-encode → decode end-to-end, not just the index arithmetic."""
    import hashlib

    import numpy as np

    from meos_rs_spark.functions.media import png_decode_gray, png_encode_gray

    ys0 = np.arange(_DST_H)
    xs0 = np.arange(_DST_W)
    for pdf in batches:
        out: dict = {k: [] for k in (
            "doc_id", "src_w", "src_h", "dst_w", "dst_h", "resized_px", "resized_md5"
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n = len(payload)
            w, h = n % _PNG_W_MOD + 1, n % _PNG_H_MOD + 1
            if n == 0:
                # degenerate empty payload (fixtures pin non-emptiness; never
                # crash the task): emit exactly what the oracle's arithmetic
                # yields there — its per-pixel index is `... % n`, a modulo
                # by zero is NULL in DuckDB, every sampled char is therefore
                # NULL, array_to_string of an all-NULL list is NULL, and
                # md5(NULL) is NULL (verified against duckdb directly)
                out["doc_id"].append(doc_id)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(_DST_W)
                out["dst_h"].append(_DST_H)
                out["resized_px"].append(_DST_W * _DST_H)
                out["resized_md5"].append(None)
                continue
            pixels = (payload * ((w * h) // n + 1))[: w * h]
            blob = png_encode_gray(pixels, w, h)  # the stored media blob
            dw, dh, decoded = png_decode_gray(blob)  # REAL decode
            src = np.frombuffer(decoded, dtype=np.uint8).reshape(dh, dw)
            resized = src[np.ix_((ys0 * h) // _DST_H, (xs0 * w) // _DST_W)]
            rblob = png_encode_gray(resized.tobytes(), _DST_W, _DST_H)
            _, _, rdec = png_decode_gray(rblob)  # prove the re-encode too
            out["doc_id"].append(doc_id)
            out["src_w"].append(w)
            out["src_h"].append(h)
            out["dst_w"].append(_DST_W)
            out["dst_h"].append(_DST_H)
            out["resized_px"].append(len(rdec))
            out["resized_md5"].append(hashlib.md5(rdec).hexdigest())
        yield pd.DataFrame(out)


@register(
    "mm_resize",
    # The oracle rebuilds the resized pixel stream arithmetically from the
    # raw table. dst pixel (y,x) = tiled_text[((y*h)//dst_h)*w + (x*w)//dst_w],
    # and tiled_text[i] = text[i % n] (ASCII fixture: bytes == chars).
    # Factored for cost: the column-sample positions are shared by every dst
    # row and only h (≤ {_PNG_H_MOD}) distinct source rows exist, so sample
    # each source row once and assemble the dst_h dst rows by row lookup —
    # h*dst_w substrs per doc instead of dst_w*dst_h (~14× cheaper).
    oracle=f"""
WITH geo AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_PNG_W_MOD} + 1 AS w,
         length(text) % {_PNG_H_MOD} + 1 AS h
  FROM {_DOCS}
),
rows_cs AS (
  SELECT doc_id, w, h,
         list_transform(range(h), r ->
           array_to_string(list_transform(range({_DST_W}), x ->
             substr(text, 1 + (r * w + (x * w) // {_DST_W}) % n, 1)), '')) AS cs
  FROM geo
)
SELECT doc_id,
       CAST(w AS INT) AS src_w,
       CAST(h AS INT) AS src_h,
       {_DST_W} AS dst_w, {_DST_H} AS dst_h,
       {_DST_W * _DST_H} AS resized_px,
       md5(array_to_string(list_transform(range({_DST_H}), y ->
         cs[CAST((y * h) // {_DST_H} AS INT) + 1]), '')) AS resized_md5
FROM rows_cs
""",
    tags=("multimodal",),
    doc=f"mapInPandas image resize: REAL PNG decode → numpy nearest-neighbor "
    f"resample to {_DST_W}×{_DST_H} → PNG re-encode → re-decode; the resized "
    "pixels' md5 is oracle-checked against an arithmetic reproduction of the "
    "nearest-neighbor index math from the raw table",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _payloads(spark, sf_dir)
    return d.mapInPandas(_png_resize, schema=_RESIZE_SCHEMA)


# --- video frame sampling (REAL Y4M container, explode shape) ---------------

_FRAME_BYTES = 64  # frame = 64 luma bytes = one 8×8 gray image
_FRAME_W, _FRAME_H = 8, 8
_FRAME_STRIDE = 4  # keep every 4th frame
# YUV4MPEG2 stream geometry (functions/media.py y4m_encode_mono, Cmono 8×8):
# one header line, then per frame the 6-byte "FRAME\n" record marker + the
# fixed 64-byte luma plane — every offset in the container is arithmetic
_Y4M_HEADER = "YUV4MPEG2 W8 H8 F25:1 Ip A0:0 Cmono\n"
_Y4M_HDR_LEN = len(_Y4M_HEADER)           # 36
_Y4M_REC_LEN = 6 + _FRAME_BYTES           # 70

_FRAME_SCHEMA = (
    "doc_id long, n_frames int, container_bytes int, frame_idx int, "
    "byte_offset int, frame_w int, frame_h int, frame_md5 string"
)


def _decode_sampled_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL per-frame container parse + decode: each sampled record arrives
    as a minimal one-frame YUV4MPEG2 stream (the 36-byte header + the
    70-byte FRAME record the JVM seeked to), is parsed by the Y4M decoder
    in functions/media.py (header tag parse, chroma gate, FRAME magic +
    size validation), and the extracted luma plane is then round-tripped
    through a genuine 8×8 grayscale PNG; the emitted md5 is of the DECODED
    pixels and the emitted frame_w/frame_h come from the PARSED container
    header. Only the SAMPLED frames reach this stage, which is the point of
    seek-then-decode at scale: decode cost scales with frames kept, not
    frames stored."""
    import hashlib

    from meos_rs_spark.functions.media import (
        png_decode_gray,
        png_encode_gray,
        y4m_decode_mono,
    )

    for pdf in batches:
        md5s, ws, hs = [], [], []
        for mini in pdf["mini"]:
            w, h, _fps, frames = y4m_decode_mono(bytes(mini))  # REAL container parse
            if len(frames) != 1:
                raise ValueError(f"seek arithmetic broke: {len(frames)} frames in record")
            blob = png_encode_gray(frames[0], w, h)
            _, _, dec = png_decode_gray(blob)  # REAL decode of the sampled frame
            ws.append(w)
            hs.append(h)
            md5s.append(hashlib.md5(dec).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": pdf["n_frames"],
                "container_bytes": pdf["container_bytes"],
                "frame_idx": pdf["frame_idx"],
                "byte_offset": pdf["byte_offset"],
                "frame_w": ws,
                "frame_h": hs,
                "frame_md5": md5s,
            }
        )


@register(
    "mm_frame_sample",
    # the container is lossless and its geometry fixed (36-byte header,
    # 70-byte FRAME records), so every quantity is arithmetic on the raw
    # table: container_bytes = 36 + 70*n_frames, a sampled frame's payload
    # starts at 36 + 70*idx + 6 in the stream and IS the idx-th 64-byte
    # slice of the text (ASCII fixture: bytes == chars) — a frame_md5 match
    # therefore proves Y4M write→seek→parse AND the per-frame PNG
    # encode→decode round trip on exactly the sampled frames
    oracle=f"""
WITH meta AS (
  -- encode(), never CAST(AS BLOB): the cast parses \\x escape sequences
  -- and ABORTS on a lone backslash even in pure-ASCII text (r12 sweep)
  SELECT doc_id, text,
         octet_length(encode(text)) // {_FRAME_BYTES} AS n_frames
  FROM {_DOCS}
)
SELECT m.doc_id, CAST(m.n_frames AS INT) AS n_frames,
       CAST({_Y4M_HDR_LEN} + {_Y4M_REC_LEN} * m.n_frames AS INT) AS container_bytes,
       CAST(u.i AS INT) AS frame_idx,
       CAST({_Y4M_HDR_LEN} + {_Y4M_REC_LEN} * u.i + 6 AS INT) AS byte_offset,
       {_FRAME_W} AS frame_w, {_FRAME_H} AS frame_h,
       md5(substr(m.text, CAST(u.i * {_FRAME_BYTES} AS INT) + 1, {_FRAME_BYTES}))
         AS frame_md5
FROM meta m, unnest(range(0, m.n_frames, {_FRAME_STRIDE})) AS u(i)
WHERE m.n_frames > 0
""",
    tags=("multimodal",),
    doc=f"video frame sampling through a REAL container: the payload's "
    f"{_FRAME_BYTES}-byte frames are written into a genuine YUV4MPEG2 (Cmono) "
    f"stream, every {_FRAME_STRIDE}th frame is SEEKED to JVM-side (fixed record "
    "size → pure substring arithmetic, so only a 70-byte record + the 36-byte "
    "header cross into Python per sampled frame), each sampled record is parsed "
    "by the real Y4M decoder (functions/media.py) and its luma plane round-"
    "tripped through an 8×8 grayscale PNG with the decoded-pixel md5, parsed "
    "frame geometry and container offsets all oracle-checked; one row per "
    "sampled frame",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _payloads(spark, sf_dir)
    d = d.withColumn(
        "n_frames", (F.octet_length("payload") / _FRAME_BYTES).cast("int")
    ).filter(F.col("n_frames") > 0)
    # materialize the Y4M container JVM-side (the "stored video" a real
    # pipeline would scan): header + per-frame FRAME records, pure Column ops
    frame_recs = F.transform(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda i: F.concat(
            F.lit("FRAME\n"),
            F.col("payload").substr(i * _FRAME_BYTES + 1, F.lit(_FRAME_BYTES)).cast("string"),
        ),
    )
    d = d.withColumn(
        "video", F.concat(F.lit(_Y4M_HEADER), F.array_join(frame_recs, ""))
    ).withColumn("container_bytes", F.octet_length("video"))
    sampled = (
        d.select(
            "doc_id",
            "n_frames",
            "container_bytes",
            "video",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STRIDE))
            ).alias("frame_idx"),
        )
        # container SEEK, JVM-side: record offset is pure arithmetic because
        # Cmono records are fixed-size; byte_offset points at the luma plane
        .withColumn(
            "byte_offset", F.lit(_Y4M_HDR_LEN) + F.col("frame_idx") * _Y4M_REC_LEN + 6
        )
        .select(
            "doc_id",
            "n_frames",
            "container_bytes",
            "frame_idx",
            "byte_offset",
            # a minimal single-frame Y4M stream: parsed header + seeked record
            F.concat(
                F.expr(f"substring(video, 1, {_Y4M_HDR_LEN})"),
                F.expr(
                    f"substring(video, {_Y4M_HDR_LEN} + frame_idx * {_Y4M_REC_LEN} + 1,"
                    f" {_Y4M_REC_LEN})"
                ),
            ).cast("binary").alias("mini"),
        )
    )
    return sampled.mapInPandas(_decode_sampled_frames, schema=_FRAME_SCHEMA)


@register(
    "mm_decode_features",
    # the oracle reproduces the DECODED pixel stream arithmetically from the
    # raw table: pixels are the text bytes tiled to width*height, so their
    # md5 is md5 of the tiled VARCHAR (the fixture text is pure ASCII and
    # non-empty, asserted in tests/test_multimodal.py, hence bytes == chars
    # and the repeat count is finite). A match therefore proves the Spark
    # side's PNG encode→decode round trip is bit-exact — not just that the
    # geometry arithmetic agrees.
    oracle=f"""
WITH geo AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_PNG_W_MOD} + 1 AS w,
         length(text) % {_PNG_H_MOD} + 1 AS h
  FROM {_DOCS}
)
SELECT doc_id,
       CAST(n AS INT) AS payload_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS INT) AS n_pixels,
       md5(substr(repeat(text, (w * h) // n + 1), 1, w * h)) AS pixel_md5
FROM geo
""",
    tags=("multimodal",),
    doc="mapInPandas image decode + feature extraction over binary payloads "
    "(Arrow batches): a REAL grayscale PNG per document (pure-stdlib codec, "
    "functions/media.py — chunk/CRC parse, zlib inflate, scanline unfilter), "
    "with the decoded pixels' md5 oracle-checked against an arithmetic "
    "reproduction of the pixel stream from the raw table",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _payloads(spark, sf_dir)
    return d.mapInPandas(_png_decode_features, schema=_DECODE_SCHEMA)


# --- JPEG decode via mapInPandas (REAL baseline codec) -----------------------

_JPEG_SCHEMA = "doc_id long, width int, height int, n_blocks int, pixel_md5 string"
# block-grid geometry derived from the payload length: up to 6×4 MCUs, so
# every image is MCU-aligned (the codec's declared envelope) and small
# enough for the oracle's per-block arithmetic
_JPEG_BX_MOD, _JPEG_BY_MOD = 6, 4


def _jpeg_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL JPEG stage: each payload becomes a flat-8×8-tile grayscale image
    (block (by,bx) holds the constant payload byte [(by*nbx+bx) % n]), is
    encoded as a genuine baseline JPEG (functions/media.py — markers, Annex
    K.3 Huffman coding, DC prediction, byte stuffing) and decoded back
    through the full marker parse / entropy decode / dequantize / IDCT
    path. Flat tiles are DC-only, and the uniform quant step 24 is a
    multiple of 8, so the decode is exact integer arithmetic
    (px' = 128 + 3*round((px-128)/3)) — which is what lets the SQL oracle
    reproduce the DECODED pixels bit-for-bit even though JPEG is lossy in
    general. The lossy general case is pinned by tests/test_media.py's
    roundtrip error bounds instead."""
    import hashlib

    import numpy as np

    from meos_rs_spark.functions.media import (
        avi_decode_mjpeg,
        avi_encode_mjpeg,
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    for pdf in batches:
        out: dict = {k: [] for k in (
            "doc_id", "width", "height", "n_blocks", "pixel_md5"
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n = len(payload)
            nbx, nby = n % _JPEG_BX_MOD + 1, n % _JPEG_BY_MOD + 1
            out["doc_id"].append(doc_id)
            out["width"].append(8 * nbx)
            out["height"].append(8 * nby)
            out["n_blocks"].append(nbx * nby)
            if n == 0:
                # degenerate empty payload (fixtures pin non-emptiness; never
                # crash the task): the oracle's block lookup is `... % n`, a
                # modulo by zero is NULL in DuckDB and propagates through
                # chr/repeat/array_to_string/md5, so the match is NULL
                out["pixel_md5"].append(None)
                continue
            # block value clamped into [32, 126]: decoded DC-only pixels
            # then stay in [32, 125], single-byte in the oracle's UTF-8
            # world for ANY payload byte — 0x7F would decode to pixel 128,
            # which DuckDB's chr() renders as TWO bytes (0xC2 0x80) and the
            # md5s would silently diverge (review find, this round)
            blocks = np.frombuffer(
                bytes(payload[i % n] % 95 + 32 for i in range(nbx * nby)), np.uint8
            ).reshape(nby, nbx)
            pixels = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
            blob = jpeg_encode_gray(pixels.tobytes(), 8 * nbx, 8 * nby)
            # the stored form is a 1-frame MJPEG/AVI: the compressed-video
            # container path (functions/media.py) runs distributed here, and
            # since the oracle pins the decoded pixels' md5, a container
            # write->parse corruption would fail the driver row — no extra
            # column needed for it to be verified
            (frame,) = avi_decode_mjpeg(avi_encode_mjpeg([blob], 8 * nbx, 8 * nby))[3]
            _, _, decoded = jpeg_decode_gray(frame)  # the REAL decode under test
            out["pixel_md5"].append(hashlib.md5(decoded).hexdigest())
        yield pd.DataFrame(out)


@register(
    "mm_jpeg_features",
    # The oracle rebuilds the DECODED pixel stream arithmetically: block
    # (by,bx) holds v = text byte [(by*nbx+bx) % n] clamped to 32..126 via
    # % 95 + 32 (ASCII fixture: bytes == chars), and a DC-only block under
    # quant step 24 decodes to exactly 128 - 3*round_half_away((128-v)/3) —
    # integer math with every result a single byte in both engines, so a
    # hash match proves the whole JPEG encode→entropy-decode→IDCT round
    # trip.
    oracle=f"""
WITH j AS (
  SELECT doc_id, text, length(text) AS n,
         length(text) % {_JPEG_BX_MOD} + 1 AS nbx,
         length(text) % {_JPEG_BY_MOD} + 1 AS nby
  FROM {_DOCS}
)
SELECT doc_id,
       CAST(8 * nbx AS INT) AS width,
       CAST(8 * nby AS INT) AS height,
       CAST(nbx * nby AS INT) AS n_blocks,
       md5(array_to_string(list_transform(range(nby), by ->
         repeat(array_to_string(list_transform(range(nbx), bx ->
           repeat(chr(128 - 3 * ((2 * (128 - (ascii(substr(text,
             CAST((by * nbx + bx) % n AS INT) + 1, 1)) % 95 + 32)) + 3) // 6)), 8)),
           ''), 8)), '')) AS pixel_md5
FROM j
""",
    tags=("multimodal",),
    doc="mapInPandas JPEG decode over binary payloads: a REAL baseline JPEG "
    "per document (pure stdlib+numpy codec, functions/media.py — marker "
    "parse, Annex K.3 Huffman entropy decode, dequantize, IDCT), stored and "
    "recovered through a 1-frame MJPEG/AVI container (the compressed-video "
    "read path, exercised distributed), with the decoded pixels' md5 "
    "oracle-checked via the exact DC-only closed form",
)
def mm_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _payloads(spark, sf_dir)
    return d.mapInPandas(_jpeg_decode_features, schema=_JPEG_SCHEMA)
