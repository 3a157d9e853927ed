"""Multimodal plumbing tests: binary payload column, metadata struct,
mapInPandas batch shape and determinism, and the REAL PNG decode stage."""

from __future__ import annotations

import hashlib

from meos_rs_spark.registry import load_registry
from tests.conftest import SF_SMOKE


def test_decode_schema_and_determinism(spark):
    spec = load_registry()["mm_decode_features"]
    df = spec.fn(spark, SF_SMOKE)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "payload_bytes", "width", "height", "n_pixels", "pixel_md5"
    ]
    a = {r.doc_id: tuple(r)[1:] for r in df.collect()}
    b = {r.doc_id: tuple(r)[1:] for r in spec.fn(spark, SF_SMOKE).collect()}
    assert a == b and len(a) > 0
    # payload length must match the documents' byte length
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").selectExpr(
        "doc_id", "octet_length(cast(text as binary)) AS n"
    )
    for r in docs.collect():
        assert a[r.doc_id][0] == r.n


def test_decoded_pixels_match_independent_recomputation(spark):
    """The pixel_md5 column must equal an md5 computed HERE from the raw
    text — through no codec at all — for every document: the Spark side
    encodes a real PNG and really decodes it, so any bit lost anywhere in
    chunk layout, compression, or unfiltering breaks this."""
    from meos_rs_spark.queries.multimodal import _PNG_H_MOD, _PNG_W_MOD

    rows = {
        r.doc_id: (r.width, r.height, r.pixel_md5)
        for r in load_registry()["mm_decode_features"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    for r in docs.collect():
        payload = r.text.encode()
        n = len(payload)
        w, h = n % _PNG_W_MOD + 1, n % _PNG_H_MOD + 1
        pixels = (payload * ((w * h) // n + 1))[: w * h]
        assert rows[r.doc_id] == (w, h, hashlib.md5(pixels).hexdigest()), r.doc_id


def test_resized_pixels_match_independent_recomputation(spark):
    """mm_resize's resized_md5 must equal an md5 computed HERE from the raw
    text through pure index arithmetic — no codec involved — so the Spark
    side's decode → numpy nearest-neighbor resample → re-encode → re-decode
    chain is verified end-to-end."""
    import numpy as np

    from meos_rs_spark.queries.multimodal import (
        _DST_H,
        _DST_W,
        _PNG_H_MOD,
        _PNG_W_MOD,
    )

    rows = {
        r.doc_id: (r.src_w, r.src_h, r.dst_w, r.dst_h, r.resized_px, r.resized_md5)
        for r in load_registry()["mm_resize"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    ys, xs = np.arange(_DST_H), np.arange(_DST_W)
    for r in docs.collect():
        payload = r.text.encode()
        n = len(payload)
        w, h = n % _PNG_W_MOD + 1, n % _PNG_H_MOD + 1
        tiled = np.frombuffer(
            (payload * ((w * h) // n + 1))[: w * h], dtype=np.uint8
        ).reshape(h, w)
        expect = tiled[np.ix_((ys * h) // _DST_H, (xs * w) // _DST_W)]
        assert rows[r.doc_id] == (
            w, h, _DST_W, _DST_H, _DST_W * _DST_H,
            hashlib.md5(expect.tobytes()).hexdigest(),
        ), r.doc_id


def test_sampled_frames_match_independent_recomputation(spark):
    """mm_frame_sample emits one row per kept frame (every STRIDEth of the
    64-byte frames) whose frame_md5 is of the DECODED 8×8 PNG pixels — which
    must equal md5 of the raw byte slice computed here with no codec. The
    container quantities are recomputed from the Y4M stream geometry: a
    Cmono record is 6 ("FRAME\n") + 64 luma bytes, after a 36-byte header,
    and byte_offset points at the sampled frame's luma plane."""
    from meos_rs_spark.queries.multimodal import (
        _FRAME_BYTES,
        _FRAME_STRIDE,
        _Y4M_HDR_LEN,
        _Y4M_REC_LEN,
    )

    got = {
        (r.doc_id, r.frame_idx): (
            r.n_frames, r.container_bytes, r.byte_offset, r.frame_md5,
        )
        for r in load_registry()["mm_frame_sample"].fn(spark, SF_SMOKE).collect()
    }
    expect = {}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    for r in docs.collect():
        payload = r.text.encode()
        n_frames = len(payload) // _FRAME_BYTES
        for i in range(0, n_frames, _FRAME_STRIDE):
            off = i * _FRAME_BYTES
            expect[(r.doc_id, i)] = (
                n_frames,
                _Y4M_HDR_LEN + _Y4M_REC_LEN * n_frames,
                _Y4M_HDR_LEN + _Y4M_REC_LEN * i + 6,
                hashlib.md5(payload[off : off + _FRAME_BYTES]).hexdigest(),
            )
    assert got == expect and len(got) > 0


def test_documents_text_is_ascii(spark):
    # the mm_decode_features oracle derives byte values via length()/repeat()
    # on the VARCHAR — valid only while the fixture text is pure ASCII and
    # non-empty (byte length == char length, tile count finite). If the
    # driver ever ships non-ASCII or empty docs, this fails before the
    # oracle silently diverges.
    non_ascii = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("octet_length(cast(text as binary)) != length(text) OR length(text) = 0")
        .count()
    )
    assert non_ascii == 0


def test_jpeg_features_match_independent_recomputation(spark):
    """mm_jpeg_features' pixel_md5 must equal a recomputation here that
    uses NO codec at all — just the DC-only closed form the oracle relies
    on: block value v = byte % 95 + 32, decoded flat pixel =
    128 + 3*round_half_away((v-128)/3), tiles rastered 8x8."""
    from meos_rs_spark.queries.multimodal import _JPEG_BX_MOD, _JPEG_BY_MOD

    got = {
        r.doc_id: (r.width, r.height, r.n_blocks, r.pixel_md5)
        for r in load_registry()["mm_jpeg_features"].fn(spark, SF_SMOKE).collect()
    }
    expect = {}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    for r in docs.collect():
        payload = r.text.encode()
        n = len(payload)
        nbx, nby = n % _JPEG_BX_MOD + 1, n % _JPEG_BY_MOD + 1

        def decoded(b):
            v = b % 95 + 32
            s = v - 128  # always negative here (v <= 126)
            return 128 - 3 * ((2 * (128 - v) + 3) // 6) if s else 128

        px = bytearray()
        for by in range(nby):
            row = b"".join(
                bytes([decoded(payload[(by * nbx + bx) % n])]) * 8
                for bx in range(nbx)
            )
            px += row * 8
        expect[r.doc_id] = (
            8 * nbx, 8 * nby, nbx * nby, hashlib.md5(bytes(px)).hexdigest()
        )
    assert got == expect and len(got) > 0
