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
