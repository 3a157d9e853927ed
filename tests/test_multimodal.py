"""Multimodal plumbing tests: binary payload column, metadata struct,
mapInPandas decode-stub batch shape and determinism."""

from __future__ import annotations

from meos_rs_spark.registry import load_registry
from tests.conftest import SF_SMOKE


def test_decode_schema_and_determinism(spark):
    spec = load_registry()["mm_decode_features"]
    df = spec.fn(spark, SF_SMOKE)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "payload_bytes", "fake_width", "fake_height", "fake_n_frames", "feature_csv"
    ]
    a = {r.doc_id: (r.payload_bytes, r.feature_csv) for r in df.collect()}
    b = {r.doc_id: (r.payload_bytes, r.feature_csv) for r in spec.fn(spark, SF_SMOKE).collect()}
    assert a == b and len(a) > 0
    # payload length must match the documents' byte length
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").selectExpr(
        "doc_id", "octet_length(cast(text as binary)) AS n"
    )
    for r in docs.collect():
        assert a[r.doc_id][0] == r.n


def test_feature_dim(spark):
    spec = load_registry()["mm_decode_features"]
    row = spec.fn(spark, SF_SMOKE).limit(1).collect()[0]
    assert len(row.feature_csv.split(",")) == 4


def test_documents_text_is_ascii(spark):
    # the mm_decode_features oracle derives byte values via length()/ascii()
    # on the VARCHAR — valid only while the fixture text is pure ASCII
    # (byte length == char length). If the driver ever ships non-ASCII docs,
    # this fails before the oracle silently diverges.
    non_ascii = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("octet_length(cast(text as binary)) != length(text) OR length(text) = 0")
        .count()
    )
    assert non_ascii == 0
