"""r12 adversarial-fixture harness: the documents/embeddings families over
the corners the driver's generated fixtures never produce.

The r11 synthetic harness covered the events-only and streaming twins
(tests/test_invariants.py); this extends the instrument to the corpus
families. tools/adversarial_fixture.py builds all ten tables with the
NULL/empty/unicode/tie/orphan corners; tools/sweep_adversarial.py sweeps
the full registry over it (the round's review instrument — 53 docs-family
twins all OK as of r12). This standing pin re-runs the twins whose
SEMANTICS the r12 sweep changed, so a regression in any fixed class —
ragged-embedding aborts, CAST(AS BLOB) escape parsing, NULL-text payload
synthesis, non-ASCII byte arithmetic — fails the suite, not the next
sweep. The slow ANN/staging twins are covered by the tool sweep, not here
(suite-budget tradeoff, same as the scale runner).
"""

from __future__ import annotations

import pytest

#: the changed-in-r12 twins cheap enough for the suite (the 13 sim_* twins
#: share the same envelope + kernels; sim_cosine_topk stands in for the
#: family — the others run through tools/sweep_adversarial.py per round)
PINNED = (
    "sim_cosine_topk",
    "mm_metadata",
    "mm_audio_features",
    "mm_decode_features",
    "mm_resize",
    "mm_frame_sample",
    "mm_jpeg_features",
    "text_token_count",
    "src_binaryfile_ingest",
    # TPC-H-side batch: the one diverger of 38 (DataFrame unpivot keeps
    # NULL cells, SQL UNPIVOT excludes them — EXCLUDE pinned in both legs)
    "rel_unpivot",
    # events-family batch (89/107 agreed as-is; the serialization/
    # trajectory NULL-position envelope twins are adjudicated ENVELOPE in
    # tools/sweep_adversarial.KNOWN_ENVELOPE): the NULL-key corners
    "snk_jdbc_upsert",
    "rel_join_asof",
    "rel_join_asof_nearest",
    "ttype_tint_step",
    "traj_merge",
    "traj_equality",
    "src_python_datasource",
    "src_csv_malformed",
)


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from tools.adversarial_fixture import write_fixture

    d = tmp_path_factory.mktemp("adversarial")
    write_fixture(str(d))
    return str(d)


@pytest.mark.parametrize("name", PINNED)
def test_twin_agrees_on_adversarial_corpus(spark, adv_dir, name):
    from meos_rs_spark.registry import load_registry
    from tests.oracle import compare, duck_connection

    reg = load_registry()
    spec = reg[name]
    con = duck_connection(adv_dir)
    issues = compare(spec.fn(spark, adv_dir), con.sql(spec.oracle).df(), name)
    assert not issues, issues


def test_fixture_carries_the_corners(adv_dir):
    """The corners must stay present — a fixture regression would turn
    every pin above vacuous."""
    import duckdb

    con = duckdb.connect()
    docs = f"'{adv_dir}/documents.parquet'"
    emb = f"'{adv_dir}/embeddings.parquet'"
    one = lambda q: con.sql(q).fetchone()[0]  # noqa: E731
    assert one(f"SELECT count(*) FROM {docs} WHERE text IS NULL") >= 1
    assert one(f"SELECT count(*) FROM {docs} WHERE text = ''") >= 1
    assert one(
        f"SELECT count(*) FROM {docs} WHERE octet_length(encode(text)) > length(text)"
    ) >= 1  # multi-byte unicode
    assert one(f"SELECT count(*) FROM {docs} WHERE contains(text, '\\')") >= 1
    assert one(f"SELECT count(*) FROM {emb} WHERE embedding IS NULL") >= 1
    assert one(f"SELECT count(*) FROM {emb} WHERE len(embedding) = 0") >= 1
    assert one(
        f"SELECT count(*) FROM {emb} WHERE embedding IS NOT NULL AND len(embedding) NOT IN (0, 64)"
    ) >= 1  # wrong-dimension
    assert one(
        f"SELECT count(*) FROM {emb} WHERE len(list_filter(embedding, x -> x IS NULL)) > 0"
    ) >= 1  # NULL component
    assert one(
        f"""SELECT count(*) FROM {emb}
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> x != 0.0)) = 0"""
    ) >= 1  # zero-norm


def test_chunk_salvage_preserves_measured_rows(tmp_path):
    """r13 find: a wedged chunk subprocess used to backfill its WHOLE chunk
    as fake ABORT/S rows, losing measured results (six such placeholders
    ship in the r12 extremes artifacts). The salvage path must recover
    every JSONL row the subprocess persisted before dying, tolerate the
    torn final line a crash leaves, and mark only the truly-unmeasured
    names with the distinct CHUNK_DIED class."""
    import json

    from tools.sweep_adversarial import _salvage_chunk

    tmp = str(tmp_path / "out.json.chunk0")
    part = ["q_ok", "q_abort", "q_torn", "q_never_ran"]
    with open(tmp + ".partial", "w", encoding="utf-8") as fh:
        fh.write(json.dumps({"name": "q_ok", "class": "OK", "rows_spark": 5}) + "\n")
        fh.write(json.dumps({"name": "q_abort", "class": "ABORT/O", "error": "x"}) + "\n")
        fh.write('{"name": "q_torn", "cla')  # crash mid-write
    got = _salvage_chunk(tmp, part)
    assert got["q_ok"] == {"class": "OK", "rows_spark": 5}
    assert got["q_abort"]["class"] == "ABORT/O"
    assert got["q_torn"]["class"] == "CHUNK_DIED"
    assert got["q_never_ran"]["class"] == "CHUNK_DIED"
    import os

    assert not os.path.exists(tmp + ".partial")  # consumed
    # no partial at all (crash before the first twin finished)
    got2 = _salvage_chunk(str(tmp_path / "other.chunk5"), ["a"])
    assert got2 == {"a": {"class": "CHUNK_DIED", "error": "chunk died before this twin ran"}}


def test_collect_rescues_out_of_ns_timestamps(spark):
    """r15 VERDICT item 3 witness: a year-9999 sentinel in the OUTPUT used
    to abort the sweep's collection layer (pandas ns epoch ends at 2262)
    and was recorded as an engine ABORT/S — 17 of the 45 r15 extremes
    ABORT/S rows were this harness limit. _collect must rescue the cast
    (datetime objects span year 1..9999) and compare clean against the
    DuckDB leg, which already collects at us resolution."""
    import duckdb

    from tests.oracle import compare
    from tools.sweep_adversarial import _Wrapped, _collect

    sdf = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP'9999-12-31 00:00:00'), "
        "(2, TIMESTAMP'1867-01-07 12:00:00'), "
        "(3, NULL) AS t(id, ts)"
    )
    pdf = _collect(sdf)
    assert len(pdf) == 3
    con = duckdb.connect()  # keep a reference: the relation lazily binds
    ddf = con.sql(
        "SELECT * FROM (VALUES "
        "(1, TIMESTAMP '9999-12-31 00:00:00'), "
        "(2, TIMESTAMP '1867-01-07 12:00:00'), "
        "(3, NULL)) t(id, ts)"
    ).df()
    assert compare(_Wrapped(pdf), ddf, "ns_rescue") == []


def test_collect_reraises_engine_aborts(spark):
    """Only the collection-cast class is rescued — a genuine engine abort
    (ANSI decimal range, the adjudicated magnitude contract) must still
    surface as ABORT/S, never be retried into silence."""
    import pytest

    from tools.sweep_adversarial import _collect

    sdf = spark.sql("SELECT CAST(1e300 AS DECIMAL(28,6)) AS x")
    with pytest.raises(Exception) as ei:
        _collect(sdf)
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in str(ei.value)


def test_exc_fields_bucket_aborts_by_class():
    """r15 VERDICT item 3: ABORT rows must carry a machine-bucketable
    class so cross-round re-certification is identical-by-CLASS, not just
    by count — and a wrapper (StreamingQueryException) must expose its
    DEEPEST cause, not hide class drift behind [STREAM_FAILED]."""
    from tools.sweep_adversarial import _exc_fields

    plain = ValueError(
        "[NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION] 1e300 cannot be "
        "represented as Decimal(28, 6)."
    )
    f = _exc_fields(plain)
    assert f["exc_type"] == "ValueError"
    assert f["error_class"] == "NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION"
    assert f["root"].startswith("[NUMERIC_VALUE_OUT_OF_RANGE")

    wrapped = RuntimeError(
        "[STREAM_FAILED] Query [id = x] terminated with exception: boom\n"
        "=== Streaming Query ===\n"
        "Caused by: org.apache.spark.SparkArithmeticException: "
        "[CAST_OVERFLOW] The value 1e300 of the type DOUBLE cannot be cast\n"
        "Caused by: java.lang.ArithmeticException: long overflow at deepest"
    )
    g = _exc_fields(wrapped)
    assert g["exc_type"] == "RuntimeError"
    assert g["error_class"] == "CAST_OVERFLOW"
    assert g["root"].startswith("java.lang.ArithmeticException: long overflow")
    assert g["exc_msg"].startswith("[STREAM_FAILED]")


def test_compare_aligns_rescued_datetime_objects_with_multidigit_keys():
    """The rescue path collects object-dtype datetimes; a NULL in that
    column used to TypeError the sort and send only the Spark leg down
    the astype(str) fallback, where id 10 sorts before id 2 — misaligned
    rows, false DIVERGE. The per-column sort key keeps both legs on the
    same (numeric/datetime) sort path."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from tests.oracle import compare
    from tools.sweep_adversarial import _Wrapped

    spark_like = pd.DataFrame(
        {
            "id": [2, 10, 7],
            "ts": [dt.datetime(9999, 12, 31), None, dt.datetime(2020, 1, 2)],
        }
    )
    assert spark_like["ts"].dtype == object  # the rescued collection shape
    con = duckdb.connect()
    ddf = con.sql(
        "SELECT * FROM (VALUES (10, NULL), (7, TIMESTAMP '2020-01-02'), "
        "(2, TIMESTAMP '9999-12-31')) t(id, ts)"
    ).df()
    assert compare(_Wrapped(spark_like), ddf, "align_rescue") == []
