"""stream_dedup_watermark's global-dedup oracle is only exact while the
watermark delay exceeds the fixture's whole event-time span (duplicates can
then never age out of dedup state, whatever the micro-batching). Pin that
precondition here so a fixture regeneration that widens the span fails loudly
instead of silently breaking the streaming parity hash."""

from __future__ import annotations

import duckdb

from meos_rs_spark.queries.streaming import DEDUP_WATERMARK

SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]


def test_watermark_covers_event_span():
    n, unit = DEDUP_WATERMARK.split()
    assert unit in ("day", "days")
    delay_days = int(n)
    for sf_dir in SF_DIRS:
        (span_days,) = duckdb.sql(
            f"SELECT date_diff('day', min(ts), max(ts)) FROM '{sf_dir}/events.parquet'"
        ).fetchone()
        assert span_days < delay_days, (sf_dir, span_days, delay_days)


def test_stream_state_partitions_policy(spark):
    """The scale-adaptive state-partition default: explicit conf wins;
    otherwise ~1 partition/MB of the events parquet, clamped to [4, 200]."""
    import os
    import tempfile

    from meos_rs_spark.queries.streaming import (
        STREAM_STATE_PARTITIONS_CONF,
        _state_partitions,
    )

    assert _state_partitions(spark, "/root/testdata/sf0.1") == "4"  # 2 MB -> floor
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "events.parquet"), "wb") as f:
            f.truncate(20 << 20)  # 20 MB backlog -> 20 partitions
        assert _state_partitions(spark, d) == "20"
        with open(os.path.join(d, "events.parquet"), "wb") as f:
            f.truncate(1 << 30)  # 1 GB -> cap
        assert _state_partitions(spark, d) == "200"
    assert _state_partitions(spark, None) == "4"
    spark.conf.set(STREAM_STATE_PARTITIONS_CONF, "7")
    try:
        assert _state_partitions(spark, "/root/testdata/sf0.1") == "7"
    finally:
        spark.conf.unset(STREAM_STATE_PARTITIONS_CONF)


def test_stream_state_partitions_uri_matches_local(spark):
    """Storage-agnostic sizing (r16 VERDICT item 4): a URI-form fixture
    location must produce the SAME state-partition count as the plain
    local path — the old os.path-only probe read 0 bytes for any URI and
    silently floored at 4. file:// exercises the Hadoop FileSystem branch
    end-to-end (same code path an s3a:// or hdfs:// deployment takes);
    both the single-events-parquet and the dir-total fallback policies
    are covered."""
    import os
    import tempfile

    from meos_rs_spark.queries.streaming import _backlog_bytes, _state_partitions

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "events.parquet"), "wb") as f:
            f.truncate(20 << 20)  # 20 MB backlog -> 20 partitions
        assert _state_partitions(spark, d) == "20"
        assert _state_partitions(spark, "file://" + d) == "20"
        assert _backlog_bytes(spark, "file://" + d) == (20 << 20)
        # dir-total fallback (no events.parquet): both schemes agree too
        os.rename(os.path.join(d, "events.parquet"), os.path.join(d, "a.parquet"))
        with open(os.path.join(d, "b.parquet"), "wb") as f:
            f.truncate(5 << 20)
        assert _backlog_bytes(spark, d) == (25 << 20)
        assert _backlog_bytes(spark, "file://" + d) == (25 << 20)
        assert _state_partitions(spark, "file://" + d) == "25"
    # an unreadable URI (no such bucket/scheme reachable) floors, not raises
    assert _state_partitions(spark, "file:///nonexistent_meos_r17") == "4"
