"""Late-data streaming exercise (r4 VERDICT item 5): the registered
streaming queries all replay the fixture in file order, which under
``availableNow`` arrives roughly time-ordered — watermark + state handling
of genuinely LATE data was never stressed. Here the fixture is split into
two files where the file arriving SECOND holds the OLDER half of the
timeline (plus re-arrivals of keys already seen in file one), replayed one
file per micro-batch, so every batch-2 event is LATE in processing order:
it arrives after state and watermark were built from strictly newer data.
(The watermark itself — max event time minus DEDUP_WATERMARK's span-covering
delay — deliberately stays BEHIND the late events: that is what obliges the
operators to absorb them instead of discarding them, and what makes the
batch oracle exact. Shrinking the delay below the event span changes the
regime to genuine sub-watermark drops and breaks the oracle.)

Semantics pinned (the incremental-merge model of ``ais_to_db.rs:156-161``):

* ``applyInPandasWithState`` trajectory accumulation must fold late
  arrivals into existing per-key state — final state equals the batch
  aggregate no matter the arrival order (``NoTimeout``: state never ages
  out).
* ``dropDuplicatesWithinWatermark`` with its delay sized beyond the event
  span (``DEDUP_WATERMARK``, pinned by test_streaming_bounds) must
  deduplicate late RE-arrivals of already-seen keys exactly — the global
  batch dedup stays the exact oracle under adversarial ordering.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from meos_rs_spark.queries.streaming import DEDUP_WATERMARK, _traj_state_fn

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def ooo_dir(spark, tmp_path_factory):
    """Two-file stream dir: file_0 = newer half of the timeline (arrives
    first), file_1 = older half + 50 late duplicate re-arrivals of file_0
    keys (arrives second, strictly later mtime)."""
    d = tmp_path_factory.mktemp("ooo_events")
    pdf = (
        spark.read.parquet(SF_EVENTS)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
        .sort_values(["ts", "event_id"], ignore_index=True)
    )
    # keep microsecond precision like the fixture: ns-unit pandas timestamps
    # become parquet timestamp[ns], which the session's nanosAsLong conf
    # surfaces as BIGINT and breaks the ts cast
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    mid = len(pdf) // 2
    older, newer = pdf.iloc[:mid], pdf.iloc[mid:]
    # late re-arrivals: keys from the FIRST (newer) file show up again in the
    # second file — the dedup operator must still drop them
    redeliveries = newer.head(50)
    f0, f1 = os.path.join(d, "file_0.parquet"), os.path.join(d, "file_1.parquet")
    newer.to_parquet(f0, index=False)
    import pandas as pd

    pd.concat([older, redeliveries], ignore_index=True).to_parquet(f1, index=False)
    now = time.time()
    os.utime(f0, (now - 60, now - 60))  # file source replays oldest mtime first
    os.utime(f1, (now, now))
    return str(d)


def _stream(spark, ooo_dir):
    schema = spark.read.parquet(ooo_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .parquet(ooo_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _run(df, spark, mode):
    name = f"late_{abs(hash(df)) % 10**8}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the point of the exercise: the replay really was multi-batch, so the
    # second batch's data arrived behind an already-advanced watermark
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2, "expected >=2 non-empty micro-batches"
    return spark.table(name)


def test_stateful_assembly_absorbs_late_arrivals(spark, ooo_dir):
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (
        _stream(spark, ooo_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _traj_state_fn,
            outputStructType="user_id long, n_points long, t_start_us long, t_end_us long",
            stateStructType="n long, tmin long, tmax long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    latest = _run(out, spark, "update")
    # update mode emits per-batch running state; keep the final row per key
    final = (
        latest.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_points").desc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    batch = (
        spark.read.parquet(ooo_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t_start_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t_end_us"),
        )
    )
    got = {r.user_id: (r.n_points, r.t_start_us, r.t_end_us) for r in final.collect()}
    want = {r.user_id: (r.n_points, r.t_start_us, r.t_end_us) for r in batch.collect()}
    assert got == want
    # at least one key's state must have actually been UPDATED by a late
    # batch (two emitted rows), otherwise the split never exercised merging
    multi = latest.groupBy("user_id").count().filter("count >= 2").count()
    assert multi > 0


def test_dedup_watermark_drops_late_redeliveries(spark, ooo_dir):
    deduped = (
        _stream(spark, ooo_dir)
        .withWatermark("ts", DEDUP_WATERMARK)
        .dropDuplicatesWithinWatermark(["user_id", "ts"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    out = _run(deduped, spark, "complete")
    batch = (
        spark.read.parquet(ooo_dir)
        .select("user_id", "ts")
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    got = {r.user_id: r.n_unique for r in out.collect()}
    want = {r.user_id: r.n_unique for r in batch.collect()}
    assert got == want
    # and the redeliveries were real duplicates: raw row count exceeds the
    # distinct (user_id, ts) count
    raw = spark.read.parquet(ooo_dir).count()
    assert raw > spark.read.parquet(ooo_dir).select("user_id", "ts").distinct().count()
