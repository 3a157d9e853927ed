"""Staging-table lifecycle: within-session plan memoization, liveness
markers, and stale-sibling pruning (ADVICE r4: mtime-based pruning could
delete a >24h-old but still-live session's tables)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from meos_rs_spark.functions import staging


def _part_files(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }


def test_same_plan_same_name_skips_rewrite(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out1 = staging.stage(df, "memo_probe")
    key = (spark.sparkContext.applicationId, "memo_probe")
    path = staging._MEMO[key][1]
    before = _part_files(path)
    # a structurally identical plan (fresh exprIds) must memo-hit: no rewrite
    df2 = spark.range(100).withColumn("v", F.col("id") * 2)
    out2 = staging.stage(df2, "memo_probe")
    assert _part_files(path) == before
    assert sorted(r.v for r in out2.collect()) == sorted(r.v for r in out1.collect())


def test_changed_plan_same_name_rewrites(spark):
    staging.stage(spark.range(10), "rewrite_probe")
    out = staging.stage(spark.range(20), "rewrite_probe")
    assert out.count() == 20


def test_live_marker_exists_and_refreshes(spark):
    staging.stage(spark.range(5), "live_probe")
    key = (spark.sparkContext.applicationId, "live_probe")
    app_dir = os.path.dirname(staging._MEMO[key][1])
    marker = os.path.join(app_dir, staging._LIVE_MARKER)
    assert os.path.exists(marker)
    old = time.time() - 3600
    os.utime(marker, (old, old))
    # every stage() call — memoized reads included — refreshes liveness
    staging.stage(spark.range(5), "live_probe")
    assert os.path.getmtime(marker) > old + 1800


def test_stale_sibling_pruning_respects_liveness(tmp_path):
    root = str(tmp_path)
    stale_t = time.time() - staging._STALE_AFTER_S - 60
    # dead session: marker last refreshed beyond the cutoff
    dead = os.path.join(root, "app-dead")
    os.makedirs(dead)
    open(os.path.join(dead, staging._LIVE_MARKER), "w").close()
    os.utime(os.path.join(dead, staging._LIVE_MARKER), (stale_t, stale_t))
    # long-lived session: dir mtime stale (staged early) but marker fresh —
    # the exact case the r4 ADVICE flagged; must NOT be pruned
    live = os.path.join(root, "app-live")
    os.makedirs(live)
    open(os.path.join(live, staging._LIVE_MARKER), "w").close()
    os.utime(live, (stale_t, stale_t))
    # pre-marker legacy dir, stale by dir mtime
    legacy = os.path.join(root, "app-legacy")
    os.makedirs(legacy)
    os.utime(legacy, (stale_t, stale_t))

    me = os.path.join(root, "app-me")
    os.makedirs(me)
    staging._register_cleanup(me, root)

    assert not os.path.isdir(dead)
    assert not os.path.isdir(legacy)
    assert os.path.isdir(live)
    assert os.path.isdir(me)
