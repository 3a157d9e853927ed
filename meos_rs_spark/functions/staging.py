"""Staging-table materialization — the 100 TB substitute for ``.cache()``.

``df.cache()`` pins the materialized intermediate in executor memory (with
optional disk spill), which is the right call at fixture scale but the wrong
dependency at 100 TB: an exploded intermediate (e.g. the shingle fact table
behind MinHash dedup) is ~10x the corpus and cannot be assumed to fit the
cluster's storage memory, and cache eviction silently degrades to full
recomputation of the producing stage — per consumer.

``stage()`` writes the intermediate once to a parquet staging table and hands
every consumer a plain scan of it: columnar-compressed, spill-free,
predictable. On a cluster the staging root points at the job's scratch
prefix (HDFS/S3); locally it defaults to the system temp dir. Set
``spark.meos.staging.dir`` to relocate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame

_STALE_AFTER_S = 24 * 3600
_CLEANUP_REGISTERED: set[str] = set()


def _register_cleanup(app_dir: str, root: str) -> None:
    """Own staged tables are deleted at interpreter exit; sibling app dirs
    untouched for >24h belong to sessions that died before their atexit ran
    and are pruned opportunistically — staged intermediates (the shingle fact
    alone is ~10x the corpus) must not accumulate across bench/test rounds."""
    if app_dir in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(app_dir)
    atexit.register(shutil.rmtree, app_dir, True)
    cutoff = time.time() - _STALE_AFTER_S
    try:
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if p != app_dir and os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def stage(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` under the staging root and return a scan of it.

    ``mode("overwrite")`` keeps repeated invocations (bench reruns, the
    driver's two-leg compare) idempotent; the write is eager, so the
    producing stages run exactly once no matter how many consumers fan out
    downstream (the property ``.cache()`` only guarantees while the blocks
    survive eviction).
    """
    spark = df.sparkSession
    try:
        root = spark.conf.get("spark.meos.staging.dir")
    except Exception:
        root = None
    if not root:
        root = os.path.join(tempfile.gettempdir(), "meos_rs_staging")
    # namespace by application id: two Spark sessions on one machine (a bench
    # run next to a test run) must never overwrite each other's staged tables
    # mid-read; within one session the overwrite keeps reruns idempotent
    app_dir = os.path.join(root, spark.sparkContext.applicationId)
    _register_cleanup(app_dir, root)
    path = os.path.join(app_dir, name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
