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

import os
import tempfile

from pyspark.sql import DataFrame


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
    path = os.path.join(root, spark.sparkContext.applicationId, name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
