"""Shared pytest fixtures: one local SparkSession per test run."""

from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from meos_rs_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    # SPARK_GRAFT_TEST_SHUFFLE lets the parity suite re-run under an
    # adversarial partition count (e.g. 3, 17): every oracle hash must be
    # invariant to how rows distribute across shuffle partitions, or the
    # query's aggregation isn't order-independent and would flake at scale
    shuffle = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))
    spark = get_spark(
        app_name="meos-rs-spark-tests", cpus=cpus, shuffle_partitions=shuffle
    )
    if "SPARK_GRAFT_TEST_SHUFFLE" in os.environ:
        # adversarial mode: the run exists to prove hash-invariance to row
        # distribution, so the perturbed partition count must actually
        # stick — AQE size-based coalescing (parallelismFirst=false in
        # RUNTIME_CONFS) would quietly merge the tiny fixture shuffles back
        # toward one partition and neuter the perturbation
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def registry_snapshots(spark):
    """ONE sweep building every registered query at SF_SMOKE, shared by the
    registry-wide fences (output-schema hashability, physical-plan lint).
    Building a query can run real jobs on the way to its plan (eager
    staging writes, the sqlite upsert), so sweeping once instead of once
    per fence saves minutes of suite wall clock."""
    from meos_rs_spark.registry import load_registry

    snaps = {}
    for name, spec in load_registry().items():
        df = spec.fn(spark, SF_SMOKE)
        snaps[name] = (
            df.schema,
            df._jdf.queryExecution().executedPlan().toString(),
        )
    return snaps
