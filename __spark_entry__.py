"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to ``meos_rs_spark.registry`` — one QuerySpec per
implemented operator from SURVEY.md §2, registered by the modules in
``meos_rs_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (E3 pipeline, SURVEY §3) on sf0.001."""
    from meos_rs_spark.registry import load_registry

    return load_registry()["flagship_trip_pipeline"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered via ``registry.ordered_registry()``: the driver records
    CORRECTNESS rows for the first 50 entries only, so the queries that
    still need a driver row this round (``registry.verify_order_head()``,
    computed from the CORRECTNESS artifacts) come first; already-verified
    ones rotate to the back, oldest green first.
    """
    from meos_rs_spark.registry import ordered_registry

    return {name: spec.fn for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin per query; omitted for non-SQL-expressible ops
    (driver then records a weaker rows-only check)."""
    from meos_rs_spark.registry import ordered_registry

    return {
        name: spec.oracle
        for name, spec in ordered_registry().items()
        if spec.oracle is not None
    }
