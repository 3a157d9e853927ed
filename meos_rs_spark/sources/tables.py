"""Fixture table loaders (Parquet scans, SURVEY §2.1 S1-S4).

The reference scans CSV two ways — serde row-typed
(``meos/examples/04_to_file.rs:69-84``) and Polars lazy multi-file
(``meos-polars/examples/ais_to_db.rs:118-120``). Our sources are the driver's
parquet fixtures; `spark.read.parquet` gives the same capability surface
(explicit schema, globbing, column pruning + predicate pushdown for free).

``events.ts`` is parquet TIMESTAMP(NANOS,false), which Spark rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by session.prepare_session)
— the raw int64 nanos then surface as BIGINT and we normalize:

  * ``ts``     TIMESTAMP_NTZ at microsecond precision (truncated, matching
               DuckDB ``epoch_ns(ts)//1000``) — built TZ-independently from
               epoch-day arithmetic so a non-UTC driver session cannot skew it
  * ``ts_ns``  the original int64 epoch nanos (strict-ordering column for the
               monotonic dedup filter, reference 04_to_file.rs:92-96)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.session import prepare_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

MICROS_PER_DAY = 86_400_000_000


def _normalize_events(df: DataFrame) -> DataFrame:
    # int64 nanos -> TIMESTAMP_NTZ(micros), without going through a double
    # (1.7e18 exceeds 2^53) and without session-TZ-dependent casts.
    # `div 1000` truncates toward zero; DuckDB's parquet reader truncates
    # nanos to micros the same way for the post-epoch timestamps in the
    # fixtures (all 2024; asserted in tests/test_sources.py), so the oracle
    # side (`events` registered directly on the parquet) sees identical ts.
    ntz = F.expr(
        f"timestampadd(MICROSECOND, (ts div 1000) % {MICROS_PER_DAY}, "
        f"CAST(date_add(DATE '1970-01-01', CAST((ts div 1000) div {MICROS_PER_DAY} AS INT)) "
        f"AS TIMESTAMP_NTZ))"
    )
    return df.select(
        "event_id",
        ntz.alias("ts"),
        F.col("ts").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalized column types."""
    prepare_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_events(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
