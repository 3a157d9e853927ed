"""Direct proof of the cross-engine determinism conventions
(functions/determinism.py): render/aggregate the SAME random doubles through
Spark and DuckDB and demand byte equality — the foundation every oracle
match rests on."""

from __future__ import annotations

import numpy as np
import pytest

from meos_rs_spark.functions.determinism import fmt6_sql


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 2000),
            rng.uniform(-1, 1, 2000),
            np.round(rng.uniform(0, 1000, 2000), 2),  # money-like
            [0.0, -0.0, 1.0, -1.0, 0.0078125, 123.4565, 1e-7, -1e-7],
        ]
    )
    return [float(v) for v in vals]


def test_fmt6_renders_identically(spark, values):
    import duckdb

    df = spark.createDataFrame([(v,) for v in values], "x double")
    spark_out = [r.s for r in df.selectExpr(f"{fmt6_sql('x', 'spark')} AS s").collect()]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": values}))
    duck_out = con.sql(f"SELECT {fmt6_sql('x', 'duck')} AS s FROM t").df()["s"].tolist()
    mismatches = [
        (v, a, b) for v, a, b in zip(values, spark_out, duck_out) if a != b
    ]
    assert not mismatches, mismatches[:5]


def test_decimal_sum_is_partition_order_independent(spark, values):
    money = [round(abs(v) % 1000, 2) for v in values]
    df = spark.createDataFrame([(v,) for v in money], "x double")
    sums = set()
    for parts in (1, 7, 32):
        s = (
            df.repartition(parts)
            .selectExpr("CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s")
            .collect()[0]
            .s
        )
        sums.add(s)
    assert len(sums) == 1  # identical bits regardless of partitioning
