"""Mathematical invariants of the round-3 numeric operators, checked on the
sf0.001 fixture through the real Spark queries (complements the DuckDB
parity twins: parity proves engine agreement, these prove the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meos_rs_spark.functions.trajectory import posits
from meos_rs_spark.registry import load_registry
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return load_registry()[name].fn(spark, SF_SMOKE)


def test_twavg_bounded_by_extremes(spark):
    ext = posits(spark, SF_SMOKE).groupBy("mmsi").agg(
        F.min("lon").alias("lo"), F.max("lon").alias("hi")
    )
    bad = (
        _q(spark, "traj_twavg")
        .join(ext, "mmsi")
        .filter((F.col("twavg_lon") < F.col("lo") - 1e-9) | (F.col("twavg_lon") > F.col("hi") + 1e-9))
    )
    assert bad.count() == 0


def test_resample_interpolates_within_envelope(spark):
    ext = posits(spark, SF_SMOKE).groupBy("mmsi").agg(
        F.min("lon").alias("lo_x"), F.max("lon").alias("hi_x"),
        F.min("lat").alias("lo_y"), F.max("lat").alias("hi_y"),
        F.min("ts").alias("t0"), F.max("ts").alias("t1"),
    )
    r = _q(spark, "traj_resample_linear").join(ext, "mmsi")
    assert r.filter(
        (F.col("lon_i") < F.col("lo_x") - 1e-9) | (F.col("lon_i") > F.col("hi_x") + 1e-9)
        | (F.col("lat_i") < F.col("lo_y") - 1e-9) | (F.col("lat_i") > F.col("hi_y") + 1e-9)
    ).count() == 0
    # every grid instant stays inside the vessel's observed span
    assert r.filter((F.col("g") < F.col("t0")) | (F.col("g") > F.col("t1"))).count() == 0


def test_tcount_sweep_conserves(spark):
    rows = _q(spark, "traj_tcount_sweep").orderBy("ts").collect()
    assert all(r.active >= 0 for r in rows)
    # every opened session closes: the sweep ends at zero active trips
    assert rows[-1].active == 0
    assert sum(r.net_delta for r in rows) == 0


def test_tdwithin_counts_consistent(spark):
    bad = _q(spark, "trajsim_tdwithin").filter(
        (F.col("n_within") > F.col("n_sync")) | (F.col("n_within") < 0)
    )
    assert bad.count() == 0


def test_stops_are_long_enough(spark):
    rows = _q(spark, "traj_stops").collect()
    assert all(r.duration_us >= 43_200_000_000 for r in rows)
    assert all(r.n_pts >= 1 for r in rows)
