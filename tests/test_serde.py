"""Golden serialization tests, mirroring the reference's golden-string unit
tests (meos/src/tbox.rs:130-151, examples/01_hello_world.rs:7-56)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from meos_rs_spark.functions.serde import point_hexwkb, point_wkb
from meos_rs_spark.functions.trajectory import point_wkt
from meos_rs_spark.registry import load_registry
from tests.conftest import SF_SMOKE


def test_point_wkb_golden(spark):
    df = spark.createDataFrame([(1.0, 1.0), (-70.1, 42.3)], "lon double, lat double")
    rows = df.select(
        point_wkb(F.col("lon"), F.col("lat")).alias("wkb"),
        point_hexwkb(F.col("lon"), F.col("lat")).alias("hex"),
    ).collect()
    for (lon, lat), row in zip([(1.0, 1.0), (-70.1, 42.3)], rows):
        expected = struct.pack("<BI2d", 1, 1, lon, lat)
        assert bytes(row.wkb) == expected
        assert row.hex == expected.hex().upper()
    # golden: POINT(1 1) little-endian
    assert rows[0].hex == "0101000000000000000000F03F000000000000F03F"


def test_point_wkt_golden(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, "2000-01-01 00:00:00.000000")], "lon double, lat double, ts string"
    ).select("lon", "lat", F.col("ts").cast("timestamp_ntz").alias("ts"))
    out = df.select(point_wkt("lon", "lat", "ts").alias("w")).collect()[0].w
    # 01_hello_world.rs:8 instant form, UTC-pinned with explicit offset
    assert out == "POINT(1 1)@2000-01-01 00:00:00.000000+00"


def test_mfjson_is_valid_json(spark):
    spec = load_registry()["serde_mfjson"]
    rows = spec.fn(spark, SF_SMOKE).limit(3).collect()
    assert rows
    for r in rows:
        doc = json.loads(r.mfjson)
        assert doc["type"] == "MovingPoint"
        assert doc["interpolation"] == "Linear"
        assert len(doc["coordinates"]) == len(doc["datetimes"])
        assert doc["lower_inc"] is True and doc["upper_inc"] is True
