"""Golden serialization tests, mirroring the reference's golden-string unit
tests (meos/src/tbox.rs:130-151, examples/01_hello_world.rs:7-56)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from meos_rs_spark.functions.serde import (
    point_hexwkb,
    point_wkb,
    traj_from_wkb,
    traj_wkb,
)
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


def test_traj_wkb_golden(spark):
    # 2-instant linear sequence, both bounds inclusive, 2024-01-01T00:00:00Z
    # and +60s — 10-byte header + 2×24-byte instants, little-endian
    df = spark.createDataFrame(
        [([1704067200000000, 1704067260000000], [1.0, 3.5], [2.0, -4.25])],
        "ts_us array<long>, lon array<double>, lat array<double>",
    )
    row = df.select(
        F.hex(
            traj_wkb("ts_us", "lon", "lat", F.lit(True), F.lit(True), F.lit("Linear"))
        ).alias("h")
    ).collect()[0]
    assert row.h == (
        "01"          # little-endian
        "01000020"    # type: Point | 0x20000000 temporal-sequence flag (LE)
        "07"          # flags: lower_inc | upper_inc | linear
        "02000000"    # n_instants = 2
        "000000000000F03F" "0000000000000040" "00202110D70D0600"  # (1.0, 2.0)@t0
        "0000000000000C40" "00000000000011C0" "00A7B413D70D0600"  # (3.5, -4.25)@t1
    )


def test_traj_wkb_roundtrip_identity(spark):
    # pack → parse must reproduce every field, including non-default flags
    df = spark.createDataFrame(
        [
            ([1704067200000000], [0.0], [0.0], True, False, "Step"),
            ([1, 2, 3], [1.5, 2.5, 3.5], [-1.0, -2.0, -3.0], False, True, "Linear"),
        ],
        "ts_us array<long>, lon array<double>, lat array<double>, "
        "lo boolean, up boolean, interp string",
    )
    out = df.select(
        "ts_us", "lon", "lat", "lo", "up", "interp",
        traj_from_wkb(traj_wkb("ts_us", "lon", "lat", "lo", "up", "interp")).alias("p"),
    ).collect()
    for r in out:
        assert r.p.interp == r.interp and r.p.lower_inc == r.lo and r.p.upper_inc == r.up
        assert list(r.p.ts_us) == r.ts_us and list(r.p.lon) == r.lon and list(r.p.lat) == r.lat


def test_point_wkt_golden(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, "2000-01-01 00:00:00.000000")], "lon double, lat double, ts string"
    ).select("lon", "lat", F.col("ts").cast("timestamp_ntz").alias("ts"))
    out = df.select(point_wkt("lon", "lat", "ts").alias("w")).collect()[0].w
    # 01_hello_world.rs:8 instant form, UTC-pinned with explicit offset
    assert out == "POINT(1 1)@2000-01-01 00:00:00.000000+00"


def test_mfjson_ingest_null_columns_on_malformed_docs(spark):
    """r12 ADVICE: the lon/lat projection's inner ANSI subscript
    (pair[0]) aborted the whole ingest when a malformed doc parsed to a
    SHORT coordinate pair (INVALID_ARRAY_INDEX), so the 'bad doc yields
    NULL columns' contract was only partial — nested try_element_at
    closes it. Pins: well-formed docs unchanged; empty-coordinates,
    short-pair, and unparseable docs each yield NULL columns, no abort."""
    from meos_rs_spark.queries.serialization import mfjson_ingest_project

    good = (
        '{"type":"MovingPoint","interpolation":"Linear",'
        '"coordinates":[[1.5,-2.25],[3.0,4.0]],'
        '"datetimes":["2024-01-01T00:00:00.000000Z","2024-01-01T01:00:00.000000Z"],'
        '"lower_inc":true,"upper_inc":true}'
    )
    empty = (
        '{"type":"MovingPoint","interpolation":"Linear","coordinates":[],'
        '"datetimes":[],"lower_inc":true,"upper_inc":true}'
    )
    short_pair = (
        '{"type":"MovingPoint","interpolation":"Linear","coordinates":[[1.5]],'
        '"datetimes":["2024-01-01T00:00:00.000000Z"],'
        '"lower_inc":true,"upper_inc":true}'
    )
    garbage = "not json at all"
    df = spark.createDataFrame(
        [(1, good), (2, empty), (3, short_pair), (4, garbage)],
        "mmsi long, mfjson string",
    )
    out = {r.mmsi: r for r in mfjson_ingest_project(df).collect()}  # must not abort
    assert len(out) == 4
    g = out[1]
    assert g.n_points == 2 and g.lon_first == "1.5" and g.lat_last == "4"
    assert g.t_start_us == 1704067200000000 and g.t_end_us == 1704070800000000
    assert out[2].lon_first is None and out[2].lat_last is None
    # the short pair has a first element, so lon_first (position 1) parses
    # but lat_last (position 2 of the last pair) is NULL — exactly the case
    # the old inner subscript aborted on
    assert out[3].lon_first == "1.5" and out[3].lat_last is None
    assert out[4].mf_type is None and out[4].n_points is None
    assert out[4].lon_first is None and out[4].lat_last is None


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
