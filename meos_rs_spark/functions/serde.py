"""Serialization (SURVEY.md §1.2, §2.8 F1-F4): WKT, MF-JSON, WKB/HexWKB.

Reference surface being reproduced:
  * WKT in/out — ``meos/src/tinst.rs:21-38``, ``tseq.rs:22-42,66-72``
    (six golden forms in ``meos/examples/01_hello_world.rs:7-56``)
  * MF-JSON out, 6-digit precision — ``meos/src/temp.rs:17-19,40-47``
  * WKB (extended) / HexWKB out — ``meos/src/temp.rs:21-38``;
    ingest twin ``tgeompointFromBinary`` — ``ais_to_db.rs:160``

WKT and MF-JSON are built/parsed with built-in string Columns (JVM-side,
oracle-checkable). WKB is genuinely binary: a vectorized pandas_udf packs
IEEE doubles little-endian — the one place Python is warranted, Arrow-
batched, never row-at-a-time.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# point-instant WKT: POINT(lon lat)@yyyy-MM-dd HH:mm:ss.SSSSSS+00
_WKT_RE = r"^POINT\(([-0-9.]+) ([-0-9.]+)\)@([0-9]{4}-[0-9]{2}-[0-9]{2} [0-9:.]+)\+00$"


def parse_point_wkt(col: Column) -> Column:
    """F1: instant WKT → struct(lon, lat, ts) (tgeompoint_in, tinst.rs:21-38).

    Total under Spark 4's default ANSI mode: a malformed or variant input
    yields a NULL-field struct instead of aborting the job — regexp_extract
    returns '' on no match, and CAST''/to_timestamp'' RAISE under ANSI
    (review find, r7; reproduced live on 'garbage' and on a timestamp
    without the 6-digit fraction). try_cast/try_to_timestamp give the
    tolerant tgeompoint_in semantics the malformed-ingest query relies on;
    well-formed inputs parse identically."""
    return F.struct(
        F.regexp_extract(col, _WKT_RE, 1).try_cast("double").alias("lon"),
        F.regexp_extract(col, _WKT_RE, 2).try_cast("double").alias("lat"),
        F.try_to_timestamp(
            F.regexp_extract(col, _WKT_RE, 3), F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")
        ).cast("timestamp_ntz").alias("ts"),
    )


PARSE_WKT_DUCK = {
    "lon": r"CAST(regexp_extract({c}, '^POINT\(([-0-9.]+) ', 1) AS DOUBLE)",
    "lat": r"CAST(regexp_extract({c}, '^POINT\([-0-9.]+ ([-0-9.]+)\)', 1) AS DOUBLE)",
    "ts": (
        r"strptime(regexp_extract({c}, '@([0-9.: -]+)\+00$', 1), "
        r"'%Y-%m-%d %H:%M:%S.%f')"
    ),
}


# MF-JSON (F3) is assembled in queries/serialization.py as one SQL expression
# over the sorted points array so the double rendering shares the decimal-cast
# determinism path.

# --- WKB / HexWKB -----------------------------------------------------------

_WKB_POINT_TYPE = 1  # OGC Point


def _pack_point(lon: float, lat: float) -> bytes:
    # little-endian flag + uint32 type + 2 IEEE-754 doubles (OGC WKB point)
    return struct.pack("<BI2d", 1, _WKB_POINT_TYPE, lon, lat)


# DataType objects (not DDL strings) so the decorators work at import time
# without an active SparkSession (string types trigger a context-dependent
# DDL parse in pyspark 4).


@pandas_udf(BinaryType())
def point_wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """F4: point → OGC WKB bytes (temporal_as_wkb, temp.rs:21-28), vectorized
    over Arrow batches."""
    return pd.Series([_pack_point(x, y) for x, y in zip(lon, lat)])


@pandas_udf(StringType())
def point_hexwkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """F4: HexWKB text (temporal_as_hexwkb, temp.rs:30-38)."""
    return pd.Series([_pack_point(x, y).hex().upper() for x, y in zip(lon, lat)])


# --- trajectory (sequence) WKB ----------------------------------------------
#
# The reference serializes WHOLE temporal sequences as (hex)WKB
# (temporal_as_wkb / temporal_as_hexwkb with WKB_EXTENDED, meos/src/
# temp.rs:21-38; files written in meos/examples/04_to_file.rs:138-141) and
# ingests WKB back (tgeompointFromBinary, meos-polars/examples/
# ais_to_db.rs:160). Layout here is little-endian OGC-extended style:
#
#   u8  endianness        0x01 (little)
#   u32 type              OGC Point (1) | 0x20000000 temporal-sequence flag
#   u8  flags             bit0 lower_inc, bit1 upper_inc, bit2 linear interp
#   i32 n_instants
#   n × (f64 lon, f64 lat, i64 ts_epoch_micros)
#
# so a sequence occupies exactly 10 + 24·n bytes — a property the
# serde_wkb_roundtrip oracle checks arithmetically.

_WKB_TSEQ_TYPE = 0x20000000 | _WKB_POINT_TYPE
_FLAG_LOWER = 0x01
_FLAG_UPPER = 0x02
_FLAG_LINEAR = 0x04
TRAJ_WKB_HEADER_BYTES = 10
TRAJ_WKB_POINT_BYTES = 24


def _pack_traj(ts_us, lon, lat, lower_inc: bool, upper_inc: bool, interp: str) -> bytes:
    flags = (
        (_FLAG_LOWER if lower_inc else 0)
        | (_FLAG_UPPER if upper_inc else 0)
        | (_FLAG_LINEAR if interp == "Linear" else 0)
    )
    parts = [struct.pack("<BIBi", 1, _WKB_TSEQ_TYPE, flags, len(ts_us))]
    parts.extend(struct.pack("<ddq", x, y, int(t)) for t, x, y in zip(ts_us, lon, lat))
    return b"".join(parts)


@pandas_udf(BinaryType())
def traj_wkb(
    ts_us: pd.Series,
    lon: pd.Series,
    lat: pd.Series,
    lower_inc: pd.Series,
    upper_inc: pd.Series,
    interp: pd.Series,
) -> pd.Series:
    """Sequence → WKB bytes (temporal_as_wkb, temp.rs:21-28), Arrow-batched;
    ts/lon/lat arrive as parallel arrays (JVM-side transforms of the points
    array, so the struct never crosses the Arrow boundary)."""
    return pd.Series(
        [
            _pack_traj(t, x, y, lo, up, it)
            for t, x, y, lo, up, it in zip(ts_us, lon, lat, lower_inc, upper_inc, interp)
        ]
    )


TRAJ_WKB_PARSED = StructType(
    [
        StructField("interp", StringType()),
        StructField("lower_inc", BooleanType()),
        StructField("upper_inc", BooleanType()),
        StructField("ts_us", ArrayType(LongType())),
        StructField("lon", ArrayType(DoubleType())),
        StructField("lat", ArrayType(DoubleType())),
    ]
)


@pandas_udf(TRAJ_WKB_PARSED)
def traj_from_wkb(wkb: pd.Series) -> pd.DataFrame:
    """WKB → sequence fields (tgeompointFromBinary analog, ais_to_db.rs:160).

    Returns struct-of-arrays; callers rebuild the points array JVM-side with
    arrays_zip (functions like num_instants/start_ts then work unchanged).
    """
    out = {"interp": [], "lower_inc": [], "upper_inc": [], "ts_us": [], "lon": [], "lat": []}
    for buf in wkb:
        buf = bytes(buf)
        endian, typ, flags, n = struct.unpack_from("<BIBi", buf, 0)
        if endian != 1 or typ != _WKB_TSEQ_TYPE:
            raise ValueError(f"not a little-endian temporal-sequence WKB (type={typ:#x})")
        ts, xs, ys = [], [], []
        off = TRAJ_WKB_HEADER_BYTES
        for _ in range(n):
            x, y, t = struct.unpack_from("<ddq", buf, off)
            off += TRAJ_WKB_POINT_BYTES
            xs.append(x)
            ys.append(y)
            ts.append(t)
        out["interp"].append("Linear" if flags & _FLAG_LINEAR else "Step")
        out["lower_inc"].append(bool(flags & _FLAG_LOWER))
        out["upper_inc"].append(bool(flags & _FLAG_UPPER))
        out["ts_us"].append(ts)
        out["lon"].append(xs)
        out["lat"].append(ys)
    return pd.DataFrame(out)
