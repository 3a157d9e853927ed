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
from pyspark.sql.types import BinaryType, StringType

# point-instant WKT: POINT(lon lat)@yyyy-MM-dd HH:mm:ss.SSSSSS+00
_WKT_RE = r"^POINT\(([-0-9.]+) ([-0-9.]+)\)@([0-9]{4}-[0-9]{2}-[0-9]{2} [0-9:.]+)\+00$"


def parse_point_wkt(col: Column) -> Column:
    """F1: instant WKT → struct(lon, lat, ts) (tgeompoint_in, tinst.rs:21-38)."""
    return F.struct(
        F.regexp_extract(col, _WKT_RE, 1).cast("double").alias("lon"),
        F.regexp_extract(col, _WKT_RE, 2).cast("double").alias("lat"),
        F.to_timestamp(
            F.regexp_extract(col, _WKT_RE, 3), "yyyy-MM-dd HH:mm:ss.SSSSSS"
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
