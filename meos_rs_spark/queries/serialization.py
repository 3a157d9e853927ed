"""Serialization queries (SURVEY.md §1.2, §2.8 F1-F4).

WKT render/parse round-trip and MF-JSON are oracle-checked string pipelines;
WKB/HexWKB is binary (pandas_udf) with a driver rows-only check plus exact
golden bytes in tests/test_serde.py (mirroring the reference's golden-string
test style, tbox.rs:130-151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from meos_rs_spark.functions.determinism import fmt6_sql
from meos_rs_spark.functions.serde import (
    PARSE_WKT_DUCK,
    parse_point_wkt,
    point_hexwkb,
)
from meos_rs_spark.functions.trajectory import (
    POSITS_CTE,
    point_wkt,
    point_wkt_duck,
    posits,
)
from meos_rs_spark.registry import register


# --- F1/F2: WKT render → parse round-trip ----------------------------------


@register(
    "serde_wkt_roundtrip",
    oracle=f"""
WITH {POSITS_CTE},
rendered AS (
  SELECT mmsi, event_id, lon, lat, ts,
         {point_wkt_duck('lon', 'lat', 'ts')} AS wkt
  FROM posits
)
SELECT mmsi, event_id, wkt,
       {PARSE_WKT_DUCK['lon'].format(c='wkt')} AS lon_rt,
       {PARSE_WKT_DUCK['lat'].format(c='wkt')} AS lat_rt,
       epoch_us({PARSE_WKT_DUCK['ts'].format(c='wkt')}) AS ts_rt_us,
       CAST(({PARSE_WKT_DUCK['lon'].format(c='wkt')} = lon) AS INT) AS lon_exact
FROM rendered
""",
    tags=("F1", "F2"),
    doc="as_wkt → from_wkt round-trip on every posit (tinst.rs:21-38, tseq.rs:66-72); "
    "lon_exact flags lossless 6-digit round-trips (fixture doubles are 2-decimal → always 1)",
)
def serde_wkt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = posits(spark, sf_dir)
    rendered = pts.select(
        "mmsi", "event_id", "lon", "lat", "ts", point_wkt("lon", "lat", "ts").alias("wkt")
    )
    parsed = parse_point_wkt(F.col("wkt"))
    return rendered.select(
        "mmsi",
        "event_id",
        "wkt",
        parsed["lon"].alias("lon_rt"),
        parsed["lat"].alias("lat_rt"),
        F.expr("unix_micros(CAST(to_timestamp(regexp_extract(wkt, '@([0-9.: -]+)\\\\+00$', 1), "
               "'yyyy-MM-dd HH:mm:ss.SSSSSS') AS TIMESTAMP))").alias("ts_rt_us"),
        (parsed["lon"] == F.col("lon")).cast("int").alias("lon_exact"),
    )


# --- F3: MF-JSON -----------------------------------------------------------

_TS_ISO_SPARK = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
_TS_ISO_DUCK = "%Y-%m-%dT%H:%M:%S.%f"
_MF_LIMIT = 20  # first N instants per vessel keeps the JSON bounded


@register(
    "serde_mfjson",
    oracle=f"""
WITH {POSITS_CTE},
dedup AS (
  SELECT * FROM posits
  QUALIFY row_number() OVER (PARTITION BY mmsi, ts ORDER BY event_id) = 1
),
head AS (
  SELECT * FROM dedup
  QUALIFY row_number() OVER (PARTITION BY mmsi ORDER BY ts, event_id) <= {_MF_LIMIT}
)
SELECT mmsi,
  '{{"type":"MovingPoint","interpolation":"Linear","coordinates":['
  || string_agg('[' || {fmt6_sql('lon', 'duck')} || ',' || {fmt6_sql('lat', 'duck')} || ']', ',' ORDER BY ts)
  || '],"datetimes":['
  || string_agg('"' || strftime(ts, '{_TS_ISO_DUCK}') || 'Z"', ',' ORDER BY ts)
  || '],"lower_inc":true,"upper_inc":true}}' AS mfjson
FROM head GROUP BY mmsi
""",
    tags=("F3",),
    doc="temporal_as_mfjson with 6-digit precision (temp.rs:17-19,40-47); deterministic "
    "string assembly, valid JSON asserted in tests/test_serde.py",
)
def serde_mfjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meos_rs_spark.functions.trajectory import dedup_monotonic

    pts = dedup_monotonic(posits(spark, sf_dir))
    w = Window.partitionBy("mmsi").orderBy("ts", "event_id")
    pts = pts.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= _MF_LIMIT)
    agg = pts.groupBy("mmsi").agg(
        F.array_sort(F.collect_list(F.struct("ts", "lon", "lat"))).alias("points")
    )
    return agg.select("mmsi", _mfjson_sql_col().alias("mfjson"))


def _mfjson_sql_col():
    """MF-JSON via one SQL expression over the sorted points array —
    keeps the double rendering on the shared decimal-cast path."""
    f_lon = fmt6_sql("p.lon", "spark")
    f_lat = fmt6_sql("p.lat", "spark")
    return F.expr(
        "concat("
        "'{\"type\":\"MovingPoint\",\"interpolation\":\"Linear\",\"coordinates\":[',"
        f"array_join(transform(points, p -> concat('[', {f_lon}, ',', {f_lat}, ']')), ','),"
        "'],\"datetimes\":[',"
        # the pattern's 'T' literal needs doubled quotes inside the SQL string
        f"""array_join(transform(points, p -> concat('"', date_format(p.ts, '{_TS_ISO_SPARK.replace("'", "''")}'), 'Z"')), ','),"""
        "'],\"lower_inc\":true,\"upper_inc\":true}')"
    )


# --- F4: WKB / HexWKB (rows-only + golden pytest) --------------------------


@register(
    "serde_hexwkb",
    oracle=None,  # binary packing is not SQL-expressible; golden bytes in tests/test_serde.py
    tags=("F4",),
    doc="point → OGC HexWKB via Arrow-batched pandas_udf (temp.rs:30-38)",
)
def serde_hexwkb(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = posits(spark, sf_dir)
    return pts.select(
        "mmsi", "event_id", point_hexwkb(F.col("lon"), F.col("lat")).alias("hexwkb")
    )
