"""Box-algebra queries (SURVEY.md §2.8 F8-F10, §2.3 J5).

TBoxes are built per event_type (a small, sf-independent domain: the
predicate matrix stays 8×8 at any scale), STBoxes per vessel. The J5
overlap join demonstrates the 100 TB shape: grid-bucket each box, explode
spanned cells, equi-join on cell, dedup, refine with the exact predicate —
never a cartesian product. The DuckDB twin runs the quadratic theta join
(fine at oracle scale) and must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.functions.boxes import (
    int_to_tbox_wkt,
    stbox_overlaps,
    tbox,
    tbox_cmp,
    tbox_contains,
    tbox_overlaps,
    tbox_pred_sql,
    tbox_same,
)
from meos_rs_spark.functions.trajectory import POSITS_CTE, posits
from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table

_TYPE_BOX_CTE = """
boxes AS (
  SELECT event_type,
         min(value) AS xmin, max(value) AS xmax,
         min(ts) AS tmin, max(ts) AS tmax
  FROM events GROUP BY event_type
)
"""

_PRED = tbox_pred_sql("a", "b")


# --- F8/F9: predicate matrix ----------------------------------------------


@register(
    "box_tbox_predicates",
    oracle=f"""
WITH {_TYPE_BOX_CTE}
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(({_PRED['contains']}) AS INT) AS contains,
       CAST(({_PRED['overlaps']}) AS INT) AS overlaps,
       CAST(({_PRED['same']}) AS INT) AS same,
       CASE WHEN a.xmin < b.xmin THEN -1 WHEN a.xmin > b.xmin THEN 1
            WHEN a.xmax < b.xmax THEN -1 WHEN a.xmax > b.xmax THEN 1
            WHEN a.tmin < b.tmin THEN -1 WHEN a.tmin > b.tmin THEN 1
            WHEN a.tmax < b.tmax THEN -1 WHEN a.tmax > b.tmax THEN 1
            ELSE 0 END AS cmp
FROM boxes a CROSS JOIN boxes b
""",
    tags=("F8", "F9"),
    doc="contains/overlaps/same/cmp truth matrix over per-event-type TBoxes "
    "(tbox.rs:100-110,46-57; truth tables tbox.rs:153-195). Domain is the "
    "event-type dimension — 8×8 pairs regardless of data scale.",
)
def box_tbox_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    boxes = ev.groupBy("event_type").agg(
        F.min("value").alias("xmin"),
        F.max("value").alias("xmax"),
        F.min("ts").alias("tmin"),
        F.max("ts").alias("tmax"),
    )
    a = boxes.select(F.col("event_type").alias("type_a"), tbox(
        F.col("xmin"), F.col("xmax"), F.col("tmin"), F.col("tmax")).alias("a"))
    b = boxes.select(F.col("event_type").alias("type_b"), tbox(
        F.col("xmin"), F.col("xmax"), F.col("tmin"), F.col("tmax")).alias("b"))
    ca, cb = F.col("a"), F.col("b")
    return a.crossJoin(F.broadcast(b)).select(
        "type_a",
        "type_b",
        tbox_contains(ca, cb).cast("int").alias("contains"),
        tbox_overlaps(ca, cb).cast("int").alias("overlaps"),
        tbox_same(ca, cb).cast("int").alias("same"),
        tbox_cmp(ca, cb).alias("cmp"),
    )


# --- F10: int → degenerate TBox + canonical WKT ----------------------------


@register(
    "box_int_to_tbox",
    oracle="""
SELECT DISTINCT p_size AS v,
       'TBOXINT X([' || CAST(p_size AS VARCHAR) || ', ' || CAST(p_size + 1 AS VARCHAR) || '))' AS tbox_wkt
FROM part
""",
    tags=("F10", "F2"),
    doc="int_to_tbox constructor + canonical right-open WKT (tbox.rs:87-98)",
)
def box_int_to_tbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(F.col("p_size").alias("v")).distinct().select(
        "v", int_to_tbox_wkt(F.col("v")).alias("tbox_wkt")
    )


# --- J5: STBox overlap join, grid-bucketed ---------------------------------

_CELL = 50.0

_STBOX_CTE = f"""
{POSITS_CTE},
vbox AS (
  SELECT mmsi,
         min(lon) AS xmin, max(lon) AS xmax,
         min(lat) AS ymin, max(lat) AS ymax,
         min(ts) AS tmin, max(ts) AS tmax
  FROM posits GROUP BY mmsi
)
"""


@register(
    "box_stbox_overlap_join",
    oracle=f"""
WITH {_STBOX_CTE}
SELECT a.mmsi AS mmsi_a, b.mmsi AS mmsi_b
FROM vbox a JOIN vbox b
  ON a.mmsi < b.mmsi
 AND a.xmin <= b.xmax AND b.xmin <= a.xmax
 AND a.ymin <= b.ymax AND b.ymin <= a.ymax
 AND a.tmin <= b.tmax AND b.tmin <= a.tmax
""",
    tags=("J5",),
    doc="interval/box-overlap join. Spark side is the scale shape: explode each box "
    "into spanned grid cells, equi-join on cell, dedup pairs, refine exact overlap "
    "(SURVEY §2.3 J5); oracle runs the quadratic theta join.",
)
def box_stbox_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    vbox = (
        posits(spark, sf_dir)
        .groupBy("mmsi")
        .agg(
            F.min("lon").alias("xmin"),
            F.max("lon").alias("xmax"),
            F.min("lat").alias("ymin"),
            F.max("lat").alias("ymax"),
            F.min("ts").alias("tmin"),
            F.max("ts").alias("tmax"),
        )
    )
    cells = vbox.withColumn(
        "cell",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(CAST(floor(xmin/{_CELL}) AS INT), CAST(floor(xmax/{_CELL}) AS INT)), "
                f"cx -> transform(sequence(CAST(floor(ymin/{_CELL}) AS INT), CAST(floor(ymax/{_CELL}) AS INT)), "
                f"cy -> struct(cx, cy))))"
            )
        ),
    )
    a = cells.select(F.col("mmsi").alias("mmsi_a"), F.col("cell").alias("cell_a"), F.struct(
        "xmin", "xmax", "ymin", "ymax", "tmin", "tmax").alias("a"))
    b = cells.select(F.col("mmsi").alias("mmsi_b"), F.col("cell").alias("cell_b"), F.struct(
        "xmin", "xmax", "ymin", "ymax", "tmin", "tmax").alias("b"))
    pairs = (
        a.join(b, (a.cell_a == b.cell_b) & (a.mmsi_a < b.mmsi_b))
        .filter(stbox_overlaps(F.col("a"), F.col("b")))
        .select("mmsi_a", "mmsi_b")
        .distinct()
    )
    return pairs
