"""Trajectory-similarity queries (SURVEY.md L2g: Hausdorff / Fréchet / DTW).

Hausdorff = max over A of min over B of pointwise distance (symmetrized):
pure join/agg with a DuckDB twin. Fréchet/DTW are iterative DPs → grouped
applyInPandas (rows-only driver check; exact values pinned by golden tests
in tests/test_trajsim.py).

Pair domain is the first K vessels (K² pairs independent of sf); the
point-level join is bounded per pair by the max trip length, so the plan
is a bucketable pair join, not a global cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.functions.similarity import (
    convex_hull,
    dtw_distance,
    erp_distance,
    frechet_distance,
    lcss_similarity,
    polygon_area,
)
from meos_rs_spark.functions.trajectory import POSITS_XY_CTE, posits_xy
from meos_rs_spark.golden import GOLDEN
from meos_rs_spark.registry import register

K_VESSELS = 8


@register(
    "trajsim_hausdorff",
    oracle=f"""
WITH {POSITS_XY_CTE},
sel AS (SELECT mmsi, lon, lat FROM posits WHERE mmsi < {K_VESSELS}),
pairs AS (
  SELECT DISTINCT a.mmsi AS id_a, b.mmsi AS id_b
  FROM (SELECT DISTINCT mmsi FROM sel) a JOIN (SELECT DISTINCT mmsi FROM sel) b
    ON a.mmsi < b.mmsi
),
dists AS (
  SELECT p.id_a, p.id_b, pa.lon AS ax, pa.lat AS ay, pb.lon AS bx, pb.lat AS by,
         sqrt((pa.lon - pb.lon) * (pa.lon - pb.lon) + (pa.lat - pb.lat) * (pa.lat - pb.lat)) AS d
  FROM pairs p
  JOIN sel pa ON pa.mmsi = p.id_a
  JOIN sel pb ON pb.mmsi = p.id_b
),
ab AS (
  SELECT id_a, id_b, max(md) AS h_ab FROM (
    SELECT id_a, id_b, ax, ay, min(d) AS md FROM dists GROUP BY id_a, id_b, ax, ay
  ) GROUP BY id_a, id_b
),
ba AS (
  SELECT id_a, id_b, max(md) AS h_ba FROM (
    SELECT id_a, id_b, bx, by, min(d) AS md FROM dists GROUP BY id_a, id_b, bx, by
  ) GROUP BY id_a, id_b
)
SELECT ab.id_a, ab.id_b, greatest(ab.h_ab, ba.h_ba) AS hausdorff
FROM ab JOIN ba ON ba.id_a = ab.id_a AND ba.id_b = ab.id_b
""",
    tags=("L2g",),
    doc="symmetric Hausdorff via max-min joins (no DP needed → fully SQL-expressible; "
    "min/max aggs only, so no float-sum ordering hazards)",
)
def trajsim_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = posits_xy(spark, sf_dir).filter(F.col("mmsi") < K_VESSELS).select("mmsi", "lon", "lat")
    ids = sel.select("mmsi").distinct()
    pairs = (
        ids.select(F.col("mmsi").alias("id_a"))
        .join(ids.select(F.col("mmsi").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    pa = sel.select(F.col("mmsi").alias("id_a"), F.col("lon").alias("ax"), F.col("lat").alias("ay"))
    pb = sel.select(F.col("mmsi").alias("id_b"), F.col("lon").alias("bx"), F.col("lat").alias("by"))
    d = (
        pairs.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn(
            "d",
            F.sqrt(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            ),
        )
    )
    # ONE pass over the K²-point-pair matrix: the old twin aggregations
    # (group by a-point, group by b-point) hashed on different keys, so
    # ReuseExchange couldn't fire and the join + distance kernel — the
    # expensive stage — executed twice (r10 review find). Tagging each
    # matrix cell with both directed roles before aggregating keeps the
    # join single-execution; max over (role, point)-mins IS
    # greatest(h_ab, h_ba), so the final join disappears too.
    d2 = d.select(
        "id_a",
        "id_b",
        "d",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("role"),
                    F.col("ax").alias("px"),
                    F.col("ay").alias("py"),
                ),
                F.struct(
                    F.lit(1).alias("role"),
                    F.col("bx").alias("px"),
                    F.col("by").alias("py"),
                ),
            )
        ).alias("r"),
    )
    return (
        d2.groupBy("id_a", "id_b", "r.role", "r.px", "r.py")
        .agg(F.min("d").alias("md"))
        .groupBy("id_a", "id_b")
        .agg(F.max("md").alias("hausdorff"))
    )


# --- Fréchet / DTW via grouped DP ------------------------------------------

_DP_SCHEMA = "id_a long, id_b long, n_a long, n_b long, dtw double, frechet double"


def _pair_sides(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Split a tagged pair group into its two point arrays with the FULL
    deterministic sort key (ts alone would leave equal-ts row order
    partition-dependent) — ONE copy of the scaffold both DP kernels and
    tools/gen_golden.py must mirror (r10 review: the determinism fix had
    to be applied in two hand-copies)."""
    a = pdf[pdf["side"] == 0].sort_values(["ts", "lon", "lat"])[["lon", "lat"]].to_numpy(dtype=float)
    b = pdf[pdf["side"] == 1].sort_values(["ts", "lon", "lat"])[["lon", "lat"]].to_numpy(dtype=float)
    return a, b


def _pair_result(key, a, b, **metrics) -> pd.DataFrame:
    row = {"id_a": [key[0]], "id_b": [key[1]], "n_a": [len(a)], "n_b": [len(b)]}
    empty = len(a) == 0 or len(b) == 0
    for name, fn in metrics.items():
        row[name] = [np.nan if empty else fn(a, b)]
    return pd.DataFrame(row)


def _pair_dp(key, pdf: pd.DataFrame) -> pd.DataFrame:
    a, b = _pair_sides(pdf)
    return _pair_result(key, a, b, dtw=dtw_distance, frechet=frechet_distance)


@register(
    "trajsim_dtw_frechet",
    # O(n·m) dynamic programs — not SQL-expressible; the oracle is a
    # VALUES-literal golden computed Spark-free at sf0.01 (tools/gen_golden.py)
    oracle=GOLDEN.get("trajsim_dtw_frechet"),
    tags=("L2g", "golden"),
    doc="discrete Fréchet + DTW per vessel pair via applyInPandas (numpy DP per group, "
    "pair-bucketed shuffle — the SURVEY §2.10 grouped-UDAF surface)",
)
def trajsim_dtw_frechet(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = posits_xy(spark, sf_dir).filter(F.col("mmsi") < K_VESSELS).select("mmsi", "ts", "lon", "lat")
    ids = sel.select("mmsi").distinct()
    pairs = (
        ids.select(F.col("mmsi").alias("id_a"))
        .join(ids.select(F.col("mmsi").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    side_a = pairs.join(sel, pairs.id_a == sel.mmsi).select(
        "id_a", "id_b", F.lit(0).alias("side"), "ts", "lon", "lat"
    )
    side_b = pairs.join(sel, pairs.id_b == sel.mmsi).select(
        "id_a", "id_b", F.lit(1).alias("side"), "ts", "lon", "lat"
    )
    tagged = side_a.unionByName(side_b)
    return tagged.groupBy("id_a", "id_b").applyInPandas(_pair_dp, schema=_DP_SCHEMA)


# --- L2: nearest-approach distance ------------------------------------------


@register(
    "trajsim_nearest_approach",
    oracle=f"""
WITH {POSITS_XY_CTE},
sel AS (SELECT mmsi, lon, lat FROM posits WHERE mmsi < {K_VESSELS}),
pairs AS (
  SELECT a.mmsi AS id_a, b.mmsi AS id_b,
         sqrt((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)) AS d
  FROM sel a JOIN sel b ON a.mmsi < b.mmsi
)
SELECT id_a, id_b, min(d) AS nad
FROM pairs GROUP BY id_a, id_b
""",
    tags=("L2g", "L2d"),
    doc="nearest-approach distance between trajectory pairs (L2 nad_tpoint_tpoint): "
    "min pointwise distance; min-agg only, no float-sum hazards",
)
def trajsim_nearest_approach(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same shape as trajsim_hausdorff: the only non-equi join is the tiny
    # distinct-id pair build (K² rows); points attach via equi-joins on the
    # vessel id, so the plan never nested-loops over point-level rows
    # (the r2 version's `a.join(b, id_a < id_b)` over points planned as a
    # BroadcastNestedLoopJoin quadratic in total points).
    sel = posits_xy(spark, sf_dir).filter(F.col("mmsi") < K_VESSELS).select("mmsi", "lon", "lat")
    ids = sel.select("mmsi").distinct()
    pairs = (
        ids.select(F.col("mmsi").alias("id_a"))
        .join(ids.select(F.col("mmsi").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    pa = sel.select(F.col("mmsi").alias("id_a"), F.col("lon").alias("ax"), F.col("lat").alias("ay"))
    pb = sel.select(F.col("mmsi").alias("id_b"), F.col("lon").alias("bx"), F.col("lat").alias("by"))
    return (
        pairs.join(pa, "id_a")
        .join(pb, "id_b")
        .withColumn(
            "d",
            F.sqrt(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            ),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("d").alias("nad"))
    )


# --- L2: nearest-approach INSTANT (synchronized at hour granularity) --------


_RESAMPLE_CTE = f"""
res AS (
  SELECT mmsi, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(lon AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS cx,
         CAST(SUM(CAST(lat AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS cy
  FROM posits WHERE mmsi < {K_VESSELS}
  GROUP BY mmsi, date_trunc('hour', ts)
)
"""


def _resampled_sides(spark: SparkSession, sf_dir: str):
    """The hour-bucket resample (tprecision + twavg per bucket, exact-
    decimal means) and its two join-side projections — ONE construction
    for the three synchronized-pair queries (nearest_instant, tdwithin,
    tdistance), in lockstep with _RESAMPLE_CTE above; the three private
    copies could drift independently (r10 review find)."""
    from meos_rs_spark.functions.determinism import money_sum

    n = F.count(F.lit(1))
    res = (
        posits_xy(spark, sf_dir)
        .filter(F.col("mmsi") < K_VESSELS)
        .groupBy("mmsi", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"))
        .agg((money_sum("lon") / n).alias("cx"), (money_sum("lat") / n).alias("cy"))
    )
    a = res.select(
        F.col("mmsi").alias("id_a"), "bucket",
        F.col("cx").alias("ax"), F.col("cy").alias("ay"),
    )
    b = res.select(
        F.col("mmsi").alias("id_b"), F.col("bucket").alias("bucket_b"),
        F.col("cx").alias("bx"), F.col("cy").alias("by"),
    )
    return a, b


@register(
    "trajsim_nearest_instant",
    oracle=f"""
WITH {POSITS_XY_CTE},
{_RESAMPLE_CTE},
d AS (
  SELECT a.mmsi AS id_a, b.mmsi AS id_b, a.bucket,
         sqrt((a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy)) AS dist
  FROM res a JOIN res b ON a.bucket = b.bucket AND a.mmsi < b.mmsi
)
SELECT id_a, id_b, bucket AS t_nearest, dist AS nad_sync
FROM d
QUALIFY row_number() OVER (PARTITION BY id_a, id_b ORDER BY dist, bucket) = 1
""",
    tags=("L2g", "L2d"),
    doc="nearest-approach INSTANT (L2 nai_tpoint_tpoint): trajectories are "
    "synchronized by hour-bucket resampling (tprecision + twavg per bucket — "
    "exact-decimal means, one double division), pairs meet via an EQUI-join on "
    "the bucket (never a point-level theta join), and the argmin instant per "
    "pair is a row_number window with a total (dist, bucket) tiebreak",
)
def trajsim_nearest_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _resampled_sides(spark, sf_dir)
    d = a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b"))).withColumn(
        "dist",
        F.sqrt(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        ),
    )
    from pyspark.sql import Window

    # NULLS LAST to match DuckDB's default (Spark ASC defaults to NULLS
    # FIRST): a bucket whose coords are all NULL yields dist NULL, which
    # must LOSE the argmin in both engines, not win Spark's rank 1
    # (r10 review find; latent while posits carry no NULL coords)
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("dist").asc_nulls_last(), F.col("bucket").asc_nulls_last()
    )
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id_a", "id_b", F.col("bucket").alias("t_nearest"), F.col("dist").alias("nad_sync"))
    )


# --- L2: temporal within-distance predicate (tdwithin summary) --------------

D_WITHIN = 50.0


@register(
    "trajsim_tdwithin",
    oracle=f"""
WITH {POSITS_XY_CTE},
{_RESAMPLE_CTE},
d AS (
  SELECT a.mmsi AS id_a, b.mmsi AS id_b, a.bucket,
         CASE WHEN sqrt((a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy))
                   < {D_WITHIN} THEN 1 ELSE 0 END AS within
  FROM res a JOIN res b ON a.bucket = b.bucket AND a.mmsi < b.mmsi
)
SELECT id_a, id_b,
       count(*) AS n_sync,
       CAST(SUM(within) AS BIGINT) AS n_within,
       min(bucket) FILTER (WHERE within = 1) AS t_first_within
FROM d GROUP BY id_a, id_b
""",
    tags=("L2g", "L2f"),
    doc=f"tdwithin (L2 tdwithin_tpoint_tpoint) summarized: the temporal boolean "
    f"'pair within {D_WITHIN} units' sampled at hour buckets — per pair the count "
    "of synchronized instants, how many are within range, and the first such "
    "instant; same bucket equi-join shape as trajsim_nearest_instant",
)
def trajsim_tdwithin(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _resampled_sides(spark, sf_dir)
    within = F.when(
        F.sqrt(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        )
        < D_WITHIN,
        1,
    ).otherwise(0)
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("within", within)
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_sync"),
            F.sum("within").alias("n_within"),
            F.min(F.when(F.col("within") == 1, F.col("bucket"))).alias("t_first_within"),
        )
    )


# --- L2: temporal distance between moving points ----------------------------


@register(
    "trajsim_tdistance",
    oracle=f"""
WITH {POSITS_XY_CTE},
{_RESAMPLE_CTE},
d AS (
  SELECT a.mmsi AS id_a, b.mmsi AS id_b, a.bucket,
         sqrt((a.cx - b.cx) * (a.cx - b.cx) + (a.cy - b.cy) * (a.cy - b.cy)) AS dist
  FROM res a JOIN res b ON a.bucket = b.bucket AND a.mmsi < b.mmsi
)
SELECT id_a, id_b, bucket, dist FROM d
""",
    tags=("L2g", "L2d"),
    doc="temporal distance (L2 tdistance_tpoint_tpoint): the distance-over-time "
    "sequence itself, one row per synchronized hour instant per pair — "
    "nearest_instant and tdwithin are reductions of this sequence; bucket "
    "equi-join, never a point-level theta join",
)
def trajsim_tdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _resampled_sides(spark, sf_dir)
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a", "id_b", "bucket",
            F.sqrt(
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            ).alias("dist"),
        )
    )


# --- LCSS / ERP via grouped DP ----------------------------------------------

LCSS_EPS = 25.0  # ground-distance match radius (posit lon spans ~0-330, lat 0-99)

_LCSS_SCHEMA = "id_a long, id_b long, n_a long, n_b long, lcss_sim double, erp double"


def _pair_lcss_erp(key, pdf: pd.DataFrame) -> pd.DataFrame:
    a, b = _pair_sides(pdf)
    return _pair_result(
        key, a, b,
        lcss_sim=lambda x, y: lcss_similarity(x, y, LCSS_EPS),
        erp=lambda x, y: erp_distance(x, y, np.zeros(2)),
    )


@register(
    "trajsim_lcss_erp",
    # O(n·m) dynamic programs — not SQL-expressible; the oracle is a
    # VALUES-literal golden computed Spark-free at sf0.01 (tools/gen_golden.py)
    oracle=GOLDEN.get("trajsim_lcss_erp"),
    tags=("L2g", "golden"),
    doc=f"LCSS similarity (eps={LCSS_EPS}, outlier-robust) + ERP distance "
    "(gap-point origin; a true metric, so it can power metric-tree pruning) "
    "per vessel pair — completes the DP similarity family next to "
    "DTW/Fréchet; same bounded-pair-list equi-join shape + applyInPandas "
    "(numpy DP per pair group), so the shuffle is K² pair tags of the "
    "bounded vessel subset, never an all-points nested loop",
)
def trajsim_lcss_erp(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = posits_xy(spark, sf_dir).filter(F.col("mmsi") < K_VESSELS).select("mmsi", "ts", "lon", "lat")
    ids = sel.select("mmsi").distinct()
    pairs = (
        ids.select(F.col("mmsi").alias("id_a"))
        .join(ids.select(F.col("mmsi").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    side_a = pairs.join(sel, pairs.id_a == sel.mmsi).select(
        "id_a", "id_b", F.lit(0).alias("side"), "ts", "lon", "lat"
    )
    side_b = pairs.join(sel, pairs.id_b == sel.mmsi).select(
        "id_a", "id_b", F.lit(1).alias("side"), "ts", "lon", "lat"
    )
    tagged = side_a.unionByName(side_b)
    return tagged.groupBy("id_a", "id_b").applyInPandas(_pair_lcss_erp, schema=_LCSS_SCHEMA)


# --- traversed-area convex hull (grouped geometry DP) -----------------------

_HULL_SCHEMA = "mmsi long, n_points long, n_hull_vertices long, hull_area double, hull_wkt string"


def _vessel_hull(key, pdf: pd.DataFrame) -> pd.DataFrame:
    pts = pdf[["lon", "lat"]].to_numpy(dtype=float)
    h = convex_hull(pts)
    area = polygon_area(h)
    ring = ", ".join(f"{x:.6f} {y:.6f}" for x, y in h)
    closing = f", {h[0][0]:.6f} {h[0][1]:.6f}" if len(h) >= 3 else ""
    return pd.DataFrame(
        {
            "mmsi": [key[0]],
            "n_points": [len(pts)],
            "n_hull_vertices": [len(h)],
            "hull_area": [area],
            "hull_wkt": [f"POLYGON(({ring}{closing}))"],
        }
    )


@register(
    "traj_convex_hull",
    # iterative geometry (monotone chain) — the oracle is a VALUES-literal
    # golden computed Spark-free at sf0.01 (tools/gen_golden.py)
    oracle=GOLDEN.get("traj_convex_hull"),
    tags=("L2d", "golden"),
    doc="traversed-area convex hull per vessel (the tpoint traversed-area / "
    "ST_ConvexHull analog): Andrew's monotone chain + shoelace area in a "
    "grouped applyInPandas — per-vessel point sets are bounded, so the DP "
    "family's bucketed-group shape applies; hull rendered as POLYGON WKT "
    "with 6-digit vertices. Golden tests pin square/triangle/collinear "
    "hulls; invariants check hull area <= bbox area and vertex bounds.",
)
def traj_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meos_rs_spark.functions.staging import fan_out

    # forced fan_out before the groupBy — same serial-Python hazard as
    # traj_simplify_dp: the 3-column projection is small enough for AQE to
    # coalesce the group exchange to ~1 partition, serializing the
    # per-vessel hull calls (r8 sweep: 51s at ×10 for a seconds-scale
    # kernel); the keyed user repartition is AQE-exempt and feeds the
    # groupBy's distribution directly. force=True: the hazard is the group
    # exchange's size, not the scan's split count.
    return (
        fan_out(posits_xy(spark, sf_dir).select("mmsi", "lon", "lat"), "mmsi", force=True)
        .groupBy("mmsi")
        .applyInPandas(_vessel_hull, schema=_HULL_SCHEMA)
    )
