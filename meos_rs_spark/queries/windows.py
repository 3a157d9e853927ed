"""Window functions (SURVEY.md §2.5: W, P4 lag-dedup, P5 row_number-truncate).

The reference's row path IS window logic: the monotonic dedup
(``meos/examples/04_to_file.rs:92-96``) and the max-trip-size cutoff
(``ais_to_db.rs:191-193``) are lag/row_number over (vessel, ts). Here they
are named operators plus the standard ranking/analytic/frame battery.

All window shuffles partition on user_id — the same single shuffle a
groupBy would need; frames are bounded (ROWS BETWEEN) so state per group
is O(frame), safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# --- P4: monotonic-timestamp dedup as a named operator ---------------------


@register(
    "win_lag_dedup",
    oracle="""
SELECT event_id, user_id, ts, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
""",
    tags=("P4", "W"),
    doc="keep only posits that strictly advance the clock (04_to_file.rs:92-96)",
)
def win_lag_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the named-operator face of functions.trajectory.dedup_monotonic —
    # reusing it picks up the null-safe comparison (a NULL ts must compare
    # EQUAL to a NULL predecessor to match the QUALIFY twin's PARTITION BY
    # user_id, ts, which keeps exactly one NULL-ts row; the old inline
    # lag-form here kept them all — latent while events.ts is non-null)
    from meos_rs_spark.functions.trajectory import dedup_monotonic

    return dedup_monotonic(_events(spark, sf_dir), key="user_id").select(
        "event_id", "user_id", "ts", "value"
    )


# --- P5: truncate group to max size ----------------------------------------


@register(
    "win_rownum_truncate",
    oracle="""
SELECT user_id, ts, event_id FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 5
""",
    tags=("P5", "W"),
    doc="first max_trip_size posits per vessel (ais_to_db.rs:191-193)",
)
def win_rownum_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .select("user_id", "ts", "event_id")
    )


# --- ranking ---------------------------------------------------------------


@register(
    "win_rank_dense",
    oracle="""
SELECT user_id, event_id, value,
       rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
       dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS drnk
FROM events
QUALIFY rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) <= 3
""",
    tags=("W",),
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        _events(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            "value",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


# --- lag/lead: inter-event gaps --------------------------------------------


@register(
    "win_lead_gap",
    oracle="""
SELECT user_id, event_id,
       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
FROM events
QUALIFY lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
""",
    tags=("W",),
    doc="time-to-next-posit per vessel in exact integer micros",
)
def win_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    # gap derived from the ONE lead column — the old duplicate SQL-string
    # window spec could silently drift from `w` (r10 review find)
    gap_us = F.expr("unix_micros(CAST(__nxt AS TIMESTAMP))") - F.expr(
        "unix_micros(CAST(ts AS TIMESTAMP))"
    )
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_id", "ts", nxt.alias("__nxt"))
        .filter(F.col("__nxt").isNotNull())
        .select("user_id", "event_id", gap_us.alias("gap_us"))
    )


# --- frames: bounded rolling aggregate -------------------------------------


@register(
    "win_rolling_frame",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum5,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rolling_n5
FROM events
""",
    tags=("W",),
    doc="bounded ROWS frame (O(frame) state per group at any scale)",
)
def win_rolling_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_sum5"),
        F.count(F.lit(1)).over(w).alias("rolling_n5"),
    )


# --- running (cumulative) aggregate ----------------------------------------


@register(
    "win_running_total",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
""",
    tags=("W",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
        F.row_number().over(ws).alias("seq"),
    )


# --- analytic: ntile / first / last ----------------------------------------


@register(
    "win_ntile_first_last",
    oracle="""
SELECT user_id, event_id,
       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile,
       first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
FROM events
""",
    tags=("W",),
)
def win_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.ntile(4).over(wo).alias("quartile"),
        F.first("event_id").over(wf).alias("first_event"),
        F.last("event_id").over(wf).alias("last_event"),
    )


# --- analytic: relative-position functions ----------------------------------


@register(
    "win_percent_rank_cume",
    oracle="""
SELECT user_id, event_id,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value NULLS LAST, event_id) AS pct_rank,
       cume_dist() OVER (PARTITION BY user_id ORDER BY value NULLS LAST, event_id) AS cume,
       CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_in_group
FROM events
""",
    tags=("W",),
    doc="relative-position analytics: percent_rank and cume_dist per user over "
    "the value ordering (total tiebreak on event_id so both engines rank "
    "identically; NULLS LAST pinned in BOTH legs — Spark ASC defaults NULLS "
    "FIRST vs DuckDB's NULLS LAST, a live rank divergence on any NULL-"
    "bearing fixture, r11 review); the fractions are exact ratios of "
    "integer ranks, so the doubles hash cross-engine",
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    wo = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    wp = Window.partitionBy("user_id")
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.percent_rank().over(wo).alias("pct_rank"),
        F.cume_dist().over(wo).alias("cume"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n_in_group"),
    )


# --- time-based RANGE frame --------------------------------------------------


@register(
    "win_range_interval",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
FROM events
""",
    tags=("W",),
    doc="time-based RANGE frame: per user, the trailing 1-hour sum/count at "
    "every event — the frame is defined by the ORDER value (epoch micros), "
    "not row position, so peers at the same instant are included identically "
    "in both engines and late-arriving density changes the frame width, not "
    "the semantics; exact-decimal sums keep the fold associative",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.alias("__us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


# --- event-transition matrix (first-order Markov counts) --------------------


@register(
    "win_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    tags=("W", "behavioral"),
    doc="first-order transition matrix (the Markov-chain counts behind "
    "next-action prediction and session modeling): lead() over each user's "
    "event sequence, then a global (from, to) rollup — one user-key shuffle "
    "for the window plus one bounded |types|^2 aggregate",
)
def win_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# --- running distinct count (first-occurrence flag + running sum) -----------


@register(
    "win_running_distinct",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_distinct_types_so_far
FROM flagged
""",
    tags=("W",),
    doc="running COUNT(DISTINCT) over a window — not directly expressible "
    "(DISTINCT aggregates are illegal in window frames in both engines), so "
    "it's decomposed into the scalable idiom: flag each (user, type)'s first "
    "occurrence with row_number, then running-sum the flags. Two windows "
    "over the same user-key shuffle, O(1) state per row vs the naive "
    "collect_set's O(distinct) — the difference between a window that runs "
    "at 100 TB and one that OOMs.",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _events(spark, sf_dir)
        .select(
            "user_id", "ts", "event_id",
            F.when(F.row_number().over(wf) == 1, 1).otherwise(0).alias("first_seen"),
        )
        .select(
            "user_id", "event_id",
            F.sum("first_seen").over(wr).cast("bigint").alias("n_distinct_types_so_far"),
        )
    )


# --- frames: rolling median (order statistic over a bounded frame) ----------


@register(
    "win_rolling_median",
    oracle="""
WITH framed AS (
  SELECT user_id, event_id, value,
         -- FILTER mirrors Spark collect_list, which DROPS NULL values
         -- from the frame while DuckDB's list() keeps them (r10 review
         -- find; frame_n and the median rank diverged on any NULL value)
         list(value) FILTER (WHERE value IS NOT NULL)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS frame
  FROM events
)
SELECT user_id, event_id, value,
       COALESCE(len(frame), 0) AS frame_n,
       list_sort(frame)[(len(frame) + 1) // 2] AS med9
FROM framed
""",
    tags=("W", "robust"),
    doc="rolling median over a trailing 9-row frame — the robust-smoothing "
    "order statistic a rolling mean can't give you (sensor despiking, "
    "anomaly baselines). The frame is collected as a bounded list, sorted, "
    "and indexed at the lower median rank ((n+1) div 2, pure integer "
    "arithmetic, exact for partial frames at partition starts) — the median "
    "is always an observed data value, so no interpolation arithmetic can "
    "diverge between engines. O(frame) state per row at any scale; one "
    "shuffle on user_id shared with the whole window battery.",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, Window.currentRow)
    )
    framed = ev.select(
        "user_id", "event_id", "value", F.collect_list("value").over(w).alias("frame")
    )
    n = F.size("frame")
    # n > 0 guard: an all-NULL frame is empty post-collect_list, and ANSI
    # element_at rejects index 0 — the oracle's NULL list yields NULL med9
    # and a coalesced 0 count, so the guarded leg matches exactly
    return framed.select(
        "user_id",
        "event_id",
        "value",
        n.cast("bigint").alias("frame_n"),
        F.when(
            n > 0, F.element_at(F.array_sort("frame"), ((n + 1) / 2).cast("int"))
        ).alias("med9"),
    )


# --- gaps and islands (consecutive-run detection) ---------------------------


@register(
    "win_gap_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
grp AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS island_key
  FROM days
)
SELECT user_id,
       min(d) AS island_start,
       max(d) AS island_end,
       count(*) AS n_days
FROM grp GROUP BY user_id, island_key
""",
    tags=("W",),
    doc="gaps-and-islands: maximal runs of CONSECUTIVE active days per user "
    "via the row_number-difference trick (d minus rank is constant exactly "
    "within a consecutive run — one window plus one groupBy, both sharing "
    "the user partitioning, detects arbitrarily long runs with O(1) state; "
    "the set-based dual of time-gap sessionization in traj_sessionize)",
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island_key", F.expr("date_sub(d, CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT))")
    )
    return grp.groupBy("user_id", "island_key").agg(
        F.min("d").alias("island_start"),
        F.max("d").alias("island_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("island_key")
