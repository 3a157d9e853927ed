"""Relational core (SURVEY.md §2: P1-P2, J1-J6, A1/A2/A8/A9, O1-O3, SET).

The reference delegates these to Polars (``meos-polars/examples/
ais_to_db.rs:118-141``) / Postgres; here they are first-class declared
queries over the TPC-H-ish fixtures, each with a DuckDB oracle twin.

Scale discipline per query (noted inline): dimension joins broadcast, one
shuffle per groupBy, sort+limit plans as TakeOrderedAndProject, non-equi
joins are bucketed so no cartesian product survives at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from meos_rs_spark.functions.determinism import epoch_us_sql, money_avg, money_sum, money_sum_sql
from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table


# --- P1: projection + rename (ais_to_db.rs:124-129) ------------------------


@register(
    "rel_projection_rename",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_quantity AS qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01'
""",
    tags=("P1",),
    doc="select/alias/row-arithmetic with scan-level filter pushdown",
)
def rel_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp_ntz")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("l_quantity").alias("qty"),
    )


# --- A1/A2 + P2: group-agg + HAVING (ais_to_db.rs:130-138) -----------------


@register(
    "rel_group_having",
    oracle="""
SELECT o_custkey, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING count(*) > 3
""",
    tags=("A1", "A2", "P2"),
)
def rel_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), money_sum("o_totalprice").alias("total_spent"))
        .filter(F.col("n_orders") > 3)
    )


# --- TPC-H Q1 analog: pricing summary (A1/A2, decimal-sum discipline) ------


@register(
    "rel_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty,
       {money_sum_sql('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       {money_sum_sql('l_quantity')} / COUNT(l_quantity) AS avg_qty,
       {money_sum_sql('l_discount')} / COUNT(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("A1", "A2"),
    doc="TPC-H Q1 shape; all double sums via exact DECIMAL for shuffle-order independence",
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- J1: equi inner join, dimension side broadcast -------------------------


@register(
    "rel_join_inner_broadcast",
    oracle="""
SELECT n.n_name, count(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("J1",),
    doc="fact⋈dim with explicit broadcast of the 25-row dimension",
)
def rel_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), money_sum("c_acctbal").alias("total_bal"))
    )


# --- J2: outer join --------------------------------------------------------


@register(
    "rel_join_left_outer",
    oracle="""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
    tags=("J2",),
)
def rel_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "rel_join_full_outer",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       count(DISTINCT c.c_custkey) AS n_cust,
       count(DISTINCT s.s_suppkey) AS n_supp
FROM customer c FULL JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
""",
    tags=("J2",),
)
def rel_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full")
    return j.groupBy(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey")
    ).agg(
        F.countDistinct("c_custkey").alias("n_cust"),
        F.countDistinct("s_suppkey").alias("n_supp"),
    )


# --- J3: semi / anti -------------------------------------------------------


@register(
    "rel_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    tags=("J3",),
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "rel_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("J3",),
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --- J4: theta/range join (equi key + time-range refinement) ---------------


@register(
    "rel_join_range",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_fast_lines
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderpriority
""",
    tags=("J4",),
    doc="equi join + range predicate: Catalyst keeps the hash join on the key, range as post-filter",
)
def rel_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.expr("o_orderdate + INTERVAL 30 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_fast_lines"))


# --- J4 pure non-equi: bucketed band join ----------------------------------

_BUCKETS = [(0.0, 50.0), (50.0, 100.0), (100.0, 200.0), (200.0, 1e9)]


@register(
    "rel_join_band_bucketed",
    oracle="""
WITH buckets(lo, hi) AS (VALUES (0.0, 50.0), (50.0, 100.0), (100.0, 200.0), (200.0, 1000000000.0))
SELECT CAST(b.lo AS DOUBLE) AS lo, CAST(b.hi AS DOUBLE) AS hi, count(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.lo, b.hi
""",
    tags=("J4",),
    doc="pure range join against a tiny broadcast band table (BroadcastNestedLoop is fine: 4 rows)",
)
def rel_join_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = spark.createDataFrame(_BUCKETS, "lo double, hi double")
    return (
        ev.join(broadcast(b), (ev.value >= b.lo) & (ev.value < b.hi))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_events"), money_sum("value").alias("sum_value"))
    )


# --- J6: as-of join --------------------------------------------------------


def asof_merge(events: DataFrame, probes: DataFrame, direction: str = "backward") -> DataFrame:
    """Sorted-merge as-of join (the pandas ``merge_asof`` shape, distributed):
    ``events`` is (user_id, ts, value), ``probes`` is (user_id, pts); both
    ord columns must share a dtype. Probes union into the event stream and
    one per-user running struct-extremum window answers every probe, so the
    intermediate stays N + P rows — never the probe×event pairs a user-key
    equi-join materializes (which multiply the fact by the probe count per
    key and grow with the time domain).

    direction="backward": (user_id, pts, last_value, last_ts) for the last
    event at-or-before each probe; probes with no prior event are dropped
    (inner-join semantics). direction="both": (user_id, pts, back_ts,
    back_value, fwd_ts, fwd_value) with NULLs where a side has no candidate.

    Events sort before probes at equal ord in both directions, so each
    side's comparison is inclusive (ts <= pts / ts >= pts). Values ride a
    struct-extremum — not last(ignorenulls) — so a legitimately NULL event
    value surfaces as NULL (NOTE: unlike DuckDB's plain arg_max/arg_min,
    which SKIP NULL values — the oracles mirror this with a struct
    extremum + an explicit not-null field, r10 review find). Ties on (user,
    ts) resolve deterministically to the extremal value of the tied group
    (max for backward, min for forward).
    """
    ord_t = dict(events.dtypes)["ts"]
    val_t = dict(events.dtypes)["value"]
    ev_s = events.select(
        "user_id",
        F.col("ts").alias("ord"),
        F.lit(0).alias("kind"),
        "value",
        F.lit(None).cast(ord_t).alias("pts"),
    )
    pr_s = probes.select(
        "user_id",
        F.col("pts").alias("ord"),
        F.lit(1).alias("kind"),
        F.lit(None).cast(val_t).alias("value"),
        "pts",
    )
    merged = ev_s.unionByName(pr_s)
    w_asc = Window.partitionBy("user_id").orderBy("ord", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ev_struct = F.when(F.col("kind") == 0, F.struct("ord", "value"))
    back_ev = F.max(ev_struct).over(w_asc)
    if direction == "backward":
        return (
            merged.select(
                "user_id", "pts", "kind",
                back_ev["value"].alias("last_value"),
                back_ev["ord"].alias("last_ts"),
            )
            .filter((F.col("kind") == 1) & F.col("last_ts").isNotNull())
            .select("user_id", "pts", "last_value", "last_ts")
        )
    if direction != "both":
        raise ValueError(f"direction must be 'backward' or 'both', got {direction!r}")
    w_desc = Window.partitionBy("user_id").orderBy(F.desc("ord"), F.asc("kind")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd_ev = F.min(ev_struct).over(w_desc)
    return (
        merged.select(
            "user_id", "pts", "kind",
            back_ev["ord"].alias("back_ts"),
            back_ev["value"].alias("back_value"),
            fwd_ev["ord"].alias("fwd_ts"),
            fwd_ev["value"].alias("fwd_value"),
        )
        .filter(F.col("kind") == 1)
        .drop("kind")
    )


@register(
    "rel_join_asof",
    oracle="""
WITH probes AS (
  -- user_id IS NOT NULL: an as-of probe is keyed by user; the equi-join
  -- below can never answer a NULL-keyed probe while the Spark leg's
  -- sorted-merge window WOULD group it (engine fact, r12 adversarial
  -- sweep) — the probe identity envelope is explicit in BOTH legs
  SELECT DISTINCT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS pts
  FROM events WHERE user_id IS NOT NULL
)
SELECT p.user_id, p.pts,
       -- struct extremum, NOT arg_max: DuckDB arg_max tie-resolution is
       -- scan-order-dependent and it SKIPS NULL values; the Spark leg's
       -- max(struct(ts, value)) picks the max tied value and surfaces a
       -- NULL at the as-of row. The nn field emulates Spark's
       -- NULL-sorts-low struct ordering (DuckDB sorts struct-field NULLs
       -- high) so tied-ts-with-NULL corners agree too (r10 review find,
       -- both corners verified empirically on both engines).
       (max(struct_pack(ts := e.ts, nn := e.value IS NOT NULL, v := e.value))).v AS last_value,
       max(e.ts) AS last_ts
FROM probes p JOIN events e
  ON e.user_id = p.user_id AND e.ts <= p.pts
GROUP BY p.user_id, p.pts
""",
    tags=("J6",),
    doc="as-of join: last event at or before each probe ts (argmax pattern; "
    "DuckDB twin uses arg_max). Spark side is the SORTED-MERGE form: probes "
    "union into the event stream and one per-user running max answers every "
    "probe — intermediate rows stay N + P. The old user-equi-join + range "
    "filter materialized every (probe, prior event) pair, multiplying the "
    "fact by ~half the probe-day count (the r8 ×10 sweep measured it 10.3×, "
    "and the multiplier grows with the time domain at scale)",
)
def rel_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe identity envelope (see oracle): NULL-keyed rows can neither
    # probe nor answer
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    probes = ev.select(
        "user_id", F.expr("date_trunc('day', ts) + INTERVAL 1 DAY").alias("pts")
    ).distinct()
    return asof_merge(ev.select("user_id", "ts", "value"), probes, "backward")


# --- multi-way join (TPC-H Q5 shape) ---------------------------------------


@register(
    "rel_join_multiway",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE r.r_name IN ('ASIA', 'AMERICA')
  AND o.o_orderdate >= TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("J1", "A1"),
    doc="4-way star join: region/nation broadcast, orders filter pushed to scan",
)
def rel_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


# --- A8: distinct / rollup / cube ------------------------------------------


@register(
    "rel_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("A8",),
)
def rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "rel_count_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag
""",
    tags=("A8",),
)
def rel_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "rel_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS grp_id
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("A8",),
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("o_totalprice").alias("total"),
            (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("grp_id"),
        )
    )


@register(
    "rel_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       {money_sum_sql('l_quantity')} AS sum_qty,
       GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS grp_id
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("A8",),
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("l_quantity").alias("sum_qty"),
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias("grp_id"),
        )
    )


# --- O1/O3: sort + top-k ---------------------------------------------------


@register(
    "rel_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    tags=("O1", "O3"),
    doc="global top-k: plans as TakeOrderedAndProject (no full sort shuffle); orderkey tiebreak",
)
def rel_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


# --- SET: union / intersect / except ---------------------------------------


@register(
    "rel_set_ops",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'union' AS op, nk FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
UNION ALL
SELECT 'intersect' AS op, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'except' AS op, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
""",
    tags=("SET",),
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    u = cn.union(sn).distinct().select(F.lit("union").alias("op"), "nk")
    i = cn.intersect(sn).select(F.lit("intersect").alias("op"), "nk")
    e = cn.exceptAll(sn).select(F.lit("except").alias("op"), "nk")
    return u.unionByName(i).unionByName(e)


# --- A9: global metrics ----------------------------------------------------


@register(
    "rel_global_metrics",
    oracle="""
SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
       (SELECT count(*) FROM orders) AS n_orders,
       (SELECT count(DISTINCT o_custkey) FROM orders) AS n_active_customers,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders) AS gross
""",
    tags=("A9",),
    doc="run-level counters (reference prints these: ais_to_db.rs:151-153,215-224)",
)
def rel_global_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_lineitem"))
    # the orders aggregate rides in as ONE struct-valued scalar subquery —
    # no join operator at all (the 1-row crossJoin it replaces planned as a
    # BroadcastNestedLoopJoin, widening the plan-lint whitelist for nothing)
    o = load_table(spark, sf_dir, "orders").agg(
        F.struct(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_active_customers"),
            money_sum("o_totalprice").alias("gross"),
        ).alias("o")
    )
    return li.select("n_lineitem", o.scalar().alias("__o")).select(
        "n_lineitem", "__o.n_orders", "__o.n_active_customers", "__o.gross"
    )


# --- TPC-H Q6 shape: predicate-heavy scan aggregation ----------------------


@register(
    "rel_filter_agg",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate < TIMESTAMP '2000-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("P2", "A2"),
    doc="TPC-H Q6 shape: all predicates push to the parquet scan, single partial+final agg",
)
def rel_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- TPC-H Q12 shape: conditional aggregation over a join ------------------


@register(
    "rel_conditional_agg",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '2000-01-01'
GROUP BY l.l_linestatus
""",
    tags=("J1", "A2"),
    doc="TPC-H Q12 shape: CASE-conditional counts over a fact-fact join",
)
def rel_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q17 shape: correlated scalar subquery (decorrelated by Catalyst) -


@register(
    "rel_correlated_subquery",
    oracle="""
SELECT l.l_partkey,
       count(*) AS n_small
FROM lineitem l
WHERE l.l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
""",
    tags=("J1", "A1"),
    doc="TPC-H Q17 shape: correlated scalar subquery — Catalyst decorrelates into an "
    "aggregate+join; per-part average uses the exact-decimal form on both sides",
)
def rel_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("meos_q17_lineitem")
    return spark.sql(
        """
        SELECT l.l_partkey, count(*) AS n_small
        FROM meos_q17_lineitem l
        WHERE l.l_quantity < (
            SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l2.l_quantity))
            FROM meos_q17_lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        """
    )


# --- skew defense: two-stage salted aggregation ----------------------------

_SALT = 16


@register(
    "rel_salted_agg",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem GROUP BY l_returnflag
""",
    tags=("A1", "A2"),
    doc=f"hot-key defense: stage 1 aggregates on (key, salt=pmod(hash(rowid), {_SALT})) "
    "spreading each giant group over the cluster, stage 2 re-aggregates per key — "
    "exact-decimal partials make the two-stage sum identical to the direct one "
    "(the salting pattern for skewed vessels at 100 TB, SURVEY §7 known-hard e)",
)
def rel_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "__salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_SALT))
    )
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("psum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("total"),
    )


# --- TPC-H Q19 shape: disjunctive multi-predicate join ---------------------


@register(
    "rel_disjunctive_join",
    oracle="""
SELECT count(*) AS n,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
""",
    tags=("J1", "P2"),
    doc="TPC-H Q19 shape: OR-of-conjunctions over a join — Catalyst extracts the "
    "common p_partkey equi-key and pushes brand/size disjuncts to the part scan",
)
def rel_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((p.p_brand == "Brand#1") & F.col("l_quantity").between(1, 11) & p.p_size.between(1, 5))
        | ((p.p_brand == "Brand#2") & F.col("l_quantity").between(10, 20) & p.p_size.between(1, 10))
        | ((p.p_brand == "Brand#3") & F.col("l_quantity").between(20, 30) & p.p_size.between(1, 15))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --- PIVOT / UNPIVOT --------------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@register(
    "rel_pivot",
    oracle=f"""
SELECT o.o_orderpriority,
       {", ".join(
           f"CAST(SUM(CASE WHEN c.c_mktsegment = '{s}' "
           f"THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS {s.lower()}"
           for s in _SEGMENTS)}
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY o.o_orderpriority
""",
    tags=("A8",),
    doc="PIVOT: order revenue by priority x market segment — groupBy().pivot() "
    "with an EXPLICIT value list (without it Spark runs an extra distinct scan "
    "to discover columns; at 100 TB always enumerate); one shuffle, map-side "
    "partials per (priority, segment)",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # no broadcast hint: customer is SF-SCALED (150k rows/SF — TB-sized at
    # the 100 TB target), not a fixed dim like nation/region; the hint
    # would force an OOM build there. AQE picks broadcast at small SF on
    # its own and shuffle-joins at scale (r10 review find — same
    # discipline as rel_join_multiway's orders⋈customer leg).
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )
    return piv.select(
        "o_orderpriority", *[F.col(s).alias(s.lower()) for s in _SEGMENTS]
    )


@register(
    "rel_unpivot",
    oracle="""
SELECT o_orderkey, metric, val
FROM (
  SELECT o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS totalprice,
         CAST(o_custkey AS DOUBLE) AS custkey
  FROM orders WHERE o_orderkey < 1000
) UNPIVOT (val FOR metric IN (totalprice, custkey))
""",
    tags=("A8",),
    doc="UNPIVOT (melt): wide metric columns to (key, metric, value) rows — "
    "df.unpivot, the zero-shuffle narrow transform (DuckDB UNPIVOT twin)",
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    # engine fact (r12 adversarial sweep): the DataFrame unpivot KEEPS
    # NULL-valued cells while the SQL UNPIVOT clause — Spark's own SQL form
    # included — defaults to EXCLUDE NULLS, so the two legs silently
    # diverge on any NULL metric. Pin the SQL-standard EXCLUDE semantics
    # explicitly; the filter is a no-op on a NULL-free fixture.
    return wide.unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "val").filter(
        F.col("val").isNotNull()
    )


# --- exact percentiles ------------------------------------------------------


@register(
    "rel_percentiles",
    oracle="""
SELECT c.c_mktsegment,
       quantile_cont(o.o_totalprice, 0.5) AS p50,
       quantile_cont(o.o_totalprice, 0.95) AS p95,
       max(o.o_totalprice) AS p100
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
    tags=("A1",),
    doc="exact interpolated percentiles per group (Spark percentile == DuckDB "
    "quantile_cont: both sort-and-lerp, IEEE-identical on identical inputs); "
    "the exact form is the oracle for any approx_percentile rollout at scale",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # no broadcast hint on the SF-scaled customer (see rel_pivot)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
            F.max("o_totalprice").alias("p100"),
        )
    )


@register(
    "rel_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS grp_id,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    tags=("A8",),
    doc="explicit GROUPING SETS with a GROUPING() id (disambiguates real NULLs "
    "from subtotal rows — rollup/cube's general form); one expand + one shuffle",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id("o_orderstatus", "o_orderpriority").alias("grp_id"),
            F.count(F.lit(1)).alias("n"),
            money_sum("o_totalprice").alias("total"),
        )
    )


# --- hot-key defense, join edition: salted skew join ------------------------

_JSALT = 8


@register(
    "rel_salted_join",
    oracle="""
SELECT n.n_name,
       count(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY n.n_name
""",
    tags=("J1", "A1"),
    doc=f"hot-key defense for JOINS (the salted-agg twin): the fact side's join "
    f"key domain is tiny (user_id%25), so a plain shuffle join lands each hot "
    f"key on one task. Fact rows get salt=pmod(hash(event_id), {_JSALT}); the "
    f"dim side is replicated ×{_JSALT} via explode(sequence) and the join runs "
    "on (key, salt) — every hot key spreads over "
    f"{_JSALT} tasks and results are exactly the plain join's (merge hint "
    "keeps the demo on SMJ; in production this is the fallback when the dim "
    "is too big to broadcast and AQE skew-split can't help, e.g. bucketed "
    "layouts)",
)
def rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "__nkey", (F.col("user_id") % 25).cast("int")
    ).withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(_JSALT)))
    dim = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", F.explode(F.sequence(F.lit(0), F.lit(_JSALT - 1))).alias("__salt"))
        .hint("merge")
    )
    joined = ev.join(dim, (ev.__nkey == dim.n_nationkey) & (ev.__salt == dim.__salt))
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# --- LATERAL correlated subquery: top-N per group without a window -----------


@register(
    "rel_lateral_topn",
    oracle="""
SELECT r.r_name, t.n_name, t.n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, count(*) AS n_customers
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) t
""",
    tags=("J1", "O3"),
    doc="LATERAL correlated subquery (Spark 4 SQL): for every region, the two "
    "nations with the most customers — the top-N-per-group shape expressed as "
    "a per-row subquery instead of a window; Catalyst decorrelates it into a "
    "join + per-group TakeOrdered, so the declarative form costs the same as "
    "the window idiom while reading closer to the business question",
)
def rel_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "region").createOrReplaceTempView("__lat_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("__lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    return spark.sql("""
      SELECT r.r_name, t.n_name, t.n_customers
      FROM __lat_region r,
      LATERAL (
        SELECT n.n_name, count(*) AS n_customers
        FROM __lat_nation n JOIN __lat_customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name
        LIMIT 2
      ) t
    """)


# --- approximate-distinct sketch (HLL++ fidelity gate) ----------------------

_HLL_TOL = 0.15  # 3x the default rsd=0.05 -- observed max rel err 8.6% across sf0.001/0.01/0.1


@register(
    "rel_approx_distinct",
    oracle=f"""
SELECT l.l_returnflag,
       count(DISTINCT l.l_orderkey) AS exact_orders,
       count(DISTINCT l.l_partkey)  AS exact_parts,
       TRUE AS orders_within_tol,
       TRUE AS parts_within_tol
FROM lineitem l
GROUP BY l.l_returnflag
""",
    tags=("A8", "sketch"),
    doc="HyperLogLog++ sketch fidelity (the cardinality twin of "
    "dedup_minhash_estimate): approx_count_distinct per group vs the exact "
    "count, asserting relative error within 3x rsd. HLL register maxima are "
    "order/partition independent, so the estimate is deterministic for a "
    "fixed input set; the sketch internals differ from DuckDB's, so the "
    "oracle pins the EXACT counts plus the tolerance verdict (a FALSE would "
    "hash-mismatch). At 100 TB this is THE distinct-count plan: sketches "
    "merge map-side, one tiny row per group crosses the wire, vs an exact "
    "count's full-width shuffle of every (group, key) pair.",
)
def rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def within(approx: str, exact: str):
        err = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return err <= _HLL_TOL

    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_tol"),
        within("approx_parts", "exact_parts").alias("parts_within_tol"),
    )


# --- as-of join, forward / nearest directions (J6 completion) ---------------


@register(
    "rel_join_asof_nearest",
    oracle="""
WITH probes AS (
  -- probe identity envelope: see rel_join_asof
  SELECT DISTINCT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS pts
  FROM events WHERE user_id IS NOT NULL
),
agg AS (
  SELECT p.user_id, p.pts,
         max(e.ts)            FILTER (WHERE e.ts <= p.pts) AS back_ts,
         -- struct extrema with the nn NULL-ordering shim, as in
         -- rel_join_asof: arg_max/arg_min are tie-order-dependent and
         -- NULL-skipping, the Spark struct extremum is neither
         (max(struct_pack(ts := e.ts, nn := e.value IS NOT NULL, v := e.value))
            FILTER (WHERE e.ts <= p.pts)).v AS back_value,
         min(e.ts)            FILTER (WHERE e.ts >= p.pts) AS fwd_ts,
         (min(struct_pack(ts := e.ts, nn := e.value IS NOT NULL, v := e.value))
            FILTER (WHERE e.ts >= p.pts)).v AS fwd_value
  FROM probes p JOIN events e ON e.user_id = p.user_id
  GROUP BY p.user_id, p.pts
)
SELECT user_id, pts, back_ts, back_value, fwd_ts, fwd_value,
       CASE WHEN back_ts IS NULL THEN fwd_value
            WHEN fwd_ts IS NULL THEN back_value
            WHEN epoch_us(pts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(pts)
              THEN back_value
            ELSE fwd_value END AS nearest_value
FROM agg
""",
    tags=("J6",),
    doc="as-of join, forward and nearest directions (completes J6 next to the "
    "backward rel_join_asof — the pandas merge_asof direction trio): the "
    "same sorted-merge form as rel_join_asof, run once ascending (backward "
    "candidate) and once descending (forward candidate) over the merged "
    "probe/event stream; 'nearest' picks between the two directional "
    "candidates in integer epoch micros with ties to the earlier event. "
    "Intermediate rows stay N + P (the old user-equi-join materialized "
    "every probe×event pair per user — the r8 ×10 sweep measured it 10.5×, "
    "with the multiplier growing with the probe-day count at scale).",
)
def rel_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe identity envelope (see rel_join_asof)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    probes = ev.select(
        "user_id", F.expr("date_trunc('day', ts) + INTERVAL 1 DAY").alias("pts")
    ).distinct()
    agg = asof_merge(ev.select("user_id", "ts", "value"), probes, "both")
    us = lambda c: F.expr(epoch_us_sql(c))  # noqa: E731 (canonical epoch form)
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_value"))
        .when(F.col("fwd_ts").isNull(), F.col("back_value"))
        .when(us("pts") - us("back_ts") <= us("fwd_ts") - us("pts"), F.col("back_value"))
        .otherwise(F.col("fwd_value"))
    )
    return agg.select(
        "user_id", "pts", "back_ts", "back_value", "fwd_ts", "fwd_value",
        nearest.alias("nearest_value"),
    )


# --- behavioral funnel (sequence matching, MATCH_RECOGNIZE territory) -------


@register(
    "rel_funnel_steps",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purch
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
),
conv AS (
  SELECT p.user_id, epoch_us(p.t_purch) - epoch_us(v.t_view) AS d_us
  FROM p JOIN v ON v.user_id = p.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased,
       CAST((SELECT sum(d_us) FROM conv) AS BIGINT) AS sum_conv_us,
       CAST((SELECT sum(d_us) FROM conv) AS DOUBLE)
         / (SELECT count(*) FROM p) / 1000000.0 AS avg_conv_sec
""",
    tags=("A1", "behavioral"),
    doc="ordered-funnel analysis (view -> first click strictly after -> first "
    "purchase strictly after; the MATCH_RECOGNIZE shape): the Spark side runs "
    "the funnel as a state-machine fold over each user's time-sorted event "
    "array — ONE shuffle of the fact, one pass, any funnel depth — while the "
    "oracle spells the same semantics as three chained conditional "
    "aggregations. Conversion time summed in exact integer micros; the "
    "average is one double division of identical integers on both engines.",
)
def rel_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
            "event_id",
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("us", "event_id", "et"))).alias("arr"))
        .select(
            "user_id",
            F.expr("""
              aggregate(arr, named_struct('v', -1L, 'c', -1L, 'p', -1L),
                (s, x) -> named_struct(
                  'v', CASE WHEN s.v < 0 AND x.et = 'view' THEN x.us ELSE s.v END,
                  'c', CASE WHEN s.c < 0 AND s.v >= 0 AND x.et = 'click'
                             AND x.us > s.v THEN x.us ELSE s.c END,
                  'p', CASE WHEN s.p < 0 AND s.c >= 0 AND x.et = 'purchase'
                             AND x.us > s.c THEN x.us ELSE s.p END))
            """).alias("st"),
        )
    )
    return per_user.agg(
        F.sum((F.col("st.v") >= 0).cast("int")).cast("bigint").alias("n_viewed"),
        F.sum((F.col("st.c") >= 0).cast("int")).cast("bigint").alias("n_clicked"),
        F.sum((F.col("st.p") >= 0).cast("int")).cast("bigint").alias("n_purchased"),
        F.sum(F.when(F.col("st.p") >= 0, F.col("st.p") - F.col("st.v"))).cast("bigint").alias("sum_conv_us"),
        # try_divide: a purchase-free corpus makes the denominator 0, which
        # DuckDB renders NULL but Spark 4 ANSI `/` raises DIVIDE_BY_ZERO —
        # one funnel with no conversions must not abort the job (review
        # find, r7; latent while the fixture converts)
        (
            F.try_divide(
                F.sum(F.when(F.col("st.p") >= 0, F.col("st.p") - F.col("st.v"))).cast("double"),
                F.sum((F.col("st.p") >= 0).cast("int")),
            )
            / F.lit(1000000.0)
        ).alias("avg_conv_sec"),
    )


# --- cohort retention (weekly cohorts x activity-week offsets) --------------


@register(
    "rel_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY user_id
),
sizes AS (SELECT cohort, count(*) AS cohort_size FROM firsts GROUP BY cohort),
activity AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT f.cohort,
       CAST((epoch_us(a.wk) - epoch_us(f.cohort)) // 604800000000 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(count(*) AS DOUBLE) / s.cohort_size AS retention
FROM activity a
JOIN firsts f ON f.user_id = a.user_id
JOIN sizes s ON s.cohort = f.cohort
GROUP BY f.cohort, week_offset, s.cohort_size
""",
    tags=("A1", "behavioral"),
    doc="weekly cohort retention (the canonical engagement rollup next to "
    "rel_funnel_steps): users bucketed by first-activity week, per-(cohort, "
    "week-offset) active counts and retention ratio. Week offsets computed "
    "by integer-micros floor division (both engines' date_trunc('week') "
    "lands on Monday); retention is one double division of identical "
    "integers. Scale shape: one user-key aggregate for cohorts (broadcast "
    "back), one distinct over (user, week) — both map-side combinable.",
)
def rel_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    us = lambda c: F.expr(epoch_us_sql(c))  # noqa: E731 (canonical epoch form)
    week_off = ((us("wk") - us("cohort")) / F.lit(7 * 86400 * 1000000)).cast("bigint")
    return (
        activity.join(firsts, "user_id")
        .join(broadcast(sizes), "cohort")
        .groupBy("cohort", week_off.alias("week_offset"), "cohort_size")
        .agg(F.count("*").alias("n_active"))
        .select(
            "cohort",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
    )


# --- SCD2: change-log -> validity intervals ---------------------------------


@register(
    "rel_scd2_intervals",
    oracle="""
WITH m AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT user_id, event_type, ts AS valid_from, event_id FROM m
  WHERE prev_type IS NULL OR prev_type != event_type
),
v AS (
  SELECT user_id, event_type, valid_from,
         row_number() OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS version,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
  FROM c
)
SELECT user_id, version, event_type, valid_from, valid_to,
       CAST(valid_to IS NULL AS INT) AS is_current
FROM v
""",
    tags=("rel", "temporal", "scd2"),
    doc="SCD2 dimension build from a change log: consecutive-duplicate "
    "suppression (lag) finds version starts, lead() closes each validity "
    "interval, the open interval is the current version -- the half-open "
    "[valid_from, valid_to) temporal-table layout every warehouse upsert "
    "loop maintains (the batch face of snk_upsert_merge's temporal merge). "
    "Both windows share one hash partitioning on user_id, so the whole "
    "build is a single shuffle at any scale; ties broken by event_id for a "
    "total order.",
)
def rel_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = ev.withColumn("prev_type", F.lag("event_type").over(w))
    c = m.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return c.select(
        "user_id",
        F.row_number().over(wv).alias("version"),
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull().cast("int"))


# --- approx-percentile sketch fidelity gate ---------------------------------

_AP_ACC = 1000  # GK sketch accuracy: rank error <= n / _AP_ACC

# (p_num, lo/hi numerators over denominator 1000). The window is p +/- 4 eps:
# one merged GK summary guarantees <= 2 eps rank error (eps per input sketch,
# additive under merge), observed worst at sf0.1 is 1.005 eps -- 4 eps is the
# same safety-factor policy as rel_approx_distinct's 3x rsd
_AP_PROBS = (("p50", 500, 496, 504), ("p90", 900, 896, 904), ("p99", 990, 986, 994))


@register(
    "rel_approx_percentiles",
    oracle=f"""
WITH r AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
n AS (SELECT event_type, count(*) AS n_rows FROM events
      WHERE value IS NOT NULL GROUP BY event_type),
picks AS (
  SELECT n.event_type, n.n_rows,
         {", ".join(
             f"max(CASE WHEN r.rn = ((n.n_rows * {num} + 999) // 1000) THEN r.value END) AS exact_{k}"
             for k, num, _, _ in _AP_PROBS
         )}
  FROM n JOIN r ON r.event_type = n.event_type
  GROUP BY n.event_type, n.n_rows
)
SELECT event_type, n_rows,
       {", ".join(f"exact_{k}" for k, _, _, _ in _AP_PROBS)},
       {", ".join(f"1 AS ok_{k}" for k, _, _, _ in _AP_PROBS)}
FROM picks
""",
    tags=("rel", "sketch", "A1"),
    doc=f"approx_percentile (Greenwald-Khanna sketch, accuracy {_AP_ACC}) "
    "fidelity gate, the quantile analog of rel_approx_distinct: the oracle "
    "pins the EXACT discrete quantiles (rank ceil(p*n) under the total order "
    "(value, event_id) over NON-NULL values — percentile_approx ignores "
    "NULLs, so the exact leg must too, and Spark's struct sort ranks a NULL "
    "field LOW while DuckDB ranks it LAST (r11 review: both legs now filter "
    "NULL values; a group with none drops out of both) — computed with pure "
    "integer rank arithmetic so no float boundary exists, plus literal-TRUE "
    "verdicts; the Spark leg "
    "computes the sketch for real and asserts its value lands between the "
    "rank-(p-eps) and rank-(p+eps) exact order statistics -- the GK "
    "guarantee. Sketches are the 100 TB path (mergeable, bounded memory); "
    "the exact leg sorts per group and exists to gate them.",
)
def rel_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    g = (
        ev.groupBy("event_type")
        .agg(
            # non-null count + non-null collect (when-without-otherwise is
            # NULL for NULL values and collect_list drops it): the exact
            # ranks live over the same population the sketch consumes
            F.count("value").alias("n_rows"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("value").isNotNull(), F.struct("value", "event_id")
                    )
                )
            ).alias("vals"),
            F.percentile_approx(
                "value", [num / 1000 for _, num, _, _ in _AP_PROBS], _AP_ACC
            ).alias("ap"),
        )
        .filter(F.col("n_rows") >= 1)  # all-NULL groups drop out of both legs
    )
    # integer rank arithmetic: ceil(a/1000) == (a + 999) div 1000, clamped to [1, n]
    rank = lambda num: F.greatest(  # noqa: E731
        F.lit(1), F.least(F.col("n_rows"), F.expr(f"(n_rows * {num} + 999) div 1000"))
    )
    at = lambda r: F.element_at("vals", r.cast("int")).getField("value")  # noqa: E731
    cols = [F.col("event_type"), F.col("n_rows")]
    for k, num, _, _ in _AP_PROBS:
        cols.append(at(rank(num)).alias(f"exact_{k}"))
    for i, (k, _, lo, hi) in enumerate(_AP_PROBS):
        apv = F.element_at("ap", i + 1)
        cols.append(
            ((apv >= at(rank(lo))) & (apv <= at(rank(hi)))).cast("int").alias(f"ok_{k}")
        )
    return g.select(*cols)


# --- Bloom-filter pre-filtered semi-join (the runtime-filter pattern) -------

_BLOOM_BITS = 1 << 16  # 65,536 bits = 1,024 longs (~8 KB broadcast)
_BLOOM_K = 3  # hash functions (Kirsch-Mitzenmacher double hashing)


def _bloom_probe(key: str):
    """k bit positions for a key column: g_i = xxhash64(i, key) mod m.

    Seeded hashing, not Kirsch-Mitzenmacher h1 + i*h2: Spark 4 runs with ANSI
    mode on, so the additive combine overflows (ArithmeticException) whenever
    xxhash64 lands within ~i*2^32 of +/-2^63 — deterministic job failure at
    scale. Hashing (i, key) tuples keeps every op inside long range on both
    the build and probe sides; identical expressions on both sides is the
    only correctness requirement for a Bloom filter."""
    return [
        F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]


@register(
    "rel_bloom_join",
    oracle=f"""
SELECT l.l_suppkey,
       count(*) AS n_lines,
       {money_sum_sql('l.l_quantity')} AS sum_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM supplier s
              WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 5000)
GROUP BY l.l_suppkey
""",
    tags=("J3", "scale"),
    doc="Bloom-filter pre-filtered semi-join — the runtime-filter pattern "
    "(Spark's own InjectRuntimeFilter/BloomFilterAggregate does this "
    "implicitly; here it is explicit and engine-independent): the dim-side "
    "key set folds into a ~8 KB bitmap (explode k bit positions → one "
    "bit_or aggregate), broadcast as a single map row; the fact side tests "
    "k bits in pure Column space and only surviving rows reach the exact "
    "semi-join that removes Bloom false positives. Result is bit-identical "
    "to the plain semi-join (the oracle). At 100 TB this is the shape that "
    "matters when the dim is too big to broadcast but its Bloom is not: "
    "the bitmap prunes the fact before the shuffle, so shuffle bytes scale "
    "with the match rate, not the fact size.",
)
def rel_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:

    dim = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey")
    )
    # build: each key sets k bits; word index + single-bit mask, OR-folded
    words = (
        dim.select(F.explode(F.array(*_bloom_probe("s_suppkey"))).alias("bit"))
        .select(
            F.expr("CAST(bit DIV 64 AS INT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bm"))
    )
    bloom = words.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bm")).alias("bloom")
    )
    fact = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    # the bitmap map rides in as a scalar subquery, not a 1-row join (BNLJ)
    probed = fact.withColumn("bloom", bloom.scalar())
    for i, bit in enumerate(_bloom_probe("l_suppkey")):
        probed = probed.withColumn(f"__b{i}", bit)
    cond = F.lit(True)
    for i in range(_BLOOM_K):
        hit = F.expr(
            f"(coalesce(element_at(bloom, CAST(__b{i} DIV 64 AS INT)), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__b{i} % 64 AS INT))) != 0"
        )
        cond = cond & hit
    candidates = probed.filter(cond).drop("bloom", *[f"__b{i}" for i in range(_BLOOM_K)])
    exact = candidates.join(
        F.broadcast(dim), candidates.l_suppkey == dim.s_suppkey, "left_semi"
    )
    return exact.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum("l_quantity").alias("sum_qty"),
    )


# --- exact distinct via bitmap words (the mergeable EXACT counterpart of HLL)


@register(
    "rel_bitmap_distinct",
    oracle="""
WITH bm AS (
  SELECT event_type, user_id // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
  FROM events GROUP BY 1, 2
),
m AS (SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bitmap FROM bm GROUP BY 1),
ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
SELECT m.event_type, m.n_bitmap, ex.n_exact,
       CAST(m.n_bitmap = ex.n_exact AS INT) AS ok
FROM m JOIN ex ON ex.event_type = m.event_type
""",
    tags=("A8", "sketch", "scale"),
    doc="EXACT distinct counting via bitmap words — the roaring-bitmap plan "
    "shape, the exact counterpart of rel_approx_distinct's HLL: each "
    "(group, id DIV 32) cell folds to one word with bit_or (32 ids per word so the set bit never reaches the BIGINT sign bit, which DuckDB rejects as shift overflow; fully "
    "map-side mergeable, commutative), the distinct count is the popcount "
    "sum — so a 100 TB distinct-count shuffles one long per 32 ids per "
    "group instead of every id, with NO approximation. Works whenever the "
    "id domain is dense/boundable (dictionary-encode first otherwise); the "
    "query carries count(DISTINCT) alongside and pins equality in-row.",
)
def rel_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    bm = (
        ev.groupBy(
            "event_type", F.expr("CAST(user_id DIV 32 AS BIGINT)").alias("word")
        )
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)))"
            ).alias("bits")
        )
    )
    m = bm.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_bitmap")
    )
    ex = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        m.join(ex, "event_type")
        .select(
            "event_type",
            "n_bitmap",
            "n_exact",
            (F.col("n_bitmap") == F.col("n_exact")).cast("int").alias("ok"),
        )
    )
