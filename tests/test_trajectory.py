"""Trajectory-semantics unit tests against hand-built micro-fixtures:
monotonic dedup (04_to_file.rs:92-96), assembly bounds/interp defaults
(tseq.rs:50-64), merge (ais_to_db.rs:156-161), accessors, path length."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meos_rs_spark.functions.trajectory import (
    assemble,
    dedup_monotonic,
    duration_seconds,
    end_ts,
    merge_trajs,
    num_instants,
    path_length,
    start_ts,
    subtype,
)


@pytest.fixture(scope="module")
def micro(spark):
    rows = [
        # mmsi, ts, lon, lat, event_id — vessel 1 has a duplicate ts (events 2,3)
        (1, "2024-01-01 00:00:00", 0.0, 0.0, 1),
        (1, "2024-01-01 00:00:10", 3.0, 4.0, 2),
        (1, "2024-01-01 00:00:10", 9.9, 9.9, 3),  # dup ts → dropped (first kept)
        (1, "2024-01-01 00:00:20", 3.0, 8.0, 4),
        (2, "2024-01-01 00:00:00", 5.0, 5.0, 5),  # single-instant vessel
    ]
    return (
        spark.createDataFrame(rows, "mmsi int, ts string, lon double, lat double, event_id int")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def test_dedup_monotonic_keeps_first_of_each_ts(micro):
    kept = dedup_monotonic(micro).select("event_id").toPandas()["event_id"].sort_values().tolist()
    assert kept == [1, 2, 4, 5]


def test_assemble_defaults_and_min_size(micro):
    t = assemble(micro, min_size=2).orderBy("mmsi").collect()
    assert len(t) == 1  # vessel 2 (1 instant) filtered by min_size
    traj = t[0].traj
    assert traj.interp == "Linear" and traj.lower_inc and traj.upper_inc  # tseq.rs:57-59
    assert [p.lon for p in traj.points] == [0.0, 3.0, 3.0]


def test_assemble_max_size_truncates(micro):
    t = assemble(micro.filter("mmsi = 1"), max_size=2).collect()[0]
    assert t.n_instants == 2
    assert [p.event_id for p in []] == []  # points carry no event_id (schema: ts, lon, lat)
    assert [p.lon for p in t.traj.points] == [0.0, 3.0]


def test_accessors_and_length(micro, spark):
    t = assemble(micro.filter("mmsi = 1"), min_size=1)
    row = t.select(
        start_ts(F.col("traj")).alias("s"),
        end_ts(F.col("traj")).alias("e"),
        num_instants(F.col("traj")).alias("n"),
        duration_seconds(F.col("traj")).alias("d"),
        subtype(F.col("traj")).alias("st"),
        path_length(F.col("traj")).alias("len"),
    ).collect()[0]
    assert row.n == 3 and row.d == 20.0 and row.st == "Sequence"
    # 3-4-5 triangle leg + vertical segment: 5 + 4 = 9
    assert row.len == pytest.approx(9.0)


def test_merge_dedups_on_ts(micro):
    evens = assemble(micro.filter("event_id % 2 = 0"), min_size=1).select(
        "mmsi", F.col("traj").alias("ta")
    )
    odds = assemble(micro.filter("event_id % 2 = 1"), min_size=1).select(
        "mmsi", F.col("traj").alias("tb")
    )
    j = evens.join(odds, "mmsi")
    merged = j.select("mmsi", merge_trajs(F.col("ta"), F.col("tb")).alias("m"))
    row = merged.filter("mmsi = 1").collect()[0]
    ts_list = [p.ts.isoformat() for p in row.m.points]
    assert ts_list == sorted(ts_list)
    assert len(ts_list) == 3  # the duplicate-ts point collapsed


def test_merge_stored_side_wins_ts_collision(spark):
    # two single-point trajectories at the SAME ts: the stored (first) side
    # must win even though the incoming point sorts lexicographically lower
    # (public.update(old, EXCLUDED.new, true) with old listed first)
    rows = [(1, "2024-01-01 00:00:00", 9.0, 9.0, 1)]
    stored_pts = (
        spark.createDataFrame(rows, "mmsi int, ts string, lon double, lat double, event_id int")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    incoming_pts = stored_pts.select(
        "mmsi", "ts", (F.col("lon") - 8).alias("lon"), (F.col("lat") - 8).alias("lat"), "event_id"
    )
    stored = assemble(stored_pts, min_size=1).select("mmsi", F.col("traj").alias("ta"))
    incoming = assemble(incoming_pts, min_size=1).select("mmsi", F.col("traj").alias("tb"))
    merged = stored.join(incoming, "mmsi").select(merge_trajs(F.col("ta"), F.col("tb")).alias("m"))
    pts = merged.collect()[0].m.points
    assert len(pts) == 1 and pts[0].lon == 9.0 and pts[0].lat == 9.0
    # and the merged point schema stays (ts, lon, lat) — no side tag leaks out
    assert list(pts[0].asDict()) == ["ts", "lon", "lat"]


def test_z_length_fold_handles_singleton_group(spark):
    # sequence(1, 0) DESCENDS under ANSI mode, so an unguarded fold indexes
    # pts[1] out of bounds for a 1-point vessel; the guarded production
    # expression must return exactly 0.0 instead of throwing
    from meos_rs_spark.queries.trajectory import Z_LENGTH3D_EXPR

    df = spark.sql(
        "SELECT array(named_struct("
        "'ts', TIMESTAMP_NTZ'2024-01-01 00:00:00', 'event_id', 1L, "
        "'lon', 1.0D, 'lat', 2.0D, 'z', 3.0D)) AS pts"
    )
    row = df.selectExpr(f"{Z_LENGTH3D_EXPR} AS length3d").collect()[0]
    assert row.length3d == 0.0
    # two-point sanity: 3-4-12 right-triangle-ish => sqrt(9+16+144) = 13
    df2 = spark.sql(
        "SELECT array("
        "named_struct('ts', TIMESTAMP_NTZ'2024-01-01 00:00:00', 'event_id', 1L,"
        " 'lon', 0.0D, 'lat', 0.0D, 'z', 0.0D),"
        "named_struct('ts', TIMESTAMP_NTZ'2024-01-01 01:00:00', 'event_id', 2L,"
        " 'lon', 3.0D, 'lat', 4.0D, 'z', 12.0D)) AS pts"
    )
    row2 = df2.selectExpr(f"{Z_LENGTH3D_EXPR} AS length3d").collect()[0]
    assert row2.length3d == 13.0


def test_merge_of_halves_equals_whole_with_duplicate_timestamps(spark):
    """The r7 review found the halves==whole invariant was only ever tested
    on duplicate-free data. Craft events where a duplicate (mmsi, ts) pair
    straddles the parity split (min event_id ODD, so the old
    stored-side-wins path would keep the wrong point), and verify the
    traj_equality recipe — dedup once, split, assemble, merge — equals
    whole-set assembly of the deduped stream."""
    import datetime as dt

    from meos_rs_spark.functions.trajectory import assemble, dedup_monotonic, merge_trajs

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, mmsi, ts, lon, lat): ts#1 duplicated across parities
        (1, 7, t0, 10.0, 1.0),                               # odd, the keeper
        (2, 7, t0, 99.0, 9.0),                               # even duplicate
        (3, 7, t0 + dt.timedelta(hours=1), 11.0, 1.5),
        (4, 7, t0 + dt.timedelta(hours=2), 12.0, 2.0),
        (6, 7, t0 + dt.timedelta(hours=2), 55.0, 5.0),       # same-parity dup
        (5, 7, t0 + dt.timedelta(hours=3), 13.0, 2.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, mmsi long, ts timestamp_ntz, lon double, lat double")

    deduped = dedup_monotonic(df)
    whole = assemble(deduped, min_size=1).select("mmsi", F.col("traj").alias("tw"))
    halves = [
        assemble(deduped.filter(F.col("event_id") % 2 == i), min_size=1).select(
            "mmsi", F.col("traj").alias(f"t{i}")
        )
        for i in (0, 1)
    ]
    j = whole.join(halves[0], "mmsi").join(halves[1], "mmsi")
    merged = merge_trajs(F.col("t0"), F.col("t1"))
    row = j.select((merged["points"] == F.col("tw")["points"]).alias("eq"),
                   F.col("tw")["points"].alias("pts")).first()
    assert row.eq, row
    # the kept duplicate is the min-event_id row (arrival order), and the
    # same-parity duplicate collapsed too
    got = [(p.lon, p.lat) for p in row.pts]
    assert got == [(10.0, 1.0), (11.0, 1.5), (12.0, 2.0), (13.0, 2.5)]


def test_dedup_monotonic_null_ts_matches_qualify_twin(spark):
    """NULL timestamps form ONE group per key in the DEDUP_QUALIFY twin
    (PARTITION BY mmsi, ts): dedup_monotonic must keep exactly one NULL-ts
    row, not all of them (review find, r7)."""
    from meos_rs_spark.functions.trajectory import dedup_monotonic

    df = spark.createDataFrame(
        [(1, 7, None), (2, 7, None), (3, 7, "2024-01-01 00:00:00"), (4, 7, "2024-01-01 00:00:00")],
        "event_id long, mmsi long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    kept = dedup_monotonic(df).select("event_id").orderBy("event_id").collect()
    assert [r.event_id for r in kept] == [1, 3]


# --- interval_stab_max: adversarial contest vs a brute-force stab -----------


def _brute_stab(spans: list[tuple[int, int, float]]) -> dict[int, tuple[int, float]]:
    """O(B·N) reference: for every distinct endpoint ts, (n_active, max_v)
    over spans with t_start <= ts <= t_end (both inclusive)."""
    bounds = sorted({t for a, b, _ in spans for t in (a, b)})
    out = {}
    for ts in bounds:
        hits = [v for a, b, v in spans if a <= ts <= b]
        out[ts] = (len(hits), max(hits))
    return out


def _run_stab(spark, spans: list[tuple[int, int, float]]) -> dict[int, tuple[int, float]]:
    from meos_rs_spark.queries.trajectory import interval_stab_max

    df = spark.createDataFrame(
        [(a, b, v) for a, b, v in spans], "t_start long, t_end long, v double"
    )
    rows = interval_stab_max(df).collect()
    return {r.ts: (r.n_active, r.max_lon) for r in rows}


def test_interval_stab_max_handcrafted_edges(spark):
    """Nested, duplicate, instant, and chained spans — the shapes the AIS
    fixture may never combine: an instant inside a long span, two identical
    spans, a span whose end equals another's start (both active at the
    shared endpoint), and full nesting."""
    spans = [
        (0, 100, 1.0),   # umbrella
        (10, 20, 9.0),   # nested
        (10, 20, 9.0),   # exact duplicate (n_active must count both)
        (15, 15, 5.0),   # instant inside the nest
        (20, 30, 2.0),   # chained: starts where the nest ends
        (100, 100, 7.0), # instant at the umbrella's right edge
    ]
    assert _run_stab(spark, spans) == _brute_stab(spans)


def test_interval_stab_max_randomized_vs_brute(spark):
    """Randomized contest on a rank space big enough to exercise several
    tree levels (fixed seed — deterministic)."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        spans = []
        for i in range(120):
            a = rng.randrange(0, 500)
            b = a if rng.random() < 0.3 else min(499, a + rng.randrange(0, 200))
            spans.append((a, b, float(rng.randrange(-50, 50))))
        assert _run_stab(spark, spans) == _brute_stab(spans), f"trial {trial}"


def test_duplicate_ts_twins_agree_cross_engine(spark, tmp_path):
    """r10 review sweep: six query twins diverged on duplicate-(mmsi, ts)
    data — oracles counted raw posits where the Spark legs dedup (or broke
    ties arbitrarily). The fixtures are duplicate-free, so the driver gate
    can never catch a regression here; this synthetic events table has a
    duplicate pair straddling the traj_merge parity halves, one at a
    bracketing boundary, and one at a session start, and every fixed twin
    must agree exactly."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from meos_rs_spark.registry import load_registry
    from tests.oracle import compare

    def ev(eid, mmsi, ts, lon, lat):
        import json

        return (eid, pd.Timestamp(ts), mmsi, "posit", lon, json.dumps({"k": lat}))

    rows = [
        # vessel 7: duplicate ts at 00:10 across even/odd event parity
        # (merge stored-side-wins), plus a duplicate at the midpoint
        # bracket; 8h gap -> two sessions with the second session's start
        # duplicated (spanset running-sum tiebreak)
        ev(0, 7, "2024-01-01 00:00:00", 0.0, 0.0),
        ev(2, 7, "2024-01-01 00:10:00", 3.0, 4.0),
        ev(3, 7, "2024-01-01 00:10:00", 9.0, 9.0),   # dup ts, odd parity
        ev(4, 7, "2024-01-01 01:00:00", 6.0, 8.0),
        ev(5, 7, "2024-01-01 09:00:00", 7.0, 7.0),   # session 2 start...
        ev(6, 7, "2024-01-01 09:00:00", 1.0, 1.0),   # ...duplicated
        ev(8, 7, "2024-01-01 10:00:00", 2.0, 2.0),
        # vessel 9: its ONLY two posits share one ts — oracle must call it
        # an Instant (1 deduped point), not a Sequence
        ev(9, 9, "2024-01-02 00:00:00", 5.0, 5.0),
        ev(11, 9, "2024-01-02 00:00:00", 6.0, 6.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path / 'events.parquet'}'"
    )
    reg = load_registry()
    fixed = [
        "traj_accessors",
        "traj_length_speed",
        "traj_value_at_time",
        "traj_interp_mixed",
        "traj_spanset_coverage",
        "traj_merge",
        "traj_assembly",  # control: was already dedup-correct
    ]
    for name in fixed:
        sdf = reg[name].fn(spark, str(tmp_path))
        ddf = con.sql(reg[name].oracle).df()
        issues = compare(sdf, ddf, name)
        assert not issues, issues
    # and the dedup semantics themselves: vessel 9 is an Instant post-dedup
    acc = {r.mmsi: r for r in reg["traj_accessors"].fn(spark, str(tmp_path)).collect()}
    assert acc[9].subtype == "Instant" and acc[9].n_instants == 1
    assert acc[7].n_instants == 5  # 7 posits, 2 dropped as dup-ts


def test_resample_max_span_gate_and_preepoch_alignment(
    spark, tmp_path_factory
):
    """r14 VERDICT item 4 (extremes contract #4): one corrupt 1901→9999
    segment used to expand to ~11.8M grid markers and OOM-wedge the JVM.
    The 366-day max-span validity gate drops such a segment in BOTH legs
    — zero markers, job completes. Also pins the pre-epoch grid anchor:
    integer division truncates toward zero in both engines, so the old
    (p+s-1) DIV s ceiling SKIPPED the true first grid instant of a
    negative-micros segment; the pmod form is exact ceiling on the whole
    timeline (vessel 3's 12:00 marker is the witness — trunc-div starts
    at 18:00)."""
    import datetime as dt
    import json as _json

    import duckdb

    import __spark_entry__ as entry

    base = str(tmp_path_factory.mktemp("resample"))
    rows = [
        # vessel 1: ordinary 13 h segment → markers at 06:00 and 12:00
        (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
        (2, 1, "2024-01-01 13:00:00", 13.0, 26.0),
        # vessel 2: the corrupt 8099-year segment → gated, NO markers
        (3, 2, "1901-01-01 00:00:00", 1.0, 1.0),
        (4, 2, "9999-12-30 00:00:00", 2.0, 2.0),
        # vessel 3: pre-epoch 13 h segment ending before the epoch
        (5, 3, "1969-12-31 10:00:00", 0.0, 0.0),
        (6, 3, "1969-12-31 23:00:00", 13.0, 26.0),
    ]
    df = spark.createDataFrame(
        [
            (eid, ts, uid, "posit", lon, _json.dumps({"k": lat}))
            for eid, uid, ts, lon, lat in rows
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
        "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(base + "/events.parquet")

    got = (
        entry.queries()["traj_resample_linear"](spark, base)
        .orderBy("mmsi", "g")
        .collect()
    )
    as_tuples = [(r.mmsi, r.g, r.lon_i, r.lat_i) for r in got]
    assert as_tuples == [
        # vessel 1's first posit is exactly ON the grid → frac-0 marker
        (1, dt.datetime(2024, 1, 1, 0), 0.0, 0.0),
        (1, dt.datetime(2024, 1, 1, 6), 6.0, 12.0),
        (1, dt.datetime(2024, 1, 1, 12), 12.0, 24.0),
        # vessel 2 gated out entirely; vessel 3 keeps BOTH pre-epoch
        # markers, including the 12:00 one trunc-div ceiling skipped
        (3, dt.datetime(1969, 12, 31, 12), 2.0, 4.0),
        (3, dt.datetime(1969, 12, 31, 18), 8.0, 16.0),
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{base}/events.parquet/*.parquet'"
    )
    duck = con.sql(
        entry.oracle_sql()["traj_resample_linear"] + " ORDER BY mmsi, g"
    ).fetchall()
    assert [tuple(r) for r in duck] == as_tuples
