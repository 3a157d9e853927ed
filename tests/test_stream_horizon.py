"""Event-time ingest sanity-horizon witnesses (r16, r15 VERDICT item 3).

The value-extremes sweep measured two ways one corrupt event-time kills a
streaming deployment: a year-9999 instant ABORTS the Pandas-worker
stateful stage (applyInPandasWithState converts Arrow→pandas inside the
engine, whose ns epoch ends at 2262), and a far-future sentinel CATAPULTS
the watermark so later well-formed rows silently drop (the r12-adjudicated
contract #3 DIVERGE). Both are retired by the shared ingest horizon
(queries/streaming.py TS_HORIZON_*/STREAM_EVENTS_CTE) applied symmetrically
in the Spark leg and every event-time oracle. These witnesses pin:

1. the formerly-ABORTing stateful operator runs END-TO-END over a fixture
   carrying the exact corrupt rows, and matches its oracle;
2. the formerly-DIVERGING watermark dedup matches its oracle on the same
   fixture (the sentinel can no longer catapult the watermark);
3. the gate is a NO-OP on every real driver fixture (zero rows dropped),
   so driver correctness hashes are unaffected by construction.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest

from meos_rs_spark.queries.streaming import (
    STREAM_EVENTS_CTE,
    TS_HORIZON_CEIL,
    TS_HORIZON_FLOOR,
)

SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]


@pytest.fixture(scope="module")
def horizon_dir(tmp_path_factory):
    """Micro events fixture carrying the extremes classes: a year-9999
    sentinel (ns-overflow in the Pandas worker AND watermark catapult), a
    pre-horizon medieval row, a NULL event-time, and well-formed rows —
    including a duplicate (user_id, ts) pair so the dedup twin has work."""
    d = tmp_path_factory.mktemp("horizon_events")
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # event_id, ts, user_id, event_type, value
        (1, t0, 7, "view", 1.0),
        (2, t0 + dt.timedelta(hours=1), 7, "purchase", 2.0),
        (3, t0 + dt.timedelta(hours=1), 7, "purchase", 2.5),  # dup (user, ts)
        (4, t0 + dt.timedelta(days=2), 9, "view", 3.0),
        (5, dt.datetime(9999, 12, 31), 9, "view", 4.0),  # far-future sentinel
        (6, dt.datetime(1499, 1, 1), 7, "view", 5.0),  # pre-horizon
        (7, None, 9, "view", 6.0),  # NULL event-time
        (8, t0 + dt.timedelta(days=2, hours=3), 9, "purchase", 7.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = "{}"
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        os.path.join(str(d), "events.parquet"),
    )
    return str(d)


def _oracle_frame(horizon_dir: str, oracle: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{horizon_dir}/events.parquet'"
    )
    return con.sql(oracle).df()


def test_stateful_assembly_survives_corrupt_event_times(spark, horizon_dir):
    """Witness 1: the applyInPandasWithState operator that ABORTed on the
    extremes fixture (ArrowInvalid inside the worker) runs to completion
    over the same corrupt classes and equals its gated oracle."""
    from meos_rs_spark.registry import load_registry
    from tests.oracle import compare

    spec = load_registry()["stream_stateful_assembly"]
    issues = compare(
        spec.fn(spark, horizon_dir),
        _oracle_frame(horizon_dir, spec.oracle),
        "stream_stateful_assembly",
    )
    assert issues == [], issues


def test_dedup_watermark_immune_to_catapult(spark, horizon_dir):
    """Witness 2: with the sentinel gated at ingest the watermark can no
    longer catapult, so the formerly-DIVERGING dedup twin matches its
    oracle exactly — including the well-formed rows that used to drop."""
    from meos_rs_spark.registry import load_registry
    from tests.oracle import compare

    spec = load_registry()["stream_dedup_watermark"]
    issues = compare(
        spec.fn(spark, horizon_dir),
        _oracle_frame(horizon_dir, spec.oracle),
        "stream_dedup_watermark",
    )
    assert issues == [], issues
    # and the retained counts prove the gate dropped ONLY the corrupt rows:
    # user 7 keeps {t0, t0+1h dedup'd} = 2 uniques, user 9 keeps 2 of 4
    got = dict(
        _oracle_frame(horizon_dir, spec.oracle).itertuples(index=False)
    )
    assert got == {7: 2, 9: 2}


def test_horizon_is_a_noop_on_driver_fixtures():
    """Witness 3: zero rows of any real fixture fall outside the horizon,
    so the gate cannot move a driver correctness hash."""
    for sf_dir in SF_DIRS:
        (dropped,) = duckdb.sql(
            f"""SELECT count(*) FROM '{sf_dir}/events.parquet'
                WHERE ts IS NULL
                   OR ts < TIMESTAMP '{TS_HORIZON_FLOOR}'
                   OR ts >= TIMESTAMP '{TS_HORIZON_CEIL}'"""
        ).fetchone()
        assert dropped == 0, (sf_dir, dropped)


def test_horizon_bounds_sit_inside_pandas_ns_epoch():
    """The gate's purpose is Pandas-worker representability: both bounds
    must stay strictly inside datetime64[ns]'s 1677-09-21..2262-04-11."""
    floor = pd.Timestamp(TS_HORIZON_FLOOR)  # raises if out of ns range
    ceil = pd.Timestamp(TS_HORIZON_CEIL)
    assert pd.Timestamp.min < floor < ceil < pd.Timestamp.max
    # and the CTE text embeds exactly these bounds (legs cannot drift)
    assert TS_HORIZON_FLOOR in STREAM_EVENTS_CTE
    assert TS_HORIZON_CEIL in STREAM_EVENTS_CTE
