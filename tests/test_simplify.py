"""Golden tests for Douglas-Peucker simplification (L2d), hand-built curves."""

from __future__ import annotations

import numpy as np

from meos_rs_spark.functions.simplify import douglas_peucker_mask


def test_straight_line_collapses_to_endpoints():
    pts = np.array([[float(i), 0.0] for i in range(10)])
    keep = douglas_peucker_mask(pts, epsilon=0.5)
    assert keep.tolist() == [True] + [False] * 8 + [True]


def test_spike_is_kept():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 5.0], [3.0, 0.0], [4.0, 0.0]])
    keep = douglas_peucker_mask(pts, epsilon=1.0)
    assert keep[0] and keep[-1] and keep[2]  # the spike survives
    assert not keep[1] and not keep[3]  # collinear-ish points dropped


def test_epsilon_zero_keeps_everything_nonlinear():
    pts = np.array([[0.0, 0.0], [1.0, 0.1], [2.0, -0.1], [3.0, 0.0]])
    keep = douglas_peucker_mask(pts, epsilon=0.0)
    assert keep.all()


def test_degenerate_inputs():
    assert douglas_peucker_mask(np.empty((0, 2)), 1.0).tolist() == []
    assert douglas_peucker_mask(np.array([[1.0, 1.0]]), 1.0).tolist() == [True]
    # duplicate endpoints (zero-length segment) must not divide by zero
    pts = np.array([[1.0, 1.0], [2.0, 3.0], [1.0, 1.0]])
    keep = douglas_peucker_mask(pts, epsilon=0.5)
    assert keep[0] and keep[-1] and keep[1]


def test_spark_query_matches_local(spark):
    from meos_rs_spark.functions.trajectory import posits_xy
    from meos_rs_spark.registry import load_registry
    from tests.conftest import SF_SMOKE

    rows = {r.mmsi: r for r in load_registry()["traj_simplify_dp"].fn(spark, SF_SMOKE).collect()}
    pts = posits_xy(spark, SF_SMOKE).orderBy("ts", "event_id").collect()
    by_id: dict[int, list] = {}
    for r in pts:
        by_id.setdefault(r.mmsi, []).append((r.lon, r.lat, r.event_id))
    for mmsi in list(by_id)[:3]:
        arr = np.array([(x, y) for x, y, _ in by_id[mmsi]])
        keep = douglas_peucker_mask(arr, 5.0)
        expected = [eid for (_, _, eid), k in zip(by_id[mmsi], keep) if k]
        assert rows[mmsi].kept_event_ids == ",".join(str(e) for e in expected)
        assert rows[mmsi].n_simplified == int(keep.sum())


def test_kept_ids_string_is_total_on_null_ids():
    """r14 adversarial sweep find: a NULL event_id row (the r12
    restart-split corner) aborted the whole applyInPandas stage through
    int(None)/int(nan). Both legs render NULL ids as the literal 'null'
    through this one shared function."""
    import numpy as np
    import pandas as pd

    from meos_rs_spark.functions.simplify import kept_ids_string

    assert kept_ids_string(np.array([3, 1, 2])) == "3,1,2"
    assert kept_ids_string(np.array([1.0, np.nan, 2.0])) == "1,null,2"
    assert kept_ids_string(np.array([None, 7], dtype=object)) == "null,7"
    assert kept_ids_string(pd.array([1, pd.NA], dtype="Int64")) == "1,null"
    assert kept_ids_string([]) == ""


def test_kept_ids_string_rejects_bit_lossy_floats():
    """r14 ADVICE item 1: a NULL in the group coerces event_id to float64,
    where ids >= 2**53 lose bits — int(float) then MISNAMES the kept
    posit. Lossy floats render 'null'; exact int64 ids (python or numpy,
    any magnitude) still render their full digits."""
    import numpy as np

    from meos_rs_spark.functions.simplify import kept_ids_string

    big = 2**53 + 1  # not representable in float64
    assert kept_ids_string([np.float64(big)]) == "null"
    assert kept_ids_string([float(2**53)]) == "null"  # boundary: coerced
    assert kept_ids_string([2.5]) == "null"  # non-integral
    assert kept_ids_string([np.float64(2**53 - 1)]) == str(2**53 - 1)
    # int-typed ids are exact at any magnitude — no guard applies
    assert kept_ids_string([big, np.int64(2**62)]) == f"{big},{2**62}"
    # r15 ADVICE: the threshold is per-dtype — float32 loses integer
    # exactness at 2**24, so a float32-coerced id at or past it renders
    # 'null' rather than the post-coercion value (unreachable from
    # pandas' float64-widening coercion today, but the docstring's
    # invariant now matches the guard)
    assert kept_ids_string([np.float32(2**24)]) == "null"
    assert kept_ids_string([np.float32(2**24 - 1)]) == str(2**24 - 1)
    assert kept_ids_string([np.float16(2**11)]) == "null"
    assert kept_ids_string([np.float16(2**11 - 1)]) == str(2**11 - 1)
