"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R15_EXPECTED_HEAD pins the tuple
the r1-r14 artifacts produce; when the driver lands CORRECTNESS_r15.json the
pin goes stale and this test fails — the next round's first task is then
reviewing the freshly computed rotation and re-pinning it here. Per r9
ADVICE, any commit that changes the computed head (a new CORRECTNESS
artifact OR a registry change) must carry the matching re-pin in the SAME
commit so the gate never goes red between commits.
"""

from __future__ import annotations

import __spark_entry__ as entry
from meos_rs_spark.registry import (
    DRIVER_WINDOW,
    compute_verify_head,
    load_registry,
    verify_order_head,
)

# Round-15 rotation computed from CORRECTNESS_r01..r14: zero reds, zero
# never-checked. The 46 oracle-alignment swaps (TRY_CAST(props AS JSON) in
# the posit CTEs — every changed-oracle query whose latest driver row
# predates r14; the 21 r14-fresh ones ride the normal rotation — plus the
# two scalar-oracle raw sites found in the r15 review) slot first via
# FORCE_VERIFY in registration order; the remaining 4 are oldest-green
# refill — the 4 oldest r8 greens.
R15_EXPECTED_HEAD = (
    "box_stbox_z",
    "box_stbox_overlap_join",
    "box_stbox_overlap_banded",
    "box_stbox_expand",
    "serde_wkt_roundtrip",
    "serde_mfjson",
    "serde_mfjson_ingest",
    "serde_wkb_roundtrip",
    "serde_wkt_forms",
    "serde_wkt_seqset",
    "traj_assembly",
    "traj_extent",
    "traj_stbox_z_path",
    "traj_accessors",
    "traj_length_speed",
    "traj_value_at_time",
    "traj_shift_scale",
    "traj_time_buckets",
    "traj_azimuth",
    "traj_speed_segments",
    "traj_at_box",
    "traj_project_mercator",
    "traj_length_haversine",
    "traj_minus_box",
    "traj_stops",
    "traj_tcentroid",
    "traj_resample_linear",
    "traj_unnest_instants",
    "traj_space_time_grid",
    "traj_speed_filter",
    "traj_cumulative_length",
    "traj_geofence_events",
    "traj_turning_points",
    "traj_interp_mixed",
    "traj_od_matrix",
    "traj_zorder_key",
    "traj_ewma",
    "serde_e2e_pipeline",
    "src_python_datasource",
    "scalar_json",
    "scalar_try_arith",
    "trajsim_hausdorff",
    "trajsim_nearest_approach",
    "trajsim_nearest_instant",
    "trajsim_tdwithin",
    "trajsim_tdistance",
    "scalar_dates",
    "scalar_math",
    "scalar_case_coalesce",
    "scalar_arrays",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round15_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R15_EXPECTED_HEAD


def test_head_priority_rule():
    """Never-checked before green, and unforced greens oldest-round-first."""
    from meos_rs_spark.registry import FORCE_VERIFY, _correctness_history

    names = list(load_registry())
    latest = _correctness_history()
    head = compute_verify_head(names)
    # every never-checked query is in the head (backlog fits the window)
    never = [n for n in names if n not in latest]
    assert len(never) <= 50
    assert set(never) <= set(head)
    # every forced (changed-this-round) green is in the head too
    assert {n for n in FORCE_VERIFY if n in latest} <= set(head)
    # unforced greens in the head appear oldest round first...
    green_rounds = [
        latest[n][0] for n in head if n in latest and n not in FORCE_VERIFY
    ]
    assert green_rounds == sorted(green_rounds)
    # ...and none is newer than any green left out of the window
    left_out = [latest[n][0] for n in names if n in latest and n not in set(head)]
    if green_rounds and left_out:
        assert max(green_rounds) <= min(left_out)


def test_ordering_preserves_the_full_registry():
    names = list(entry.queries())
    assert set(names) == set(load_registry())
    assert len(names) == len(set(names))
    # every oracle key is a registered query
    assert set(entry.oracle_sql()) <= set(names)
