"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R8_EXPECTED_HEAD pins the tuple
the r1-r7 artifacts produce; when the driver lands CORRECTNESS_r08.json the
pin goes stale and this test fails — the next round's first task is then
reviewing the freshly computed rotation and re-pinning it here.
"""

from __future__ import annotations

import __spark_entry__ as entry
from meos_rs_spark.registry import (
    DRIVER_WINDOW,
    compute_verify_head,
    load_registry,
    verify_order_head,
)

# Round-8 rotation computed from CORRECTNESS_r01..r07: zero reds, zero
# never-checked, then FORCE_VERIFY (the overlap-join scale rewrite, the
# tmax interval-tree rewrite, the adaptive-bucket LSH family, the
# sorted-merge as-of joins, and the fan_out/map-side rewrites of hull +
# fingerprint re-earning rows), then oldest-green refill: the 20 remaining
# r3-era greens followed by the oldest r4-era greens, registration order
# within each round.
R8_EXPECTED_HEAD = (
    "box_stbox_overlap_join",
    "traj_tmax_sweep",
    "sim_embedding_neardup",
    "sim_knn_graph",
    "sim_pagerank",
    "text_fingerprint",
    "rel_join_asof",
    "rel_join_asof_nearest",
    "traj_convex_hull",
    "rel_correlated_subquery",
    "rel_salted_agg",
    "rel_disjunctive_join",
    "scalar_strings",
    "scalar_dates",
    "scalar_ts_roundtrip",
    "scalar_math",
    "scalar_case_coalesce",
    "scalar_json",
    "scalar_arrays",
    "scalar_regexp",
    "scalar_maps",
    "trajsim_hausdorff",
    "trajsim_nearest_approach",
    "win_rownum_truncate",
    "win_rank_dense",
    "win_lead_gap",
    "win_rolling_frame",
    "win_running_total",
    "win_ntile_first_last",
    "box_stbox_z",
    "box_stbox_expand",
    "box_tbox_algebra",
    "dedup_components",
    "serde_hexwkb",
    "serde_mfjson_ingest",
    "serde_wkb_roundtrip",
    "traj_stbox_z_path",
    "traj_sessionize",
    "traj_simplify_dp",
    "traj_spanset_coverage",
    "traj_tbool_duration",
    "traj_minus_box",
    "traj_tcount_sweep",
    "traj_tcentroid",
    "traj_twavg",
    "traj_resample_linear",
    "traj_at_value",
    "traj_cumulative_length",
    "traj_interp_mixed",
    "serde_e2e_pipeline",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round8_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R8_EXPECTED_HEAD


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
