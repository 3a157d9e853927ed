"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R10_EXPECTED_HEAD pins the tuple
the r1-r9 artifacts produce; when the driver lands CORRECTNESS_r10.json the
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

# Round-10 rotation computed from CORRECTNESS_r01..r09: two never-checked
# lead in registration order (traj_transform_utm_roundtrip, the CRS
# forward∘inverse invariant, and stream_stateful_evicting, the eviction
# deployment recipe — r9 VERDICT item 3), then the thirty-nine r10
# FORCE_VERIFY entries (the review sweeps' oracle-semantics alignments —
# duplicate-timestamp dedup/tiebreaks, as-of struct extrema, NULL frame
# handling — plus the overlap-join exchange backport and the un-hinted
# SF-scaled broadcasts; each re-earns a driver row), then pure
# oldest-green refill (r5-era then oldest r6-era, registration order
# within each round).
R10_EXPECTED_HEAD = (
    "traj_transform_utm_roundtrip",
    "stream_stateful_evicting",
    "box_stbox_overlap_join",
    "serde_wkt_roundtrip",
    "serde_mfjson",
    "serde_hexwkb",
    "serde_mfjson_ingest",
    "serde_wkb_roundtrip",
    "serde_wkt_forms",
    "traj_merge",
    "traj_accessors",
    "traj_length_speed",
    "traj_value_at_time",
    "traj_spanset_coverage",
    "traj_interp_mixed",
    "serde_e2e_pipeline",
    "src_python_datasource",
    "src_binaryfile_ingest",
    "snk_jdbc_upsert",
    "text_quality",
    "text_tfidf_topterms",
    "text_unigram_logprob",
    "dedup_chunk_level",
    "rel_join_asof",
    "rel_pivot",
    "rel_percentiles",
    "rel_join_asof_nearest",
    "text_shard_packing",
    "scalar_ts_roundtrip",
    "ttype_tint_step",
    "ttype_ttext_ops",
    "ttype_tbool_algebra",
    "ttype_tfloat_sync_arith",
    "trajsim_hausdorff",
    "trajsim_dtw_frechet",
    "trajsim_nearest_instant",
    "trajsim_tdwithin",
    "trajsim_tdistance",
    "trajsim_lcss_erp",
    "win_lead_gap",
    "win_rolling_median",
    "rel_grouping_sets",
    "rel_salted_join",
    "rel_cohort_retention",
    "rel_scd2_intervals",
    "text_hash_split",
    "text_quota_sample",
    "text_length_histogram",
    "text_mixture_weights",
    "scalar_try_arith",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round10_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R10_EXPECTED_HEAD


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
