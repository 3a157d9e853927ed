"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R11_EXPECTED_HEAD pins the tuple
the r1-r10 artifacts produce; when the driver lands CORRECTNESS_r11.json the
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

# Round-11 rotation computed from CORRECTNESS_r01..r10: zero reds, zero
# never-checked EXCEPT the new stream_restart_recovery (r10 VERDICT item
# 6's registered restart-recovery shape — leads as never-checked), then the
# nine r11 forced entries (the ADVICE both-hemispheres domain fix, the
# review sweep's two NULL-ordering alignments, and batch 2's four
# abort-on-one-bad-row / cast-grammar fixes plus batch 3's strict-gap
# session-window oracle alignment; each re-earns a row), then pure
# oldest-green refill: the 6 r5-era greens and all 34 r6-era greens,
# registration order within each round.
R11_EXPECTED_HEAD = (
    "stream_restart_recovery",
    "serde_mfjson_ingest",
    "traj_transform_utm_roundtrip",
    "traj_at_value",
    "src_python_datasource",
    "stream_session_windows",
    "rel_approx_percentiles",
    "scalar_json",
    "scalar_try_arith",
    "win_percent_rank_cume",
    "scalar_bitwise",
    "win_range_interval",
    "win_event_transitions",
    "win_running_distinct",
    "win_gap_islands",
    "box_tbox_predicates",
    "box_int_to_tbox",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_normalized",
    "flagship_trip_pipeline",
    "mm_metadata",
    "mm_audio_features",
    "mm_decode_features",
    "traj_unnest_instants",
    "traj_speed_filter",
    "traj_turning_points",
    "traj_zorder_key",
    "traj_ewma",
    "snk_jsonl_trips",
    "src_catalog_bootstrap",
    "snk_partitioned_write",
    "snk_bucketed_join",
    "text_langid",
    "stream_tumbling_counts",
    "stream_stateful_assembly",
    "stream_sliding_counts",
    "stream_dedup_watermark",
    "rel_projection_rename",
    "rel_group_having",
    "rel_pricing_summary",
    "rel_join_inner_broadcast",
    "rel_join_left_outer",
    "rel_join_full_outer",
    "rel_lateral_topn",
    "rel_approx_distinct",
    "mm_resize",
    "mm_frame_sample",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round11_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R11_EXPECTED_HEAD


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
