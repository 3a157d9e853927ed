"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R17_EXPECTED_HEAD pins the tuple
the r1-r16 artifacts produce; when the driver lands CORRECTNESS_r17.json the
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

# Round-17 rotation computed from CORRECTNESS_r01..r16: zero reds, zero
# never-checked, zero forced (optimization round — no semantics change, so
# FORCE_VERIFY is empty). Pure oldest-green rotation: the 4 remaining r10
# greens first, then the 27 r11 greens, then the oldest 19 of the r12 block
# up to the 50-row window.
R17_EXPECTED_HEAD = (
    "scalar_ts_roundtrip",
    "ttype_ttext_ops",
    "win_lead_gap",
    "win_rolling_median",
    "box_tbox_predicates",
    "box_int_to_tbox",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_normalized",
    "src_catalog_bootstrap",
    "snk_partitioned_write",
    "snk_bucketed_join",
    "text_langid",
    "stream_restart_recovery",
    "rel_projection_rename",
    "rel_group_having",
    "rel_pricing_summary",
    "rel_join_inner_broadcast",
    "rel_join_left_outer",
    "rel_join_full_outer",
    "rel_lateral_topn",
    "rel_approx_distinct",
    "rel_approx_percentiles",
    "scalar_bitwise",
    "win_percent_rank_cume",
    "win_range_interval",
    "win_event_transitions",
    "win_running_distinct",
    "win_gap_islands",
    "mm_metadata",
    "mm_audio_features",
    "mm_resize",
    "mm_frame_sample",
    "mm_decode_features",
    "mm_jpeg_features",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_embedding_neardup",
    "sim_ann_ivf",
    "sim_kmeans_iter",
    "sim_ann_recall",
    "sim_prefix_rerank",
    "sim_knn_graph",
    "sim_pq_ann",
    "sim_pagerank",
    "dedup_semantic",
    "sim_mmr_rerank",
    "sim_ann_multiprobe",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round17_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R17_EXPECTED_HEAD


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
