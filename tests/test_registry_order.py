"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R9_EXPECTED_HEAD pins the tuple
the r1-r8 artifacts produce; when the driver lands CORRECTNESS_r09.json the
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

# Round-9 rotation computed from CORRECTNESS_r01..r08: zero reds, one
# never-checked (box_stbox_overlap_banded — NEW this round, r8 VERDICT
# item 6), zero forced (all nine r8 rewrites re-earned green r8 rows,
# FORCE_VERIFY cleared), then pure oldest-green refill: the 24 remaining
# r4-era greens followed by the oldest r5-era greens, registration order
# within each round (rel_grouping_sets drops out to make room).
R9_EXPECTED_HEAD = (
    "box_stbox_overlap_banded",
    "sim_ann_ivf",
    "sim_pq_ann",
    "sim_ann_multiprobe",
    "src_partition_pruning",
    "src_schema_evolution",
    "src_orc_roundtrip",
    "src_csv_malformed",
    "src_python_datasource",
    "src_binaryfile_ingest",
    "snk_compaction",
    "snk_cdc_apply",
    "snk_jdbc_upsert",
    "rel_conditional_agg",
    "rel_bloom_join",
    "rel_bitmap_distinct",
    "ttype_tint_step",
    "ttype_ttext_ops",
    "ttype_tbool_algebra",
    "ttype_tfloat_sync_arith",
    "trajsim_dtw_frechet",
    "trajsim_nearest_instant",
    "trajsim_tdwithin",
    "trajsim_tdistance",
    "trajsim_lcss_erp",
    "dedup_minhash_estimate",
    "dedup_containment",
    "traj_stops",
    "traj_space_time_grid",
    "traj_geofence_events",
    "traj_od_matrix",
    "sim_kmeans_iter",
    "sim_ann_recall",
    "dedup_semantic",
    "stream_interval_join",
    "stream_doc_curation",
    "stream_fingerprint_dedup",
    "text_repetition",
    "text_curation_pipeline",
    "text_top_ngrams",
    "text_tfidf_topterms",
    "text_chunking",
    "text_unigram_logprob",
    "dedup_chunk_level",
    "text_entropy",
    "text_pii_scrub",
    "text_gopher_rules",
    "rel_pivot",
    "rel_unpivot",
    "rel_percentiles",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round9_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R9_EXPECTED_HEAD


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
