"""Driver-window ordering: the driver records CORRECTNESS rows for the
FIRST 50 entries of __spark_entry__.queries() only (observed in r2), so the
round's verification targets must occupy exactly those positions.

Since round 6 the head is COMPUTED from the committed CORRECTNESS_r*.json
artifacts (registry.compute_verify_head). R16_EXPECTED_HEAD pins the tuple
the r1-r15 artifacts produce; when the driver lands CORRECTNESS_r16.json the
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

# Round-16 rotation computed from CORRECTNESS_r01..r15: zero reds, zero
# never-checked. The 8 event-time streaming twins slot first via
# FORCE_VERIFY (registration order) — their semantics changed this round
# (the shared ingest sanity-horizon gate in both legs) — followed by
# traj_convex_hull (its golden oracle regenerated for the
# machine-independent fsum shoelace, r16 inherited-state fix); the
# remaining 41 are pure oldest-green rotation (r8/r9 greens first, then
# r10, then the oldest r11 block up to the 50-row window —
# scalar_ts_roundtrip rotated out when the forced hull entry took a slot).
R16_EXPECTED_HEAD = (
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_stateful_assembly",
    "stream_stateful_evicting",
    "stream_sliding_counts",
    "stream_dedup_watermark",
    "stream_foreachbatch_sink",
    "stream_interval_join",
    "traj_convex_hull",
    "scalar_regexp",
    "scalar_maps",
    "win_rownum_truncate",
    "win_rank_dense",
    "win_rolling_frame",
    "win_running_total",
    "win_ntile_first_last",
    "dedup_minhash_estimate",
    "dedup_containment",
    "src_partition_pruning",
    "src_schema_evolution",
    "src_orc_roundtrip",
    "snk_compaction",
    "snk_cdc_apply",
    "text_repetition",
    "text_curation_pipeline",
    "text_top_ngrams",
    "text_chunking",
    "text_entropy",
    "text_pii_scrub",
    "text_gopher_rules",
    "stream_doc_curation",
    "stream_fingerprint_dedup",
    "rel_conditional_agg",
    "rel_bloom_join",
    "rel_bitmap_distinct",
    "text_quality",
    "text_tfidf_topterms",
    "text_unigram_logprob",
    "dedup_chunk_level",
    "rel_pivot",
    "rel_percentiles",
    "rel_grouping_sets",
    "rel_salted_join",
    "rel_cohort_retention",
    "rel_scd2_intervals",
    "text_hash_split",
    "text_quota_sample",
    "text_shard_packing",
    "text_length_histogram",
    "text_mixture_weights",
)


def test_head_is_exactly_the_driver_window():
    head = verify_order_head()
    assert len(head) == DRIVER_WINDOW == 50
    assert len(set(head)) == 50
    names = list(entry.queries())
    assert tuple(names[:50]) == head


def test_computed_head_matches_the_round16_pin():
    # Stale-pin alarm: fails as soon as a new CORRECTNESS artifact lands,
    # forcing the next round to review + re-pin the rotation.
    assert verify_order_head() == R16_EXPECTED_HEAD


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
