"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers one named query
(`(spark, sf_dir) -> DataFrame`) plus, where SQL-expressible, a DuckDB oracle
string. The driver hashes both sides (row count + schema + order-insensitive
value hash), so specs here follow strict determinism rules:

  * alias every computed column identically in Spark and SQL;
  * money aggregations go through DECIMAL casts before SUM so the result is
    associative (shuffle-order-independent) and engine-identical, then CAST
    back to DOUBLE;
  * no ROUND(double, n) on potentially-exact-binary inputs (HALF_UP vs
    half-even divergence); floats rendered to strings use printf-style
    formatting on both engines;
  * timestamps in outputs are TIMESTAMP_NTZ (Spark) vs naive TIMESTAMP
    (DuckDB), both microsecond precision;
  * every ORDER BY ... LIMIT k carries a total tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with its optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# --- driver verification window (rotated per round) -------------------------
#
# The driver records CORRECTNESS rows for only the FIRST 50 entries of
# ``__spark_entry__.queries()`` (observed: CORRECTNESS_r02.json is exactly
# registration positions 0-49). Round-5 composition: round 4 came back 50/50
# green with zero reds to re-check, so this round's window is 50 of the 60
# queries that have never held a driver row (the whole remaining backlog
# minus 10 deferrals). The 10 deferred to round 6 are exactly the
# never-checked queries whose SURVEY §2 operator row ALREADY carries a green
# driver member (lowest marginal information): rel_approx_distinct,
# rel_approx_percentiles, rel_lateral_topn, rel_join_asof_nearest,
# dedup_normalized, traj_zorder_key, traj_ewma, traj_unnest_instants,
# traj_speed_filter, traj_turning_points.
VERIFY_ORDER_HEAD: tuple[str, ...] = (
    # windows battery (6 never-checked members of the W row)
    "win_percent_rank_cume",
    "win_range_interval",
    "win_gap_islands",
    "win_event_transitions",
    "win_running_distinct",
    "win_rolling_median",
    # scalar battery stragglers
    "scalar_try_arith",
    "scalar_bitwise",
    # grouping-sets / pivot family + analytic rel queries
    "rel_grouping_sets",
    "rel_pivot",
    "rel_unpivot",
    "rel_percentiles",
    "rel_salted_join",
    "rel_funnel_steps",
    "rel_cohort_retention",
    "rel_scd2_intervals",
    # dedup fidelity tier (operator rows with zero green member)
    "dedup_minhash_estimate",
    "dedup_containment",
    "dedup_chunk_level",
    "dedup_semantic",
    # similarity graph / clustering / recall tier (zero green member)
    "sim_knn_graph",
    "sim_kmeans_iter",
    "sim_ann_recall",
    "sim_prefix_rerank",
    "sim_pagerank",
    "sim_mmr_rerank",
    # text battery (Gopher/entropy/TF-IDF/decontamination + sampling family)
    "text_gopher_rules",
    "text_entropy",
    "text_repetition",
    "text_unigram_logprob",
    "text_tfidf_topterms",
    "text_top_ngrams",
    "text_pii_scrub",
    "text_decontaminate",
    "text_chunking",
    "text_hash_split",
    "text_quota_sample",
    "text_shard_packing",
    "text_length_histogram",
    "text_mixture_weights",
    "text_curation_pipeline",
    # trajectory L2d/L2h stragglers
    "traj_stops",
    "traj_geofence_events",
    "traj_space_time_grid",
    "traj_od_matrix",
    # multimodal geometry contracts
    "mm_resize",
    "mm_frame_sample",
    # streaming stragglers
    "stream_interval_join",
    "stream_doc_curation",
    "stream_fingerprint_dedup",
)


# ROUND-6 ROTATION (do this FIRST in the r6 session): keep any r5 REDs
# first, then the final never-checked queries —
#   rel_approx_distinct rel_approx_percentiles rel_lateral_topn
#   rel_join_asof_nearest dedup_normalized traj_zorder_key traj_ewma
#   traj_unnest_instants traj_speed_filter traj_turning_points
# plus any queries added in r5 (traj_transform_lcc) and r6; after that the
# backlog is CLEAR — refill the remaining 39 slots with the oldest green
# rows for re-verification. Computed from the CORRECTNESS artifacts (last
# check r1/r2, oldest round first then registration order):
#   box_tbox_predicates box_int_to_tbox box_stbox_overlap_join dedup_exact
#   dedup_minhash_lsh dedup_simhash dedup_ngram_jaccard
#   flagship_trip_pipeline mm_metadata serde_wkt_roundtrip serde_mfjson
#   serde_wkt_forms serde_wkt_seqset sim_cosine_topk sim_ann_lsh
#   sim_embedding_neardup snk_jsonl_trips snk_upsert_merge
#   src_catalog_bootstrap snk_partitioned_write snk_bucketed_join
#   stream_tumbling_counts stream_session_windows stream_stateful_assembly
#   stream_sliding_counts stream_dedup_watermark stream_foreachbatch_sink
#   text_quality text_langid text_token_count text_fingerprint
#   rel_projection_rename rel_group_having rel_pricing_summary
#   rel_join_inner_broadcast rel_join_left_outer rel_join_full_outer
#   rel_join_semi rel_join_anti
# Update tests/test_registry_order.py expectations if the count changes.
# (The r4 staging note listed sim_embedding_neardup as never-checked; that
# was stale — it has a green r2 CORRECTNESS row. The authoritative backlog
# is registry-minus-union-of-CORRECTNESS-artifacts, which this rotation was
# computed from.)


def ordered_registry() -> dict[str, QuerySpec]:
    """Registry re-ordered so this round's verification targets come first.

    ``__spark_entry__.queries()`` iterates this dict; the driver checks its
    first 50 entries, so VERIFY_ORDER_HEAD IS the driver's check set.
    """
    qs = load_registry()
    missing = [n for n in VERIFY_ORDER_HEAD if n not in qs]
    if missing:
        raise RuntimeError(f"VERIFY_ORDER_HEAD names not registered: {missing}")
    head = set(VERIFY_ORDER_HEAD)
    tail = [n for n in qs if n not in head]
    return {n: qs[n] for n in (*VERIFY_ORDER_HEAD, *tail)}


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect registration) and return QUERIES.

    ``meos_rs_spark.queries.__init__`` imports each query module explicitly;
    a missing module raises instead of silently resolving to an empty
    PEP-420 namespace package (round-1 ADVICE.md item 1).
    """
    from meos_rs_spark import queries as _queries  # noqa: F401

    if not QUERIES:
        raise RuntimeError(
            "query registry is empty after importing meos_rs_spark.queries — "
            "queries/__init__.py must explicitly import every query module"
        )
    return QUERIES
