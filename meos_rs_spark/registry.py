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

import functools
import glob
import json
import os
import re
from collections.abc import Callable, Sequence
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


# --- driver verification window (computed per round) ------------------------
#
# The driver records CORRECTNESS rows for only the FIRST 50 entries of
# ``__spark_entry__.queries()`` (observed: CORRECTNESS_r02.json is exactly
# registration positions 0-49), so the head of ``ordered_registry()`` IS the
# driver's check set. Rounds 2-5 hand-listed the head; since round 6 it is
# COMPUTED from the committed CORRECTNESS_r*.json artifacts (r5 VERDICT
# item 5) with the rule the hand lists were following all along:
#
#   1. queries whose LATEST driver row is red — fix-and-reverify first;
#   2. queries that have never held a driver row, in registration order;
#   3. green queries, oldest latest-check round first (registration order as
#      the tiebreak) — the steady-state re-verification refill.
#
# tests/test_registry_order.py pins the expected tuple for the current round.
# When the driver commits a new CORRECTNESS artifact at round end, the pin
# goes stale and the next session's first pytest run fails loudly — forcing
# the new round to review and refresh the rotation, which is exactly the
# per-round discipline the old comment asked for in prose.

DRIVER_WINDOW = 50

#: Queries whose SEMANTICS changed since their latest green driver row —
#: hand-listed per round, slotted right after the never-checked backlog so
#: the changed code re-earns its row this round instead of waiting for the
#: oldest-green rotation to reach it (r5 ADVICE: new code benefits most
#: from a driver row). Clear entries once the round's artifact lands.
#: r12: all nine r11 entries (three review batches — the ADVICE
#: both-hemispheres domain fix, two NULL-ordering alignments, four
#: abort-on-one-bad-row / cast-grammar fixes, the strict-gap
#: session-window oracle, and the explicit WKT-source NULL-position
#: envelope) re-earned green driver rows in the r11 window
#: (CORRECTNESS_r11.json, 50/50 green) and were cleared.
FORCE_VERIFY: tuple[str, ...] = (
    # r12: the round-start fixture refresh moved traj_convex_hull's golden
    # hull-area doubles by one ulp; tools/gen_golden.py re-pinned the
    # VALUES-literal oracle, so the twin must re-earn its driver row
    # against the new pin (its r-era green row was earned on the old one).
    "traj_convex_hull",
    # r12 adversarial sweep (documents/embeddings batch): one ragged
    # embedding row — NULL vector, empty/truncated vector, NULL/NaN/inf
    # component — aborted every ANN twin (np.stack raggedness Spark-side,
    # list_dot_product length error oracle-side). Both legs now apply the
    # shared corpus envelope (queries/similarity.EMB_ENVELOPE_DUCK /
    # _corpus): non-NULL, exactly DIM elements, all finite. Oracle text
    # changed in all thirteen → each re-earns its driver row.
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
    # r12 adversarial sweep, codec batch: the multimodal twins made the
    # payload envelope explicit in both legs (non-NULL pure-ASCII text —
    # the documented bytes==chars contract of every arithmetic oracle);
    # mm_metadata/mm_frame_sample/text_token_count replaced DuckDB's
    # CAST(AS BLOB) (parses escape sequences: aborts on non-ascii AND on a
    # lone backslash) with encode(); src_binaryfile_ingest fenced NULL-text
    # docs (the Spark text writer renders NULL as an empty line while the
    # oracle's md5(NULL || chr(10)) is NULL).
    "mm_metadata",
    "mm_audio_features",
    "mm_decode_features",
    "mm_resize",
    "mm_frame_sample",
    "mm_jpeg_features",
    "text_token_count",
    "src_binaryfile_ingest",
    # r12 adversarial sweep, TPC-H batch (37/38 agreed as-is): the
    # DataFrame unpivot keeps NULL cells while SQL UNPIVOT excludes them —
    # the Spark leg now pins the SQL-standard EXCLUDE semantics.
    "rel_unpivot",
    # r12 adversarial sweep, events-family batch (89/107 agreed as-is;
    # the NULL-position serialization/trajectory envelope stays documented
    # — tools/sweep_adversarial.KNOWN_ENVELOPE): NULL-key fixes — the
    # upsert sink aborted on a NULL-mmsi posit (primary-key envelope now
    # explicit both legs); the as-of probes gained the keyed-probe
    # envelope (equi-join vs window-partition NULL split); ttype/stbox
    # oracles keep the NULL-mmsi group via IS NOT DISTINCT FROM;
    # traj_merge/traj_equality route NULL split keys to the stored half
    # and join halves null-safely; the WKT line grammar requires a key;
    # the CSV writer preserves arity on NULL fields.
    "snk_jdbc_upsert",
    "rel_join_asof",
    "rel_join_asof_nearest",
    "ttype_tint_step",
    "traj_stbox_z_path",
    "traj_merge",
    "traj_equality",
    "src_python_datasource",
    "src_csv_malformed",
    # r12 envelope enforcement: the ten NULL-position twins the r11 review
    # adjudicated as a documented envelope now ENFORCE it in both legs —
    # the shared XY posit view (functions.trajectory.posits_xy /
    # POSITS_XY_CTE) drops NULL-coordinate rows BEFORE dedup/truncate in
    # query and oracle alike, and traj_od_matrix's first/last self-join
    # went NULL-mmsi-total (IS NOT DISTINCT FROM). Every registered twin
    # now agrees on the adversarial NULL/tie fixture; output unchanged on
    # the NULL-free driver fixtures (parity re-checked at sf0.01).
    "serde_mfjson",
    "serde_mfjson_ingest",
    "serde_wkt_forms",
    "serde_wkt_seqset",
    "serde_e2e_pipeline",
    "traj_length_speed",
    "traj_value_at_time",
    "traj_interp_mixed",
    "traj_od_matrix",
    "traj_stbox_z_path",
)


@functools.lru_cache(maxsize=1)
def _correctness_history() -> dict[str, tuple[int, bool]]:
    """Per query: (latest round with a driver row, was that latest row green).

    A row is green when rows+schema matched with no error and the value hash
    did not mismatch (``hash_match`` of ``None`` is the historical rows-only
    check — treated as green-but-weaker, same as the driver does).
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        with open(path, encoding="utf-8") as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            latest[name] = (int(m.group(1)), green)
    return latest


def compute_verify_head(
    names: Sequence[str], window: int = DRIVER_WINDOW
) -> tuple[str, ...]:
    """Derive the driver-window head from the CORRECTNESS artifacts.

    ``names`` is the full registry in registration order; the result is the
    first ``window`` queries by (red, never-checked, oldest-green) priority.
    With no artifacts present (fresh clone pre-round-2) this degrades to the
    first ``window`` registered queries.
    """
    latest = _correctness_history()
    pos = {n: i for i, n in enumerate(names)}
    reds = [n for n in names if n in latest and not latest[n][1]]
    never = [n for n in names if n not in latest]
    forced = [
        n for n in names
        if n in FORCE_VERIFY and n not in reds and n not in never
    ]
    greens = sorted(
        (n for n in names if n in latest and latest[n][1] and n not in forced),
        key=lambda n: (latest[n][0], pos[n]),
    )
    return tuple((*reds, *never, *forced, *greens))[:window]


def verify_order_head() -> tuple[str, ...]:
    """The current round's driver check set, computed from the artifacts."""
    return compute_verify_head(list(load_registry()))


def ordered_registry() -> dict[str, QuerySpec]:
    """Registry re-ordered so this round's verification targets come first.

    ``__spark_entry__.queries()`` iterates this dict; the driver checks its
    first 50 entries, so ``verify_order_head()`` IS the driver's check set.
    """
    qs = load_registry()
    head_names = compute_verify_head(list(qs))
    head = set(head_names)
    tail = [n for n in qs if n not in head]
    return {n: qs[n] for n in (*head_names, *tail)}


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
