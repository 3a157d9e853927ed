"""Deterministic sampling / splitting / sharding operators for training-data
pipelines (north-star ops, BASELINE.json) over the ``documents`` fixture.

A 100 TB curation pass needs reproducible randomness: every "random" choice
here is a pure function of the row key (md5 of a salted key string), so the
same document lands in the same split/sample/shard on every engine and every
run — no RNG state, no seed plumbing, and the DuckDB oracle hashes
identically (md5 is bit-identical across engines; hex-string comparisons are
plain byte comparisons on both sides).

Scale notes per operator:

* hash split/sample — stateless per-row map; no shuffle at all.
* quota sample — one shuffle on the group key, TakeOrdered-style truncation
  per group via row_number; hash-ordering makes the per-group pick uniform.
* shard packing — a global prefix sum realized as the classic two-level
  distributed scan: per-block partial sums (one narrow aggregation), a tiny
  block-offset table (cumsum over n_docs/BLOCK rows), broadcast back, then a
  block-partitioned window. No single-partition window over the full corpus
  (the naive ``Window.orderBy(doc_id)`` with no partitionBy would funnel
  100 TB through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table

# hex-string thresholds on the first md5 byte: 0xe6/256 ≈ 89.8 % train,
# 0xf3/256 ≈ 94.9 % train+val, rest test; 0x1a/256 ≈ 10.2 % Bernoulli sample.
_TRAIN_HI = "e6"
_VAL_HI = "f3"
_SAMPLE_HI = "1a"


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )


# --- deterministic train/val/test split + Bernoulli sample ------------------


@register(
    "text_hash_split",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS hb,
         substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS sb
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, hb,
       CASE WHEN hb < '{_TRAIN_HI}' THEN 'train'
            WHEN hb < '{_VAL_HI}' THEN 'val' ELSE 'test' END AS split,
       CAST(sb < '{_SAMPLE_HI}' AS INT) AS in_10pct_sample
FROM t
""",
    tags=("text", "sampling"),
    doc="reproducible train/val/test split (~90/5/5) + ~10% Bernoulli sample, "
    "both keyed on salted md5 of doc_id — a stateless per-row map (no shuffle, "
    "no RNG state); the split assignment survives reruns, engine swaps, and "
    "repartitioning, which seeded rand() does not",
)
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doc_tokens(spark, sf_dir)
    hb = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2)
    sb = F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 2)
    split = (
        F.when(hb < _TRAIN_HI, "train").when(hb < _VAL_HI, "val").otherwise("test")
    )
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        hb.alias("hb"),
        split.alias("split"),
        (sb < _SAMPLE_HI).cast("int").alias("in_10pct_sample"),
    )


# --- per-group quota sampling ----------------------------------------------

_QUOTA = 30  # docs kept per language


@register(
    "text_quota_sample",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         md5('quota:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS sample_rank
FROM t
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= {_QUOTA}
""",
    tags=("text", "sampling"),
    doc=f"language-balanced quota sampling: keep the {_QUOTA} docs per lang that "
    "sort first by salted md5 — a uniform-without-replacement pick per group, "
    "deterministic across runs; one shuffle on lang, truncated per group by "
    "row_number (rank assignment needs no global sort)",
)
def text_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doc_tokens(spark, sf_dir)
    h = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= _QUOTA)
        .select("doc_id", "lang", "n_tokens", "sample_rank")
    )


# --- token-budget shard packing (distributed prefix sum) --------------------

_SHARD_BUDGET = 500  # tokens per output shard
_BLOCK = 64  # docs per prefix-sum block


@register(
    "text_shard_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
scanned AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(FLOOR(start_offset / {_SHARD_BUDGET}) AS BIGINT) AS shard_id
FROM scanned
""",
    tags=("text", "sampling"),
    doc=f"token-budget shard packing: assign docs (in doc_id order) to ~"
    f"{_SHARD_BUDGET}-token output shards via an exclusive running token sum. "
    "The oracle states the semantics as one global window; the Spark plan is "
    f"the scalable two-level scan — per-block ({_BLOCK} docs) partial sums, a "
    "tiny cumulative block-offset table broadcast back, then a window "
    "partitioned BY block — so no task ever sees more than one block of rows",
)
def text_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doc_tokens(spark, sf_dir).select(
        # integer div, not double-divide-then-cast: same truncation
        # semantics at every realistic id, but exact above 2^53 where the
        # double round-trip loses integer precision (block ids only need
        # monotonicity in doc_id, which trunc-div preserves) — the
        # module's bit-exactness discipline (r10 review)
        "doc_id", "n_tokens", F.expr(f"doc_id div {_BLOCK}").alias("block")
    )
    # level 1: per-block totals (narrow agg, |blocks| = n_docs/_BLOCK rows)
    block_tot = d.groupBy("block").agg(F.sum("n_tokens").alias("block_tokens"))
    # level 2: exclusive cumsum over the small block table (safe single task)
    wb = Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    block_off = block_tot.select(
        "block", F.coalesce(F.sum("block_tokens").over(wb), F.lit(0)).alias("block_offset")
    )
    # level 3: within-block exclusive cumsum, shifted by the block offset
    win = Window.partitionBy("block").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    start = F.col("block_offset") + F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    return (
        d.join(F.broadcast(block_off), "block")
        .select(
            "doc_id",
            "n_tokens",
            start.cast("bigint").alias("start_offset"),
            F.floor(start / _SHARD_BUDGET).cast("bigint").alias("shard_id"),
        )
    )


# --- corpus length histogram ------------------------------------------------

_BIN = 10  # tokens per histogram bin


@register(
    "text_length_histogram",
    oracle=f"""
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT lang,
       CAST(FLOOR(n_tokens / {_BIN}) * {_BIN} AS BIGINT) AS bin_lo,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM t GROUP BY lang, FLOOR(n_tokens / {_BIN}) * {_BIN}
""",
    tags=("text", "sampling"),
    doc=f"corpus token-length histogram per language ({_BIN}-token bins) — the "
    "distribution check run before choosing packing/truncation lengths; one "
    "partial-aggregated shuffle on (lang, bin), output cardinality is bins × "
    "languages regardless of corpus size",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _doc_tokens(spark, sf_dir)
    bin_lo = (F.floor(F.col("n_tokens") / _BIN) * _BIN).cast("bigint")
    return d.groupBy("lang", bin_lo.alias("bin_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


# --- domain mixture reweighting --------------------------------------------


@register(
    "text_mixture_weights",
    oracle="""
WITH d AS (
  SELECT lang, source,
         count(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
),
t AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, count(*) AS n_domains
  FROM d
)
SELECT lang, source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
       CAST(total_tokens AS DOUBLE) / CAST(n_domains * n_tokens AS DOUBLE) AS mix_weight
FROM d CROSS JOIN t
""",
    tags=("text", "sampling", "mixture"),
    doc="training-mixture reweighting: per-(lang, source) domain token "
    "shares and the per-domain sampling weight that equalizes the mixture "
    "(weight = uniform_target / actual_share, the DoReMi-style static "
    "baseline). Shares and weights are each ONE double division of exact "
    "integer token counts -- bit-exact across engines, no decimal canon. "
    "Scale shape: one partial-aggregated shuffle on the (lang, source) key; "
    "the totals are a 1-row aggregate of the tiny domain table broadcast "
    "back -- no second pass over the corpus, no driver collect.",
)
def text_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _doc_tokens(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    # corpus totals as ONE struct-valued scalar subquery (not a 1-row
    # crossJoin, which planned as a BroadcastNestedLoopJoin)
    t = d.agg(
        F.struct(
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_domains"),
        ).alias("t")
    )
    return d.select("lang", "source", "n_docs", "n_tokens", t.scalar().alias("__t")).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("__t.total_tokens").cast("double")).alias("token_share"),
        (
            F.col("__t.total_tokens").cast("double")
            / (F.col("__t.n_domains") * F.col("n_tokens")).cast("double")
        ).alias("mix_weight"),
    )
