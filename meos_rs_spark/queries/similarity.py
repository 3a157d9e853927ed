"""Similarity search over the ``embeddings`` fixture (north-star ops,
BASELINE.json; SURVEY.md §7 M5): brute-force cosine top-k as the exactness
baseline, sign-LSH bucketed search as the 100 TB path, plus embedding-cosine
near-dup detection.

Determinism: dot products accumulate dimension-by-dimension in order on
float32 inputs widened to double — the Arrow-batched pandas_udf
(functions/embeddings.py) reproduces bit-for-bit the sequential fold
DuckDB's ``list_dot_product`` performs, verified by the oracle hash.
Ranking ties broken by vec_id so top-k is total-ordered.

Scale shape: probes are a broadcast side (small); the LSH variant buckets
the corpus ONCE (one shuffle) and probes search only their bucket — the
classic band-partition ANN layout. No N×N crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from meos_rs_spark.functions.embeddings import cosine, l2norm, make_lsh_bucket_udf, seq_dot
from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table

N_PROBES = 5
TOP_K = 10
N_PLANES = 8
DIM = 64

_DOT_DUCK = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _duck_cosine(a: str, b: str) -> str:
    return (
        f"{_DOT_DUCK.format(a=a, b=b)} / "
        f"(sqrt({_DOT_DUCK.format(a=a, b=a)}) * sqrt({_DOT_DUCK.format(a=b, b=b)}))"
    )


# --- brute-force cosine top-k (exactness baseline) -------------------------


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT p.probe_id, e.vec_id, e.label,
         {_duck_cosine('p.pe', 'e.embedding')} AS cosine
  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id
)
SELECT probe_id, vec_id, label, cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= {TOP_K}
""",
    tags=("sim",),
    doc="brute-force cosine top-k: probes broadcast against the corpus, "
    "TakeOrdered per probe; the exactness baseline for the LSH variant",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norms fold once per VECTOR (not once per pair): cosine = dot/(|a|·|b|)
    # with |·| precomputed — same sequential fold the oracle's
    # sqrt(list_dot_product(v,v)) factor performs, so values stay bit-equal
    emb = load_table(spark, sf_dir, "embeddings").withColumn("enorm", l2norm("embedding"))
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"), F.col("enorm").alias("pnorm")
    )
    scored = emb.join(broadcast(probes), F.col("vec_id") != F.col("probe_id")).withColumn(
        "cosine", seq_dot(F.col("pe"), F.col("embedding")) / (F.col("pnorm") * F.col("enorm"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= TOP_K)
        .select("probe_id", "vec_id", "label", "cosine")
    )


# --- sign-LSH bucketed ANN (the scale path) --------------------------------

# deterministic pseudo-random hyperplanes: sign from md5 parity of
# (plane, dim) — engine-identical, no RNG state; the Spark-side twin is
# functions.embeddings.plane_signs (kept in lockstep)


def _bucket_expr_duck(col: str) -> str:
    bits = []
    for p in range(N_PLANES):
        plane = (
            f"list_transform(generate_series(0, {DIM} - 1), j -> "
            f"CASE WHEN instr('89abcdef', substr(md5('{p}' || '-' || j), 1, 1)) > 0 "
            f"THEN 1.0 ELSE -1.0 END)"
        )
        dot = f"list_dot_product({plane}, CAST({col} AS DOUBLE[]))"
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


@register(
    "sim_ann_lsh",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, label, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings
),
probes AS (SELECT vec_id AS probe_id, embedding AS pe, bucket AS pb FROM bucketed WHERE vec_id < {N_PROBES}),
cand AS (
  SELECT p.probe_id, e.vec_id, e.label,
         {_duck_cosine('p.pe', 'e.embedding')} AS cosine
  FROM probes p JOIN bucketed e ON e.bucket = p.pb AND e.vec_id != p.probe_id
)
SELECT probe_id, vec_id, label, cosine
FROM cand
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 3
""",
    tags=("sim", "lsh"),
    doc=f"ANN via {N_PLANES}-plane sign-LSH: corpus bucketed once, probes equi-join "
    "their bucket then re-rank — the bucket join replaces the N×N scan at scale",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn("bucket", make_lsh_bucket_udf(N_PLANES, DIM)(F.col("embedding")))
    probes = bucketed.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"), F.col("bucket").alias("pb")
    )
    cand = (
        bucketed.join(
            broadcast(probes), (F.col("bucket") == F.col("pb")) & (F.col("vec_id") != F.col("probe_id"))
        )
        .withColumn("cosine", cosine(F.col("pe"), F.col("embedding")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("probe_id", "vec_id", "label", "cosine")
    )


# --- embedding-cosine near-dup ---------------------------------------------


@register(
    "sim_embedding_neardup",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= 0.5
""",
    tags=("sim", "dedup", "lsh"),
    doc="embedding-cosine near-dup: same-bucket pairs filtered by cosine ≥ 0.5 "
    "(bucket join bounds the pair space; threshold tuned to fixture geometry)",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn(
        "bucket", make_lsh_bucket_udf(N_PLANES, DIM)(F.col("embedding"))
    ).select("vec_id", "embedding", "bucket")
    a = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), F.col("bucket").alias("ba")
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), F.col("bucket").alias("bb")
    )
    return (
        a.join(b, (a.ba == b.bb) & (a.id_a < b.id_b))
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= 0.5)
        .select("id_a", "id_b", "cosine")
    )


# --- IVF-style cell-probed ANN (coarse quantizer + cell equi-join) ----------

N_CELLS = 8
NPROBE = 2
IVF_TOPK = 3


@register(
    "sim_ann_ivf",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < {N_CELLS}
),
assign AS (
  SELECT e.vec_id, e.label, e.embedding, c.cent_id,
         {{ccos}} AS ccos
  FROM embeddings e CROSS JOIN cents c
),
cells AS (
  SELECT vec_id, label, embedding, cent_id AS cell FROM assign
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) = 1
),
probe_cells AS (
  SELECT p.vec_id AS probe_id, p.embedding AS pe, c.cent_id AS cell
  FROM embeddings p CROSS JOIN cents c
  WHERE p.vec_id < {N_PROBES}
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY {{pcos}} DESC, c.cent_id) <= {NPROBE}
),
cand AS (
  SELECT pc.probe_id, e.vec_id, e.label,
         {{scos}} AS cosine
  FROM probe_cells pc JOIN cells e ON e.cell = pc.cell AND e.vec_id != pc.probe_id
)
SELECT probe_id, vec_id, label, cosine
FROM cand
QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= {IVF_TOPK}
""".format(
        ccos=_duck_cosine("e.embedding", "c.ce"),
        pcos=_duck_cosine("p.embedding", "c.ce"),
        scos=_duck_cosine("pc.pe", "e.embedding"),
    ),
    tags=("sim", "ivf"),
    doc=f"IVF-style ANN: {N_CELLS} coarse centroids (a production system trains "
    "them offline with k-means; here the first corpus vectors, deterministically) "
    "broadcast against the corpus to assign each vector its nearest cell ONCE, "
    f"probes search their {NPROBE} closest cells via a cell equi-join and re-rank "
    "exactly — the inverted-file layout that replaces the N-squared scan at scale "
    "(assignment is a broadcast map; only the per-vec argmin needs a vec_id window)",
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    assign = emb.crossJoin(broadcast(cents)).withColumn(
        "ccos", cosine(F.col("embedding"), F.col("ce"))
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), "cent_id")
    cells = (
        assign.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "label", "embedding", F.col("cent_id").alias("cell"))
    )
    probe_assign = (
        emb.filter(F.col("vec_id") < N_PROBES)
        .crossJoin(broadcast(cents))
        .withColumn("pcos", cosine(F.col("embedding"), F.col("ce")))
    )
    wp = Window.partitionBy("vec_id").orderBy(F.col("pcos").desc(), "cent_id")
    probe_cells = (
        probe_assign.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= NPROBE)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"),
                F.col("cent_id").alias("cell"))
    )
    cand = cells.join(
        broadcast(probe_cells), (cells.cell == probe_cells.cell) & (F.col("vec_id") != F.col("probe_id"))
    ).withColumn("cosine", cosine(F.col("pe"), F.col("embedding")))
    wk = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        cand.withColumn("__rnk", F.row_number().over(wk))
        .filter(F.col("__rnk") <= IVF_TOPK)
        .select("probe_id", "vec_id", "label", "cosine")
    )


# --- k-means Lloyd iteration (the IVF training step) ------------------------

_KM_K = 8  # clusters; seeds = first _KM_K corpus vectors (deterministic)


@register(
    "sim_kmeans_iter",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS ce,
         {_DOT_DUCK.format(a='embedding', b='embedding')} AS cn2
  FROM embeddings WHERE vec_id < {_KM_K}
),
vecs AS (
  SELECT vec_id, embedding,
         {_DOT_DUCK.format(a='embedding', b='embedding')} AS vn2
  FROM embeddings
),
assign AS (
  SELECT v.vec_id, v.embedding, c.cent_id,
         v.vn2 + c.cn2 - 2 * {_DOT_DUCK.format(a='v.embedding', b='c.ce')} AS d2
  FROM vecs v CROSS JOIN cents c
),
cells AS (
  SELECT vec_id, embedding, cent_id AS cluster_id FROM assign
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) = 1
),
comps AS (
  SELECT cluster_id, CAST(i - 1 AS INT) AS dim,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(28,6)) AS val
  FROM cells, unnest(generate_series(1, len(embedding))) AS g(i)
)
SELECT cluster_id, dim,
       count(*) AS n_members,
       CAST(CAST(SUM(val) AS DOUBLE) / count(*) AS DOUBLE) AS centroid_val
FROM comps GROUP BY cluster_id, dim
""",
    tags=("sim", "ivf", "iterative"),
    doc=f"one Lloyd (k-means) iteration over the embedding corpus — the "
    f"training step behind the IVF quantizer (sim_ann_ivf seeds its cells the "
    f"same way): {_KM_K} broadcast seed centroids, squared-L2 assignment using "
    "precomputed self-dots (one fold per pair, not three), then per-dimension "
    "cluster means via posexplode + exact DECIMAL(28,6) sums so the mean is "
    "shuffle-order-independent. At 100 TB the assignment is a map-side "
    "broadcast pass and the recompute is one (cluster, dim)-keyed partial "
    "aggregation — each further iteration is the same two stages re-run",
)
def sim_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meos_rs_spark.functions.embeddings import seq_dot

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", "embedding", seq_dot("embedding", "embedding").alias("vn2")
    )
    cents = (
        emb.filter(F.col("vec_id") < _KM_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            seq_dot("embedding", "embedding").alias("cn2"),
        )
    )
    assign = vecs.crossJoin(broadcast(cents)).withColumn(
        "d2",
        F.col("vn2") + F.col("cn2") - 2 * seq_dot(F.col("embedding"), F.col("ce")),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cent_id").asc())
    cells = (
        assign.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cluster_id"))
    )
    comps = cells.select(
        "cluster_id", F.posexplode("embedding").alias("dim", "raw")
    ).select(
        "cluster_id",
        "dim",
        F.round(F.col("raw").cast("double"), 6).cast("decimal(28,6)").alias("val"),
    )
    return comps.groupBy("cluster_id", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.sum("val").cast("double") / F.count(F.lit(1))).cast("double").alias("centroid_val"),
    )


# --- ANN quality evaluation: IVF recall vs the exact baseline ----------------

from meos_rs_spark.registry import QUERIES as _Q  # noqa: E402

_ANN_RECALL_ORACLE = f"""
WITH exact_raw AS ({_Q['sim_cosine_topk'].oracle}),
ann AS ({_Q['sim_ann_ivf'].oracle}),
exact AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
  FROM exact_raw
)
SELECT a.probe_id,
       count(*) AS n_ann,
       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_exact{TOP_K},
       CAST(SUM(CASE WHEN e.rk <= {IVF_TOPK} THEN 1 ELSE 0 END) AS BIGINT) AS n_hit{IVF_TOPK},
       CAST(SUM(CASE WHEN e.rk <= {IVF_TOPK} THEN 1 ELSE 0 END) AS DOUBLE) / {IVF_TOPK} AS recall{IVF_TOPK}
FROM ann a LEFT JOIN exact e ON e.probe_id = a.probe_id AND e.vec_id = a.vec_id
GROUP BY a.probe_id
"""


@register(
    "sim_ann_recall",
    oracle=_ANN_RECALL_ORACLE,
    tags=("sim", "ivf", "eval"),
    doc=f"ANN quality evaluation (the similarity twin of dedup_minhash_estimate): "
    f"per probe, how many of the IVF's top-{IVF_TOPK} land in the exact "
    f"top-{TOP_K}, and recall@{IVF_TOPK} against the exact top-{IVF_TOPK} — "
    "the measurement a pipeline runs before trusting the approximate path at "
    "100 TB; both legs are themselves oracled queries, composed",
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_cosine_topk(spark, sf_dir)
    ann = sim_ann_ivf(spark, sf_dir)
    wr = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    ex = exact.withColumn("rk", F.row_number().over(wr)).select(
        F.col("probe_id").alias("e_probe"), F.col("vec_id").alias("e_vec"), "rk"
    )
    joined = ann.join(
        ex, (F.col("probe_id") == F.col("e_probe")) & (F.col("vec_id") == F.col("e_vec")), "left"
    )
    hit3 = F.sum(F.when(F.col("rk") <= IVF_TOPK, 1).otherwise(0))
    return joined.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_ann"),
        F.sum(F.when(F.col("e_vec").isNotNull(), 1).otherwise(0)).cast("bigint").alias(f"n_in_exact{TOP_K}"),
        hit3.cast("bigint").alias(f"n_hit{IVF_TOPK}"),
        (hit3.cast("double") / IVF_TOPK).alias(f"recall{IVF_TOPK}"),
    )


# --- coarse-to-fine retrieval: prefix-dimension rank, full-dimension rerank --

_PREFIX_DIM = 16
_COARSE_K = 20
_FINAL_K = 5

_PDOT_DUCK = (
    f"list_dot_product(CAST(list_slice({{a}}, 1, {_PREFIX_DIM}) AS DOUBLE[]), "
    f"CAST(list_slice({{b}}, 1, {_PREFIX_DIM}) AS DOUBLE[]))"
)


def _duck_prefix_cosine(a: str, b: str) -> str:
    return (
        f"{_PDOT_DUCK.format(a=a, b=b)} / "
        f"(sqrt({_PDOT_DUCK.format(a=a, b=a)}) * sqrt({_PDOT_DUCK.format(a=b, b=b)}))"
    )


@register(
    "sim_prefix_rerank",
    oracle=f"""
WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < {N_PROBES}),
coarse AS (
  SELECT p.probe_id, e.vec_id, e.label, p.pe, e.embedding,
         {_duck_prefix_cosine('p.pe', 'e.embedding')} AS pcos
  FROM probes p JOIN embeddings e ON e.vec_id != p.probe_id
  QUALIFY row_number() OVER (PARTITION BY p.probe_id ORDER BY pcos DESC, e.vec_id) <= {_COARSE_K}
)
SELECT probe_id, vec_id, label,
       {_duck_cosine('pe', 'embedding')} AS cosine
FROM coarse
QUALIFY row_number() OVER (PARTITION BY probe_id
                           ORDER BY {_duck_cosine('pe', 'embedding')} DESC, vec_id) <= {_FINAL_K}
""",
    tags=("sim",),
    doc=f"coarse-to-fine (matryoshka-style) retrieval: rank the corpus by "
    f"cosine over the first {_PREFIX_DIM} of {DIM} dimensions (a quarter of "
    f"the bytes read), keep {_COARSE_K} candidates per probe, then re-rank "
    f"those with the full-dimension cosine to top-{_FINAL_K} — the third ANN "
    "family beside LSH buckets and IVF cells: no index at all, just cheaper "
    "arithmetic first; at 100 TB the prefix would live in its own parquet "
    "column so the coarse pass scans a quarter of the data",
)
def sim_prefix_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    prefix = F.slice("embedding", 1, _PREFIX_DIM)
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "pre", prefix
    ).withColumn("prenorm", l2norm("pre")).withColumn("enorm", l2norm("embedding"))
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("pre").alias("ppre"),
        F.col("prenorm").alias("ppnorm"),
        F.col("enorm").alias("pnorm"),
    )
    coarse = emb.join(broadcast(probes), F.col("vec_id") != F.col("probe_id")).withColumn(
        "pcos", seq_dot(F.col("ppre"), F.col("pre")) / (F.col("ppnorm") * F.col("prenorm"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.col("pcos").desc(), "vec_id")
    cand = coarse.withColumn("__rn", F.row_number().over(wc)).filter(F.col("__rn") <= _COARSE_K)
    fine = cand.withColumn(
        "cosine", seq_dot(F.col("pe"), F.col("embedding")) / (F.col("pnorm") * F.col("enorm"))
    )
    wf = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        fine.withColumn("__rnk", F.row_number().over(wf))
        .filter(F.col("__rnk") <= _FINAL_K)
        .select("probe_id", "vec_id", "label", "cosine")
    )


# --- k-NN graph build (all-corpus neighbor lists within LSH buckets) ---------

_KNN_K = 3


@register(
    "sim_knn_graph",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, label, embedding, {_bucket_expr_duck('embedding')} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, b.label AS dst_label,
         {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
  FROM bucketed a JOIN bucketed b
    ON b.bucket = a.bucket AND b.vec_id != a.vec_id
)
SELECT src, dst, dst_label, cosine,
       CAST(row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS BIGINT) AS nbr_rank
FROM pairs
QUALIFY row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) <= {_KNN_K}
""",
    tags=("sim", "lsh", "graph"),
    doc=f"k-NN GRAPH build (every corpus vector's top-{_KNN_K} neighbors, not "
    "just a probe set's): the adjacency list behind graph-based clustering "
    "and kNN-graph dedup. Same-bucket pairs only (sign-LSH, corpus bucketed "
    "once), so the pair count is sum of squared bucket sizes — bounded and "
    "uniform under random hyperplanes — instead of N²; per-source top-k via "
    "one window over the pair stream",
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn(
        "bucket", make_lsh_bucket_udf(N_PLANES, DIM)(F.col("embedding"))
    ).select("vec_id", "label", "embedding", "bucket")
    a = bucketed.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("ea"), F.col("bucket").alias("ba")
    )
    b = bucketed.select(
        F.col("vec_id").alias("dst"), F.col("label").alias("dst_label"),
        F.col("embedding").alias("eb"), F.col("bucket").alias("bb"),
    )
    pairs = a.join(b, (F.col("ba") == F.col("bb")) & (F.col("src") != F.col("dst"))).withColumn(
        "cosine", cosine(F.col("ea"), F.col("eb"))
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), "dst")
    return (
        pairs.withColumn("nbr_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("nbr_rank") <= _KNN_K)
        .select("src", "dst", "dst_label", "cosine", "nbr_rank")
    )
