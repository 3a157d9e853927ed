"""Text-analysis operators for LLM data pipelines (north-star ops,
BASELINE.json) over the ``documents`` fixture: quality scoring, language ID,
token counting, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) — per-doc maps
with no shuffle except the explicit aggregations; scales linearly with
document count. Ratios are integer-count divisions (deterministic doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table

# tiny stopword lexicons for the heuristic language scorer
_EN = ("the", "a", "of", "and", "to", "in", "is")
_DE = ("der", "die", "das", "und", "ist", "ein")
_FR = ("le", "la", "les", "et", "est", "un")


def _sql_in(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


# --- quality scoring -------------------------------------------------------


@register(
    "text_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks, text FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       n_chars,
       CAST(n_chars AS DOUBLE) / len(toks) AS avg_tok_len,
       len(list_distinct(toks)) AS n_distinct,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       CAST(len(list_filter(toks, x -> x IN ({_sql_in(_EN)}))) AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(len(toks) >= 20 AND len(toks) <= 1000
            AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.2 AS INT) AS passes_quality
FROM t
""",
    tags=("text",),
    doc="quality heuristics: length, type-token ratio, stopword ratio, pass/fail gate",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda x: x.isin(*_EN)))
    ttr = nd.cast("double") / n
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / n).alias("avg_tok_len"),
        nd.alias("n_distinct"),
        ttr.alias("ttr"),
        (stop.cast("double") / n).alias("stopword_ratio"),
        ((n >= 20) & (n <= 1000) & (ttr > 0.2)).cast("int").alias("passes_quality"),
    )


# --- language identification ----------------------------------------------


@register(
    "text_langid",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
scores AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(toks, x -> x IN ({_sql_in(_EN)}))) AS DOUBLE) / len(toks) AS s_en,
         CAST(len(list_filter(toks, x -> x IN ({_sql_in(_DE)}))) AS DOUBLE) / len(toks) AS s_de,
         CAST(len(list_filter(toks, x -> x IN ({_sql_in(_FR)}))) AS DOUBLE) / len(toks) AS s_fr
  FROM t
)
SELECT doc_id, lang, s_en, s_de, s_fr,
       CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 THEN 'unk'
            WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang,
       CAST(CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 THEN 'unk'
            WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END = lang AS INT) AS is_correct
FROM scores
""",
    tags=("text",),
    doc="n-gram/stopword-heuristic language ID with deterministic argmax tiebreak",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)

    def score(words):
        return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("double") / n

    s_en, s_de, s_fr = score(_EN), score(_DE), score(_FR)
    base = d.select("doc_id", "lang", s_en.alias("s_en"), s_de.alias("s_de"), s_fr.alias("s_fr"))
    pred = (
        F.when((F.col("s_en") == 0) & (F.col("s_de") == 0) & (F.col("s_fr") == 0), "unk")
        .when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
    )
    return base.select(
        "doc_id", "lang", "s_en", "s_de", "s_fr",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_correct"),
    )


# --- token counting --------------------------------------------------------


@register(
    "text_token_count",
    oracle=r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
       length(text) AS n_bytes,
       length(replace(text, ' ', '')) AS n_nonspace
FROM documents
""",
    tags=("text",),
    doc="token counting: whitespace + BPE-ish regex segmentation (letters/digits/other)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).alias("bpe_ish_tokens"),
        F.length("text").alias("n_bytes"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
    )


# --- document fingerprinting ----------------------------------------------


@register(
    "text_fingerprint",
    oracle="""
WITH grams AS (
  SELECT doc_id, md5(substr(text, i, 8)) AS gh
  FROM documents, unnest(generate_series(1, length(text) - 7)) AS u(i)
  WHERE length(text) >= 8
)
SELECT doc_id,
       min(gh) AS fingerprint,
       count(DISTINCT gh) AS n_distinct_grams
FROM grams GROUP BY doc_id
""",
    tags=("text",),
    doc="rolling char-8-gram hash fingerprint (min digest = deterministic doc signature)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 7), i -> md5(substr(text, i, 8)))")
        ).alias("gh"),
    )
    return grams.groupBy("doc_id").agg(
        F.min("gh").alias("fingerprint"),
        F.countDistinct("gh").alias("n_distinct_grams"),
    )


# --- benchmark decontamination (n-gram overlap vs a held-out set) -----------

_BENCH_DOCS = 20  # doc_id < 20 plays the held-out benchmark set
_CONTAM_THRESHOLD = 0.5


@register(
    "text_decontaminate",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT sh FROM shingles WHERE doc_id < {_BENCH_DOCS}),
corpus AS (SELECT doc_id, sh FROM shingles WHERE doc_id >= {_BENCH_DOCS}),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, count(*) AS n_overlap
  FROM corpus c JOIN bench b ON b.sh = c.sh
  GROUP BY c.doc_id
)
SELECT s.doc_id, s.n_shingles,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / s.n_shingles AS overlap_ratio,
       CASE WHEN CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / s.n_shingles
                 > {_CONTAM_THRESHOLD} THEN 1 ELSE 0 END AS contaminated
FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
""",
    tags=("text", "dedup"),
    doc=f"training-set decontamination: flag corpus docs whose distinct word-3-gram "
    f"overlap with a benchmark set (docs < {_BENCH_DOCS}) exceeds "
    f"{_CONTAM_THRESHOLD}; the benchmark shingle set is tiny and broadcast, so at "
    "100 TB this is a map-side hash probe per shingle — no shuffle of the corpus "
    "beyond the per-doc count",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from meos_rs_spark.queries.dedup import _shingles

    sh = _shingles(spark, sf_dir)
    bench = sh.filter(F.col("doc_id") < _BENCH_DOCS).select("sh").distinct()
    corpus = sh.filter(F.col("doc_id") >= _BENCH_DOCS)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus.join(broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_raw"))
    )
    ratio = F.coalesce(F.col("n_overlap_raw"), F.lit(0)).cast("double") / F.col("n_shingles")
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_overlap_raw"), F.lit(0)).cast("bigint").alias("n_overlap"),
            ratio.alias("overlap_ratio"),
            F.when(ratio > _CONTAM_THRESHOLD, 1).otherwise(0).alias("contaminated"),
        )
    )
