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


#: the quality gate (token-count band + type-token-ratio floor), shared by
#: text_quality, the curation pipeline (batch + streaming) and their
#: oracles — ONE definition so the gate cannot fork between the simple
#: metric and the composed pipelines (r10 review find)
Q_MIN_TOK = 20
Q_MAX_TOK = 1000
Q_MIN_TTR = 0.2


@register(
    "text_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks, text FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       n_chars,
       CAST(n_chars - len(toks) + 1 AS DOUBLE) / len(toks) AS avg_tok_len,
       len(list_distinct(toks)) AS n_distinct,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       CAST(len(list_filter(toks, x -> x IN ({_sql_in(_EN)}))) AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(len(toks) >= {Q_MIN_TOK} AND len(toks) <= {Q_MAX_TOK}
            AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > {Q_MIN_TTR} AS INT) AS passes_quality
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
        # mean token length EXCLUDING the n-1 separator spaces (r10 review
        # find: n_chars/n overstated every doc by ~(n-1)/n chars; same form
        # text_gopher_rules already used for sum_tok_len)
        ((F.col("n_chars") - n + 1).cast("double") / n).alias("avg_tok_len"),
        nd.alias("n_distinct"),
        ttr.alias("ttr"),
        (stop.cast("double") / n).alias("stopword_ratio"),
        ((n >= Q_MIN_TOK) & (n <= Q_MAX_TOK) & (ttr > Q_MIN_TTR))
        .cast("int")
        .alias("passes_quality"),
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
       octet_length(encode(text)) AS n_bytes,
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
        # actual BYTES, not characters: identical on the ASCII fixture, but
        # the column name promises bytes and a future non-ASCII fixture
        # must not silently turn it into a char count (review find, r7)
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
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
    # Both outputs are per-document, so the whole query is map-side array
    # algebra — no explode, no shuffle. The old explode + groupBy/
    # countDistinct formulation shuffled one 32-char digest row per gram
    # (~1k rows/doc; the r8 ×10 sweep measured it 22.4s for an
    # embarrassingly parallel computation). The gram array is aliased in
    # its own projection and referenced twice below; CollapseProject keeps
    # non-cheap multiply-referenced aliases in place, so the transform()
    # evaluates once per document.
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    grams = d.select(
        "doc_id",
        F.expr("transform(sequence(1, length(text) - 7), i -> md5(substr(text, i, 8)))").alias("g"),
    )
    return grams.select(
        "doc_id",
        F.array_min("g").alias("fingerprint"),
        F.size(F.array_distinct("g")).cast("bigint").alias("n_distinct_grams"),
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
    bench = (
        sh.filter(F.col("doc_id") < _BENCH_DOCS)
        .select("sh").distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus pass: a left probe of the broadcast benchmark set marks
    # each shingle, and a single per-doc aggregation yields both the size
    # and the overlap — the r7 review caught the previous two-aggregation
    # (sizes ⋈ hits) shape running the shingle fan-out twice plus an extra
    # shuffle join, contradicting this operator's own scale claim
    probed = sh.filter(F.col("doc_id") >= _BENCH_DOCS).join(
        broadcast(bench), "sh", "left"
    )
    agg = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_overlap"),
    )
    ratio = F.col("n_overlap").cast("double") / F.col("n_shingles")
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        F.when(ratio > _CONTAM_THRESHOLD, 1).otherwise(0).alias("contaminated"),
    )


# --- repetition signal (duplicate n-gram ratio) -----------------------------


@register(
    "text_repetition",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         len(toks) - 2 AS n_grams,
         len(list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS n_distinct
  FROM t WHERE len(toks) >= 3
)
SELECT doc_id, n_grams, n_distinct,
       1.0 - CAST(n_distinct AS DOUBLE) / n_grams AS dup_gram_ratio,
       CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_grams > 0.5 AS INT) AS is_repetitive
FROM g
""",
    tags=("text",),
    doc="repetition quality signal: fraction of duplicated word-3-grams per doc "
    "(boilerplate/template detector); pure array expressions, no explode — the "
    "per-doc gram set never leaves the row, so the scan is the only pass",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("toks"))
    d = d.filter(F.size("toks") >= 3)
    grams = F.expr("transform(sequence(1, size(toks) - 2), i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))")
    d = d.select(
        "doc_id",
        (F.size("toks") - 2).cast("bigint").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct"),
    )
    ratio = 1.0 - F.col("n_distinct").cast("double") / F.col("n_grams")
    return d.select(
        "doc_id", "n_grams", "n_distinct",
        ratio.alias("dup_gram_ratio"),
        (ratio > 0.5).cast("int").alias("is_repetitive"),
    )


# --- the composed curation pass --------------------------------------------

from meos_rs_spark.queries.dedup import _MINHASH_CTES as _LSH_CTES  # noqa: E402
from meos_rs_spark.queries.dedup import CC_JACCARD as _CC_J  # noqa: E402

_CURATION_ORACLE = f"""
WITH RECURSIVE {_LSH_CTES},
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= {_CC_J}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
walk(id, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.id = e.dst
),
noncanon AS (SELECT id AS doc_id FROM walk GROUP BY id HAVING min(label) != id),
base AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS ttr,
         md5(text) AS text_hash
  FROM documents
),
first_of_hash AS (
  SELECT * FROM base
  QUALIFY row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) = 1
),
surv AS (
  SELECT f.doc_id, f.lang, f.source, f.n_tokens
  FROM first_of_hash f
  WHERE f.n_tokens BETWEEN {Q_MIN_TOK} AND {Q_MAX_TOK} AND f.ttr > {Q_MIN_TTR}
    AND f.doc_id NOT IN (SELECT doc_id FROM noncanon)
)
SELECT lang, source, count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM surv GROUP BY lang, source
"""


@register(
    "text_curation_pipeline",
    oracle=_CURATION_ORACLE,
    tags=("text", "dedup", "pipeline"),
    doc="end-to-end corpus curation: quality gate (length + type-token ratio) ∧ "
    "exact-dedup first-of-hash ∧ near-dup non-canonicals removed (connected "
    "components over the MinHash-LSH pair graph) → surviving docs aggregated to "
    "per-(lang, source) doc and token counts — the single pass a training-data "
    "pipeline runs before tokenization; every stage is a prior registered "
    "operator, composed",
)
def text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from meos_rs_spark.queries.dedup import CC_JACCARD, dedup_components

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    d = d.select("doc_id", "lang", "source", n.alias("n_tokens"), ttr.alias("ttr"),
                 F.md5("text").alias("text_hash"))
    wq = Window.partitionBy("text_hash").orderBy("doc_id")
    d = d.withColumn("__rn", F.row_number().over(wq))
    survivors = d.filter(
        (F.col("n_tokens") >= Q_MIN_TOK)
        & (F.col("n_tokens") <= Q_MAX_TOK)
        & (F.col("ttr") > Q_MIN_TTR)
        & (F.col("__rn") == 1)
    )
    noncanon = dedup_components(spark, sf_dir).filter(F.col("is_canonical") == 0).select("doc_id")
    survivors = survivors.join(noncanon, "doc_id", "left_anti")
    return survivors.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --- global heavy hitters: top n-grams --------------------------------------

_TOP_NGRAMS_K = 50


@register(
    "text_top_ngrams",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
)
SELECT sh, count(*) AS doc_freq
FROM shingles GROUP BY sh
ORDER BY doc_freq DESC, sh
LIMIT {_TOP_NGRAMS_K}
""",
    tags=("text",),
    doc=f"global heavy hitters: the {_TOP_NGRAMS_K} word-3-grams present in the "
    "most documents (boilerplate/template mining — the corpus-wide view behind "
    "per-doc text_repetition). Per-doc DISTINCT keeps a doc from voting twice; "
    "the count is one partial-aggregated shuffle and the top-k plans as "
    "TakeOrderedAndProject (no global sort), so output stays K rows at any "
    "corpus size",
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meos_rs_spark.queries.dedup import _shingles

    sh = _shingles(spark, sf_dir)  # already DISTINCT (doc_id, sh)
    return (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "sh")
        .limit(_TOP_NGRAMS_K)
    )


# --- TF-IDF top terms --------------------------------------------------------

_TFIDF_TOP = 3


@register(
    "text_tfidf_topterms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         CAST(t.tf * CAST(ROUND(LN(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
  FROM tf t JOIN df d ON d.term = t.term CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= {_TFIDF_TOP}
""",
    tags=("text",),
    doc=f"TF-IDF: top-{_TFIDF_TOP} most characteristic terms per document. The "
    "idf is rounded to 6 decimals and the tf×idf product is computed in exact "
    "DECIMAL so engine-ulp differences in LN() cannot reach the hash; the df "
    "table is small (vocabulary-sized) and broadcast, so the corpus-side cost "
    "is the (doc, term) aggregation plus a per-doc top-k window",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df FROM the tf aggregate, not a second corpus explode: tf holds
    # exactly one row per distinct (doc, term), so counting its rows per
    # term IS the document frequency — vocabulary-sized work on the
    # existing exchange instead of re-scanning and re-exploding the corpus
    # plus a two-phase distinct aggregate (r10 review find)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus doc count as a scalar subquery: inlined into the projection,
    # no join operator (the 1-row crossJoin planned as a BNLJ)
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs")).scalar()
    scored = tf.join(broadcast(df), "term").withColumn(
        "tfidf",
        (
            F.col("tf")
            * F.round(F.log(n_docs.cast("double") / F.col("df")), 6).cast("decimal(18,6)")
        ).cast("double"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "tfidf")
    )


def _token_chunks(spark: SparkSession, sf_dir: str, size: int, stride: int) -> DataFrame:
    """Documents exploded into token chunks of ``size`` at ``stride``
    (stride == size → non-overlapping): one row per (doc_id, chunk_id) with
    the chunk's token array as ``ct``. Shared by text_chunking (40/30
    context windows) and dedup_chunk_level (20/20 paragraphs) — the
    __nstarts/sequence/slice construction must stay identical between them.
    Pure array expressions plus one explode; no shuffle."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    return (
        d.withColumn("__nstarts", F.floor((n - 1) / stride).cast("int"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.col("__nstarts"))).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.slice("toks", F.col("chunk_id") * stride + 1, size).alias("ct"),
        )
    )



# --- context-window chunking -------------------------------------------------

_CHUNK_SIZE = 40  # tokens per chunk
_CHUNK_STRIDE = 30  # overlap = size - stride


@register(
    "text_chunking",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_id,
         list_slice(toks, i * {_CHUNK_STRIDE} + 1, i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}) AS ct
  FROM t, unnest(generate_series(0, CAST((n - 1) // {_CHUNK_STRIDE} AS INT))) AS u(i)
)
SELECT doc_id, chunk_id,
       CAST(len(ct) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(ct, ' ')) AS chunk_hash
FROM chunks
""",
    tags=("text", "sampling"),
    doc=f"context-window chunking: each document split into {_CHUNK_SIZE}-token "
    f"chunks at stride {_CHUNK_STRIDE} (a {_CHUNK_SIZE - _CHUNK_STRIDE}-token "
    "overlap so no span is ever cut mid-context) — the tokenize-and-pack "
    "preprocessing step before sequence packing; pure array expressions per "
    "row plus one explode, no shuffle, chunk identity carried as an md5 so "
    "downstream stages can dedup/trace chunks without re-reading text",
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _token_chunks(spark, sf_dir, _CHUNK_SIZE, _CHUNK_STRIDE)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("ct").cast("bigint").alias("chunk_tokens"),
        F.md5(F.array_join("ct", " ")).alias("chunk_hash"),
    )


# --- unigram-LM log-prob quality filter --------------------------------------

_NLL_THRESHOLD = 6.0


@register(
    "text_unigram_logprob",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
freq AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
tot AS (SELECT count(*) AS t FROM toks),
scored AS (
  SELECT k.doc_id,
         CAST(ROUND(-LN(CAST(f.c AS DOUBLE) / tot.t), 6) AS DECIMAL(18,6)) AS nll
  FROM toks k JOIN freq f ON f.term = k.term CROSS JOIN tot
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(CAST(SUM(nll) AS DOUBLE) / count(*) AS DOUBLE) AS mean_nll,
       CAST(CAST(CAST(SUM(nll) AS DOUBLE) / count(*) AS DOUBLE) > {_NLL_THRESHOLD} AS INT) AS is_surprising
FROM scored GROUP BY doc_id
""",
    tags=("text",),
    doc=f"unigram-LM quality filter (the CCNet-style logprob signal): a unigram "
    "model is fit on the corpus itself (token frequencies), every document "
    "scored by mean negative log-probability, high-NLL docs flagged as "
    f"out-of-distribution (> {_NLL_THRESHOLD} nats). Per-token NLLs are "
    "rounded then summed in exact DECIMAL so LN() engine-ulp cannot reach the "
    "hash; the frequency table is vocabulary-sized and broadcast — the corpus "
    "pays one (doc, token) pass plus the per-doc aggregate",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # corpus token total = sum of the per-term counts, a vocabulary-sized
    # aggregate over freq's existing exchange — the old toks.count() form
    # was a THIRD full corpus scan+explode sharing no exchange with either
    # the probe side or the freq build (r10 review find). Still a scalar
    # subquery, not a 1-row crossJoin.
    tot = freq.groupBy().agg(F.sum("c").alias("t")).scalar()
    scored = toks.join(broadcast(freq), "term").select(
        "doc_id",
        F.round(-F.log(F.col("c").cast("double") / tot), 6)
        .cast("decimal(18,6)")
        .alias("nll"),
    )
    mean_nll = (F.sum("nll").cast("double") / F.count(F.lit(1))).cast("double")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        mean_nll.alias("mean_nll"),
        (mean_nll > _NLL_THRESHOLD).cast("int").alias("is_surprising"),
    )


# --- cross-document chunk-level dedup ----------------------------------------

_DCHUNK = 20  # non-overlapping chunk size for dedup granularity


@register(
    "dedup_chunk_level",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n FROM documents
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(toks, i * {_DCHUNK} + 1, i * {_DCHUNK} + {_DCHUNK}), ' ')) AS ch
  FROM t, unnest(generate_series(0, CAST((n - 1) // {_DCHUNK} AS INT))) AS u(i)
),
shared AS (
  SELECT ch FROM chunks GROUP BY ch HAVING count(DISTINCT doc_id) >= 2
)
SELECT c.doc_id,
       count(*) AS n_chunks,
       CAST(SUM(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(SUM(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS shared_ratio
FROM chunks c LEFT JOIN shared s ON s.ch = c.ch
GROUP BY c.doc_id
""",
    tags=("text", "dedup"),
    doc=f"chunk-level (paragraph-granularity) dedup signal: documents cut into "
    f"non-overlapping {_DCHUNK}-token chunks; a chunk whose md5 appears in "
    "≥ 2 distinct documents is boilerplate shared across the corpus, and each "
    "doc reports its shared-chunk ratio — the sub-document granularity that "
    "whole-doc hashing (dedup_exact) and doc-level sketches (MinHash) both "
    "miss; two shuffles (chunk-hash group, doc re-aggregate), both partial-"
    "aggregated",
)
def dedup_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _token_chunks(spark, sf_dir, _DCHUNK, _DCHUNK).select(
        "doc_id", F.md5(F.array_join("ct", " ")).alias("ch")
    )
    # Aggregate the chunk fact ONCE to per-(doc, chunk-hash) counts, then
    # derive everything from cf: the old shape fed the RAW chunk fact to
    # both the distinct-doc count and the probe join, so the explode ran
    # twice and the join shuffled the un-aggregated fact (r10 review
    # find). cf is distinct per (doc, ch), so counting its rows per ch IS
    # the distinct-doc count (no two-phase distinct), and the probe side's
    # ch exchange canonicalizes equal to the shared-build's — ReuseExchange
    # fires and the corpus is exploded exactly once.
    cf = chunks.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("k"))
    shared = (
        cf.groupBy("ch")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ch", F.lit(1).alias("__shared"))
    )
    joined = cf.join(shared, "ch", "left")
    n_chunks = F.sum("k")
    n_shared = F.sum(F.when(F.col("__shared").isNotNull(), F.col("k")).otherwise(0))
    return joined.groupBy("doc_id").agg(
        n_chunks.cast("bigint").alias("n_chunks"),
        n_shared.cast("bigint").alias("n_shared"),
        (n_shared.cast("double") / n_chunks).alias("shared_ratio"),
    )


# --- character-entropy quality signal ----------------------------------------


@register(
    "text_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents
),
freq AS (
  SELECT doc_id, ch, count(*) AS c FROM chars WHERE ch != '' GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM freq GROUP BY doc_id),
terms AS (
  SELECT f.doc_id, t.n,
         CAST(ROUND(-(CAST(f.c AS DOUBLE) / t.n) * LN(CAST(f.c AS DOUBLE) / t.n), 9)
              AS DECIMAL(18,9)) AS term
  FROM freq f JOIN tot t ON t.doc_id = f.doc_id
)
SELECT doc_id, max(n) AS n_chars_counted,
       count(*) AS n_distinct_chars,
       CAST(CAST(SUM(term) AS DOUBLE) AS DOUBLE) AS entropy_nats
FROM terms GROUP BY doc_id
""",
    tags=("text",),
    doc="character-level Shannon entropy per document (nats) — the classic "
    "gibberish/compression-artifact detector next to TTR and repetition: "
    "near-zero entropy is a repeated-character page, abnormally high is "
    "random bytes. Each -(p·ln p) term is rounded to 9 decimals then summed "
    "in exact DECIMAL so LN() engine-ulp cannot reach the hash; the char "
    "histogram never leaves the (doc, char) aggregation",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    chars = d.select("doc_id", F.explode(F.split("text", "")).alias("ch")).filter(
        F.col("ch") != ""
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    terms = freq.join(tot, "doc_id").select(
        "doc_id", "n", F.round(-p * F.log(p), 9).cast("decimal(18,9)").alias("term")
    )
    return terms.groupBy("doc_id").agg(
        F.max("n").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum("term").cast("double").alias("entropy_nats"),
    )


# --- PII scrubbing (regex redaction pass) -----------------------------------

_RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_PHONE = "\\+\\d{7,15}"
_RE_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
  FROM documents
),
counted AS (
  SELECT doc_id, t,
         CAST(len(regexp_extract_all(t, '{_RE_EMAIL}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(t, '{_RE_PHONE}')) AS BIGINT) AS n_phones,
         CAST(len(regexp_extract_all(t, '{_RE_IPV4}')) AS BIGINT)  AS n_ips
  FROM aug
),
scrubbed AS (
  SELECT doc_id, n_emails, n_phones, n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{_RE_EMAIL}', '<EMAIL>', 'g'),
             '{_RE_PHONE}', '<PHONE>', 'g'),
           '{_RE_IPV4}', '<IP>', 'g') AS clean
  FROM counted
)
SELECT doc_id, n_emails, n_phones, n_ips,
       right(clean, 80) AS clean_tail,
       CAST(length(clean) AS BIGINT) AS clean_len
FROM scrubbed
""",
    tags=("text", "llm"),
    doc="PII scrubbing (the redaction pass every training-data pipeline runs "
    "before tokenization): email/phone/IPv4 regex redaction with per-class "
    "hit counts. The fixture text is PII-free, so deterministic PII derived "
    "from doc_id is injected first and the scrubber is verified to remove "
    "exactly it (counts + scrubbed tail + length all hash-checked). Regexes "
    "stay in the Java-regex/RE2 common subset so both engines match "
    "identically. Pure row-local column expressions: codegen, zero shuffle, "
    "scales as a map-only pass.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1415555"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    t = d.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE, "<PHONE>"),
        _RE_IPV4, "<IP>")
    return t.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_RE_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_RE_PHONE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(_RE_IPV4)).cast("bigint").alias("n_ips"),
        F.right(clean, F.lit(80)).alias("clean_tail"),
        F.length(clean).cast("bigint").alias("clean_len"),
    )


# --- Gopher quality rules ---------------------------------------------------

_G_MIN_TOK, _G_MAX_TOK = 50, 100_000
_G_MWL_LO, _G_MWL_HI = 3, 10
_G_MIN_STOP = 2
# every gate is an INTEGER comparison (mean-word-length bounds are cleared of
# the division: sum_len >= 3*n  <=>  mwl >= 3), so pass/fail can never sit on
# a float boundary; the reported ratios are single double divisions of exact
# integers (bit-exact across engines)


@register(
    "text_gopher_rules",
    oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         n_chars - len(toks) + 1 AS sum_tok_len,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> x IN ({_sql_in(_EN)}))) AS n_stop
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(sum_tok_len AS DOUBLE) / n_tokens AS mean_word_len,
       n_stop,
       CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens AS dup_frac,
       CAST(n_tokens >= {_G_MIN_TOK} AND n_tokens <= {_G_MAX_TOK} AS INT) AS g_len,
       CAST(sum_tok_len >= {_G_MWL_LO} * n_tokens AND sum_tok_len <= {_G_MWL_HI} * n_tokens AS INT) AS g_mwl,
       CAST(n_stop >= {_G_MIN_STOP} AS INT) AS g_stop,
       CAST(2 * n_distinct >= n_tokens AS INT) AS g_dup,
       CAST(n_tokens >= {_G_MIN_TOK} AND n_tokens <= {_G_MAX_TOK}
            AND sum_tok_len >= {_G_MWL_LO} * n_tokens AND sum_tok_len <= {_G_MWL_HI} * n_tokens
            AND n_stop >= {_G_MIN_STOP}
            AND 2 * n_distinct >= n_tokens AS INT) AS passes_gopher
FROM m
""",
    tags=("text", "quality", "gopher"),
    doc="Gopher-style quality gates (Rae et al. 2021 rule battery re-expressed "
    "on this fixture): token-count bounds, mean-word-length bounds, minimum "
    "stopword evidence, duplicate-token ceiling, and the conjunctive verdict. "
    "All gates are pure integer comparisons (the mean-word-length bound is "
    "multiplied through rather than divided), so no verdict can straddle a "
    "float boundary; per-row map with no shuffle at all -- at 100 TB this is "
    "a scan-speed filter that fuses into whole-stage codegen.",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    sum_len = F.col("n_chars") - n + F.lit(1)
    nd = F.size(F.array_distinct(toks))
    nstop = F.size(F.filter(toks, lambda x: x.isin(*_EN)))
    g_len = (n >= _G_MIN_TOK) & (n <= _G_MAX_TOK)
    g_mwl = (sum_len >= _G_MWL_LO * n) & (sum_len <= _G_MWL_HI * n)
    g_stop = nstop >= _G_MIN_STOP
    g_dup = (F.lit(2) * nd) >= n
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        (sum_len.cast("double") / n).alias("mean_word_len"),
        nstop.alias("n_stop"),
        ((n - nd).cast("double") / n).alias("dup_frac"),
        g_len.cast("int").alias("g_len"),
        g_mwl.cast("int").alias("g_mwl"),
        g_stop.cast("int").alias("g_stop"),
        g_dup.cast("int").alias("g_dup"),
        (g_len & g_mwl & g_stop & g_dup).cast("int").alias("passes_gopher"),
    )
