"""Scalar function batteries (SURVEY.md §2.8: F11, F12 + standard
string/date/math/array/JSON — absent in the reference because its host
languages provide them; first-class declared queries here).

Cross-engine notes baked into each query:
  * day-of-week conventions differ (Spark 1=Sun, DuckDB 0=Sun) — avoided;
  * Spark datediff(end,start) vs DuckDB date_diff(part,start,end) — avoided
    in favor of epoch arithmetic;
  * regexes kept to the common Java/RE2 subset;
  * no printf on doubles (determinism.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meos_rs_spark.registry import register
from meos_rs_spark.sources.tables import load_table


# --- strings (F12 concat_ws + battery) -------------------------------------


@register(
    "scalar_strings",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substr(c_name, 1, 8) AS name_prefix,
       length(c_name) AS name_len,
       concat_ws('|', c_mktsegment, c_name) AS tagged,
       replace(c_name, '#', '-') AS dashed,
       CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key
FROM customer
""",
    tags=("F12", "scalar"),
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
    )


# --- dates (F11 timestamp parse + battery) ---------------------------------


@register(
    "scalar_dates",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mon,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(day(o_orderdate) AS INT) AS dom,
       epoch_us(o_orderdate) AS epoch_micros,
       o_orderdate + INTERVAL 90 DAY AS due_date
FROM orders
""",
    tags=("F11", "scalar"),
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("epoch_micros"),
        F.expr("o_orderdate + INTERVAL 90 DAY").alias("due_date"),
    )


@register(
    "scalar_ts_roundtrip",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_text,
       epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '%Y-%m-%d %H:%M:%S.%f')) AS reparsed_us
FROM events
""",
    tags=("F11",),
    doc="WKT-style timestamp render + parse round-trip (04_to_file.rs:146-148 analog)",
)
def scalar_ts_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    txt = F.date_format("ts", fmt)
    # reparse built FROM fmt — the old expr string carried two more
    # hand-copies of the pattern that could drift from the render
    # (r10 review find)
    return ev.select(
        "event_id",
        txt.alias("ts_text"),
        F.unix_micros(F.to_timestamp(txt, fmt)).alias("reparsed_us"),
    )


# --- math ------------------------------------------------------------------


@register(
    "scalar_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000) AS dev,
       round(l_extendedprice / 1000, 1) AS price_k,
       CAST(floor(l_quantity / 7) AS BIGINT) AS q7,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS q7c,
       l_linenumber % 3 AS mod3,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate
FROM lineitem
""",
    tags=("scalar",),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("dev"),
        F.round(F.col("l_extendedprice") / 1000, 1).alias("price_k"),
        F.floor(F.col("l_quantity") / 7).alias("q7"),
        F.ceil(F.col("l_quantity") / 7).alias("q7c"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


# --- conditionals ----------------------------------------------------------


@register(
    "scalar_case_coalesce",
    oracle="""
SELECT event_id,
       CASE WHEN value < 10 THEN 'low' WHEN value < 100 THEN 'mid' ELSE 'high' END AS band,
       coalesce(nullif(event_type, 'view'), 'VIEWED') AS et,
       CASE WHEN value IS NULL THEN -1 ELSE 1 END AS has_value
FROM events
""",
    tags=("scalar",),
)
def scalar_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 10, "low").when(F.col("value") < 100, "mid").otherwise("high").alias("band"),
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("VIEWED")).alias("et"),
        F.when(F.col("value").isNull(), -1).otherwise(1).alias("has_value"),
    )


# --- JSON (events.props fixture) -------------------------------------------


@register(
    "scalar_json",
    oracle="""
SELECT event_id,
       CAST(FLOOR(CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS DOUBLE)) AS BIGINT) AS k_val,
       json_extract_string(TRY_CAST(props AS JSON), '$.missing') AS missing_val,
       CASE WHEN json_extract(TRY_CAST(props AS JSON), '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
FROM events
""",
    tags=("scalar", "json"),
    doc="JSON extraction battery. k_val goes through DOUBLE + FLOOR in both "
    "legs: the engines' strict integer-cast grammars diverge on "
    "decimal-rendered JSON numbers (Spark CAST('1.0' AS BIGINT) ABORTS, "
    "DuckDB returns 1 — r11 review, probed live), so the direct cast was "
    "both a one-bad-row job killer and a twin mismatch on any fixture "
    "whose k renders with a decimal point. Extraction goes through "
    "TRY_CAST(props AS JSON) like the posit CTEs (r15 review find: these "
    "two scalar oracles were the last raw sites, so a malformed document "
    "still aborted the DuckDB leg here after the CTE convergence; probed "
    "live — 'not json' now reads NULL/has_k=0 in both engines, well-formed "
    "docs are a no-op, and a registry-wide lint pins zero raw sites).",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(
            "CAST(FLOOR(CAST(get_json_object(props, '$.k') AS DOUBLE)) AS BIGINT)"
        ).alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1).otherwise(0).alias("has_k"),
    )


# --- arrays (documents.text tokens) ----------------------------------------


@register(
    "scalar_arrays",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       toks[1] AS first_tok,
       toks[-1] AS last_tok,
       CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
       len(list_distinct(toks)) AS n_distinct,
       array_to_string(toks[1:3], '_') AS head3
FROM t
""",
    tags=("scalar", "array"),
)
def scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("head3"),
    )


# --- regexp ----------------------------------------------------------------


@register(
    "scalar_regexp",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       CAST(regexp_matches(text, 'spark.*join|join.*spark') AS INT) AS spark_join
FROM documents
""",
    tags=("scalar", "regexp"),
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+', 0)")).alias("n_word_tokens"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("spark.*join|join.*spark").cast("int").alias("spark_join"),
    )


# --- maps ------------------------------------------------------------------


@register(
    "scalar_maps",
    oracle="""
WITH t AS (
  SELECT doc_id, map {'lang': lang, 'source': source} AS m FROM documents
)
SELECT doc_id,
       m['lang'][1] AS lang_val,       -- DuckDB map access yields a list
       m['source'][1] AS source_val,
       CAST(cardinality(m) AS INT) AS n_keys,
       array_to_string(map_keys(m), ',') AS keys_csv
FROM t
""",
    tags=("scalar", "map"),
    doc="map construction/access battery (map_from_arrays, element access, keys)",
)
def scalar_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        m["lang"].alias("lang_val"),
        m["source"].alias("source_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


# --- ANSI-safe (try_*) arithmetic battery -----------------------------------


@register(
    "scalar_try_arith",
    oracle="""
SELECT event_id,
       1.0 / NULLIF(value - 50.0, 0.0) AS inv_dist,
       CAST(value = 50.0 AS INT) AS hit_pole,
       TRY_CAST(event_type AS DOUBLE) AS et_num,
       CAST(FLOOR(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS DOUBLE)) AS BIGINT) AS k_num,
       COALESCE(TRY_CAST(event_type AS DOUBLE), -1.0) AS et_num_or_default
FROM events
""",
    tags=("scalar",),
    doc="error-safe arithmetic under ANSI mode (Spark 4 default): try_divide "
    "yields NULL instead of raising on the value=50.0 pole (the 2-decimal "
    "fixture makes the zero exact), try_cast NULLs un-parseable strings, and "
    "COALESCE supplies the pipeline default — the idioms that keep a 100 TB "
    "job from dying on one malformed row; DuckDB twins via NULLIF/TRY_CAST",
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.lit(1.0), F.col("value") - 50.0).alias("inv_dist"),
        (F.col("value") == 50.0).cast("int").alias("hit_pole"),
        F.expr("try_cast(event_type AS DOUBLE)").alias("et_num"),
        # via DOUBLE + FLOOR, not try_cast-to-BIGINT directly: the engines'
        # integer-literal grammars diverge on decimal-rendered numbers
        # (Spark try_cast('1.0' AS BIGINT) = NULL, DuckDB TRY_CAST = 1 —
        # r11 review, probed live) and Spark's double→int cast truncates
        # where DuckDB's rounds; FLOOR-then-cast is grammar- and
        # rounding-neutral in both
        F.expr(
            "CAST(FLOOR(try_cast(get_json_object(props, '$.k') AS DOUBLE)) AS BIGINT)"
        ).alias("k_num"),
        F.coalesce(F.expr("try_cast(event_type AS DOUBLE)"), F.lit(-1.0)).alias("et_num_or_default"),
    )


# --- bitwise battery --------------------------------------------------------


@register(
    "scalar_bitwise",
    oracle="""
SELECT e.event_type,
       bit_and(e.event_id) AS all_and,
       bit_or(e.event_id)  AS any_or,
       bit_xor(e.event_id) AS parity_xor,
       CAST(sum(bit_count(e.event_id)) AS BIGINT) AS popcount_total,
       CAST(sum(CASE WHEN (e.event_id & 7) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS aligned8,
       max(((e.event_id & 255) << 8) | ((e.event_id >> 8) & 255)) AS swapped_max
FROM events e
GROUP BY e.event_type
""",
    tags=("scalar",),
    doc="bitwise battery: per-type AND/OR/XOR fold aggregates, popcount sum, "
    "8-alignment predicate via mask, and a byte-swap shift expression — the "
    "bit-twiddling toolkit behind flag columns, bloom-style masks, and packed "
    "ids; all fold aggregates are order-independent so no decimal canon needed",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.groupBy("event_type").agg(
        F.bit_and(eid).alias("all_and"),
        F.bit_or(eid).alias("any_or"),
        F.bit_xor(eid).alias("parity_xor"),
        F.sum(F.bit_count(eid)).cast("bigint").alias("popcount_total"),
        F.sum(F.when(eid.bitwiseAND(7) == 0, 1).otherwise(0)).cast("bigint").alias("aligned8"),
        F.max(F.shiftleft(eid.bitwiseAND(255), 8).bitwiseOR(F.shiftright(eid, 8).bitwiseAND(255))).alias("swapped_max"),
    )
