"""Direct proof of the cross-engine determinism conventions
(functions/determinism.py): render/aggregate the SAME random doubles through
Spark and DuckDB and demand byte equality — the foundation every oracle
match rests on."""

from __future__ import annotations

import numpy as np
import pytest

from meos_rs_spark.functions.determinism import fmt6_sql


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 2000),
            rng.uniform(-1, 1, 2000),
            np.round(rng.uniform(0, 1000, 2000), 2),  # money-like
            [0.0, -0.0, 1.0, -1.0, 0.0078125, 123.4565, 1e-7, -1e-7],
        ]
    )
    return [float(v) for v in vals]


def test_fmt6_renders_identically(spark, values):
    import duckdb

    df = spark.createDataFrame([(v,) for v in values], "x double")
    spark_out = [r.s for r in df.selectExpr(f"{fmt6_sql('x', 'spark')} AS s").collect()]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": values}))
    duck_out = con.sql(f"SELECT {fmt6_sql('x', 'duck')} AS s FROM t").df()["s"].tolist()
    mismatches = [
        (v, a, b) for v, a, b in zip(values, spark_out, duck_out) if a != b
    ]
    assert not mismatches, mismatches[:5]


def test_decimal_sum_is_partition_order_independent(spark, values):
    money = [round(abs(v) % 1000, 2) for v in values]
    df = spark.createDataFrame([(v,) for v in money], "x double")
    sums = set()
    for parts in (1, 7, 32):
        s = (
            df.repartition(parts)
            .selectExpr("CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s")
            .collect()[0]
            .s
        )
        sums.add(s)
    assert len(sums) == 1  # identical bits regardless of partitioning


def test_decimal_canon_magnitude_contract(spark):
    """Scope fence (r13, r12 VERDICT item 6): a value beyond the decimal
    canon's domain (|x| >= 10^16 for DECIMAL(18,2)) must abort LOUDLY and
    in BOTH engines — never silently drop into a NULL. The extremes
    campaign's 1e300 doubles surface exactly this; the pinned contract is
    the loud both-engine abort, and a try_cast widening (which would
    silently remove rows from exact sums) is a deliberate non-fix."""
    import duckdb
    import pytest

    df = spark.createDataFrame([(1e300,), (1.0,)], "x double")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|CANNOT_CHANGE_DECIMAL_PRECISION|out of range"):
        df.selectExpr("CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s").collect()
    con = duckdb.connect()
    with pytest.raises(duckdb.ConversionException):
        con.sql(
            "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s "
            "FROM (VALUES (1e300), (1.0)) t(x)"
        ).fetchall()
    # Domain-edge subclass (documented, not papered over): at INFINITY the
    # engines diverge in failure MODE — Spark's ANSI cast maps non-finite
    # doubles to NULL (only finite-out-of-range raises) while DuckDB still
    # aborts. Pin both behaviors so a Spark version that starts raising
    # (or a DuckDB that starts NULLing) surfaces here.
    assert spark.sql(
        "SELECT CAST(double('inf') AS DECIMAL(28,6)) AS x"
    ).collect()[0].x is None
    with pytest.raises(duckdb.ConversionException):
        con.sql("SELECT CAST('inf'::DOUBLE AS DECIMAL(28,6))").fetchall()


def test_unicode_lower_envelope_cross_engine(spark):
    """Case-folding contract for the normalize-then-md5 dedup queries
    (dedup_normalized, stream_fingerprint_dedup): Spark (java.lang.String,
    full Unicode mapping with contextual rules) and DuckDB (utf8proc)
    AGREE on ASCII, Latin-1/Extended, Cyrillic, CJK and compatibility
    ligatures — the working envelope — but DIVERGE on two special-case
    families probed live (r11 review): U+0130 İ (full mapping i+combining
    dot vs simple i) and Greek capital sigma in final position (contextual
    ς vs uniform σ). The divergence is pinned here, not fixed: the two
    engines' folding tables cannot be unified, the fixture generator emits
    none of the special cases, and the queries' docstrings fence the
    envelope. If either engine changes behavior, this surfaces it."""
    import duckdb

    import pyspark.sql.functions as F

    agree = ["ABCdef", "ÉÈÑÜÄÖÅ", "ÆØÞÐ", "ПРИВЕТ МИР", "ĄĆĘŁŃŚŹŻ",
             "日本語テキスト", "ĲSSEL", "ﬃ", "ǅungla"]
    diverge = ["İstanbul", "ΣΟΦΟΣ"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(agree + diverge)], "i long, s string"
    )
    got = {r.i: r.l for r in df.select("i", F.lower("s").alias("l")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(agree):
        assert got[i] == con.sql("SELECT lower(?)", params=[s]).fetchone()[0], s
    for j, s in enumerate(diverge):
        i = len(agree) + j
        assert got[i] != con.sql("SELECT lower(?)", params=[s]).fetchone()[0], (
            f"engines now AGREE on {s!r} — the documented envelope can widen"
        )


def test_array_sort_null_placement_cross_engine(spark):
    """Engine contract for array-sorting oracles (r11 probe): Spark's
    array_sort puts NULL elements LAST — matching DuckDB's list_sort — but
    Spark's sort_array (ASC default) puts them FIRST. Any oracle pair
    sorting a nullable array must use array_sort on the Spark side (or
    guarantee no NULL elements, as collect_list's NULL-dropping does);
    sort_array is only safe over NULL-free arrays. Pinned so an engine
    change surfaces."""
    import duckdb

    import pyspark.sql.functions as F

    arr = F.array(F.lit(2.0), F.lit(None).cast("double"), F.lit(1.0))
    r = (
        spark.range(1)
        .select(F.array_sort(arr).alias("a"), F.sort_array(arr).alias("s"))
        .first()
    )
    assert r.a == [1.0, 2.0, None]  # array_sort: NULLS LAST
    assert r.s == [None, 1.0, 2.0]  # sort_array ASC: NULLS FIRST
    con = duckdb.connect()
    duck = con.sql("SELECT list_sort([2.0, NULL, 1.0]::DOUBLE[])").fetchone()[0]
    assert duck == [1.0, 2.0, None]  # list_sort == array_sort, != sort_array


def test_round_double_shortest_repr_divergence(spark):
    """Engine contract behind the registry's decimal-canon rule: for the
    SAME double, Spark's round(x, n) rounds the shortest decimal
    representation (BigDecimal HALF_UP: round(1.005, 2) -> 1.01 although
    the binary value is 1.00499...) while DuckDB rounds the binary value
    (-> 1.0). Short-repr literals like 1.005 maximize the divergence;
    irrational kernel outputs (LN ratios) have 15-17 digit shortest reprs
    where the two agree to ~1e-10 probability of straddle per value —
    which is why ROUND(...,6)-then-DECIMAL twins are tolerated on LN
    outputs but ROUND on raw/money doubles must go through DECIMAL casts
    or fmt6 string canon instead. Pinned so an engine change surfaces."""
    import duckdb

    import pyspark.sql.functions as F

    got = spark.range(1).select(F.round(F.lit(1.005).cast("double"), 2).alias("r")).first().r
    assert got == 1.01  # Spark: shortest-repr HALF_UP
    con = duckdb.connect()
    assert con.sql("SELECT round(1.005::DOUBLE, 2)").fetchone()[0] == 1.0  # binary


def test_try_cast_double_grammar_divergence(spark):
    """r14 probe at the posit-envelope boundary: Spark try_cast and DuckDB
    TRY_CAST parse STRING→DOUBLE with different grammars on exactly two
    token classes — DuckDB accepts digit-separator underscores, Spark
    accepts Java numeric suffixes. A string-typed '$.k' in one of those
    classes would be dropped by one engine's envelope and kept by the
    other's; JSON numbers cannot produce either token, so the gap is
    fenced (functions/determinism.py docstring) rather than taxed onto
    every geometry query's hot path as a regex pre-grammar. This pin
    asserts the EXACT divergence set so an engine upgrade that moves the
    boundary is noticed."""
    import duckdb

    payloads = [
        "50", "5e1", " 50", "50 ", "+50", "-50", ".5", "5.", "0x32", "inf",
        "Infinity", "-Infinity", "-inf", "NaN", "nan", "1_000", "1_0", "5d",
        "5f", "50D", "50F", "", " ", "true", "null", "1e999", "-1e999",
        "00050", "5,0", "5e", "e5", "--5", "1.2.3", "0b101", "NAN", "INF",
        "+.5e-1",
    ]
    con = duckdb.connect()
    duck = {
        p: con.sql("SELECT TRY_CAST(? AS DOUBLE)", params=[p]).fetchone()[0]
        for p in payloads
    }
    sp = {
        r.s: r.v
        for r in spark.createDataFrame([(p,) for p in payloads], "s string")
        .selectExpr("s", "try_cast(s AS DOUBLE) AS v")
        .collect()
    }

    def same(a, b):
        if a is None or b is None:
            return a is None and b is None
        return a == b or (a != a and b != b)  # NaN == NaN for this purpose

    divergent = sorted(p for p in payloads if not same(sp[p], duck[p]))
    assert divergent == ["1_0", "1_000", "50D", "50F", "5d", "5f"], {
        p: (sp[p], duck[p]) for p in divergent
    }
    # and the direction is the documented one: underscores are DuckDB-only,
    # Java suffixes are Spark-only
    for p in ("1_0", "1_000"):
        assert sp[p] is None and duck[p] is not None
    for p in ("5d", "5f", "50D", "50F"):
        assert sp[p] is not None and duck[p] is None


def test_json_extraction_grammar_divergence(spark):
    """r14 probe, sibling of the try_cast grammar pin: the engines' JSON
    extractors diverge at the MALFORMED/EDGE boundary. Three fenced
    classes, unreachable while props holds well-formed JSON with bounded
    numbers (every fixture; all sweeps green):

    1. failure MODE on malformed documents — Spark get_json_object yields
       NULL, DuckDB's raw json_extract_string(VARCHAR, …) ABORTS (the
       pre-r13 CAST asymmetry class). CONVERGED on the oracle path in r15:
       the posit CTEs route through json_extract_string(TRY_CAST(props AS
       JSON), …), which NULLs like Spark — the adopted-form block below
       pins that convergence doc-by-doc. The raw-form pins stay because
       they mark the ENGINE boundary the alignment works around;
    2. leniency DIRECTION inside the malformed class — Spark tolerates
       single-quoted keys and trailing garbage (extracts a value where
       DuckDB can only NULL or abort), DuckDB tolerates trailing commas;
    3. value FORM on valid-but-extreme numbers — JSON 1e999 extracts as
       the quoted string '"Infinity"' in Spark (try_cast → NULL: the posit
       drops from the envelope) vs 'Infinity' in DuckDB (TRY_CAST → inf:
       the posit stays); huge integers extract raw-digits in Spark vs
       double-rendered in DuckDB (both cast to the SAME double, so lat
       values still agree).

    The pin asserts each class exactly so an engine upgrade that moves the
    boundary is noticed."""
    import duckdb

    con = duckdb.connect()

    def duck(doc):
        try:
            return con.sql(
                "SELECT json_extract_string(?::VARCHAR, '$.k')", params=[doc]
            ).fetchone()[0]
        except duckdb.Error:
            return "<ABORT>"

    docs = {
        "malformed_aborts": ["not json", "", '{"k": 050}', '{"k": +5}',
                             '{"k": .5}', '{"k": 5.}'],
        "spark_lenient": ["{'k': 5}", '{"k": 5} trailing'],
        "duck_lenient": ['{"k": 5,}', '{"k": NaN}'],
    }
    sp = {
        r.s: r.v
        for r in spark.createDataFrame(
            [(d,) for group in docs.values() for d in group]
            + [('{"k": 1e999}',), ('{"k": 1180591620717411303424}',)],
            "s string",
        ).selectExpr("s", "get_json_object(s, '$.k') AS v").collect()
    }
    # class 1: Spark NULL, DuckDB abort
    for d in docs["malformed_aborts"]:
        assert sp[d] is None, d
        assert duck(d) == "<ABORT>", d
    # class 2a: Spark extracts, DuckDB aborts
    for d in docs["spark_lenient"]:
        assert sp[d] == "5", d
        assert duck(d) == "<ABORT>", d
    # class 2b: DuckDB extracts, Spark NULLs
    for d in docs["duck_lenient"]:
        assert sp[d] is None, d
        assert duck(d) in ("5", "NaN"), d
    # class 3: overflow and huge-int value forms
    assert sp['{"k": 1e999}'] == '"Infinity"'
    assert duck('{"k": 1e999}') == "Infinity"
    raw = '{"k": 1180591620717411303424}'
    assert sp[raw] == "1180591620717411303424"
    assert duck(raw) == "1.1805916207174113e21"
    # ...and the huge-int forms cast to the SAME double in their own engines
    sp_d = spark.sql("SELECT try_cast('1180591620717411303424' AS DOUBLE)").first()[0]
    du_d = con.sql("SELECT TRY_CAST('1.1805916207174113e21' AS DOUBLE)").fetchone()[0]
    assert sp_d == du_d == 1.1805916207174113e21
    # --- the ADOPTED oracle form (r15): extraction through DuckDB's
    # tolerant JSON cast, exactly as the three posit CTEs spell it ---
    def duck_adopted(doc):
        try:
            return con.sql(
                "SELECT json_extract_string(TRY_CAST(?::VARCHAR AS JSON), '$.k')",
                params=[doc],
            ).fetchone()[0]
        except duckdb.Error:
            return "<ABORT>"

    # class 1 CONVERGES: malformed documents NULL in both engines — no
    # abort anywhere on the oracle path
    for d in docs["malformed_aborts"]:
        assert duck_adopted(d) is None and sp[d] is None, d
    # class 2a residual moves from abort-vs-value to NULL-vs-value
    # (Spark still extracts '5'; still unreachable on well-formed props)
    for d in docs["spark_lenient"]:
        assert duck_adopted(d) is None and sp[d] == "5", d
    # classes 2b and 3 are untouched by the JSON cast: DuckDB's own parse
    # grammar applies after the cast exactly as before
    assert duck_adopted('{"k": 5,}') == "5"
    assert duck_adopted('{"k": NaN}') == "NaN"
    assert duck_adopted('{"k": 1e999}') == "Infinity"
    assert duck_adopted(raw) == "1.1805916207174113e21"
    # and on well-formed documents the adopted form is a no-op
    for d in ('{"k": "50.0"}', '{"k": 1.5}'):
        assert duck_adopted(d) == duck(d)
