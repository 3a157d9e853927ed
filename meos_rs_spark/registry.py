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
