"""Explicit query-module imports (side-effect registration).

Every module listed here registers its queries on import; registry.
load_registry() asserts the result is non-empty. Do NOT rely on namespace
resolution — a missing module must raise ImportError, not silently vanish
(round-1 ADVICE.md item 1).
"""

from meos_rs_spark.queries import flagship  # noqa: F401
