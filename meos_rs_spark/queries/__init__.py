"""Explicit query-module imports (side-effect registration).

Every module listed here registers its queries on import; registry.
load_registry() asserts the result is non-empty. Do NOT rely on namespace
resolution — a missing module must raise ImportError, not silently vanish
(round-1 ADVICE.md item 1).
"""

from meos_rs_spark.queries import boxes  # noqa: F401
from meos_rs_spark.queries import dedup  # noqa: F401
from meos_rs_spark.queries import flagship  # noqa: F401
from meos_rs_spark.queries import multimodal  # noqa: F401
from meos_rs_spark.queries import serialization  # noqa: F401
from meos_rs_spark.queries import similarity  # noqa: F401
from meos_rs_spark.queries import sources_sinks  # noqa: F401
from meos_rs_spark.queries import streaming  # noqa: F401
from meos_rs_spark.queries import textanalysis  # noqa: F401
from meos_rs_spark.queries import relational  # noqa: F401
from meos_rs_spark.queries import sampling  # noqa: F401
from meos_rs_spark.queries import scalars  # noqa: F401
from meos_rs_spark.queries import temporal_types  # noqa: F401
from meos_rs_spark.queries import trajectory  # noqa: F401
from meos_rs_spark.queries import trajsim  # noqa: F401
from meos_rs_spark.queries import windows  # noqa: F401
