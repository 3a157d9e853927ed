"""Golden VALUES-literal oracles for queries whose kernels are not
SQL-expressible (iterative DPs, binary packing).

``tools/gen_golden.py`` computes each query's expected output WITHOUT Spark
— DuckDB scan of the sf0.01 fixtures + the numpy/struct kernel functions
(themselves pinned by hand-built golden tests) — and renders it as a DuckDB
``SELECT ... FROM (VALUES ...)`` string into ``_golden_data.py``. The
driver's correctness gate then hash-compares the distributed Spark
implementation against an engine-independent expected result, upgrading
these queries from rows-only checks to full value verification.

Pinned to the driver-controlled deterministic sf0.01 fixtures (the scale the
driver verifies at); the local parity twin runs these at sf0.01 too
(tests/test_parity.py::test_golden_oracle_parity). Regenerate with
``python tools/gen_golden.py`` if the fixtures ever change.
"""

from __future__ import annotations

try:
    from meos_rs_spark._golden_data import GOLDEN
except ImportError:  # pragma: no cover - before first generation
    GOLDEN: dict[str, str] = {}
