"""Driver pre-flight: two-leg compare of the verification window in the
driver's exact conditions — one fresh SparkSession, queries in
``__spark_entry__.queries()`` registration order, Spark leg vs DuckDB
oracle at sf0.01 — before the real driver does it for the round.

This catches what the pytest parity suite structurally can't: ordering-
dependent session pollution (a query flipping a conf that breaks a later
one) and anything sensitive to the driver's defaults (e.g. 200 shuffle
partitions — the sim builder deliberately sets nothing).

Usage:  python tools/preflight.py [n_queries] [sf_dir]
        (defaults: 50 — the driver's window — and /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    from tests.oracle import compare, duck_connection

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-preflight")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    # r15 ADVICE: TYPE_NOTES is a module-level audit list compare()
    # appends to — clear it up front so a long-lived process invoking
    # main() repeatedly never reprints stale notes from an earlier run
    from tests.oracle import TYPE_NOTES

    TYPE_NOTES.clear()
    # golden VALUES oracles are pinned at sf0.01 — at any other scale run
    # those queries rows-only instead of two-leg
    from meos_rs_spark.registry import load_registry

    specs = load_registry()
    golden_ok = sf_dir.rstrip("/").endswith("sf0.01")
    con = duck_connection(sf_dir)  # same fixture views as the pytest gate

    bad: list[tuple[str, object]] = []
    names = list(queries)[:n]
    t0 = time.time()
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            if "golden" in specs[name].tags and not golden_ok:
                assert sdf.count() >= 0
            elif name in oracles:
                issues = compare(sdf, con.sql(oracles[name]).df(), name)
                if issues:
                    bad.append((name, issues))
            else:
                assert sdf.count() >= 0
        except Exception as ex:  # noqa: BLE001 - report, don't abort the sweep
            bad.append((name, f"ERR {type(ex).__name__}: {ex}"))
    print(
        f"{len(names)} queries in driver order at {sf_dir}: "
        f"{len(names) - len(bad)} OK, {len(bad)} bad ({time.time() - t0:.0f}s)"
    )
    for name, detail in bad:
        print(f"  {name}: {detail}")
    # non-fatal audit trail (r14 ADVICE 2): columns whose values compared
    # equal only after date-like canonicalization — a DATE-vs-TIMESTAMP
    # engine regression surfaces here instead of vanishing (cleared at the
    # top of main(), so these notes belong to THIS run only)
    for note in TYPE_NOTES:
        print(f"  note: {note}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
