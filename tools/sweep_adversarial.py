"""Sweep registered twins over the adversarial fixture and classify.

Usage::

    python -m tools.sweep_adversarial [--families docs,tpch,events] [--only a,b]

For each selected twin, runs BOTH legs (Spark query + DuckDB oracle) on
``tools.adversarial_fixture.write_fixture`` output and buckets the result:

- OK        — legs agree exactly (tests/oracle.compare, empty issue list)
- DIVERGE   — both legs ran, values/rows/schema differ
- ABORT/S   — the Spark leg raised
- ABORT/O   — the DuckDB leg raised

ABORTs are the worst class (one bad row kills the whole job at scale);
DIVERGEs are silent-wrong-answer candidates to triage into fixes or
documented envelopes. Writes a JSON report next to the fixture.
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import traceback

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

def _golden_skip() -> set[str]:
    """Twins excluded from every sweep: VALUES-literal golden oracles are
    pinned to the sf0.01 fixture and cannot reflect a synthetic one.
    Derived from the generated GOLDEN dict, never hand-listed (a stale
    hand list mis-swept traj_transform_lcc in this tool's first run)."""
    from meos_rs_spark._golden_data import GOLDEN

    return set(GOLDEN)


#: Documented-envelope twins: the serialization/trajectory NULL-position
#: envelope, adjudicated in r11 ("a point with a NULL coordinate is not a
#: point" — PREFLIGHT_r11, review batch 2) and deliberately NOT enforced
#: at the shared posits view (enforcing it would change ~60 oracle texts
#: at once, overflowing the driver's 50-slot re-verification window in one
#: round). These twins neither abort nor silently mis-answer on the real
#: NULL-free fixtures; on a NULL-position fixture their two legs disagree
#: in known ways (NaN-vs-COALESCE folds, string_agg NULL skips, parse
#: roundtrips of NULL coordinates). A DIVERGE here is expected and
#: reported as ENVELOPE; anything else in the registry must stay OK.
KNOWN_ENVELOPE = {
    "serde_mfjson",
    "serde_mfjson_ingest",
    "serde_wkt_forms",
    "serde_wkt_seqset",
    "serde_e2e_pipeline",
    "traj_length_speed",
    "traj_value_at_time",
    "traj_interp_mixed",
    "traj_od_matrix",
    "traj_stbox_z_path",
}


def tables_used(sql: str) -> set[str]:
    low = sql.lower()
    return {t for t in TABLES if re.search(rf"\b{t}\b", low)}


def select_queries(registry, families: set[str]) -> list[str]:
    picked = []
    for name, spec in registry.items():
        if name in _golden_skip() or not spec.oracle:
            continue
        used = tables_used(spec.oracle)
        fam = (
            "docs"
            if used <= {"documents", "embeddings"}
            else "tpch"
            if used
            <= {"lineitem", "orders", "customer", "supplier", "part", "nation", "region"}
            else "events"
            if used <= {"events"}
            else "mixed"
        )
        if fam in families:
            picked.append(name)
    return picked


def run_sweep(spark, fixture_dir: str, names: list[str]) -> dict[str, dict]:
    import duckdb

    from tests.oracle import compare
    from meos_rs_spark.registry import load_registry

    reg = load_registry()
    results: dict[str, dict] = {}
    for name in names:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{fixture_dir}/{t}.parquet'"
            )
        spec = reg[name]
        entry: dict = {}
        try:
            sdf = spec.fn(spark, fixture_dir)
            spdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001 — classification sweep
            entry = {"class": "ABORT/S", "error": f"{type(exc).__name__}: {exc}"[:500]}
            results[name] = entry
            print(f"{name}: ABORT/S {entry['error'][:160]}", flush=True)
            continue
        try:
            ddf = con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            entry = {"class": "ABORT/O", "error": f"{type(exc).__name__}: {exc}"[:500]}
            results[name] = entry
            print(f"{name}: ABORT/O {entry['error'][:160]}", flush=True)
            continue
        try:
            # re-wrap the collected pandas frame so compare() sees it once
            issues = compare(_Wrapped(spdf), ddf, name)
        except Exception as exc:  # noqa: BLE001
            issues = [f"compare raised {type(exc).__name__}: {exc}"[:300]]
        cls = "OK" if not issues else (
            "ENVELOPE" if name in KNOWN_ENVELOPE else "DIVERGE"
        )
        entry = {
            "class": cls,
            "rows_spark": len(spdf),
            "rows_duck": len(ddf),
            "issues": issues[:5],
        }
        results[name] = entry
        print(f"{name}: {entry['class']} ({len(spdf)} vs {len(ddf)} rows)", flush=True)
        if issues:
            for i in issues[:3]:
                print(f"    {i[:200]}", flush=True)
    return results


class _Wrapped:
    """Adapter so compare() (which calls .toPandas()) accepts a collected frame."""

    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):  # noqa: N802 — mirrors the pyspark API
        return self._pdf


def main() -> None:
    families = {"docs", "tpch"}
    only: list[str] | None = None
    out_json = ".scale/sweep_adversarial.json"
    for arg in sys.argv[1:]:
        if arg.startswith("--families="):
            families = set(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--only="):
            only = arg.split("=", 1)[1].split(",")
        elif arg.startswith("--out="):
            out_json = arg.split("=", 1)[1]

    from pyspark.sql import SparkSession

    from meos_rs_spark.registry import load_registry
    from tools.adversarial_fixture import write_fixture

    fixture_dir = os.path.join(tempfile.gettempdir(), "meos_adversarial_fixture")
    write_fixture(fixture_dir)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sweep-adversarial")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = only or select_queries(load_registry(), families)
    print(f"# sweeping {len(names)} twins over {fixture_dir}", flush=True)
    try:
        results = run_sweep(spark, fixture_dir, names)
    except Exception:
        traceback.print_exc()
        raise
    counts: dict[str, int] = {}
    for entry in results.values():
        counts[entry["class"]] = counts.get(entry["class"], 0) + 1
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump({"counts": counts, "results": results}, fh, indent=1, sort_keys=True)
    print(f"# {counts} -> {out_json}", flush=True)


if __name__ == "__main__":
    main()
