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

``--extremes`` swaps in the value-extreme events variant (sentinel /
pre-epoch timestamps, 1e300 doubles, near-overflow keys). Adjudicated
r12 (PREFLIGHT_r12.md): the extreme rows surface three DOCUMENTED data
contracts rather than silent bugs — (1) the fmt6/money decimal canon's
magnitude range (|x| < 10^22 for DECIMAL(28,6)): both engines ANSI-abort
loudly and consistently beyond it; (2) integer-valued temporal domains
(tint/z-order/od cells) overflow-abort on 1e300 coordinates in both
engines; (3) the streaming watermark premise (delay bounds the event-time
span, pinned in tests/test_streaming_bounds.py): one sentinel
far-future event catapults the watermark and later-arriving batches drop
— the production mitigation is an ingest sanity horizon upstream of the
watermark, out of scope for fixture-exact twins; (4) time-grid
amplification (r13, measured once the chunk-salvage machinery could see
it): a resample/grid query whose span derives from the data
(``traj_resample_linear``: markers every 6 h between consecutive posits)
turned one corrupt 1901→9999 segment into ~11.8M generated markers —
BOTH engines ground or exhausted memory (the Spark leg OOMed a
default-1 g JVM, wedging this twin's chunk in every campaign through
r14). CLOSED in r15 (r14 VERDICT item 4): a 366-day max-span validity
gate — the time-axis sibling of the XY envelope — drops such a segment
in BOTH legs symmetrically (the oracle now generates markers per
segment like the Spark leg, so the gate is one shared predicate);
extremes row now OK, pinned in tests/test_trajectory.py.

Harness-limit retirement (r16, r15 VERDICT item 3): year-9999 OUTPUTS used
to abort the sweep's own collection layer (pandas' ns epoch ends at 2262 —
ArrowInvalid/OutOfBoundsDatetime from ``toPandas()``) and were recorded as
engine ABORT/S — 17 of the 45 r15 extremes ABORT/S rows were this class.
``_collect`` now rescues exactly that cast (``toArrow()`` +
``timestamp_as_object=True``; engine aborts re-raise untouched), and every
ABORT row carries machine-bucketable ``exc_type``/``error_class``/``root``
fields so cross-round re-certification is identical-by-CLASS, not just
by count (witnesses in tests/test_adversarial_fixture.py).

``--chunked[=N]`` runs N-query chunks in subprocesses: a fatal
extreme-value crash (a mid-Arrow-stream abort can wedge the local py4j
gateway) poisons at most its chunk remainder instead of the sitting.
Since r13 every finished twin is ALSO persisted to a JSONL partial, so a
wedged chunk loses only the in-flight query (salvaged rows keep their
measured class; truly-unmeasured names get the distinct ``CHUNK_DIED``
class, and in-chunk dead-gateway cascade rows get ``WEDGED`` — neither
is ever conflated with a measured ``ABORT/S``).
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


#: Documented-envelope twins whose two legs are KNOWN to disagree on the
#: current fixture variant. EMPTY since late r12: the ten NULL-position
#: twins the r11 review adjudicated ("a point with a NULL coordinate is
#: not a point") now ENFORCE the XY envelope in both legs (functions.
#: trajectory.posits_xy / POSITS_XY_CTE) instead of documenting the
#: divergence — every registered twin agrees on the NULL/tie fixture.
#: (The value-extremes variant has its own adjudications, documented in
#: the module docstring above — those are loud both-engine aborts, not
#: divergences, so they classify as ABORT, never ENVELOPE.)
KNOWN_ENVELOPE: set[str] = set()


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


def _fresh_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("sweep-adversarial")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _session_dead(exc: Exception) -> bool:
    """An extreme-value crash can take the whole local JVM down, poisoning
    every later twin with ConnectionRefused / cannot-apply-conf noise
    (observed in the first extremes sitting: one fatal → 67 cascade rows).
    Detect the dead-session signatures so the sweep can restart and retry."""
    msg = f"{type(exc).__name__}: {exc}"
    return (
        "Connection refused" in msg
        or "could not be applied" in msg
        or "Py4JNetworkError" in msg
        or "Answer from Java side is empty" in msg
        # the in-process restart's own failure mode: the fresh builder finds
        # the half-dead context of the wedged gateway (r13 live salvage run)
        or "SESSION_OR_CONTEXT_NOT_EXISTS" in msg
    )


#: ns-overflow signatures from the Spark→pandas conversion layer: the
#: engine computed the result; only the collection cast to pandas' ns
#: epoch failed. Two spellings observed live — ArrowInvalid ("Casting
#: from timestamp[us] to timestamp[ns] would result in out of bounds…")
#: on the Arrow path and OutOfBoundsDatetime on the row-based path.
_NS_OVERFLOW_TOKENS = (
    "out of bounds timestamp",
    "Out of bounds nanosecond timestamp",
)


def _ns_overflow(exc: Exception) -> bool:
    return type(exc).__name__ in ("ArrowInvalid", "OutOfBoundsDatetime") or any(
        t in str(exc) for t in _NS_OVERFLOW_TOKENS
    )


def _collect(sdf):
    """ns-overflow-safe collect (r16, r15 VERDICT item 3).

    ``toPandas()`` converts Arrow ``timestamp[us]`` into pandas' ns epoch
    and ABORTS on year > 2262 values — a HARNESS limit, not an engine one,
    that misclassified 17 engine-green extremes rows (year-9999 sentinel
    outputs) as ABORT/S in every campaign through r15. Fast path first; on
    an ns-overflow signature, re-collect via ``toArrow()`` and convert
    with ``timestamp_as_object=True`` so out-of-ns timestamps land as
    ``datetime.datetime`` objects, which ``tests.oracle.compare``
    canonicalizes against DuckDB's ``datetime64[us]`` leg. Engine aborts
    (ANSI range, cast overflow, …) re-raise untouched — only the
    collection-cast class is rescued."""
    try:
        return sdf.toPandas()
    except Exception as exc:  # noqa: BLE001 — inspect, re-raise non-harness
        if not _ns_overflow(exc):
            raise
        return sdf.toArrow().to_pandas(timestamp_as_object=True)


_CAUSED_BY = re.compile(r"Caused by:\s*([\w.$]+(?:Exception|Error)[^\n]*)")
_ERROR_CLASS = re.compile(r"\[([A-Z][A-Z0-9_.]+)\]")


def _exc_fields(exc: Exception) -> dict:
    """Structured abort record (r15 VERDICT item 3: the extremes artifact
    recorded only a truncated string — identical-by-count, not by-class).

    Returns ``exc_type`` (python exception class), ``exc_msg`` (first
    message line), ``error_class`` (the bracketed engine error class, e.g.
    NUMERIC_VALUE_OUT_OF_RANGE / CAST_OVERFLOW / STREAM_FAILED — the
    stable cross-round bucketing key), and ``root`` (the DEEPEST
    ``Caused by:`` line, so a wrapper like StreamingQueryException exposes
    the underlying abort instead of hiding the class drift)."""
    msg = str(exc)
    first = msg.strip().splitlines()[0][:240] if msg.strip() else ""
    causes = _CAUSED_BY.findall(msg)
    classes = _ERROR_CLASS.findall(msg)
    return {
        "exc_type": type(exc).__name__,
        "exc_msg": first,
        "error_class": classes[-1] if classes else None,
        "root": causes[-1][:240] if causes else first,
    }


def run_sweep(
    spark, fixture_dir: str, names: list[str], partial_path: str | None = None
) -> dict[str, dict]:
    import duckdb

    from tests.oracle import compare
    from meos_rs_spark.registry import load_registry

    def _persist(name: str, entry: dict) -> None:
        # one JSONL line per finished twin: a later hard wedge (a
        # mid-Arrow-stream abort can take the whole py4j gateway down
        # faster than the in-process retry can catch) must lose at most
        # the in-flight query, never the chunk's measured results
        # (r13 find: the r12 extremes artifacts carried six chunk-died
        # placeholder rows that had really measured OK)
        if partial_path:
            with open(partial_path, "a", encoding="utf-8") as fh:
                fh.write(json.dumps({"name": name, **entry}) + "\n")

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
            try:
                sdf = spec.fn(spark, fixture_dir)
                spdf = _collect(sdf)
            except Exception as exc:  # noqa: BLE001
                if not _session_dead(exc):
                    raise
                # the previous twin killed the JVM — restart, retry ONCE so
                # this twin gets its own verdict instead of cascade noise
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                spark = _fresh_session()
                spark.sparkContext.setLogLevel("ERROR")
                sdf = spec.fn(spark, fixture_dir)
                spdf = _collect(sdf)
        except Exception as exc:  # noqa: BLE001 — classification sweep
            # a dead-gateway signature is NOT a measured engine abort — the
            # twin (or its predecessor) took the JVM down and the one
            # in-process restart didn't stick. Record the distinct WEDGED
            # class so cross-round comparisons and re-run targeting never
            # confuse cascade noise with a real ABORT/S (r13 live find:
            # three isolated-OK twins carried fake ABORT/S cascade rows).
            cls = "WEDGED" if _session_dead(exc) else "ABORT/S"
            entry = {
                "class": cls,
                "error": f"{type(exc).__name__}: {exc}"[:500],
                **_exc_fields(exc),
            }
            if cls == "ABORT/S":
                # the adjudicated contracts claim BOTH engines abort
                # consistently — machine-check that per row instead of
                # leaving it prose (r16): run the oracle leg anyway and
                # record whether it aborts too (and with what class)
                try:
                    entry["oracle_leg"] = {
                        "class": "RAN",
                        "rows": len(con.sql(spec.oracle).df()),
                    }
                except Exception as oexc:  # noqa: BLE001
                    entry["oracle_leg"] = {"class": "ABORT", **_exc_fields(oexc)}
            results[name] = entry
            _persist(name, entry)
            print(f"{name}: {cls} {entry['error'][:160]}", flush=True)
            continue
        try:
            ddf = con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            entry = {
                "class": "ABORT/O",
                "error": f"{type(exc).__name__}: {exc}"[:500],
                **_exc_fields(exc),
            }
            results[name] = entry
            _persist(name, entry)
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
        _persist(name, entry)
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


def _salvage_chunk(tmp: str, part: list[str]) -> dict[str, dict]:
    """A chunk subprocess died before writing its final JSON. Salvage every
    measured row from its JSONL partial (written per-query by run_sweep)
    and mark ONLY the truly-unmeasured names with the distinct class
    ``CHUNK_DIED`` — never a fake ABORT/S. (r13 find: the old backfill
    wrote {"class": "ABORT/S", "error": "chunk died"} for the WHOLE chunk,
    losing measured OK rows and polluting cross-round class comparisons —
    the r12 extremes artifacts carry six such placeholders.)"""
    salvaged: dict[str, dict] = {}
    partial = f"{tmp}.partial"
    try:
        with open(partial, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except ValueError:
                    continue  # torn final line from the crash
                n = row.pop("name", None)
                if n in part:
                    salvaged[n] = row
        os.remove(partial)
    except FileNotFoundError:
        pass
    for n in part:
        salvaged.setdefault(n, {"class": "CHUNK_DIED", "error": "chunk died before this twin ran"})
    return salvaged


def _run_chunked(names: list[str], out_json: str, chunk: int, extra: list[str]) -> None:
    """Subprocess isolation: one interpreter (and one JVM) per chunk, so a
    fatal extreme-value crash poisons at most its chunk remainder instead
    of the whole sitting (the in-process restart retry proved unreliable —
    registered UDFs and staged-table handles go stale with the gateway).
    Merges the per-chunk JSONs into ``out_json``."""
    import subprocess

    merged: dict = {}
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        tmp = f"{out_json}.chunk{i}"
        cmd = [
            sys.executable,
            "-m",
            "tools.sweep_adversarial",
            f"--only={','.join(part)}",
            f"--out={tmp}",
            *extra,
        ]
        subprocess.run(cmd, check=False)
        try:
            with open(tmp) as fh:
                merged.update(json.load(fh)["results"])
            os.remove(tmp)
        except FileNotFoundError:
            merged.update(_salvage_chunk(tmp, part))
    counts: dict[str, int] = {}
    for entry in merged.values():
        counts[entry["class"]] = counts.get(entry["class"], 0) + 1
    with open(out_json, "w") as fh:
        json.dump({"counts": counts, "results": merged}, fh, indent=1, sort_keys=True)
    print(f"# {counts} -> {out_json}", flush=True)


def main() -> None:
    families = {"docs", "tpch"}
    only: list[str] | None = None
    out_json = ".scale/sweep_adversarial.json"
    extremes = False
    chunked = 0
    for arg in sys.argv[1:]:
        if arg.startswith("--families="):
            families = set(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--only="):
            only = arg.split("=", 1)[1].split(",")
        elif arg.startswith("--out="):
            out_json = arg.split("=", 1)[1]
        elif arg == "--extremes":
            extremes = True
        elif arg.startswith("--chunked"):
            chunked = int(arg.split("=", 1)[1]) if "=" in arg else 15

    from pyspark.sql import SparkSession

    from meos_rs_spark.registry import load_registry
    from tools.adversarial_fixture import write_fixture

    fixture_dir = os.path.join(
        tempfile.gettempdir(),
        "meos_adversarial_extremes" if extremes else "meos_adversarial_fixture",
    )
    write_fixture(fixture_dir, extremes=extremes)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sweep-adversarial")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = only or select_queries(load_registry(), families)
    if chunked:
        extra = (["--extremes"] if extremes else [])
        _run_chunked(names, out_json, chunked, extra)
        return
    print(f"# sweeping {len(names)} twins over {fixture_dir}", flush=True)
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    partial = f"{out_json}.partial"
    try:
        os.remove(partial)  # a stale partial from a prior crash
    except FileNotFoundError:
        pass
    try:
        results = run_sweep(spark, fixture_dir, names, partial_path=partial)
    except Exception:
        traceback.print_exc()
        raise
    counts: dict[str, int] = {}
    for entry in results.values():
        counts[entry["class"]] = counts.get(entry["class"], 0) + 1
    with open(out_json, "w") as fh:
        json.dump({"counts": counts, "results": results}, fh, indent=1, sort_keys=True)
    try:
        os.remove(partial)  # clean finish: the final JSON supersedes it
    except FileNotFoundError:
        pass
    print(f"# {counts} -> {out_json}", flush=True)


if __name__ == "__main__":
    main()
