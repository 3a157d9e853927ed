"""Staging-table materialization — the 100 TB substitute for ``.cache()``.

``df.cache()`` pins the materialized intermediate in executor memory (with
optional disk spill), which is the right call at fixture scale but the wrong
dependency at 100 TB: an exploded intermediate (e.g. the shingle fact table
behind MinHash dedup) is ~10x the corpus and cannot be assumed to fit the
cluster's storage memory, and cache eviction silently degrades to full
recomputation of the producing stage — per consumer.

``stage()`` writes the intermediate once to a parquet staging table and hands
every consumer a plain scan of it: columnar-compressed, spill-free,
predictable. Re-staging the SAME plan under the same name within one session
is a no-op read (the memo below), so repeated invocations of one query fn —
e.g. the driver's two-leg compare — pay the write once, not per call.

Memoization guardrails (r5 ADVICE):

* ``spark.meos.staging.memo=false`` disables the memo entirely — every
  ``stage()`` does the full write. ``bench.py`` sets this so its min-of-2
  timing protocol measures two FULL executions, not one full run and one
  memo-hit that skips the producing stages.
* The memo only engages when every input file of the staged plan lives
  under a trusted immutable root — the fixture dirs (default
  ``/root/testdata``, override with ``spark.meos.staging.memoRoots``,
  comma-separated) or this session's own staged tables. A plan scanning a
  mutable scratch dir (e.g. the sources/sinks queries' per-invocation
  ``_scratch`` rewrites) would otherwise memo-hit on stale data with an
  identical plan text.

On a cluster the staging root points at the job's scratch prefix (HDFS/S3);
locally it defaults to the system temp dir. Set ``spark.meos.staging.dir``
to relocate. With a non-local (URI) root, the liveness-marker/PID prune
machinery is skipped — PIDs are meaningless across machines and the
``os.*`` calls don't speak URIs — so dead-session cleanup there is owned by
the cluster's scratch retention policy, not this module.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import re
import shutil
import tempfile
import time

from pyspark.sql import DataFrame

_STALE_AFTER_S = 24 * 3600
_LIVE_MARKER = ".live"
_CLEANUP_REGISTERED: set[str] = set()
#: (applicationId, table name) -> (canonical plan digest, parquet path).
#: A hit means the exact same logical plan was already materialized under
#: this name by this session — return a scan instead of rewriting.
_MEMO: dict[tuple[str, str], tuple[str, str]] = {}


def _touch_live(app_dir: str) -> None:
    """Refresh this session's liveness marker (mtime + owning PID).

    Called on every ``stage()`` — writes AND memoized reads. The marker
    carries the owner's PID so pruning can check REAL liveness: a session
    that staged its tables early and then only reads them through
    already-returned DataFrame scans never calls ``stage()`` again, so its
    marker mtime alone would go stale while the session is still alive.
    """
    try:
        marker = os.path.join(app_dir, _LIVE_MARKER)
        with open(marker, "w") as f:
            f.write(str(os.getpid()))
        os.utime(marker, None)
    except OSError:
        pass


def _sibling_prunable(path: str, cutoff: float) -> bool:
    """A sibling app dir may be pruned only if its marker is stale AND its
    owning process is gone (PID check; ``stage()`` gates this whole path on
    ``_is_local_root``, so the owner — if alive — is on this machine).
    Marker-less dirs (sessions from before the marker existed) fall back to
    dir mtime."""
    marker = os.path.join(path, _LIVE_MARKER)
    try:
        mtime = os.path.getmtime(marker)
    except OSError:
        try:
            return os.path.getmtime(path) < cutoff
        except OSError:
            return False  # racing a concurrent delete — leave it alone
    if mtime >= cutoff:
        return False
    try:
        pid = int(open(marker).read().strip())
    except (OSError, ValueError):
        return True  # stale marker, owner unknowable
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True  # owner provably gone
    except OSError:
        return False  # EPERM: process EXISTS under another uid — alive
    return False  # owner still alive (or PID reused — keep, it's cheap)


def _register_cleanup(app_dir: str, root: str) -> None:
    """Own staged tables are deleted at interpreter exit; sibling app dirs
    whose liveness marker is >24h stale belong to sessions that died before
    their atexit ran and are pruned opportunistically — staged intermediates
    (the shingle fact alone is ~10x the corpus) must not accumulate across
    bench/test rounds."""
    if app_dir in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(app_dir)
    atexit.register(shutil.rmtree, app_dir, True)
    cutoff = time.time() - _STALE_AFTER_S
    try:
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if p != app_dir and os.path.isdir(p) and _sibling_prunable(p, cutoff):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _is_local_root(root: str) -> bool:
    """True when ``root`` is a plain machine-local path (or file: URI)."""
    return "://" not in root or root.startswith("file:")


def _plan_digest(df: DataFrame) -> str | None:
    """Canonical digest of the analyzed logical plan PLUS its input files.

    Expression IDs (``#123``) are allocated from a global counter, so two
    invocations of the same query fn produce textually different but
    semantically identical plans. Deleting the digits would collide plans
    that differ only in exprId CROSS-REFERENCES (``x#1 = x#2`` in a
    self-join vs a different pairing), so instead each distinct id is
    renumbered in first-occurrence order — a stable relabeling that
    preserves reference structure.

    The plan text alone is NOT enough: ``LogicalRelation.toString`` renders
    a parquet scan as ``Relation [cols] parquet`` with no path, so the same
    query over two different fixture dirs (the parity gate runs sf0.001 and
    sf0.01 in one session) produces identical plan text — a memo hit there
    would serve the other scale's staged table as this one's result. The
    sorted input-file list is therefore mixed into the digest. In-memory
    relations (``LocalRelation``/``LogicalRDD`` — ``createDataFrame`` data,
    RDD-backed frames) carry their ROWS outside the plan text AND outside
    the file list, so two different literal datasets would still digest
    identically; any plan containing one disables memoization outright
    (``spark.range`` is fine — its Range node is fully described by the
    text). Plan + input equality then implies result equality for immutable
    inputs (enforced by the trusted-roots check in ``stage()``). Returns
    None when the JVM plan or file listing is unreachable (e.g. Spark
    Connect), which disables memoization and falls back to always-write.
    """
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        # Spark's own canonicalized form: exprIds normalized structurally
        # (references preserved) while string literals stay VERBATIM — the
        # text relabeler it replaces rewrote '#<digits>' inside literal
        # values too, so plans differing only in a literal like 'a#100' vs
        # 'a#200' digested identically and the memo served the wrong
        # staged table (review find, r7; reproduced live). The homegrown
        # _canon_plan remains only as the fallback when the JVM lazy val
        # is unreachable.
        try:
            plan = analyzed.canonicalized().toString()
        except Exception:
            plan = _canon_plan(analyzed.toString())
        files = "\0".join(sorted(df.inputFiles()))
    except Exception:
        return None
    if "LocalRelation" in plan or "LogicalRDD" in plan:
        return None
    # canonicalized() normalizes output alias NAMES away, so two stage()
    # calls under one table name differing only in column aliases would
    # digest identically and the memo would serve the first build's parquet
    # with stale column names (r7 ADVICE item 2) — mix the output schema in
    schema = df.schema.simpleString()
    return hashlib.sha256(
        (plan + "\1" + files + "\2" + schema).encode()
    ).hexdigest()


def _canon_plan(plan: str) -> str:
    """Relabel exprIds in first-occurrence order (see ``_plan_digest``).

    Keyed on the NUMERIC id, not the matched text, so ``#0`` and ``#00``
    relabel identically — Spark never emits leading zeros, but numeric
    identity is what the relabeling means."""
    ids: dict[int, str] = {}
    return re.sub(
        r"#(\d+)",
        lambda m: ids.setdefault(int(m.group(1)), f"#{len(ids)}"),
        plan,
    )


def _memo_trusted(df: DataFrame, app_dir: str) -> bool:
    """Memoization is sound only over immutable inputs: every input file
    must live under a trusted root — the read-only fixture dirs or this
    session's own staged tables (whose content is keyed by their producing
    plan's digest). Unknown inputs (or an unreachable file listing) fall
    back to always-write."""
    spark = df.sparkSession
    try:
        roots = spark.conf.get("spark.meos.staging.memoRoots")
    except Exception:
        roots = None
    trusted = [r for r in (roots or "/root/testdata").split(",") if r]
    trusted.append(app_dir)
    trusted = [os.path.abspath(r) + os.sep for r in trusted]
    try:
        files = df.inputFiles()
    except Exception:
        return False
    for f in files:
        local = re.sub(r"^file:/{0,2}(?=/)", "", f)
        if "://" in local:
            return False  # remote input — immutability unknowable here
        if not os.path.abspath(local).startswith(tuple(trusted)):
            return False
    return True


def fan_out(df: DataFrame, *keys: str, force: bool = False) -> DataFrame:
    """Spread an under-split scan across the session's parallelism.

    A small fixture table arrives as ONE parquet split, which would
    serialize every downstream per-row kernel (mapInPandas codecs, the
    md5-heavy shingle maps) onto a single core. When the scan has fewer
    partitions than the session's parallelism, repartition by ``keys`` so
    per-key work downstream reuses the partitioning; at real scale the scan
    already has >= parallelism splits and this is a no-op — no shuffle is
    added. One shared policy for every call site (dedup shingles, the
    multimodal payload stages).

    ``force=True`` repartitions UNCONDITIONALLY: callers that feed a
    grouped applyInPandas need the explicit (AQE-coalesce-exempt) keyed
    exchange itself, because otherwise the groupBy inserts its own
    exchange whose few-MB output AQE coalesces to ~1 partition — a hazard
    independent of the SCAN's partition count, so the n < par guard tests
    the wrong thing for them (r8 review find). The forced exchange replaces
    the groupBy's, so no extra shuffle appears in the plan. Under Spark
    Connect (no sparkContext) the forced path must NOT degrade to a no-op
    — the AQE-serialization hazard it exists for is execution-side, not
    classic-API-side — so it falls back to the session's shuffle-partition
    count, which repartition(n, ...) makes equally AQE-coalesce-exempt
    (r8 ADVICE item 1)."""
    spark = df.sparkSession
    if force:
        # No .rdd probe here: the scan's split count is irrelevant to the
        # group-exchange hazard, and .rdd raises under Connect.
        try:
            par = spark.sparkContext.defaultParallelism
        except Exception:
            # shuffle.partitions may be non-numeric ('auto' on managed
            # platforms) — fall back to the engine default rather than
            # crashing the very environment this branch exists for
            try:
                par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            except (ValueError, TypeError):
                par = 200
        return df.repartition(par, *keys)
    try:
        # .rdd / sparkContext raise under Spark Connect; the unforced probe
        # is a local-mode fixture mitigation only, so degrade to a no-op
        # there (matching _plan_digest's Connect fallback — r7 ADVICE 3)
        par = spark.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n < par:
        df = df.repartition(par, *keys)
    return df


def side_table_name(base: str, sf_dir: str) -> str:
    """Staging-table name keyed by fixture dir — the default for ANY staged
    table built from a specific fixture scale. Two hazards both require it:
    executor-side caches (functions/quantize._load_side) key by path, so a
    session running one query at two scales must stage two tables; and a
    second-scale build overwriting a fixed name's part-files breaks scans
    the first scale's already-returned DataFrame resolved (ADVICE r6)."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"{base}_{key}"


def dir_fingerprint(path: str):
    """Cheap change detector for a staged table dir: (name, size, mtime_ns)
    per DATA file — ``_SUCCESS``/dot-metadata excluded, since any parquet
    payload change always touches a data file and metadata-only touches
    must not read as content changes. Local paths only; None on unreadable
    dirs (URI-rooted staging relies on sf-keyed names for freshness).
    Shared by the executor-side side-table cache (functions/quantize) and
    the memo digest below — the two sensitivities must never diverge."""
    try:
        return tuple(
            (f, st.st_size, st.st_mtime_ns)
            for f in sorted(os.listdir(path))
            if not f.startswith(("_", "."))
            for st in (os.stat(os.path.join(path, f)),)
        )
    except OSError:
        return None


def _side_inputs_fingerprint(paths) -> str | None:
    """Content fingerprint for Python-UDF side inputs (ADVICE r6): a staged
    plan whose Arrow kernel reads a side table (e.g. the nearest-centroid
    UDF's quantizer dir) carries that dependency in neither the plan text
    nor ``df.inputFiles()``, so the caller must declare it and its state
    must be mixed into the memo digest. Local dirs only — returns None
    (memo off) for URI paths or unreadable dirs."""
    parts = []
    for p in sorted(paths):
        if "://" in p and not p.startswith("file:"):
            return None
        ap = os.path.abspath(re.sub(r"^file:/{0,2}(?=/)", "", p))
        fp = dir_fingerprint(ap)
        if fp is None:
            return None
        parts.append((ap, fp))
    return repr(parts)


def adopt_app_dir(app_dir: str, root: str) -> None:
    """Give a non-staging per-application scratch dir (e.g. the sqlite store
    behind ``snk_jdbc_upsert``) the same lifecycle as staged tables: created
    now, liveness-marked, removed at interpreter exit, and stale siblings
    from dead sessions pruned opportunistically (ADVICE r4: such dirs
    otherwise accumulate one per bench/test session forever)."""
    os.makedirs(app_dir, exist_ok=True)
    _register_cleanup(app_dir, root)
    _touch_live(app_dir)


def staged_table_path(spark, name: str) -> str:
    """The on-disk path ``stage(df, name)`` writes to in this session.

    Public so side-input readers (functions/quantize.py) can locate a staged
    table from inside an executor-side kernel: the path is deterministic
    given the session (staging root + applicationId namespace + name), which
    is exactly what makes a staged K-row quantizer usable as a per-worker
    side file without shipping it through a join.
    """
    try:
        root = spark.conf.get("spark.meos.staging.dir")
    except Exception:
        root = None
    if not root:
        root = os.path.join(tempfile.gettempdir(), "meos_rs_staging")
    # namespace by application id: two Spark sessions on one machine (a bench
    # run next to a test run) must never overwrite each other's staged tables
    # mid-read; within one session the overwrite keeps reruns idempotent
    return os.path.join(root, spark.sparkContext.applicationId, name)


def stage(df: DataFrame, name: str, side_inputs: tuple[str, ...] = ()) -> DataFrame:
    """Materialize ``df`` under the staging root and return a scan of it.

    ``mode("overwrite")`` keeps repeated invocations (bench reruns, the
    driver's two-leg compare) idempotent; the write is eager, so the
    producing stages run exactly once no matter how many consumers fan out
    downstream (the property ``.cache()`` only guarantees while the blocks
    survive eviction). Within one session, re-staging an identical plan
    under the same name skips the write entirely and returns the existing
    table's scan — unless ``spark.meos.staging.memo=false`` or the plan
    reads outside the trusted immutable roots (module docstring).

    ``side_inputs``: paths any Python-UDF kernel in ``df``'s plan reads
    outside Spark's knowledge (staged quantizer dirs). Their content
    fingerprint joins the memo digest, so a changed side table re-stages
    even though the plan text and input-file list are unchanged.
    """
    spark = df.sparkSession
    path = staged_table_path(spark, name)
    app_dir = os.path.dirname(path)
    root = os.path.dirname(app_dir)
    if _is_local_root(root):
        # the dir must exist BEFORE the liveness touch: on the session's
        # first stage() call the parquet write hasn't created it yet, and a
        # swallowed marker-write failure would leave the session on the
        # dir-mtime prune path
        os.makedirs(app_dir, exist_ok=True)
        _register_cleanup(app_dir, root)
        _touch_live(app_dir)
    key = (spark.sparkContext.applicationId, name)
    try:
        memo_on = spark.conf.get("spark.meos.staging.memo", "true") != "false"
    except Exception:
        memo_on = True
    digest = _plan_digest(df) if memo_on else None
    if digest is not None and side_inputs:
        sfp = _side_inputs_fingerprint(side_inputs)
        digest = (
            None
            if sfp is None
            else hashlib.sha256((digest + "\2" + sfp).encode()).hexdigest()
        )
    if (
        digest is not None
        and _MEMO.get(key) == (digest, path)
        and os.path.isdir(path)
    ):
        return spark.read.parquet(path)
    if digest is not None and not _memo_trusted(df, app_dir):
        digest = None
    # zstd over the default snappy: measured on the heaviest staged table
    # (the minhash signature with its shingle-set arrays) it writes as fast
    # or faster AND ~30% smaller — at 100 TB the staged intermediate's
    # scratch IO (write once, read per consumer) is the cost that matters
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    if digest is not None:
        _MEMO[key] = (digest, path)
    else:
        _MEMO.pop(key, None)
    return spark.read.parquet(path)
