"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver
(BENCH_r{N}.json).

Query set mirrors the reference's instrumented pipeline (BASELINE.md): the
E3 scan→group→agg→sort→limit aggregation plus the heaviest operators per
family — trajectory assembly (A5), multi-way join, window battery, MinHash
LSH dedup, cosine top-k. Each timing covers plan build + execution to a
count/collect the way the reference times plan-exec (ais_to_db.rs:117,
142-148).

Each query is timed three times and the MIN is reported (all runs printed
on comment lines AND carried in the JSON's ``noise`` block): this box is a
shared VM with intermittent multi-× host-level slowdowns (observed:
identical plans, same session, 2.5s vs 49s; BENCH_r08's committed reading
was ~18% uniform host noise), and steady-state is the number that
transfers to a real cluster. Run-to-run plan and data are identical, so
min-of-3 measures the engine, not the neighbor's workload. For that to
hold, staging-table memoization is DISABLED (``spark.meos.staging.memo=
false``) and every query starts from the canonical session confs
(``tools.probekit.reset_confs`` — the same helper the contest probes use
per leg, so a crashed probe can never leak confs into a bench number;
r8 VERDICT item 3): with the memo on, a repeat run of a staging-backed
query (dedup_minhash_lsh, dedup_semantic) would skip the producing stages
and the parquet write entirely, and the reported min would understate the
query's real cost (r5 ADVICE, high). Every timed run does full work.

The JSON line self-describes its noise floor: 1-minute load average before
and after the sweep, the full per-query run lists, and ``spread_max`` (the
worst max/min ratio across queries — ≲1.1 is a quiet box; ≳1.4 says rerun
before concluding anything).
"""

from __future__ import annotations

import json
import os

BENCH_QUERIES = [
    "flagship_trip_pipeline",
    "rel_pricing_summary",
    "rel_join_multiway",
    "win_running_total",
    "traj_assembly",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    # round-3 session-3 additions for family breadth: the window-heavy
    # mobility interpolator and the ANN scale path. (text_curation_pipeline
    # was measured at 5.4s — dominated by the iterative connected-components
    # loop — and deliberately left out: it is a composition of operators
    # already benched individually, not a new hot path.)
    "traj_resample_linear",
    "sim_ann_ivf",
    # round-3 session-4 additions: the PQ codebook ANN path (the third ANN
    # family — codes are 64x smaller than raw vectors, the true 100 TB scan)
    # and the map-only PII redaction pass (regex-heavy codegen throughput).
    "sim_pq_ann",
    "text_pii_scrub",
    # round-3 session-5 addition: the SemDeDup path (cluster-then-prune
    # semantic dedup — the embedding-space answer to MinHash; pair work is
    # confined to k-means cells so the hot loop is cell-local)
    "dedup_semantic",
    # round-4 additions: the 3D struct-fold family (single-shuffle assembly +
    # sequential decimal fold over the assembled array) and the CRS kernel
    # (Arrow-batched pandas_udf throughput — the pyproj-shaped slot)
    "traj_stbox_z_path",
    "traj_transform_utm",
    # round-5 addition: the conic CRS closed form (second projection family
    # through the same Arrow-batched kernel slot)
    "traj_transform_lcc",
    # round-7 addition: the multimodal family's heaviest stage (baseline
    # JPEG encode→decode per document through mapInPandas) — the first
    # codec-bound entry in the bench set, measuring Arrow batch + Python
    # kernel throughput end-to-end
    "mm_jpeg_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from meos_rs_spark.registry import load_registry
    from tools.probekit import (
        bench_session,
        cpu_ticks,
        load1,
        reset_confs,
        steal_pct,
        timed_count,
        warm_up,
    )

    spark = bench_session("meos-rs-spark-bench")
    registry = load_registry()

    if os.path.isdir("/root/testdata/sf0.001"):
        warm_up(registry, BENCH_QUERIES, spark)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    load_start = load1()
    ticks_start = cpu_ticks()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        fn = registry[name].fn
        reset_confs(spark)  # canonical session per query, by construction
        timings[name], n, all_runs[name] = timed_count(
            lambda: fn(spark, sf_dir).count()
        )
        print(f"# {name}: {timings[name]}s ({n} rows; runs={all_runs[name]})", flush=True)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # spread is a NOISE signal, so queries at the 3-decimal rounding floor
    # are excluded (a [0.001, 0.004] pair is quantization, not host noise);
    # 1.0 when nothing qualifies, so the JSON stays well-formed
    spreads = [max(r) / min(r) for r in all_runs.values() if min(r) >= 0.005]
    spread_max = round(max(spreads), 3) if spreads else 1.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "noise": {
                    "load1_start": load_start,
                    "load1_end": load1(),
                    # hypervisor steal over the sweep: the host-contention
                    # signal the guest load average cannot see
                    "steal_pct": steal_pct(ticks_start, cpu_ticks()),
                    "spread_max": spread_max,
                    "runs": all_runs,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
