"""Round-9 scale-equivalence demo for the max-share ≈ 1.0 family.

The r9 sweep (SCALE_r09.md §1) found twelve queries whose ×10 shuffle
(16–42 MB) lands ~100% on one task. The explanation on record is the
local-mode AQE artifact: stock 64 MB advisory coalescing merges the whole
exchange into one partition, while at 100 TB the same exchange is TB-sized
and hash-spreads on its own. This probe DEMONSTRATES that claim instead of
arguing it: each query runs the ×10 leg twice —

* stock confs (the sweep's condition; advisory 64 MB ≫ the shuffle); and
* ``spark.sql.adaptive.advisoryPartitionSizeInBytes=2m`` — the same
  scale-equivalence trick the salt contest uses: with partitions targeted
  at 2 MB the 16–42 MB exchanges split into ~10–20 partitions, which is
  exactly the RELATIVE geometry a cluster-scale shuffle has vs the 64 MB
  default.

If the artifact explanation is right, the 2 MB leg's max-task share must
collapse and the wall-clock must drop toward the parallel floor; if a
query were truly key-concentrated (skew), the share would survive the
advisory change. ``python -m tools.probe_advisory [big_dir]`` prints a
markdown fragment for SCALE_r09.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the sweep's share ≈ 1.0 entries with ≥ 16 MB ×10 shuffles, plus the
#: as-of merge (0.92) — one representative per plan family.
FAMILY = [
    "traj_turning_points",
    "traj_speed_segments",
    "traj_stops",
    "serde_e2e_pipeline",
    "rel_correlated_subquery",
    "rel_scd2_intervals",
    "rel_join_asof",
    "win_event_transitions",
]

_ADVISORY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    big = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".scale", "sf1_x10")

    from meos_rs_spark.registry import load_registry
    from tools.probekit import (
        CONTEST_CONFS,
        bench_session,
        reset_confs,
        shuffle_delta,
        shuffle_stage_keys,
        task_share,
        timed_count,
        warm_up,
    )

    assert _ADVISORY in CONTEST_CONFS  # reset_confs must cover what we set
    registry = load_registry()
    spark = bench_session("meos-rs-spark-advisory-probe")
    if os.path.isdir("/root/testdata/sf0.001"):
        warm_up(registry, FAMILY, spark)

    print(
        "| query | stock ×10 (s) | share | advisory=2m ×10 (s) | share | speedup |"
    )
    print("|---|---|---|---|---|---|")
    for name in FAMILY:
        fn = registry[name].fn
        rows = []
        for conf in (None, "2m"):
            reset_confs(spark)
            if conf:
                spark.conf.set(_ADVISORY, conf)
            try:
                runs = 2
                before = shuffle_stage_keys(spark)
                t, _, _ = timed_count(lambda: fn(spark, big).count(), runs=runs)
                s = shuffle_delta(spark, before)
                rows.append((t, task_share(s, runs)))
            finally:
                reset_confs(spark)
        (t0, s0), (t1, s1) = rows
        print(
            f"| {name} | {t0} | {s0:.2f} | {t1} | {s1:.2f} | "
            f"{t0 / t1 if t1 > 0 else float('nan'):.2f}× |",
            flush=True,
        )


if __name__ == "__main__":
    main()
