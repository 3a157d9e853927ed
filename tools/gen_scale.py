"""Synthesize a larger fixture from sf0.1 by key-remapped replication —
the round-7 empirical scale probe (VERDICT r6 item 3: the 100× claims
rested on plan shapes alone; this gives them a measured data point).

``python -m tools.gen_scale [R] [src_dir] [dst_dir]`` replicates every
scale-bearing table R times (default 10: sf0.1 → ~sf1, ~6M lineitem rows)
with keys remapped consistently across tables (replica r adds
``r * (max_key + 1)`` in each key domain), so referential integrity, join
fan-outs, group cardinalities per key, and per-key series lengths are all
preserved while key counts scale by R — the same shape real growth has.
``region``/``nation`` stay fixed-size, exactly like TPC-H's own scaling.

Two columns get per-replica perturbation so replicas don't degenerate:

* ``documents.text`` is passed through a per-replica printable-ASCII
  substitution (identity for r=0). Without it every doc would gain R-1
  exact duplicates and the dedup benches would measure a pathological
  all-dup corpus instead of a scaled one; the substitution changes every
  shingle while preserving length, byte-width and ASCII-ness (the
  multimodal oracles' contract).
* ``embeddings.embedding`` is rotated by r positions (identity for r=0),
  which preserves the norm distribution but decorrelates replicas so ANN
  top-k/cell structure scales instead of collapsing into R-way ties.

Deterministic, pure pyarrow/pandas/numpy — no Spark session needed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: Max rows per parquet row group in generated fixtures. pyarrow's default
#: (1 Mi rows) packs a whole replicated table into ONE row group, and Spark
#: cannot parallelize INSIDE a row group - every scale-fixture scan then
#: runs as a single task no matter the split math, so the x10 sweep
#: measures serial-scan scaling instead of plan scaling (r13 find: the
#: events x10 leg ran 1 task while lineitem got 6 only because it crossed
#: the 1 Mi default). 128k rows mirrors production parquet (a 100 TB table
#: has thousands of row groups) while keeping footer overhead trivial.
ROW_GROUP_ROWS = 128 * 1024

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FIXED = {"region", "nation"}  # dimension tables that don't scale (TPC-H-like)

#: key domains remapped per replica: table -> columns in that domain
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

#: --skew: fact-side columns where one hot key absorbs its residue class.
#: In replicas r>0, rows whose BASE key shares the hot key's residue mod m
#: are reassigned the hot key itself (un-offset), so at R=10 one
#: customer/supplier/vessel ends up holding ~(R-1)/(m*R) ≈ 22.5% of the
#: whole fact table — the "one MMSI ≫ others" case (SURVEY §4, r7 VERDICT
#: item 3). Only FK/grouping columns are skewed; PK columns offset
#: normally, so referential integrity holds (the hot key exists in
#: replica 0's dimension slice) and replica dimensions merely go childless.
#: residue modulus m: hot fraction ≈ (R-1)/(m*R) — replica 0 keeps its
#: base keys, each of the R-1 others donates its 1/m residue class; m=4 →
#: 22.5% at R=10. SPARK_GRAFT_SKEW_MOD overrides (m=2 → ~47.5% at R=20:
#: the heavier contest the salted-join probe uses for the crossover).
_SKEW_MOD = int(os.environ.get("SPARK_GRAFT_SKEW_MOD", "4"))
SKEW_FACT: dict[tuple[str, str], int] = {
    ("orders", "o_custkey"): _SKEW_MOD,
    ("lineitem", "l_suppkey"): _SKEW_MOD,
    ("events", "user_id"): _SKEW_MOD,
}

#: --skew: every doc whose base doc_id ≡ 0 (mod 50) gets ONE shared
#: template text verbatim in replicas r>0 (no per-replica substitution) —
#: the "boilerplate page repeated across a crawl" case. At R=10 that is
#: ~900 identical docs on a 50k corpus: far past the LSH bucket cap
#: (dedup.MAX_BUCKET=64), so the cap must be observed binding.
SKEW_DOC_MOD = 50


def _hot_key(src: str, table: str, col: str) -> int:
    """The key carrying the most mass in the source fact table (min key on
    ties) — deterministic, so the skewed fixture is reproducible."""
    arr = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
    vc = arr[col].to_pandas().value_counts()
    return int(min(vc[vc == vc.max()].index))


def _subst_table(r: int) -> dict[int, int] | None:
    """Per-replica character substitution (str.translate table).

    Rotates within [a-z], [A-Z] and [0-9] separately and leaves whitespace
    and punctuation untouched: a BIJECTION ON TOKENS, so tokenization,
    shingle counts, and the exact Jaccard between any two docs are all
    preserved per replica while every shingle's identity (hence every
    minhash/simhash/LSH bucket) changes. A whole-printable-ring rotation
    would remap spaces too, collapsing each translated doc into one giant
    token and silently deleting the replicas' near-dup structure. r=0 is
    the identity so the original corpus is one of the replicas.
    """
    if r == 0:
        return None
    tab = {}
    for lo, n, step in ((ord("a"), 26, 7), (ord("A"), 26, 7), (ord("0"), 10, 3)):
        for i in range(n):
            tab[lo + i] = lo + (i + step * r) % n
    return tab


def scale_fixture(src: str, dst: str, factor: int, skew: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    hot: dict[tuple[str, str], int] = {}
    hot_text: str | None = None
    if skew:
        hot = {
            (t, c): _hot_key(src, t, c) for (t, c) in SKEW_FACT
        }
        docs = pq.read_table(
            os.path.join(src, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pandas()
        tmpl = docs[docs["doc_id"] % SKEW_DOC_MOD == 0]
        hot_text = str(tmpl.loc[tmpl["doc_id"].idxmin(), "text"])
        print(f"skew hot keys: { {f'{t}.{c}': k for (t, c), k in hot.items()} }")
    # key offsets: one per domain, from the domain's max key in the source
    offsets: dict[str, int] = {}
    for domain, cols in KEY_DOMAINS.items():
        hi = 0
        for table, col in cols:
            arr = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
            hi = max(hi, pc.max(arr[col]).as_py() or 0)
        offsets[domain] = hi + 1
    col_offset = {
        (table, col): offsets[domain]
        for domain, cols in KEY_DOMAINS.items()
        for table, col in cols
    }

    for table in TABLES:
        src_path = os.path.join(src, f"{table}.parquet")
        schema = pq.read_schema(src_path)
        base = pq.read_table(src_path).to_pandas()
        if table in FIXED:
            pq.write_table(
                pa.Table.from_pandas(base, schema=schema, preserve_index=False),
                os.path.join(dst, f"{table}.parquet"),
                row_group_size=ROW_GROUP_ROWS,
            )
            print(f"{table}: fixed dim, {len(base)} rows")
            continue
        replicas = []
        for r in range(factor):
            rep = base.copy(deep=False)
            for (t, col), off in col_offset.items():
                if t == table:
                    newcol = base[col] + r * off
                    if r and (t, col) in hot:
                        hk = hot[(t, col)]
                        mod = SKEW_FACT[(t, col)]
                        newcol = newcol.where(base[col] % mod != hk % mod, hk)
                    rep[col] = newcol
            if table == "documents":
                tab = _subst_table(r)
                text = (
                    base["text"] if tab is None else base["text"].str.translate(tab)
                )
                if r and hot_text is not None:
                    text = text.where(base["doc_id"] % SKEW_DOC_MOD != 0, hot_text)
                rep["text"] = text
            if table == "embeddings" and r:
                rep["embedding"] = base["embedding"].map(
                    lambda v, k=r: np.roll(v, k)
                )
            replicas.append(rep)
        out = pd.concat(replicas, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(out, schema=schema, preserve_index=False),
            os.path.join(dst, f"{table}.parquet"),
            row_group_size=ROW_GROUP_ROWS,
        )
        print(f"{table}: {len(base)} -> {len(out)} rows")


#: --time: gap between replica time bands. Must exceed every banded/as-of
#: horizon in the registry (the J5 Δ is 30 min, gap-split sessions 30 min,
#: asof probes 1 day) so cross-replica rows can never pair.
_TIME_GAP = pd.Timedelta(days=2)


def scale_fixture_time(src: str, dst: str, factor: int) -> None:
    """Time-extended replication: same keys, ``factor``× the time span.

    The key-remapped ×R fixture (``scale_fixture``) replicates every key
    domain IN PLACE, so whole-domain pair joins (the J5 family) measure
    output-quadratic replica STACKING — R copies of every box occupy the
    same space-time volume and all cross-pair (r9 VERDICT item 4: banded
    ×10 ran 104 s on ~1B qualifying pairs and the honest metric retreated
    to per-pair cost). Real fleets don't grow that way: more data means
    more TIME under the same vessels. This variant keeps ``user_id`` (and
    every other key's per-replica slice disjoint only where uniqueness
    demands it: ``event_id``) and shifts replica r's timestamps by
    ``r * (span + _TIME_GAP)``, so replica time bands are disjoint beyond
    every banded horizon and qualifying pairs grow ~linearly — the growth
    shape the §1 linear-wall claim is actually about. lon/lat derive from
    ``value``/``props`` (FIXTURES.md §1), which are untouched, so each
    replica re-sails the same tracks in a later epoch.

    Only ``events`` is time-bearing; every other table copies through
    unchanged (the targeted queries — J5 pair joins, tmax sweep, as-of
    merges — read events alone).
    """
    os.makedirs(dst, exist_ok=True)
    for table in TABLES:
        src_path = os.path.join(src, f"{table}.parquet")
        schema = pq.read_schema(src_path)
        base = pq.read_table(src_path).to_pandas()
        if table != "events":
            pq.write_table(
                pa.Table.from_pandas(base, schema=schema, preserve_index=False),
                os.path.join(dst, f"{table}.parquet"),
                row_group_size=ROW_GROUP_ROWS,
            )
            print(f"{table}: copied, {len(base)} rows")
            continue
        period = (base["ts"].max() - base["ts"].min()) + _TIME_GAP
        eid_off = int(base["event_id"].max()) + 1
        replicas = []
        for r in range(factor):
            rep = base.copy(deep=False)
            rep["event_id"] = base["event_id"] + r * eid_off
            rep["ts"] = base["ts"] + r * period
            replicas.append(rep)
        out = pd.concat(replicas, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(out, schema=schema, preserve_index=False),
            os.path.join(dst, f"{table}.parquet"),
            row_group_size=ROW_GROUP_ROWS,
        )
        print(
            f"{table}: {len(base)} -> {len(out)} rows, "
            f"span {base['ts'].min()} .. {out['ts'].max()}"
        )


def main() -> None:
    argv = [a for a in sys.argv[1:] if a not in ("--skew", "--time")]
    skew = "--skew" in sys.argv[1:]
    time_mode = "--time" in sys.argv[1:]
    if skew and time_mode:
        raise SystemExit("--skew and --time are separate fixtures")
    factor = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = "skew" if skew else "t" if time_mode else ""
    dst = (
        argv[2]
        if len(argv) > 2
        else os.path.join(repo, ".scale", f"sf1_x{factor}{suffix}")
    )
    if time_mode:
        scale_fixture_time(src, dst, factor)
    else:
        scale_fixture(src, dst, factor, skew=skew)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
