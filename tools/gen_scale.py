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


def scale_fixture(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
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
            )
            print(f"{table}: fixed dim, {len(base)} rows")
            continue
        replicas = []
        for r in range(factor):
            rep = base.copy(deep=False)
            for (t, col), off in col_offset.items():
                if t == table:
                    rep[col] = base[col] + r * off
            if table == "documents":
                tab = _subst_table(r)
                rep["text"] = (
                    base["text"] if tab is None else base["text"].str.translate(tab)
                )
            if table == "embeddings" and r:
                rep["embedding"] = base["embedding"].map(
                    lambda v, k=r: np.roll(v, k)
                )
            replicas.append(rep)
        out = pd.concat(replicas, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(out, schema=schema, preserve_index=False),
            os.path.join(dst, f"{table}.parquet"),
        )
        print(f"{table}: {len(base)} -> {len(out)} rows")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(repo, ".scale", f"sf1_x{factor}")
    )
    scale_fixture(src, dst, factor)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
