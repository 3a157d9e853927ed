"""Invariants of the scale-probe fixture generator (tools/gen_scale.py):
the ×R replication must preserve exactly the properties the SCALE_r07.md
methodology claims — referential integrity under key remapping, per-key
structure, and the token-bijection on document text — or the probe's
"no superlinear growth" conclusion measures a malformed workload.

Pure pyarrow/pandas (no Spark session): generates ×2 from sf0.001 into
tmp_path once per module.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tools.gen_scale import TABLES, scale_fixture

SRC = "/root/testdata/sf0.001"
R = 2


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "x2")
    scale_fixture(SRC, dst, R)
    return dst


def _read(d, t):
    return pq.read_table(os.path.join(d, f"{t}.parquet")).to_pandas()


def test_row_counts_and_schemas(scaled):
    for t in TABLES:
        src_schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        dst_schema = pq.read_schema(os.path.join(scaled, f"{t}.parquet"))
        assert src_schema.equals(dst_schema), t
        mult = 1 if t in ("region", "nation") else R
        assert len(_read(scaled, t)) == mult * len(_read(SRC, t)), t


def test_referential_integrity_and_key_uniqueness(scaled):
    o = _read(scaled, "orders")
    li = _read(scaled, "lineitem")
    c = _read(scaled, "customer")
    s = _read(scaled, "supplier")
    p = _read(scaled, "part")
    # primary keys stay unique after remapping (offsets are collision-free)
    assert o.o_orderkey.is_unique and c.c_custkey.is_unique
    assert s.s_suppkey.is_unique and p.p_partkey.is_unique
    # every fact foreign key resolves — replicas reference their own dims
    assert set(li.l_orderkey) <= set(o.o_orderkey)
    assert set(li.l_suppkey) <= set(s.s_suppkey)
    assert set(li.l_partkey) <= set(p.p_partkey)
    assert set(o.o_custkey) <= set(c.c_custkey)
    # per-key structure preserved: order group sizes replicate exactly
    src_sizes = list(_read(SRC, "lineitem").groupby("l_orderkey").size())
    dst_sizes = sorted(li.groupby("l_orderkey").size())
    assert dst_sizes == sorted(src_sizes * R)


def test_events_user_series_preserved(scaled):
    src = _read(SRC, "events")
    dst = _read(scaled, "events")
    assert dst.event_id.is_unique
    # per-user series length distribution replicates (trajectory lengths)
    src_sizes = list(src.groupby("user_id").size())
    assert sorted(dst.groupby("user_id").size()) == sorted(src_sizes * R)
    # timestamps untouched: same ts range per replica
    assert dst.ts.min() == src.ts.min() and dst.ts.max() == src.ts.max()


def test_text_substitution_is_a_token_bijection(scaled):
    src = _read(SRC, "documents").set_index("doc_id")
    dst = _read(scaled, "documents")
    assert dst.doc_id.is_unique
    off = src.index.max() + 1
    reps = {r.doc_id: r.text for r in dst.itertuples()}
    for doc_id, row in src.iterrows():
        base, rep = row.text, reps[doc_id + off]  # replica r=1
        assert rep != base  # actually perturbed
        assert len(rep) == len(base)  # length (and n_chars) preserved
        assert rep.isascii()  # the multimodal oracles' contract
        bt, rt = base.split(" "), rep.split(" ")
        # token boundaries identical; token map is a bijection
        assert [len(x) for x in rt] == [len(x) for x in bt]
        fwd = {}
        for a, b in zip(bt, rt):
            assert fwd.setdefault(a, b) == b  # well-defined map
        inv = {}
        for a, b in fwd.items():
            assert inv.setdefault(b, a) == a  # injective
    # bijection => per-doc distinct-shingle counts and every pairwise
    # Jaccard are preserved per replica; spot-check one pair's 3-shingles
    ids = sorted(src.index)[:2]
    if len(ids) == 2:
        def shingles(t):
            w = t.split(" ")
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        a0, b0 = shingles(src.loc[ids[0]].text), shingles(src.loc[ids[1]].text)
        a1, b1 = shingles(reps[ids[0] + off]), shingles(reps[ids[1] + off])
        assert len(a1) == len(a0) and len(b1) == len(b0)
        assert len(a1 & b1) == len(a0 & b0)


def test_embedding_rotation_preserves_norms(scaled):
    src = _read(SRC, "embeddings").set_index("vec_id")
    dst = _read(scaled, "embeddings")
    assert dst.vec_id.is_unique
    off = src.index.max() + 1
    import numpy as np

    reps = {r.vec_id: r.embedding for r in dst.itertuples()}
    for vec_id, row in src.iterrows():
        base = np.asarray(row.embedding)
        rep = np.asarray(reps[vec_id + off])  # replica r=1
        assert sorted(rep) == pytest.approx(sorted(base))  # same multiset
        assert not np.array_equal(rep, base)  # decorrelated


# --- time-extended variant (r9 VERDICT item 4) ------------------------------


@pytest.fixture(scope="module")
def time_scaled(tmp_path_factory):
    from tools.gen_scale import scale_fixture_time

    dst = str(tmp_path_factory.mktemp("scale") / "t3")
    scale_fixture_time(SRC, dst, 3)
    return dst


def test_time_fixture_extends_span_not_keys(time_scaled):
    """Same vessels, R× the time span: the growth shape real fleets have —
    replica boxes must occupy disjoint time bands so banded pair joins
    grow linearly instead of measuring replica stacking."""
    from tools.gen_scale import _TIME_GAP

    base = _read(SRC, "events")
    ext = _read(time_scaled, "events")
    assert len(ext) == 3 * len(base)
    # same vessel population — keys do NOT scale
    assert set(ext.user_id) == set(base.user_id)
    # event_id stays a unique row id
    assert ext.event_id.is_unique
    # replica time bands are disjoint by more than every banded horizon
    period = (base.ts.max() - base.ts.min()) + _TIME_GAP
    for r in range(3):
        band = ext[(ext.event_id >= r * (base.event_id.max() + 1))
                   & (ext.event_id < (r + 1) * (base.event_id.max() + 1))]
        assert band.ts.min() == base.ts.min() + r * period
        assert band.ts.max() == base.ts.max() + r * period
    assert _TIME_GAP >= pd.Timedelta(days=1)  # > J5 band, sessions, asof probes
    # per-vessel series replicate exactly: same per-key posit counts × R
    assert (
        ext.groupby("user_id").size() == 3 * base.groupby("user_id").size()
    ).all()
    # positions untouched: each replica re-sails the same tracks
    assert (ext["value"].to_numpy()[: len(base)] == base["value"].to_numpy()).all()


def test_time_fixture_copies_non_temporal_tables(time_scaled):
    for t in TABLES:
        if t == "events":
            continue
        src_schema = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        dst_schema = pq.read_schema(os.path.join(time_scaled, f"{t}.parquet"))
        assert src_schema.equals(dst_schema), t
        assert len(_read(time_scaled, t)) == len(_read(SRC, t)), t
