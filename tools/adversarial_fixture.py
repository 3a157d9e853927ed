"""Adversarial cross-engine fixture: every table, seeded with the corners
the driver's generated fixtures never produce.

The r11 review swept the events-only and streaming twins over a synthetic
NULL-bearing events table and found five abort-or-diverge bugs the real
fixtures could not expose (tests/test_invariants.py). This module extends
that instrument to the REST of the registry — the documents/embeddings
families (text battery, dedup, similarity, sampling, multimodal) and the
TPC-H-side relational twins — with one deterministic generator shared by
the sweep tool (tools/sweep_adversarial.py) and the standing pytest pin
(tests/test_adversarial_fixture.py).

Corners covered, per table:

- documents: NULL/empty/whitespace/single-char text, unicode (CJK +
  combining + emoji), punctuation-only, regex metacharacters, digit-only,
  PII-shaped tokens, an exact-duplicate pair, a case/punctuation
  normalized-duplicate pair, a one-token near-duplicate pair, a massively
  repetitive doc, embedded newlines/tabs, NULL lang/source/n_chars.
- embeddings: the zero-norm vector, NULL embedding, empty list, a NULL
  element inside a vector, a wrong-dimension (short) vector, an
  exact-duplicate vector pair and a 1e-7 near-tie pair (top-k
  tie-resolution hazards), NULL label.
- lineitem/orders/customer/supplier/part/nation/region: NULL join keys,
  orphan foreign keys (both directions), NULL measures and dates, empty
  and unicode strings, negative and zero quantities, duplicate
  (orderkey, linenumber) business keys, a NULL-only group.
- events: the r11 NULL/tie corners (duplicate ts with distinct values,
  NULL value at an as-of row, tied ts with one NULL, NULLs inside rolling
  frames, an all-NULL group) PLUS a NULL event_id row (the r12 ADVICE
  restart-split corner) and a NULL user_id row.

Everything is deterministic from ``seed`` — no wall clock, no global RNG.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EMB_DIM = 64

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window column join small customer query big stream group "
    "filter order data the a"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]
_SOURCES = ["src0", "src1", "src2", "src3"]


def _doc_text(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _documents(rng: random.Random) -> pa.Table:
    rows: list[tuple] = []  # (doc_id, text, lang, source)
    did = 0

    def add(text, lang, source):
        nonlocal did
        n_chars = len(text) if text is not None else None
        rows.append((did, text, lang, source, n_chars))
        did += 1

    # a healthy base population: ≥6 docs per lang so grouped quotas,
    # mixtures, and TF-IDF have real mass to work with
    for lang in _LANGS:
        for k in range(6):
            add(_doc_text(rng, 20 + 5 * k), lang, _SOURCES[k % len(_SOURCES)])
    # exact-duplicate pair (dedup_exact must collapse, nothing may abort)
    dup = _doc_text(rng, 25)
    add(dup, "en", "src0")
    add(dup, "en", "src1")
    # normalized-duplicate pair: same tokens, different case/punctuation
    base = _doc_text(rng, 18)
    add(base + ".", "en", "src2")
    add(base.upper() + " !", "en", "src3")
    # near-duplicate pair: one token changed (minhash/jaccard band corner)
    nd = _doc_text(rng, 30).split()
    add(" ".join(nd), "de", "src0")
    nd[7] = "altered"
    add(" ".join(nd), "de", "src1")
    # the corners
    add(None, "en", "src0")  # NULL text
    add("", "en", "src1")  # empty text
    add("   \t  ", "fr", "src2")  # whitespace-only
    add("a", "es", "src3")  # single char
    add("héllo wörld 中文文本 😀 étoile", "zh", "src0")  # unicode mix
    add("!!! ??? ... ;;; ---", "en", "src1")  # punctuation-only
    add("a+b*c (d) [e] {f} \\ $ ^ . | ?", "en", "src2")  # regex metachars
    add("12345 67890 00000 42", "de", "src3")  # digits-only
    add(
        "contact test@example.com or call 555-123-4567 ssn 123-45-6789",
        "en",
        "src0",
    )  # PII-shaped
    add("spam " * 400, "fr", "src1")  # massively repetitive
    add("line one\nline two\ttabbed\nline three", "es", "src2")  # newlines/tabs
    add(_doc_text(rng, 12), None, "src3")  # NULL lang
    add(_doc_text(rng, 12), "en", None)  # NULL source
    # NULL n_chars on an otherwise-normal doc
    rows.append((did, _doc_text(rng, 15), "de", "src0", None))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _embeddings(seed: int) -> pa.Table:
    rs = np.random.RandomState(seed)
    vecs: list = []
    labels: list = []

    def add(vec, label):
        vecs.append(vec)
        labels.append(label)

    for i in range(30):  # healthy base population, every label present
        add([float(x) for x in rs.randn(EMB_DIM).astype(np.float32)], i % 10)
    add([0.0] * EMB_DIM, 0)  # zero-norm vector
    add(None, 1)  # NULL embedding
    add([], 2)  # empty list
    v = [float(x) for x in rs.randn(EMB_DIM).astype(np.float32)]
    v[5] = None  # NULL element inside the vector
    add(v, 3)
    add([1.0, 2.0, 3.0], 4)  # wrong-dimension (short) vector
    twin = [float(x) for x in rs.randn(EMB_DIM).astype(np.float32)]
    add(twin, 5)  # exact-duplicate vector pair (cosine ties)
    add(list(twin), 6)
    near = list(twin)
    near[0] += 1e-7  # near-tie pair
    add(near, 7)
    add([float(x) for x in rs.randn(EMB_DIM).astype(np.float32)], None)  # NULL label
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def _tpch(rng: random.Random) -> dict[str, pa.Table]:
    region = pa.table(
        {
            "r_regionkey": pa.array([0, 1, 2], pa.int32()),
            "r_name": pa.array(["AMERICA", "EUROPE", None], pa.string()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2, 3, 4, 5], pa.int32()),
            "n_name": pa.array(
                ["BRAZIL", "FRANCE", "", "日本", None, "ORPHANIA"], pa.string()
            ),
            # nation 4: NULL region key; nation 5: orphan region key
            "n_regionkey": pa.array([0, 1, 1, 0, None, 9], pa.int32()),
        }
    )
    n_cust = 24
    custkeys = list(range(1, n_cust + 1))
    c_nation = [rng.choice([0, 1, 2, 3]) for _ in custkeys]
    c_name = [f"Customer#{k:03d}" for k in custkeys]
    c_bal = [round(rng.uniform(-999.99, 9999.99), 2) for _ in custkeys]
    c_seg = [rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"]) for _ in custkeys]
    # corners: NULL nation key (join key), NULL name, empty name, NULL
    # balance, unicode name, NULL segment, orphan nation key
    c_nation[0] = None
    c_name[1] = None
    c_name[2] = ""
    c_bal[3] = None
    c_name[4] = "Cüstömer 顧客"
    c_seg[5] = None
    c_nation[6] = 99
    customer = pa.table(
        {
            "c_custkey": pa.array(custkeys, pa.int64()),
            "c_name": pa.array(c_name, pa.string()),
            "c_nationkey": pa.array(c_nation, pa.int32()),
            "c_acctbal": pa.array(c_bal, pa.float64()),
            "c_mktsegment": pa.array(c_seg, pa.string()),
        }
    )
    supkeys = list(range(1, 13))
    s_nation = [rng.choice([0, 1, 2, 3]) for _ in supkeys]
    s_bal = [round(rng.uniform(-99.99, 999.99), 2) for _ in supkeys]
    s_name = [f"Supplier#{k:03d}" for k in supkeys]
    s_nation[0] = None
    s_bal[1] = None
    s_name[2] = None
    supplier = pa.table(
        {
            "s_suppkey": pa.array(supkeys, pa.int64()),
            "s_name": pa.array(s_name, pa.string()),
            "s_nationkey": pa.array(s_nation, pa.int32()),
            "s_acctbal": pa.array(s_bal, pa.float64()),
        }
    )
    partkeys = list(range(1, 16))
    p_name = [f"part {i} {rng.choice(_WORDS)}" for i in partkeys]
    p_brand = [f"Brand#{1 + i % 3}" for i in partkeys]
    p_type = [rng.choice(["SMALL BRASS", "LARGE STEEL", "MEDIUM TIN"]) for _ in partkeys]
    p_size = [1 + i % 7 for i in partkeys]
    p_price = [round(900 + i * 1.5, 2) for i in partkeys]
    p_name[0] = None
    p_size[1] = None
    p_price[2] = None
    p_type[3] = ""
    part = pa.table(
        {
            "p_partkey": pa.array(partkeys, pa.int64()),
            "p_name": pa.array(p_name, pa.string()),
            "p_brand": pa.array(p_brand, pa.string()),
            "p_type": pa.array(p_type, pa.string()),
            "p_size": pa.array(p_size, pa.int32()),
            "p_retailprice": pa.array(p_price, pa.float64()),
        }
    )

    n_ord = 60
    okeys = list(range(1, n_ord + 1))
    o_cust = [rng.choice(custkeys) for _ in okeys]
    o_status = [rng.choice(["O", "F", "P"]) for _ in okeys]
    o_total = [round(rng.uniform(100.0, 50000.0), 2) for _ in okeys]
    base_day = np.datetime64("2024-01-01", "us")
    o_date = [base_day + np.timedelta64(rng.randint(0, 364) * 86400, "s") for _ in okeys]
    o_prio = [rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-LOW", "5-NONE"]) for _ in okeys]
    # corners: NULL custkey (outer/semi/anti), orphan custkey, NULL
    # totalprice, NULL date, NULL status, NULL priority — and customers
    # 20..24 get no orders at all (anti-join mass)
    o_cust = [c if c < 20 else 1 for c in o_cust]
    o_cust[0] = None
    o_cust[1] = 999
    o_total[2] = None
    o_date[3] = None
    o_status[4] = None
    o_prio[5] = None
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            "o_custkey": pa.array(o_cust, pa.int64()),
            "o_orderstatus": pa.array(o_status, pa.string()),
            "o_totalprice": pa.array(o_total, pa.float64()),
            "o_orderdate": pa.array(o_date, pa.timestamp("us")),
            "o_orderpriority": pa.array(o_prio, pa.string()),
        }
    )

    li_rows = []
    for ok in okeys:
        for ln in range(1, 1 + rng.randint(1, 3)):
            qty = float(rng.randint(1, 50))
            price = round(rng.uniform(900.0, 90000.0), 2)
            li_rows.append(
                [
                    ok,
                    rng.choice(partkeys),
                    rng.choice(supkeys),
                    ln,
                    qty,
                    price,
                    round(rng.uniform(0.0, 0.1), 2),
                    round(rng.uniform(0.0, 0.08), 2),
                    rng.choice(["A", "N", "R"]),
                    rng.choice(["O", "F"]),
                    base_day + np.timedelta64(rng.randint(0, 364) * 86400, "s"),
                ]
            )
    # corners
    li_rows[0][4] = None  # NULL quantity
    li_rows[1][5] = None  # NULL extendedprice
    li_rows[2][6] = None  # NULL discount
    li_rows[3][7] = None  # NULL tax
    li_rows[4][10] = None  # NULL shipdate
    li_rows[5][8] = None  # NULL returnflag (grouping key)
    li_rows[6][0] = 9999  # orphan orderkey
    li_rows[7][1] = None  # NULL partkey (join key)
    li_rows[8][2] = None  # NULL suppkey
    li_rows[9][4] = -5.0  # negative quantity
    li_rows[10][5] = 0.0  # zero price
    li_rows[11][9] = None  # NULL linestatus
    cols = list(zip(*li_rows))
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(cols[0], pa.int64()),
            "l_partkey": pa.array(cols[1], pa.int64()),
            "l_suppkey": pa.array(cols[2], pa.int64()),
            "l_linenumber": pa.array(cols[3], pa.int32()),
            "l_quantity": pa.array(cols[4], pa.float64()),
            "l_extendedprice": pa.array(cols[5], pa.float64()),
            "l_discount": pa.array(cols[6], pa.float64()),
            "l_tax": pa.array(cols[7], pa.float64()),
            "l_returnflag": pa.array(cols[8], pa.string()),
            "l_linestatus": pa.array(cols[9], pa.string()),
            "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
        }
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
    }


def _events() -> pa.Table:
    """The r11 NULL/tie events corners + the r12 NULL-key rows."""

    def ev(eid, uid, ts, val, et="x", props=json.dumps({"k": 1.0})):
        return (eid, np.datetime64(ts, "us"), uid, et, val, props)

    rows = [
        ev(0, 1, "2024-01-01T06:00:00", 1.0),
        ev(1, 1, "2024-01-01T06:00:00", 2.0),
        ev(2, 1, "2024-01-01T12:00:00", 5.0),
        ev(3, 2, "2024-01-01T06:00:00", 7.0),
        ev(4, 2, "2024-01-01T18:00:00", None),
        ev(5, 3, "2024-01-01T06:00:00", None),
        ev(6, 3, "2024-01-01T06:00:00", 4.0),
        ev(7, 4, "2024-01-01T01:00:00", 10.0),
        ev(8, 4, "2024-01-01T02:00:00", None),
        ev(9, 4, "2024-01-01T03:00:00", 30.0),
        ev(10, 4, "2024-01-01T04:00:00", None),
        ev(11, 4, "2024-01-01T05:00:00", 20.0),
        ev(12, 5, "2024-01-01T02:00:00", None, et="y"),
        ev(13, 5, "2024-01-01T08:00:00", None, et="y"),
        # r12: NULL event_id (the restart-split corner) and NULL user_id
        ev(None, 6, "2024-01-01T09:00:00", 3.0),
        ev(15, None, "2024-01-01T10:00:00", 8.0),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def _extreme_events() -> pa.Table:
    """Value-extreme rows appended to the events corners: sentinel
    timestamps (year 9999 junk is COMMON in real data; pre-epoch negatives
    exercise signed epoch arithmetic), magnitude-extreme but finite
    doubles, negative zero, a denormal, and near-overflow int64 keys."""
    base = _events()

    def ev(eid, uid, ts, val, et="x"):
        return (eid, np.datetime64(ts, "us"), uid, et, val, json.dumps({"k": 1.0}))

    rows = [
        ev(100, 7, "1969-12-31T23:59:59", 1.5),  # pre-epoch (negative micros)
        ev(101, 7, "1901-01-01T00:00:00", 2.5),  # deep pre-epoch
        ev(102, 8, "9999-12-30T00:00:00", 3.5),  # sentinel far-future
        ev(103, 8, "2024-01-01T00:00:00", 1e300),  # huge finite double
        ev(104, 8, "2024-01-02T00:00:00", -1e300),
        ev(105, 9, "2024-01-01T00:00:00", -0.0),  # negative zero
        ev(106, 9, "2024-01-02T00:00:00", 5e-324),  # denormal
        ev(2**62, 9, "2024-01-03T00:00:00", 4.0),  # near-overflow key
        ev(107, -(2**62), "2024-01-01T00:00:00", 6.0),  # huge negative uid
    ]
    ext = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    return pa.concat_tables([base, ext])


def write_fixture(out_dir: str, seed: int = 7, extremes: bool = False) -> None:
    """Write all ten tables to ``out_dir`` (created if absent).

    ``extremes=True`` swaps in the value-extreme events variant (sentinel
    and pre-epoch timestamps, 1e300-magnitude doubles, -0.0, a denormal,
    near-overflow int64 keys) on top of the NULL/tie corners.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    tables = {"documents": _documents(rng), "embeddings": _embeddings(seed)}
    tables.update(_tpch(rng))
    tables["events"] = _extreme_events() if extremes else _events()
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


if __name__ == "__main__":
    import sys

    write_fixture(
        sys.argv[1] if len(sys.argv) > 1 else ".scale/adversarial",
        extremes="--extremes" in sys.argv,
    )
    print("wrote adversarial fixture")
