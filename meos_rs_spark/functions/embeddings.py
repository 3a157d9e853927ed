"""Embedding math (similarity-search support, SURVEY.md §7 M5).

Spark's higher-order functions (``aggregate``/``zip_with``) are interpreted
per row — correct but slow in the hot path. The cosine here is an Arrow-
batched pandas_udf that accumulates **dimension-by-dimension in order**
(vectorized across rows): numerically identical to the sequential
left-to-right fold DuckDB's ``list_dot_product`` performs (and to the Spark
``aggregate`` fold it replaces), so the oracle value-hash is unchanged —
while running ~2 orders of magnitude faster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot product with strictly sequential per-dimension
    accumulation (left-to-right IEEE double adds — the engine-portable
    order), vectorized over the row axis."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc += a[:, j] * b[:, j]
    return acc


def _stack(s: pd.Series) -> np.ndarray:
    return np.stack(s.to_numpy()).astype(np.float64)


def _cell_lens(cells: np.ndarray) -> np.ndarray:
    """Per-row vector lengths, -1 for NULL cells (Arrow NULL list → None)."""
    return np.fromiter(
        (-1 if v is None else len(v) for v in cells), dtype=np.int64, count=len(cells)
    )


def _pair_fold(a: pd.Series, b: pd.Series, fold) -> pd.Series:
    """Total row-wise pair kernel: ``fold(A, B) -> M doubles`` applied to
    every VALID row pair, NULL for the rest.

    Valid = both cells non-NULL with equal lengths; the dot of two
    equal-length vectors is well-defined per row regardless of what other
    rows carry, so validity is purely row-local (deterministic under any
    batching). One ragged row must not abort the batch — at fleet scale a
    single failed-encoder embedding would otherwise kill the whole job
    (r12 adversarial sweep: 14 ANN twins aborted on one NULL/short
    vector). Fast path: a clean uniform batch (the only shape real
    corpora produce) takes the exact pre-r12 np.stack route; ragged
    batches fold per dimension group and scatter."""
    aa, bb = a.to_numpy(), b.to_numpy()
    if len(aa) == 0:
        # zero-row Arrow batch: the fast-path guard below would raise on
        # la.min() (zero-size reduction) — valid.all() is vacuously True
        # for an empty array (r12 ADVICE item 3; the total-kernel contract
        # covers the empty batch too)
        return pd.Series(pd.array([], dtype="Float64"))
    la, lb = _cell_lens(aa), _cell_lens(bb)
    valid = (la >= 0) & (la == lb)
    if valid.all() and la.min() == la.max():
        return pd.Series(pd.array(fold(_stack(a), _stack(b)), dtype="Float64"))
    out = np.full(len(aa), np.nan, dtype=np.float64)
    for d in np.unique(la[valid]):
        idx = np.nonzero(valid & (la == d))[0]
        if d == 0:  # empty vectors: an empty fold is 0.0 on both engines
            out[idx] = fold(np.empty((len(idx), 0)), np.empty((len(idx), 0)))
            continue
        A = np.stack(aa[idx].tolist()).astype(np.float64)
        B = np.stack(bb[idx].tolist()).astype(np.float64)
        out[idx] = fold(A, B)
    res = pd.Series(pd.array(out, dtype="Float64"))
    return res.mask(~valid, pd.NA)


@pandas_udf(DoubleType())
def cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine similarity; a zero-norm side yields NULL on both engines.

    DuckDB DOUBLE division by zero returns NULL (never NaN/inf), which
    fails thresholds and sorts last under DESC — so a failed-encoder
    all-zero embedding drops out of every oracle top-k. The Spark side
    returns a NULLABLE pandas Float64 series (r10 ADVICE: ``.mask(...,
    None)`` on a plain float64 series just writes NaN, so the NULL
    contract used to ride the implicit Arrow NaN→null conversion) — every
    NaN result, whether from the 0/0 zero-norm case or a NaN *component*
    in an embedding, becomes an explicit pandas ``NA`` before the Arrow
    boundary, so the kernel's NULL semantics no longer depend on
    ``pa.Array.from_pandas`` coercion behavior.

    Known envelope (data-dependent, pinned by
    tests/test_quantize.py::test_cosine_udf_nan_component_contract): a
    NaN *component* in an embedding gives DuckDB NaN (sorts FIRST under
    DESC) but this kernel NULL (sorts last) — a pandas_udf cannot emit
    NaN doubles. Sanitize NaN embeddings upstream if they can occur."""
    def _cos_fold(A: np.ndarray, B: np.ndarray) -> np.ndarray:
        num = _seq_dot(A, B)
        den = np.sqrt(_seq_dot(A, A)) * np.sqrt(_seq_dot(B, B))
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
        # a non-zero dot over a zero norm is +/-inf, which pd.array would
        # keep — force the zero-norm contract to NaN (→ NA) explicitly
        out[den == 0.0] = np.nan
        return out

    return _pair_fold(a, b, _cos_fold)


@pandas_udf(DoubleType())
def seq_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Bare sequential-fold dot product — combine with precomputed ``l2norm``
    columns to avoid re-folding each vector's norm once per pair (the full
    ``cosine`` does 3 folds per pair; dot+stored-norms does 1). Total:
    NULL for NULL/length-mismatched pairs (see ``_pair_fold``)."""
    return _pair_fold(a, b, _seq_dot)


@pandas_udf(DoubleType())
def l2norm(a: pd.Series) -> pd.Series:
    """sqrt of the sequential-fold self-dot: bit-identical to the
    ``sqrt(list_dot_product(v, v))`` factor in the oracle's cosine.
    Total: NULL for a NULL cell (see ``_pair_fold``; a vector always
    length-matches itself, so only the NULL case can invalidate)."""
    return _pair_fold(a, a, lambda A, B: np.sqrt(_seq_dot(A, B)))


def plane_signs(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes from md5 parity — MUST stay in lockstep
    with the SQL definition in queries/similarity.py (``_bucket_expr_duck``):
    sign_pj = +1 iff the first hex char of md5('{p}-{j}') is in '89abcdef'."""
    import hashlib

    m = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for j in range(dim):
            h = hashlib.md5(f"{p}-{j}".encode()).hexdigest()[0]
            m[p, j] = 1.0 if h in "89abcdef" else -1.0
    return m


def make_lsh_bucket_udf(n_planes: int, dim: int):
    """Returns a pandas_udf: embedding → integer sign-LSH bucket, computing
    each plane dot with the same sequential per-dimension accumulation as
    the SQL fold (bit p set iff dot > 0)."""
    from pyspark.sql.types import IntegerType

    planes = plane_signs(n_planes, dim)

    @pandas_udf(IntegerType())
    def lsh_bucket(emb: pd.Series) -> pd.Series:
        def _bucket(v: np.ndarray) -> np.ndarray:
            bucket = np.zeros(v.shape[0], dtype=np.int64)
            for p in range(n_planes):
                acc = np.zeros(v.shape[0], dtype=np.float64)
                for j in range(dim):
                    acc += planes[p, j] * v[:, j]
                bucket += (acc > 0).astype(np.int64) << p
            return bucket.astype(np.int32)

        cells = emb.to_numpy()
        if len(cells) == 0:  # same zero-row guard as _pair_fold
            return pd.Series(pd.array([], dtype="Int32"))
        lens = _cell_lens(cells)
        valid = lens == dim  # a vector of the wrong dimension has no bucket
        if valid.all():
            return pd.Series(pd.array(_bucket(_stack(emb)), dtype="Int32"))
        out = pd.array([None] * len(cells), dtype="Int32")
        idx = np.nonzero(valid)[0]
        if len(idx):
            out[idx] = _bucket(np.stack(cells[idx].tolist()).astype(np.float64))
        return pd.Series(out)

    # asNondeterministic: the kernel IS deterministic, but without the pin
    # Catalyst clones the projection below join-inferred IsNotNull filters
    # and the 8-plane dot-product kernel runs TWICE per corpus row — a
    # compiled sim_ann_lsh plan showed 4 ArrowEvalPython lsh_bucket nodes
    # (2 per join side). Same hazard and same fix as functions/quantize.py.
    return lsh_bucket.asNondeterministic()


@pandas_udf(DoubleType())
def seq_sqdist(a: pd.Series, b: pd.Series) -> pd.Series:
    """Squared L2 distance in dot-product form: dot(a,a) + dot(b,b) -
    2*dot(a,b), each dot a sequential per-dimension fold and the three terms
    combined left-to-right — bit-identical to the oracle's
    ``list_dot_product(a,a) + list_dot_product(b,b) -
    2*list_dot_product(a,b)`` (the expanded form avoids the (x-y)^2 fold,
    whose association differs). Total: NULL for invalid pairs."""
    return _pair_fold(
        a, b, lambda A, B: _seq_dot(A, A) + _seq_dot(B, B) - 2.0 * _seq_dot(A, B)
    )
