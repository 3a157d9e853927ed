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
    va, vb = _stack(a), _stack(b)
    num = _seq_dot(va, vb)
    den = np.sqrt(_seq_dot(va, va)) * np.sqrt(_seq_dot(vb, vb))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    # pd.array(..., dtype="Float64") converts every NaN to a real NA; the
    # den==0 mask is then redundant for values (0/0 is already NaN) but
    # kept as the explicit statement of the zero-norm contract.
    return pd.Series(pd.array(out, dtype="Float64")).mask(den == 0.0, pd.NA)


@pandas_udf(DoubleType())
def seq_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Bare sequential-fold dot product — combine with precomputed ``l2norm``
    columns to avoid re-folding each vector's norm once per pair (the full
    ``cosine`` does 3 folds per pair; dot+stored-norms does 1)."""
    return pd.Series(_seq_dot(_stack(a), _stack(b)))


@pandas_udf(DoubleType())
def l2norm(a: pd.Series) -> pd.Series:
    """sqrt of the sequential-fold self-dot: bit-identical to the
    ``sqrt(list_dot_product(v, v))`` factor in the oracle's cosine."""
    v = _stack(a)
    return pd.Series(np.sqrt(_seq_dot(v, v)))


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
        v = _stack(emb)
        bucket = np.zeros(v.shape[0], dtype=np.int64)
        for p in range(n_planes):
            acc = np.zeros(v.shape[0], dtype=np.float64)
            for j in range(dim):
                acc += planes[p, j] * v[:, j]
            bucket += (acc > 0).astype(np.int64) << p
        return pd.Series(bucket.astype(np.int32))

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
    whose association differs)."""
    va, vb = _stack(a), _stack(b)
    return pd.Series(_seq_dot(va, va) + _seq_dot(vb, vb) - 2.0 * _seq_dot(va, vb))
