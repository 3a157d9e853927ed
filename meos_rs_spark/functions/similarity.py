"""Trajectory similarity (SURVEY.md §2.8 L2g: Fréchet, DTW, Hausdorff —
the MEOS similarity family reachable via meos.h 1.1.0; see SURVEY L2 and
``meos-sys/build.rs:16-20``).

Hausdorff is max-min distance — pure join/agg, implemented in
queries/trajsim.py with a DuckDB oracle. Discrete Fréchet and DTW need an
O(n·m) dynamic program — a genuinely iterative algorithm, so they run as a
grouped ``applyInPandas`` over vessel pairs (numpy DP per group, Arrow
batches; the one place per SURVEY §2.10 where Python is the right tool).
Exactness is pinned by golden tests on hand-computed curves
(tests/test_trajsim.py).
"""

from __future__ import annotations

import math

import numpy as np


def dtw_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Dynamic time warping with euclidean ground distance, no window
    constraint. a: (n,2), b: (m,2)."""
    n, m = len(a), len(b)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = d[i - 1, j - 1] + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    return float(acc[n, m])


def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Fréchet distance (coupling measure), euclidean ground
    distance — the discrete analog of MEOS temporal_frechet_distance."""
    n, m = len(a), len(b)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    ca = np.full((n, m), -1.0)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i, j - 1], ca[i - 1, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


def hausdorff_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric Hausdorff (reference twin of the SQL/max-min-join form)."""
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def lcss_similarity(a: np.ndarray, b: np.ndarray, eps: float) -> float:
    """Longest-common-subsequence similarity: fraction of the shorter curve
    matchable within ground distance ``eps`` while preserving order —
    robust to outlier points (unlike DTW, which must pay for them).
    Returns LCSS length / min(n, m) in [0, 1]."""
    n, m = len(a), len(b)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    L = np.zeros((n + 1, m + 1), dtype=np.int64)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if d[i - 1, j - 1] <= eps:
                L[i, j] = L[i - 1, j - 1] + 1
            else:
                L[i, j] = max(L[i - 1, j], L[i, j - 1])
    return float(L[n, m]) / float(min(n, m))


def erp_distance(a: np.ndarray, b: np.ndarray, g: np.ndarray) -> float:
    """Edit distance with Real Penalty: L1-style alignment cost where a
    skipped point pays its distance to the constant gap point ``g`` — a
    metric (triangle inequality holds), unlike DTW/LCSS."""
    n, m = len(a), len(b)
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    ga = np.sqrt(((a - g) ** 2).sum(axis=1))
    gb = np.sqrt(((b - g) ** 2).sum(axis=1))
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        acc[i, 0] = acc[i - 1, 0] + ga[i - 1]
    for j in range(1, m + 1):
        acc[0, j] = acc[0, j - 1] + gb[j - 1]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = min(
                acc[i - 1, j - 1] + d[i - 1, j - 1],
                acc[i - 1, j] + ga[i - 1],
                acc[i, j - 1] + gb[j - 1],
            )
    return float(acc[n, m])


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain. pts: (n, 2) -> hull vertices in CCW order
    (first vertex = lexicographically smallest), degenerate inputs returned
    as-is (deduplicated, sorted)."""
    p = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    if len(p) <= 2:
        return p

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for q in p:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], q) <= 0:
            lower.pop()
        lower.append(q)
    upper: list[np.ndarray] = []
    for q in p[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], q) <= 0:
            upper.pop()
        upper.append(q)
    return np.array(lower[:-1] + upper[:-1])


def polygon_area(hull: np.ndarray) -> float:
    """Shoelace area of a CCW vertex ring (0.0 for degenerate hulls).

    Summed with ``math.fsum`` over the per-vertex cross terms — the exactly-
    rounded result is a pure function of the vertex doubles, identical on
    every machine. The previous ``np.dot`` form delegated the reduction to
    BLAS, whose kernel dispatch (and therefore accumulation order) varies by
    CPU microarchitecture: the golden VALUES oracle pinned on one sandbox
    read a last-ulp-different area on the next, failing parity with no code
    change (r16 inherited-state find)."""
    if len(hull) < 3:
        return 0.0
    n = len(hull)
    x, y = hull[:, 0], hull[:, 1]
    terms = [
        float(x[i]) * float(y[(i + 1) % n]) - float(x[(i + 1) % n]) * float(y[i])
        for i in range(n)
    ]
    return float(0.5 * abs(math.fsum(terms)))
