"""Trajectory simplification (SURVEY.md L2d: Douglas-Peucker, reachable in
MEOS as ``temporal_simplify_dp``; see SURVEY L2 spatial family).

An inherently recursive algorithm → numpy implementation applied per vessel
via ``applyInPandas`` (rows-only driver check; exact behavior pinned by
golden tests in tests/test_simplify.py).
"""

from __future__ import annotations

import numpy as np


def _perp_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of each point to segment a-b (degenerate
    segment → plain euclidean distance to a)."""
    ab = b - a
    denom = np.hypot(*ab)
    if denom == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    return np.abs(ab[0] * (a[1] - pts[:, 1]) - (a[0] - pts[:, 0]) * ab[1]) / denom


def douglas_peucker_mask(pts: np.ndarray, epsilon: float) -> np.ndarray:
    """Boolean keep-mask for Douglas-Peucker with tolerance ``epsilon``
    (iterative stack form — no recursion limits)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi <= lo + 1:
            continue
        seg = pts[lo + 1 : hi]
        d = _perp_dist(seg, pts[lo], pts[hi])
        imax = int(np.argmax(d))
        if d[imax] > epsilon:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep


def kept_ids_string(event_ids) -> str:
    """Render the kept posits' event_ids as the driver-safe comma string.

    Total on NULL ids: the adversarial events fixture carries a NULL
    event_id row (the r12 restart-split corner), and ``int(None)`` /
    ``int(nan)`` aborted the whole applyInPandas stage — one bad row
    killing the job at scale (r14 sweep find, ABORT/S). A NULL id renders
    as the literal ``null``; BOTH the Spark kernel (_simplify_group) and
    the Spark-free golden generator (tools/gen_golden.py) go through this
    one function, so the two legs cannot drift.

    Exact on FLOAT-coerced ids (r14 ADVICE item 1): one NULL in the group
    coerces pandas' event_id column to float64, where ids >= 2**53 lose
    bits — ``int(float(e))`` would then silently MISNAME the kept posit.
    Any float whose int round-trip is inexact renders ``null`` instead of
    a wrong id (same class as NULL: the true id is unrepresentable in the
    value we were handed). The exactness threshold is per-DTYPE (r15
    ADVICE: 2**(mantissa bits + 1) — float64 → 2**53, float32 → 2**24),
    so a narrower float that reaches this function — unreachable from
    pandas' int64+NULL coercion today, which always widens to float64 —
    still honors the invariant instead of rendering a post-coercion value.
    """
    out = []
    for e in event_ids:
        try:
            i = int(e)
            # floats only — int64-typed ids (python or numpy) are exact.
            # Non-integral floats misname outright; |e| at or beyond the
            # dtype's integer-exactness limit may LOOK integral but the
            # int→float coercion upstream already dropped bits, so the
            # rendered id would be unverifiable.
            if isinstance(e, (float, np.floating)):
                ftype = type(e) if isinstance(e, np.floating) else np.float64
                exact_limit = 2 ** (np.finfo(ftype).nmant + 1)
            if isinstance(e, (float, np.floating)) and (
                float(e) != i or abs(i) >= exact_limit
            ):
                out.append("null")
                continue
            out.append(str(i))
        except (TypeError, ValueError, OverflowError):  # None/NaN/pd.NA/±inf
            out.append("null")
    return ",".join(out)
