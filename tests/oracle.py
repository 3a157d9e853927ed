"""Local stand-in for the driver's Spark-vs-DuckDB correctness gate.

Approximates the driver's compare: row count, schema (column names), and an
order-insensitive value comparison with columns sorted by name. We compare
exact values (not hashes) so mismatches are debuggable; floats must match to
a tight tolerance, everything else exactly — if this passes, the driver's
hash compare should too (and any residual float divergence is a determinism
bug we want surfaced here first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _sort_key(s: pd.Series) -> pd.Series:
    """Per-column sort key: object columns holding date-likes (the
    out-of-ns year-9999 rescue path collects datetime OBJECTS) sort as
    datetime64[us] so both legs take the SAME sort path. Without this, a
    NULL in such a column raised TypeError and sent only that leg down
    the astype(str) fallback — where id 10 sorts before id 2 — misaligning
    rows against the other leg's numeric sort (false DIVERGE, r16)."""
    import datetime as _dt

    if s.dtype == object:
        non_null = s.dropna()
        if len(non_null) and all(
            isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp))
            for v in non_null
        ):
            return s.map(_canon_datelike).astype("datetime64[us]")
    return s


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # unify list/array cells to tuples so sorting/compare works
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(
            sort_cols, kind="mergesort", key=_sort_key
        ).reset_index(drop=True)
    except TypeError:
        df = df.iloc[
            df.astype(str).sort_values(sort_cols, kind="mergesort").index
        ].reset_index(drop=True)
    return df


def _canon_datelike(v):
    """Map date/Timestamp variants onto datetime.datetime (spans year
    1..9999); everything else passes through unchanged."""
    import datetime as _dt

    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return v


#: Non-fatal audit trail (r14 ADVICE item 2): every column whose values
#: compared equal ONLY after date-like canonicalization. A genuine engine
#: type regression (one leg returning DATE where the other returns
#: midnight TIMESTAMP for every row) no longer vanishes silently — it
#: lands here, and preflight prints it. Reset per run by the callers that
#: care; appended as "query.column: <why>" strings.
TYPE_NOTES: list[str] = []


def compare(spark_df, duck_df: pd.DataFrame, name: str, float_rtol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return [
            f"{name}: schema mismatch spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
        ]
    if len(sp) != len(duck_df):
        issues.append(f"{name}: row count spark={len(sp)} duck={len(duck_df)}")
        return issues
    a, b = _normalize(sp), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.allclose(
                av.to_numpy(dtype=float),
                bv.to_numpy(dtype=float),
                rtol=float_rtol,
                atol=0.0,
                equal_nan=True,
            )
            if not ok:
                bad = np.where(
                    ~np.isclose(av.to_numpy(float), bv.to_numpy(float), rtol=float_rtol, atol=0.0, equal_nan=True)
                )[0][:3]
                issues.append(
                    f"{name}.{c}: float mismatch rows {bad.tolist()} "
                    f"spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}"
                )
        else:
            if av.dtype != bv.dtype or av.dtype == object:
                # mixed-representation date-likes compare unequal even when
                # the VALUES agree: out-of-ns-range rows (year 9999
                # extremes) force a column to object dtype whose cells mix
                # datetime.date on one engine with Timestamp/datetime on
                # the other — the r14 win_gap_islands false DIVERGE.
                # Canonicalize to python datetime (which spans year
                # 1..9999) before the exact compare; non-date values pass
                # through untouched, so strings/ints/tuples are unaffected.
                ac, bc = av.map(_canon_datelike), bv.map(_canon_datelike)
                changed = not (ac.equals(av) and bc.equals(bv))
                eq = (ac == bc) | (ac.isna() & bc.isna())
                if changed and bool(eq.all()):
                    # record columns the canonicalization RESCUED — equal
                    # after but not before means the engines returned
                    # different date-like representations (r14 ADVICE 2)
                    try:
                        eq_raw = (av == bv) | (av.isna() & bv.isna())
                        raw_equal = bool(eq_raw.all())
                    except (TypeError, ValueError):
                        raw_equal = False
                    if not raw_equal:
                        TYPE_NOTES.append(
                            f"{name}.{c}: date-like representations differ "
                            f"(spark={av.dtype}, duck={bv.dtype}); values "
                            "equal only after canonicalization"
                        )
                av, bv = ac, bc
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
            if not bool(eq.all()):
                bad = np.where(~eq.to_numpy())[0][:3]
                issues.append(
                    f"{name}.{c}: value mismatch rows {bad.tolist()} "
                    f"spark={av.iloc[bad].tolist()!r} duck={bv.iloc[bad].tolist()!r}"
                )
    return issues
