"""Generate VALUES-literal golden oracles -> meos_rs_spark/_golden_data.py.

Expected outputs are computed WITHOUT Spark: the sf0.01 fixture parquet is
read through DuckDB (using the same POSITS_XY_CTE the SQL oracles use), and the
per-group kernels run as plain numpy/struct calls — the same kernel functions
whose exactness is pinned by hand-built golden tests (tests/test_simplify.py,
test_trajsim.py, test_serde.py). The Spark queries' distributed plumbing
(shuffles, applyInPandas batching, pandas_udf Arrow transfer) is therefore
verified against an engine-independent expected result.

Determinism contract: the driver's fixtures are deterministic per scale
factor, so a VALUES literal pinned at sf0.01 (the driver's verification
scale) is stable across rounds. Rerun this script if TESTDATA.md reports a
fixture regeneration.

Usage:  python tools/gen_golden.py [sf_dir]    (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from meos_rs_spark.functions.similarity import (  # noqa: E402
    convex_hull,
    dtw_distance,
    erp_distance,
    frechet_distance,
    lcss_similarity,
    polygon_area,
)
from meos_rs_spark.functions.simplify import (  # noqa: E402
    douglas_peucker_mask,
    kept_ids_string,
)
from meos_rs_spark.functions.trajectory import POSITS_XY_CTE  # noqa: E402

# the ACTUAL tuning constants from the query modules — importing them (rather
# than copying values here) makes constant drift between a query and its
# golden oracle structurally impossible
from meos_rs_spark.queries.serialization import _HEX_PTS as HEX_PTS  # noqa: E402
from meos_rs_spark.queries.trajectory import (  # noqa: E402
    _DP_EPSILON as DP_EPSILON,
    _UTM_PTS as UTM_PTS,
)
from meos_rs_spark.queries.trajsim import K_VESSELS, LCSS_EPS  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if not np.isfinite(f):
            raise ValueError(f"non-finite golden value {f!r}")
        r = repr(f)  # shortest round-trip repr == exact double literal
        # bare decimal literals are DECIMAL in DuckDB (double-rounds through
        # the later CAST); an exponent suffix makes the literal DOUBLE, parsed
        # with correctly-rounded strtod — bit-exact round-trip
        return r if "e" in r or "E" in r or "inf" in r else r + "e0"
    raise TypeError(f"unsupported golden literal type {type(v)}")


def values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
    """DuckDB `SELECT CAST... FROM (VALUES ...)` with explicit output types,
    so the driver-side frame has exactly the Spark result's schema (the
    HUGEINT/DECIMAL typing hazard cannot arise from literals left uncast)."""
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(cols))
    body = ",\n".join("(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    return f"SELECT {sel}\nFROM (VALUES\n{body}\n) AS t({names})"


def main() -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    # XY envelope (r14 tranche 2a): the golden queries all consume
    # posits_xy now, so the Spark-free expected values must select through
    # the same envelope — on the NULL-free driver fixtures the selection is
    # identical to the raw view, so the regenerated literals are too.
    posits = con.sql(
        f"WITH {POSITS_XY_CTE} SELECT mmsi, ts, lon, lat, event_id FROM posits "
        "ORDER BY mmsi, ts, event_id"
    ).df()

    golden: dict[str, str] = {}

    # --- serde_hexwkb: first HEX_PTS posits/vessel -> OGC point hex ---------
    rows = []
    for mmsi, g in posits.groupby("mmsi", sort=True):
        for _, r in g.head(HEX_PTS).iterrows():
            hexwkb = struct.pack("<BI2d", 1, 1, r["lon"], r["lat"]).hex().upper()
            rows.append((int(mmsi), int(r["event_id"]), hexwkb))
    golden["serde_hexwkb"] = values_sql(
        [("mmsi", "BIGINT"), ("event_id", "BIGINT"), ("hexwkb", "VARCHAR")], rows
    )

    # --- traj_simplify_dp ---------------------------------------------------
    rows = []
    for mmsi, g in posits.groupby("mmsi", sort=True):
        pts = g[["lon", "lat"]].to_numpy(dtype=float)
        keep = douglas_peucker_mask(pts, DP_EPSILON)
        kept = kept_ids_string(g["event_id"].to_numpy()[keep])
        rows.append((int(mmsi), len(g), int(keep.sum()), kept))
    golden["traj_simplify_dp"] = values_sql(
        [
            ("mmsi", "BIGINT"),
            ("n_original", "BIGINT"),
            ("n_simplified", "BIGINT"),
            ("kept_event_ids", "VARCHAR"),
        ],
        rows,
    )

    # --- trajsim pair DPs (mmsi < K_VESSELS) --------------------------------
    sel = posits[posits["mmsi"] < K_VESSELS]
    curves = {
        int(m): g.sort_values(["ts", "lon", "lat"])[["lon", "lat"]].to_numpy(dtype=float)
        for m, g in sel.groupby("mmsi", sort=True)
    }
    ids = sorted(curves)
    dtw_rows, lcss_rows = [], []
    for i, a_id in enumerate(ids):
        for b_id in ids[i + 1 :]:
            a, b = curves[a_id], curves[b_id]
            dtw_rows.append(
                (a_id, b_id, len(a), len(b), dtw_distance(a, b), frechet_distance(a, b))
            )
            lcss_rows.append(
                (
                    a_id,
                    b_id,
                    len(a),
                    len(b),
                    lcss_similarity(a, b, LCSS_EPS),
                    erp_distance(a, b, np.zeros(2)),
                )
            )
    golden["trajsim_dtw_frechet"] = values_sql(
        [
            ("id_a", "BIGINT"),
            ("id_b", "BIGINT"),
            ("n_a", "BIGINT"),
            ("n_b", "BIGINT"),
            ("dtw", "DOUBLE"),
            ("frechet", "DOUBLE"),
        ],
        dtw_rows,
    )
    golden["trajsim_lcss_erp"] = values_sql(
        [
            ("id_a", "BIGINT"),
            ("id_b", "BIGINT"),
            ("n_a", "BIGINT"),
            ("n_b", "BIGINT"),
            ("lcss_sim", "DOUBLE"),
            ("erp", "DOUBLE"),
        ],
        lcss_rows,
    )

    # --- traj_transform_utm: first UTM_PTS posits/vessel -> UTM -------------
    from meos_rs_spark.functions.crs import _utm_numpy

    rows = []
    for mmsi, g in posits.groupby("mmsi", sort=True):
        head = g.head(UTM_PTS)
        zone, easting, northing = _utm_numpy(
            head["lon"].to_numpy(float), head["lat"].to_numpy(float)
        )
        for eid, z, e_, n_ in zip(head["event_id"], zone, easting, northing):
            rows.append((int(mmsi), int(eid), int(z), float(e_), float(n_)))
    golden["traj_transform_utm"] = values_sql(
        [
            ("mmsi", "BIGINT"),
            ("event_id", "BIGINT"),
            ("zone", "INTEGER"),
            ("easting", "DOUBLE"),
            ("northing", "DOUBLE"),
        ],
        rows,
    )

    # --- traj_transform_lcc: same selection -> Lambert-93 (EPSG:2154) -------
    from meos_rs_spark.functions.crs import _lcc93_numpy

    rows = []
    for mmsi, g in posits.groupby("mmsi", sort=True):
        head = g.head(UTM_PTS)
        x, y = _lcc93_numpy(head["lon"].to_numpy(float), head["lat"].to_numpy(float))
        for eid, x_, y_ in zip(head["event_id"], x, y):
            rows.append((int(mmsi), int(eid), float(x_), float(y_)))
    golden["traj_transform_lcc"] = values_sql(
        [
            ("mmsi", "BIGINT"),
            ("event_id", "BIGINT"),
            ("x_lcc", "DOUBLE"),
            ("y_lcc", "DOUBLE"),
        ],
        rows,
    )

    # --- traj_convex_hull ---------------------------------------------------
    rows = []
    for mmsi, g in posits.groupby("mmsi", sort=True):
        pts = g[["lon", "lat"]].to_numpy(dtype=float)
        h = convex_hull(pts)
        area = polygon_area(h)
        ring = ", ".join(f"{x:.6f} {y:.6f}" for x, y in h)
        closing = f", {h[0][0]:.6f} {h[0][1]:.6f}" if len(h) >= 3 else ""
        rows.append((int(mmsi), len(pts), len(h), area, f"POLYGON(({ring}{closing}))"))
    golden["traj_convex_hull"] = values_sql(
        [
            ("mmsi", "BIGINT"),
            ("n_points", "BIGINT"),
            ("n_hull_vertices", "BIGINT"),
            ("hull_area", "DOUBLE"),
            ("hull_wkt", "VARCHAR"),
        ],
        rows,
    )

    out = os.path.join(REPO, "meos_rs_spark", "_golden_data.py")
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_golden.py — do not edit by hand.\n\n'
            f"Source fixtures: {SF_DIR} (driver-deterministic). Regenerate on\n"
            'fixture change: python tools/gen_golden.py\n"""\n\n'
            "GOLDEN: dict[str, str] = {\n"
        )
        for name in sorted(golden):
            f.write(f"    {name!r}: {golden[name]!r},\n")
        f.write("}\n")
    sizes = {n: len(s) for n, s in golden.items()}
    print(f"wrote {out}: {sizes}")


if __name__ == "__main__":
    main()
