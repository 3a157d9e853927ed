"""Golden tests for trajectory similarity DPs (L2g), hand-computed curves."""

from __future__ import annotations

import numpy as np
import pytest

from meos_rs_spark.functions.similarity import (
    dtw_distance,
    frechet_distance,
    hausdorff_distance,
)

A = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
B = np.array([[0.0, 1.0], [1.0, 1.0], [2.0, 1.0]])  # A shifted up by 1


def test_parallel_lines():
    # every matched pair is distance 1
    assert frechet_distance(A, B) == pytest.approx(1.0)
    assert hausdorff_distance(A, B) == pytest.approx(1.0)
    assert dtw_distance(A, B) == pytest.approx(3.0)  # 3 diagonal steps × 1


def test_identical_curves():
    assert frechet_distance(A, A) == 0.0
    assert dtw_distance(A, A) == 0.0
    assert hausdorff_distance(A, A) == 0.0


def test_frechet_vs_hausdorff_divergence():
    # classic case: Hausdorff small but Fréchet large (reversed curve)
    C = A[::-1].copy()
    assert hausdorff_distance(A, C) == 0.0  # same point set
    assert frechet_distance(A, C) == pytest.approx(2.0)  # must traverse end-to-end


def test_dtw_asymmetric_lengths():
    D = np.array([[0.0, 0.0], [2.0, 0.0]])
    # DTW aligns middle point of A to one endpoint: cost 0 + 1 + 0
    assert dtw_distance(A, D) == pytest.approx(1.0)


def test_spark_pairs_match_local(spark):
    from meos_rs_spark.registry import load_registry
    from meos_rs_spark.functions.trajectory import posits_xy
    from tests.conftest import SF_SMOKE

    rows = load_registry()["trajsim_dtw_frechet"].fn(spark, SF_SMOKE).collect()
    assert rows
    pts = posits_xy(spark, SF_SMOKE).filter("mmsi < 8").orderBy("ts").collect()
    by_id: dict[int, list[tuple[float, float]]] = {}
    for r in pts:
        by_id.setdefault(r.mmsi, []).append((r.lon, r.lat))
    for r in rows[:3]:
        a = np.array(by_id[r.id_a])
        b = np.array(by_id[r.id_b])
        assert r.dtw == pytest.approx(dtw_distance(a, b))
        assert r.frechet == pytest.approx(frechet_distance(a, b))


def test_lcss_golden():
    from meos_rs_spark.functions.similarity import lcss_similarity

    A = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    B = np.array([[0.0, 0.9], [1.0, 0.9], [2.0, 0.9], [3.0, 0.9]])
    assert lcss_similarity(A, B, 1.0) == pytest.approx(1.0)   # every point pairs within eps
    assert lcss_similarity(A, B, 0.5) == 0.0                  # nothing within eps
    # one outlier costs exactly one match, not its full distance (vs DTW)
    C = np.array([[0.0, 0.0], [1.0, 50.0], [2.0, 0.0], [3.0, 0.0]])
    assert lcss_similarity(A, C, 0.5) == pytest.approx(0.75)


def test_erp_golden():
    from meos_rs_spark.functions.similarity import erp_distance

    g = np.zeros(2)
    A = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    assert erp_distance(A, A, g) == 0.0
    # dropping the last two points pays their distance to the gap point
    assert erp_distance(A, A[:2], g) == pytest.approx(5.0)
    # identity of indiscernibles + symmetry (metric properties)
    B = A + np.array([0.0, 1.0])
    assert erp_distance(A, B, g) == pytest.approx(erp_distance(B, A, g))
    assert erp_distance(A, B, g) > 0.0


def test_lcss_erp_query_shape(spark):
    from meos_rs_spark.registry import load_registry
    from tests.conftest import SF_SMOKE

    df = load_registry()["trajsim_lcss_erp"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.lcss_sim <= 1.0
        assert r.erp >= 0.0


def test_convex_hull_golden():
    from meos_rs_spark.functions.similarity import convex_hull, polygon_area

    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]], dtype=float)
    h = convex_hull(sq)
    assert h.tolist() == [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
    assert polygon_area(h) == pytest.approx(1.0)
    tri = np.array([[0, 0], [4, 0], [0, 3], [1, 1]], dtype=float)
    assert polygon_area(convex_hull(tri)) == pytest.approx(6.0)
    line = np.array([[0, 0], [1, 1], [2, 2]], dtype=float)
    assert polygon_area(convex_hull(line)) == 0.0


def test_polygon_area_is_the_exactly_rounded_shoelace_sum():
    """polygon_area must be bit-identical on every machine (r16 inherited-
    state find: a BLAS-backed np.dot reduction read a last-ulp-different
    sum on the reprovisioned sandbox's CPU, breaking golden parity with no
    code change). The contract is the exactly-rounded (math.fsum) shoelace
    over the per-vertex cross terms — pinned here against an independent
    Fraction-exact reference on an irregular ring whose naive left-to-right
    float sum differs in the last ulp, so any drift back to an
    accumulation-order-dependent reduction fails on at least some boxes."""
    import math
    from fractions import Fraction

    from meos_rs_spark.functions.similarity import polygon_area

    ring = np.array(
        [
            [-741319.5559626315, -504770.33260617143],
            [-218100.59373354586, 742843.9482525988],
            [-838837.3975997227, -101625.19810133812],
            [98879.8182880748, 766767.6528830249],
            [638559.6756714827, 727968.9393970303],
            [-443157.87097220577, -169406.96557660284],
            [-282457.6693367504, 768385.6543964341],
        ],
        dtype=float,
    )
    n = len(ring)
    terms = [
        float(ring[i, 0]) * float(ring[(i + 1) % n, 1])
        - float(ring[(i + 1) % n, 0]) * float(ring[i, 1])
        for i in range(n)
    ]
    # the exactly-rounded sum of the IEEE term doubles, via exact rationals
    exact = float(sum(Fraction(t) for t in terms))
    assert polygon_area(ring) == 0.5 * abs(exact)
    # the naive sequential sum genuinely differs here — the pin is not vacuous
    assert sum(terms) != exact
    assert math.fsum(terms) == exact


def test_convex_hull_query_invariants(spark):
    from meos_rs_spark.registry import load_registry
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F
    from meos_rs_spark.functions.trajectory import posits_xy

    df = load_registry()["traj_convex_hull"].fn(spark, SF_SMOKE)
    bbox = (
        posits_xy(spark, SF_SMOKE)
        .groupBy("mmsi")
        .agg(((F.max("lon") - F.min("lon")) * (F.max("lat") - F.min("lat"))).alias("bbox_area"))
    )
    joined = df.join(bbox, "mmsi")
    bad = joined.filter(
        (F.col("hull_area") > F.col("bbox_area") + 1e-9)
        | (F.col("n_hull_vertices") > F.col("n_points"))
        | ~F.col("hull_wkt").startswith("POLYGON((")
    )
    assert bad.count() == 0
