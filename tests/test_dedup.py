"""Dedup-family focused tests (r16: the connected-components
convergence early-exit)."""

from __future__ import annotations

def test_min_label_components_converges_on_a_path_graph(spark):
    """The r16 convergence early-exit must not fire before the fixed
    point: a 5-node path needs several propagation rounds for the min
    label to travel end to end, and the result must be the exact
    transitive components either way."""
    from pyspark.sql import functions as F

    from meos_rs_spark.queries.dedup import _min_label_components

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = spark.createDataFrame(pairs, "src long, dst long").unionByName(
        spark.createDataFrame([(b, a) for a, b in pairs], "src long, dst long")
    )
    rows = {r.doc_id: (r.component, r.is_canonical) for r in _min_label_components(edges).collect()}
    assert rows == {
        1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0), 5: (1, 0),
        10: (10, 1), 11: (10, 0),
    }
