"""Driver-canonicalizer output-type fence — the ArrayType twin of
``test_parity.py::test_oracle_output_types_strict``.

The driver canonicalizes query output by hashing cell values after a
column-name sort; numpy array cells are unhashable, so ANY top-level
``array<T>`` (or map/struct, same failure) output column ERRs the driver
row even when both legs agree (observed r2/r3: ``unhashable
numpy.ndarray`` on traj_simplify_dp before its output moved to
``array_join``). This test pins the whole class for every registered
query: complex values must be rendered to strings (``array_join``,
``to_json``) before they reach the output schema.

Note on cost: schema derivation itself is analysis-only, but building the
DataFrame means CALLING each query fn, and some fns execute eagerly on the
way to their final plan (staging-table writes, streaming awaitTermination,
the sqlite upsert). The sweep therefore runs real jobs for those queries —
accepted deliberately: the fence must cover the whole registry, and the
sf0.001 fixtures keep it to ~2 minutes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from meos_rs_spark.registry import load_registry

REGISTRY = load_registry()

#: Types whose python/pandas cells hash cleanly in the driver canonicalizer.
_HASHABLE_LEAVES = (
    T.StringType,
    T.BinaryType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DayTimeIntervalType,
    T.NullType,
)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unhashable_output_columns(registry_snapshots, name):
    schema, _ = registry_snapshots[name]
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if not isinstance(f.dataType, _HASHABLE_LEAVES)
    ]
    assert not offenders, (
        f"{name}: output columns {offenders} would crash the driver "
        "canonicalizer (unhashable cells) — render via array_join/to_json"
    )
