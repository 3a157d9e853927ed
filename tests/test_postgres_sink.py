"""The database-upsert sink against a REAL PostgreSQL server.

``snk_jdbc_upsert`` reproduces the reference's pooled prepared-upsert sink
(``ais_to_db.rs:89-98, :156-161, :202-212``) against file-backed sqlite —
semantics covered, wire protocol not (r5 VERDICT, missing item 4). This
container ships full Postgres 15 server binaries and a ``postgres`` system
user, so the wire protocol IS coverable: boot an ephemeral single-session
cluster on a unix socket (no TCP, no port contention), install the
engine-side merge function — the ``public.update()`` analog, a pure-SQL
``DISTINCT ON`` newest-wins merge running INSIDE the database exactly like
MobilityDB's — and drive the same base+overlapping-delta dataflow through
executor-side connections (one ``psql`` client per partition, the pool
analog; batches of ``_UPSERT_BATCH`` instants per prepared conflict-merge
statement, same as the sqlite path and the reference's batch_size=50).

The read-back summary must equal the sqlite-backed registry query's output
bit-for-bit — which is itself DuckDB-oracled and driver-green — so the
assertion chains the real-Postgres path to the same oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from meos_rs_spark.queries.sources_sinks import (
    _UPSERT_BATCH,
    _trip_normalize,
    snk_jdbc_upsert,
)
from tests.conftest import SF_SMOKE

PG_BIN = "/usr/local/bin"
PSQL = shutil.which("psql")

pytestmark = pytest.mark.skipif(
    not (PSQL and os.path.exists(f"{PG_BIN}/initdb") and os.getuid() == 0),
    reason="postgres server binaries / root (for su postgres) unavailable",
)

# the merge inside the DB engine (the public.update(old, new, true) slot,
# ais_to_db.rs:95): union the two point arrays, keep per-timestamp the
# (pri, event_id)-max point, return sorted by timestamp. Point encoding is
# the sink's json [ts_us, lon, lat, event_id, pri].
_MERGE_FN = """
CREATE FUNCTION traj_merge_json(old jsonb, nw jsonb) RETURNS jsonb AS $FN$
  SELECT COALESCE(jsonb_agg(p ORDER BY ts), '[]'::jsonb) FROM (
    SELECT DISTINCT ON (((e.p)->>0)::bigint)
           e.p AS p, ((e.p)->>0)::bigint AS ts
    FROM (
      SELECT jsonb_array_elements(old) AS p
      UNION ALL
      SELECT jsonb_array_elements(nw)
    ) e
    ORDER BY ((e.p)->>0)::bigint, ((e.p)->>4)::int DESC, ((e.p)->>3)::bigint DESC
  ) q
$FN$ LANGUAGE sql;
"""


def _su_pg(cmd: str) -> None:
    # cd to a postgres-traversable dir first: su keeps the caller's cwd, and
    # pytest runs from /root/repo which user postgres cannot enter
    subprocess.run(
        ["su", "postgres", "-s", "/bin/sh", "-c", f"cd /tmp && {cmd}"],
        check=True,
        capture_output=True,
    )


@pytest.fixture(scope="module")
def pg_sock():
    # NOT tmp_path_factory: pytest's per-user tmp root is mode 0700 for
    # root, so user postgres cannot traverse into it — use a plain mkdtemp
    # under the world-traversable /tmp and clean it up ourselves
    import tempfile

    root = tempfile.mkdtemp(prefix="meos_pg_")
    data, sock = os.path.join(root, "data"), os.path.join(root, "sock")
    os.makedirs(sock)
    subprocess.run(["chown", "-R", "postgres:postgres", root], check=True)
    _su_pg(f"{PG_BIN}/initdb -D {data} -U spark --auth=trust --no-sync")
    _su_pg(
        f"{PG_BIN}/pg_ctl -D {data} -w -l {root}/log start "
        f"-o \"-c listen_addresses='' -k {sock} -c fsync=off\""
    )
    try:
        yield sock
    finally:
        _su_pg(f"{PG_BIN}/pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(root, ignore_errors=True)


def _psql(sock: str, sql: str) -> str:
    r = subprocess.run(
        [PSQL, "-h", sock, "-U", "spark", "-d", "postgres", "-X", "-q",
         "-v", "ON_ERROR_STOP=1", "-t", "-A"],
        input=sql,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr[:2000]
    return r.stdout


def test_upsert_sink_against_real_postgres(spark, pg_sock):
    import pyspark.sql.functions as F

    # posits_xy: the query this test mirrors (snk_jdbc_upsert) moved onto the
    # XY envelope in r14 tranche 2b — the wire-protocol twin follows its source
    from meos_rs_spark.queries.sources_sinks import _UPSERT_T0, _UPSERT_T1, posits_xy

    batch_size, psql_bin = _UPSERT_BATCH, PSQL

    def pg_upsert_partition(rows, sock=pg_sock):
        """Executor-side upsert: ONE client (the pooled-connection analog)
        per partition, per-vessel batches through the conflict-merge
        statement — the same loop shape as sources_sinks._upsert_partition,
        over the real PostgreSQL wire protocol. Defined INSIDE the test so
        cloudpickle ships it by value (Python workers cannot import test
        modules by name)."""
        import json as _json
        import subprocess as _sp

        from meos_rs_spark.queries.sources_sinks import _trip_normalize as norm

        by_vessel: dict = {}
        for r in rows:
            by_vessel.setdefault(r.mmsi, []).append(
                [r.ts_us, r.lon, r.lat, r.event_id, r.pri]
            )
        if not by_vessel:
            return
        stmts = []
        for mmsi in sorted(by_vessel):
            pts = by_vessel[mmsi]
            for i in range(0, len(pts), batch_size):
                payload = _json.dumps(norm(pts[i : i + batch_size]))
                stmts.append(
                    f"INSERT INTO trips (mmsi, trip) VALUES ({int(mmsi)}, "
                    f"$J${payload}$J$::jsonb) ON CONFLICT (mmsi) DO UPDATE "
                    f"SET trip = traj_merge_json(trips.trip, EXCLUDED.trip);"
                )
        proc = _sp.run(
            [psql_bin, "-h", sock, "-U", "spark", "-d", "postgres", "-X",
             "-q", "-v", "ON_ERROR_STOP=1"],
            input="\n".join(stmts),
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"psql upsert failed: {proc.stderr[:500]}")

    _psql(
        pg_sock,
        "CREATE TABLE trips (mmsi bigint PRIMARY KEY, trip jsonb NOT NULL);"
        + _MERGE_FN,
    )
    pts = posits_xy(spark, SF_SMOKE).select(
        "mmsi",
        "ts",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
        "lon",
        "lat",
        "event_id",
    )
    base = pts.filter(F.col("ts") < F.lit(_UPSERT_T1).cast("timestamp_ntz")).withColumn(
        "pri", F.lit(0)
    )
    delta = (
        pts.filter(F.col("ts") >= F.lit(_UPSERT_T0).cast("timestamp_ntz"))
        .withColumn("lon", F.col("lon") + 0.5)
        .withColumn("pri", F.lit(1))
    )
    for batch in (base, delta):
        batch.drop("ts").coalesce(8).foreachPartition(pg_upsert_partition)

    stored = _psql(pg_sock, "SELECT mmsi, trip FROM trips ORDER BY mmsi;")
    got = []
    for line in stored.strip().splitlines():
        mmsi, trip = line.split("|", 1)
        p = _trip_normalize(json.loads(trip))
        lats = [q[2] for q in p]
        got.append(
            (int(mmsi), len(p), p[0][0], p[-1][0], p[0][1], p[-1][1], min(lats), max(lats))
        )

    # chain to the oracle: the sqlite-backed registry query computes the
    # same merge and is itself DuckDB-oracled + driver-green
    expected = sorted(
        tuple(r) for r in snk_jdbc_upsert(spark, SF_SMOKE).collect()
    )
    assert sorted(got) == expected


def test_engine_side_merge_function_newest_wins(spark, pg_sock):
    """The in-database merge alone: delta (pri=1) wins timestamp
    collisions, disjoint timestamps union, output sorted by ts — the
    public.update(old, new, true) contract."""
    out = _psql(
        pg_sock,
        "SELECT traj_merge_json("
        "'[[100, 1.0, 2.0, 7, 0], [200, 3.0, 4.0, 8, 0]]'::jsonb, "
        "'[[200, 9.0, 9.0, 8, 1], [300, 5.0, 6.0, 9, 1]]'::jsonb);",
    )
    merged = json.loads(out.strip())
    assert merged == [
        [100, 1.0, 2.0, 7, 0],
        [200, 9.0, 9.0, 8, 1],
        [300, 5.0, 6.0, 9, 1],
    ]
