"""Round-trip tests for the real-PostgreSQL sink (sources/pg.py).

Boots an actual postgres 15 server in a scratch dir (unix socket,
trust auth, no TCP) and proves the reference's sink semantics against
it: parallel COPY staging + ON CONFLICT DO NOTHING merge, idempotent
under full double-write AND partial replay (the crash-replayed
micro-batch case, database/src/adapters/retryable.rs).  Skips
gracefully when the server binaries or the non-root run user are
unavailable.
"""

from __future__ import annotations

import os
import subprocess

import pytest

from near_indexer_for_explorer_spark.sources.pg import (
    PG_PORT,
    pg_available,
    pg_copy_upsert,
    pg_read_csv,
)


def _su_nobody(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "nobody", "-s", "/bin/sh", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",
    )


@pytest.fixture(scope="module")
def pg_server():
    if not pg_available():
        pytest.skip("postgres binaries not on PATH")
    if os.geteuid() != 0:
        pytest.skip("need root to drop to the nobody run user")
    # directly under /tmp: pytest's tmp_path ancestors are mode 700,
    # which the nobody run user cannot traverse
    import pathlib
    import shutil as _shutil
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="nifes-pg-", dir="/tmp"))
    os.chmod(base, 0o777)
    data = base / "data"
    init = _su_nobody(f"initdb -D {data} -A trust -U pguser")
    if init.returncode != 0:
        pytest.skip(f"initdb failed: {init.stderr[-200:]}")
    start = _su_nobody(
        f"pg_ctl -D {data} -o '-k {base} -p {PG_PORT} "
        f"-c listen_addresses=' -l {base}/log start"
    )
    if start.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {start.stderr[-200:]}")
    yield str(base)
    _su_nobody(f"pg_ctl -D {data} -m immediate stop")
    _shutil.rmtree(base, ignore_errors=True)


_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus text, "
    "o_totalprice double precision, o_orderdate date"
)
_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
]


def _orders(spark, sf_dir):
    from near_indexer_for_explorer_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "orders").select(*_COLS)


def test_pg_upsert_round_trip_and_idempotency(spark, sf_dir, pg_server):
    df = _orders(spark, sf_dir)
    n_src = df.count()

    pg_copy_upsert(df, "orders_sink", ["o_orderkey"], _DDL, pg_server)
    n1 = int(pg_read_csv(pg_server, "SELECT COUNT(*) c FROM orders_sink").splitlines()[1])
    assert n1 == n_src

    # full double-write: ON CONFLICT makes it a no-op
    pg_copy_upsert(df, "orders_sink", ["o_orderkey"], _DDL, pg_server)
    n2 = int(pg_read_csv(pg_server, "SELECT COUNT(*) c FROM orders_sink").splitlines()[1])
    assert n2 == n_src

    # partial replay (crash-replayed micro-batch): still a no-op
    pg_copy_upsert(
        df.limit(max(1, n_src // 3)),
        "orders_sink",
        ["o_orderkey"],
        _DDL,
        pg_server,
    )
    n3 = int(pg_read_csv(pg_server, "SELECT COUNT(*) c FROM orders_sink").splitlines()[1])
    assert n3 == n_src

    # value-level round trip: keys + status + date survive the CSV hop
    back = {}
    csv_out = pg_read_csv(
        pg_server,
        "SELECT o_orderkey, o_orderstatus, o_orderdate FROM orders_sink",
    )
    for line in csv_out.splitlines()[1:]:
        k, status, d = line.split(",")
        back[int(k)] = (status, d)
    src = {
        # o_orderdate loads as a midnight timestamp in Spark; the PG
        # column is DATE, so compare the date part
        r["o_orderkey"]: (r["o_orderstatus"], str(r["o_orderdate"])[:10])
        for r in df.select("o_orderkey", "o_orderstatus", "o_orderdate").collect()
    }
    assert back == src


def test_pg_upsert_first_write_wins(spark, pg_server):
    """Two frames with the same key and different payloads: the first
    insert wins and the second is dropped — exactly the reference's
    ON CONFLICT DO NOTHING receipt/transaction insert behavior."""
    a = spark.createDataFrame([(1, "first")], "k long, v string")
    b = spark.createDataFrame([(1, "second"), (2, "other")], "k long, v string")
    ddl = "k bigint, v text"
    pg_copy_upsert(a, "fww_sink", ["k"], ddl, pg_server)
    pg_copy_upsert(b, "fww_sink", ["k"], ddl, pg_server)
    out = dict(
        line.split(",")
        for line in pg_read_csv(pg_server, "SELECT k, v FROM fww_sink").splitlines()[1:]
    )
    assert out == {"1": "first", "2": "other"}


def test_pg_streaming_foreach_batch_replay(spark, sf_dir, pg_server):
    """Streaming leg: micro-batches land in postgres via foreachBatch
    + the COPY/merge sink; wiping the CHECKPOINT and replaying the
    whole stream leaves the table unchanged — exactly-once delivered
    by sink idempotency, the reference's crash-recovery model
    (ON CONFLICT DO NOTHING + at-least-once replay)."""
    import shutil as _shutil
    import tempfile

    src_df = _orders(spark, sf_dir).limit(200)
    n_src = src_df.count()
    work = tempfile.mkdtemp(prefix="nifes-pgstream-")
    src_dir = f"{work}/src"
    # two source files -> at least one micro-batch each in availableNow
    src_df.repartition(2).write.parquet(src_dir)

    def run_stream(checkpoint: str) -> None:
        stream = (
            spark.readStream.schema(src_df.schema).parquet(src_dir)
            .writeStream.foreachBatch(
                lambda batch, _id: pg_copy_upsert(
                    batch, "orders_stream_sink", ["o_orderkey"], _DDL, pg_server
                )
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        stream.awaitTermination(120)

    run_stream(f"{work}/ckpt1")
    n1 = int(
        pg_read_csv(pg_server, "SELECT COUNT(*) c FROM orders_stream_sink").splitlines()[1]
    )
    assert n1 == n_src

    # fresh checkpoint = full replay of every micro-batch
    run_stream(f"{work}/ckpt2")
    n2 = int(
        pg_read_csv(pg_server, "SELECT COUNT(*) c FROM orders_stream_sink").splitlines()[1]
    )
    assert n2 == n_src
    _shutil.rmtree(work, ignore_errors=True)


def test_pg_upsert_multi_chunk_partition(spark, pg_server):
    """A partition larger than the COPY chunk budget must stream as
    several bounded COPY statements with identical results — the
    sink's executor memory is O(chunk), not O(partition).  A tiny
    chunk_bytes forces every partition through many flushes; the
    double-write proves chunking kept the idempotent merge semantics."""
    df = (
        spark.range(0, 5000)
        .selectExpr("id AS k", "repeat('x', 64) AS v")
        .coalesce(1)  # one partition >> chunk budget
    )
    ddl = "k bigint, v text"
    # ~70 bytes/row, 4 KiB budget -> ~85 COPY statements for the partition
    pg_copy_upsert(df, "chunk_sink", ["k"], ddl, pg_server, chunk_bytes=4096)
    n1 = int(
        pg_read_csv(pg_server, "SELECT COUNT(*) c FROM chunk_sink").splitlines()[1]
    )
    assert n1 == 5000
    pg_copy_upsert(df, "chunk_sink", ["k"], ddl, pg_server, chunk_bytes=4096)
    n2 = int(
        pg_read_csv(pg_server, "SELECT COUNT(*) c FROM chunk_sink").splitlines()[1]
    )
    assert n2 == 5000
    # spot value integrity across chunk boundaries
    out = pg_read_csv(
        pg_server, "SELECT k, length(v) l FROM chunk_sink WHERE k IN (0, 2500, 4999) ORDER BY k"
    ).splitlines()[1:]
    assert out == ["0,64", "2500,64", "4999,64"]
