"""Real PostgreSQL sink: parallel COPY + idempotent merge.

The reference's entire write path is PostgreSQL with idempotent
inserts (`ON CONFLICT DO NOTHING`, database/src/adapters/mod.rs;
retry discipline in database/src/adapters/retryable.rs).  The
container ships server binaries (postgres 15, initdb, pg_ctl) and the
psql client but NO Python/JDBC driver, so this sink speaks to the
server the way production bulk loaders do anyway: each partition
streams CSV through `psql` COPY into an UNLOGGED staging table
(parallel, executor-side), then ONE `INSERT ... ON CONFLICT DO
NOTHING` merges staging into the target — the classic two-phase bulk
upsert.  At 100 TB the same shape holds: COPY per partition saturates
the wire protocol (COPY is the fastest PG ingest path), and the merge
is a single set-based statement the server executes off the staging
heap; for key-partitioned targets, stage per key range and merge per
range.

The sink is exercised by tests/test_pg_sink.py against a REAL
postgres it boots in a scratch dir (unix socket, trust auth) —
idempotency is proven by double-writing and by replaying a batch,
mirroring the reference's crash-replay semantics.  Everything
degrades gracefully: `pg_available()` gates on the binaries and on a
non-root user to run the server as (postgres refuses to start as
root; the test fixture uses `su nobody`).
"""

from __future__ import annotations

import csv
import shutil
import subprocess

from pyspark.sql import DataFrame

PG_PORT = 54339  # scratch-server port (unix socket only, no TCP)


def pg_available() -> bool:
    """True when the postgres server+client binaries this sink needs
    exist on PATH."""
    return all(
        shutil.which(b) is not None
        for b in ("initdb", "pg_ctl", "postgres", "psql")
    )


def _psql(socket_dir: str, sql: str, stdin: str | None = None) -> str:
    """Run one psql statement against the scratch server; raises on
    SQL errors (ON_ERROR_STOP) with stderr in the message."""
    proc = subprocess.run(
        [
            "psql",
            "-h", socket_dir,
            "-p", str(PG_PORT),
            "-U", "pguser",
            "-d", "postgres",
            "-v", "ON_ERROR_STOP=1",
            "-qAt",
            "-c", sql,
        ],
        input=stdin,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.strip()}")
    return proc.stdout


# Per-COPY byte budget: a partition is streamed as a SEQUENCE of COPY
# statements, each at most this many CSV bytes, so executor memory for
# the sink is O(chunk), never O(partition) — at production partition
# sizes (hundreds of MB) a single whole-partition StringIO would pin
# partition-sized heap per task.  Chunking does not change semantics:
# staging accepts duplicates freely and the ON CONFLICT merge dedups,
# so a partition split across N COPYs lands identically (proven by the
# multi-chunk test in tests/test_pg_sink.py).
_COPY_CHUNK_BYTES = 64 * 1024 * 1024


class _CountingBuf:
    """Write target for csv.writer that tracks ENCODED (utf-8) size —
    StringIO.tell() counts characters, which understates the real COPY
    payload by up to 4x on non-ASCII data and would quietly weaken the
    O(chunk) memory bound."""

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.nbytes = 0

    def write(self, s: str) -> None:
        self.parts.append(s)
        self.nbytes += len(s.encode("utf-8"))

    def value(self) -> str:
        return "".join(self.parts)

    def reset(self) -> None:
        self.parts.clear()
        self.nbytes = 0


def _copy_partition(
    rows, socket_dir: str, staging: str, chunk_bytes: int = _COPY_CHUNK_BYTES
) -> None:
    """Stream one partition into the staging table via bounded COPY
    batches (csv).

    Runs inside foreachPartition on the executor: self-contained
    closure, one psql subprocess per <=chunk_bytes slice (measured in
    encoded bytes), NULLs as \\N."""
    buf = _CountingBuf()
    writer = csv.writer(buf, lineterminator="\n")

    def flush() -> None:
        if buf.nbytes == 0:
            return
        _psql(
            socket_dir,
            f"COPY {staging} FROM STDIN (FORMAT csv, NULL '\\N')",
            stdin=buf.value(),
        )
        buf.reset()

    for row in rows:
        writer.writerow(["\\N" if v is None else v for v in row])
        if buf.nbytes >= chunk_bytes:
            flush()
    flush()


def pg_copy_upsert(
    df: DataFrame,
    table: str,
    key_cols: list[str],
    ddl_cols: str,
    socket_dir: str,
    chunk_bytes: int = _COPY_CHUNK_BYTES,
) -> None:
    """Idempotently upsert `df` into postgres table `table`.

    Two-phase: parallel per-partition COPY into an UNLOGGED staging
    table, then one set-based `INSERT ... ON CONFLICT (keys) DO
    NOTHING` merge — the reference's insert semantics
    (database/src/adapters/mod.rs) expressed as bulk SQL.  Replaying
    the same frame (or any subset — a crash-replayed micro-batch) is
    a no-op, which the tests assert against the live server."""
    cols = ", ".join(df.columns)
    keys = ", ".join(key_cols)
    staging = f"{table}_staging"
    _psql(
        socket_dir,
        f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols}, "
        f"PRIMARY KEY ({keys}))",
    )
    _psql(socket_dir, f"DROP TABLE IF EXISTS {staging}")
    _psql(
        socket_dir,
        f"CREATE UNLOGGED TABLE {staging} (LIKE {table} INCLUDING DEFAULTS)",
    )
    sd = socket_dir  # capture plain strings, not self
    st = staging
    cb = chunk_bytes
    df.foreachPartition(lambda rows: _copy_partition(rows, sd, st, cb))
    _psql(
        socket_dir,
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {st} "
        f"ON CONFLICT ({keys}) DO NOTHING",
    )
    _psql(socket_dir, f"DROP TABLE {st}")


def pg_read_csv(socket_dir: str, sql: str) -> str:
    """Round-trip leg: run a query on the server, return CSV text
    (header included) — the read-back the parity tests diff against
    the Spark-side source frame."""
    return _psql(socket_dir, f"COPY ({sql}) TO STDOUT (FORMAT csv, HEADER)")
