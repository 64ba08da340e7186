"""Live-PostgreSQL round-trip for the upsert sink (VERDICT r1 #8).

The container ships a real PostgreSQL server but no Python driver;
``sinks.pgwire`` is the minimal wire-protocol client standing in for
psycopg2 (same paramstyle='format', same client-side interpolation).  This
test initdb's a scratch cluster on a unix socket, runs the sink's
ON CONFLICT path against it — both the driver-stream and the
partition-parallel Arrow writers — and checks real-server semantics:
exact insert counts, idempotent replay, conflict-ignore under concurrent
writers.  Skips cleanly when no server binary / postgres user is present.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import tempfile

import pytest

from evm_archive_spark import fixtures
from evm_archive_spark.schemas import LOGS_PK
from evm_archive_spark.sinks import pgwire, upsert


def test_literal_adaptation_no_server():
    """Client-side interpolation (the psycopg2-faithful part) is testable
    without a server: quoting, escaping, type adaptation, arity check."""
    import datetime

    from evm_archive_spark.sinks.pgwire import PgError, _interpolate, _quote

    assert _quote(None) == "NULL"
    assert _quote(True) == "TRUE" and _quote(False) == "FALSE"
    assert _quote(42) == "42" and _quote(-1.5) == "-1.5"
    assert _quote("a'b; DROP TABLE x--") == "'a''b; DROP TABLE x--'"
    assert _quote(b"\x00\xff") == "'\\x00ff'::bytea"
    assert (
        _quote(datetime.datetime(2024, 1, 2, 3, 4, 5))
        == "'2024-01-02T03:04:05'::timestamp"
    )
    assert (
        _interpolate("INSERT INTO t VALUES (%s, %s)", (1, "x'y"))
        == "INSERT INTO t VALUES (1, 'x''y')"
    )
    with pytest.raises(PgError, match="mismatch"):
        _interpolate("VALUES (%s, %s)", (1,))
    with pytest.raises(PgError, match="NUL"):
        _quote("bad\x00string")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _su_postgres(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/sh", "-c", cmd],
        capture_output=True,
        text=True,
        timeout=120,
    )


@pytest.fixture(scope="module")
def pg():
    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        pytest.skip("no PostgreSQL server binaries")
    base = tempfile.mkdtemp(prefix="pglive-", dir="/tmp")
    port = _free_port()
    try:
        os.chmod(base, 0o777)
        shutil.chown(base, "postgres")
    except (PermissionError, LookupError):
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip("cannot hand a scratch dir to a postgres user")
    r = _su_postgres(
        f"initdb -D {base}/data -A trust --no-instructions -U postgres"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _su_postgres(
        f"pg_ctl -D {base}/data -l {base}/log -w "
        f"-o \"-k {base} -p {port} -c listen_addresses=''\" start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield {"host": base, "port": port}
    finally:
        _su_postgres(f"pg_ctl -D {base}/data -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def _connect(pg):
    return pgwire.connect(host=pg["host"], port=pg["port"])


def test_wire_client_basics(pg):
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT 1 AS one, 'a''b' AS s, NULL AS n")
    assert cur.fetchall() == [("1", "a'b", None)]
    assert [d[0] for d in cur.description] == ["one", "s", "n"]
    cur.execute("CREATE TABLE basics (a INT PRIMARY KEY, b TEXT)")
    cur.execute("INSERT INTO basics VALUES (%s, %s)", (1, "x"))
    assert cur.rowcount == 1
    cur.execute(
        "INSERT INTO basics VALUES (%s, %s) ON CONFLICT (a) DO NOTHING",
        (1, "y"),
    )
    assert cur.rowcount == 0  # real ON CONFLICT semantics
    con.commit()
    con.close()


def test_quoting_roundtrip_fuzz(pg):
    """Client-side interpolation must deliver arbitrary text to the server
    intact (the psycopg2-equivalent safety property): fuzz strings through
    INSERT %s -> SELECT and compare."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    con = _connect(pg)
    cur = con.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS fuzz (s TEXT)")
    con.commit()

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\x00"
            ),
            max_size=80,
        )
    )
    def roundtrip(s):
        cur.execute("DELETE FROM fuzz")
        cur.execute("INSERT INTO fuzz VALUES (%s)", (s,))
        cur.execute("SELECT s FROM fuzz")
        assert cur.fetchall() == [(s,)]

    roundtrip()
    con.rollback()
    con.close()


def test_sink_roundtrip_live_postgres(spark, pg):
    """The sink's production shape on a real server: paramstyle='format',
    executemany batches, ON CONFLICT ON the PK — exact counts, idempotent
    replay (get_logs.go:112-137 semantics)."""
    con = _connect(pg)
    con.cursor().execute(upsert.LOGS_DDL_GENERIC)
    con.commit()
    con.close()

    df = fixtures.logs_df(spark)
    n_unique = df.dropDuplicates(LOGS_PK).count()
    host, port = pg["host"], pg["port"]
    factory = lambda: pgwire.connect(host=host, port=port)  # noqa: E731

    r1 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, paramstyle="format", parallel=False
    )
    assert r1.attempted == n_unique

    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT COUNT(*) FROM logs")
    assert cur.fetchone() == (str(n_unique),)
    con.close()

    # replay: second pass inserts 0 (checked on the server, not the client)
    r2 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, paramstyle="format", parallel=False
    )
    assert r2.attempted == n_unique
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT COUNT(*) FROM logs")
    assert cur.fetchone() == (str(n_unique),)
    con.close()


def test_sink_parallel_arrow_writers_live_postgres(spark, pg):
    """parallel=True: each partition's Arrow writer opens its own real
    server connection — the actual multi-writer deployment shape."""
    con = _connect(pg)
    con.cursor().execute("DROP TABLE IF EXISTS logs")
    con.cursor().execute(upsert.LOGS_DDL_GENERIC)
    con.commit()
    con.close()

    df = fixtures.logs_df(spark).repartition(4)
    n_unique = df.dropDuplicates(LOGS_PK).count()
    host, port = pg["host"], pg["port"]
    factory = lambda: pgwire.connect(host=host, port=port)  # noqa: E731

    upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, paramstyle="format", parallel=True
    )
    upsert.write_conflict_ignore(  # concurrent-replay idempotency
        df, "logs", LOGS_PK, factory, paramstyle="format", parallel=True
    )
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT COUNT(*) FROM logs")
    assert cur.fetchone() == (str(n_unique),)
    con.close()


def test_copy_in_text_format_roundtrip(pg):
    """copy_in streams COPY text chunks and returns the server's exact
    row count; escaping covers tabs/newlines/backslashes/NULL/bytea."""
    from evm_archive_spark.sinks.pgwire import copy_text_row

    con = _connect(pg)
    cur = con.cursor()
    cur.execute(
        "CREATE TABLE copy_rt (i INT, s TEXT, b BOOLEAN, by BYTEA, "
        "ts TIMESTAMP)"
    )
    import datetime

    rows = [
        (1, "plain", True, b"\x00\xff", datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "tab\there", False, None, None),
        (3, "line\nbreak \\ back", None, b"", None),
        (4, None, True, None, None),
    ]
    n = con.copy_in(
        "COPY copy_rt (i, s, b, by, ts) FROM STDIN",
        (copy_text_row(r) for r in rows),
    )
    assert n == 4
    con.commit()
    cur.execute("SELECT s FROM copy_rt ORDER BY i")
    assert [r[0] for r in cur.fetchall()] == [
        "plain", "tab\there", "line\nbreak \\ back", None,
    ]
    cur.execute("SELECT encode(by, 'hex') FROM copy_rt WHERE i = 1")
    assert cur.fetchone() == ("00ff",)
    # the connection stays usable for plain queries after a COPY
    cur.execute("SELECT COUNT(*) FROM copy_rt")
    assert cur.fetchone() == ("4",)
    con.close()


def test_copy_in_error_recovers_connection(pg):
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("CREATE TABLE copy_err (i INT)")
    con.commit()
    with pytest.raises(pgwire.PgError):
        con.copy_in(
            "COPY copy_err (i) FROM STDIN", [b"not_an_int\n"]
        )
    con.rollback()
    cur.execute("SELECT 1")
    assert cur.fetchone() == ("1",)
    con.close()


def test_sink_copy_method_live_postgres(spark, pg):
    """method='copy': COPY into a temp stage + one set-based ON CONFLICT
    merge per partition — exact counts on both passes, idempotent replay,
    parallel Arrow writers (VERDICT r2 #5)."""
    con = _connect(pg)
    con.cursor().execute("DROP TABLE IF EXISTS logs")
    con.cursor().execute(upsert.LOGS_DDL_GENERIC)
    con.commit()
    con.close()

    df = fixtures.logs_df(spark).repartition(4)
    n_unique = df.dropDuplicates(LOGS_PK).count()
    host, port = pg["host"], pg["port"]
    factory = lambda: pgwire.connect(host=host, port=port)  # noqa: E731

    r1 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, parallel=True, method="copy"
    )
    assert (r1.attempted, r1.inserted) == (n_unique, n_unique)
    r2 = upsert.write_conflict_ignore(  # replay: merge inserts 0
        df, "logs", LOGS_PK, factory, parallel=True, method="copy"
    )
    assert (r2.attempted, r2.inserted) == (n_unique, 0)
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT COUNT(*) FROM logs")
    assert cur.fetchone() == (str(n_unique),)
    con.close()


def test_sink_exact_counts_live_postgres(spark, pg):
    con = _connect(pg)
    con.cursor().execute("DROP TABLE IF EXISTS logs")
    con.cursor().execute(upsert.LOGS_DDL_GENERIC)
    con.commit()
    con.close()

    df = fixtures.logs_df(spark)
    n_unique = df.dropDuplicates(LOGS_PK).count()
    host, port = pg["host"], pg["port"]
    factory = lambda: pgwire.connect(host=host, port=port)  # noqa: E731

    r1 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, paramstyle="format",
        parallel=False, exact_counts=True,
    )
    assert (r1.attempted, r1.inserted) == (n_unique, n_unique)
    r2 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, paramstyle="format",
        parallel=False, exact_counts=True,
    )
    assert (r2.attempted, r2.inserted) == (n_unique, 0)


def test_sink_copy_partitioned_target_live_postgres(spark, pg):
    """Server-side lever (VERDICT r3 #6): the COPY sink against a
    hash-partitioned logs table — DDL from logs_ddl_partitioned, sink
    code unchanged.  PostgreSQL routes the merge through the partitioned
    PK; counts stay exact and replay stays idempotent, which is the
    contract the bench variant (q_sink_pg_copy_part) relies on."""
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("DROP TABLE IF EXISTS logs")
    cur.execute(upsert.logs_ddl_partitioned(4))
    con.commit()
    # the parent really is partitioned (guards against silently running
    # the flat-table DDL)
    cur.execute(
        "SELECT COUNT(*) FROM pg_inherits WHERE inhparent = 'logs'::regclass"
    )
    assert cur.fetchone() == ("4",)
    con.close()

    df = fixtures.logs_df(spark).repartition(4)
    n_unique = df.dropDuplicates(LOGS_PK).count()
    host, port = pg["host"], pg["port"]
    factory = lambda: pgwire.connect(host=host, port=port)  # noqa: E731

    r1 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, parallel=True, method="copy"
    )
    assert (r1.attempted, r1.inserted) == (n_unique, n_unique)
    r2 = upsert.write_conflict_ignore(
        df, "logs", LOGS_PK, factory, parallel=True, method="copy"
    )
    assert (r2.attempted, r2.inserted) == (n_unique, 0)
    con = _connect(pg)
    cur = con.cursor()
    cur.execute("SELECT COUNT(*) FROM logs")
    assert cur.fetchone() == (str(n_unique),)
    # rows actually landed across partitions, not all in one
    cur.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT tableoid FROM logs) t"
    )
    assert int(cur.fetchone()[0]) > 1
    con.close()
