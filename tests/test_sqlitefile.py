"""SQLite file reader (operators/sqlitefile.py): the system SQLite C
library (via stdlib sqlite3 ``Connection.serialize()``) is the
synthesis twin — every fixture is written by the real engine and read
back by the from-scratch walker, exactly.  Covers page sizes, multi-
level b-trees, overflow chains, all three text encodings, the INTEGER
PRIMARY KEY rowid alias, typed boundaries, and truncation fuzz."""

from __future__ import annotations

import sqlite3

import numpy as np
import pytest

from evm_archive_spark.operators.sqlitefile import (
    SqliteError,
    is_sqlite,
    sqlite_rows,
    sqlite_tables,
    sqlite_to_text,
)


def _db(*ddl_and_rows, pragmas=()):
    con = sqlite3.connect(":memory:")
    for p in pragmas:
        con.execute(p)
    for stmt, rows in ddl_and_rows:
        con.execute(stmt)
        if rows:
            ph = ",".join("?" * len(rows[0]))
            table = stmt.split()[2].split("(")[0]
            con.executemany(
                f"INSERT INTO {table} VALUES ({ph})", rows)
    con.commit()
    return con.serialize()


def test_types_and_catalog():
    rows = [(k, f"row{k}", bytes([k % 256]) * (k % 40), k / 3.0)
            for k in range(300)]
    rows += [(None, None, None, None), (0, "", b"", 0.0)]
    b = _db(("CREATE TABLE t(a INTEGER, b TEXT, c BLOB, d REAL)",
             rows))
    assert is_sqlite(b)
    tabs = sqlite_tables(b)
    assert [(t["type"], t["name"]) for t in tabs] == [("table", "t")]
    assert "CREATE TABLE t" in tabs[0]["sql"]
    assert [tuple(v) for _r, v in sqlite_rows(b, "t")] == rows


def test_multilevel_btree_and_page_sizes():
    """Interior table pages (types 5/13) across page sizes — 512-byte
    pages force a 3+-level tree at 60k rows."""
    rows = [(k * 7 - 100_000, f"x{k % 977}") for k in range(60_000)]
    for ps in (512, 4096, 65536):
        b = _db(("CREATE TABLE t(a INTEGER, b TEXT)", rows),
                pragmas=(f"PRAGMA page_size={ps}",))
        got = [tuple(v) for _r, v in sqlite_rows(b, "t")]
        assert got == rows, ps


def test_overflow_chains():
    """Payloads past the local-size split walk the 4-byte next-page
    chains; a multi-megabyte blob spans hundreds of overflow pages."""
    blob = bytes(range(256)) * 4000
    text = "téxt" * 30_000
    b = _db(("CREATE TABLE big(x BLOB, y TEXT)", [(blob, text)]),
            pragmas=("PRAGMA page_size=512",))
    (got,) = [v for _r, v in sqlite_rows(b, "big")]
    assert got == [blob, text]


def test_encodings():
    for pragma, want in [
        ("PRAGMA encoding='UTF-8'", "héllo wörld ☃"),
        ("PRAGMA encoding='UTF-16le'", "héllo wörld ☃"),
        ("PRAGMA encoding='UTF-16be'", "ünïcode ☃"),
    ]:
        b = _db(("CREATE TABLE s(v TEXT)", [(want,), ("plain",)]),
                pragmas=(pragma,))
        assert [v[0] for _r, v in sqlite_rows(b, "s")] == [
            want, "plain"], pragma


def test_integer_primary_key_alias():
    """An INTEGER PRIMARY KEY column stores NULL and takes the rowid
    (the documented alias rule); DESC-ordered ipk is NOT an alias."""
    rows = [(k * 10, f"v{k}") for k in range(50)]
    b = _db(("CREATE TABLE u(id INTEGER PRIMARY KEY, v TEXT)", rows))
    assert [tuple(v) for _r, v in sqlite_rows(b, "u")] == rows
    # quoted / bracketed column names
    b = _db(('CREATE TABLE q("my id" INTEGER PRIMARY KEY, v TEXT)',
             rows[:5]))
    assert [tuple(v) for _r, v in sqlite_rows(b, "q")] == rows[:5]
    # DESC ipk: values live in the record, not the rowid
    b = _db(("CREATE TABLE d(id INTEGER PRIMARY KEY DESC, v TEXT)",
             rows[:5]))
    assert [tuple(v) for _r, v in sqlite_rows(b, "d")] == rows[:5]


def test_deletes_and_freelist():
    """Deleted rows leave freeblocks and freelist pages the b-tree
    walk must skip naturally; surviving rows read back exactly."""
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE t(a INTEGER, b TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(k, f"r{k}" * 9) for k in range(5000)])
    con.execute("DELETE FROM t WHERE a % 3 = 0")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(10_000 + k, "new") for k in range(100)])
    con.commit()
    want = [tuple(r) for r in con.execute(
        "SELECT a, b FROM t ORDER BY rowid")]
    got = [tuple(v) for _r, v in sqlite_rows(con.serialize(), "t")]
    assert got == want


def test_int_float_extremes():
    vals = [(1.5, -1), (0.0, 0), (-2.75, 1),
            (3.141592653589793, -(1 << 63)),
            (None, (1 << 63) - 1), (float("inf"), 2),
            (-0.0, 127), (1e-300, 128), (2.0 ** 52, -129)]
    b = _db(("CREATE TABLE f(a REAL, b INT)", vals))
    assert [tuple(v) for _r, v in sqlite_rows(b, "f")] == vals


def test_typed_boundaries_and_fuzz():
    b = _db(("CREATE TABLE t(a INT)", [(1,), (2,)]))
    with pytest.raises(SqliteError, match="no such table"):
        list(sqlite_rows(b, "nope"))
    with pytest.raises(SqliteError, match="not a SQLite"):
        sqlite_tables(b"garbage" * 100)
    # WITHOUT ROWID = index b-tree, typed
    con = sqlite3.connect(":memory:")
    con.execute(
        "CREATE TABLE w(k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    con.execute("INSERT INTO w VALUES ('a', 1)")
    con.commit()
    with pytest.raises(SqliteError, match="WITHOUT ROWID"):
        list(sqlite_rows(con.serialize(), "w"))
    # truncation fuzz: typed, never a crash or a silent short read
    big = _db(("CREATE TABLE t(a INTEGER, b TEXT)",
               [(k, f"x{k}" * 20) for k in range(2000)]),
              pragmas=("PRAGMA page_size=512",))
    want = [tuple(v) for _r, v in sqlite_rows(big, "t")]
    for cut in range(512, len(big), 4999):
        try:
            got = [tuple(v) for _r, v in sqlite_rows(big[:cut], "t")]
            assert got == want  # only if the cut spared every page
        except SqliteError:
            pass


def test_to_text_linearization():
    rng = np.random.default_rng(151)
    b = _db(("CREATE TABLE a(x INT, y TEXT)", [(1, "one"), (2, "two")]),
            ("CREATE TABLE b(z BLOB)", [(bytes(rng.integers(
                0, 256, 10, dtype=np.uint8)),)]))
    text = sqlite_to_text(b)
    assert "a:" in text and "b:" in text
    assert "1\tone" in text and "2\ttwo" in text
    assert "<blob:10>" in text
