"""SQLite file reader: round trips against the canonical stdlib
writer (serial types, IPK rowid aliasing, overflow chains, interior
pages, UTF-16 encodings), typed scope boundaries, truncation fuzz, and
the document_extract routing."""

from __future__ import annotations

import sqlite3

import pytest

from evm_archive_spark.operators.sqlitefile import (
    SqliteError,
    _ipk_index,
    is_sqlite,
    sqlite_tables,
    sqlite_to_text,
)


def _db(*stmts: tuple[str, tuple] | str, pragmas: list[str] = ()) -> bytes:
    c = sqlite3.connect(":memory:")
    for p in pragmas:
        c.execute(p)
    for s in stmts:
        if isinstance(s, tuple):
            c.execute(*s)
        else:
            c.execute(s)
    c.commit()
    b = c.serialize()
    c.close()
    return b


def test_types_ipk_and_linearization():
    b = _db(
        "create table docs (id INTEGER PRIMARY KEY, body TEXT, "
        "n INTEGER, f REAL, bl BLOB)",
        ("insert into docs values (1, 'hello \xe9中', 42, 3.5, "
         "x'deadbeef')",),
        "insert into docs values (2, NULL, -7, NULL, NULL)",
        "create table other (a TEXT)",
        "insert into other values ('solo')",
    )
    assert is_sqlite(b) and not is_sqlite(b"something else")
    assert sqlite_to_text(b) == (
        "docs\n1\thello \xe9中\t42\t3.5\tdeadbeef\n2\t\t-7\t\t"
        "\n\nother\nsolo"
    )


def test_overflow_chain_and_interior_pages():
    big = "xyz" * 5000                       # >> 512-byte pages
    b = _db(
        "create table big (t TEXT)",
        ("insert into big values (?)", (big,)),
        pragmas=["PRAGMA page_size=512"],
    )
    assert sqlite_tables(b)[0][1][0][0] == big

    c = sqlite3.connect(":memory:")
    c.execute("PRAGMA page_size=512")
    c.execute("create table many (v TEXT)")
    for i in range(3000):
        c.execute("insert into many values (?)", (f"row-{i:05d}",))
    c.commit()
    vals = [r[0] for r in sqlite_tables(c.serialize())[0][1]]
    c.close()
    # rowid order out of a multi-level b-tree (interior pages walked
    # left-to-right)
    assert vals == [f"row-{i:05d}" for i in range(3000)]


def test_utf16_encodings():
    for enc in ("UTF-16le", "UTF-16be"):
        b = _db(
            "create table u (s TEXT)",
            "insert into u values ('utf sixteen \xe9')",
            pragmas=[f"PRAGMA encoding='{enc}'"],
        )
        assert sqlite_tables(b)[0][1][0][0] == "utf sixteen \xe9"


def test_ipk_detection_skips_table_constraints():
    assert _ipk_index(
        "CREATE TABLE t (a TEXT, b integer primary key, c)"
    ) == 1
    assert _ipk_index(
        "CREATE TABLE t (a INT, b TEXT, PRIMARY KEY (a))"
    ) is None
    assert _ipk_index("CREATE TABLE t (x INTEGER, y INTEGER)") is None
    assert _ipk_index(None) is None
    # composite-default column with inner parens doesn't derail the split
    assert _ipk_index(
        "CREATE TABLE t (a TEXT DEFAULT ('x,y'), id INTEGER PRIMARY KEY)"
    ) == 1


def test_scope_boundaries_and_fuzz():
    with pytest.raises(SqliteError):
        sqlite_to_text(b"not a database at all")
    # internal sqlite_* tables and indexes are skipped, not surfaced
    b = _db(
        "create table t (a TEXT UNIQUE)",
        "insert into t values ('v')",
    )
    assert sqlite_to_text(b) == "t\nv"
    good = _db(
        "create table docs (id INTEGER PRIMARY KEY, body TEXT)",
        "insert into docs values (1, 'text')",
    )
    for cut in range(0, len(good), 137):
        try:
            sqlite_to_text(good[:cut])
        except SqliteError:
            pass


def test_empty_table_and_view_skipped():
    b = _db(
        "create table empty (a TEXT)",
        "create table filled (a TEXT)",
        "insert into filled values ('x')",
        "create view v as select * from filled",
    )
    assert sqlite_to_text(b) == "empty\n\nfilled\nx"


def _pooled_document_extract_routes_sqlite(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    db = _db(
        "create table docs (id INTEGER PRIMARY KEY, body TEXT)",
        "insert into docs values (1, 'row text')",
    )
    rows = pd.DataFrame(
        {"media_id": [0], "payload": [bytearray(db)]}
    )
    out = document_extract(spark.createDataFrame(rows)).collect()[0]
    assert out["format"] == "sqlite"
    assert out["text"] == "docs\n1\trow text"

    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(db)],
                "mime": ["application/vnd.sqlite3"],
            }
        )
    )
    got = document_extract(df2, mime_col="mime").collect()[0]
    assert got["format"] == "sqlite"


# (routing check pooled into test_officedoc.test_extract_routing_pooled)


def test_cyclic_overflow_chain_is_bounded():
    # a crafted cyclic overflow chain (pages 2 and 3 pointing at each
    # other) used to append usable-4 bytes per hop for MAX_PAGES_WALK
    # hops (~0.5 GB at 512-byte pages, ~64 GB at 64 KB) before the hop
    # cap fired; assembly must stop the moment plen bytes are gathered
    import struct
    import time

    from evm_archive_spark.operators.sqlitefile import _Db

    page_size = 512
    header = bytearray(page_size)
    header[0:16] = b"SQLite format 3\x00"
    struct.pack_into(">H", header, 16, page_size)
    header[20] = 0                                   # reserved bytes
    struct.pack_into(">I", header, 56, 1)            # utf-8
    page2 = struct.pack(">I", 3) + b"b" * (page_size - 4)
    page3 = struct.pack(">I", 2) + b"c" * (page_size - 4)
    db = _Db(bytes(header) + page2 + page3)

    plen = 100_000
    # a fake leaf-cell region: local payload bytes then the 4-byte
    # pointer into the cycle (local split math: u=512 -> local=432)
    page = b"a" * 432 + struct.pack(">I", 2)
    t0 = time.monotonic()
    out = db._payload(page, 0, plen)
    assert len(out) == plen
    assert time.monotonic() - t0 < 10


def test_without_rowid_tables():
    """WITHOUT ROWID rows (r12) come out of the index b-tree in key
    order with the DECLARED column order restored — single and
    composite primary keys, interior index pages, and index-page
    overflow cells, all against the canonical stdlib writer."""
    con = sqlite3.connect(":memory:")
    con.executescript(
        "CREATE TABLE kv (k TEXT PRIMARY KEY, v INTEGER, note TEXT) "
        "WITHOUT ROWID;"
        "CREATE TABLE comp (a INTEGER, b TEXT, c REAL, "
        "PRIMARY KEY (b, a)) WITHOUT ROWID;"
        "CREATE TABLE big (k INTEGER PRIMARY KEY, body TEXT) "
        "WITHOUT ROWID;"
    )
    for i in range(400):                       # forces interior pages
        con.execute("INSERT INTO kv VALUES (?,?,?)",
                    (f"key{i:04d}", i * 7, "z" * (i % 40)))
        con.execute("INSERT INTO comp VALUES (?,?,?)",
                    (i, f"b{i % 13}", i / 3))
    # an 80 KB value overflows any page size in the INDEX tree
    con.execute("INSERT INTO big VALUES (7, ?)", ("x" * 80000,))
    con.commit()
    tabs = dict(sqlite_tables(bytes(con.serialize())))
    assert [r for r in tabs["kv"][:2]] == [
        ["key0000", 0, ""], ["key0001", 7, "z"]]
    assert tabs["kv"] == [list(r) for r in con.execute(
        "SELECT k, v, note FROM kv ORDER BY k")]
    assert tabs["comp"] == [list(r) for r in con.execute(
        "SELECT a, b, c FROM comp ORDER BY b, a")]
    assert tabs["big"] == [[7, "x" * 80000]]
    # table options in either order (STRICT before/after WITHOUT ROWID)
    con3 = sqlite3.connect(":memory:")
    con3.executescript(
        "CREATE TABLE s1 (k TEXT PRIMARY KEY, v INT) "
        "WITHOUT ROWID, STRICT;"
        "CREATE TABLE s2 (k TEXT PRIMARY KEY, v INT) "
        "STRICT, WITHOUT ROWID;"
        "INSERT INTO s1 VALUES ('b', 1), ('a', 2);"
        "INSERT INTO s2 VALUES ('b', 3), ('a', 4);")
    con3.commit()
    t3 = dict(sqlite_tables(bytes(con3.serialize())))
    assert t3["s1"] == [["a", 2], ["b", 1]]
    assert t3["s2"] == [["a", 4], ["b", 3]]
    # quoted column names in the PK clause
    con2 = sqlite3.connect(":memory:")
    con2.executescript(
        'CREATE TABLE q ("the key" TEXT, [val] INTEGER, '
        'PRIMARY KEY ("the key")) WITHOUT ROWID;')
    con2.execute("INSERT INTO q VALUES ('a', 5)")
    con2.commit()
    assert dict(sqlite_tables(bytes(con2.serialize())))["q"] == \
        [["a", 5]]


def test_index_walk_page_dag_is_bounded(monkeypatch):
    """A crafted WITHOUT ROWID index whose interior pages form a
    small DAG with high fan-out must hit the TOTAL page-visit cap
    (review r12): depth stays under the depth cap while visits grow
    exponentially, so a per-call depth limit alone is not enough."""
    import struct as _st
    import time

    from evm_archive_spark.operators.sqlitefile import MAGIC, _Db

    page = 512
    npages = 10
    buf = bytearray(page * (npages + 1))
    hdr = bytearray(100)
    hdr[0:16] = MAGIC
    _st.pack_into(">H", hdr, 16, page)
    _st.pack_into(">I", hdr, 56, 1)
    buf[0:100] = hdr
    for pno in range(2, npages):          # interior chain, fanout 8
        off = (pno - 1) * page
        buf[off] = 2
        _st.pack_into(">H", buf, off + 3, 8)
        _st.pack_into(">I", buf, off + 8, pno + 1)
        cell_area = off + 12 + 16
        for c in range(8):
            coff = cell_area + c * 10
            _st.pack_into(">H", buf, off + 12 + 2 * c, coff - off)
            _st.pack_into(">I", buf, coff, pno + 1)
            buf[coff + 4] = 1             # payload len 1
            buf[coff + 5] = 1             # record header: empty row
    buf[(npages - 1) * page] = 10         # terminal leaf, 0 cells
    import evm_archive_spark.operators.sqlitefile as sq

    monkeypatch.setattr(sq, "MAX_PAGES_WALK", 10_000)  # fast fire
    db = _Db(bytes(buf))
    t0 = time.time()
    with pytest.raises(SqliteError, match="page cap"):
        list(db.index_rows(2))
    assert time.time() - t0 < 10
    # a pure self-loop hits the depth cap instead
    loop = bytearray(buf)
    off = page
    _st.pack_into(">I", loop, off + 8, 2)
    cell_area = off + 12 + 16
    for c in range(8):
        coff = cell_area + c * 10
        _st.pack_into(">I", loop, coff, 2)
    with pytest.raises(SqliteError, match="deeper than cap"):
        list(_Db(bytes(loop)).index_rows(2))


def test_without_rowid_alter_table_short_records():
    """ADVICE r12: ALTER TABLE ADD COLUMN leaves pre-existing WITHOUT
    ROWID rows with short stored records; they must be NULL-padded and
    get the SAME declared-order permutation as full rows (not left in
    stored PK-first order)."""
    con = sqlite3.connect(":memory:")
    # PK is NOT the first declared column, so the permutation is
    # non-trivial and a skipped permutation is visible
    con.executescript(
        "CREATE TABLE w (a INTEGER, b TEXT PRIMARY KEY) WITHOUT ROWID;"
        "INSERT INTO w VALUES (1, 'x'), (2, 'y');")
    con.commit()
    con.execute("ALTER TABLE w ADD COLUMN c INTEGER")
    con.execute("INSERT INTO w VALUES (3, 'z', 30)")
    con.commit()
    tabs = dict(sqlite_tables(bytes(con.serialize())))
    assert tabs["w"] == [list(r) for r in con.execute(
        "SELECT a, b, c FROM w ORDER BY b")]
    assert tabs["w"] == [[1, "x", None], [2, "y", None], [3, "z", 30]]
