"""SQLite database file reader — from scratch, stdlib only.

Training corpora meet ``.sqlite``/``.db`` payloads constantly (app
exports, scraped datasets, research artifacts).  This module walks the
public SQLite file format (sqlite.org/fileformat2.html): the 100-byte
header, table b-trees (interior page 5 / leaf page 13), cell payloads
with overflow-page chains, and the record serial-type encoding — then
linearizes every user table to text (the xlsx/tabular contract: one
line per row, values tab-joined, tables joined by a blank line, each
table headed by its name).

The fixture writer is deliberately NOT from scratch: gates and tests
build REAL databases with the stdlib ``sqlite3`` module
(``Connection.serialize()``), so the reader is always checked against
the canonical writer.

WITHOUT ROWID tables (r12) store their rows in index b-trees (page
types 2/10, entries in BOTH interior and leaf cells, index-page
overflow threshold) with the PRIMARY KEY columns first; the reader
walks them in key order and restores the declared column order from
the CREATE TABLE text.

Scope boundaries (typed ``SqliteError``, never a crash):
- WAL-side content is invisible by design (a serialized/checkpointed
  database carries everything in the main file).

Reference parity note: the reference (SummaryDev/evm-archive) has no
document surface; this extends the training-pipeline extraction lane.
"""

from __future__ import annotations

import re
import struct

from .codecerrors import guard

MAGIC = b"SQLite format 3\x00"
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024   # per-cell assembled payload cap
MAX_PAGES_WALK = 1 << 20               # b-tree/overflow loop safety


class SqliteError(Exception):
    """Malformed or out-of-scope SQLite payload."""


def is_sqlite(b: bytes) -> bool:
    return b[:16] == MAGIC


def _varint(b: bytes, i: int) -> tuple[int, int]:
    """SQLite big-endian varint at offset ``i`` -> (value, next offset)."""
    v = 0
    for k in range(8):
        if i + k >= len(b):
            raise SqliteError("truncated varint")
        byte = b[i + k]
        v = (v << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return v, i + k + 1
    if i + 8 >= len(b):
        raise SqliteError("truncated varint")
    return (v << 8) | b[i + 8], i + 9


def _serial_size(t: int) -> int:
    if t <= 4:
        return t
    if t == 5:
        return 6
    if t in (6, 7):
        return 8
    if t in (8, 9):
        return 0
    if t >= 12:
        return (t - 12) // 2 if t % 2 == 0 else (t - 13) // 2
    raise SqliteError(f"reserved serial type {t}")


class _Db:
    def __init__(self, b: bytes):
        if not is_sqlite(b):
            raise SqliteError("not a SQLite database")
        if len(b) < 100:
            raise SqliteError("truncated header")
        (psz,) = struct.unpack_from(">H", b, 16)
        self.page_size = 65536 if psz == 1 else psz
        if self.page_size < 512 or self.page_size & (self.page_size - 1):
            raise SqliteError(f"bad page size {psz}")
        self.usable = self.page_size - b[20]
        (enc,) = struct.unpack_from(">I", b, 56)
        self.encoding = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}.get(enc)
        if self.encoding is None:
            # a freshly-created empty db may carry 0; default utf-8
            self.encoding = "utf-8"
        self.b = b

    def page(self, n: int) -> bytes:
        off = (n - 1) * self.page_size
        if n < 1 or off + self.page_size > len(self.b):
            raise SqliteError(f"page {n} out of range")
        return self.b[off:off + self.page_size]

    def _payload(self, page: bytes, i: int, plen: int,
                 index_page: bool = False) -> bytes:
        """Assemble a cell payload, following the overflow chain.
        Index pages spill at X = ((U-12)*64/255)-23 instead of the
        table-leaf U-35 (fileformat2 §1.6)."""
        if plen > MAX_PAYLOAD_BYTES:
            raise SqliteError("payload exceeds the assembly cap")
        u = self.usable
        x = ((u - 12) * 64) // 255 - 23 if index_page else u - 35
        if plen <= x:
            if i + plen > len(page):
                raise SqliteError("local payload out of page")
            return page[i:i + plen]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (plen - m) % (u - 4)
        local = k if k <= x else m
        if i + local + 4 > len(page):
            raise SqliteError("overflow cell out of page")
        out = bytearray(page[i:i + local])
        (nxt,) = struct.unpack_from(">I", page, i + local)
        hops = 0
        # stop as soon as plen bytes are assembled — a cyclic chain (two
        # overflow pages pointing at each other) would otherwise append
        # usable-4 bytes per hop up to the hop cap (~64 GB at 64 KB pages)
        while nxt and len(out) < plen:
            hops += 1
            if hops > MAX_PAGES_WALK:
                raise SqliteError("overflow chain loop")
            op = self.page(nxt)
            (nxt,) = struct.unpack_from(">I", op, 0)
            out += op[4:u]
        if len(out) < plen:
            raise SqliteError("overflow chain shorter than payload")
        return bytes(out[:plen])

    def _record(self, payload: bytes) -> list:
        hlen, i = _varint(payload, 0)
        if hlen > len(payload):
            raise SqliteError("record header beyond payload")
        types = []
        while i < hlen:
            t, i = _varint(payload, i)
            types.append(t)
        vals = []
        for t in types:
            n = _serial_size(t)
            raw = payload[i:i + n]
            if len(raw) < n:
                raise SqliteError("record value truncated")
            i += n
            if t == 0:
                vals.append(None)
            elif 1 <= t <= 6:
                vals.append(int.from_bytes(raw, "big", signed=True))
            elif t == 7:
                vals.append(struct.unpack(">d", raw)[0])
            elif t == 8:
                vals.append(0)
            elif t == 9:
                vals.append(1)
            elif t % 2 == 0:
                vals.append(raw)                      # blob
            else:
                vals.append(raw.decode(self.encoding, "replace"))
        return vals

    def table_rows(self, rootpage: int):
        """Walk a table b-tree in rowid order, yielding (rowid, values)."""
        # iterative DFS preserving left-to-right (rowid) order
        order: list[int] = []
        visited = 0
        expand = [rootpage]
        while expand:
            pno = expand.pop()
            visited += 1
            if visited > MAX_PAGES_WALK:
                raise SqliteError("b-tree walk page cap exceeded")
            pg = self.page(pno)
            hoff = 100 if pno == 1 else 0
            ptype = pg[hoff]
            (ncell,) = struct.unpack_from(">H", pg, hoff + 3)
            if ptype == 5:                            # interior table
                (rightmost,) = struct.unpack_from(">I", pg, hoff + 8)
                kids = []
                for c in range(ncell):
                    (coff,) = struct.unpack_from(
                        ">H", pg, hoff + 12 + 2 * c
                    )
                    (child,) = struct.unpack_from(">I", pg, coff)
                    kids.append(child)
                kids.append(rightmost)
                expand.extend(reversed(kids))         # keep left-first
            elif ptype == 13:                         # leaf table
                order.append(pno)
            elif ptype in (2, 10):
                raise SqliteError(
                    "index b-tree at table root (walk WITHOUT ROWID "
                    "tables through index_rows)"
                )
            else:
                raise SqliteError(f"unexpected page type {ptype}")
        for pno in order:
            pg = self.page(pno)
            hoff = 100 if pno == 1 else 0
            (ncell,) = struct.unpack_from(">H", pg, hoff + 3)
            for c in range(ncell):
                (coff,) = struct.unpack_from(">H", pg, hoff + 8 + 2 * c)
                plen, i = _varint(pg, coff)
                rowid, i = _varint(pg, i)
                yield rowid, self._record(self._payload(pg, i, plen))


    def index_rows(self, rootpage: int, _depth: int = 0,
                   _visits: list | None = None):
        """Walk an index b-tree IN ORDER, yielding each entry's record
        values.  WITHOUT ROWID tables store complete rows here —
        interior cells carry real entries too (each key appears once
        in the whole tree), so the walk interleaves children and
        cells.  A TOTAL page-visit cap (shared across the recursion,
        like table_rows') bounds crafted page DAGs — a small file
        whose interior pages all point at each other is otherwise
        exponential in the depth cap."""
        if _depth > 64:
            raise SqliteError("index b-tree deeper than cap")
        if _visits is None:
            _visits = [0]
        _visits[0] += 1
        if _visits[0] > MAX_PAGES_WALK:
            raise SqliteError("index b-tree walk page cap exceeded")
        pg = self.page(rootpage)
        hoff = 100 if rootpage == 1 else 0
        ptype = pg[hoff]
        (ncell,) = struct.unpack_from(">H", pg, hoff + 3)
        if ptype == 10:                               # leaf index
            for c in range(ncell):
                (coff,) = struct.unpack_from(">H", pg, hoff + 8 + 2 * c)
                plen, i = _varint(pg, coff)
                yield self._record(
                    self._payload(pg, i, plen, index_page=True))
            return
        if ptype != 2:                                # interior index
            raise SqliteError(f"unexpected index page type {ptype}")
        for c in range(ncell):
            (coff,) = struct.unpack_from(">H", pg, hoff + 12 + 2 * c)
            (child,) = struct.unpack_from(">I", pg, coff)
            yield from self.index_rows(child, _depth + 1, _visits)
            plen, i = _varint(pg, coff + 4)
            yield self._record(
                self._payload(pg, i, plen, index_page=True))
        (rightmost,) = struct.unpack_from(">I", pg, hoff + 8)
        yield from self.index_rows(rightmost, _depth + 1, _visits)


_IPK = re.compile(r"(?i)\bINTEGER\s+PRIMARY\s+KEY\b")
_WOR = re.compile(r"(?i)\bWITHOUT\s+ROWID\b")


def _split_cols(create_sql: str | None) -> list[str]:
    """The comma-separated items of the CREATE TABLE (...) list —
    column definitions AND table constraints, paren-depth aware."""
    if not create_sql:
        return []
    i = create_sql.find("(")
    if i < 0:
        return []
    depth, start, cols = 0, i + 1, []
    for j in range(i, len(create_sql)):
        ch = create_sql[j]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                cols.append(create_sql[start:j])
                break
        elif ch == "," and depth == 1:
            cols.append(create_sql[start:j])
            start = j + 1
    return cols


_CONSTRAINT_HEADS = ("PRIMARY", "UNIQUE", "CHECK", "FOREIGN",
                     "CONSTRAINT")


def _col_name(coldef: str) -> str:
    """First token of a column definition, unquoted/case-folded."""
    t = coldef.strip()
    if t[:1] in ("\"", "'", "`"):
        q = t[0]
        end = t.find(q, 1)
        return t[1:end if end > 0 else None].lower()
    if t[:1] == "[":
        end = t.find("]", 1)
        return t[1:end if end > 0 else None].lower()
    m = re.match(r"[^\s(]+", t)
    return (m.group(0) if m else t).lower()


def _ipk_index(create_sql: str | None) -> int | None:
    """Index of the INTEGER PRIMARY KEY column (its record value is
    NULL; the rowid IS the value), or None."""
    for idx, col in enumerate(_split_cols(create_sql)):
        head = col.strip().upper()
        if head.startswith(_CONSTRAINT_HEADS):
            continue                                  # table constraint
        if _IPK.search(col):
            return idx
    return None


_PK_LIST = re.compile(r"(?i)\bPRIMARY\s+KEY\s*\(([^)]*)\)")


def _wor_order(create_sql: str) -> list[int] | None:
    """For a WITHOUT ROWID table: the stored-record -> declared-order
    permutation.  The index b-tree key record holds the PRIMARY KEY
    columns first (in PK-clause order), then the remaining columns in
    declared order (fileformat2 §2.6).  None = unparseable (row kept
    in stored order)."""
    items = _split_cols(create_sql)
    names = []
    pk: list[str] = []
    for col in items:
        head = col.strip().upper()
        if head.startswith(_CONSTRAINT_HEADS):
            m = _PK_LIST.search(col)
            if m and head.startswith(("PRIMARY", "CONSTRAINT")):
                pk = [_col_name(c) for c in m.group(1).split(",")]
            continue
        names.append(_col_name(col))
        if not pk and _PK_LIST.search(col) is None \
                and re.search(r"(?i)\bPRIMARY\s+KEY\b", col):
            pk = [_col_name(col)]
    if not pk or not names:
        return None
    if any(c not in names for c in pk):
        return None
    rest = [n for n in names if n not in pk]
    stored = pk + rest
    try:
        return [stored.index(n) for n in names]
    except ValueError:
        return None


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    return str(v)


@guard(SqliteError)
def sqlite_tables(b: bytes) -> list[tuple[str, list[list]]]:
    """Parse a SQLite database -> ``[(table_name, rows)]`` for every
    user table (``sqlite_*`` internals, views, indexes skipped), rows
    in rowid order with INTEGER PRIMARY KEY columns materialized from
    the rowid; WITHOUT ROWID tables in primary-key order with the
    declared column order restored."""
    db = _Db(b)
    master = list(db.table_rows(1))
    tables = []
    for _rowid, rec in master:
        if len(rec) < 5 or rec[0] != "table":
            continue
        name, rootpage, sql = rec[1], rec[3], rec[4]
        if not isinstance(name, str) or name.startswith("sqlite_"):
            continue
        if not isinstance(rootpage, int) or rootpage < 1:
            continue                                  # virtual table
        sql_s = sql if isinstance(sql, str) else None
        # table options follow the last ')': WITHOUT ROWID and
        # STRICT may appear in either order
        if sql_s and _WOR.search(sql_s.rsplit(")", 1)[-1]):
            # WITHOUT ROWID (r12): rows live in an index b-tree, PK
            # columns first; restore declared order (key order kept)
            perm = _wor_order(sql_s)
            rows = []
            for vals in db.index_rows(rootpage):
                if perm is not None:
                    # ALTER TABLE ADD COLUMN leaves old rows short:
                    # pad with NULLs so every row gets the SAME
                    # declared-order permutation (ADVICE r12)
                    if len(vals) < len(perm):
                        vals = list(vals) + \
                            [None] * (len(perm) - len(vals))
                    vals = [vals[i] for i in perm] + \
                        list(vals[len(perm):])
                rows.append(vals)
            tables.append((name, rows))
            continue
        ipk = _ipk_index(sql_s)
        rows = []
        for rowid, vals in db.table_rows(rootpage):
            if ipk is not None and ipk < len(vals) and vals[ipk] is None:
                vals = list(vals)
                vals[ipk] = rowid
            rows.append(vals)
        tables.append((name, rows))
    return tables


@guard(SqliteError)
def sqlite_to_text(b: bytes) -> str:
    """Linearize every user table: first line the table name, then one
    tab-joined line per row (rowid order); tables joined by a blank
    line."""
    out = []
    for name, rows in sqlite_tables(b):
        lines = [name]
        lines.extend("\t".join(_fmt(v) for v in vals) for vals in rows)
        out.append("\n".join(lines))
    return "\n\n".join(out)
