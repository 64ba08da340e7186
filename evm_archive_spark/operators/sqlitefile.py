"""SQLite database FILE reader — from scratch, stdlib only (public
format: sqlite.org/fileformat2.html).

``.sqlite``/``.db`` files are everywhere in web crawls (browser
profiles, app bundles, ML metadata stores), and feeding untrusted
bytes to the system SQLite C library is exactly what a hardened
extraction lane avoids — so this walks the file format directly:

- **header** (100 bytes): magic, page size (u16 BE, 1 => 65536),
  reserved-bytes-per-page (honored in the usable size), page count,
  text encoding (UTF-8 / UTF-16le / UTF-16be — all three decoded);
- **table b-trees**: interior (type 5: left-child + rowid key cells,
  rightmost pointer) and leaf (type 13: payload-length + rowid +
  record) pages, cells via the u16 pointer array; page 1 carries the
  ``sqlite_master`` root behind the file header;
- **overflow chains**: the spec's local-payload split (X = U - 35,
  M = ((U - 12) * 32 / 255) - 23, K = M + (P - M) % (U - 4)) with
  4-byte next-page chains, walked with a visited-set cycle guard;
- **records**: varint header, serial types (NULL / 1-8-byte ints /
  float64 BE / constants 0 and 1 / blob and text with the (N-12)/2
  length rule);
- **rowid aliases**: a column declared ``INTEGER PRIMARY KEY`` stores
  NULL in the record and takes the cell's rowid — detected from the
  stored CREATE TABLE sql (the documented alias rule).

Scope (typed, never silently wrong): WITHOUT ROWID tables (index
b-trees), encrypted files, and pages outside the declared page count
raise ``SqliteError``.  Freelist/ptrmap pages are never referenced by
the b-tree walk, so auto-vacuum files read naturally.

The synthesis twin is the system SQLite itself via the stdlib
``sqlite3`` module (``Connection.serialize()``) — a cross-pin in both
directions: stdlib-written files decode here, and pytest drives
randomized schemas/values through both readers.

Reference parity note: the reference (SummaryDev/evm-archive) stores
payloads as opaque bytea; this extends the training-pipeline
extraction lane (document/container decode).  Placement: per-payload
work inside mapInPandas Arrow batches (the codec boundary).
"""

from __future__ import annotations

import re
import struct
from typing import Iterator

MAGIC = b"SQLite format 3\x00"

MAX_DB_PAGES = 1 << 22                 # 4M pages (cycle/bomb guard)
MAX_PAYLOAD = 256 * 1024 * 1024


class SqliteError(ValueError):
    """Malformed or out-of-scope SQLite payload."""


def is_sqlite(b: bytes) -> bool:
    return b[:16] == MAGIC and len(b) >= 512


def _varint(b: bytes, i: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups; the 9th
    byte contributes all 8 bits.  Returns (value, next offset)."""
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
    v = (v << 8) | b[i + 8]
    if v >= 1 << 63:
        v -= 1 << 64
    return v, i + 9


class _Db:
    def __init__(self, b: bytes):
        if not is_sqlite(b):
            raise SqliteError("not a SQLite payload")
        (self.page_size,) = struct.unpack_from(">H", b, 16)
        if self.page_size == 1:
            self.page_size = 65536
        if self.page_size < 512 or self.page_size & (self.page_size - 1):
            raise SqliteError(f"bad page size {self.page_size}")
        self.reserved = b[20]
        self.usable = self.page_size - self.reserved
        if self.usable < 480:
            raise SqliteError("usable page size under the 480 minimum")
        (self.n_pages,) = struct.unpack_from(">I", b, 28)
        enc = struct.unpack_from(">I", b, 56)[0]
        # a freshly created db may have encoding 0 before any table
        self.encoding = {0: "utf-8", 1: "utf-8", 2: "utf-16-le",
                         3: "utf-16-be"}.get(enc)
        if self.encoding is None:
            raise SqliteError(f"unknown text encoding {enc}")
        # the in-header page count is authoritative since 3.7.0; for
        # older writers fall back to the file length
        if self.n_pages == 0:
            self.n_pages = len(b) // self.page_size
        if self.n_pages > MAX_DB_PAGES:
            raise SqliteError("page count over cap")
        if len(b) < self.n_pages * self.page_size:
            raise SqliteError("payload shorter than declared pages")
        self.b = b

    def page(self, n: int) -> tuple[bytes, int]:
        """(page bytes, header offset within page) for page number n
        (1-based; page 1's b-tree header sits behind the 100-byte
        file header)."""
        if n < 1 or n > self.n_pages:
            raise SqliteError(f"page {n} out of range")
        off = (n - 1) * self.page_size
        return self.b[off:off + self.page_size], 100 if n == 1 else 0

    def _payload(self, page: bytes, i: int, plen: int,
                 index_page: bool) -> bytes:
        """Cell payload starting at ``i``, following the overflow
        chain when the spec's local-size computation says it spills."""
        u = self.usable
        x = (((u - 12) * 64 // 255) - 23) if index_page else u - 35
        if plen <= x:
            if i + plen > len(page):
                raise SqliteError("cell payload overruns page")
            return page[i:i + plen]
        m = ((u - 12) * 32 // 255) - 23
        k = m + (plen - m) % (u - 4)
        local = k if k <= x else m
        if i + local + 4 > len(page):
            raise SqliteError("cell payload overruns page")
        out = bytearray(page[i:i + local])
        (nxt,) = struct.unpack_from(">I", page, i + local)
        seen = set()
        while nxt:
            if nxt in seen or len(seen) > MAX_DB_PAGES:
                raise SqliteError("overflow chain cycles")
            seen.add(nxt)
            op, _ = self.page(nxt)
            (nxt,) = struct.unpack_from(">I", op, 0)
            out += op[4:4 + min(plen - len(out), self.usable - 4)]
            if len(out) > MAX_PAYLOAD:
                raise SqliteError("payload over cap")
        if len(out) < plen:
            raise SqliteError("overflow chain shorter than payload")
        return bytes(out[:plen])

    def _record(self, payload: bytes) -> list:
        hlen, i = _varint(payload, 0)
        if hlen > len(payload):
            raise SqliteError("record header overruns payload")
        types = []
        while i < hlen:
            t, i = _varint(payload, i)
            types.append(t)
        vals = []
        j = hlen
        for t in types:
            if t == 0:
                vals.append(None)
            elif 1 <= t <= 6:
                n = (1, 2, 3, 4, 6, 8)[t - 1]
                if j + n > len(payload):
                    raise SqliteError("record value overruns payload")
                v = int.from_bytes(payload[j:j + n], "big", signed=True)
                vals.append(v)
                j += n
            elif t == 7:
                if j + 8 > len(payload):
                    raise SqliteError("record value overruns payload")
                vals.append(struct.unpack_from(">d", payload, j)[0])
                j += 8
            elif t in (8, 9):
                vals.append(t - 8)
            elif t >= 12:
                n = (t - 12) // 2
                if j + n > len(payload):
                    raise SqliteError("record value overruns payload")
                raw = payload[j:j + n]
                if t & 1:                        # odd = text
                    vals.append(raw.decode(self.encoding, "replace"))
                else:
                    vals.append(raw)
                j += n
            else:
                raise SqliteError(f"reserved serial type {t}")
        return vals

    def table_rows(self, root: int) -> Iterator[tuple[int, list]]:
        """Walk a table b-tree depth-first: (rowid, values) per row."""
        seen: set[int] = set()

        def walk(pg: int) -> Iterator[tuple[int, list]]:
            if pg in seen or len(seen) > MAX_DB_PAGES:
                raise SqliteError("b-tree cycles or over cap")
            seen.add(pg)
            page, h = self.page(pg)
            ptype = page[h]
            if ptype in (2, 10):
                raise SqliteError(
                    "index b-tree where a table was expected "
                    "(WITHOUT ROWID tables are out of scope)")
            if ptype not in (5, 13):
                raise SqliteError(f"bad b-tree page type {ptype}")
            (ncell,) = struct.unpack_from(">H", page, h + 3)
            interior = ptype == 5
            cp0 = h + (12 if interior else 8)
            if cp0 + 2 * ncell > len(page):
                raise SqliteError("cell pointer array overruns page")
            ptrs = struct.unpack_from(f">{ncell}H", page, cp0)
            if interior:
                for p in ptrs:
                    if p + 4 > len(page):
                        raise SqliteError("interior cell overruns page")
                    (child,) = struct.unpack_from(">I", page, p)
                    yield from walk(child)
                (right,) = struct.unpack_from(">I", page, h + 8)
                yield from walk(right)
                return
            for p in ptrs:
                plen, i = _varint(page, p)
                rowid, i = _varint(page, i)
                if plen < 0 or plen > MAX_PAYLOAD:
                    raise SqliteError("cell payload length out of range")
                payload = self._payload(page, i, plen, index_page=False)
                yield rowid, self._record(payload)

        yield from walk(root)


_IPK_RE = re.compile(
    r'[(,]\s*(?:"([^"]+)"|\[([^\]]+)\]|`([^`]+)`|(\w+))\s+INTEGER\s+'
    r'PRIMARY\s+KEY(?!\s+DESC)', re.IGNORECASE | re.DOTALL)


def _ipk_index(sql: str | None) -> int | None:
    """Column index of the INTEGER PRIMARY KEY rowid alias, if the
    stored CREATE TABLE declares one (ASC/plain only — a DESC ipk is
    NOT an alias, per the documented rule)."""
    if not sql:
        return None
    m = _IPK_RE.search(sql)
    if not m:
        return None
    col = next(g for g in m.groups() if g)
    body = sql[sql.index("("):m.start() + 1]
    # count column definitions before the match: commas at depth 1
    depth = 0
    idx = 0
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 1:
            idx += 1
    del col
    return idx


def sqlite_tables(b: bytes) -> list[dict]:
    """The ``sqlite_master`` catalog: one dict (type, name, tbl_name,
    rootpage, sql) per schema object."""
    db = _Db(b)
    out = []
    for _rowid, vals in db.table_rows(1):
        if len(vals) < 5:
            raise SqliteError("malformed sqlite_master row")
        out.append({
            "type": vals[0], "name": vals[1], "tbl_name": vals[2],
            "rootpage": vals[3], "sql": vals[4],
        })
    return out


def sqlite_rows(b: bytes, table: str) -> Iterator[tuple[int, list]]:
    """Yield ``(rowid, values)`` for every row of ``table``, with the
    INTEGER PRIMARY KEY alias substituted back into its column (it is
    stored as NULL; the rowid IS the value)."""
    db = _Db(b)
    meta = None
    for _rowid, vals in db.table_rows(1):
        if vals[0] == "table" and vals[1] == table:
            meta = vals
            break
    if meta is None:
        raise SqliteError(f"no such table {table!r}")
    root, sql = meta[3], meta[4]
    if isinstance(sql, str) and re.search(
            r"WITHOUT\s+ROWID\s*$", sql.strip(), re.IGNORECASE):
        raise SqliteError("WITHOUT ROWID tables are out of scope")
    if not isinstance(root, int) or root < 1:
        raise SqliteError("bad rootpage in sqlite_master")
    ipk = _ipk_index(sql if isinstance(sql, str) else None)
    for rowid, vals in db.table_rows(root):
        if ipk is not None and ipk < len(vals) and vals[ipk] is None:
            vals = list(vals)
            vals[ipk] = rowid
        yield rowid, vals


def sqlite_to_text(b: bytes, max_rows_per_table: int = 10_000) -> str:
    """Linearize a database for the text-extraction lane: per rowid
    table, ``name:`` then tab-joined rows (NULL -> '', blob ->
    ``<blob:n>``), blank line between tables.  Out-of-scope tables
    (WITHOUT ROWID) render as a marker instead of failing the whole
    document."""
    parts: list[str] = []
    for t in sqlite_tables(b):
        if t["type"] != "table" or str(t["name"]).startswith("sqlite_"):
            continue
        parts.append(f"{t['name']}:")
        try:
            for i, (_rowid, vals) in enumerate(
                    sqlite_rows(b, t["name"])):
                if i >= max_rows_per_table:
                    parts.append("<truncated>")
                    break
                parts.append("\t".join(
                    "" if v is None
                    else f"<blob:{len(v)}>" if isinstance(v, bytes)
                    else str(v)
                    for v in vals))
        except SqliteError as e:
            parts.append(f"<unreadable: {e}>")
        parts.append("")
    return "\n".join(parts).rstrip("\n")
