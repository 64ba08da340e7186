"""ISO 9660 (CD/DVD image) member walk — from scratch, stdlib only
(public spec: ECMA-119 / ISO 9660).

Old corpora and software-archive drops still carry ``.iso`` images.
The on-disk structure is 2048-byte logical sectors: a system area
(sectors 0-15), volume descriptors from sector 16 (type 1 = Primary
Volume Descriptor, type 255 = terminator), and directory extents of
variable-length directory records (both-endian numbers; records never
cross a sector boundary; a zero length byte pads to the next sector).
File names carry a ``;version`` suffix which strips for the member
path; the Joliet supplementary descriptor (UCS-2 names) is read when
present, else the primary names are used as-is.

Bounds: directory recursion depth-capped, extents cycle-guarded,
entry count capped, member reads bounded — the archive.py contract.

``build_iso`` is the independent synthesis writer (primary descriptor
only, one directory level per '/' in member paths).

Reference parity note: the reference (SummaryDev/evm-archive) has no
archive surface; this extends the training-pipeline extraction lane.
"""

from __future__ import annotations

import struct
from typing import Iterator

SECTOR = 2048
MAX_ISO_DEPTH = 32
MAX_ISO_ENTRIES = 1 << 20
MAX_ISO_DESCRIPTORS = 64


class IsoError(ValueError):
    """Malformed or out-of-scope ISO 9660 payload."""


def is_iso(b: bytes) -> bool:
    off = 16 * SECTOR
    return (
        len(b) >= off + 7
        and b[off + 1:off + 6] == b"CD001"
        and b[off] in (0, 1, 2, 255)
    )


def _dir_records(b: bytes, lba: int, size: int):
    """Yield (name_bytes, flags, extent_lba, data_len, system_use)
    for one directory extent (records never cross sector boundaries;
    a zero length byte skips to the next sector).  ``system_use`` is
    the record tail after the (padded) name — where SUSP/Rock Ridge
    entries live."""
    start = lba * SECTOR
    if start + size > len(b):
        raise IsoError("directory extent overruns payload")
    pos, end = start, start + size
    while pos < end:
        ln = b[pos]
        if ln == 0:                       # pad to the next sector
            pos = (pos // SECTOR + 1) * SECTOR
            continue
        if pos + ln > end or ln < 34:
            raise IsoError("malformed ISO directory record")
        rec = b[pos:pos + ln]
        (extent,) = struct.unpack_from("<I", rec, 2)
        (dlen,) = struct.unpack_from("<I", rec, 10)
        flags = rec[25]
        name_len = rec[32]
        if 33 + name_len > ln:
            raise IsoError("ISO name overruns its record")
        su_off = 33 + name_len + (1 - (name_len & 1))   # pad to even
        yield (rec[33:33 + name_len], flags, extent, dlen,
               rec[su_off:] if su_off < ln else b"")
        pos += ln


def _rr_name(su: bytes, skip: int) -> str | None:
    """Rock Ridge alternate name from a record's system-use area
    (SUSP entries: 2-byte signature, length, version).  ``NM``
    fragments concatenate while the CONTINUE flag (bit 0) is set;
    CURRENT/PARENT-flagged entries (bits 1-2) are the . and ..
    aliases and are ignored.  ``skip`` is the SP-declared byte offset
    into each system-use area.  A name whose final in-record fragment
    still carries CONTINUE overflows into a SUSP ``CE`` continuation
    area (out of scope) — returning the partial concatenation would
    silently mis-name the member, so fall back to the ISO field name
    (None) instead."""
    pos = skip
    parts: list[str] = []
    cont = True
    while pos + 4 <= len(su):
        sig = su[pos:pos + 2]
        ln = su[pos + 2]
        if ln < 4 or pos + ln > len(su):
            break                          # padding / malformed tail
        if sig == b"NM" and ln >= 5:
            flags = su[pos + 4]
            if not flags & 0x06:           # not a ./.. alias
                parts.append(
                    su[pos + 5:pos + ln].decode("utf-8", "replace"))
                cont = bool(flags & 0x01)
                if not cont:
                    break
        pos += ln
    if not parts or cont:
        return None
    return "".join(parts)


def _rr_skip(su: bytes) -> int | None:
    """SUSP 'SP' entry (root '.' record): validates the 0xBE 0xEF
    check bytes and returns the per-record skip length, or None when
    the image doesn't use SUSP."""
    if (len(su) >= 7 and su[0:2] == b"SP" and su[2] == 7
            and su[4:6] == b"\xbe\xef"):
        return su[6]
    return None


def _pvds(b: bytes) -> tuple[bytes | None, bytes | None]:
    """Scan volume descriptors: (primary_root_record,
    joliet_root_record)."""
    primary = joliet = None
    for i in range(MAX_ISO_DESCRIPTORS):
        off = (16 + i) * SECTOR
        if off + SECTOR > len(b):
            break
        vtype = b[off]
        if b[off + 1:off + 6] != b"CD001":
            raise IsoError("bad ISO volume descriptor id")
        if vtype == 255:
            break
        if vtype == 1 and primary is None:
            primary = b[off + 156:off + 190]
        elif vtype == 2:
            # Joliet: escape sequences %/@ %/C %/E at offset 88
            esc = b[off + 88:off + 120]
            if esc[:3] in (b"%/@", b"%/C", b"%/E"):
                joliet = b[off + 156:off + 190]
    return primary, joliet


def iso_members(
    b: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes]]:
    """Yield ``(path, size, payload)`` per file in an ISO image
    (Joliet names when present, else primary).  Oversized members are
    SKIPPED (the archive_members contract)."""
    if not is_iso(b):
        raise IsoError("not an ISO 9660 image")
    primary, joliet = _pvds(b)
    root = joliet if joliet is not None else primary
    ucs2 = joliet is not None
    if root is None:
        raise IsoError("ISO image without a primary volume descriptor")
    (root_extent,) = struct.unpack_from("<I", root, 2)
    (root_len,) = struct.unpack_from("<I", root, 10)

    count = 0
    seen: set[int] = set()
    rr_skip = 0

    def walk(lba: int, size: int, prefix: str, depth: int):
        nonlocal count, rr_skip
        if depth > MAX_ISO_DEPTH:
            raise IsoError("ISO directory nesting over the depth cap")
        if lba in seen:
            raise IsoError("ISO directory extent cycle")
        seen.add(lba)
        for raw, flags, extent, dlen, su in _dir_records(b, lba, size):
            if raw in (b"\x00", b"\x01"):         # self / parent
                if depth == 0 and raw == b"\x00":
                    rr_skip = _rr_skip(su) or 0   # SUSP SP at root '.'
                continue
            count += 1
            if count > MAX_ISO_ENTRIES:
                raise IsoError("ISO entry count over cap")
            if ucs2:
                name = raw.decode("utf-16-be", "replace")
                name = name.split(";")[0]         # strip file version
            else:
                # Rock Ridge NM (long names on the primary tree —
                # what Linux images actually use) wins over the
                # 8.3-class ISO name when present
                rr = _rr_name(su, rr_skip)
                if rr is not None:
                    name = rr
                else:
                    name = raw.decode("ascii", "replace").split(";")[0]
            path = f"{prefix}{name}"
            if flags & 0x02:
                yield from walk(extent, dlen, path + "/", depth + 1)
                continue
            if dlen > max_member_bytes:
                continue
            start = extent * SECTOR
            if start + dlen > len(b):
                raise IsoError("ISO file extent overruns payload")
            yield path, dlen, b[start:start + dlen]

    yield from walk(root_extent, root_len, "", 0)


# -- synthesis writer ----------------------------------------------------------

def _both16(v: int) -> bytes:
    return struct.pack("<H", v) + struct.pack(">H", v)


def _both32(v: int) -> bytes:
    return struct.pack("<I", v) + struct.pack(">I", v)


def _record(name: bytes, extent: int, dlen: int, flags: int,
            su: bytes = b"") -> bytes:
    base = 33 + len(name)
    base += base & 1                           # pad name to even
    ln = base + len(su)
    rec = bytearray(ln)
    rec[0] = ln
    rec[2:10] = _both32(extent)
    rec[10:18] = _both32(dlen)
    rec[18:25] = bytes([126, 1, 1, 0, 0, 0, 0])   # 2026-01-01
    rec[25] = flags
    rec[28:32] = _both16(1)
    rec[32] = len(name)
    rec[33:33 + len(name)] = name
    rec[base:] = su
    return bytes(rec)


def _nm_entries(name: str) -> bytes:
    """Rock Ridge NM system-use entries for a long name; names over
    20 bytes split into a CONTINUE-flagged pair so the fragment
    concatenation path is exercised."""
    enc = name.encode("utf-8")
    out = bytearray()
    while enc:
        frag, enc = enc[:20], enc[20:]
        flags = 0x01 if enc else 0x00          # CONTINUE
        out += b"NM" + bytes([5 + len(frag), 1, flags]) + frag
    return bytes(out)


def build_iso(files: list[tuple[str, bytes]], rr: bool = False) -> bytes:
    """Write a minimal valid ISO 9660 image (primary descriptor only):
    system area, PVD + terminator, one directory extent per path
    level, one extent per file.  Paths may contain '/' (one record
    tree); file names get the canonical ';1' version suffix.
    ``rr=True`` writes the Rock Ridge layout Linux images use: the
    ISO name fields carry generated 8.3-class short names, the REAL
    names (any length, UTF-8) ride in SUSP ``NM`` entries (split with
    the CONTINUE flag past 20 bytes), and the root '.' record carries
    the ``SP`` SUSP indicator.  Independent of the reader."""
    # group by directory (single level of nesting is plenty for
    # fixtures; deeper paths work too — each segment gets a dir)
    tree: dict[str, list] = {"": []}
    for path, data in files:
        parts = path.split("/")
        prefix = ""
        for seg in parts[:-1]:
            nxt = f"{prefix}{seg}/"
            if nxt not in tree:
                tree[nxt] = []
                tree[prefix].append(("dir", seg, nxt))
            prefix = nxt
        tree[prefix].append(("file", parts[-1], data))

    # lay out extents: dirs first (sector each; fixture-sized), then files
    dirs = sorted(tree)                       # "" first
    lba: dict[str, int] = {}
    next_lba = 18
    for d in dirs:
        lba[d] = next_lba
        next_lba += 1
    file_lba: dict[tuple[str, str], int] = {}
    for d in dirs:
        for kind, name, payload in tree[d]:
            if kind == "file":
                file_lba[(d, name)] = next_lba
                next_lba += max(1, -(-len(payload) // SECTOR))

    def parent_of(d: str) -> str:
        if not d:
            return ""
        p = d[:-1].rpartition("/")[0]
        return p + "/" if p else ""

    short_idx = 0

    def short_of(name: str, is_dir: bool) -> bytes:
        nonlocal short_idx
        short_idx += 1
        return (f"{'D' if is_dir else 'F'}{short_idx:06d}"
                + ("" if is_dir else ";1")).encode("ascii")

    def dir_bytes(d: str) -> bytes:
        out = bytearray()
        root_su = (b"SP" + bytes([7, 1]) + b"\xbe\xef\x00"
                   if rr and d == "" else b"")
        out += _record(b"\x00", lba[d], SECTOR, 0x02, root_su)   # self
        out += _record(b"\x01", lba[parent_of(d)], SECTOR, 0x02)
        for kind, name, payload in tree[d]:
            if kind == "dir":
                if rr:
                    out += _record(short_of(name, True), lba[payload],
                                   SECTOR, 0x02, _nm_entries(name))
                else:
                    out += _record(
                        name.encode("ascii"), lba[payload], SECTOR, 0x02)
            else:
                if rr:
                    out += _record(
                        short_of(name, False), file_lba[(d, name)],
                        len(payload), 0x00, _nm_entries(name))
                else:
                    out += _record(
                        (name + ";1").encode("ascii"),
                        file_lba[(d, name)], len(payload), 0x00)
        if len(out) > SECTOR:
            raise IsoError("fixture directory exceeds one sector")
        return bytes(out) + b"\x00" * (SECTOR - len(out))

    total_sectors = next_lba
    img = bytearray(total_sectors * SECTOR)
    pvd = bytearray(SECTOR)
    pvd[0] = 1
    pvd[1:6] = b"CD001"
    pvd[6] = 1
    pvd[40:47] = b"FIXTURE"                       # volume id (partial)
    pvd[80:88] = _both32(total_sectors)           # volume space size
    pvd[120:124] = _both16(1)                     # volume set size
    pvd[124:128] = _both16(1)                     # volume seq number
    pvd[128:132] = _both16(SECTOR)                # logical block size
    pvd[156:190] = _record(b"\x00", lba[""], SECTOR, 0x02)
    img[16 * SECTOR:17 * SECTOR] = bytes(pvd)
    term = bytearray(SECTOR)
    term[0] = 255
    term[1:6] = b"CD001"
    term[6] = 1
    img[17 * SECTOR:18 * SECTOR] = bytes(term)
    for d in dirs:
        img[lba[d] * SECTOR:(lba[d] + 1) * SECTOR] = dir_bytes(d)
    for (d, name), fl in file_lba.items():
        payload = next(
            p for k, n, p in tree[d] if k == "file" and n == name)
        img[fl * SECTOR:fl * SECTOR + len(payload)] = payload
    return bytes(img)
