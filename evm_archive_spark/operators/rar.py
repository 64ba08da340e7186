"""RAR archive member walk — from scratch, stdlib only (public
format: the RAR 4.x "technote" block layout and the published RAR
5.0 archive format description).

RAR is the second-most-common archive format in web crawls after
zip.  Its compression (a proprietary LZSS/PPMd family) is out of
scope, but the CONTAINER is walkable: member names, declared sizes
and storage method live in plain block headers, and method-"store"
members carry their payload verbatim.  The walk therefore yields

- ``(path, size, payload)`` for STORED members (CRC32-verified);
- ``(path, size, None)`` for compressed or file-encrypted members —
  the inventory rule the 7zAES folders and encrypted zip members
  follow;
- a typed error for header-encrypted archives (nothing is readable
  without the key) and malformed blocks.

Both generations are covered:

- **RAR 4.x** (``Rar!\\x1a\\x07\\x00``): u16-CRC'd blocks — marker,
  main (archive flags; 0x80 = encrypted headers), file (pack/unpack
  sizes, host OS, CRC, method 0x30..0x35, name), end.  Large-file
  headers (flag 0x100) extend sizes to 64 bits.
- **RAR 5.0** (``Rar!\\x1a\\x07\\x01\\x00``): vint-coded blocks
  (low 7 bits per byte, high bit continues), CRC32 over the header
  area, block types main=1 / file=2 / service=3 / encryption=4 /
  end=5; file headers carry flags, unpacked size, attributes,
  optional mtime/CRC, compression info (bits 7-9 = method, 0 =
  store), host OS and a UTF-8 name; a type-4 block before the main
  header means encrypted headers (typed).

``build_rar`` is the independent synthesis writer (RAR4 and RAR5,
stored or marked-compressed members) for fixtures; it shares only
the constants with the reader.

Reference parity note: the reference (SummaryDev/evm-archive) has no
archive surface; this extends the training-pipeline extraction lane
(archive.py dispatch).  Placement: per-payload work inside Arrow
batches (the codec boundary).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

MAGIC4 = b"Rar!\x1a\x07\x00"
MAGIC5 = b"Rar!\x1a\x07\x01\x00"

MAX_RAR_MEMBERS = 1 << 20


class RarError(ValueError):
    """Malformed or out-of-scope RAR payload."""


def is_rar(b: bytes) -> bool:
    return b.startswith(MAGIC4) or b.startswith(MAGIC5)


# -- RAR 5.0 -------------------------------------------------------------------


def _vint(b: bytes, pos: int) -> tuple[int, int]:
    """RAR5 variable-length integer: low 7 bits per byte, bit 7 set
    means another byte follows."""
    val = 0
    for i in range(10):
        if pos >= len(b):
            raise RarError("truncated RAR5 vint")
        byte = b[pos]
        pos += 1
        val |= (byte & 0x7F) << (7 * i)
        if not byte & 0x80:
            return val, pos
    raise RarError("RAR5 vint too long")


def _rar5_members(b: bytes, max_member_bytes: int):
    pos = len(MAGIC5)
    count = 0
    seen_main = False
    while pos + 7 <= len(b):
        (crc,) = struct.unpack_from("<I", b, pos)
        hsize, hstart = _vint(b, pos + 4)
        hend = hstart + hsize
        if hsize == 0 or hend > len(b):
            raise RarError("RAR5 block overruns payload")
        # the CRC covers the header-size vint AND the header data
        if zlib.crc32(b[pos + 4:hend]) != crc:
            raise RarError("RAR5 header CRC mismatch")
        p = hstart
        btype, p = _vint(b, p)
        bflags, p = _vint(b, p)
        extra_size = data_size = 0
        if bflags & 0x01:
            extra_size, p = _vint(b, p)
        if bflags & 0x02:
            data_size, p = _vint(b, p)
        if btype == 4 and not seen_main:
            raise RarError(
                "RAR5 with encrypted headers is out of scope")
        if btype == 1:
            seen_main = True
        elif btype == 5:
            return
        elif btype == 2:                        # file header
            count += 1
            if count > MAX_RAR_MEMBERS:
                raise RarError("RAR member count over cap")
            fflags, p = _vint(b, p)
            unp_size, p = _vint(b, p)
            _attrs, p = _vint(b, p)
            if fflags & 0x02:
                p += 4                          # mtime
            file_crc = None
            if fflags & 0x04:
                if p + 4 > len(b):
                    raise RarError("truncated RAR5 file CRC")
                (file_crc,) = struct.unpack_from("<I", b, p)
                p += 4
            comp, p = _vint(b, p)
            _host, p = _vint(b, p)
            nlen, p = _vint(b, p)
            if p + nlen > hend:
                raise RarError("RAR5 name overruns header")
            name = b[p:p + nlen].decode("utf-8", "replace")
            method = (comp >> 7) & 0x07
            is_dir = bool(fflags & 0x01)
            data = b[hend:hend + data_size]
            if len(data) < data_size:
                raise RarError("RAR5 data area overruns payload")
            # file-encryption lives in the extra area (record type 1)
            encrypted = _rar5_extra_has_crypt(
                b[hend - extra_size:hend]) if extra_size else False
            if not is_dir:
                if method == 0 and not encrypted:
                    if unp_size != data_size:
                        raise RarError(
                            "RAR5 stored member size mismatch")
                    if unp_size <= max_member_bytes:
                        if file_crc is not None and \
                                zlib.crc32(data) != file_crc:
                            raise RarError(
                                f"RAR5 member CRC mismatch: {name}")
                        yield name, unp_size, bytes(data)
                else:
                    yield name, unp_size, None
        pos = hend + data_size
    raise RarError("RAR5 archive missing end block")


def _rar5_extra_has_crypt(extra: bytes) -> bool:
    pos = 0
    while pos < len(extra):
        try:
            size, pos = _vint(extra, pos)
            rtype, after = _vint(extra, pos)
        except RarError:
            return False
        if rtype == 1:                          # file encryption record
            return True
        pos += size
    return False


# -- RAR 4.x -------------------------------------------------------------------


def _rar4_members(b: bytes, max_member_bytes: int):
    pos = len(MAGIC4)
    count = 0
    while pos + 7 <= len(b):
        _crc, btype, bflags, hsize = struct.unpack_from("<HBHH", b, pos)
        if hsize < 7 or pos + hsize > len(b):
            raise RarError("RAR4 block overruns payload")
        add_size = 0
        if bflags & 0x8000:
            if pos + 11 > len(b):
                raise RarError("truncated RAR4 ADD_SIZE")
            (add_size,) = struct.unpack_from("<I", b, pos + 7)
        if btype == 0x73:                       # main header
            if bflags & 0x0080:
                raise RarError(
                    "RAR4 with encrypted headers is out of scope")
        elif btype == 0x7B:                     # end of archive
            return
        elif btype == 0x74:                     # file header
            count += 1
            if count > MAX_RAR_MEMBERS:
                raise RarError("RAR member count over cap")
            if hsize < 32:
                raise RarError("RAR4 file header too short")
            (pack_size, unp_size, _host, file_crc, _ftime, _ver,
             method, nlen, _attr) = struct.unpack_from(
                "<IIBIIBBHI", b, pos + 7)
            off = pos + 32
            if bflags & 0x0100:                 # 64-bit sizes
                if hsize < 40:
                    raise RarError("RAR4 large header too short")
                high_pack, high_unp = struct.unpack_from("<II", b, off)
                pack_size |= high_pack << 32
                unp_size |= high_unp << 32
                off += 8
            if off + nlen > pos + hsize:
                raise RarError("RAR4 name overruns header")
            name = b[off:off + nlen].split(b"\x00", 1)[0].decode(
                "cp437" if not bflags & 0x0200 else "utf-8", "replace")
            data = b[pos + hsize:pos + hsize + pack_size]
            if len(data) < pack_size:
                raise RarError("RAR4 data area overruns payload")
            is_dir = (bflags & 0x00E0) == 0x00E0
            encrypted = bool(bflags & 0x0004)
            if not is_dir:
                if method == 0x30 and not encrypted:
                    if unp_size != pack_size:
                        raise RarError(
                            "RAR4 stored member size mismatch")
                    if unp_size <= max_member_bytes:
                        if zlib.crc32(data) != file_crc:
                            raise RarError(
                                f"RAR4 member CRC mismatch: {name}")
                        yield name, unp_size, bytes(data)
                else:
                    yield name, unp_size, None
            pos += hsize + pack_size
            continue
        pos += hsize + add_size
    raise RarError("RAR4 archive missing end block")


def rar_members(
    b: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes | None]]:
    """Yield ``(path, size, payload)`` per member: stored members with
    verified bytes, compressed/encrypted members with ``None`` (the
    inventory rule); header-encrypted archives are typed."""
    if b.startswith(MAGIC5):
        yield from _rar5_members(b, max_member_bytes)
    elif b.startswith(MAGIC4):
        yield from _rar4_members(b, max_member_bytes)
    else:
        raise RarError("not a RAR archive")


# -- synthesis writer ----------------------------------------------------------


def _wvint(v: int) -> bytes:
    out = bytearray()
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def build_rar(files: list[tuple[str, bytes]], *, rar5: bool = True,
              stored: bool = True) -> bytes:
    """Write a valid RAR4 or RAR5 archive with method-store members
    (``stored=False`` marks members with a non-store method and
    scrambles the data area, modeling real compressed archives whose
    members inventory without payloads).  Independent of the reader:
    its own vint/CRC serialization."""
    out = bytearray()
    if rar5:
        out += MAGIC5

        def block(btype: int, bflags: int, body: bytes,
                  data: bytes = b"") -> None:
            head = _wvint(btype) + _wvint(bflags)
            if bflags & 0x02:
                head += _wvint(len(data))
            head += body
            sized = _wvint(len(head)) + head
            out.extend(struct.pack("<I", zlib.crc32(sized)))
            out.extend(sized)
            out.extend(data)

        block(1, 0, _wvint(0))                  # main: archive flags 0
        for name, payload in files:
            nb = name.encode("utf-8")
            method = 0 if stored else 3
            data = payload if stored else bytes(
                (x ^ 0xA5) for x in payload)
            body = (
                _wvint(0x04)                    # file flags: CRC present
                + _wvint(len(payload))          # unpacked size
                + _wvint(0)                     # attributes
                + struct.pack("<I", zlib.crc32(payload))
                + _wvint(method << 7)           # compression info
                + _wvint(0)                     # host OS
                + _wvint(len(nb)) + nb
            )
            block(2, 0x02, body, data)
        block(5, 0, _wvint(0))                  # end of archive
        return bytes(out)

    out += MAGIC4

    def block4(btype: int, bflags: int, body: bytes,
               data: bytes = b"") -> None:
        hsize = 7 + len(body)
        head = struct.pack("<BHH", btype, bflags, hsize) + body
        crc = zlib.crc32(head) & 0xFFFF
        out.extend(struct.pack("<H", crc) + head)
        out.extend(data)

    block4(0x73, 0, b"\x00" * 6)                # main header
    for name, payload in files:
        nb = name.encode("utf-8")
        method = 0x30 if stored else 0x33
        data = payload if stored else bytes((x ^ 0xA5) for x in payload)
        body = struct.pack(
            "<IIBIIBBHI", len(data), len(payload), 0,
            zlib.crc32(payload), 0, 29, method, len(nb), 0) + nb
        block4(0x74, 0x0200, body, data)        # 0x200: unicode name
    block4(0x7B, 0, b"")
    return bytes(out)
