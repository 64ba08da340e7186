"""Microsoft Cabinet (.cab) member walk — from scratch, stdlib only
(public format: the MS-CAB specification).

CAB is how Windows installers and driver bundles ship inside web
crawls.  The container is a header + folder table + file table +
per-folder CFDATA block chains:

- **CFHEADER**: ``MSCF`` magic, cabinet size, file-table offset,
  version 1.3, folder/file counts, flags (reserve fields when
  flags & 4; multi-cabinet sets — flags & 3 — are typed: their
  folders continue in sibling files we do not have);
- **CFFOLDER**: first-CFDATA offset, block count, compression type
  (0 = none, 1 = MSZIP, 3 = LZX via lzx.py — the makecab default for
  real driver/installer cabinets; Quantum is typed);
- **CFFILE**: uncompressed size, offset within the folder's
  uncompressed stream, folder index, DOS date/time/attributes,
  NUL-terminated name (UTF-8 when attribs & 0x80, else cp1252);
- **CFDATA**: checksum (the CAB u32-XOR algorithm, verified when
  non-zero), compressed/uncompressed byte counts, payload.

MSZIP blocks each start with the ``CK`` signature followed by a raw
DEFLATE stream whose 32 kB history window CARRIES OVER from the
previous block's uncompressed output — decoded with
``zlib.decompressobj(wbits=-15, zdict=history)``.  Files slice the
concatenated folder stream at their recorded offsets, so one folder
decode serves all its members.

LZX folders concatenate their CFDATA payloads into ONE continuous
bitstream whose 32 kB output frames coincide with the CFDATA
boundaries (lzx.py handles the per-frame bitstream realign).

``build_cab`` is the independent synthesis writer (single folder;
none, MSZIP with real cross-block history, or LZX); pytest
cross-pins all three against libarchive (bsdtar lists and extracts
our cabinets, including multi-frame LZX).

Reference parity note: the reference (SummaryDev/evm-archive) has no
archive surface; this extends the training-pipeline extraction lane
(archive.py dispatch).  Placement: per-payload work inside Arrow
batches (the codec boundary).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

MAGIC = b"MSCF"

MAX_CAB_ENTRIES = 1 << 20
MAX_FOLDER_BYTES = 256 * 1024 * 1024
_BLOCK = 32768


class CabError(ValueError):
    """Malformed or out-of-scope CAB payload."""


def is_cab(b: bytes) -> bool:
    return b[:4] == MAGIC and len(b) >= 36


def _checksum(data: bytes, seed: int = 0) -> int:
    """The CAB checksum: XOR of little-endian u32 words; trailing
    bytes pack HIGH-first (the spec's fall-through switch: with 3
    remaining, byte 0 lands at bits 16-23) — libarchive agrees."""
    csum = seed
    n = len(data) // 4 * 4
    for (w,) in struct.iter_unpack("<I", data[:n]):
        csum ^= w
    tail = data[n:]
    ul = 0
    for byte in tail:
        ul = (ul << 8) | byte
    return (csum ^ ul) & 0xFFFFFFFF


def cab_members(
    b: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes]]:
    """Yield ``(path, size, payload)`` per member.  Members larger
    than ``max_member_bytes`` are skipped (the archive_members
    contract); Quantum folders and multi-cabinet sets are typed."""
    if not is_cab(b):
        raise CabError("not a CAB payload")
    (_sig, _r1, cb_cabinet, _r2, coff_files, _r3, ver_minor,
     ver_major, c_folders, c_files, flags, _set_id,
     _i_cab) = struct.unpack_from("<4sIIIIIBBHHHHH", b, 0)
    if (ver_major, ver_minor) != (1, 3):
        raise CabError(f"CAB version {ver_major}.{ver_minor} "
                       "out of scope")
    if flags & 0x3:
        raise CabError("multi-cabinet sets are out of scope")
    if c_folders > MAX_CAB_ENTRIES or c_files > MAX_CAB_ENTRIES:
        raise CabError("CAB entry count over cap")
    pos = 36
    cb_folder_res = cb_data_res = 0
    if flags & 0x4:
        if pos + 4 > len(b):
            raise CabError("truncated CAB reserve header")
        cb_header_res, cb_folder_res, cb_data_res = struct.unpack_from(
            "<HBB", b, pos)
        pos += 4 + cb_header_res

    folders = []
    for _ in range(c_folders):
        if pos + 8 > len(b):
            raise CabError("truncated CFFOLDER")
        coff_data, c_data, type_compress = struct.unpack_from(
            "<IHH", b, pos)
        folders.append((coff_data, c_data, type_compress & 0x000F,
                        (type_compress >> 8) & 0x1F))
        pos += 8 + cb_folder_res

    # file table
    files = []
    pos = coff_files
    for _ in range(c_files):
        if pos + 16 > len(b):
            raise CabError("truncated CFFILE")
        cb_file, uoff, i_folder, _date, _time, attribs = \
            struct.unpack_from("<IIHHHH", b, pos)
        pos += 16
        end = b.find(b"\x00", pos)
        if end < 0 or end - pos > 4096:
            raise CabError("CFFILE name unterminated")
        raw_name = b[pos:end]
        name = raw_name.decode(
            "utf-8" if attribs & 0x80 else "cp1252", "replace")
        pos = end + 1
        if i_folder >= 0xFFFD:
            raise CabError(
                "CAB continuation folders are out of scope")
        if i_folder >= len(folders):
            raise CabError("CFFILE folder index out of range")
        files.append((name, cb_file, uoff, i_folder))

    # decode folders lazily, one at a time (members are grouped)
    decoded: dict[int, bytes] = {}

    def folder_stream(fi: int) -> bytes:
        if fi in decoded:
            return decoded[fi]
        coff, c_data, comp, wbits = folders[fi]
        if comp not in (0, 1, 3):
            names = {2: "Quantum"}
            raise CabError(
                f"CAB {names.get(comp, comp)} compression out of scope"
                " (none/MSZIP/LZX only)")
        lzx_parts: list[bytes] = []
        lzx_out = 0
        out = bytearray()
        p = coff
        history = b""
        for _ in range(c_data):
            if p + 8 > len(b):
                raise CabError("truncated CFDATA")
            csum, cb_data, cb_uncomp = struct.unpack_from("<IHH", b, p)
            p += 8 + cb_data_res
            data = b[p:p + cb_data]
            if len(data) < cb_data:
                raise CabError("CFDATA overruns payload")
            p += cb_data
            if csum:
                seed = _checksum(struct.pack("<HH", cb_data, cb_uncomp))
                if _checksum(data, seed) != csum:
                    raise CabError("CFDATA checksum mismatch")
            if comp == 3:                       # LZX: continuous stream
                lzx_parts.append(data)
                lzx_out += cb_uncomp
                continue
            if comp == 0:
                if len(data) != cb_uncomp:
                    raise CabError("stored CFDATA size mismatch")
                chunk = data
            else:                               # MSZIP
                if data[:2] != b"CK":
                    raise CabError("MSZIP block missing CK signature")
                d = zlib.decompressobj(wbits=-15, zdict=history)
                try:
                    chunk = d.decompress(data[2:], cb_uncomp + 1)
                    chunk += d.flush()
                except zlib.error as e:
                    raise CabError(f"corrupt MSZIP block: {e!r}") from e
                if len(chunk) != cb_uncomp:
                    raise CabError("MSZIP block size mismatch")
            out += chunk
            if len(out) > MAX_FOLDER_BYTES:
                raise CabError("CAB folder output over cap")
            history = bytes(out[-32768:])
        if comp == 3:
            from .lzx import LzxError, lzx_decompress

            if lzx_out > MAX_FOLDER_BYTES:
                raise CabError("CAB folder output over cap")
            try:
                out = bytearray(lzx_decompress(
                    b"".join(lzx_parts), lzx_out,
                    window_bits=wbits or 15))
            except LzxError as e:
                raise CabError(f"corrupt LZX folder: {e}") from e
        decoded[fi] = bytes(out)
        # keep only the latest folder (members are folder-grouped)
        for k in list(decoded):
            if k != fi:
                del decoded[k]
        return decoded[fi]

    for name, cb_file, uoff, fi in files:
        if cb_file > max_member_bytes:
            continue
        stream = folder_stream(fi)
        data = stream[uoff:uoff + cb_file]
        if len(data) != cb_file:
            raise CabError(f"CAB member overruns folder stream: {name}")
        yield name.replace("\\", "/"), cb_file, data


# -- synthesis writer ----------------------------------------------------------


def build_cab(files: list[tuple[str, bytes]],
              compression: str = "mszip") -> bytes:
    """Write a valid single-folder cabinet (``compression``: 'none' or
    'mszip' — MSZIP with real cross-block DEFLATE history).
    Independent of the reader: its own layout/checksum serialization."""
    if compression not in ("none", "mszip", "lzx"):
        raise CabError(f"build_cab compression {compression!r}")
    stream = b"".join(d for _n, d in files)
    blocks = []
    if compression == "lzx":
        # one continuous LZX stream, sliced so each CFDATA carries one
        # 32 kB frame of output (the CAB framing rule)
        from .lzx import lzx_frames

        for payload, uncomp_len in lzx_frames(
                stream if stream else b"\x00", window_bits=15,
                mode="verbatim"):
            seed = _checksum(struct.pack(
                "<HH", len(payload), uncomp_len))
            blocks.append(struct.pack(
                "<IHH", _checksum(payload, seed), len(payload),
                uncomp_len) + payload)
    else:
        history = b""
        for off in range(0, max(len(stream), 1), _BLOCK):
            chunk = stream[off:off + _BLOCK]
            if compression == "none":
                payload = chunk
            else:
                c = zlib.compressobj(6, zlib.DEFLATED, -15,
                                     zdict=history)
                payload = b"CK" + c.compress(chunk) + c.flush()
            seed = _checksum(struct.pack(
                "<HH", len(payload), len(chunk)))
            blocks.append(struct.pack(
                "<IHH", _checksum(payload, seed), len(payload),
                len(chunk)
            ) + payload)
            history = chunk[-32768:] if compression == "mszip" else b""

    ftable = bytearray()
    uoff = 0
    for name, data in files:
        nb = name.encode("utf-8")
        attribs = 0x80 if any(c > 0x7F for c in nb) else 0x20
        ftable += struct.pack("<IIHHHH", len(data), uoff, 0,
                              0x5A5A, 0x5A5A, attribs) + nb + b"\x00"
        uoff += len(data)

    header_len = 36
    folder_len = 8
    coff_files = header_len + folder_len
    coff_data = coff_files + len(ftable)
    cb_cabinet = coff_data + sum(len(blk) for blk in blocks)
    comp_id = {"none": 0, "mszip": 1, "lzx": 3 | (15 << 8)}[compression]
    header = struct.pack(
        "<4sIIIIIBBHHHHH", MAGIC, 0, cb_cabinet, 0, coff_files, 0,
        3, 1, 1, len(files), 0, 0x1234, 0)
    folder = struct.pack("<IHH", coff_data, len(blocks), comp_id)
    return header + folder + bytes(ftable) + b"".join(blocks)
