"""Microsoft Cabinet (.cab) member walk — from scratch, stdlib only
(public format: the MS-CAB specification).

CAB is how Windows installers and driver bundles ship inside web
crawls.  The container is a header + folder table + file table +
per-folder CFDATA block chains:

- **CFHEADER**: ``MSCF`` magic, cabinet size, file-table offset,
  version 1.3, folder/file counts, flags (reserve fields when
  flags & 4; prev/next cabinet name strings when flags & 3);
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

**Multi-cabinet spanning sets** (r11): ``cab_set_members`` walks an
ordered set — a folder whose last CFDATA declares ``cbUncomp == 0``
is boundary-split and rejoins byte-wise with the next cabinet's first
block, the continued folder's blocks concatenate (MSZIP history and
the LZX bitstream both continue across cabinets), and spanning
members (iFolder 0xFFFD/0xFFFE/0xFFFF) yield once, from the cabinet
where they start.  A set member walked ALONE is typed.

``build_cab`` / ``build_cab_set`` are the independent synthesis
writers (none, MSZIP with real cross-block history, or LZX); pytest
cross-pins against libarchive (bsdtar lists and extracts single
cabinets including multi-frame LZX, and parses the set headers —
its cab reader refuses multivolume extraction by design).

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


def _read_sz(b: bytes, pos: int) -> tuple[str, int]:
    end = b.find(b"\x00", pos)
    if end < 0 or end - pos > 4096:
        raise CabError("CAB header string unterminated")
    return b[pos:end].decode("cp1252", "replace"), end + 1


def _parse_cab(b: bytes) -> dict:
    """One cabinet -> header fields, per-folder CFDATA piece lists
    (checksum-verified), and the raw file table.  Shared by the
    single-cabinet walk and the multi-cabinet set walk."""
    if not is_cab(b):
        raise CabError("not a CAB payload")
    (_sig, _r1, _cb_cabinet, _r2, coff_files, _r3, ver_minor,
     ver_major, c_folders, c_files, flags, set_id,
     i_cab) = struct.unpack_from("<4sIIIIIBBHHHHH", b, 0)
    if (ver_major, ver_minor) != (1, 3):
        raise CabError(f"CAB version {ver_major}.{ver_minor} "
                       "out of scope")
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
    prev_name = next_name = None
    if flags & 0x1:                              # szCabinetPrev/DiskPrev
        prev_name, pos = _read_sz(b, pos)
        _disk, pos = _read_sz(b, pos)
    if flags & 0x2:                              # szCabinetNext/DiskNext
        next_name, pos = _read_sz(b, pos)
        _disk, pos = _read_sz(b, pos)

    folders = []
    for _ in range(c_folders):
        if pos + 8 > len(b):
            raise CabError("truncated CFFOLDER")
        coff_data, c_data, type_compress = struct.unpack_from(
            "<IHH", b, pos)
        folders.append({
            "comp": type_compress & 0x000F,
            "wbits": (type_compress >> 8) & 0x1F,
            "blocks": None, "coff": coff_data, "c_data": c_data,
        })
        pos += 8 + cb_folder_res

    # CFDATA pieces per folder (verified now; views into b, cheap)
    for fol in folders:
        blocks: list[tuple[int, bytes]] = []
        p = fol["coff"]
        for _ in range(fol["c_data"]):
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
            blocks.append((cb_uncomp, data))
        fol["blocks"] = blocks

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
        if i_folder < 0xFFFD and i_folder >= len(folders):
            raise CabError("CFFILE folder index out of range")
        files.append((name, cb_file, uoff, i_folder))
    return {
        "flags": flags, "set_id": set_id, "i_cab": i_cab,
        "prev": prev_name, "next": next_name,
        "folders": folders, "files": files,
    }


def _decode_folder(comp: int, wbits: int,
                   blocks: list[tuple[int, bytes]]) -> bytes:
    """Decode one (possibly cabinet-spanning, already merged) folder's
    CFDATA blocks to its uncompressed stream."""
    if comp not in (0, 1, 3):
        names = {2: "Quantum"}
        raise CabError(
            f"CAB {names.get(comp, comp)} compression out of scope"
            " (none/MSZIP/LZX only)")
    if comp == 3:                                # LZX: continuous stream
        from .lzx import LzxError, lzx_decompress

        lzx_out = sum(u for u, _ in blocks)
        if lzx_out > MAX_FOLDER_BYTES:
            raise CabError("CAB folder output over cap")
        try:
            return lzx_decompress(
                b"".join(d for _, d in blocks), lzx_out,
                window_bits=wbits or 15)
        except LzxError as e:
            raise CabError(f"corrupt LZX folder: {e}") from e
    out = bytearray()
    history = b""
    for cb_uncomp, data in blocks:
        if comp == 0:
            if len(data) != cb_uncomp:
                raise CabError("stored CFDATA size mismatch")
            chunk = data
        else:                                    # MSZIP
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
    return bytes(out)


def _walk(files: list[tuple[str, int, int, int]],
          folder_of, stream_of,
          max_member_bytes: int) -> Iterator[tuple[str, int, bytes]]:
    for name, cb_file, uoff, fi in files:
        if cb_file > max_member_bytes:
            continue
        stream = stream_of(folder_of(fi))
        data = stream[uoff:uoff + cb_file]
        if len(data) != cb_file:
            raise CabError(f"CAB member overruns folder stream: {name}")
        yield name.replace("\\", "/"), cb_file, data


def cab_members(
    b: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes]]:
    """Yield ``(path, size, payload)`` per member of a STANDALONE
    cabinet.  Members larger than ``max_member_bytes`` are skipped
    (the archive_members contract); Quantum folders are typed, and a
    cabinet that is part of a spanning set is typed here — walk the
    whole set with :func:`cab_set_members`."""
    info = _parse_cab(b)
    if info["flags"] & 0x3 or any(
            fi >= 0xFFFD for _n, _s, _o, fi in info["files"]):
        raise CabError(
            "multi-cabinet set: sibling cabinets required "
            "(walk the ordered set with cab_set_members)")

    decoded: dict[int, bytes] = {}

    def stream_of(fi: int) -> bytes:
        if fi not in decoded:
            fol = info["folders"][fi]
            decoded.clear()                      # members folder-grouped
            decoded[fi] = _decode_folder(
                fol["comp"], fol["wbits"], fol["blocks"])
        return decoded[fi]

    yield from _walk(info["files"], lambda fi: fi, stream_of,
                     max_member_bytes)


def cab_set_members(
    cabs: list[bytes], max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes]]:
    """Walk an ORDERED multi-cabinet set (MS-CAB spanning sets): a
    folder whose last CFDATA is split across the boundary (the first
    piece declares ``cbUncomp == 0``) is rejoined byte-wise, the
    continued folder's blocks concatenate (MSZIP history and the LZX
    bitstream both continue across cabinets), and each spanning member
    is yielded ONCE, from the cabinet where it starts (iFolder 0xFFFE
    CONTINUED_TO_NEXT starts in the last folder; 0xFFFD/0xFFFF
    listings in later cabinets are the continuation duplicates the
    spec requires)."""
    infos = [_parse_cab(p) for p in cabs]
    if not infos:
        return
    sid = infos[0]["set_id"]
    logical: list[dict] = []                     # {comp, wbits, blocks}
    fmap: dict[tuple[int, int], int] = {}
    out_files: list[tuple[str, int, int, int]] = []
    for ci, info in enumerate(infos):
        if info["set_id"] != sid:
            raise CabError("cabinet set ids disagree")
        if info["i_cab"] != ci:
            raise CabError(
                f"cabinet {ci} declares set index {info['i_cab']} — "
                "set must be passed in order")
        nfold = len(info["folders"])
        # folder 0 continues the previous cabinet's last folder when
        # the file table says so (0xFFFD/0xFFFF listings) OR the
        # previous folder ends in a split CFDATA (cbUncomp == 0) —
        # the latter is unambiguous even without a spanning member
        cont_in = any(fi in (0xFFFD, 0xFFFF)
                      for _n, _s, _o, fi in info["files"])
        if ci > 0:
            pl = fmap.get((ci - 1, len(infos[ci - 1]["folders"]) - 1))
            if pl is not None and logical[pl]["blocks"] \
                    and logical[pl]["blocks"][-1][0] == 0:
                cont_in = True
        if cont_in and (ci == 0 or not info["flags"] & 0x1):
            raise CabError(
                "cabinet claims continuation from a missing "
                "predecessor")
        for fi, fol in enumerate(info["folders"]):
            if fi == 0 and cont_in:
                li = fmap[(ci - 1, len(infos[ci - 1]["folders"]) - 1)]
                lf = logical[li]
                if (lf["comp"], lf["wbits"]) != (fol["comp"],
                                                 fol["wbits"]):
                    raise CabError(
                        "continued folder changes compression")
                blocks = fol["blocks"]
                if lf["blocks"] and lf["blocks"][-1][0] == 0:
                    # split CFDATA: first piece declared cbUncomp 0;
                    # the continuation's first block completes it
                    if not blocks:
                        raise CabError(
                            "split CFDATA without a continuation "
                            "block")
                    u, d2 = blocks[0]
                    _z, d1 = lf["blocks"][-1]
                    lf["blocks"][-1] = (u, bytes(d1) + bytes(d2))
                    blocks = blocks[1:]
                lf["blocks"].extend(blocks)
                fmap[(ci, fi)] = li
            else:
                fmap[(ci, fi)] = len(logical)
                logical.append({"comp": fol["comp"],
                                "wbits": fol["wbits"],
                                "blocks": list(fol["blocks"])})
        for name, cb_file, uoff, ifd in info["files"]:
            if ifd in (0xFFFD, 0xFFFF):
                continue                         # continuation listing
            if ifd == 0xFFFE:                    # starts in last folder
                if ci + 1 >= len(infos):
                    raise CabError(
                        "member continues past the last cabinet "
                        "provided")
                lfi = fmap[(ci, nfold - 1)]
            else:
                lfi = fmap[(ci, ifd)]
            out_files.append((name, cb_file, uoff, lfi))

    decoded: dict[int, bytes] = {}

    def stream_of(li: int) -> bytes:
        if li not in decoded:
            lf = logical[li]
            decoded.clear()
            decoded[li] = _decode_folder(
                lf["comp"], lf["wbits"], lf["blocks"])
        return decoded[li]

    yield from _walk(out_files, lambda fi: fi, stream_of,
                     max_member_bytes)


# -- synthesis writer ----------------------------------------------------------


def _build_blocks(stream: bytes,
                  compression: str) -> list[tuple[bytes, int]]:
    """Compress one folder stream into its (payload, uncomp_len)
    CFDATA bodies (no headers yet)."""
    blocks: list[tuple[bytes, int]] = []
    if compression == "lzx":
        # one continuous LZX stream, sliced so each CFDATA carries one
        # 32 kB frame of output (the CAB framing rule)
        from .lzx import lzx_frames

        for payload, uncomp_len in lzx_frames(
                stream if stream else b"\x00", window_bits=15,
                mode="verbatim"):
            blocks.append((payload, uncomp_len))
        return blocks
    history = b""
    for off in range(0, max(len(stream), 1), _BLOCK):
        chunk = stream[off:off + _BLOCK]
        if compression == "none":
            payload = chunk
        else:
            c = zlib.compressobj(6, zlib.DEFLATED, -15, zdict=history)
            payload = b"CK" + c.compress(chunk) + c.flush()
        blocks.append((payload, len(chunk)))
        history = chunk[-32768:] if compression == "mszip" else b""
    return blocks


def _block_bytes(payload: bytes, uncomp_len: int) -> bytes:
    seed = _checksum(struct.pack("<HH", len(payload), uncomp_len))
    return struct.pack("<IHH", _checksum(payload, seed), len(payload),
                       uncomp_len) + payload


def build_cab(files: list[tuple[str, bytes]],
              compression: str = "mszip") -> bytes:
    """Write a valid single-folder cabinet (``compression``: 'none',
    'mszip' — MSZIP with real cross-block DEFLATE history — or 'lzx').
    Independent of the reader: its own layout/checksum serialization."""
    if compression not in ("none", "mszip", "lzx"):
        raise CabError(f"build_cab compression {compression!r}")
    stream = b"".join(d for _n, d in files)
    blocks = [_block_bytes(p, u)
              for p, u in _build_blocks(stream, compression)]

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


def build_cab_set(files: list[tuple[str, bytes]],
                  compression: str = "mszip",
                  n_cabs: int = 2,
                  split_block: bool = False,
                  set_id: int = 0x1234) -> list[bytes]:
    """Write an MS-CAB SPANNING set: one logical folder whose CFDATA
    blocks are distributed over ``n_cabs`` cabinets (prev/next header
    strings, shared set id, sequential iCabinet).  ``split_block``
    additionally splits each boundary's last CFDATA mid-payload — the
    first piece declares ``cbUncomp == 0`` per the spec and the
    continuation cabinet's folder leads with the remainder.  Members
    crossing a boundary are listed in every cabinet they span with the
    spec's iFolder codes (0xFFFE CONTINUED_TO_NEXT where they start,
    0xFFFD CONTINUED_FROM_PREV / 0xFFFF both, after).  Independent of
    the reader."""
    if compression not in ("none", "mszip", "lzx"):
        raise CabError(f"build_cab_set compression {compression!r}")
    if n_cabs < 2:
        raise CabError("a spanning set needs at least 2 cabinets")
    stream = b"".join(d for _n, d in files)
    blocks = _build_blocks(stream, compression)
    if len(blocks) < n_cabs:
        raise CabError(
            f"{len(blocks)} CFDATA blocks cannot span {n_cabs} "
            "cabinets")
    # distribute blocks evenly; each cabinet gets a contiguous run
    per = -(-len(blocks) // n_cabs)
    runs = [blocks[k * per:(k + 1) * per] for k in range(n_cabs)]
    runs = [r for r in runs if r]
    n_cabs = len(runs)
    # uncompressed range attributed to each cabinet: where each block
    # STARTS (a boundary-split block's output counts in the cabinet
    # its first piece lives in — that is where the spec lists every
    # file whose data it carries)
    ranges = []
    u0 = 0
    for k in range(n_cabs):
        produced = sum(u for _p, u in runs[k])
        ranges.append((u0, u0 + produced))
        u0 += produced
    # per-cabinet piece lists [(payload, declared_uncomp)], after
    # optional mid-payload boundary splits
    pieces: list[list[tuple[bytes, int]]] = [
        [(p, u) for p, u in r] for r in runs]
    if split_block:
        for k in range(n_cabs - 1):
            pay, unc = pieces[k][-1]
            if len(pay) < 2:
                continue
            half = len(pay) // 2
            pieces[k][-1] = (pay[:half], 0)      # cbUncomp 0 = split
            pieces[k + 1].insert(0, (pay[half:], unc))

    def cab_name(k: int) -> str:
        return f"set{set_id:04x}_{k}.cab"

    out: list[bytes] = []
    for k in range(n_cabs):
        flags = (0x1 if k > 0 else 0) | (0x2 if k < n_cabs - 1 else 0)
        head_tail = b""
        if flags & 0x1:
            head_tail += cab_name(k - 1).encode() + b"\x00"
            head_tail += b"DISK1\x00"
        if flags & 0x2:
            head_tail += cab_name(k + 1).encode() + b"\x00"
            head_tail += b"DISK1\x00"
        ftable = bytearray()
        n_files = 0
        uoff = 0
        lo, hi = ranges[k]
        for name, data in files:
            s, e = uoff, uoff + len(data)
            uoff = e
            if e <= lo or s >= hi:               # entirely elsewhere
                if not (s == e and lo <= s < hi):
                    continue
            starts_here = lo <= s < hi or (k == 0 and s < lo)
            ends_here = lo < e <= hi or (k == n_cabs - 1 and e > hi)
            if starts_here and ends_here:
                ifd = 0
            elif starts_here:
                ifd = 0xFFFE                     # continued to next
            elif ends_here:
                ifd = 0xFFFD                     # continued from prev
            else:
                ifd = 0xFFFF                     # spans through
            nb = name.encode("utf-8")
            attribs = 0x80 if any(c > 0x7F for c in nb) else 0x20
            ftable += struct.pack("<IIHHHH", len(data), s, ifd,
                                  0x5A5A, 0x5A5A, attribs)
            ftable += nb + b"\x00"
            n_files += 1
        blk_bytes = [ _block_bytes(p, u) for p, u in pieces[k] ]
        header_len = 36 + len(head_tail)
        coff_files = header_len + 8
        coff_data = coff_files + len(ftable)
        cb_cabinet = coff_data + sum(len(bb) for bb in blk_bytes)
        comp_id = {"none": 0, "mszip": 1,
                   "lzx": 3 | (15 << 8)}[compression]
        header = struct.pack(
            "<4sIIIIIBBHHHHH", MAGIC, 0, cb_cabinet, 0, coff_files, 0,
            3, 1, 1, n_files, flags, set_id, k) + head_tail
        folder = struct.pack("<IHH", coff_data, len(blk_bytes),
                             comp_id)
        out.append(header + folder + bytes(ftable)
                   + b"".join(blk_bytes))
    return out
