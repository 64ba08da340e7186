"""Archive-member fan-out (ZIP / tar, stdlib) — how code and document
corpora actually arrive: repository snapshots, dataset drops, and
crawl artifacts land as archive blobs.  The fan-out turns one archive
payload row into one row per member file, ready for the code-curation
(sourcecode.py), text (textanalysis.py), or multimodal lanes.

Placement: per-payload stdlib parsing inside Arrow batches
(mapInPandas, the codec boundary).  Zip's central directory and tar's
512-byte headers are both read through ``io.BytesIO`` — no filesystem,
no temp files.  Decompression is bounded per member
(``max_member_bytes``) against zip bombs, the TIFF-Deflate rule
applied to containers.  Corrupt archives raise ``ArchiveError``
(guard-normalized) in strict mode and yield zero members otherwise —
the never-fail admission contract.

At 100 TB: fan-out is map-side; one archive row explodes to its
members inside the task, so the only shuffle anywhere is whatever the
downstream lane does.  Archives bigger than a task's memory should be
stored pre-split (the documented contract for payload columns
generally)."""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codecerrors import guard_iter

MAX_MEMBER_BYTES = 64 * 1024 * 1024


class ArchiveError(ValueError):
    pass


def compression_kind(b: bytes) -> str | None:
    """Single-stream compression sniff: gzip / bzip2 / xz / zstd /
    lz4-frame / lzip magic bytes (the ``.jsonl.gz`` / ``.txt.bz2`` /
    ``.xz`` / ``.zst`` / ``.lz4`` / ``.lz`` wrappers corpora ship in —
    zstd is the modern dataset-drop default; GNU distributes tarballs
    as ``.tar.lz``).  Distinct from ``archive_kind`` — these wrap ONE
    payload, not a member tree."""
    if b[:2] == b"\x1f\x8b":
        return "gzip"
    if b[:3] == b"BZh" and len(b) > 3 and 0x31 <= b[3] <= 0x39:
        return "bzip2"
    if b[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if b[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if b[:4] == b"\x04\x22\x4d\x18":
        return "lz4"
    if b[:4] == b"LZIP" and len(b) > 5 and b[4] == 1:
        return "lzip"
    return None


def _lzip_decompress(b: bytes, max_out: int) -> list[bytes]:
    """lzip member walk (public format: the lzip manual): per member a
    6-byte header (magic, version 1, coded dictionary size), a raw
    LZMA1 stream (lc=3 lp=0 pb=2, EOS-terminated), and a 20-byte
    trailer (CRC32 + data size + member size, both u64le).  Multi-
    member files decode fully; CRC and sizes are verified."""
    import lzma
    import struct
    import zlib

    out: list[bytes] = []
    pos = 0
    total = 0
    while pos < len(b):
        if b[pos:pos + 4] != b"LZIP" or pos + 6 > len(b):
            raise ArchiveError("bad lzip member header")
        if b[pos + 4] != 1:
            raise ArchiveError("unsupported lzip version")
        ds_byte = b[pos + 5]
        base = ds_byte & 0x1F
        if not 12 <= base <= 29:
            raise ArchiveError("bad lzip dictionary size")
        dict_size = 1 << base
        dict_size -= (ds_byte >> 5) * (dict_size // 16)
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0,
                      "pb": 2,
                      "dict_size": min(max(dict_size, 4096),
                                       max(max_out, 4096))}],
        )
        try:
            chunk = dec.decompress(b[pos + 6:], max_out - total + 1)
        except lzma.LZMAError as e:
            raise ArchiveError(f"corrupt lzip stream: {e!r}") from e
        total += len(chunk)
        if total > max_out:
            raise ArchiveError("decompressed size exceeds cap")
        if not dec.eof:
            raise ArchiveError("truncated lzip stream")
        stream_len = len(b) - pos - 6 - len(dec.unused_data)
        tpos = pos + 6 + stream_len
        if tpos + 20 > len(b):
            raise ArchiveError("truncated lzip trailer")
        crc, dsize, msize = struct.unpack_from("<IQQ", b, tpos)
        if dsize != len(chunk) or msize != 6 + stream_len + 20:
            raise ArchiveError("lzip trailer size mismatch")
        if zlib.crc32(chunk) != crc:
            raise ArchiveError("lzip CRC mismatch")
        out.append(chunk)
        pos = tpos + 20
    return out


def decompress_payload(
    b: bytes, max_out: int = MAX_MEMBER_BYTES
) -> bytes:
    """Decompress a gzip/bzip2/xz payload with the output CAPPED at
    ``max_out`` (decompression-bomb guard — the TIFF-Deflate lesson:
    never inflate untrusted bytes unbounded).  Raises ``ArchiveError``
    on a non-compressed payload, a corrupt stream, or a stream that
    exceeds the cap.  Multi-member gzip concatenations decode all
    members (the cap applies to the total)."""
    import bz2
    import lzma
    import zlib

    kind = compression_kind(b)
    if kind is None:
        raise ArchiveError("not a gzip/bzip2/xz payload")
    if kind == "lzip":
        return b"".join(_lzip_decompress(b, max_out))
    out = []
    total = 0
    try:
        if kind == "gzip":
            pos = 0
            while pos < len(b):
                d = zlib.decompressobj(wbits=31)
                chunk = d.decompress(b[pos:], max_out - total + 1)
                out.append(chunk)
                total += len(chunk)
                if total > max_out:
                    raise ArchiveError("decompressed size exceeds cap")
                if not d.eof:
                    raise ArchiveError("truncated gzip stream")
                pos = len(b) - len(d.unused_data)
                if not d.unused_data:
                    break
        elif kind == "bzip2":
            d = bz2.BZ2Decompressor()
            chunk = d.decompress(b, max_out + 1)
            if len(chunk) > max_out:
                raise ArchiveError("decompressed size exceeds cap")
            if not d.eof:
                raise ArchiveError("truncated bzip2 stream")
            out.append(chunk)
        elif kind == "xz":
            d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
            chunk = d.decompress(b, max_out + 1)
            if len(chunk) > max_out:
                raise ArchiveError("decompressed size exceeds cap")
            if not d.eof:
                raise ArchiveError("truncated xz stream")
            out.append(chunk)
        else:
            # zstd / lz4-frame: the CANONICAL pyarrow codecs (the
            # columnar.py rule — no stdlib implementation exists; we
            # own the dispatch and the cap via a bounded streaming
            # read, never a one-shot whole-payload decompress)
            import pyarrow as pa

            st = pa.input_stream(pa.BufferReader(b), compression=kind)
            total2 = 0
            while True:
                chunk = st.read(max_out - total2 + 1)
                if not chunk:
                    break
                total2 += len(chunk)
                if total2 > max_out:
                    raise ArchiveError("decompressed size exceeds cap")
                out.append(chunk)
    except ArchiveError:
        raise
    except (OSError, EOFError, ValueError, zlib.error, lzma.LZMAError) as e:
        raise ArchiveError(f"corrupt {kind} payload: {e!r}") from e
    return b"".join(out)


def build_lzip(data: bytes, dict_bits: int = 20) -> bytes:
    """Synthesis writer for .lz fixtures: the LZMA1 stream comes from
    liblzma itself (FORMAT_ALONE body — lzip's exact stream form:
    lc=3 lp=0 pb=2, EOS-terminated), wrapped in the lzip container
    (magic, version, coded dict byte, CRC32 + sizes trailer) by this
    code — so round trips cross-check ``_lzip_decompress``'s container
    walk against a real liblzma stream."""
    import lzma
    import struct
    import zlib

    alone = lzma.compress(
        data, format=lzma.FORMAT_ALONE,
        filters=[{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                  "dict_size": 1 << dict_bits}],
    )
    stream = alone[13:]                      # strip the .lzma header
    member_size = 6 + len(stream) + 20
    return (
        b"LZIP" + bytes([1, dict_bits]) + stream
        + struct.pack("<IQQ", zlib.crc32(data), len(data), member_size)
    )


def archive_kind(b: bytes) -> str | None:
    """Sniff: 'zip' (PK header), 'tar' (ustar magic at 257), 'ar'
    (!<arch> — .deb outer / static libraries), 'cpio' (newc/crc ASCII
    magic — initramfs, RPM payloads), '7z' (the 7-Zip signature),
    'rar' (both generations), 'cab' (MS cabinets), else None."""
    if b[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    if len(b) >= 512:
        if b[257:262] == b"ustar":
            return "tar"
    if b[:8] == b"!<arch>\n":
        return "ar"
    if b[:6] in (b"070701", b"070702"):
        return "cpio"
    if b[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if b[:7] == b"Rar!\x1a\x07\x00" or b[:8] == b"Rar!\x1a\x07\x01\x00":
        return "rar"
    if b[:4] == b"MSCF" and len(b) >= 36:
        return "cab"
    if b[:4] == b"hsqs" and len(b) >= 96:
        return "squashfs"
    # mirrors iso9660.is_iso exactly (magic AND a valid descriptor
    # type byte) so sniff and walker agree on what dispatches
    iso_off = 16 * 2048
    if (len(b) >= iso_off + 7
            and b[iso_off + 1:iso_off + 6] == b"CD001"
            and b[iso_off] in (0, 1, 2, 255)):
        return "iso"
    return None


def _ar_members(
    b: bytes, max_member_bytes: int
) -> Iterator[tuple[str, int, bytes]]:
    """Unix ``ar`` walk (the .deb outer container / .a libraries):
    60-byte ASCII headers, 2-byte-aligned data.  GNU long-name table
    (``//``) resolved; the symbol table (``/``) skipped."""
    pos = 8
    longnames = b""
    while pos + 60 <= len(b):
        hdr = b[pos:pos + 60]
        if hdr[58:60] != b"`\n":
            raise ArchiveError("bad ar member terminator")
        name = hdr[0:16].decode("ascii", "replace").rstrip()
        try:
            size = int(hdr[48:58].decode("ascii").strip() or "0")
        except ValueError as e:
            raise ArchiveError(f"bad ar size field: {e}") from e
        data_start = pos + 60
        if size < 0 or data_start + size > len(b):
            raise ArchiveError("ar member overruns payload")
        data = b[data_start:data_start + size]
        pos = data_start + size + (size & 1)
        if name == "//":                       # GNU long-name table
            longnames = data
            continue
        if name in ("/", "__.SYMDEF"):         # symbol tables
            continue
        if name.startswith("/") and name[1:].isdigit():
            off = int(name[1:])
            end = longnames.find(b"\n", off)
            name = longnames[off:end if end >= 0 else None].decode(
                "ascii", "replace"
            ).rstrip("/")
        name = name.rstrip("/")                # GNU short-name slash
        if size <= max_member_bytes:
            yield name, size, data


def _cpio_members(
    b: bytes, max_member_bytes: int
) -> Iterator[tuple[str, int, bytes]]:
    """cpio "newc"/"crc" ASCII-header walk (initramfs, RPM payloads):
    110-byte hex-field headers, name and data 4-byte aligned,
    terminated by the TRAILER!!! entry."""
    pos = 0
    while pos + 110 <= len(b):
        if b[pos:pos + 6] not in (b"070701", b"070702"):
            raise ArchiveError("bad cpio header magic")

        def fld(i: int) -> int:
            raw = b[pos + 6 + i * 8:pos + 6 + (i + 1) * 8]
            try:
                return int(raw, 16)
            except ValueError as e:
                raise ArchiveError(f"bad cpio hex field: {e}") from e

        mode, namesize, filesize = fld(1), fld(11), fld(6)
        name_start = pos + 110
        if name_start + namesize > len(b):
            raise ArchiveError("cpio name overruns payload")
        name = b[name_start:name_start + namesize - 1].decode(
            "ascii", "replace"
        )
        data_start = name_start + namesize
        data_start += -(data_start) % 4
        if name == "TRAILER!!!":
            return
        if filesize < 0 or data_start + filesize > len(b):
            raise ArchiveError("cpio member overruns payload")
        data = b[data_start:data_start + filesize]
        pos = data_start + filesize
        pos += -pos % 4
        # regular files only (S_IFREG)
        if (mode & 0o170000) == 0o100000 and filesize <= max_member_bytes:
            yield name, filesize, data


@guard_iter(ArchiveError)
def archive_members(
    b: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> Iterator[tuple[str, int, bytes]]:
    """Yield ``(path, size, payload)`` per regular-file member.
    Members larger than ``max_member_bytes`` are SKIPPED (yielded with
    an empty payload would lie; a curation pipeline logs them via the
    size column of a later profile pass — the documented bound).

    Compressed archives (.tar.gz/.tgz, .tar.bz2, .cpio.xz, ...) unwrap
    through ONE capped decompress then re-dispatch — the whole
    decompressed archive is bounded by the same cap (a bigger archive
    is a typed error, the decompression-bomb contract)."""
    kind = archive_kind(b)
    if kind is None and compression_kind(b) is not None:
        b = decompress_payload(b, max_member_bytes)
        kind = archive_kind(b)
    if kind == "zip":
        try:
            zf = zipfile.ZipFile(io.BytesIO(b))
        except zipfile.BadZipFile as e:
            raise ArchiveError(f"bad zip: {e}") from e
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.flag_bits & 0x1:
                # encrypted member (round 10, the 7zAES rule): the
                # inventory — name and declared size — is plaintext in
                # the central directory; surface it with a None
                # payload instead of failing the archive
                yield info.filename, info.file_size, None
                continue
            if info.file_size > max_member_bytes:
                continue
            try:
                with zf.open(info) as f:
                    # bounded read: file_size can lie in a crafted zip
                    data = f.read(max_member_bytes + 1)
            except (zipfile.BadZipFile, NotImplementedError,
                    RuntimeError) as e:
                raise ArchiveError(f"bad zip member {info.filename}: {e}") from e
            if len(data) > max_member_bytes:
                continue
            yield info.filename, len(data), data
        return
    if kind == "tar":
        try:
            tf = tarfile.open(fileobj=io.BytesIO(b), mode="r:*")
        except tarfile.TarError as e:
            raise ArchiveError(f"bad tar: {e}") from e
        for m in tf:
            if not m.isfile() or m.size > max_member_bytes:
                continue
            f = tf.extractfile(m)
            if f is None:
                continue
            data = f.read(max_member_bytes + 1)
            if len(data) > max_member_bytes:
                continue
            yield m.name, len(data), data
        return
    if kind == "ar":
        yield from _ar_members(b, max_member_bytes)
        return
    if kind == "cpio":
        yield from _cpio_members(b, max_member_bytes)
        return
    if kind == "7z":
        # SevenZipError is a ValueError: guard_iter normalizes it to
        # ArchiveError with the message preserved
        from .sevenzip import sevenzip_members

        yield from sevenzip_members(b, max_member_bytes)
        return
    if kind == "iso":
        from .iso9660 import iso_members      # IsoError normalizes too

        yield from iso_members(b, max_member_bytes)
        return
    if kind == "squashfs":
        from .squashfs import squashfs_members   # SquashfsError too

        yield from squashfs_members(b, max_member_bytes)
        return
    if kind == "rar":
        from .rar import rar_members          # RarError normalizes too

        yield from rar_members(b, max_member_bytes)
        return
    if kind == "cab":
        from .cab import cab_members          # CabError normalizes too

        yield from cab_members(b, max_member_bytes)
        return
    raise ArchiveError(
        "not a zip/tar/ar/cpio/7z/iso/squashfs/rar/cab archive")


MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def explode_archives(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
    max_member_bytes: int = MAX_MEMBER_BYTES,
) -> DataFrame:
    """Archive rows -> member rows: ``(media_id, path, size,
    payload)``.  ``strict=True`` raises on non-archive / corrupt
    payloads; ``strict=False`` yields zero members for them (never
    fails the job)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "path": [], "size": [], "payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload or b"")
                try:
                    for path, size, data in archive_members(
                        b, max_member_bytes
                    ):
                        out["media_id"].append(mid)
                        out["path"].append(path)
                        out["size"].append(size)
                        out["payload"].append(data)
                except ArchiveError:
                    if strict:
                        raise
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, MEMBER_SCHEMA)
