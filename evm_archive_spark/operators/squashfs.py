"""SquashFS v4.0 (Linux firmware / appliance image) member walk —
from scratch, stdlib only (public format: the kernel's squashfs
documentation and the published on-disk format description).

Firmware drops, router images, live-CD roots and container base
layers ship as squashfs.  The on-disk structure: a 96-byte
superblock; METADATA tables (inodes, directory listings, fragment
index) stored as 8 KiB metadata blocks each prefixed by a u16 header
(low 15 bits = on-disk size, bit 15 = stored uncompressed); file
DATA as a run of compressed blocks (u32 sizes; bit 24 = stored
uncompressed; size 0 = a sparse all-zero block) plus an optional
tail-end packed into a shared fragment block.  Metadata references
are (block-start-offset, offset-within-decompressed-block) pairs —
the root inode reference in the superblock packs them as
``block << 16 | offset``.

Compressors: gzip (zlib streams, the classic default), xz (the
modern firmware default; stdlib lzma with a memlimit so a crafted
dictionary declaration cannot force a multi-GiB upfront allocation —
the 7z dict_size lesson), legacy lzma (LZMA_ALONE streams, same
memlimit), lz4 (raw LZ4 *block* format — no stdlib codec exists, so
the decoder is implemented from scratch from the public block spec
and the writer cross-checks it against pyarrow's canonical lz4_raw
encoder), zstd (standard frames via the canonical pyarrow codec
behind a bounded streaming read — the archive.decompress_payload
rule; no stdlib implementation exists), and lzo (LZO1X blocks via the
from-scratch lzo.py codec pair, round 10 — the last common SquashFS
compressor).  Bounds: block counts, listing sizes and decompressed
output are capped; unknown versions and compressors are typed errors.

``build_squashfs`` is the independent synthesis writer (data blocks,
fragments, inode/directory/fragment tables, gzip or uncompressed
blocks); it shares no parse code with the reader.

Reference parity note: the reference (SummaryDev/evm-archive) has no
archive surface; this extends the training-pipeline extraction lane.

At 100 TB: the walk is map-side inside Arrow batches via
archive.explode_archives — no shuffle; oversized members are skipped
per the archive_members contract.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

MAGIC = b"hsqs"
SUPERBLOCK = 96
META_SIZE = 8192
NO_FRAG = 0xFFFFFFFF

MAX_SQ_ENTRIES = 1 << 20
MAX_SQ_DEPTH = 32
MAX_SQ_LISTING = 1 << 24          # one directory's listing bytes
MAX_SQ_META_CACHE = 64            # decompressed metadata blocks held

_T_DIR = 1
_T_FILE = 2
_T_EXT_DIR = 8
_T_EXT_FILE = 9


class SquashfsError(ValueError):
    """Malformed or out-of-scope squashfs payload."""


# superblock compressor ids (public format)
_COMP_GZIP, _COMP_LZMA, _COMP_LZO, _COMP_XZ, _COMP_LZ4, _COMP_ZSTD = (
    1, 2, 3, 4, 5, 6)
# upfront-allocation bound for lzma/xz decoders: real images use a
# dictionary <= block_size (<= 1 MiB); a crafted header may declare
# 4 GiB which liblzma would allocate before producing a byte
_LZMA_MEMLIMIT = 64 * 1024 * 1024


def lz4_block_decompress(raw: bytes, max_out: int) -> bytes:
    """Raw LZ4 *block* decode (the framing squashfs uses — not the
    frame format), from scratch per the public block spec: per
    sequence a token byte (high nibble literal length, low nibble
    match length - 4, both extended by 255-continued bytes), the
    literals, then a u16le match offset into the produced output
    (overlap-copy allowed).  The final sequence is literals-only.
    Output is capped at ``max_out``."""
    out = bytearray()
    pos = 0
    n = len(raw)
    while pos < n:
        token = raw[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise SquashfsError("lz4 literal length overruns")
                b = raw[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise SquashfsError("lz4 literals overrun input")
        if len(out) + lit > max_out:
            raise SquashfsError("lz4 output exceeds cap")
        out += raw[pos:pos + lit]
        pos += lit
        if pos == n:
            break                                  # final sequence
        if pos + 2 > n:
            raise SquashfsError("lz4 match offset overruns")
        offset = raw[pos] | (raw[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise SquashfsError("lz4 match offset out of range")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise SquashfsError("lz4 match length overruns")
                b = raw[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_out:
            raise SquashfsError("lz4 output exceeds cap")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:
            for i in range(mlen):                  # overlap copy
                out.append(out[start + i])
    return bytes(out)


def _decompressor(comp_id: int):
    """Returns ``fn(raw, limit) -> bytes`` for a superblock compressor
    id; raises the typed boundary for ids without an available codec.
    Every arm bounds its output at ``limit`` bytes."""
    if comp_id == _COMP_GZIP:
        def _gz(raw: bytes, limit: int) -> bytes:
            d = zlib.decompressobj()
            try:
                data = d.decompress(raw, limit + 1)
            except zlib.error as e:
                raise SquashfsError(
                    f"corrupt squashfs zlib block: {e!r}") from e
            if len(data) > limit:
                raise SquashfsError("squashfs block output over cap")
            return data
        return _gz
    if comp_id in (_COMP_LZMA, _COMP_XZ):
        import lzma
        fmt = lzma.FORMAT_ALONE if comp_id == _COMP_LZMA else lzma.FORMAT_XZ

        def _xz(raw: bytes, limit: int) -> bytes:
            d = lzma.LZMADecompressor(format=fmt, memlimit=_LZMA_MEMLIMIT)
            try:
                data = d.decompress(raw, limit + 1)
            except lzma.LZMAError as e:
                raise SquashfsError(
                    f"corrupt squashfs lzma/xz block: {e!r}") from e
            if len(data) > limit:
                raise SquashfsError("squashfs block output over cap")
            return data
        return _xz
    if comp_id == _COMP_LZ4:
        return lz4_block_decompress
    if comp_id == _COMP_LZO:
        from .lzo import LzoError, lzo1x_decompress

        def _lzo(raw: bytes, limit: int) -> bytes:
            try:
                return lzo1x_decompress(raw, limit)
            except LzoError as e:
                raise SquashfsError(
                    f"corrupt squashfs lzo block: {e}") from e
        return _lzo
    if comp_id == _COMP_ZSTD:
        import pyarrow as pa

        def _zstd(raw: bytes, limit: int) -> bytes:
            # canonical codec behind a bounded streaming read — never
            # a one-shot whole-payload decompress of untrusted bytes
            try:
                st = pa.input_stream(pa.BufferReader(raw),
                                     compression="zstd")
                data = st.read(limit + 1)
            except (OSError, ValueError) as e:
                raise SquashfsError(
                    f"corrupt squashfs zstd block: {e!r}") from e
            if len(data) > limit:
                raise SquashfsError("squashfs block output over cap")
            return bytes(data)
        return _zstd
    raise SquashfsError(f"unknown squashfs compressor id {comp_id}")


def is_squashfs(b: bytes) -> bool:
    return len(b) >= SUPERBLOCK and b[:4] == MAGIC


class _Image:
    def __init__(self, b: bytes):
        if not is_squashfs(b):
            raise SquashfsError("not a squashfs image")
        self.b = b
        (
            _magic, self.inode_count, _mtime, self.block_size,
            self.frag_count, self.compressor, block_log, _flags,
            _id_count, ver_major, ver_minor,
        ) = struct.unpack_from("<IIIIIHHHHHH", b, 0)
        (
            self.root_ref, self.bytes_used, _id_start, _xattr_start,
            self.inode_start, self.dir_start, self.frag_start,
            _export_start,
        ) = struct.unpack_from("<8q", b, 32)
        if (ver_major, ver_minor) != (4, 0):
            raise SquashfsError(
                f"squashfs version {ver_major}.{ver_minor} out of scope")
        self._decompress = _decompressor(self.compressor)
        if self.block_size != (1 << block_log) or not (
                4096 <= self.block_size <= 1 << 20):
            raise SquashfsError("squashfs block size inconsistent")
        if self.inode_count > MAX_SQ_ENTRIES:
            raise SquashfsError("squashfs inode count over cap")
        self._meta_cache: dict[int, tuple[bytes, int]] = {}

    def _meta_block(self, pos: int) -> tuple[bytes, int]:
        """Decompress ONE metadata block at absolute ``pos``; returns
        (data, on-disk length incl. the 2-byte header)."""
        cached = self._meta_cache.get(pos)
        if cached is not None:
            return cached
        if pos + 2 > len(self.b):
            raise SquashfsError("squashfs metadata block overruns")
        (hdr,) = struct.unpack_from("<H", self.b, pos)
        size = hdr & 0x7FFF
        raw = self.b[pos + 2:pos + 2 + size]
        if len(raw) < size or size == 0:
            raise SquashfsError("squashfs metadata block overruns")
        if hdr & 0x8000:
            data = raw
            if len(data) > META_SIZE:
                raise SquashfsError("squashfs metadata block over 8 KiB")
        else:
            data = self._decompress(raw, META_SIZE)
        out = (data, 2 + size)
        if len(self._meta_cache) >= MAX_SQ_META_CACHE:
            self._meta_cache.clear()       # bound held decompressions
        self._meta_cache[pos] = out
        return out

    def meta_read(self, table_start: int, block: int, offset: int,
                  n: int) -> bytes:
        """Read ``n`` bytes of metadata starting at (block byte-offset
        within the table, offset within its decompressed block),
        spanning block boundaries as needed."""
        out = bytearray()
        pos = table_start + block
        while len(out) < n:
            data, disk_len = self._meta_block(pos)
            if offset > len(data):
                raise SquashfsError("squashfs metadata offset overruns")
            take = data[offset:offset + (n - len(out))]
            if not take and len(out) < n:
                raise SquashfsError("squashfs metadata exhausted")
            out += take
            offset = 0
            pos += disk_len
        return bytes(out)

    def data_block(self, pos: int, word: int, limit: int) -> bytes:
        """One file data block: u32 size word (bit 24 = uncompressed;
        0 = sparse)."""
        size = word & 0xFFFFFF
        if size == 0:
            return b"\x00" * limit
        raw = self.b[pos:pos + size]
        if len(raw) < size:
            raise SquashfsError("squashfs data block overruns")
        if word & 0x1000000:
            data = raw
            if len(data) > self.block_size:
                raise SquashfsError("squashfs data block over block size")
        else:
            data = self._decompress(raw, self.block_size)
        return data[:limit]

    def fragment(self, index: int) -> bytes:
        """Decompressed fragment block ``index`` via the fragment
        index table (u64 pointers to metadata blocks of 16-byte
        entries)."""
        if index >= self.frag_count:
            raise SquashfsError("squashfs fragment index out of range")
        per_block = META_SIZE // 16
        ptr_idx = index // per_block
        ptr_pos = self.frag_start + 8 * ptr_idx
        if ptr_pos < 0 or ptr_pos + 8 > len(self.b):
            raise SquashfsError("squashfs fragment pointer overruns")
        (meta_pos,) = struct.unpack_from("<q", self.b, ptr_pos)
        if meta_pos < 0 or meta_pos + 2 > len(self.b):
            raise SquashfsError("squashfs fragment table overruns")
        data, _dl = self._meta_block(meta_pos)
        entry = data[(index % per_block) * 16:(index % per_block) * 16 + 16]
        if len(entry) < 16:
            raise SquashfsError("squashfs fragment entry overruns")
        start, word, _unused = struct.unpack("<QII", entry)
        return self.data_block(start, word, self.block_size)


def _walk_dir(img: _Image, block: int, offset: int, size: int,
              prefix: str, depth: int, count: list[int],
              max_member_bytes: int) -> Iterator[tuple[str, int, bytes]]:
    if depth > MAX_SQ_DEPTH:
        raise SquashfsError("squashfs directory nesting over cap")
    if size < 3:
        return                                     # empty directory
    if size - 3 > MAX_SQ_LISTING:
        # a crafted ext-dir u32 size would otherwise materialize an
        # unbounded decompressed listing before any entry cap applies
        raise SquashfsError("squashfs directory listing over cap")
    listing = img.meta_read(img.dir_start, block, offset, size - 3)
    pos = 0
    while pos + 12 <= len(listing):
        hcount, start, _base_inode = struct.unpack_from(
            "<III", listing, pos)
        pos += 12
        for _ in range(hcount + 1):
            if pos + 8 > len(listing):
                raise SquashfsError("squashfs directory entry overruns")
            eoff, _ioff, _etype, name_size = struct.unpack_from(
                "<HhHH", listing, pos)
            pos += 8
            name = listing[pos:pos + name_size + 1]
            if len(name) < name_size + 1:
                raise SquashfsError("squashfs entry name overruns")
            pos += name_size + 1
            count[0] += 1
            if count[0] > MAX_SQ_ENTRIES:
                raise SquashfsError("squashfs entry count over cap")
            yield from _walk_inode(
                img, start, eoff, prefix + name.decode("utf-8", "replace"),
                depth, count, max_member_bytes)


def _walk_inode(img: _Image, block: int, offset: int, path: str,
                depth: int, count: list[int],
                max_member_bytes: int) -> Iterator[tuple[str, int, bytes]]:
    hdr = img.meta_read(img.inode_start, block, offset, 16)
    (itype,) = struct.unpack_from("<H", hdr, 0)
    if itype in (_T_DIR, _T_EXT_DIR):
        if itype == _T_DIR:
            body = img.meta_read(img.inode_start, block, offset + 16, 16)
            dblock, _nlink, dsize, doffset, _parent = struct.unpack(
                "<IIHHI", body)
        else:
            body = img.meta_read(img.inode_start, block, offset + 16, 24)
            _nlink, dsize, dblock, _parent, _icount, doffset, _xattr = (
                struct.unpack("<IIIIHHI", body))
        yield from _walk_dir(img, dblock, doffset, dsize, path + "/",
                             depth + 1, count, max_member_bytes)
        return
    if itype not in (_T_FILE, _T_EXT_FILE):
        return                                     # symlink/device/etc.
    if itype == _T_FILE:
        body = img.meta_read(img.inode_start, block, offset + 16, 16)
        blocks_start, frag_index, frag_offset, file_size = struct.unpack(
            "<IIII", body)
        list_off = offset + 32
    else:
        body = img.meta_read(img.inode_start, block, offset + 16, 40)
        (blocks_start, file_size, _sparse, _nlink, frag_index,
         frag_offset, _xattr) = struct.unpack("<QQQIIII", body)
        list_off = offset + 56
    if file_size > max_member_bytes:
        return                                     # skipped, not failed
    has_frag = frag_index != NO_FRAG
    if has_frag:
        nblocks = file_size // img.block_size
    else:
        nblocks = -(-file_size // img.block_size)
    if nblocks > MAX_SQ_ENTRIES:
        raise SquashfsError("squashfs block list over cap")
    words = struct.unpack(
        f"<{nblocks}I",
        img.meta_read(img.inode_start, block, list_off, 4 * nblocks),
    ) if nblocks else ()
    out = bytearray()
    pos = blocks_start
    remaining = file_size
    for w in words:
        limit = min(img.block_size, remaining)
        out += img.data_block(pos, w, limit)
        pos += w & 0xFFFFFF
        remaining -= limit
    if has_frag and remaining:
        frag = img.fragment(frag_index)
        tail = frag[frag_offset:frag_offset + remaining]
        if len(tail) < remaining:
            raise SquashfsError("squashfs fragment tail overruns")
        out += tail
    elif remaining:
        raise SquashfsError("squashfs file shorter than declared")
    yield path, file_size, bytes(out)


def squashfs_members(
    b: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, int, bytes]]:
    """Yield ``(path, size, payload)`` per regular file in a squashfs
    v4 image (gzip compressor).  Oversized members are SKIPPED; other
    inode kinds (symlinks, devices) are dropped."""
    img = _Image(b)
    root_block = (img.root_ref >> 16) & 0xFFFFFFFF
    root_offset = img.root_ref & 0xFFFF
    hdr = img.meta_read(img.inode_start, root_block, root_offset, 16)
    (itype,) = struct.unpack_from("<H", hdr, 0)
    if itype not in (_T_DIR, _T_EXT_DIR):
        raise SquashfsError("squashfs root inode is not a directory")
    count = [0]
    for path, size, data in _walk_inode(
            img, root_block, root_offset, "", 0, count, max_member_bytes):
        yield path.lstrip("/"), size, data


# -- synthesis writer ----------------------------------------------------------

def _compressor(name: str):
    """Writer-side (id, compress_fn) for a compressor name.  xz/lzma
    come from stdlib liblzma and lz4/zstd from the canonical pyarrow
    codecs — so fixtures cross-check the from-scratch lz4 block
    decoder (and every other decode arm) against an independent
    canonical encoder, the build_lzip / libwebp pattern."""
    if name == "gzip":
        return _COMP_GZIP, zlib.compress
    if name == "xz":
        import lzma

        def _cxz(b: bytes) -> bytes:
            return lzma.compress(
                b, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC32,
                filters=[{"id": lzma.FILTER_LZMA2, "preset": 6,
                          "dict_size": 1 << 20}])
        return _COMP_XZ, _cxz
    if name == "lzma":
        import lzma

        def _clzma(b: bytes) -> bytes:
            return lzma.compress(
                b, format=lzma.FORMAT_ALONE,
                filters=[{"id": lzma.FILTER_LZMA1, "preset": 6,
                          "dict_size": 1 << 20}])
        return _COMP_LZMA, _clzma
    if name == "lz4":
        import pyarrow as pa
        codec = pa.Codec("lz4_raw")
        return _COMP_LZ4, lambda b: codec.compress(b, asbytes=True)
    if name == "lzo":
        from .lzo import lzo1x_compress
        return _COMP_LZO, lzo1x_compress
    if name == "zstd":
        import pyarrow as pa
        codec = pa.Codec("zstd")
        return _COMP_ZSTD, lambda b: codec.compress(b, asbytes=True)
    raise ValueError(f"unknown writer compressor {name!r}")


def _meta_blocks(data: bytes, compress, comp_fn) -> bytes:
    """Pack metadata bytes into 8 KiB blocks with u16 headers."""
    out = bytearray()
    for i in range(0, max(len(data), 1), META_SIZE):
        chunk = data[i:i + META_SIZE]
        packed = comp_fn(chunk) if compress else None
        if compress and len(packed) < len(chunk):
            out += struct.pack("<H", len(packed)) + packed
        else:
            out += struct.pack("<H", 0x8000 | len(chunk)) + chunk
    return bytes(out)


def build_squashfs(files: list[tuple[str, bytes]],
                   block_size: int = 4096,
                   use_fragments: bool = True,
                   compressor: str = "gzip") -> bytes:
    """Write a minimal valid squashfs 4.0 image (gzip / xz / lzma /
    lz4 / zstd compressor): data blocks (compressed unless
    incompressible; all-zero blocks stored sparse), tail ends under a
    block packed into shared fragment blocks when ``use_fragments``,
    basic file/dir inodes, directory listings, and the fragment index
    table.  Paths may contain '/'.  Independent of the reader."""
    comp_id, comp_fn = _compressor(compressor)
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

    body = bytearray()                 # data area (after superblock)
    base = SUPERBLOCK

    def put_block(chunk: bytes) -> int:
        """Append one data block; returns its u32 size word."""
        if chunk == b"\x00" * len(chunk) and chunk:
            return 0                                   # sparse
        packed = comp_fn(chunk)
        if len(packed) < len(chunk):
            body.extend(packed)
            return len(packed)
        body.extend(chunk)
        return 0x1000000 | len(chunk)

    # files: full blocks into the data area; tails into fragments
    frag_buf = bytearray()
    frag_entries: list[tuple[int, int]] = []   # (start, size word)
    file_meta: dict[tuple[str, str], tuple] = {}

    def flush_frag():
        nonlocal frag_buf
        if not frag_buf:
            return
        start = base + len(body)
        word = put_block(bytes(frag_buf))
        # sparse encoding is block-internal; fragments must exist on
        # disk, so force-store all-zero fragment blocks uncompressed
        if word == 0:
            body.extend(bytes(frag_buf))
            word = 0x1000000 | len(frag_buf)
        frag_entries.append((start, word))
        frag_buf = bytearray()

    for d in sorted(tree):
        for kind, name, data in tree[d]:
            if kind != "file":
                continue
            start = base + len(body)
            words = []
            tail = len(data) % block_size
            full_end = len(data) - (tail if use_fragments else 0)
            for i in range(0, full_end, block_size):
                words.append(put_block(data[i:i + block_size]))
            frag_index, frag_offset = NO_FRAG, 0
            if use_fragments and tail:
                if len(frag_buf) + tail > block_size:
                    flush_frag()
                frag_index = len(frag_entries)     # filled at flush
                frag_offset = len(frag_buf)
                frag_buf.extend(data[full_end:])
                # record which PENDING fragment this tail joins
                frag_index = ("pending", len(frag_entries))
            file_meta[(d, name)] = (
                start, words, frag_index, frag_offset, len(data))
    flush_frag()

    # resolve pending fragment indices (tails buffered before a flush
    # all land in the entry created by that flush)
    for k, (start, words, fi, fo, sz) in list(file_meta.items()):
        if isinstance(fi, tuple):
            file_meta[k] = (start, words, fi[1], fo, sz)

    # --- inode + directory tables ------------------------------------
    # Cross-block references use (metadata-block DISK offset, offset
    # within the decompressed block).  Disk offsets of blocks past the
    # first depend on compression, which would make refs circular — so
    # a table that spans multiple metadata blocks is stored with every
    # block UNCOMPRESSED (disk offset of raw offset r is then exactly
    # (r // 8192) * (8192 + 2)); a table fitting in ONE block may
    # compress freely (block 0's disk offset is 0 either way).

    def _ref(raw_off: int) -> tuple[int, int]:
        return (raw_off // META_SIZE) * (META_SIZE + 2), raw_off % META_SIZE

    # pass 1: inode raw offsets — files first (sizes known), then
    # directories in post-order (fixed 32-byte basic dir inodes)
    inode_off: dict[tuple[str, str] | str, int] = {}
    pos_i = 0
    for d in sorted(tree):
        for kind, name, _payload in sorted(tree[d], key=lambda t: t[1]):
            if kind == "file":
                inode_off[(d, name)] = pos_i
                nwords = len(file_meta[(d, name)][1])
                pos_i += 32 + 4 * nwords

    dir_order: list[str] = []

    def post_order(d: str):
        for kind, _name, payload in sorted(tree[d], key=lambda t: t[1]):
            if kind == "dir":
                post_order(payload)
        dir_order.append(d)

    post_order("")
    for d in dir_order:
        inode_off[d] = pos_i
        pos_i += 32

    # pass 2: directory listings (entry refs now known); one header
    # per entry so entries may reference inodes in different blocks
    dir_raw = bytearray()
    listing_pos: dict[str, tuple[int, int]] = {}
    for d in dir_order:
        lst_off = len(dir_raw)
        for kind, name, payload in sorted(tree[d], key=lambda t: t[1]):
            key = payload if kind == "dir" else (d, name)
            blk, off = _ref(inode_off[key])
            etype = _T_DIR if kind == "dir" else _T_FILE
            nb = name.encode("utf-8")
            dir_raw.extend(struct.pack("<III", 0, blk, 1))
            dir_raw.extend(struct.pack(
                "<HhHH", off, 0, etype, len(nb) - 1) + nb)
        listing_pos[d] = (lst_off, len(dir_raw) - lst_off)

    # pass 3: inode payloads in the pass-1 layout
    inode_raw = bytearray()
    num = 0
    for d in sorted(tree):
        for kind, name, _payload in sorted(tree[d], key=lambda t: t[1]):
            if kind == "file":
                num += 1
                start, words, fi, fo, sz = file_meta[(d, name)]
                inode_raw.extend(
                    struct.pack("<HHHHII", _T_FILE, 0o644, 0, 0, 0, num)
                    + struct.pack("<IIII", start, fi, fo, sz)
                    + struct.pack(f"<{len(words)}I", *words))
    for d in dir_order:
        num += 1
        lst_off, lst_size = listing_pos[d]
        dblk, doff = _ref(lst_off)
        if lst_size + 3 > 0xFFFF:
            raise SquashfsError("fixture directory listing too large")
        inode_raw.extend(
            struct.pack("<HHHHII", _T_DIR, 0o755, 0, 0, 0, num)
            + struct.pack("<IIHHI", dblk, 2, lst_size + 3, doff, 1))
    assert len(inode_raw) == pos_i

    root_raw = inode_off[""]
    root_blk, root_off = _ref(root_raw)

    inode_table = _meta_blocks(
        bytes(inode_raw), len(inode_raw) <= META_SIZE, comp_fn)
    dir_table = _meta_blocks(
        bytes(dir_raw), len(dir_raw) <= META_SIZE, comp_fn)
    inode_num = [num]
    frag_raw = b"".join(
        struct.pack("<QII", s, w, 0) for s, w in frag_entries)
    frag_meta = _meta_blocks(frag_raw, False, comp_fn) if frag_entries \
        else b""

    inode_start = base + len(body)
    dir_start = inode_start + len(inode_table)
    frag_meta_start = dir_start + len(dir_table)
    frag_start = frag_meta_start + len(frag_meta)
    # one u64 pointer PER 8 KiB metadata block of 16-byte entries
    # (512 fragments each) — frag_meta is stored uncompressed, so
    # block k starts at a deterministic frag_meta_start + k * 8194
    n_frag_blocks = -(-len(frag_raw) // META_SIZE) if frag_entries else 0
    frag_ptrs = b"".join(
        struct.pack("<q", frag_meta_start + k * (META_SIZE + 2))
        for k in range(n_frag_blocks)
    )
    id_start = frag_start + len(frag_ptrs)
    # minimal id table: one uid/gid (0), packed + pointer
    id_meta = _meta_blocks(struct.pack("<I", 0), False, comp_fn)
    id_ptr_start = id_start + len(id_meta)
    total = id_ptr_start + 8

    sb = struct.pack(
        "<IIIIIHHHHHH",
        0x73717368, inode_num[0], 0, block_size, len(frag_entries),
        comp_id, block_size.bit_length() - 1, 0, 1, 4, 0,
    ) + struct.pack(
        "<8q",
        (root_blk << 16) | root_off, total, id_ptr_start, -1,
        inode_start, dir_start, frag_start, -1,
    )
    assert len(sb) == SUPERBLOCK
    return (sb + bytes(body) + inode_table + dir_table + frag_meta
            + frag_ptrs + id_meta + struct.pack("<q", id_start))
