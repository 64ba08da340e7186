"""SquashFS v4 reader: round trips against the independent builder
(multi-block files, shared tail fragments, sparse blocks, nested
dirs, empty files, both fragment modes), typed boundaries (version,
compressor, bombs), truncation fuzz, archive_members routing, and a
hypothesis property."""

from __future__ import annotations

import struct
import zlib

import pytest

from evm_archive_spark.operators.squashfs import (
    SquashfsError,
    build_squashfs,
    is_squashfs,
    squashfs_members,
)

FILES = [
    ("hello.txt", b"hello squash"),
    ("bin/tool", bytes(range(256)) * 80),          # multi-block
    ("etc/conf.d/app.conf", b"key=value\n" * 3),
    ("zeros.bin", b"\x00" * 9000),                 # sparse blocks
    ("empty", b""),
    ("unicode \xe9.md", b"# doc"),
]


def test_roundtrip_both_fragment_modes():
    want = sorted((n, len(d), d) for n, d in FILES)
    for frags in (True, False):
        img = build_squashfs(FILES, use_fragments=frags)
        assert is_squashfs(img) and not is_squashfs(b"PK\x03\x04")
        got = sorted(squashfs_members(img))
        assert got == want, frags


def test_shared_fragment_block_packs_multiple_tails():
    """Two small files' tails must land in ONE fragment block (the
    whole point of fragments) and still slice back out correctly."""
    files = [("a.txt", b"tail a" * 10), ("b.txt", b"tail b" * 11)]
    img = build_squashfs(files)
    # exactly one fragment entry in the superblock
    (frag_count,) = struct.unpack_from("<I", img, 16)
    assert frag_count == 1
    got = dict((n, d) for n, _s, d in squashfs_members(img))
    assert got == dict(files)


def test_member_cap_skips_not_fails():
    img = build_squashfs(FILES)
    small = {n for n, _s, _d in squashfs_members(img, max_member_bytes=100)}
    assert small == {"hello.txt", "etc/conf.d/app.conf", "empty",
                     "unicode \xe9.md"}


def test_typed_boundaries():
    img = bytearray(build_squashfs(FILES))
    # lzo id over gzip-encoded blocks: corrupt, typed (r10 made lzo a
    # real decode arm; the id itself is no longer out of scope)
    struct.pack_into("<H", img, 20, 3)
    with pytest.raises(SquashfsError):
        list(squashfs_members(bytes(img)))
    # unknown id typed with the id named
    img = bytearray(build_squashfs(FILES))
    struct.pack_into("<H", img, 20, 9)
    with pytest.raises(SquashfsError, match="compressor id 9"):
        list(squashfs_members(bytes(img)))
    # compressor id that MISMATCHES the block encoding: corrupt, typed
    img = bytearray(build_squashfs(FILES, compressor="gzip"))
    struct.pack_into("<H", img, 20, 6)          # claim zstd, blocks zlib
    with pytest.raises(SquashfsError):
        list(squashfs_members(bytes(img)))
    # wrong version typed
    img = bytearray(build_squashfs(FILES))
    struct.pack_into("<H", img, 28, 3)
    with pytest.raises(SquashfsError, match="version"):
        list(squashfs_members(bytes(img)))
    # inconsistent block_log typed
    img = bytearray(build_squashfs(FILES))
    struct.pack_into("<H", img, 22, 5)
    with pytest.raises(SquashfsError, match="block size"):
        list(squashfs_members(bytes(img)))
    with pytest.raises(SquashfsError, match="not a squashfs"):
        list(squashfs_members(b"garbage"))


def test_corrupt_metadata_and_truncation_fuzz():
    good = build_squashfs(FILES)
    # corrupt the first metadata byte after the data area: zlib error
    # surfaces typed (find the inode table via the superblock)
    (inode_start,) = struct.unpack_from("<q", good, 64)
    bad = bytearray(good)
    bad[inode_start + 2] ^= 0xFF
    with pytest.raises(SquashfsError):
        list(squashfs_members(bytes(bad)))
    for cut in range(0, len(good), 61):
        try:
            list(squashfs_members(good[:cut]))
        except SquashfsError:
            pass


def test_archive_members_routing():
    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_kind,
        archive_members,
    )

    img = build_squashfs(FILES)
    assert archive_kind(img) == "squashfs"
    got = {n: d for n, _s, d in archive_members(img)}
    assert got == dict(FILES)
    # SquashfsError normalizes to ArchiveError through the guard
    with pytest.raises(ArchiveError):
        list(archive_members(img[:100]))


def test_metadata_block_spanning():
    """A directory with enough entries that its listing crosses an
    8 KiB metadata-block boundary still walks (meta_read spans
    blocks)."""
    files = [(f"dir/file-{i:04d}.txt", (b"%04d" % i) * 3)
             for i in range(600)]
    img = build_squashfs(files)
    got = {n: d for n, _s, d in squashfs_members(img)}
    assert got == dict(files)


def test_uncompressed_metadata_and_incompressible_data():
    """Incompressible data blocks store raw (bit 24) and decode."""
    import random

    rng = random.Random(5)
    blob = bytes(rng.randrange(256) for _ in range(10000))
    img = build_squashfs([("rand.bin", blob)])
    assert dict(
        (n, d) for n, _s, d in squashfs_members(img)
    ) == {"rand.bin": blob}


def test_property_roundtrip_random_file_sets():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.text(
        alphabet=st.characters(
            min_codepoint=0x30, max_codepoint=0x7A,
            blacklist_characters="/\\",
        ),
        min_size=1, max_size=12,
    )
    blobs = st.binary(max_size=12000)
    fileset = st.lists(
        st.tuples(names, blobs), max_size=5,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=25, deadline=None)
    @given(files=fileset, frags=st.booleans())
    def check(files, frags):
        img = build_squashfs(files, use_fragments=frags)
        got = sorted(squashfs_members(img))
        assert got == sorted((n, len(d), d) for n, d in files)

    check()


def test_all_compressors_roundtrip():
    """xz (the real firmware default), legacy lzma (ALONE streams),
    lz4 (raw block format, from-scratch decoder), zstd (canonical
    pyarrow codec behind a bounded read) and lzo (from-scratch LZO1X
    codec pair, round 10) all round-trip through the writer, both
    fragment modes."""
    want = sorted((n, len(d), d) for n, d in FILES)
    for comp in ("xz", "lzma", "lz4", "zstd", "lzo"):
        for frags in (True, False):
            img = build_squashfs(FILES, use_fragments=frags,
                                 compressor=comp)
            assert sorted(squashfs_members(img)) == want, (comp, frags)
            # superblock records the right id
            (comp_id,) = struct.unpack_from("<H", img, 20)
            assert comp_id == {"xz": 4, "lzma": 2, "lz4": 5,
                               "zstd": 6, "lzo": 3}[comp]


def test_lz4_block_decoder_cross_checked_against_pyarrow():
    """The from-scratch LZ4 block decoder vs the canonical encoder
    (pyarrow lz4_raw = the real C lz4), over payloads that exercise
    long literal runs, 255-extended lengths, and overlap copies."""
    import os
    import random

    import pyarrow as pa

    from evm_archive_spark.operators.squashfs import lz4_block_decompress

    codec = pa.Codec("lz4_raw")
    rng = random.Random(11)
    for _ in range(150):
        parts = []
        n = rng.randrange(0, 6000)
        while sum(map(len, parts)) < n:
            if rng.random() < 0.6:   # repetitive => matches / overlaps
                parts.append(bytes([rng.randrange(4)])
                             * rng.randrange(1, 300))
            else:
                parts.append(os.urandom(rng.randrange(1, 60)))
        data = b"".join(parts)[:n]
        enc = codec.compress(data, asbytes=True)
        assert lz4_block_decompress(enc, len(data)) == data
    # output cap is a typed error, not an allocation
    big = codec.compress(b"\x00" * 100000, asbytes=True)
    with pytest.raises(SquashfsError, match="cap"):
        lz4_block_decompress(big, 1000)
    # corrupt offsets/lengths are typed
    with pytest.raises(SquashfsError):
        lz4_block_decompress(b"\x0fABC", 100)         # literals overrun
    with pytest.raises(SquashfsError):
        lz4_block_decompress(b"\x14AAAA\x00\x00", 100)  # offset 0


def test_lzma_dict_declaration_is_memlimited():
    """A crafted LZMA_ALONE header declaring a 4 GiB dictionary must
    be a typed error, not a multi-GiB upfront allocation (the 7z
    dict_size lesson applied to squashfs' lzma/xz arms)."""
    import tracemalloc

    img = bytearray(build_squashfs([("a.txt", b"payload " * 40)],
                                   compressor="lzma"))
    # find the first compressed metadata block and rewrite its ALONE
    # header's dict_size field to u32-max (inode table start at 64)
    (inode_start,) = struct.unpack_from("<q", img, 64)
    (hdr,) = struct.unpack_from("<H", img, inode_start)
    assert not hdr & 0x8000, "fixture inode table should be compressed"
    struct.pack_into("<I", img, inode_start + 2 + 1, 0xFFFFFFFF)
    tracemalloc.start()
    with pytest.raises(SquashfsError):
        list(squashfs_members(bytes(img)))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 80 * 1024 * 1024


def test_many_fragment_blocks_and_crafted_bombs():
    """>512 fragment entries span multiple fragment-index metadata
    blocks (one u64 pointer each — the single-pointer bug corrupted
    the writer's own output); a crafted ext-dir listing size is a
    typed cap, not an OOM; corrupt fragment pointers are typed."""
    import os

    files = [(f"f{i:04d}", os.urandom(2100)) for i in range(1200)]
    img = build_squashfs(files, block_size=4096)
    got = {n: d for n, _s, d in squashfs_members(img)}
    assert got == dict(files)

    # crafted near-u32-max ext-dir listing size: typed cap (the
    # listing would otherwise materialize before any entry cap)
    from evm_archive_spark.operators.squashfs import (
        MAX_SQ_LISTING,
        _Image,
        _walk_dir,
    )

    small = build_squashfs([("a", b"x")])
    imgp = _Image(small)
    with pytest.raises(SquashfsError, match="listing over cap"):
        list(_walk_dir(imgp, 0, 0, MAX_SQ_LISTING + 4, "", 0, [0],
                       1 << 20))

    # fragment pointer past EOF: typed, not struct.error
    bad = bytearray(build_squashfs([("t", b"tail body")]))
    struct.pack_into("<q", bad, 80, len(bad) + 100)   # frag_table_start
    with pytest.raises(SquashfsError):
        list(squashfs_members(bytes(bad)))
