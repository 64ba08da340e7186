"""RAR member walk (operators/rar.py): RAR4/RAR5 round trips through
the independent writer, the stored/compressed/encrypted inventory
rules, typed boundaries, archive.py dispatch, and a libarchive
(bsdtar) cross-pin of the writer's output."""

from __future__ import annotations

import shutil
import struct
import subprocess

import pytest

from evm_archive_spark.operators.rar import (
    RarError,
    build_rar,
    is_rar,
    rar_members,
)

FILES = [("a.txt", b"hello rar"), ("dir/b.bin", bytes(range(256))),
         ("unicode é.md", b"# doc"), ("empty", b"")]


def test_roundtrip_both_generations():
    for rar5 in (True, False):
        arc = build_rar(FILES, rar5=rar5)
        assert is_rar(arc)
        assert list(rar_members(arc)) == [
            (n, len(d), d) for n, d in FILES], rar5


def test_compressed_members_inventory_without_payload():
    for rar5 in (True, False):
        arc = build_rar(FILES, rar5=rar5, stored=False)
        got = list(rar_members(arc))
        assert got == [(n, len(d), None) for n, d in FILES], rar5
        # the scrambled data area must not leak as a payload
        assert all(p is None for _n, _s, p in got)


def test_typed_boundaries():
    # header CRC mismatch
    arc = bytearray(build_rar(FILES, rar5=True))
    arc[len(b"Rar!\x1a\x07\x01\x00") + 1] ^= 0xFF
    with pytest.raises(RarError, match="CRC"):
        list(rar_members(bytes(arc)))
    # stored-member data CRC mismatch
    arc = bytearray(build_rar([("x", b"payload!")], rar5=True))
    arc[-12] ^= 0xFF                            # inside the data area
    with pytest.raises(RarError):
        list(rar_members(bytes(arc)))
    # RAR4 encrypted headers are typed
    arc4 = bytearray(build_rar(FILES, rar5=False))
    pos = 7                                     # main header block
    _crc, _t, flags, hsize = struct.unpack_from("<HBHH", arc4, pos)
    struct.pack_into("<H", arc4, pos + 3, flags | 0x0080)
    head = bytes(arc4[pos + 2: pos + 2 + hsize - 2])
    import zlib
    struct.pack_into("<H", arc4, pos, zlib.crc32(head) & 0xFFFF)
    with pytest.raises(RarError, match="encrypted headers"):
        list(rar_members(bytes(arc4)))
    # truncation fuzz: typed, never a crash or wrong member
    good = build_rar(FILES, rar5=True)
    for cut in range(8, len(good), 23):
        try:
            members = list(rar_members(good[:cut]))
        except RarError:
            continue
        assert members == []  # pragma: no cover (never both)
    with pytest.raises(RarError, match="not a RAR"):
        list(rar_members(b"garbage"))


def test_archive_dispatch():
    from evm_archive_spark.operators.archive import (
        archive_kind,
        archive_members,
    )

    arc = build_rar(FILES, rar5=True)
    assert archive_kind(arc) == "rar"
    assert list(archive_members(arc)) == [
        (n, len(d), d) for n, d in FILES]
    assert archive_kind(build_rar(FILES, rar5=False)) == "rar"


@pytest.mark.skipif(shutil.which("bsdtar") is None,
                    reason="no bsdtar (libarchive)")
def test_writer_cross_checked_against_libarchive(tmp_path):
    """libarchive reads RAR natively: bsdtar must list and extract the
    independent writer's stored archives byte-identically — pinning
    the container serialization against a real RAR consumer."""
    for rar5 in (True, False):
        p = tmp_path / f"t{int(rar5)}.rar"
        p.write_bytes(build_rar(FILES, rar5=rar5))
        listing = subprocess.run(
            ["bsdtar", "-tf", str(p)], capture_output=True, text=True)
        assert listing.returncode == 0, listing.stderr
        names = listing.stdout.split("\n")[:-1]
        assert names == [n for n, _d in FILES], (rar5, names)
        dest = tmp_path / f"x{int(rar5)}"
        dest.mkdir()
        run = subprocess.run(
            ["bsdtar", "-xf", str(p), "-C", str(dest)],
            capture_output=True, text=True)
        assert run.returncode == 0, run.stderr
        for n, d in FILES:
            assert (dest / n).read_bytes() == d, (rar5, n)
