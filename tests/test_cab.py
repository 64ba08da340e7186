"""CAB member walk (operators/cab.py): none/MSZIP round trips through
the independent writer (cross-block DEFLATE history), checksum and
typed boundaries, archive.py dispatch, and the libarchive (bsdtar)
cross-pin."""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from evm_archive_spark.operators.cab import (
    CabError,
    build_cab,
    cab_members,
    is_cab,
)

FILES = [
    ("setup.inf", b"[Version]\r\nSignature=$CHICAGO$\r\n" * 64),
    ("bin/app.exe", bytes(np.random.default_rng(7).integers(
        0, 256, 100_000, dtype=np.uint8))),
    ("unicode \xe9.txt", "h\xe9llo".encode()),
    ("empty", b""),
]


def test_roundtrip_none_and_mszip():
    want = [(n, len(d), d) for n, d in FILES]
    for comp in ("none", "mszip"):
        cab = build_cab(FILES, compression=comp)
        assert is_cab(cab)
        assert list(cab_members(cab)) == want, comp
    # MSZIP genuinely compresses (history-linked blocks > 32 kB apart)
    text = [("big.txt", b"the quick brown fox " * 8000)]
    cab = build_cab(text, compression="mszip")
    assert len(cab) < len(text[0][1]) // 4
    assert list(cab_members(cab)) == [
        ("big.txt", len(text[0][1]), text[0][1])]


def test_typed_boundaries():
    cab = bytearray(build_cab(FILES, compression="mszip"))
    # CFDATA checksum mismatch
    cab[-20] ^= 0xFF
    with pytest.raises(CabError, match="checksum|MSZIP"):
        list(cab_members(bytes(cab)))
    # LZX folders are typed by name
    cab = bytearray(build_cab(FILES, compression="none"))
    struct.pack_into("<H", cab, 36 + 6, 3)      # folder typeCompress
    with pytest.raises(CabError, match="LZX"):
        list(cab_members(bytes(cab)))
    # multi-cabinet sets are typed
    cab = bytearray(build_cab(FILES))
    struct.pack_into("<H", cab, 30, 1)          # flags: has prev
    with pytest.raises(CabError, match="multi-cabinet"):
        list(cab_members(bytes(cab)))
    with pytest.raises(CabError, match="not a CAB"):
        list(cab_members(b"garbage"))
    # truncation fuzz: typed, never a crash
    good = build_cab(FILES)
    for cut in range(4, len(good), 97):
        with pytest.raises(CabError):
            list(cab_members(good[:cut]))


def test_archive_dispatch():
    from evm_archive_spark.operators.archive import (
        archive_kind,
        archive_members,
    )

    cab = build_cab(FILES, compression="mszip")
    assert archive_kind(cab) == "cab"
    assert list(archive_members(cab)) == [
        (n, len(d), d) for n, d in FILES]


@pytest.mark.skipif(shutil.which("bsdtar") is None,
                    reason="no bsdtar (libarchive)")
def test_writer_cross_checked_against_libarchive(tmp_path):
    for comp in ("none", "mszip"):
        p = tmp_path / f"{comp}.cab"
        p.write_bytes(build_cab(FILES, compression=comp))
        listing = subprocess.run(
            ["bsdtar", "-tf", str(p)], capture_output=True, text=True)
        assert listing.returncode == 0, listing.stderr
        assert listing.stdout.split("\n")[:-1] == [
            n for n, _d in FILES], comp
        dest = tmp_path / f"x_{comp}"
        dest.mkdir()
        run = subprocess.run(
            ["bsdtar", "-xf", str(p), "-C", str(dest)],
            capture_output=True, text=True)
        assert run.returncode == 0, run.stderr
        for n, d in FILES:
            assert (dest / n).read_bytes() == d, (comp, n)
