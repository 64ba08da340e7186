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


SPAN_FILES = [
    ("a.bin", bytes(np.random.default_rng(11).integers(
        0, 256, 50_000, dtype=np.uint8))),
    ("b.bin", bytes(np.random.default_rng(13).integers(
        0, 256, 40_000, dtype=np.uint8))),
    ("c.txt", b"hello cab " * 800),
]


def test_multi_cabinet_sets():
    """r11: MS-CAB spanning sets — folders continue across cabinets
    (MSZIP history and the LZX bitstream carry over), boundary-split
    CFDATA blocks (first piece cbUncomp == 0) rejoin byte-wise, and
    members crossing a boundary yield ONCE from their starting
    cabinet.  Exact round trips for every compression × cabinet count
    × split mode."""
    from evm_archive_spark.operators.cab import (
        build_cab_set,
        cab_set_members,
    )

    want = [(n, len(d), d) for n, d in SPAN_FILES]
    for comp in ("none", "mszip", "lzx"):
        for n_cabs in (2, 3):
            for split in (False, True):
                cabs = build_cab_set(SPAN_FILES, comp, n_cabs=n_cabs,
                                     split_block=split)
                assert list(cab_set_members(cabs)) == want, (
                    comp, n_cabs, split)
                # the spanning member is listed in BOTH its cabinets
                # with the spec's continuation codes
                from evm_archive_spark.operators.cab import _parse_cab

                listed = [
                    {n: f for n, _s, _o, f in info["files"]}
                    for info in map(_parse_cab, cabs)
                ]
                spans = [nm for nm in ("a.bin", "b.bin", "c.txt")
                         if sum(nm in d for d in listed) > 1]
                assert spans, (comp, n_cabs, split)
                for nm in spans:
                    codes = [d[nm] for d in listed if nm in d]
                    assert codes[0] < 0xFFFD or codes[0] == 0xFFFE
                    assert all(c in (0xFFFD, 0xFFFF)
                               for c in codes[1:])


def test_multi_cabinet_typed_boundaries():
    """Set-walk failure modes stay typed: a set member walked alone,
    out-of-order sets, truncated sets, compression changing across a
    continued folder."""
    from evm_archive_spark.operators.cab import (
        build_cab_set,
        cab_set_members,
    )

    cabs = build_cab_set(SPAN_FILES, "mszip", n_cabs=3,
                         split_block=True)
    with pytest.raises(CabError, match="multi-cabinet"):
        list(cab_members(cabs[0]))
    with pytest.raises(CabError, match="order"):
        list(cab_set_members(list(reversed(cabs))))
    with pytest.raises(CabError, match="continues past"):
        list(cab_set_members(cabs[:2]))
    # flip the continuation cabinet's folder compression
    bad = bytearray(cabs[1])
    from evm_archive_spark.operators.cab import _parse_cab

    info = _parse_cab(cabs[1])
    # CFFOLDER sits right after header + prev/next strings; find it
    # by its known coff/c_data/typeCompress triple
    fol = info["folders"][0]
    needle = struct.pack("<IHH", fol["coff"], fol["c_data"], 1)
    i = bytes(bad).index(needle)
    struct.pack_into("<H", bad, i + 6, 0)       # mszip -> none
    with pytest.raises(CabError, match="compression"):
        list(cab_set_members([cabs[0], bytes(bad), cabs[2]]))


@pytest.mark.skipif(shutil.which("bsdtar") is None,
                    reason="no bsdtar (libarchive)")
def test_multi_cabinet_libarchive_header_pin(tmp_path):
    """libarchive refuses to EXTRACT multivolume cabinets ("Multivolume
    cabinet file is unsupported") but it parses our set headers: each
    cabinet's listing shows exactly the members the spec requires that
    cabinet to list (spanning members appear in every cabinet they
    touch).  Any CFHEADER prev/next-string or CFFILE layout mistake
    would break the listing before the multivolume refusal."""
    from evm_archive_spark.operators.cab import (
        _parse_cab,
        build_cab_set,
    )

    cabs = build_cab_set(SPAN_FILES, "mszip", n_cabs=2,
                         split_block=True, set_id=0x77)
    for k, c in enumerate(cabs):
        p = tmp_path / f"set0077_{k}.cab"
        p.write_bytes(c)
        run = subprocess.run(["bsdtar", "-tf", str(p)],
                             capture_output=True, text=True)
        assert "Multivolume" in run.stderr, run.stderr
        want = [n for n, _s, _o, _f in _parse_cab(c)["files"]]
        assert run.stdout.split("\n")[:-1] == want, k
