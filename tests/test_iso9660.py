"""ISO 9660 image walk: round trips against the independent builder
(nested directories, empty files, version-suffix strip), a
hand-crafted Joliet descriptor, cycle/bounds typed errors, truncation
fuzz, and the archive_members routing."""

from __future__ import annotations

import struct

import pytest

from evm_archive_spark.operators.iso9660 import (
    SECTOR,
    IsoError,
    _record,
    build_iso,
    is_iso,
    iso_members,
)

FILES = [
    ("A.TXT", b"first file body"),
    ("D/B.BIN", bytes(range(200)) * 30),
    ("D/E/C.TXT", b"deep file"),
    ("EMPTY.TXT", b""),
]


def test_roundtrip_nested_dirs_and_version_strip():
    img = build_iso(FILES)
    assert is_iso(img) and not is_iso(b"x" * 40000)
    got = {n: (s, d) for n, s, d in iso_members(img)}
    assert got == {n: (len(d), d) for n, d in FILES}
    # names in the image carry ';1'; members don't
    assert b"A.TXT;1" in img and all(";" not in n for n in got)


def test_joliet_names_win_when_present():
    # hand-assemble a two-descriptor image: PVD@16, Joliet SVD@17,
    # terminator@18, primary root@19, joliet root@20, file extent@21 —
    # both roots point at the SAME file extent under different names;
    # the Joliet (UCS-2) name must win
    payload = b"payload here"
    img = bytearray(22 * SECTOR)

    def vd(sector: int, vtype: int, root_lba: int | None,
           joliet: bool = False):
        d = bytearray(SECTOR)
        d[0] = vtype
        d[1:6] = b"CD001"
        d[6] = 1
        if joliet:
            d[88:91] = b"%/E"                      # UCS-2 level 3
        if root_lba is not None:
            d[128:132] = (struct.pack("<H", SECTOR)
                          + struct.pack(">H", SECTOR))
            d[156:190] = _record(b"\x00", root_lba, SECTOR, 0x02)
        img[sector * SECTOR:(sector + 1) * SECTOR] = bytes(d)

    vd(16, 1, 19)
    vd(17, 2, 20, joliet=True)
    vd(18, 255, None)

    def dirx(sector: int, name: bytes):
        d = bytearray()
        d += _record(b"\x00", sector, SECTOR, 0x02)
        d += _record(b"\x01", sector, SECTOR, 0x02)
        d += _record(name, 21, len(payload), 0x00)
        img[sector * SECTOR:sector * SECTOR + len(d)] = bytes(d)

    dirx(19, b"PLAIN.TXT;1")
    dirx(20, "plaîn.txt;1".encode("utf-16-be"))
    img[21 * SECTOR:21 * SECTOR + len(payload)] = payload

    assert list(iso_members(bytes(img))) == [
        ("plaîn.txt", len(payload), payload)
    ]


def test_bounds_and_cycles_typed():
    img = bytearray(build_iso([("A.TXT", b"x" * 10)]))
    # point the root directory's subdir... craft a self-cycle: set the
    # root record's extent to itself via a dir record that loops
    (root_lba,) = struct.unpack_from("<I", bytes(img), 16 * SECTOR + 156 + 2)
    loop = _record(b"LOOP", root_lba, SECTOR, 0x02)
    # append the loop record into the root directory extent
    recs = img[root_lba * SECTOR:(root_lba + 1) * SECTOR]
    pos = 0
    while recs[pos]:
        pos += recs[pos]
    img[root_lba * SECTOR + pos:root_lba * SECTOR + pos + len(loop)] = loop
    with pytest.raises(IsoError, match="cycle"):
        list(iso_members(bytes(img)))

    # file extent beyond the payload is typed
    img2 = bytearray(build_iso([("A.TXT", b"x" * 10)]))
    (root_lba,) = struct.unpack_from("<I", bytes(img2), 16 * SECTOR + 156 + 2)
    base = root_lba * SECTOR
    pos = 0
    while img2[base + pos]:
        nlen = img2[base + pos + 32]
        name = bytes(img2[base + pos + 33:base + pos + 33 + nlen])
        if name.startswith(b"A.TXT"):
            struct.pack_into("<I", img2, base + pos + 2, 1 << 20)
        pos += img2[base + pos]
    with pytest.raises(IsoError, match="overruns"):
        list(iso_members(bytes(img2)))

    good = build_iso(FILES)
    for cut in range(0, len(good), 2048):
        try:
            list(iso_members(good[:cut]))
        except IsoError:
            pass


def test_rock_ridge_nm_names():
    """Rock Ridge (SUSP NM) long names on the primary tree — what
    Linux images actually use: >31-char and UTF-8 names round-trip
    intact (CONTINUE-flagged fragment pairs past 20 bytes), the SP
    skip offset is honored, and the non-RR reader path is
    byte-identical to before."""
    from evm_archive_spark.operators.iso9660 import (
        _nm_entries,
        _rr_name,
        _rr_skip,
    )

    files = [
        ("a-very-long-rock-ridge-name-well-past-31-chars.txt", b"hello"),
        ("short.txt", b"x"),
        ("deep-directory-long-name/nested-long-file-name.dat",
         b"payload" * 10),
        ("caf\xe9-unicode-named-file.md", b"unicode ok"),
    ]
    img = build_iso(files, rr=True)
    assert list(iso_members(img)) == [
        (n, len(d), d) for n, d in files]

    # the ISO name fields really are short generated names — prove the
    # NM path is load-bearing by checking the raw records
    assert b"F000002;1" in img         # short.txt's generated short name
    assert b"a-very-long" in img       # the NM payload

    # NM fragment concatenation: >20-byte names split with CONTINUE
    su = _nm_entries("x" * 45)
    assert su[4] & 1 and _rr_name(su, 0) == "x" * 45

    # ./.. aliases (CURRENT/PARENT flags) are ignored
    alias = b"NM" + bytes([5, 1, 0x02]) + b""
    assert _rr_name(alias, 0) is None

    # SP validation: wrong check bytes -> no SUSP
    assert _rr_skip(b"SP" + bytes([7, 1]) + b"\xbe\xef\x00") == 0
    assert _rr_skip(b"SP" + bytes([7, 1]) + b"\x00\x00\x00") is None

    # truncation fuzz over an RR image stays typed
    for cut in range(0, len(img), 2048):
        try:
            list(iso_members(img[:cut]))
        except IsoError:
            pass


def test_archive_members_routing():
    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_kind,
        archive_members,
    )

    img = build_iso(FILES)
    assert archive_kind(img) == "iso"
    got = {n: d for n, _s, d in archive_members(img)}
    assert got == dict(FILES)
    # oversized members are skipped, not failed
    small = {n for n, _s, _d in archive_members(img, max_member_bytes=100)}
    assert small == {"A.TXT", "D/E/C.TXT", "EMPTY.TXT"}
    # IsoError normalizes to ArchiveError through the guard
    bad = bytearray(img)
    struct.pack_into("<I", bad, 16 * SECTOR + 156 + 2, 1 << 24)
    with pytest.raises(ArchiveError):
        list(archive_members(bytes(bad)))
    # the sniff mirrors is_iso exactly: a coincidental CD001 with an
    # INVALID descriptor type byte is "not an archive", not a typed
    # iso_members failure (r9 ADVICE item)
    from evm_archive_spark.operators.iso9660 import is_iso

    fake = bytearray(17 * SECTOR)
    fake[16 * SECTOR] = 7                    # not in (0, 1, 2, 255)
    fake[16 * SECTOR + 1:16 * SECTOR + 6] = b"CD001"
    assert archive_kind(bytes(fake)) is None
    assert not is_iso(bytes(fake))
    with pytest.raises(ArchiveError, match="not a zip/tar"):
        list(archive_members(bytes(fake)))
