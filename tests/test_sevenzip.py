"""7z reader: round trips against the independent builder (copy and
LZMA2 folders, empty files, unicode names), hand-crafted fixtures for
shapes the builder never emits (LZMA1, encoded header, substream CRCs,
solid multi-member folders), typed boundaries (encryption, BCJ
chains, bomb caps), CRC validation, truncation fuzz, and the
archive_members routing."""

from __future__ import annotations

import lzma
import struct
import zlib

import pytest

from evm_archive_spark.operators.sevenzip import (
    MAGIC,
    SevenZipError,
    _wnum,
    build_7z,
    is_7z,
    sevenzip_members,
)

FILES = [
    ("a.txt", b"hello seven zip"),
    ("dir/b.bin", bytes(range(256)) * 40),
    ("empty.txt", b""),
    ("unicode \xe9中.md", b"# doc\nbody text\n"),
]


def _assemble(body: bytes, header: bytes) -> bytes:
    start = struct.pack("<QQI", len(body), len(header),
                        zlib.crc32(header))
    return (MAGIC + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
            + start + body + header)


def test_roundtrip_copy_and_lzma2():
    for codec in ("copy", "lzma2"):
        b = build_7z(FILES, codec=codec)
        assert is_7z(b) and not is_7z(b"PK\x03\x04")
        got = {n: (s, d) for n, s, d in sevenzip_members(b)}
        assert set(got) == {n for n, _d in FILES}
        for n, d in FILES:
            assert got[n] == (len(d), d), (codec, n)


def test_empty_archive_and_empty_files_only():
    assert list(sevenzip_members(build_7z([]))) == []
    only_empty = build_7z([("x", b""), ("y", b"")])
    assert list(sevenzip_members(only_empty)) == [
        ("x", 0, b""), ("y", 0, b"")
    ]


def test_hand_crafted_lzma1_folder():
    # the builder never emits LZMA1; craft one: props = lclppb byte
    # ((pb*5+lp)*9+lc) + dict-size u32le
    data = b"lzma one payload " * 50
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                  "dict_size": 1 << 16}],
    )
    props = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 1 << 16)
    h = bytearray()
    h += _wnum(0x01)                               # kHeader
    h += _wnum(0x04)                               # kMainStreamsInfo
    h += _wnum(0x06) + _wnum(0) + _wnum(1)         # kPackInfo
    h += _wnum(0x09) + _wnum(len(packed)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"   # kUnpackInfo
    h += _wnum(1) + bytes([0x23]) + b"\x03\x01\x01"       # 1 coder, attrs
    h += _wnum(len(props)) + props
    h += _wnum(0x0C) + _wnum(len(data)) + _wnum(0x00)
    h += _wnum(0x00)                               # StreamsInfo end
    h += _wnum(0x05) + _wnum(1)                    # kFilesInfo, 1 file
    name = b"\x00" + "one.bin\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b = _assemble(packed, bytes(h))
    assert list(sevenzip_members(b)) == [("one.bin", len(data), data)]


def _solid_two_member_archive(with_crcs: bool) -> tuple[bytes, bytes, bytes]:
    """One copy folder holding TWO substreams (a solid block) — the
    builder writes one folder per file, so craft it by hand."""
    m1, m2 = b"first member body", b"second one"
    body = m1 + m2
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(body)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x01]) + b"\x00"        # copy coder
    h += _wnum(0x0C) + _wnum(len(body)) + _wnum(0x00)
    h += _wnum(0x08)                               # kSubStreamsInfo
    h += _wnum(0x0D) + _wnum(2)                    # 2 substreams
    h += _wnum(0x09) + _wnum(len(m1))              # first size; last derived
    if with_crcs:
        h += _wnum(0x0A) + b"\x01"                 # all defined
        h += struct.pack("<II", zlib.crc32(m1), zlib.crc32(m2))
    h += _wnum(0x00)                               # SubStreams end
    h += _wnum(0x00)                               # StreamsInfo end
    h += _wnum(0x05) + _wnum(2)
    name = b"\x00" + "m1\x00m2\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    return _assemble(body, bytes(h)), m1, m2


def test_solid_folder_substreams_and_crc_validation():
    b, m1, m2 = _solid_two_member_archive(with_crcs=True)
    assert list(sevenzip_members(b)) == [
        ("m1", len(m1), m1), ("m2", len(m2), m2)
    ]
    # flip a body byte: the member CRC must catch it
    bad = bytearray(b)
    bad[32] ^= 0xFF
    with pytest.raises(SevenZipError, match="CRC"):
        list(sevenzip_members(bytes(bad)))
    # without substream CRCs the same archive still parses
    b2, _m1, _m2 = _solid_two_member_archive(with_crcs=False)
    assert [n for n, _s, _d in sevenzip_members(b2)] == ["m1", "m2"]


def test_encoded_header():
    # wrap a normal archive's header into a packed stream reached via
    # kEncodedHeader + a copy folder (the builder never emits this)
    inner = build_7z(FILES[:2], codec="lzma2")
    (nh_off, nh_size, _crc) = struct.unpack("<QQI", inner[12:32])
    body = inner[32:32 + nh_off]
    header = inner[32 + nh_off:32 + nh_off + nh_size]
    body2 = body + header
    eh = bytearray()
    eh += _wnum(0x17)                              # kEncodedHeader
    eh += _wnum(0x06) + _wnum(len(body)) + _wnum(1)
    eh += _wnum(0x09) + _wnum(len(header)) + _wnum(0x00)
    eh += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    eh += _wnum(1) + bytes([0x01]) + b"\x00"
    eh += _wnum(0x0C) + _wnum(len(header)) + _wnum(0x00)
    eh += _wnum(0x00)
    b = _assemble(body2, bytes(eh))
    got = {n: d for n, _s, d in sevenzip_members(b)}
    assert got == dict(FILES[:2])


def test_typed_boundaries():
    # a 7zAES folder INVENTORIES its member (name/size plaintext in
    # the header, payload None — round 10) instead of failing the
    # archive; direct folder decode stays a named typed boundary
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(16) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x04]) + b"\x06\xf1\x07\x01"
    h += _wnum(0x0C) + _wnum(16) + _wnum(0x00)
    h += _wnum(0x00)
    h += _wnum(0x05) + _wnum(1)
    name = b"\x00" + "s\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b = _assemble(b"\x00" * 16, bytes(h))
    assert list(sevenzip_members(b)) == [("s", 16, None)]
    from evm_archive_spark.operators.sevenzip import _decode_folder

    with pytest.raises(SevenZipError, match="encrypted"):
        _decode_folder(
            {"coders": [{"id": b"\x06\xf1\x07\x01", "props": b"",
                         "n_in": 1, "n_out": 1}],
             "bind_pairs": [], "packed": None, "unpack_size": 16,
             "out_sizes": [16], "main_out": 0},
            [b"\x00" * 16], 1 << 20)

    # build_7z's aes fixture arm: mixed empty/encrypted inventory,
    # no plaintext leakage into the container
    from evm_archive_spark.operators.sevenzip import build_7z as _b7z

    plain = b"attack at dawn" * 9
    arc = _b7z([("top.txt", plain), ("nul", b"")], codec="aes")
    assert list(sevenzip_members(arc)) == [
        ("top.txt", len(plain), None), ("nul", 0, b"")]
    assert plain[:28] not in arc

    # a declared folder unpack size over the cap fires BEFORE decoding
    data = b"x" * 64
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}])
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(packed)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x21]) + b"\x21" + _wnum(1) + bytes([22])
    h += _wnum(0x0C) + _wnum(1 << 40) + _wnum(0x00)   # 1 TB claimed
    h += _wnum(0x00)
    h += _wnum(0x05) + _wnum(1)
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b = _assemble(packed, bytes(h))
    # under the default member cap the 1 TB member is SKIPPED (never
    # decoded); with the member cap lifted the FOLDER cap must fire
    # before any decode attempt
    assert list(sevenzip_members(b)) == []
    with pytest.raises(SevenZipError, match="cap"):
        list(sevenzip_members(b, max_member_bytes=1 << 41))

    with pytest.raises(SevenZipError, match="not a 7z"):
        list(sevenzip_members(b"garbage"))


def test_header_crc_and_truncation_fuzz():
    good = build_7z(FILES, codec="lzma2")
    bad = bytearray(good)
    bad[-3] ^= 0x55                       # corrupt the header bytes
    with pytest.raises(SevenZipError, match="CRC"):
        list(sevenzip_members(bytes(bad)))
    for cut in range(0, len(good), 37):
        try:
            list(sevenzip_members(good[:cut]))
        except SevenZipError:
            pass


def test_archive_members_routing_and_member_cap():
    from evm_archive_spark.operators.archive import (
        ArchiveError,
        archive_kind,
        archive_members,
    )

    b = build_7z(FILES, codec="lzma2")
    assert archive_kind(b) == "7z"
    got = {n: d for n, _s, d in archive_members(b)}
    assert got == dict(FILES)
    # oversized members are SKIPPED, not failed (the contract)
    small = {n for n, _s, _d in archive_members(b, max_member_bytes=100)}
    assert small == {"a.txt", "empty.txt", "unicode \xe9中.md"}
    # SevenZipError normalizes to ArchiveError through the guard
    trunc = build_7z(FILES)[:40]
    with pytest.raises(ArchiveError):
        list(archive_members(trunc))


def test_filter_chain_folders_cross_checked_against_liblzma():
    """Two-coder chains (packed -> LZMA2 -> BCJ x86 / Delta): the
    writer packs with liblzma's OWN filter encoders, so the round trip
    cross-checks the from-scratch decoders implementation-against-
    implementation; plus randomized BCJ fuzz and the fan-in (BCJ2-
    class) boundary."""
    import random

    from evm_archive_spark.operators.sevenzip import (
        _delta_decode,
        _x86_bcj_decode,
    )

    lz = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}
    prog = b"".join(
        b"\xe8" + struct.pack("<i", k * 9973 - 40000) for k in range(200)
    ) + b"plain tail " * 30 + b"".join(
        b"\xe9" + struct.pack("<i", -k * 31) + b"\x90" for k in range(100)
    )
    tab = bytes(range(256)) * 20
    files = [("prog.bin", prog), ("tab.bin", tab), ("e.txt", b"")]
    for codec in ("delta4+lzma2", "bcj+lzma2"):
        got = {n: d for n, _s, d in
               sevenzip_members(build_7z(files, codec=codec))}
        assert got == dict(files), codec

    # randomized BCJ fuzz: liblzma x86 encode -> our decode == identity
    rng = random.Random(8)
    for trial in range(40):
        n = rng.randint(0, 400)
        raw = bytes(
            rng.choice((0xE8, 0xE9, 0x00, 0xFF, 0x90, 0x41))
            if rng.random() < 0.5 else rng.randrange(256)
            for _ in range(n)
        )
        packed = lzma.compress(
            raw, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_X86}, lz])
        enc = lzma.decompress(
            packed, format=lzma.FORMAT_RAW, filters=[lz])
        assert _x86_bcj_decode(enc) == raw, (trial, n)

    # delta: every distance 1..8 against liblzma
    raw = bytes(rng.randrange(256) for _ in range(777))
    for dist in range(1, 9):
        packed = lzma.compress(
            raw, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_DELTA, "dist": dist}, lz])
        enc = lzma.decompress(
            packed, format=lzma.FORMAT_RAW, filters=[lz])
        assert _delta_decode(enc, dist) == raw, dist

    # a FAN-IN coder (2 inputs, BCJ2-class) stays a typed boundary
    h = bytearray()
    h += struct.pack("B", 0x01)                    # kHeader
    h += struct.pack("B", 0x04)                    # kMainStreamsInfo
    h += struct.pack("B", 0x06) + _wnum(0) + _wnum(2)
    h += struct.pack("B", 0x09) + _wnum(8) + _wnum(8) + struct.pack("B", 0)
    h += struct.pack("B", 0x07) + struct.pack("B", 0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x11]) + b"\x00"        # complex copy: 2 in 1 out
    h += _wnum(2) + _wnum(1)
    h += _wnum(0) + _wnum(1)                       # packed stream indices
    h += struct.pack("B", 0x0C) + _wnum(16) + struct.pack("B", 0)
    h += struct.pack("B", 0x00)
    h += struct.pack("B", 0x05) + _wnum(1)
    name = b"\x00" + "f\x00".encode("utf-16-le")
    h += struct.pack("B", 0x11) + _wnum(len(name)) + name
    h += struct.pack("B", 0x00) + struct.pack("B", 0x00)
    b = _assemble(b"\x00" * 16, bytes(h))
    with pytest.raises(SevenZipError, match="fan-in|chain|scope"):
        list(sevenzip_members(b))


def test_folder_crcs_apply_without_substreams_info():
    # CRCs stored only as UnpackInfo folder CRCs (no kSubStreamsInfo)
    # must still validate members — a flipped payload byte in a
    # CRC-bearing copy folder cannot pass silently
    m = b"crc bearing body"
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(m)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x01]) + b"\x00"
    h += _wnum(0x0C) + _wnum(len(m))
    h += _wnum(0x0A) + b"\x01" + struct.pack("<I", zlib.crc32(m))
    h += _wnum(0x00)                                # UnpackInfo end
    h += _wnum(0x00)                                # StreamsInfo end
    h += _wnum(0x05) + _wnum(1)
    name = b"\x00" + "c\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    good = _assemble(m, bytes(h))
    assert list(sevenzip_members(good)) == [("c", len(m), m)]
    bad = bytearray(good)
    bad[32] ^= 0xFF
    with pytest.raises(SevenZipError, match="CRC"):
        list(sevenzip_members(bytes(bad)))


def test_decoded_folder_memory_is_bounded():
    # folders are consumed in order and only the CURRENT folder's
    # decoded bytes may be held — a tiny archive with many large
    # folders must not accumulate folders x bytes
    import tracemalloc

    per = 4 * 1024 * 1024
    files = [(f"f{i}.bin", bytes([i]) * per) for i in range(8)]
    b = build_7z(files, codec="lzma2")       # highly compressible
    assert len(b) < 64 * 1024
    tracemalloc.start()
    n = 0
    for _name, _sz, _data in sevenzip_members(b):
        n += 1
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 8
    # all-folders caching would peak >= 32 MB of decoded folders (+ the
    # ~8 MB LZMA2 dictionary); one-at-a-time peaks at one folder + one
    # member slice + the dictionary
    assert peak < 6 * per, peak


def test_branch_filters_cross_checked_against_liblzma():
    """ARM / ARM-Thumb / PowerPC / SPARC branch filters: liblzma's OWN
    encoders pack, our from-scratch decoders unpack — the same
    implementation-against-implementation check the x86/delta filters
    got in r8 — plus full-archive round trips for each chain codec."""
    import random

    from evm_archive_spark.operators.sevenzip import (
        _arm_decode,
        _armt_decode,
        _ia64_decode,
        _ppc_decode,
        _sparc_decode,
    )

    rng = random.Random(17)
    lz = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}
    pairs = [
        (lzma.FILTER_ARM, _arm_decode),
        (lzma.FILTER_ARMTHUMB, _armt_decode),
        (lzma.FILTER_POWERPC, _ppc_decode),
        (lzma.FILTER_SPARC, _sparc_decode),
        (lzma.FILTER_IA64, _ia64_decode),
    ]
    hot = (0xEB, 0xF0, 0xF8, 0x48, 0x40, 0x7F, 0x00, 0xFF, 0x01, 0x90)
    for fid, dec in pairs:
        for trial in range(40):
            n = rng.randint(0, 300)
            raw = bytes(
                rng.choice(hot) if rng.random() < 0.6
                else rng.randrange(256)
                for _ in range(n)
            )
            packed = lzma.compress(
                raw, format=lzma.FORMAT_RAW, filters=[{"id": fid}, lz])
            enc = lzma.decompress(
                packed, format=lzma.FORMAT_RAW, filters=[lz])
            assert dec(enc) == raw, (fid, trial, n)

    # IA64's convert predicate (opcode 5, bits 9-11 zero) almost never
    # fires on random bytes — craft predicate-dense bundles so the
    # conversion path is actually exercised (this construction caught
    # a wrong mid-field mask during development)
    bundles = bytearray()
    for t in range(40):
        bundle = bytearray(
            rng.randrange(256) for _ in range(16))
        bundle[0] = (0x10, 0x12, 0x16)[t % 3]      # branch templates
        norm = rng.getrandbits(41)
        norm &= ~(0xF << 37)
        norm |= 5 << 37                            # opcode 5
        norm &= ~(0x7 << 9)                        # bits 9-11 zero
        instr = int.from_bytes(bundle[10:16], "little")
        instr = (instr & 0x7F) | ((norm & ((1 << 41) - 1)) << 7)
        bundle[10:16] = (instr & ((1 << 48) - 1)).to_bytes(6, "little")
        bundles += bundle
    packed = lzma.compress(
        bytes(bundles), format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_IA64}, lz])
    enc = lzma.decompress(packed, format=lzma.FORMAT_RAW, filters=[lz])
    from evm_archive_spark.operators.sevenzip import _ia64_decode

    assert enc != bytes(bundles)                   # conversions fired
    assert _ia64_decode(enc) == bytes(bundles)

    for codec in ("arm+lzma2", "armt+lzma2", "ppc+lzma2", "sparc+lzma2",
                  "ia64+lzma2"):
        got = list(sevenzip_members(build_7z(FILES, codec=codec)))
        assert got == [(n, len(d), d) for n, d in FILES], codec


def test_bcj2_folders_decode():
    """BCJ2 (the 4-stream x86 coder, default for large executables):
    randomized encode->decode round trips over marker-dense buffers,
    plus full archives in both the raw 4-stream layout and the
    real-world main-through-LZMA2 fan-in graph."""
    import random

    from evm_archive_spark.operators.sevenzip import (
        _bcj2_decode,
        _bcj2_encode,
    )

    rng = random.Random(23)
    hot = (0xE8, 0xE9, 0x0F, 0x80, 0x85, 0x8F, 0x00, 0xFF, 0x90)
    for trial in range(120):
        n = rng.randint(0, 500)
        raw = bytes(
            rng.choice(hot) if rng.random() < 0.5 else rng.randrange(256)
            for _ in range(n)
        )
        m, c, j, r = _bcj2_encode(raw)
        assert _bcj2_decode(m, c, j, r, len(raw)) == raw, (trial, n)

    # E8 operands land in the CALL stream, E9/jcc in JUMP — pin the
    # stream split on a crafted buffer with all three marker kinds
    prog = (b"\xe8" + struct.pack("<i", 64) + b"\x90"
            + b"\xe9" + struct.pack("<i", -32)
            + b"\x0f\x85" + struct.pack("<i", 100) + b"tail")
    m, c, j, r = _bcj2_encode(prog)
    assert len(c) == 4 and len(j) == 8
    assert _bcj2_decode(m, c, j, r, len(prog)) == prog

    for codec in ("bcj2", "bcj2+lzma2"):
        got = {n: d for n, _s, d in
               sevenzip_members(build_7z(FILES, codec=codec))}
        assert got == dict(FILES), codec

    # truncated control stream is typed, not a crash
    with pytest.raises(SevenZipError, match="control stream"):
        _bcj2_decode(b"\x90" * 8, b"", b"", b"\x00\x00", 8)
    # exhausted address stream is typed
    m2, c2, j2, r2 = _bcj2_encode(b"\xe8" + struct.pack("<i", 7) + b"x")
    with pytest.raises(SevenZipError, match="address stream"):
        _bcj2_decode(m2, b"", j2, r2, 6)


def test_huge_declared_dict_size_is_clamped():
    """A crafted LZMA2 prop byte of 40 declares a 4 GiB dictionary;
    liblzma allocates the dictionary up front, so without the clamp a
    tiny archive forces a multi-GiB allocation attempt.  The clamp to
    the declared output size is lossless (match distances never exceed
    bytes produced) — the member still decodes, small."""
    import tracemalloc

    data = b"clamped dict payload " * 40
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16}])
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(packed)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x21]) + b"\x21" + _wnum(1) + bytes([40])
    h += _wnum(0x0C) + _wnum(len(data)) + _wnum(0x00)
    h += _wnum(0x00)
    h += _wnum(0x05) + _wnum(1)
    name = b"\x00" + "d\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b = _assemble(packed, bytes(h))
    tracemalloc.start()
    got = list(sevenzip_members(b))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert got == [("d", len(data), data)]
    assert peak < 16 * 1024 * 1024, peak

    # same for LZMA1's u32 dict-size prop at its 4 GiB maximum
    packed1 = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                  "dict_size": 1 << 16}])
    props = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 0xFFFFFFFF)
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(packed1)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x23]) + b"\x03\x01\x01"
    h += _wnum(len(props)) + props
    h += _wnum(0x0C) + _wnum(len(data)) + _wnum(0x00)
    h += _wnum(0x00)
    h += _wnum(0x05) + _wnum(1)
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b1 = _assemble(packed1, bytes(h))
    tracemalloc.start()
    got1 = list(sevenzip_members(b1))
    _cur, peak1 = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert got1 == [("d", len(data), data)]
    assert peak1 < 16 * 1024 * 1024, peak1


def test_multi_substream_without_ksize_rejected():
    """kNumUnpackStream > 1 for a folder with kSize omitted: 7-Zip's
    reader rejects the layout; the old fallback silently treated the
    folder as ONE full-size substream and mis-sliced members."""
    m1, m2 = b"first member body", b"second one"
    body = m1 + m2
    h = bytearray()
    h += _wnum(0x01)
    h += _wnum(0x04)
    h += _wnum(0x06) + _wnum(0) + _wnum(1)
    h += _wnum(0x09) + _wnum(len(body)) + _wnum(0x00)
    h += _wnum(0x07) + _wnum(0x0B) + _wnum(1) + b"\x00"
    h += _wnum(1) + bytes([0x01]) + b"\x00"        # copy coder
    h += _wnum(0x0C) + _wnum(len(body)) + _wnum(0x00)
    h += _wnum(0x08)                               # kSubStreamsInfo
    h += _wnum(0x0D) + _wnum(2)                    # 2 substreams, NO kSize
    h += _wnum(0x00)
    h += _wnum(0x00)
    h += _wnum(0x05) + _wnum(2)
    name = b"\x00" + "m1\x00m2\x00".encode("utf-16-le")
    h += _wnum(0x11) + _wnum(len(name)) + name
    h += _wnum(0x00) + _wnum(0x00)
    b = _assemble(body, bytes(h))
    with pytest.raises(SevenZipError, match="without kSize"):
        list(sevenzip_members(b))


def test_property_roundtrip_random_file_sets():
    """Hypothesis: arbitrary (name, bytes) file sets — including empty
    payloads, unicode names, and duplicate content — round-trip every
    builder codec exactly, in order."""
    from hypothesis import given, settings, strategies as st

    names = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xD7FF,
            blacklist_characters="\x00\x7f",
        ),
        min_size=1, max_size=24,
    )
    blobs = st.binary(max_size=600)
    fileset = st.lists(st.tuples(names, blobs), max_size=6)

    @settings(max_examples=25, deadline=None)
    @given(
        files=fileset,
        codec=st.sampled_from(
            ["copy", "lzma2", "delta4+lzma2", "bcj+lzma2",
             "arm+lzma2", "armt+lzma2", "ppc+lzma2", "sparc+lzma2",
             "ia64+lzma2", "bcj2", "bcj2+lzma2"]),
    )
    def check(files, codec):
        got = list(sevenzip_members(build_7z(files, codec=codec)))
        # members yield in FILE order (empty files inline)
        assert got == [(n, len(d), d) for n, d in files]

    check()


def test_arm64_filter_cross_checked_against_liblzma_ctypes():
    """ARM64 (coder 0x0a): the stdlib lzma module predates
    FILTER_ARM64, but the system liblzma (5.4+) ships it — drive
    lzma_raw_buffer_encode through ctypes with an [ARM64, LZMA2]
    chain, strip the LZMA2 layer with the stdlib, and require our
    encoder's transform to be BYTE-IDENTICAL (then decode back).
    BL/ADRP-dense crafted buffers exercise both instruction forms and
    the +/- 512 MiB ADRP window edge."""
    import ctypes as C
    import lzma
    import os
    import random

    from evm_archive_spark.operators.sevenzip import (
        _arm64_code,
        _arm64_decode,
    )

    try:
        lib = C.CDLL("liblzma.so.5")
    except OSError:
        pytest.skip("no system liblzma")

    class Filter(C.Structure):
        _fields_ = [("id", C.c_uint64), ("options", C.c_void_p)]

    opts = C.create_string_buffer(512)
    if lib.lzma_lzma_preset(opts, 1):
        pytest.skip("lzma_lzma_preset failed")

    def raw_encode(data: bytes) -> bytes:
        filters = (Filter * 3)(
            Filter(0x0A, None),                     # LZMA_FILTER_ARM64
            Filter(0x21, C.cast(opts, C.c_void_p)),  # LZMA2
            Filter(2**64 - 1, None),                # VLI_UNKNOWN end
        )
        out = C.create_string_buffer(len(data) * 2 + 4096)
        out_pos = C.c_size_t(0)
        r = lib.lzma_raw_buffer_encode(
            filters, None, data, C.c_size_t(len(data)), out,
            C.byref(out_pos), C.c_size_t(len(out)))
        if r == 8:                                  # LZMA_OPTIONS_ERROR
            pytest.skip("system liblzma lacks FILTER_ARM64")
        assert r == 0, r
        return out.raw[: out_pos.value]

    rng = random.Random(61)
    for _ in range(120):
        words = []
        for _w in range(rng.randrange(1, 160)):
            r = rng.random()
            if r < 0.4:                              # BL
                words.append((0x25 << 26) | rng.getrandbits(26))
            elif r < 0.8:                            # ADRP-shaped
                words.append(0x90000000
                             | (rng.getrandbits(2) << 29)
                             | (rng.getrandbits(19) << 5)
                             | rng.getrandbits(5))
            else:
                words.append(rng.getrandbits(32))
        data = b"".join(w.to_bytes(4, "little") for w in words)
        data += os.urandom(rng.randrange(4))         # ragged tail
        stripped = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 23}],
        ).decompress(raw_encode(data))
        assert stripped == _arm64_code(data, 0, encode=True)
        assert _arm64_decode(stripped) == data


def test_arm64_folder_roundtrip():
    import os

    files = [("bin/app", os.urandom(3000)), ("a.txt", b"x" * 257),
             ("empty", b"")]
    arc = build_7z(files, codec="arm64+lzma2")
    got = sorted((n, d) for n, _s, d in sevenzip_members(arc))
    assert got == sorted((n, d) for n, d in files)
