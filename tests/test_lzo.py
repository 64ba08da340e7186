"""LZO1X codec (operators/lzo.py): compressor/decompressor round
trips over adversarial shapes, full-instruction-set decode of
hand-built streams, and the typed bounds."""

from __future__ import annotations

import random

import pytest

from evm_archive_spark.operators.lzo import (
    LzoError,
    lzo1x_compress,
    lzo1x_decompress,
)


def test_roundtrip_shapes():
    random.seed(11)
    cases = [b"", b"a", b"ab", b"abc", b"aaaa" * 600,
             bytes(range(256)) * 50, b"\x00" * 9000,
             b"hello world! " * 700]
    for _ in range(40):
        n = random.randrange(0, 30000)
        parts = []
        while sum(map(len, parts)) < n:
            if random.random() < 0.5:
                parts.append(bytes(random.randrange(256)
                                   for _ in range(random.randrange(1, 60))))
            else:
                parts.append(bytes([random.randrange(256)])
                             * random.randrange(1, 300))
        cases.append(b"".join(parts)[:n])
    for i, c in enumerate(cases):
        enc = lzo1x_compress(c)
        assert lzo1x_decompress(enc, len(c) + 16) == c, i
    # repetitive input genuinely compresses (matches are emitted)
    text = b"the quick brown fox " * 400
    assert len(lzo1x_compress(text)) < len(text) // 4


def test_full_instruction_set_decode():
    """Hand-built streams exercise the decode arms our encoder never
    emits: M1 (state 1-3 and state 4), M2 both forms, M4 long
    distance, and extended lengths."""
    # first-byte run of 3 (state 3) -> M1 2-byte match d=1 -> EOS
    s = bytes([17 + 3]) + b"abc" + bytes([0b0000_0000, 0]) + b"\x11\x00\x00"
    assert lzo1x_decompress(s, 64) == b"abccc"[:5]
    # long literal 4+ (state 4) -> 0..15 instruction = 3-byte match
    # at distance 2049: needs >2049 of window first, via 255-extension
    lit = bytes((i * 7) % 256 for i in range(2100))
    t = len(lit) - 3 - 15                       # encoded via 0-marker
    ext = [0]
    while t > 255:
        ext.append(0)
        t -= 255
    ext.append(t)
    s = bytes(ext) + lit + bytes([0b0000_0000, 0]) + b"\x11\x00\x00"
    out = lzo1x_decompress(s, 4096)
    assert out == lit + lit[-2049:-2046]
    # M2 short form (64..127): len 3, d = (H<<3)+D+1
    s = bytes([17 + 4]) + b"wxyz" + bytes([0b0100_0000, 0]) \
        + b"\x11\x00\x00"
    assert lzo1x_decompress(s, 64) == b"wxyz" + b"zzz"
    # M2 long form (128..255): len 5, d=1
    s = bytes([17 + 1]) + b"q" + bytes([0b1000_0000, 0]) + b"\x11\x00\x00"
    assert lzo1x_decompress(s, 64) == b"q" + b"qqqqq"
    # M4: distance > 16384 band
    lit = bytes((i * 3) % 251 for i in range(16500))
    t = len(lit) - 3 - 15                       # 15 + 255*z + b form
    z, b = divmod(t, 255)
    if b == 0:
        z, b = z - 1, 255
    s = bytes([0] + [0] * z + [b]) + lit
    d = 16450                                   # in the 16..48k band
    le = (d - 16384) << 2
    s += bytes([0b0001_0000 | 3]) + bytes([le & 0xFF, le >> 8]) \
        + b"\x11\x00\x00"
    out = lzo1x_decompress(s, 32768)
    assert out == lit + lit[len(lit) - d:len(lit) - d + 5]


def test_typed_bounds():
    with pytest.raises(LzoError, match="too short"):
        lzo1x_decompress(b"\x11", 64)
    # bad EOS length
    with pytest.raises(LzoError, match="end-of-stream"):
        lzo1x_decompress(bytes([18, 65, 0x12, 0x00, 0x00]), 64)
    # distance beyond window
    with pytest.raises(LzoError, match="window"):
        lzo1x_decompress(bytes([18, 65, 0b0100_0000, 200])
                         + b"\x11\x00\x00", 64)
    # output cap
    enc = lzo1x_compress(b"y" * 5000)
    with pytest.raises(LzoError, match="cap"):
        lzo1x_decompress(enc, 100)
    # truncated stream
    enc = lzo1x_compress(b"hello world " * 50)
    with pytest.raises(LzoError):
        lzo1x_decompress(enc[:-3], 4096)


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4096),
           st.binary(min_size=1, max_size=16),
           st.integers(min_value=1, max_value=40))
    def prop(junk, unit, reps):
        data = junk + unit * reps + junk[::-1]
        assert lzo1x_decompress(lzo1x_compress(data),
                                len(data) + 8) == data

    prop()
