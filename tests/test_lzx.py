"""LZX codec (operators/lzx.py): encoder/decoder round trips incl.
multi-frame streams, hand-built verbatim/aligned blocks exercising
the match paths the literal-only encoder never emits, the E8
translation, typed bounds, and the libarchive pin through CAB."""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from evm_archive_spark.operators.lzx import (
    LzxError,
    lzx_compress,
    lzx_decompress,
    lzx_frames,
)


class _W:
    """Test-local LZX bit writer (16-bit LE words, MSB-first)."""

    def __init__(self):
        self.words, self.cur, self.n = [], 0, 0

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 16:
                self.words.append(self.cur)
                self.cur = 0
                self.n = 0

    def bytes(self):
        if self.n:
            self.put(0, 16 - self.n)
        return b"".join(struct.pack("<H", w) for w in self.words)


def test_roundtrip_modes_and_frames():
    rng = np.random.default_rng(11)
    for n in (1, 100, 32768, 32769, 100_000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for mode in ("uncompressed", "verbatim"):
            enc = lzx_compress(data, mode=mode)
            assert lzx_decompress(enc, n) == data, (mode, n)
            frames = lzx_frames(data, mode=mode)
            assert sum(u for _f, u in frames) == n
            assert all(u <= 32768 for _f, u in frames)
            assert b"".join(f for f, _u in frames) == enc


def _tree_header(w, first_deltas, second_deltas):
    """Emit main-tree delta lengths through the fixed test pretree
    {0: len 1, 15: len 2, 16: len 2} (canonical codes 0 / 10 / 11)."""
    pre = [0] * 20
    pre[0], pre[15], pre[16] = 1, 2, 2
    codes = {0: (0, 1), 15: (2, 2), 16: (3, 2)}
    for deltas in (first_deltas, second_deltas):
        if deltas is None:
            continue
        for ln in pre:
            w.put(ln, 4)
        for d in deltas:
            c, n = codes[d]
            w.put(c, n)


def test_hand_built_verbatim_matches_and_repeats():
    """Matches (slot-3 zero-footer offset, then the R0 repeated
    offset) through a hand-built main tree: 'A' len 1, 'B' len 2,
    match symbol 283 len 2."""
    w = _W()
    w.put(0, 1)                                  # no E8
    w.put(1, 3)                                  # verbatim
    w.put(0, 8)
    w.put(7, 16)                                 # block size 7
    lit = [0] * 256
    lit[65], lit[66] = 16, 15                    # len 1, len 2
    pos = [0] * 240
    pos[283 - 256] = 15                          # len 2
    _tree_header(w, lit, pos)
    _tree_header(w, [0] * 249, None)             # empty length tree
    # canonical main: 'A'->0 (1 bit); len-2: 'B'->10, 283->11
    w.put(0, 1)                                  # A
    w.put(2, 2)                                  # B
    # match sym 283: slot 3 (extra 0 -> offset base[3]-2 = 1), len 5
    w.put(3, 2)
    out = lzx_decompress(w.bytes(), 7)
    assert out == b"AB" + b"B" * 5
    # now with the R0 repeat appended: needs main tree len for sym 256
    w2 = _W()
    w2.put(0, 1)
    w2.put(1, 3)
    w2.put(0, 8)
    w2.put(9, 16)
    lit2 = [0] * 256
    lit2[65] = 16                                # 'A' len 1
    pos2 = [0] * 240
    pos2[283 - 256] = 15                         # len 2
    pos2[256 - 256] = 15                         # sym 256 len 2
    _tree_header(w2, lit2, pos2)
    _tree_header(w2, [0] * 249, None)
    # canonical: 'A'->0; len-2 by symbol order: 256->10, 283->11
    w2.put(0, 1)                                 # A
    w2.put(0, 1)                                 # A
    w2.put(3, 2)                                 # match off 1 len 5
    w2.put(2, 2)                                 # R0 repeat len 2
    out = lzx_decompress(w2.bytes(), 9)
    assert out == b"AA" + b"A" * 5 + b"A" * 2


def test_hand_built_aligned_offset_block():
    """Aligned-offset block: slot 8 (3 footer bits) resolves its low
    bits through the 8-symbol aligned tree."""
    w = _W()
    w.put(0, 1)
    w.put(2, 3)                                  # aligned block
    w.put(0, 8)
    w.put(20 + 2, 16)                            # 22 bytes
    for _ in range(8):
        w.put(3, 3)                              # aligned tree: flat 3s
    lit = [0] * 256
    lit[67] = 16                                 # 'C' len 1
    lit[68] = 15                                 # 'D' len 2 (unused,
    pos = [0] * 240                              # completes the tree)
    # slot 8, header 0 -> sym 256 + (8<<3) = 320, mlen 2
    pos[320 - 256] = 15
    _tree_header(w, lit, pos)
    _tree_header(w, [0] * 249, None)
    for _ in range(20):
        w.put(0, 1)                              # 'C' x20
    w.put(3, 2)                                  # match symbol 320
                                                 # ('D' took code 10)
    # aligned slot 8: extra 3 -> no verbatim bits, one aligned symbol
    # offset = base[8] + sym - 2 = 16 + sym - 2
    w.put(4, 3)                                  # aligned sym 4 -> off 18
    out = lzx_decompress(w.bytes(), 22)
    assert out == b"C" * 22                      # self-copy of C's


def test_e8_translation():
    from evm_archive_spark.operators.lzx import _e8_decode

    buf = bytearray(64)
    buf[5] = 0xE8
    struct.pack_into("<i", buf, 6, 1000)         # absolute in range
    buf[20] = 0xE8
    struct.pack_into("<i", buf, 21, -100)        # out of range: kept
    got = _e8_decode(bytearray(buf), filesize=4096)
    assert struct.unpack_from("<i", got, 6)[0] == 1000 - 5
    assert struct.unpack_from("<i", got, 21)[0] == -100


def test_typed_bounds():
    data = b"q" * 100
    enc = lzx_compress(data)
    with pytest.raises(LzxError):
        lzx_decompress(enc[:8], 100)             # truncated
    with pytest.raises(LzxError):
        lzx_decompress(enc, 101)                 # wants more than coded
    with pytest.raises(LzxError, match="window bits"):
        lzx_decompress(enc, 100, window_bits=9)
    # match offset beyond produced output is typed
    w = _W()
    w.put(0, 1)
    w.put(1, 3)
    w.put(0, 8)
    w.put(5, 16)
    lit = [0] * 256
    lit[65] = 16
    lit[66] = 15                                 # completes the tree
    pos = [0] * 240
    pos[283 - 256] = 15
    _tree_header(w, lit, pos)
    _tree_header(w, [0] * 249, None)
    w.put(3, 2)                                  # match first: off 1 > 0
    with pytest.raises(LzxError, match="window|offset"):
        lzx_decompress(w.bytes(), 5)


def test_cab_lzx_roundtrip_and_member_walk():
    import os

    from evm_archive_spark.operators.cab import build_cab, cab_members

    rng = np.random.default_rng(13)
    files = [("a.txt", b"[hello]\r\n" * 50),
             ("b.bin", bytes(rng.integers(0, 256, 90_000,
                                          dtype=np.uint8))),
             ("c.txt", b"tail")]
    cab = build_cab(files, compression="lzx")
    assert list(cab_members(cab)) == [(n, len(d), d) for n, d in files]
    # corrupt LZX payload is typed
    bad = bytearray(cab)
    bad[-40] ^= 0xFF
    from evm_archive_spark.operators.cab import CabError

    with pytest.raises(CabError):
        list(cab_members(bytes(bad)))


@pytest.mark.skipif(shutil.which("bsdtar") is None,
                    reason="no bsdtar (libarchive)")
def test_lzx_cab_cross_checked_against_libarchive(tmp_path):
    """libarchive's own LZX reader must extract our LZX cabinets
    byte-identically — pinning the block headers, pretree coding,
    token stream AND the 32 kB frame realign rule (the multi-frame
    member spans three frames)."""
    rng = np.random.default_rng(17)
    files = [("x.txt", b"data " * 1000),
             ("big.bin", bytes(rng.integers(0, 256, 90_000,
                                            dtype=np.uint8))),
             ("end", b"z")]
    from evm_archive_spark.operators.cab import build_cab

    p = tmp_path / "t.cab"
    p.write_bytes(build_cab(files, compression="lzx"))
    listing = subprocess.run(["bsdtar", "-tf", str(p)],
                             capture_output=True, text=True)
    assert listing.returncode == 0, listing.stderr
    assert listing.stdout.split("\n")[:-1] == [n for n, _d in files]
    dest = tmp_path / "x"
    dest.mkdir()
    run = subprocess.run(["bsdtar", "-xf", str(p), "-C", str(dest)],
                         capture_output=True, text=True)
    assert run.returncode == 0, run.stderr
    for n, d in files:
        assert (dest / n).read_bytes() == d, n


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=1, max_size=2048),
           st.sampled_from(["uncompressed", "verbatim"]))
    def prop(data, mode):
        assert lzx_decompress(lzx_compress(data, mode=mode),
                              len(data)) == data

    prop()
