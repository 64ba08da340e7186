"""Arithmetic JPEG (T.81 QM-coder): raw-coder round trips, spec-table
pin against the system libjpeg's exported state table, and the
both-directions harness pin (tests/jpegarith_harness.c drives the real
libjpeg): libjpeg's arithmetic recoding of any file must decode here
COEFFICIENT-exact, and libjpeg must decode this encoder's streams."""

from __future__ import annotations

import ctypes
import random
import shutil
import subprocess

import numpy as np
import pytest

from evm_archive_spark.operators.jpeg import JpegError, decode_jpeg
from evm_archive_spark.operators.jpegarith import (
    AC_STAT_BINS,
    ArithDecoder,
    ArithEncoder,
    DC_STAT_BINS,
    QM_STATES,
    _Stats,
    encode_jpeg_arith,
    make_fixed_bin,
)

LIBJPEG = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
HARNESS_SRC = "tests/jpegarith_harness.c"


def _harness():
    """Compile (once) and return the libjpeg harness path, or None."""
    import os
    if shutil.which("gcc") is None or not os.path.exists(LIBJPEG):
        return None
    out = "/tmp/jpegarith_harness_test"
    if not os.path.exists(out):
        r = subprocess.run(
            ["gcc", "-O2", "-o", out, HARNESS_SRC, "-ljpeg"],
            capture_output=True)
        if r.returncode != 0:
            return None
    return out


def _run(harness, args, data):
    return subprocess.run([harness] + args, input=data,
                          capture_output=True, check=True).stdout


def _lib_dec(harness, jpg):
    out = _run(harness, ["dec"], jpg)
    hdr, _, rest = out.partition(b"\n")
    w, h, nc = map(int, hdr.split())
    return np.frombuffer(rest, dtype=np.uint8).reshape(h, w, nc)


def test_state_table_matches_system_libjpeg():
    """QM_STATES transcribes ITU-T T.81 Table D.3; the system libjpeg
    exports the same table (jpeg_aritab, packed Qe<<16|NMPS<<8|
    SWITCH<<7|NLPS as 8-byte longs) — pin all 114 states."""
    try:
        lib = ctypes.CDLL(LIBJPEG)
        tab = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    except OSError:
        pytest.skip("system libjpeg not available")
    for i, v in enumerate(tab):
        qe = (v >> 16) & 0xFFFF
        nmps = (v >> 8) & 0xFF
        sw = (v >> 7) & 1
        nlps = v & 0x7F
        assert QM_STATES[i] == (qe, nlps, nmps, sw), i
    # structural invariants: fixed state self-links and never switches
    assert QM_STATES[113] == (0x5A1D, 113, 113, 0)


def test_raw_coder_roundtrip_fuzz():
    """Encoder -> flush -> decoder over random bit/context sequences:
    exercises renormalization, carry propagation through stacked 0xFF
    bytes, byte stuffing, and the D.1.8 flush."""
    rng = random.Random(17)
    for trial in range(60):
        n = rng.randrange(1, 800)
        ctx_n = rng.randrange(1, 20)
        bits = [rng.randrange(2) for _ in range(n)]
        # biased regions stress long MPS runs (carry pressure)
        if trial % 3 == 0:
            bits = [1] * (n // 2) + bits[n // 2:]
        ctxs = [rng.randrange(ctx_n) for _ in range(n)]
        enc = ArithEncoder()
        st_e = _Stats(ctx_n)
        for b, cx in zip(bits, ctxs):
            enc.encode(st_e, cx, b)
        payload = enc.flush()
        # every 0xFF in the stream must be stuffed with 0x00
        for i, byte in enumerate(payload[:-1]):
            if byte == 0xFF:
                assert payload[i + 1] == 0x00, (trial, i)
        dec = ArithDecoder(payload + b"\xff\xd9", 0)
        st_d = _Stats(ctx_n)
        got = [dec.decode(st_d, cx) for cx in ctxs]
        assert got == bits, trial


def test_encode_decode_pattern_exact():
    """Block-structured two-tone images with a unit quant table round
    trip pixel-exactly through our encoder and decoder (DC + AC)."""
    rng = np.random.default_rng(23)
    for _ in range(10):
        pattern = rng.integers(0, 2, (8, 8)).astype(np.uint8)
        img = np.where(np.kron(pattern, np.ones((2, 2), np.uint8)),
                       240, 16).astype(np.uint8)
        jpg = encode_jpeg_arith(img)
        out = decode_jpeg(jpg)[:, :, 0]
        # unit quant keeps worst-case coefficient rounding under +-0.5,
        # so pixel error stays far from the 224-level gap
        sampled = out[::2, ::2]
        want = np.where(pattern, 240, 16)
        assert (np.abs(sampled.astype(int) - want.astype(int)) < 16).all()


def test_truncation_and_garbage_are_typed():
    img = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    jpg = encode_jpeg_arith(img)
    for cut in range(2, len(jpg) - 1, 7):
        with pytest.raises(JpegError):
            decode_jpeg(jpg[:cut])
    # DAC conditioning bounds are typed
    bad = bytearray(jpg)
    i = bad.find(b"\xff\xcc")
    bad[i + 5] = 0x01        # DC value: L=1 > U=0
    with pytest.raises(JpegError, match="DAC"):
        decode_jpeg(bytes(bad))


@pytest.mark.skipif(_harness() is None,
                    reason="gcc/libjpeg harness unavailable")
def test_decode_pinned_against_libjpeg_sequential_and_progressive():
    """Coefficient-exact decode pin: libjpeg transcodes a file between
    Huffman and arithmetic entropy coding (identical quantized
    coefficients), so our Huffman decode and our arithmetic decode
    must agree EXACTLY — no IDCT tolerance anywhere."""
    h = _harness()
    rng = np.random.default_rng(31)
    for height, width, nc in [(16, 16, 1), (24, 17, 3), (56, 40, 3),
                              (33, 47, 1)]:
        shape = (height, width) if nc == 1 else (height, width, nc)
        pix = rng.integers(0, 256, shape, dtype=np.uint8)
        arith = _run(h, ["enc", str(width), str(height), str(nc)],
                     pix.tobytes())
        huff = _run(h, ["t2h"], arith)
        ours_h = decode_jpeg(huff)
        assert np.array_equal(decode_jpeg(_run(h, ["t2a"], huff)),
                              ours_h), (height, width, nc, "seq")
        assert np.array_equal(decode_jpeg(_run(h, ["t2a", "p"], huff)),
                              ours_h), (height, width, nc, "prog")


@pytest.mark.skipif(_harness() is None,
                    reason="gcc/libjpeg harness unavailable")
def test_decode_restart_intervals_against_libjpeg():
    """Restart markers reset the coder + statistics + DC state; pin
    coefficient-exact (our decode of the restart-laden arithmetic file
    vs our decode of its Huffman transcode — same coefficients, so any
    restart mishandling shows as a hard mismatch).  Pixel comparison
    against libjpeg itself is only meaningful for grayscale: libjpeg's
    4:2:0 color decode uses fancy (triangular) chroma upsampling while
    this decoder replicates — a decode-stage difference, not entropy."""
    h = _harness()
    rng = np.random.default_rng(37)
    pix3 = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    pix1 = rng.integers(0, 256, (48, 40), dtype=np.uint8)
    for r in (1, 3, 7):
        jpg = _run(h, ["enc", "40", "48", "3", f"r{r}"], pix3.tobytes())
        huff = _run(h, ["t2h"], jpg)
        assert np.array_equal(decode_jpeg(jpg), decode_jpeg(huff)), r
        jpg1 = _run(h, ["enc", "40", "48", "1", f"r{r}"], pix1.tobytes())
        ref = _lib_dec(h, jpg1)[:, :, 0]
        ours = decode_jpeg(jpg1)[:, :, 0]
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1, r


@pytest.mark.skipif(_harness() is None,
                    reason="gcc/libjpeg harness unavailable")
def test_encoder_pinned_against_libjpeg():
    """Both encoder pins: libjpeg decodes our arithmetic streams, and
    libjpeg's Huffman re-encode of our stream (entropy swap only)
    decodes to EXACTLY the same pixels as our stream does."""
    h = _harness()
    rng = np.random.default_rng(41)
    for height, width, nc in [(8, 8, 1), (24, 17, 1), (16, 16, 3),
                              (64, 64, 3)]:
        shape = (height, width) if nc == 1 else (height, width, nc)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        jpg = encode_jpeg_arith(img)
        ref = _lib_dec(h, jpg)            # libjpeg reads our stream
        ours = decode_jpeg(jpg)
        assert np.abs(
            ours[:, :, :ref.shape[2]].astype(int) - ref.astype(int)
        ).max() <= 2
        huff = _run(h, ["t2h"], jpg)      # coefficient-exact check
        assert np.array_equal(decode_jpeg(huff), ours)


def test_stats_area_sizes():
    """The models never index outside the declared statistics areas
    (drive a worst-case coefficient through encode)."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[0, 0] = 255
    jpg = encode_jpeg_arith(img)
    assert decode_jpeg(jpg).shape == (8, 8, 4)
    assert DC_STAT_BINS == 64 and AC_STAT_BINS == 256
    fixed = make_fixed_bin()
    assert fixed.b[0] == 113
