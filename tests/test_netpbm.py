"""NetPBM (P1-P7) decode: independent-writer round trips across every
form, header torture (comments, separator rules, P1 digit runs),
maxval scaling incl. 2-byte big-endian samples, PAM tuple types,
typed boundaries, truncation fuzz, and the imagecodec dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.netpbm import (
    PnmError,
    build_pnm,
    decode_pnm,
    is_pnm,
)


def test_roundtrips_all_forms():
    rng = np.random.default_rng(157)
    g = rng.integers(0, 256, (9, 13), dtype=np.uint16)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.uint16)
    bit = (rng.random((6, 19)) < 0.4).astype(np.uint8)
    for kind in ("P2", "P5"):
        out = decode_pnm(build_pnm(g, kind, comment="x # nested"))
        assert np.array_equal(out[:, :, 0], g.astype(np.uint8)), kind
        assert (out[:, :, 0] == out[:, :, 1]).all()
        assert (out[:, :, 3] == 255).all()
    for kind in ("P3", "P6"):
        out = decode_pnm(build_pnm(rgb, kind))
        assert np.array_equal(out[:, :, :3], rgb.astype(np.uint8))
    for kind in ("P1", "P4"):
        # PBM: 1 = black -> decoded 0
        out = decode_pnm(build_pnm(bit, kind))
        assert np.array_equal(out[:, :, 0],
                              ((1 - bit) * 255).astype(np.uint8))
    # PAM depths 1-4
    for d in (1, 2, 3, 4):
        img = rng.integers(0, 256, (5, 6, d), dtype=np.uint16)
        out = decode_pnm(build_pnm(img, "P7"))
        if d in (2, 4):
            assert np.array_equal(out[:, :, 3],
                                  img[:, :, -1].astype(np.uint8))
        else:
            assert (out[:, :, 3] == 255).all()


def test_maxval_scaling_and_16bit():
    """(v * 255 + maxval//2) // maxval — exact at 255, identity for
    v = g*257 at 65535, correct rounding for odd maxvals."""
    rng = np.random.default_rng(163)
    g = rng.integers(0, 256, (8, 8), dtype=np.uint32)
    out = decode_pnm(build_pnm(g * 257, "P5", maxval=65535))
    assert np.array_equal(out[:, :, 0], g.astype(np.uint8))
    g5 = rng.integers(0, 6, (4, 4), dtype=np.uint32)
    for kind in ("P2", "P5"):
        out = decode_pnm(build_pnm(g5, kind, maxval=5))
        assert np.array_equal(
            out[:, :, 0], ((g5 * 255 + 2) // 5).astype(np.uint8))
    # 2-byte BE kicks in at maxval 256 exactly
    g256 = rng.integers(0, 257, (4, 4), dtype=np.uint32)
    out = decode_pnm(build_pnm(g256, "P5", maxval=256))
    assert np.array_equal(
        out[:, :, 0], ((g256 * 255 + 128) // 256).astype(np.uint8))
    # 16-bit PAM
    rgba = rng.integers(0, 65536, (3, 5, 4), dtype=np.uint32)
    out = decode_pnm(build_pnm(rgba, "P7", maxval=65535))
    assert np.array_equal(
        out, ((rgba * 255 + 32767) // 65535).astype(np.uint8))


def test_header_torture():
    # comments between every header field; P1 digits with no spaces
    b = b"P2 # c1\n# c2\n 3 # after width\n2\n# before maxval\n255\n" \
        b"1 2 3 # mid-raster\n4 5 6\n"
    out = decode_pnm(b)
    assert out[:, :, 0].tolist() == [[1, 2, 3], [4, 5, 6]]
    b = b"P1\n# packed digits\n5 2\n01101\n10010\n"
    out = decode_pnm(b)
    assert (out[0, :, 0] == [255, 0, 0, 255, 0]).all()
    # P5 raster may START with a byte that looks like whitespace —
    # only ONE separator byte is consumed
    img = np.full((2, 2), 0x20, dtype=np.uint16)   # all spaces
    out = decode_pnm(build_pnm(img, "P5"))
    assert (out[:, :, 0] == 0x20).all()


def test_typed_boundaries_and_fuzz():
    assert not is_pnm(b"Pq\n")
    assert not is_pnm(b"P8 ")
    with pytest.raises(PnmError, match="not a NetPBM"):
        decode_pnm(b"hello world")
    # sample above declared maxval is typed (binary path)
    b = bytearray(build_pnm(np.full((2, 2), 9, np.uint16), "P5",
                            maxval=9))
    b[-1] = 10
    with pytest.raises(PnmError, match="exceeds declared maxval"):
        decode_pnm(bytes(b))
    # dimension bomb is typed before allocation
    with pytest.raises(PnmError, match="pixel cap"):
        decode_pnm(b"P5 999999 999999 255 ")
    # truncation fuzz: typed, never a crash
    rng = np.random.default_rng(167)
    for kind in ("P2", "P4", "P6", "P7"):
        img = rng.integers(0, 256, (6, 7, 3 if kind in ("P6",) else 1),
                           dtype=np.uint16)
        if kind == "P4":
            img = (img % 2).astype(np.uint8)
        good = build_pnm(img[:, :, 0] if kind != "P6" else img, kind)
        for cut in range(3, len(good) - 1, 7):
            with pytest.raises(PnmError):
                decode_pnm(good[:cut])


def test_imagecodec_dispatch():
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    g = np.arange(64, dtype=np.uint16).reshape(8, 8)
    for kind in ("P1", "P2", "P3", "P4", "P5", "P6", "P7"):
        img = (g % 2).astype(np.uint16) if kind in ("P1", "P4") else (
            np.repeat(g[:, :, None], 3, 2) if kind in ("P3", "P6")
            else g)
        b = build_pnm(img, kind)
        assert known_image(b), kind
        assert decode_image(b).shape == (8, 8, 4), kind
