"""PSD composite decoder: independent-writer round trips across
modes/compressions, section skipping, typed boundaries, imagecodec
routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.psd import (
    PsdError,
    build_psd,
    decode_psd,
    is_psd,
)


def test_roundtrip_modes_and_compressions():
    rng = np.random.default_rng(113)
    for rle in (False, True):
        g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        out = decode_psd(build_psd(g, rle=rle))
        assert np.array_equal(out[:, :, 0], g)
        assert (out[:, :, 1] == g).all() and (out[:, :, 3] == 255).all()
        rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_psd(build_psd(rgb, rle=rle))[:, :, :3], rgb)
        rgba = rng.integers(0, 256, (6, 10, 4), dtype=np.uint8)
        assert np.array_equal(decode_psd(build_psd(rgba, rle=rle)), rgba)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    out = decode_psd(build_psd(idx, mode=2, palette=pal))
    assert np.array_equal(out[:, :, :3], pal[idx])


def test_rle_runs_and_flat_rows():
    """Long runs exercise PackBits replicate coding; flat images are
    the RLE best case."""
    img = np.zeros((16, 200), dtype=np.uint8)
    img[:, 50:150] = 255
    d = build_psd(img, rle=True)
    assert len(d) < img.size // 4          # actually compressed
    assert np.array_equal(decode_psd(d)[:, :, 0], img)


def test_sections_are_skipped():
    """Non-empty image-resources and layers sections (what real PSDs
    always carry) must be skipped to reach the composite."""
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    d = bytearray(build_psd(g, rle=False))
    # splice a fake 12-byte resources section in (section 2 of 3)
    pos = 26
    (ln0,) = struct.unpack_from(">I", d, pos)
    pos += 4 + ln0
    assert struct.unpack_from(">I", d, pos)[0] == 0
    d[pos:pos + 4] = struct.pack(">I", 12)
    d[pos + 4: pos + 4] = b"8BIM\x04\x24\x00\x00\x00\x00\x00\x00"
    out = decode_psd(bytes(d))
    assert np.array_equal(out[:, :, 0], g)


def test_typed_boundaries_and_truncation():
    g = np.zeros((4, 4), dtype=np.uint8)
    good = build_psd(g)
    with pytest.raises(PsdError, match="not a PSD"):
        decode_psd(b"8BPS\x00\x02" + bytes(20))   # version 2 (PSB)
    bad = bytearray(good)
    struct.pack_into(">H", bad, 22, 16)           # 16-bit depth
    with pytest.raises(PsdError, match="16-bit"):
        decode_psd(bytes(bad))
    bad = bytearray(good)
    struct.pack_into(">H", bad, 24, 4)            # CMYK
    with pytest.raises(PsdError, match="CMYK"):
        decode_psd(bytes(bad))
    for cut in range(6, len(good), 7):
        with pytest.raises(PsdError):
            decode_psd(good[:cut])


def test_imagecodec_routing():
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    rng = np.random.default_rng(127)
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    d = build_psd(rgba)
    assert known_image(d)
    assert np.array_equal(decode_image(d), rgba)
