"""ICO/CUR (favicon) decoder: independent-writer round trips (PNG and
DIB entries, AND-mask alpha, multi-frame best selection), the weak-
magic sniff discipline, typed boundaries, and the imagecodec routing
into the strict multimodal lane."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.ico import (
    IcoError,
    build_ico,
    decode_ico,
    ico_images,
    is_ico,
)


def _rgba(h, w, seed, holes=True):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = np.where(rng.random((h, w)) < 0.3, 0, 255) \
        if holes else 255
    return img


def test_roundtrip_dib_and_png_entries():
    for png in (False, True):
        img = _rgba(16, 16, 17)
        ico = build_ico([img], png=png)
        assert is_ico(ico)
        assert np.array_equal(decode_ico(ico), img), png
    # 256x256 encodes as directory value 0
    big = _rgba(256, 256, 19, holes=False)
    ico = build_ico([big], png=True)
    w, h, _bpp, rgba = next(ico_images(ico))
    assert (w, h) == (256, 256) and np.array_equal(rgba, big)


def test_multi_frame_best_selection():
    frames = [_rgba(8, 8, 23, holes=False), _rgba(32, 32, 29, holes=False),
              _rgba(16, 16, 31, holes=False)]
    ico = build_ico(frames)
    assert decode_ico(ico).shape == (32, 32, 4)
    assert [r.shape[0] for _w, _h, _b, r in ico_images(ico)] == [8, 32, 16]


def test_and_mask_alpha_and_odd_widths():
    """Non-multiple-of-32 widths exercise the 4-byte-aligned 1-bit
    mask rows; the mask drives alpha exactly."""
    for w in (5, 13, 31, 33):
        img = _rgba(7, w, w)
        ico = build_ico([img])
        assert np.array_equal(decode_ico(ico), img), w


def test_weak_magic_sniff_is_directory_validated():
    assert not is_ico(b"\x00\x00\x01\x00" + b"\x00" * 64)  # bogus dir
    assert not is_ico(b"\x00\x00\x01\x00\x01\x00" + b"\xff" * 16)
    assert not is_ico(b"GIF89a")
    # CUR (kind 2) accepted
    ico = bytearray(build_ico([_rgba(4, 4, 37)]))
    struct.pack_into("<H", ico, 2, 2)
    assert is_ico(bytes(ico))
    assert decode_ico(bytes(ico)).shape == (4, 4, 4)


def test_typed_boundaries_and_truncation():
    good = build_ico([_rgba(8, 8, 41)])
    for cut in range(0, len(good), 9):
        with pytest.raises(IcoError):
            decode_ico(good[:cut])
    # odd (non-doubled) DIB height is typed (per-entry via ico_images;
    # decode_ico reports it as the no-decodable aggregate since r10's
    # per-entry tolerance)
    bad = bytearray(good)
    entry_off = struct.unpack_from("<I", bad, 6 + 12)[0]
    struct.pack_into("<i", bad, entry_off + 8, 15)
    with pytest.raises(IcoError, match="doubled"):
        list(ico_images(bytes(bad)))
    with pytest.raises(IcoError, match="no decodable"):
        decode_ico(bytes(bad))
    # compressed DIB entries are typed
    bad = bytearray(good)
    struct.pack_into("<I", bad, entry_off + 16, 1)
    with pytest.raises(IcoError, match="compressed"):
        list(ico_images(bytes(bad)))


def test_best_frame_skips_undecodable_entries():
    """One bad/out-of-scope entry (e.g. a compressed DIB) must not
    fail the icon when another entry decodes (r9 ADVICE); only an ICO
    with NO decodable entry raises."""
    small, big = _rgba(8, 8, 47, holes=False), _rgba(16, 16, 53, holes=False)
    ico = bytearray(build_ico([small, big]))
    # mark the BIG entry's DIB compressed (out of scope) — best-frame
    # selection falls back to the small frame instead of raising
    off_big = struct.unpack_from("<I", ico, 6 + 16 + 12)[0]
    struct.pack_into("<I", ico, off_big + 16, 1)
    assert np.array_equal(decode_ico(bytes(ico)), small)
    # every entry bad: typed
    off_small = struct.unpack_from("<I", ico, 6 + 12)[0]
    struct.pack_into("<I", ico, off_small + 16, 1)
    with pytest.raises(IcoError, match="no decodable"):
        decode_ico(bytes(ico))
    # ico_images (the all-frames walk) still surfaces the per-entry
    # error — only best-frame selection is tolerant
    with pytest.raises(IcoError, match="compressed"):
        list(ico_images(bytes(ico)))


def test_imagecodec_routing():
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    img = _rgba(8, 8, 43)
    ico = build_ico([img], png=True)
    assert known_image(ico)
    assert np.array_equal(decode_image(ico), img)
    assert not known_image(b"\x00\x00\x01\x00 but not really")
