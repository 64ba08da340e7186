"""DNG raw-image face: independent-writer round trips across bit
depths / tile layouts / compressions / byte orders, metadata fields,
and typed boundaries.  Losslessness makes every sample comparison
exact (the SOF3 layer itself is libjpeg-pinned in test_jpegarith /
own-encoder-pinned in test_jpeglossless)."""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.dng import (
    DngError,
    build_dng,
    decode_dng_raw,
    dng_metadata,
    is_dng,
)


def test_roundtrip_bits_tiles_compressions():
    rng = np.random.default_rng(103)
    for bits in (10, 12, 14, 16):
        for tiles in (None, (16, 16), (8, 8)):
            mosaic = rng.integers(0, 1 << bits, (22, 30),
                                  dtype=np.uint16)
            d = build_dng(mosaic, bits=bits, tile_size=tiles,
                          predictor=1 + bits % 7)
            assert is_dng(d)
            out, ob = decode_dng_raw(d)
            assert ob == bits and np.array_equal(out, mosaic), (
                bits, tiles)
    # uncompressed 16-bit, both byte orders
    mosaic = rng.integers(0, 65536, (9, 11), dtype=np.uint16)
    for bo in ("<", ">"):
        d = build_dng(mosaic, bits=16, compression=1, byte_order=bo)
        out, _ = decode_dng_raw(d)
        assert np.array_equal(out, mosaic), bo
    # uncompressed PACKED sub-16-bit rows (round 10): MSB-first,
    # byte-padded per row; odd widths exercise the row padding
    for bits in (8, 10, 12, 14):
        for tiles in (None, (8, 8)):
            m = rng.integers(0, 1 << bits, (13, 21), dtype=np.uint16)
            d = build_dng(m, bits=bits, compression=1, tile_size=tiles)
            out, ob = decode_dng_raw(d)
            assert ob == bits and np.array_equal(out, m), (bits, tiles)


def test_metadata_fields():
    mosaic = np.zeros((8, 8), dtype=np.uint16)
    d = build_dng(mosaic, bits=14, cfa="GBRG", model="TestCam X1")
    m = dng_metadata(d)
    assert m == {
        "dng_version": "1.4.0.0",
        "camera_model": "TestCam X1",
        "width": 8,
        "height": 8,
        "bits_per_sample": 14,
        "compression": 7,
        "cfa_pattern": "GBRG",
    }


def test_typed_boundaries_and_fuzz():
    import struct

    mosaic = np.arange(64, dtype=np.uint16).reshape(8, 8)
    good = build_dng(mosaic, bits=12)
    # a plain TIFF is not a DNG
    from test_tiff import encode_tiff

    plain = encode_tiff(np.zeros((4, 4), dtype=np.uint8))
    assert not is_dng(plain)
    with pytest.raises(DngError, match="DNGVersion|CFA"):
        dng_metadata(plain)
    # packed sub-16-bit uncompressed decodes since r10; a SHORT packed
    # chunk stays typed
    packed = build_dng(mosaic, bits=12, compression=1)
    out, ob = decode_dng_raw(packed)
    assert ob == 12 and np.array_equal(out, mosaic)
    with pytest.raises(DngError):
        decode_dng_raw(packed[:-8])
    # SOF3 precision disagreeing with BitsPerSample is typed
    bad = bytearray(good)
    i = bad.index(struct.pack("<HHI", 258, 3, 1))
    struct.pack_into("<H", bad, i + 8, 10)       # claim 10-bit
    with pytest.raises(DngError, match="precision"):
        decode_dng_raw(bytes(bad))
    # truncation fuzz: typed, never a crash
    for cut in range(8, len(good), 17):
        try:
            decode_dng_raw(good[:cut])
        except (DngError, ValueError):
            pass


def test_ragged_tiles_and_predictors():
    rng = np.random.default_rng(107)
    mosaic = rng.integers(0, 1 << 12, (21, 26), dtype=np.uint16)
    for pred in range(1, 8):
        d = build_dng(mosaic, bits=12, tile_size=(16, 16),
                      predictor=pred)
        out, _ = decode_dng_raw(d)
        assert np.array_equal(out, mosaic), pred


def test_interleaved_sof3_components():
    """Real camera DNGs encode the mosaic as n-component SOF3 frames
    at width/n (columns interleaved) — round trips exactly, tiled and
    striped (review finding: previously misreported as a short
    chunk)."""
    rng = np.random.default_rng(109)
    mosaic = rng.integers(0, 1 << 14, (20, 28), dtype=np.uint16)
    for nc, tiles in [(2, None), (2, (14, 10)), (4, (28, 10)),
                      (2, (4, 6))]:
        d = build_dng(mosaic, bits=14, tile_size=tiles,
                      sof3_components=nc)
        out, b = decode_dng_raw(d)
        assert b == 14 and np.array_equal(out, mosaic), (nc, tiles)


def test_sof3_dimension_bomb_and_empty_tags_typed():
    import struct
    import tracemalloc

    from evm_archive_spark.operators.jpeg import JpegError
    from evm_archive_spark.operators.jpeglossless import (
        build_jpeg_lossless,
        decode_jpeg_lossless_raw,
    )

    # a ~100-byte chunk claiming 65535x65535 must be typed, not an
    # allocation (review finding)
    small = bytearray(build_jpeg_lossless(np.zeros((4, 4), np.uint8)))
    i = small.index(b"\xff\xc3")
    struct.pack_into(">HH", small, i + 5, 65535, 65535)
    tracemalloc.start()
    with pytest.raises(JpegError, match="sample cap"):
        decode_jpeg_lossless_raw(bytes(small))
    _c, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 32 * 1024 * 1024
    # >8-bit streams reject AT THE SOF for the RGBA lane (no full
    # decode first)
    from evm_archive_spark.operators.jpeg import decode_jpeg

    hi = build_jpeg_lossless(
        np.zeros((4, 4), dtype=np.uint16), precision=12)
    with pytest.raises(JpegError, match="out of scope"):
        decode_jpeg(hi)
    # a present-but-count-0 tag stays typed (never IndexError)
    good = bytearray(build_dng(np.zeros((8, 8), np.uint16), bits=16))
    j = bytes(good).index(struct.pack("<HHI", 262, 3, 1))
    struct.pack_into("<I", good, j + 4, 0)       # count 1 -> 0
    with pytest.raises(DngError):
        decode_dng_raw(bytes(good))
    # writer CFA validation is typed
    with pytest.raises(DngError, match="CFA"):
        build_dng(np.zeros((4, 4), np.uint16), cfa="RGXB")


def test_restart_interval_tiles_and_strips():
    """r11: row-aligned DRI/RSTn inside SOF3 tiles and strips — the
    layout real DNG writers emit (restart per few MCU rows).  Exact
    sample equality across bit depths, tiling, predictors, and the
    2-component interleaved-columns form."""
    rng = np.random.default_rng(211)
    for bits in (12, 14, 16):
        for tiles in (None, (8, 8)):
            for rr in (1, 4):
                m = rng.integers(0, 1 << bits, (16, 16),
                                 dtype=np.uint16)
                d = build_dng(m, bits=bits, tile_size=tiles,
                              predictor=1 + bits % 7, restart_rows=rr)
                out, ob = decode_dng_raw(d)
                assert ob == bits and np.array_equal(out, m), (
                    bits, tiles, rr)
    # interleaved 2-component SOF3 with restarts
    m = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    d = build_dng(m, bits=12, sof3_components=2, restart_rows=2,
                  tile_size=(8, 8))
    out, _ = decode_dng_raw(d)
    assert np.array_equal(out, m)
