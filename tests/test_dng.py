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
    # packed sub-16-bit uncompressed is typed
    with pytest.raises(DngError, match="packed"):
        decode_dng_raw(build_dng(mosaic, bits=12, compression=1))
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
