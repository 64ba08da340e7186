"""Lossless JPEG (SOF3): exact round trips across all predictors and
point transforms, first-row/column rules, typed boundaries.  No
system pin exists (libjpeg-turbo 2.1 predates lossless support), so
like BCJ2 the check is the independent encoder + structure tests —
and losslessness makes every comparison exact."""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.jpeg import JpegError, decode_jpeg
from evm_archive_spark.operators.jpeglossless import (
    build_jpeg_lossless,
    decode_jpeg_lossless,
)


def test_all_predictors_point_transforms_exact():
    rng = np.random.default_rng(67)
    for pred in range(1, 8):
        for pt in (0, 1, 3):
            img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
            jpg = build_jpeg_lossless(img, predictor=pred,
                                      point_transform=pt)
            out = decode_jpeg(jpg)[:, :, 0]    # routes through SOF3
            assert np.array_equal(out, (img >> pt) << pt), (pred, pt)


def test_color_and_degenerate_shapes():
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(build_jpeg_lossless(img, predictor=4))[:, :, :3],
        img)
    for shape in [(1, 1), (1, 9), (9, 1), (2, 2)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(build_jpeg_lossless(g, predictor=7))[:, :, 0], g)


def test_worst_case_diffs_and_smooth_images():
    """Alternating extremes force every diff category; gradients hit
    the predictors' intended regime."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[::2, ::2] = 255
    for pred in (1, 4, 6):
        assert np.array_equal(
            decode_jpeg(build_jpeg_lossless(img, predictor=pred))[:, :, 0],
            img)
    grad = np.add.outer(np.arange(16) * 3,
                        np.arange(16) * 5).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(build_jpeg_lossless(grad, predictor=4))[:, :, 0], grad)


def test_typed_boundaries_and_truncation():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = build_jpeg_lossless(img)
    for cut in range(4, len(good) - 1, 5):
        with pytest.raises(JpegError):
            decode_jpeg_lossless(good[:cut] if good[cut - 1] != 0xFF
                                 else good[:cut - 1])
    # >8-bit precision typed
    bad = bytearray(good)
    i = bad.index(b"\xff\xc3")
    bad[i + 4] = 12
    with pytest.raises(JpegError, match="12-bit"):
        decode_jpeg_lossless(bytes(bad))
    # bad predictor typed
    bad = bytearray(good)
    j = bad.index(b"\xff\xda")
    bad[j + 2 + 4 + 1] = 0
    with pytest.raises(JpegError, match="predictor"):
        decode_jpeg_lossless(bytes(bad))
