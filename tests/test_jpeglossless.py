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


def test_restart_intervals_roundtrip_and_reset_independence():
    """Row-aligned DRI/RSTn (what real DNG writers emit): exact round
    trips across predictors/precisions, plus the decisive reset pin —
    two images that differ ONLY BEFORE an interval boundary must
    produce byte-identical entropy segments after it (T.81 H.1.1: the
    interval's first line is predicted without reference to anything
    decoded earlier).  A shared encoder/decoder failure to reset
    cannot pass this: the post-boundary segments would differ."""
    from evm_archive_spark.operators.jpeglossless import (
        decode_jpeg_lossless_raw,
    )

    rng = np.random.default_rng(83)
    for pred in range(1, 8):
        img = rng.integers(0, 4096, (9, 6), dtype=np.uint16)
        jpg = build_jpeg_lossless(img, predictor=pred, precision=12,
                                  restart_interval=18)
        out, prec = decode_jpeg_lossless_raw(jpg)
        assert prec == 12
        assert np.array_equal(out[:, :, 0], img), pred

    # reset independence: an interval's entropy segment is a pure
    # function of its OWN rows (+ the shared Huffman table), so
    # splicing interval 2's segment into interval 1's slot must make
    # rows 3-5 decode to rows 6-8's content exactly.  If either side
    # failed to reset prediction at the boundary, the splice would
    # decode to garbage (or the round trips above would fail).
    a = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    ja = build_jpeg_lossless(a, predictor=5, restart_interval=21)
    assert np.array_equal(decode_jpeg(ja)[:, :, 0], a)
    r0 = ja.index(b"\xff\xd0")
    r1 = ja.index(b"\xff\xd1")
    seg2 = ja[r1 + 2:-2]                        # interval 2, pre-EOI
    spliced = ja[:r0 + 2] + seg2 + ja[r1:]
    out = decode_jpeg(spliced)[:, :, 0]
    assert np.array_equal(out[:3], a[:3])
    assert np.array_equal(out[3:6], a[6:9])
    assert np.array_equal(out[6:9], a[6:9])

    # interleaved color with restarts
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    jpg = build_jpeg_lossless(img, predictor=2, restart_interval=10)
    assert np.array_equal(decode_jpeg(jpg)[:, :, :3], img)


def test_restart_typed_boundaries():
    """Mid-line intervals stay typed on BOTH sides; segment-count
    mismatch (missing RSTn) is typed, not silently wrong."""
    from evm_archive_spark.operators.jpeglossless import (
        decode_jpeg_lossless_raw,
    )

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    with pytest.raises(JpegError, match="row-aligned"):
        build_jpeg_lossless(img, restart_interval=12)
    # decoder side: patch a good file's DRI to a mid-line value
    good = build_jpeg_lossless(img, restart_interval=16)
    bad = bytearray(good)
    i = bad.index(b"\xff\xdd")
    bad[i + 4:i + 6] = (12).to_bytes(2, "big")
    with pytest.raises(JpegError, match="mid-line"):
        decode_jpeg_lossless(bytes(bad))
    # strip the restart markers but keep DRI: segment count mismatch
    stripped = good[:good.index(b"\xff\xd0")] + good[-2:]
    with pytest.raises(JpegError, match="segments"):
        decode_jpeg_lossless_raw(stripped)
