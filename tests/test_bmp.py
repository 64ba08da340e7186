"""Tests for the from-scratch BMP decoder (operators/bmp.py).

Fixture independence: the writer below serializes BMP files directly
from the Microsoft file-format documentation (BITMAPFILEHEADER +
BITMAPINFOHEADER/BITMAPCOREHEADER, palettes, 4-byte row padding, RLE8/
RLE4 escapes) — a second implementation of the format, not the
decoder's inverse.  The cross-codec pin: a BMP and a PNG of the SAME
pixels must aHash identically through the Spark operators.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.bmp import (
    BmpError,
    decode_bmp,
    is_bmp,
)


# ---------------------------------------------------------------------------
# independent writer (spec-derived)
# ---------------------------------------------------------------------------


def _file_header(body_len: int, pix_off: int) -> bytes:
    return struct.pack("<2sIHHI", b"BM", 14 + body_len, 0, 0, pix_off)


def _info_header(
    w: int, h: int, bpp: int, compression: int = 0, n_colors: int = 0,
    img_size: int = 0,
) -> bytes:
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, img_size,
        2835, 2835, n_colors, 0,
    )


def _pad_rows(rows: list[bytes]) -> bytes:
    out = b""
    for r in rows:
        pad = (-len(r)) % 4
        out += r + b"\x00" * pad
    return out


def write_bmp24(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """24-bit BGR, bottom-up unless top_down."""
    h, w = rgb.shape[:2]
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = b""
        for x in range(w):
            r, g, b = rgb[y, x][:3]
            row += bytes([b, g, r])
        rows.append(row)
    body = _pad_rows(rows)
    hdr = _info_header(w, -h if top_down else h, 24)
    pix_off = 14 + len(hdr)
    return _file_header(len(hdr) + len(body), pix_off) + hdr + body


def write_bmp32(rgba: np.ndarray) -> bytes:
    h, w = rgba.shape[:2]
    rows = []
    for y in range(h - 1, -1, -1):
        row = b""
        for x in range(w):
            r, g, b, a = rgba[y, x]
            row += bytes([b, g, r, a])
        rows.append(row)
    body = _pad_rows(rows)
    hdr = _info_header(w, h, 32)
    return _file_header(len(hdr) + len(body), 14 + len(hdr)) + hdr + body


def write_bmp8(idx: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    rows = [bytes(idx[y].tolist()) for y in range(h - 1, -1, -1)]
    body = _pad_rows(rows)
    hdr = _info_header(w, h, 8, n_colors=len(palette))
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(body), pix_off) + hdr + pal + body


def write_bmp4(idx: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(0, w, 2):
            hi = int(idx[y, x]) << 4
            lo = int(idx[y, x + 1]) if x + 1 < w else 0
            row.append(hi | lo)
        rows.append(bytes(row))
    body = _pad_rows(rows)
    hdr = _info_header(w, h, 4, n_colors=len(palette))
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(body), pix_off) + hdr + pal + body


def write_bmp1(idx: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    rows = []
    for y in range(h - 1, -1, -1):
        bits = np.zeros(((w + 7) // 8) * 8, dtype=np.uint8)
        bits[:w] = idx[y]
        rows.append(np.packbits(bits).tobytes())
    body = _pad_rows(rows)
    hdr = _info_header(w, h, 1, n_colors=len(palette))
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(body), pix_off) + hdr + pal + body


def write_bmp16_555(rgb555: np.ndarray) -> bytes:
    """rgb555: (h, w, 3) of 5-bit channel values."""
    h, w = rgb555.shape[:2]
    rows = []
    for y in range(h - 1, -1, -1):
        row = b""
        for x in range(w):
            r, g, b = (int(v) for v in rgb555[y, x])
            row += struct.pack("<H", (r << 10) | (g << 5) | b)
        rows.append(row)
    body = _pad_rows(rows)
    hdr = _info_header(w, h, 16)
    return _file_header(len(hdr) + len(body), 14 + len(hdr)) + hdr + body


def write_bmp_core8(idx: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    """OS/2 BITMAPCOREHEADER flavor: u16 dims, BGR-triple palette."""
    h, w = idx.shape
    hdr = struct.pack("<IHHHH", 12, w, h, 1, 8)
    pal = b"".join(bytes([b, g, r]) for r, g, b in palette)
    rows = [bytes(idx[y].tolist()) for y in range(h - 1, -1, -1)]
    body = _pad_rows(rows)
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(body), pix_off) + hdr + pal + body


def write_bmp_rle8(
    idx: np.ndarray, palette: list[tuple[int, int, int]],
    with_delta: bool = False,
) -> bytes:
    """RLE8: run-length pairs per row + EOL, absolute runs for variety."""
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    enc = bytearray()
    for y in range(h - 1, -1, -1):  # file order starts at the bottom row
        x = 0
        while x < w:
            v = idx[y, x]
            run = 1
            while x + run < w and idx[y, x + run] == v and run < 255:
                run += 1
            if run >= 3 or w - x < 3:
                # run mode encodes any count >= 1; also the only valid
                # encoding near the row end (absolute needs >= 3)
                enc += bytes([run, int(v)])
                x += run
            else:
                n = min(max(3, run), w - x, 255)
                enc += bytes([0, n]) + bytes(int(p) for p in idx[y, x : x + n])
                if n & 1:
                    enc += b"\x00"
                x += n
        enc += b"\x00\x00"  # end of line
    enc += b"\x00\x01"  # end of bitmap
    hdr = _info_header(w, h, 8, compression=1, n_colors=len(palette),
                       img_size=len(enc))
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(enc), pix_off) + hdr + pal + enc


def write_bmp_rle4(idx: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    h, w = idx.shape
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    enc = bytearray()
    for y in range(h - 1, -1, -1):
        x = 0
        while x < w:
            a = int(idx[y, x])
            b2 = int(idx[y, x + 1]) if x + 1 < w else a
            run = 0
            while x + run < w and int(idx[y, x + run]) == (a if run % 2 == 0 else b2) and run < 255:
                run += 1
            enc += bytes([run, (a << 4) | b2])
            x += run
        enc += b"\x00\x00"
    enc += b"\x00\x01"
    hdr = _info_header(w, h, 4, compression=2, n_colors=len(palette),
                       img_size=len(enc))
    pix_off = 14 + len(hdr) + len(pal)
    return _file_header(len(hdr) + len(pal) + len(enc), pix_off) + hdr + pal + enc


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
       (0, 255, 255), (255, 0, 255), (10, 20, 30), (200, 100, 50),
       (1, 2, 3), (4, 5, 6), (7, 8, 9), (11, 12, 13),
       (14, 15, 16), (17, 18, 19), (20, 21, 22), (23, 24, 25)]


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


def test_bmp24_round_trip_and_padding():
    rng = np.random.default_rng(1)
    for w in (1, 2, 3, 5, 16):  # widths exercising every pad remainder
        rgb = _rand_rgb(rng, 7, w)
        out = decode_bmp(write_bmp24(rgb))
        assert out.shape == (7, w, 4)
        assert np.array_equal(out[..., :3], rgb)
        assert (out[..., 3] == 255).all()


def test_bmp24_top_down_equals_bottom_up():
    rng = np.random.default_rng(2)
    rgb = _rand_rgb(rng, 9, 11)
    assert np.array_equal(
        decode_bmp(write_bmp24(rgb)), decode_bmp(write_bmp24(rgb, top_down=True))
    )


def test_bmp32_alpha_and_bgrx_opaque_convention():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    rgba[..., 3] |= 1  # ensure some alpha nonzero
    out = decode_bmp(write_bmp32(rgba))
    assert np.array_equal(out, rgba)
    # BGRX: all-zero alpha decodes as opaque
    x = rgba.copy()
    x[..., 3] = 0
    out2 = decode_bmp(write_bmp32(x))
    assert (out2[..., 3] == 255).all()
    assert np.array_equal(out2[..., :3], x[..., :3])


def test_bmp8_palette():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 16, (10, 13), dtype=np.uint8)
    out = decode_bmp(write_bmp8(idx, PAL))
    expect = np.array([[PAL[i] for i in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_bmp4_and_bmp1_palette():
    rng = np.random.default_rng(5)
    idx4 = rng.integers(0, 16, (8, 9), dtype=np.uint8)  # odd width
    out4 = decode_bmp(write_bmp4(idx4, PAL))
    expect4 = np.array([[PAL[i] for i in row] for row in idx4], dtype=np.uint8)
    assert np.array_equal(out4[..., :3], expect4)

    idx1 = rng.integers(0, 2, (5, 19), dtype=np.uint8)  # non-multiple-of-8
    out1 = decode_bmp(write_bmp1(idx1, PAL[:2]))
    expect1 = np.array([[PAL[i] for i in row] for row in idx1], dtype=np.uint8)
    assert np.array_equal(out1[..., :3], expect1)


def test_bmp16_rgb555_bit_replication():
    rng = np.random.default_rng(6)
    rgb555 = rng.integers(0, 32, (4, 7, 3))
    out = decode_bmp(write_bmp16_555(rgb555))
    expect = ((rgb555 << 3) | (rgb555 >> 2)).astype(np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_bmp_core_header_os2():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 8, (6, 6), dtype=np.uint8)
    out = decode_bmp(write_bmp_core8(idx, PAL[:8]))
    expect = np.array([[PAL[i] for i in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_rle8_round_trip_runs_and_absolute():
    rng = np.random.default_rng(8)
    # stripes (long runs) + noise (absolute runs)
    idx = np.repeat(rng.integers(0, 16, (12, 4), dtype=np.uint8), 5, axis=1)
    idx[3:5] = rng.integers(0, 16, (2, 20), dtype=np.uint8)
    out = decode_bmp(write_bmp_rle8(idx, PAL))
    expect = np.array([[PAL[i] for i in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_rle4_round_trip():
    rng = np.random.default_rng(9)
    idx = np.repeat(rng.integers(0, 16, (7, 3), dtype=np.uint8), 4, axis=1)
    out = decode_bmp(write_bmp_rle4(idx, PAL))
    expect = np.array([[PAL[i] for i in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(out[..., :3], expect)


def test_rle8_delta_escape():
    """Hand-built RLE stream using the delta escape: runs, a (dx,dy)
    jump (skipped pixels keep palette index 0), then end-of-bitmap."""
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in PAL)
    # 4x3, bottom-up: row0(file) = image bottom row
    enc = bytes(
        [
            3, 1,        # bottom row: 3 pixels of idx 1
            0, 2, 1, 1,  # delta dx=1,dy=1 -> skipped pixels stay idx 0
            0, 0,        # EOL -> start of top row
            2, 2,        # top row: 2 pixels of idx 2
            0, 1,        # end of bitmap
        ]
    )
    hdr = _info_header(4, 3, 8, compression=1, n_colors=16, img_size=len(enc))
    pix_off = 14 + len(hdr) + len(pal)
    raw = _file_header(len(hdr) + len(pal) + len(enc), pix_off) + hdr + pal + enc
    out = decode_bmp(raw)
    assert out.shape == (3, 4, 4)
    # bottom row: 3 pixels of PAL[1] then PAL[0]
    assert np.array_equal(out[2, 0, :3], np.array(PAL[1], dtype=np.uint8))
    assert np.array_equal(out[2, 3, :3], np.array(PAL[0], dtype=np.uint8))


def test_rejections():
    good = write_bmp24(np.zeros((2, 2, 3), dtype=np.uint8))
    assert is_bmp(good) and not is_bmp(b"PNG...")
    with pytest.raises(BmpError):
        decode_bmp(b"BMxx")
    with pytest.raises(BmpError):
        decode_bmp(good[:20])
    # unsupported compression value
    bad = bytearray(good)
    bad[30] = 4  # BI_JPEG
    with pytest.raises(BmpError):
        decode_bmp(bytes(bad))
    # absurd dimensions
    bad2 = bytearray(good)
    struct.pack_into("<i", bad2, 18, 1 << 30)
    with pytest.raises(BmpError):
        decode_bmp(bytes(bad2))


def test_bmp_property_random_sweep():
    rng = np.random.default_rng(10)
    for _ in range(10):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        rgb = _rand_rgb(rng, h, w)
        out = decode_bmp(write_bmp24(rgb))
        assert np.array_equal(out[..., :3], rgb)


# ---------------------------------------------------------------------------
# Spark integration (pooled into test_operators_pooled_heavy)
# ---------------------------------------------------------------------------


def _pooled_bmp_through_spark_strict_paths(spark):
    """BMP through the strict multimodal operators: true dims in
    decode_images, pixel aHash equal to the PNG of the same image
    (codec-invariant), one frame-0 row in frame_sample, and resize
    re-encoding to PNG."""
    import pandas as pd

    from evm_archive_spark.operators import multimodal
    from evm_archive_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (24, 17, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    bmp_payload = write_bmp24(rgba[..., :3])
    png_payload = encode_png(rgba)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "payload": [bmp_payload, png_payload]})
    )

    dec = multimodal.decode_images(df, strict=True).toPandas().set_index("media_id")
    assert dec.loc[1, "width"] == 17 and dec.loc[1, "height"] == 24
    assert dec.loc[2, "width"] == 17 and dec.loc[2, "height"] == 24
    assert np.allclose(
        np.array(dec.loc[1, "feature"]), np.array(dec.loc[2, "feature"])
    )  # identical pixel features from both codecs

    hashes = multimodal.image_ahash(df, strict=True).toPandas()
    assert hashes.ahash.nunique() == 1  # BMP == PNG pixels -> same aHash

    frames = multimodal.frame_sample(df, strict=True).toPandas()
    assert len(frames) == 2 and set(frames.frame_idx) == {0}
    assert frames.frame_hash.nunique() == 1  # same pixel hash both codecs

    resized = multimodal.resize_images(
        df.filter("media_id = 1"), 8, 6, strict=True
    ).collect()
    out = decode_png(bytes(resized[0]["payload"]))
    assert out.shape == (6, 8, 4)
