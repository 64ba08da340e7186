"""GIF codec tests (decoder: operators/gif.py).

Fixtures come from an INDEPENDENT from-scratch encoder defined here (the
test_png.py / test_jpeg.py pattern): it writes fixed-width LZW with
periodic CLEAR codes (the classic "uncompressed GIF" technique) while
mirroring the decoder's dictionary-growth accounting only to know when a
CLEAR is due — no decode logic is shared.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.gif import (
    GifError,
    decode_gif,
    decode_gif_frames,
    is_gif,
)


# --------------------------------------------------------------------------
# independent encoder
# --------------------------------------------------------------------------


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, width):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0


def _lzw_encode_uncompressed(indices, min_code):
    """Pixel indices as literal codes at fixed width min_code+1, CLEAR
    emitted whenever the decoder's dictionary would force a width bump."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    w = _LsbWriter()
    w.put(clear, width)
    table_len = clear + 2
    first = True
    for v in indices:
        w.put(int(v), width)
        if first:
            first = False
            continue
        table_len += 1
        if table_len == (1 << width) - 1:
            w.put(clear, width)
            table_len = clear + 2
            first = True
    w.put(end, width)
    w.flush()
    return bytes(w.out)


def _interlace_rows(h):
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def encode_gif(
    screen_size,
    palette,
    frames,
    interlace=False,
    version=b"GIF89a",
):
    """``frames``: list of dicts {idx: 2d index array, left, top,
    transparent: index|None, disposal: int}."""
    sw, sh = screen_size
    n_pal = len(palette)
    size_bits = max(1, (n_pal - 1).bit_length())
    full = 1 << size_bits
    out = bytearray(version)
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (size_bits - 1), 0, 0])
    for r, g, b in list(palette) + [(0, 0, 0)] * (full - n_pal):
        out += bytes([r, g, b])
    for f in frames:
        idx = np.asarray(f["idx"], dtype=np.uint8)
        h, w = idx.shape
        if f.get("transparent") is not None or f.get("disposal"):
            flags = ((f.get("disposal", 0) & 0x07) << 2) | (
                1 if f.get("transparent") is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, flags, 0, 0,
                          f.get("transparent") or 0, 0])
        out += bytes([0x2C])
        out += struct.pack("<HHHH", f.get("left", 0), f.get("top", 0), w, h)
        out += bytes([0x40 if interlace else 0x00])
        rows = idx[_interlace_rows(h)] if interlace else idx
        min_code = max(2, size_bits)
        out += bytes([min_code])
        data = _lzw_encode_uncompressed(rows.flatten(), min_code)
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def _palette(n, seed=5):
    rng = np.random.default_rng(seed)
    return [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(n)]


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_static_roundtrip_and_sniff():
    rng = np.random.default_rng(7)
    pal = _palette(16)
    idx = rng.integers(0, 16, size=(23, 31), dtype=np.uint8)
    data = encode_gif((31, 23), pal, [{"idx": idx}])
    assert is_gif(data) and not is_gif(b"\x89PNG")
    rgba = decode_gif(data)
    assert rgba.shape == (23, 31, 4)
    assert (rgba[:, :, 3] == 255).all()
    want = np.array(pal, dtype=np.uint8)[idx]
    assert (rgba[:, :, :3] == want).all()


def test_long_run_forces_clear_codes():
    # enough pixels that the fixed-width writer must emit CLEARs and the
    # decoder must track resets through several dictionary cycles
    pal = _palette(4)
    idx = np.tile(
        np.arange(4, dtype=np.uint8), 64 * 64 // 4
    ).reshape(64, 64)
    rgba = decode_gif(encode_gif((64, 64), pal, [{"idx": idx}]))
    want = np.array(pal, dtype=np.uint8)[idx]
    assert (rgba[:, :, :3] == want).all()


def test_interlaced():
    rng = np.random.default_rng(11)
    pal = _palette(8)
    idx = rng.integers(0, 8, size=(17, 9), dtype=np.uint8)
    plain = decode_gif(encode_gif((9, 17), pal, [{"idx": idx}]))
    inter = decode_gif(
        encode_gif((9, 17), pal, [{"idx": idx}], interlace=True)
    )
    assert (plain == inter).all()


def test_animation_composition_disposal_and_transparency():
    pal = _palette(4)
    base = np.zeros((8, 8), dtype=np.uint8)
    patch = np.full((4, 4), 1, dtype=np.uint8)
    patch[0, 0] = 2  # 2 will be the transparent index in frame 2
    frames = [
        {"idx": base, "disposal": 1},
        {"idx": patch, "left": 2, "top": 2, "transparent": 2,
         "disposal": 3},
        {"idx": np.full((2, 2), 3, dtype=np.uint8), "left": 0, "top": 0,
         "disposal": 2},
    ]
    out = list(decode_gif_frames(encode_gif((8, 8), pal, frames)))
    assert [(i, w, h) for i, w, h, _ in out] == [(i, 8, 8) for i in range(3)]
    p = np.array(pal, dtype=np.uint8)
    f0, f1, f2 = (x[3] for x in out)
    # frame 1: patch over base, transparent cell shows base color
    assert tuple(f1[2, 2, :3]) == tuple(p[0])   # transparent -> base
    assert tuple(f1[3, 3, :3]) == tuple(p[1])
    # frame 2 painted its own patch; disposal 3 of frame 1 restored base
    assert tuple(f2[0, 0, :3]) == tuple(p[3])
    assert tuple(f2[3, 3, :3]) == tuple(p[0])   # frame-1 patch gone
    assert (f0[:, :, 3] == 255).all()


def test_rejections():
    pal = _palette(4)
    idx = np.zeros((4, 4), dtype=np.uint8)
    good = encode_gif((4, 4), pal, [{"idx": idx}])
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"not a gif")
    with pytest.raises(GifError):
        decode_gif(good[:20])
    # frame bigger than the logical screen
    bad = encode_gif((2, 2), pal, [{"idx": idx}])
    with pytest.raises(GifError, match="logical screen"):
        decode_gif(bad)


def _pooled_gif_through_spark_operators(spark):
    """GIF through the strict multimodal paths: real dims in
    decode_images, pixel aHash equal to the PNG of the same image, and
    animated-GIF frame sampling."""
    import pandas as pd

    from evm_archive_spark.operators import multimodal
    from evm_archive_spark.operators.png import encode_png

    rng = np.random.default_rng(13)
    pal = _palette(16)
    idx = rng.integers(0, 16, size=(24, 32), dtype=np.uint8)
    idx[:12] = 0
    idx[12:] = 15  # strong structure for a stable hash
    gif_payload = encode_gif((32, 24), pal, [{"idx": idx}])
    rgba = np.zeros((24, 32, 4), dtype=np.uint8)
    rgba[:, :, :3] = np.array(pal, dtype=np.uint8)[idx]
    rgba[:, :, 3] = 255
    png_payload = encode_png(rgba)

    def mdf(payloads):
        return spark.createDataFrame(
            pd.DataFrame(
                {"media_id": range(len(payloads)), "payload": payloads}
            )
        )

    feats = multimodal.decode_images(mdf([gif_payload]), strict=True).collect()
    assert (feats[0]["width"], feats[0]["height"]) == (32, 24)
    hashes = [
        r["ahash"]
        for r in multimodal.image_ahash(
            mdf([gif_payload, png_payload]), strict=True
        ).collect()
    ]
    assert hashes[0] == hashes[1]  # codec-invariant perceptual hash

    anim = encode_gif(
        (8, 8), pal,
        [{"idx": np.full((8, 8), i % 16, dtype=np.uint8)} for i in range(4)],
    )
    frames = multimodal.frame_sample(
        mdf([anim]), every_n=2, strict=True
    ).collect()
    assert sorted(r["frame_idx"] for r in frames) == [0, 2]

    # corrupt GIF at strict=False: deterministic fake, no job failure
    rows = multimodal.image_ahash(
        mdf([good_prefix := gif_payload[:25]]), strict=False
    ).collect()
    assert len(rows) == 1


# --------------------------------------------------------------------------
# Cross-check against the SYSTEM giflib (round 9): the libwebp/libpng
# pin pattern — giflib must accept the independent writer's files and
# produce the same indices/palette our decoder maps to pixels.
# --------------------------------------------------------------------------


def _giflib():
    import ctypes

    try:
        return ctypes.CDLL("libgif.so.7")
    except OSError:
        return None


def _giflib_decode(lib, data: bytes):
    """(width, height, palette list, raster index bytes) of frame 0
    via DGifOpen + DGifSlurp (giflib 5 ABI)."""
    import ctypes as C

    class ColorMapObject(C.Structure):
        _fields_ = [("ColorCount", C.c_int), ("BitsPerPixel", C.c_int),
                    ("SortFlag", C.c_bool),
                    ("Colors", C.POINTER(C.c_ubyte))]

    class GifImageDesc(C.Structure):
        _fields_ = [("Left", C.c_int), ("Top", C.c_int),
                    ("Width", C.c_int), ("Height", C.c_int),
                    ("Interlace", C.c_bool),
                    ("ColorMap", C.POINTER(ColorMapObject))]

    class ExtensionBlock(C.Structure):
        _fields_ = [("ByteCount", C.c_int),
                    ("Bytes", C.POINTER(C.c_ubyte)),
                    ("Function", C.c_int)]

    class SavedImage(C.Structure):
        _fields_ = [("ImageDesc", GifImageDesc),
                    ("RasterBits", C.POINTER(C.c_ubyte)),
                    ("ExtensionBlockCount", C.c_int),
                    ("ExtensionBlocks", C.POINTER(ExtensionBlock))]

    class GifFileType(C.Structure):
        _fields_ = [("SWidth", C.c_int), ("SHeight", C.c_int),
                    ("SColorResolution", C.c_int),
                    ("SBackGroundColor", C.c_int),
                    ("AspectByte", C.c_ubyte),
                    ("SColorMap", C.POINTER(ColorMapObject)),
                    ("ImageCount", C.c_int),
                    ("Image", GifImageDesc),
                    ("SavedImages", C.POINTER(SavedImage)),
                    ("ExtensionBlockCount", C.c_int),
                    ("ExtensionBlocks", C.POINTER(ExtensionBlock)),
                    ("Error", C.c_int),
                    ("UserData", C.c_void_p),
                    ("Private", C.c_void_p)]

    READF = C.CFUNCTYPE(C.c_int, C.c_void_p, C.POINTER(C.c_ubyte),
                        C.c_int)
    pos = [0]

    def _read(_gif, out, n):
        chunk = data[pos[0]: pos[0] + n]
        C.memmove(out, chunk, len(chunk))
        pos[0] += len(chunk)
        return len(chunk)

    readf = READF(_read)
    lib.DGifOpen.restype = C.POINTER(GifFileType)
    lib.DGifOpen.argtypes = [C.c_void_p, READF, C.POINTER(C.c_int)]
    err = C.c_int(0)
    gif = lib.DGifOpen(None, readf, C.byref(err))
    assert gif, f"DGifOpen failed: {err.value}"
    try:
        assert lib.DGifSlurp(gif) == 1, gif.contents.Error
        g = gif.contents
        assert g.ImageCount >= 1
        frame = g.SavedImages[0]
        d = frame.ImageDesc
        cmap = d.ColorMap if d.ColorMap else g.SColorMap
        n = cmap.contents.ColorCount
        cols = bytes(C.cast(
            cmap.contents.Colors, C.POINTER(C.c_ubyte * (3 * n))
        ).contents)
        palette = [tuple(cols[3 * i: 3 * i + 3]) for i in range(n)]
        raster = bytes(C.cast(
            frame.RasterBits,
            C.POINTER(C.c_ubyte * (d.Width * d.Height))).contents)
        return d.Width, d.Height, palette, raster
    finally:
        lib.DGifCloseFile(gif, None)


@pytest.mark.skipif(_giflib() is None, reason="no system giflib")
def test_cross_checked_against_system_giflib():
    """giflib decodes the independent writer's files to the exact
    index raster and palette; our decode_gif must map those to the
    same RGBA pixels."""
    lib = _giflib()
    rng = np.random.default_rng(53)
    for npal, (h, w) in [(4, (9, 13)), (16, (23, 31)), (128, (16, 16))]:
        pal = _palette(npal, seed=npal)
        idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
        data = encode_gif((w, h), pal, [{"idx": idx}])
        gw, gh, gpal, raster = _giflib_decode(lib, data)
        assert (gw, gh) == (w, h)
        assert gpal[:npal] == pal
        assert np.array_equal(
            np.frombuffer(raster, dtype=np.uint8).reshape(h, w), idx)
        ours = decode_gif(data)
        want = np.array([list(pal[i]) + [255] for i in idx.flatten()],
                        dtype=np.uint8).reshape(h, w, 4)
        assert np.array_equal(ours, want)
