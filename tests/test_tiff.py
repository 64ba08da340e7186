"""TIFF codec tests (decoder: operators/tiff.py).

Fixtures come from an INDEPENDENT minimal TIFF writer defined here (the
established test_png/test_jpeg/test_gif pattern): IFD layout, PackBits
runs, and TIFF-LZW (MSB-first, early width change) are produced from the
spec, sharing no code with the decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from evm_archive_spark.operators.tiff import TiffError, decode_tiff, is_tiff


# --------------------------------------------------------------------------
# independent writer
# --------------------------------------------------------------------------


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Literal-codes-only TIFF LZW (CLEAR emitted before the early width
    change would trigger) — valid output, no compression achieved."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width=9):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    put(CLEAR)
    next_code = 258
    first = True
    for b in data:
        put(b)
        if first:
            first = False
            continue
        next_code += 1
        if next_code >= 509:  # stay below the 511 early change
            put(CLEAR)
            next_code = 258
            first = True
    put(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: runs of >=3 identical bytes as replicate runs,
    everything else as literal runs."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (
                i + 2 < n and data[i] == data[i + 1] == data[i + 2]
            )
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    compression=1,
    byte_order="<",
    rows_per_strip=None,
    photometric=None,
    colormap=None,
    predictor=1,
    bilevel=False,
    jpeg_strip_encoder=None,
    tile_size=None,
    t4_options=0,
    planar=1,
):
    """``px``: (h, w) gray/index array or (h, w, 3|4) RGB(A).  For
    compression 7 each strip band / tile is serialized by
    ``jpeg_strip_encoder(rows) -> jpeg bytes``.  ``tile_size``:
    a (tw, th) pair switches to the tiled organization (tags
    322/323/324/325; edge tiles edge-padded to full size)."""
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    itemsize = 2 if px.dtype == np.uint16 else 1
    rps = rows_per_strip or h
    fax = compression in (2, 3, 4)
    if fax:
        bilevel = True
    if photometric is None:
        # fax default: 0 (WhiteIsZero), the T.4/T.6 convention
        photometric = 0 if fax else (2 if spp >= 3 else 1)

    def compress_body(body: bytes) -> bytes:
        if compression == 5:
            return _lzw_encode_tiff(body)
        if compression in (8, 32946):
            return zlib.compress(body)
        if compression == 32773:
            return _packbits_encode(body)
        return body

    def pack(block2d, nrows_units, nspp=None):
        """Predictor + compression over one chunk's rows."""
        nspp = spp if nspp is None else nspp
        if itemsize == 2:
            wide = block2d.reshape(nrows_units, -1, nspp).astype(np.int32)
            if predictor == 2:
                diff = wide.copy()
                diff[:, 1:] = wide[:, 1:] - wide[:, :-1]
                wide = diff % 65536
            return compress_body(
                wide.astype(np.dtype(byte_order + "u2")).tobytes())
        block = block2d.reshape(nrows_units, -1).astype(np.uint8)
        if predictor == 2:
            wide = block.reshape(nrows_units, -1, nspp).astype(np.int16)
            diff = wide.copy()
            diff[:, 1:] = wide[:, 1:] - wide[:, :-1]
            block = (diff % 256).astype(np.uint8).reshape(
                nrows_units, -1)
        return compress_body(block.tobytes())

    strips = []
    if tile_size is not None and planar == 2:
        # tiled planar (r11): SamplesPerPixel x TilesPerImage tiles,
        # all of plane 0's first; predictor per tile per plane
        tw, th = tile_size
        for p in range(spp):
            for ty in range(0, -(-h // th)):
                for tx in range(0, -(-w // tw)):
                    tile = px[ty * th:(ty + 1) * th,
                              tx * tw:(tx + 1) * tw, p]
                    pad_h = th - tile.shape[0]
                    pad_w = tw - tile.shape[1]
                    if pad_h or pad_w:
                        tile = np.pad(tile, ((0, pad_h), (0, pad_w)),
                                      mode="edge")
                    strips.append(pack(tile, th, nspp=1))
    elif tile_size is not None:
        tw, th = tile_size
        for ty in range(0, -(-h // th)):
            for tx in range(0, -(-w // tw)):
                tile = px[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                pad_h, pad_w = th - tile.shape[0], tw - tile.shape[1]
                if pad_h or pad_w:
                    pads = ((0, pad_h), (0, pad_w)) + (
                        ((0, 0),) if px.ndim == 3 else ())
                    tile = np.pad(tile, pads, mode="edge")
                if compression == 7:
                    strips.append(jpeg_strip_encoder(tile))
                elif compression in (2, 3, 4):
                    from evm_archive_spark.operators.ccittfax import (
                        encode_g3,
                        encode_g4,
                        encode_mh,
                    )

                    bits = (tile > 0).astype(np.uint8)
                    if compression == 2:
                        strips.append(encode_mh(bits))
                    elif compression == 3:
                        strips.append(encode_g3(
                            bits, two_d=bool(t4_options & 1),
                            fill_bits=bool(t4_options & 4)))
                    else:
                        strips.append(encode_g4(bits))
                elif bilevel:
                    bits = (tile > 0).astype(np.uint8)
                    strips.append(compress_body(np.packbits(
                        bits, axis=1).tobytes()))
                else:
                    strips.append(pack(tile, th))
    elif planar == 2:
        for p in range(spp):
            for r0 in range(0, h, rps):
                rows = px[r0: r0 + rps, :, p]
                strips.append(pack(rows, rows.shape[0], nspp=1))
    elif compression == 6:
        # old-JPEG: one full interchange stream for the whole image
        strips.append(jpeg_strip_encoder(px))
    else:
        for r0 in range(0, h, rps):
            rows = px[r0: r0 + rps]
            if compression == 7:
                strips.append(jpeg_strip_encoder(rows))
                continue
            if compression in (2, 3, 4):
                from evm_archive_spark.operators.ccittfax import (
                    encode_g3,
                    encode_g4,
                    encode_mh,
                )

                bits = (rows > 0).astype(np.uint8)
                if compression == 2:
                    strips.append(encode_mh(bits))
                elif compression == 3:
                    strips.append(encode_g3(
                        bits, two_d=bool(t4_options & 1),
                        fill_bits=bool(t4_options & 4)))
                else:
                    strips.append(encode_g4(bits))
                continue
            if bilevel:
                strips.append(compress_body(np.packbits(
                    (rows > 0).astype(np.uint8), axis=1).tobytes()))
                continue
            strips.append(pack(rows, rows.shape[0]))

    bo = byte_order
    entries = []  # (tag, type, count, value-or-bytes)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), vals))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals), vals))

    short(256, w)
    short(257, h)
    short(258, *( (1,) if bilevel else (8 * itemsize,) * spp ))
    short(259, compression)
    short(262, photometric)
    short(277, 1 if bilevel else spp)
    if tile_size is not None:
        short(322, tile_size[0])
        short(323, tile_size[1])
    else:
        short(278, rps)
    if predictor != 1:
        short(317, predictor)
    if planar != 1:
        short(284, planar)
    if compression == 3:
        long_(292, t4_options)
    if compression == 6:
        long_(513, 0)                           # patched with offset
        long_(514, len(strips[0]))
    if colormap is not None:
        short(320, *colormap)
    # offsets/counts filled after layout
    long_(324 if tile_size is not None else 273, *([0] * len(strips)))
    long_(325 if tile_size is not None else 279,
          *[len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    # external value area follows the IFD; strips follow values
    ext = bytearray()
    ext_base = 8 + ifd_size

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(bo + fmt, v) for v in vals)

    fixed = []
    for tag, typ, cnt, vals in entries:
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            fixed.append((tag, typ, cnt, vb.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, cnt, None, len(ext)))
            ext.extend(vb)
    strips_base = ext_base + len(ext)
    offs = []
    pos = strips_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    # rewrite the strip-offset entry now that layout is known
    out_entries = bytearray()
    for tag, typ, cnt, inline, extoff in fixed:
        if tag == 513:
            inline = struct.pack(bo + "I", offs[0])
        if tag in (273, 324):
            vb = value_bytes(4, offs)
            if len(vb) <= 4:
                inline, extoff = vb.ljust(4, b"\x00"), None
            else:
                # place at the recorded ext slot
                pass
        out_entries += struct.pack(bo + "HHI", tag, typ, cnt)
        if inline is not None:
            out_entries += inline
        else:
            if tag in (273, 324):
                vb = value_bytes(4, offs)
                ext[extoff : extoff + len(vb)] = vb
            out_entries += struct.pack(bo + "I", ext_base + extoff)
    ifd = struct.pack(bo + "H", n) + bytes(out_entries) + b"\x00\x00\x00\x00"
    return header + ifd + bytes(ext) + b"".join(strips)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def _rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_rgb_uncompressed_both_byte_orders():
    img = _rgb(13, 21)
    for bo in ("<", ">"):
        data = encode_tiff(img, byte_order=bo)
        assert is_tiff(data) and not is_tiff(b"\x89PNG")
        out = decode_tiff(data)
        assert out.shape == (13, 21, 4)
        assert (out[:, :, :3] == img).all()
        assert (out[:, :, 3] == 255).all()


def test_gray_packbits_multistrip():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    g[4:9] = 200  # long runs for PackBits replicate paths
    data = encode_tiff(g, compression=32773, rows_per_strip=5)
    out = decode_tiff(data)
    assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()


def test_lzw_with_predictor_and_long_image():
    # big enough to force LZW CLEAR cycles through the early-change gap
    img = _rgb(40, 40, seed=9)
    for pred in (1, 2):
        data = encode_tiff(img, compression=5, predictor=pred,
                           rows_per_strip=16)
        out = decode_tiff(data)
        assert (out[:, :, :3] == img).all(), pred


def test_palette_and_bilevel():
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 16, size=(9, 14), dtype=np.uint8)
    # TIFF colormap: 16-bit channel planes R..G..B, 2^bps entries
    n = 256
    cmap_r = [((i * 7) % 256) << 8 for i in range(n)]
    cmap_g = [((i * 13) % 256) << 8 for i in range(n)]
    cmap_b = [((i * 29) % 256) << 8 for i in range(n)]
    data = encode_tiff(
        idx, photometric=3, colormap=cmap_r + cmap_g + cmap_b
    )
    out = decode_tiff(data)
    assert (out[:, :, 0] == (idx * 7) % 256).all()
    assert (out[:, :, 2] == (idx * 29) % 256).all()

    bits = rng.integers(0, 2, size=(11, 19), dtype=np.uint8)
    black0 = decode_tiff(encode_tiff(bits, photometric=1, bilevel=True))
    assert (black0[:, :, 0] == bits * 255).all()
    white0 = decode_tiff(encode_tiff(bits, photometric=0, bilevel=True))
    assert (white0[:, :, 0] == (1 - bits) * 255).all()


def test_rgba_alpha_passthrough():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    out = decode_tiff(encode_tiff(img))
    assert (out == img).all()


def test_rejections():
    img = _rgb(8, 8)
    good = bytearray(encode_tiff(img))
    with pytest.raises(TiffError, match="signature"):
        decode_tiff(b"not a tiff")
    with pytest.raises(TiffError):
        decode_tiff(bytes(good[:30]))
    # unsupported compression id (old-JPEG)
    gray = encode_tiff(np.zeros((4, 4), np.uint8))
    i = gray.index(struct.pack("<HH", 259, 3))
    bad = bytearray(gray)
    struct.pack_into("<H", bad, i + 8, 6)
    with pytest.raises(TiffError, match="old-JPEG"):
        decode_tiff(bytes(bad))
    # CCITT compression over non-bilevel data is typed
    struct.pack_into("<H", bad, i + 8, 4)
    with pytest.raises(TiffError, match="bilevel"):
        decode_tiff(bytes(bad))


def _pooled_tiff_through_spark_strict_paths(spark):
    """TIFF through the strict multimodal operators: true dims, and the
    pixel aHash equals the PNG of the same image (codec-invariant)."""
    import pandas as pd

    from evm_archive_spark.operators import multimodal
    from evm_archive_spark.operators.png import encode_png

    img = np.zeros((24, 32, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    img[:12, :, :3] = 30
    img[12:, :, :3] = 220
    payloads = [
        encode_tiff(img[:, :, :3], compression=5, predictor=2),
        encode_png(img),
    ]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": range(2), "payload": payloads})
    )
    feats = multimodal.decode_images(media, strict=True).collect()
    assert all((r["width"], r["height"]) == (32, 24) for r in feats)
    hashes = [
        r["ahash"]
        for r in multimodal.image_ahash(media, strict=True).collect()
    ]
    assert hashes[0] == hashes[1]


def test_deflate_compression_both_tags():
    """Deflate strips (official tag 8 and legacy 32946) round-trip,
    including with the horizontal predictor and multi-strip layout."""
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    for tag in (8, 32946):
        out = decode_tiff(encode_tiff(img, compression=tag, rows_per_strip=4))
        assert np.array_equal(out[:, :, :3], img), tag
    out = decode_tiff(
        encode_tiff(img, compression=8, predictor=2)
    )
    assert np.array_equal(out[:, :, :3], img)


# --------------------------------------------------------------------------
# Cross-check against the SYSTEM libtiff (round 9): the libwebp/libpng/
# giflib pin pattern, via TIFFClientOpen in-memory callbacks +
# TIFFReadRGBAImageOriented (function-based API — no struct layouts).
# --------------------------------------------------------------------------


def _libtiff():
    import ctypes

    try:
        return ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None


def _libtiff_decode_rgba(lib, data: bytes):
    import ctypes as C

    lib.TIFFSetWarningHandler(None)

    READ = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p, C.c_ssize_t)
    SEEK = C.CFUNCTYPE(C.c_uint64, C.c_void_p, C.c_uint64, C.c_int)
    CLOSE = C.CFUNCTYPE(C.c_int, C.c_void_p)
    SIZE = C.CFUNCTYPE(C.c_uint64, C.c_void_p)
    pos = [0]

    def _read(_h, buf, n):
        chunk = data[pos[0]: pos[0] + n]
        C.memmove(buf, chunk, len(chunk))
        pos[0] += len(chunk)
        return len(chunk)

    def _seek(_h, off, whence):
        pos[0] = {0: off, 1: pos[0] + off, 2: len(data) + off}[whence]
        return pos[0]

    cbs = (READ(_read), READ(lambda *_: 0), SEEK(_seek),
           CLOSE(lambda _h: 0), SIZE(lambda _h: len(data)))
    lib.TIFFClientOpen.restype = C.c_void_p
    tif = lib.TIFFClientOpen(b"mem", b"r", None, *cbs,
                             C.c_void_p(0), C.c_void_p(0))
    assert tif, "TIFFClientOpen failed"
    try:
        w = C.c_uint32(0)
        h = C.c_uint32(0)
        assert lib.TIFFGetField(C.c_void_p(tif), C.c_uint32(256),
                                C.byref(w))     # ImageWidth
        assert lib.TIFFGetField(C.c_void_p(tif), C.c_uint32(257),
                                C.byref(h))     # ImageLength
        n = w.value * h.value
        raster = (C.c_uint32 * n)()
        ok = lib.TIFFReadRGBAImageOriented(
            C.c_void_p(tif), w.value, h.value, raster,
            C.c_int(1), C.c_int(1))             # ORIENTATION_TOPLEFT
        assert ok, "TIFFReadRGBAImageOriented failed"
        return np.frombuffer(bytes(raster), dtype=np.uint8).reshape(
            h.value, w.value, 4)                # LE packed = R,G,B,A
    finally:
        lib.TIFFClose(C.c_void_p(tif))


@pytest.mark.skipif(_libtiff() is None, reason="no system libtiff")
def test_cross_checked_against_system_libtiff():
    """libtiff decodes the independent writer's files (raw, LZW,
    Deflate, PackBits; horizontal predictor; gray and RGB; strips) to
    the same RGBA pixels decode_tiff produces."""
    lib = _libtiff()
    rng = np.random.default_rng(59)
    cases = []
    rgb = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (16, 12), dtype=np.uint8)
    for comp in (1, 5, 8, 32773):
        cases.append(encode_tiff(rgb, compression=comp,
                                 rows_per_strip=5))
    cases.append(encode_tiff(rgb, compression=5, predictor=2))
    cases.append(encode_tiff(gray, compression=8))
    for i, payload in enumerate(cases):
        ours = decode_tiff(payload)
        theirs = _libtiff_decode_rgba(lib, payload)
        assert np.array_equal(ours, theirs), i
    # compression 7 with ARITHMETIC (SOF9) strips: libtiff decodes
    # through its libjpeg, we decode through jpegarith — IDCT rounding
    # allows +-1, any entropy mistake would be off by far more
    from evm_archive_spark.operators.jpegarith import encode_jpeg_arith

    blocks = rng.integers(0, 28, (2, 2), dtype=np.uint8) * 8 + 20
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    t7 = encode_tiff(img, compression=7, rows_per_strip=8,
                     jpeg_strip_encoder=encode_jpeg_arith)
    ours = decode_tiff(t7).astype(int)
    theirs = _libtiff_decode_rgba(lib, t7).astype(int)
    assert np.abs(ours - theirs).max() <= 1


# --------------------------------------------------------------------------
# Compression 7: new-style JPEG-in-TIFF (round 9) — with SOF3 strips
# this is the DNG raw layout
# --------------------------------------------------------------------------


def test_jpeg_in_tiff_lossless_strips_exact():
    """SOF3 (lossless JPEG) strips wrapped in a strip-banded TIFF —
    the DNG structure — decode pixel-EXACTLY, gray and RGB, across
    strip boundaries."""
    from evm_archive_spark.operators.jpeglossless import (
        build_jpeg_lossless,
    )

    rng = np.random.default_rng(73)
    gray = rng.integers(0, 256, (22, 17), dtype=np.uint8)
    t = encode_tiff(gray, compression=7, rows_per_strip=5,
                    jpeg_strip_encoder=lambda rows: build_jpeg_lossless(
                        rows, predictor=4))
    out = decode_tiff(t)
    assert np.array_equal(out[:, :, 0], gray)
    assert (out[:, :, 0] == out[:, :, 1]).all()

    rgb = rng.integers(0, 256, (15, 9, 3), dtype=np.uint8)
    t = encode_tiff(rgb, compression=7, rows_per_strip=4, photometric=6,
                    jpeg_strip_encoder=lambda rows: build_jpeg_lossless(
                        rows, predictor=1))
    assert np.array_equal(decode_tiff(t)[:, :, :3], rgb)


def test_jpeg_in_tiff_baseline_and_arithmetic_strips():
    """Baseline-Huffman and ARITHMETIC (SOF9) strips both ride the
    shared jpeg.py dispatch inside TIFF; with a unit quant table on
    block-constant bands the decode is near-exact."""
    from evm_archive_spark.operators.jpegarith import encode_jpeg_arith

    rng = np.random.default_rng(79)
    blocks = rng.integers(0, 32, (2, 3), dtype=np.uint8) * 8 + 16
    img = np.kron(blocks, np.ones((8, 8), np.uint8))   # 16x24, flat 8x8s
    t = encode_tiff(img, compression=7, rows_per_strip=8,
                    jpeg_strip_encoder=encode_jpeg_arith)
    out = decode_tiff(t)[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_in_tiff_jpegtables_splice_and_errors():
    """A JPEGTables stream (abbreviated tables-only) splices in after
    each strip's SOI; malformed tables and short strips are typed."""
    import struct as _s

    from evm_archive_spark.operators.jpeglossless import (
        build_jpeg_lossless,
    )

    gray = (np.add.outer(np.arange(12), np.arange(10)) * 3).astype(
        np.uint8)
    full = build_jpeg_lossless(gray, predictor=2)
    # split: tables = SOI + DHT + EOI; strip = SOI + (rest minus DHT)
    i = full.index(b"\xff\xc4")
    (dht_len,) = _s.unpack_from(">H", full, i + 2)
    dht = full[i: i + 2 + dht_len]
    tables = b"\xff\xd8" + dht + b"\xff\xd9"
    strip = full[:i] + full[i + 2 + dht_len:]
    t = encode_tiff(gray, compression=7,
                    jpeg_strip_encoder=lambda rows: strip)
    # inject the JPEGTables tag by rebuilding via raw splice: easiest
    # is the operator-level check — splice manually like decode does
    from evm_archive_spark.operators.jpeg import decode_jpeg

    merged = tables[:-2] + strip[2:]
    assert np.array_equal(decode_jpeg(merged)[:, :, 0], gray)
    # malformed strip inside a comp-7 TIFF is a typed TiffError
    bad = encode_tiff(gray, compression=7,
                      jpeg_strip_encoder=lambda rows: b"\xff\xd8junk")
    with pytest.raises(TiffError, match="JPEG strip"):
        decode_tiff(bad)
    # a strip shorter than its band is typed
    small = build_jpeg_lossless(gray[:4], predictor=1)
    short = encode_tiff(gray, compression=7,
                        jpeg_strip_encoder=lambda rows: small)
    with pytest.raises(TiffError, match="smaller than declared"):
        decode_tiff(short)
    # a COLOR JPEG inside a gray-declared TIFF must be typed, not the
    # red channel silently (r9 ADVICE)
    from evm_archive_spark.operators.jpegarith import encode_jpeg_arith

    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 0] = 200                        # red-only image
    color_strip = encode_jpeg_arith(rgb)
    colorbad = encode_tiff(np.zeros((16, 16), np.uint8), compression=7,
                           jpeg_strip_encoder=lambda rows: color_strip)
    with pytest.raises(TiffError, match="color JPEG"):
        decode_tiff(colorbad)


# --------------------------------------------------------------------------
# Tiled organization (round 9) — what DNG raws and GeoTIFFs use
# --------------------------------------------------------------------------


def test_tiled_rgb_and_gray_all_compressions():
    """Tile grids with ragged edges decode exactly across every
    byte-oriented compression; the predictor resets per tile."""
    rng = np.random.default_rng(83)
    rgb = rng.integers(0, 256, (37, 45, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (20, 33), dtype=np.uint8)
    for comp in (1, 5, 8, 32773):
        t = encode_tiff(rgb, compression=comp, tile_size=(16, 16))
        assert np.array_equal(decode_tiff(t)[:, :, :3], rgb), comp
        t = encode_tiff(gray, compression=comp, tile_size=(16, 16))
        assert np.array_equal(decode_tiff(t)[:, :, 0], gray), comp
    # predictor 2 within tiles (LZW, the classic pairing)
    t = encode_tiff(rgb, compression=5, predictor=2, tile_size=(16, 16))
    assert np.array_equal(decode_tiff(t)[:, :, :3], rgb)


def test_tiled_jpeg_lossless_is_the_dng_shape():
    """SOF3 (lossless JPEG) tiles — the actual DNG layout — decode
    pixel-exactly including edge-tile cropping."""
    from evm_archive_spark.operators.jpeglossless import (
        build_jpeg_lossless,
    )

    rng = np.random.default_rng(89)
    gray = rng.integers(0, 256, (21, 26), dtype=np.uint8)
    t = encode_tiff(gray, compression=7, tile_size=(16, 16),
                    jpeg_strip_encoder=lambda tile: build_jpeg_lossless(
                        tile, predictor=6))
    assert np.array_equal(decode_tiff(t)[:, :, 0], gray)


def test_tiled_against_libtiff():
    """Tile-level pin via TIFFReadEncodedTile (this libtiff build's
    RGBA convenience reader rejects any tiled file whose raw tile size
    differs from the RGBA raster size — a reader quirk, not a file
    defect: TIFFTileSize and the per-tile decode agree with us)."""
    import ctypes as C

    lib = _libtiff()
    if lib is None:
        pytest.skip("no system libtiff")
    rng = np.random.default_rng(97)
    rgb = rng.integers(0, 256, (37, 45, 3), dtype=np.uint8)

    def libtiff_tiles(data: bytes, n_tiles: int, tile_bytes: int):
        READ = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p,
                           C.c_ssize_t)
        SEEK = C.CFUNCTYPE(C.c_uint64, C.c_void_p, C.c_uint64, C.c_int)
        CLOSE = C.CFUNCTYPE(C.c_int, C.c_void_p)
        SIZE = C.CFUNCTYPE(C.c_uint64, C.c_void_p)
        pos = [0]

        def _read(_h, buf, n):
            chunk = data[pos[0]: pos[0] + n]
            C.memmove(buf, chunk, len(chunk))
            pos[0] += len(chunk)
            return len(chunk)

        def _seek(_h, off, whence):
            pos[0] = {0: off, 1: pos[0] + off, 2: len(data) + off}[whence]
            return pos[0]

        cbs = (READ(_read), READ(lambda *_: 0), SEEK(_seek),
               CLOSE(lambda _h: 0), SIZE(lambda _h: len(data)))
        lib.TIFFClientOpen.restype = C.c_void_p
        tif = lib.TIFFClientOpen(b"mem", b"r", None, *cbs,
                                 C.c_void_p(0), C.c_void_p(0))
        assert tif
        try:
            lib.TIFFTileSize.restype = C.c_ssize_t
            assert lib.TIFFTileSize(C.c_void_p(tif)) == tile_bytes
            lib.TIFFReadEncodedTile.restype = C.c_ssize_t
            out = []
            buf = (C.c_ubyte * tile_bytes)()
            for ti in range(n_tiles):
                r = lib.TIFFReadEncodedTile(C.c_void_p(tif), ti, buf,
                                            C.c_ssize_t(-1))
                assert r == tile_bytes, (ti, r)
                out.append(bytes(buf))
            return out
        finally:
            lib.TIFFClose(C.c_void_p(tif))

    for comp in (1, 5, 8):
        t = encode_tiff(rgb, compression=comp, tile_size=(16, 16))
        tiles = libtiff_tiles(t, 9, 16 * 16 * 3)
        ours = decode_tiff(t)[:, :, :3]
        for ti, raw in enumerate(tiles):
            ty, tx = divmod(ti, 3)
            tile = np.frombuffer(raw, np.uint8).reshape(16, 16, 3)
            hh = min(16, 37 - ty * 16)
            ww = min(16, 45 - tx * 16)
            assert np.array_equal(
                tile[:hh, :ww],
                ours[ty * 16: ty * 16 + hh, tx * 16: tx * 16 + ww]
            ), (comp, ti)


def test_tiled_hardening():
    rng = np.random.default_rng(101)
    gray = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    good = encode_tiff(gray, compression=1, tile_size=(16, 16))
    # short tile table: drop the count of tiles via TileByteCounts len
    bad = bytearray(good)
    i = good.index(struct.pack("<HH", 325, 4))
    struct.pack_into("<I", bad, i + 4, 1)       # count 4 -> 1
    with pytest.raises(TiffError, match="tile tables shorter"):
        decode_tiff(bytes(bad))
    # tile data overrunning the payload is typed
    with pytest.raises(TiffError):
        decode_tiff(good[:-40])


# --------------------------------------------------------------------------
# CCITT fax compressions 2/3/4 (round 10) — scanned-document corpora
# --------------------------------------------------------------------------


def _fax_page(h, w, seed):
    """Fax-like bilevel content: text-ish runs over a white page."""
    rng = np.random.default_rng(seed)
    page = (rng.random((h, w)) < 0.25).astype(np.uint8)
    page[:, : w // 4] = 0                       # long white margins
    if h > 2:
        page[h // 2, :] = 1                     # a full black rule
    return page * 255


def test_ccitt_mh_g3_g4_roundtrip_through_tiff():
    """Compression 2 (MH rows), 3 (G3 1-D and 2-D per T4Options), and
    4 (G4 MMR) through the full TIFF container, both photometrics."""
    for h, w in [(9, 40), (16, 173), (5, 1728)]:
        page = _fax_page(h, w, h * w)
        want_black0 = np.where(page > 0, 0, 255).astype(np.uint8)
        for comp, t4 in [(2, 0), (3, 0), (3, 1), (4, 0)]:
            t = encode_tiff(page, compression=comp, t4_options=t4,
                            rows_per_strip=4)
            out = decode_tiff(t)
            # photometric 0: black pixels (bit 1) render 0
            assert np.array_equal(out[:, :, 0], want_black0), (comp, t4)
            assert np.array_equal(out[:, :, 0], out[:, :, 1])
            t1 = encode_tiff(page, compression=comp, t4_options=t4,
                             photometric=1)
            out1 = decode_tiff(t1)
            assert np.array_equal(out1[:, :, 0], 255 - want_black0), comp


def test_ccitt_typed_boundaries():
    page = _fax_page(8, 64, 11)
    # uncompressed-mode flags are typed
    t = encode_tiff(page, compression=3, t4_options=2)
    with pytest.raises(TiffError, match="uncompressed mode"):
        decode_tiff(t)
    # corrupt stream is typed, not wrong pixels
    good = encode_tiff(page, compression=4)
    bad = bytearray(good)
    bad[-12:] = b"\xa5" * 12                    # stomp the G4 stream tail
    with pytest.raises(TiffError, match="CCITT strip"):
        decode_tiff(bytes(bad))
    # G3 stream without its EOLs is typed
    from evm_archive_spark.operators.ccittfax import CcittError, decode_g3

    with pytest.raises(CcittError, match="EOL"):
        decode_g3(b"\xff" * 16, 32, 2, two_d=True)


@pytest.mark.skipif(_libtiff() is None, reason="no system libtiff")
def test_ccitt_cross_checked_against_system_libtiff():
    """libtiff decodes our MH/G3/G3-2D/G4 files to the same pixels,
    and our decoder reads libtiff-ENCODED G3/G4 streams — both
    directions, the jpegarith pin pattern."""
    import ctypes as C

    lib = _libtiff()
    for h, w in [(12, 80), (7, 333)]:
        page = _fax_page(h, w, h + w)
        for comp, t4 in [(2, 0), (3, 0), (3, 1), (4, 0),
                         (3, 4), (3, 5)]:   # 4|: T.4 fill bits (r12)
            t = encode_tiff(page, compression=comp, t4_options=t4,
                            rows_per_strip=5)
            ours = decode_tiff(t)
            theirs = _libtiff_decode_rgba(lib, t)
            assert np.array_equal(ours, theirs), (comp, t4, h, w)

    # reverse: libtiff writes, we read
    def libtiff_encode_fax(page255, comp, t4opts=None):
        h, w = page255.shape
        buf = bytearray()
        pos = [0]

        WRITE = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p,
                            C.c_ssize_t)
        READ = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p,
                           C.c_ssize_t)
        SEEK = C.CFUNCTYPE(C.c_uint64, C.c_void_p, C.c_uint64, C.c_int)
        CLOSE = C.CFUNCTYPE(C.c_int, C.c_void_p)
        SIZE = C.CFUNCTYPE(C.c_uint64, C.c_void_p)

        def _write(_h, data, n):
            chunk = C.string_at(data, n)
            end = pos[0] + n
            if end > len(buf):
                buf.extend(b"\x00" * (end - len(buf)))
            buf[pos[0]:end] = chunk
            pos[0] = end
            return n

        def _read(_h, data, n):
            chunk = bytes(buf[pos[0]: pos[0] + n])
            C.memmove(data, chunk, len(chunk))
            pos[0] += len(chunk)
            return len(chunk)

        def _seek(_h, off, whence):
            pos[0] = {0: off, 1: pos[0] + off, 2: len(buf) + off}[whence]
            return pos[0]

        cbs = (READ(_read), WRITE(_write), SEEK(_seek),
               CLOSE(lambda _h: 0), SIZE(lambda _h: len(buf)))
        lib.TIFFClientOpen.restype = C.c_void_p
        tif = lib.TIFFClientOpen(b"mem", b"w", None, *cbs,
                                 C.c_void_p(0), C.c_void_p(0))
        assert tif, "TIFFClientOpen(w) failed"
        tp = C.c_void_p(tif)

        def setf(tag, val):
            assert lib.TIFFSetField(tp, C.c_uint32(tag),
                                    C.c_uint32(val)), tag

        setf(256, w)
        setf(257, h)
        setf(258, 1)
        setf(259, comp)
        setf(262, 0)                            # WhiteIsZero
        setf(277, 1)
        setf(278, h)
        if t4opts is not None:
            setf(292, t4opts)
        rowbytes = (w + 7) // 8
        bits = np.packbits(page255 > 0, axis=1)
        for y in range(h):
            row = bits[y].tobytes().ljust(rowbytes, b"\x00")
            assert lib.TIFFWriteScanline(
                tp, C.c_char_p(row), C.c_uint32(y), C.c_uint16(0)) == 1
        lib.TIFFClose(tp)
        return bytes(buf)

    for h, w in [(10, 100), (6, 257)]:
        page = _fax_page(h, w, 3 * h + w)
        want = np.where(page > 0, 0, 255).astype(np.uint8)
        for comp, t4 in [(2, None), (3, 0), (3, 1), (4, None),
                         (3, 4), (3, 5)]:   # libtiff-written fill bits
            t = libtiff_encode_fax(page, comp, t4)
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, 0], want), (comp, t4)


def test_ccitt_module_roundtrips_wide_and_dense():
    """Module-level round trips covering the extended make-up codes
    (runs past 2560) and dense transition rows, all four framings."""
    from evm_archive_spark.operators.ccittfax import (
        decode_g3,
        decode_g4,
        decode_mh,
        encode_g3,
        encode_g4,
        encode_mh,
    )

    rng = np.random.default_rng(67)
    for h, w in [(1, 1), (5, 2800), (7, 2561), (20, 1728)]:
        for p in (0.05, 0.5, 0.95):
            rows = (rng.random((h, w)) < p).astype(np.uint8)
            rows[:, : w // 3] = 0               # long white runs
            rows[h // 2, :] = 1                 # a full black row
            want = np.packbits(rows, axis=1)
            assert np.array_equal(
                decode_mh(encode_mh(rows), w, h), want), ("mh", h, w, p)
            assert np.array_equal(
                decode_g3(encode_g3(rows), w, h), want), ("g3", h, w, p)
            assert np.array_equal(
                decode_g3(encode_g3(rows, two_d=True), w, h,
                          two_d=True), want), ("g3-2d", h, w, p)
            assert np.array_equal(
                decode_g4(encode_g4(rows), w, h), want), ("g4", h, w, p)
            # byte-aligned variants (PDF /EncodedByteAlign, r12) and
            # the continuous-MH K=0 stream
            assert np.array_equal(
                decode_mh(encode_mh(rows, byte_align=False), w, h,
                          byte_align=False), want), ("mh-cont", h, w, p)
            assert np.array_equal(
                decode_g3(encode_g3(rows, two_d=True, byte_align=True),
                          w, h, two_d=True, byte_align=True),
                want), ("g3-ba", h, w, p)
            assert np.array_equal(
                decode_g4(encode_g4(rows, byte_align=True), w, h,
                          byte_align=True), want), ("g4-ba", h, w, p)
            # T.4 fill bits stay transparent to a default decode
            assert np.array_equal(
                decode_g3(encode_g3(rows, fill_bits=True), w, h),
                want), ("g3-fill", h, w, p)


# --------------------------------------------------------------------------
# 16-bit samples, planar configuration 2, bilevel tiles (round 10)
# --------------------------------------------------------------------------


def test_16bit_gray_and_rgb_strips():
    """16-bit samples downshift to their high byte (libtiff's RGBA
    rule), across compressions, predictor and both byte orders."""
    rng = np.random.default_rng(83)
    gray16 = rng.integers(0, 65536, (11, 17), dtype=np.uint16)
    rgb16 = rng.integers(0, 65536, (9, 13, 3), dtype=np.uint16)
    for bo in ("<", ">"):
        for comp in (1, 8, 32773):
            t = encode_tiff(gray16, compression=comp, byte_order=bo,
                            rows_per_strip=4)
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, 0],
                                  (gray16 >> 8).astype(np.uint8)), (bo, comp)
            t = encode_tiff(rgb16, compression=comp, byte_order=bo)
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, :3],
                                  (rgb16 >> 8).astype(np.uint8)), (bo, comp)
    # predictor 2 on 16-bit (mod-65536 differencing)
    t = encode_tiff(rgb16, compression=8, predictor=2)
    assert np.array_equal(decode_tiff(t)[:, :, :3],
                          (rgb16 >> 8).astype(np.uint8))
    # photometric 0 inverts the downshifted gray
    t = encode_tiff(gray16, photometric=0)
    assert np.array_equal(decode_tiff(t)[:, :, 0],
                          255 - (gray16 >> 8).astype(np.uint8))


def test_16bit_tiles():
    rng = np.random.default_rng(89)
    gray16 = rng.integers(0, 65536, (20, 26), dtype=np.uint16)
    for comp in (1, 8):
        t = encode_tiff(gray16, compression=comp, tile_size=(16, 16))
        assert np.array_equal(decode_tiff(t)[:, :, 0],
                              (gray16 >> 8).astype(np.uint8)), comp


def test_planar_configuration_2():
    """PlanarConfiguration 2: one plane per strip run, predictor per
    plane, 8- and 16-bit."""
    rng = np.random.default_rng(97)
    rgb = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    for comp in (1, 8, 32773):
        t = encode_tiff(rgb, compression=comp, planar=2,
                        rows_per_strip=4)
        assert np.array_equal(decode_tiff(t)[:, :, :3], rgb), comp
    t = encode_tiff(rgb, compression=8, planar=2, predictor=2)
    assert np.array_equal(decode_tiff(t)[:, :, :3], rgb)
    rgb16 = rng.integers(0, 65536, (7, 9, 3), dtype=np.uint16)
    t = encode_tiff(rgb16, planar=2, rows_per_strip=3)
    assert np.array_equal(decode_tiff(t)[:, :, :3],
                          (rgb16 >> 8).astype(np.uint8))
    # planar tiled decodes since r11 (test_tiled_planar); a
    # single-sample planar-2 declaration normalizes to chunky (r12)
    one = rgb[:, :, 0]
    t = encode_tiff(one[:, :, None], compression=8, planar=2)
    assert np.array_equal(decode_tiff(t)[:, :, 0], one)


def test_bilevel_tiles():
    rng = np.random.default_rng(101)
    page = ((rng.random((21, 37)) < 0.4) * 255).astype(np.uint8)
    for comp, photom in [(1, 1), (8, 1), (1, 0), (32773, 0)]:
        t = encode_tiff(page, compression=comp, bilevel=True,
                        photometric=photom, tile_size=(16, 16))
        out = decode_tiff(t)
        want = page if photom == 1 else 255 - page
        assert np.array_equal(out[:, :, 0], want), (comp, photom)


def _libtiff_read_strips_raw(lib, data: bytes, nstrips: int):
    """Exact predictor-decoded strip bytes via TIFFReadEncodedStrip —
    the 16-bit pin (libtiff's RGBA reader converts 16->8 by rounding
    (v*255+32767)/65535 while our documented contract is the MSB
    byte, so RGBA equality is the wrong comparison there)."""
    import ctypes as C

    lib.TIFFSetWarningHandler(None)
    READ = C.CFUNCTYPE(C.c_ssize_t, C.c_void_p, C.c_void_p, C.c_ssize_t)
    SEEK = C.CFUNCTYPE(C.c_uint64, C.c_void_p, C.c_uint64, C.c_int)
    CLOSE = C.CFUNCTYPE(C.c_int, C.c_void_p)
    SIZE = C.CFUNCTYPE(C.c_uint64, C.c_void_p)
    pos = [0]

    def _read(_h, buf, n):
        chunk = data[pos[0]: pos[0] + n]
        C.memmove(buf, chunk, len(chunk))
        pos[0] += len(chunk)
        return len(chunk)

    def _seek(_h, off, whence):
        pos[0] = {0: off, 1: pos[0] + off, 2: len(data) + off}[whence]
        return pos[0]

    cbs = (READ(_read), READ(lambda *_: 0), SEEK(_seek),
           CLOSE(lambda _h: 0), SIZE(lambda _h: len(data)))
    lib.TIFFClientOpen.restype = C.c_void_p
    tif = lib.TIFFClientOpen(b"mem", b"r", None, *cbs,
                             C.c_void_p(0), C.c_void_p(0))
    assert tif, "TIFFClientOpen failed"
    try:
        lib.TIFFStripSize.restype = C.c_ssize_t
        lib.TIFFReadEncodedStrip.restype = C.c_ssize_t
        ssz = lib.TIFFStripSize(C.c_void_p(tif))
        out = b""
        for s in range(nstrips):
            buf = (C.c_uint8 * ssz)()
            n = lib.TIFFReadEncodedStrip(
                C.c_void_p(tif), C.c_uint32(s), buf, C.c_ssize_t(ssz))
            assert n > 0, "TIFFReadEncodedStrip failed"
            out += bytes(buf)[:n]
        return out
    finally:
        lib.TIFFClose(C.c_void_p(tif))


@pytest.mark.skipif(_libtiff() is None, reason="no system libtiff")
def test_16bit_planar_bilevel_cross_checked_against_libtiff():
    lib = _libtiff()
    rng = np.random.default_rng(103)
    gray16 = rng.integers(0, 65536, (12, 18), dtype=np.uint16)
    rgb16 = rng.integers(0, 65536, (8, 11, 3), dtype=np.uint16)
    rgb = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    page = ((rng.random((13, 41)) < 0.5) * 255).astype(np.uint8)
    # 8-bit planar + bilevel tiles: RGBA equality (exact there)
    rgba_cases = [
        encode_tiff(rgb, planar=2, rows_per_strip=4),
        encode_tiff(rgb, planar=2, compression=8),
        # NOTE: compressed variants only — this libtiff's RGBA reader
        # rejects UNCOMPRESSED tiles whose raw size != the RGBA raster
        # size (the recorded r9 quirk); comp-1 bilevel tiles are
        # covered by our own round-trip test above
        encode_tiff(page, bilevel=True, tile_size=(16, 16),
                    compression=32773),
        encode_tiff(page, bilevel=True, photometric=0,
                    tile_size=(16, 16), compression=8),
    ]
    for i, payload in enumerate(rgba_cases):
        ours = decode_tiff(payload)
        theirs = _libtiff_decode_rgba(lib, payload)
        assert np.array_equal(ours, theirs), i
    # 16-bit: EXACT raw-sample equality against ReadEncodedStrip,
    # then our >>8 contract on top
    raw_cases = [
        (encode_tiff(gray16, compression=8, rows_per_strip=5),
         gray16[:, :, None], "<u2", 3),
        # libtiff swaps to NATIVE order after decode, so the BE file
        # still reads back as little-endian samples on this box
        (encode_tiff(gray16, byte_order=">"), gray16[:, :, None],
         "<u2", 1),
        (encode_tiff(rgb16, compression=8, predictor=2), rgb16,
         "<u2", 1),
        (encode_tiff(rgb16, planar=2, rows_per_strip=4),
         np.moveaxis(rgb16, 2, 0), "<u2", 6),
    ]
    for i, (payload, want, dt, nstrips) in enumerate(raw_cases):
        raw = _libtiff_read_strips_raw(lib, payload, nstrips)
        theirs = np.frombuffer(raw, dtype=dt).reshape(want.shape)
        assert np.array_equal(theirs, want), ("raw", i)
        ours = decode_tiff(payload)
        if want.shape[0] == 3 and want.ndim == 3:     # planar want
            want8 = (np.moveaxis(want, 0, 2) >> 8).astype(np.uint8)
        elif want.shape[2] == 1:
            want8 = np.repeat((want >> 8).astype(np.uint8), 3, axis=2)
        else:
            want8 = (want >> 8).astype(np.uint8)
        assert np.array_equal(ours[:, :, :3], want8), ("ours", i)


def test_multipage_tiff_pages():
    """tiff_pages walks the next-IFD chain (the scanned-document
    shape); broken chains are typed."""
    from evm_archive_spark.operators.ccittfax import build_tiff_fax
    from evm_archive_spark.operators.tiff import tiff_pages

    rng = np.random.default_rng(107)
    pages = [(rng.random((8, 8 + i)) < 0.4).astype(np.uint8)
             for i in range(4)]
    t = build_tiff_fax(pages, compression=[2, 3, 4, 4])
    got = tiff_pages(t)
    assert len(got) == 4
    for p, g in zip(pages, got):
        assert np.array_equal(g[:, :, 0], np.where(p > 0, 0, 255))
    assert np.array_equal(decode_tiff(t), got[0])
    # single page yields one entry; non-fax single-IFD files work too
    assert len(tiff_pages(build_tiff_fax(pages[0]))) == 1
    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert len(tiff_pages(encode_tiff(gray))) == 1
    # a next-IFD pointer cycling back is typed, not an infinite loop
    bad = bytearray(t)
    n = struct.unpack_from("<H", bad, 8)[0]
    struct.pack_into("<I", bad, 8 + 2 + 12 * n, 8)   # IFD0 -> IFD0
    with pytest.raises(TiffError, match="cycle"):
        tiff_pages(bytes(bad))


def test_old_jpeg_interchange_stream():
    """Compression 6 (old-style JPEG): the recoverable layout — one
    complete stream behind JPEGInterchangeFormat/-Length — decodes
    through the shared jpeg.py dispatch; fragment layouts without an
    interchange stream stay typed."""
    from evm_archive_spark.operators.jpegarith import encode_jpeg_arith

    rng = np.random.default_rng(109)
    blocks = rng.integers(0, 28, (2, 3), dtype=np.uint8) * 8 + 20
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    t = encode_tiff(img, compression=6,
                    jpeg_strip_encoder=encode_jpeg_arith)
    out = decode_tiff(t)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    # declared dims crop the stream; larger declared dims are typed
    bad = bytearray(t)
    i = bad.index(struct.pack("<HH", 257, 3))
    struct.pack_into("<H", bad, i + 8, 999)
    with pytest.raises(TiffError, match="smaller than declared"):
        decode_tiff(bytes(bad))
    # comp 6 without the interchange tag: the strips (which here hold
    # the one whole stream) are tried as the fragment layout, which
    # types on the missing 51x table tags
    bad = bytearray(t)
    i = bad.index(struct.pack("<HH", 513, 4))
    struct.pack_into("<H", bad, i, 51)          # hide the tag
    with pytest.raises(TiffError, match="missing table tags"):
        decode_tiff(bytes(bad))
    # corrupt stream is typed
    bad = bytearray(t)
    bad[-10:] = b"\x00" * 10
    with pytest.raises(TiffError, match="old-JPEG stream"):
        decode_tiff(bytes(bad))


def test_ccitt_tiles():
    """Tiled fax organization (scanned GeoTIFF maps): each tile an
    independent MH/G3/G4 stream at the tile width, edge tiles
    cropped."""
    for h, w in [(21, 37), (16, 16)]:
        page = _fax_page(h, w, h * 3 + w)
        want = np.where(page > 0, 0, 255).astype(np.uint8)
        for comp, t4 in [(2, 0), (3, 1), (4, 0)]:
            t = encode_tiff(page, compression=comp, t4_options=t4,
                            tile_size=(16, 16))
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, 0], want), (comp, t4, h, w)


def test_ccitt_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from evm_archive_spark.operators.ccittfax import (
        decode_g3,
        decode_g4,
        decode_mh,
        encode_g3,
        encode_g4,
        encode_mh,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 80),
           st.integers(0, 2**31 - 1))
    def prop(h, w, seed):
        rng = np.random.default_rng(seed)
        rows = (rng.random((h, w)) < rng.random()).astype(np.uint8)
        want = np.packbits(rows, axis=1)
        assert np.array_equal(decode_mh(encode_mh(rows), w, h), want)
        assert np.array_equal(
            decode_g3(encode_g3(rows, two_d=True), w, h, two_d=True),
            want)
        assert np.array_equal(decode_g4(encode_g4(rows), w, h), want)

    prop()


def encode_tiff_ojpeg_fragments(stream: bytes, rows_per_strip: int,
                                regroup: int = 1) -> bytes:
    """Independent writer for the TIFF 6.0 §22 per-strip old-JPEG
    FRAGMENT layout: parse a complete JPEG interchange stream (SOF0 or
    SOF3, restart markers already inside), hoist its tables into tag
    data (519/520/521 per-component offsets), its geometry into the
    IFD, DRI into tag 515, and write the entropy between restart
    markers as the strips — exactly what 1990s scanner writers did.
    ``regroup`` joins that many consecutive restart intervals per
    strip (internal RSTn markers re-inserted verbatim)."""
    i, dri, proc, prec = 2, 0, None, 8
    tq_tab: dict[int, bytes] = {}
    th_tab: dict[tuple, bytes] = {}
    comps = scomp = None
    ss = ahal = 0
    while True:
        assert stream[i] == 0xFF
        m = stream[i + 1]
        i += 2
        ln = struct.unpack_from(">H", stream, i)[0]
        seg = stream[i + 2:i + ln]
        if m == 0xDB:
            j = 0
            while j < len(seg):
                assert seg[j] >> 4 == 0          # 8-bit tables
                tq_tab[seg[j] & 15] = seg[j + 1:j + 65]
                j += 65
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                nv = sum(seg[j + 1:j + 17])
                th_tab[(tc, th)] = seg[j + 1:j + 17 + nv]
                j += 17 + nv
        elif m == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m in (0xC0, 0xC3):
            proc = 1 if m == 0xC0 else 14
            prec = seg[0]
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = [(seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c])
                     for c in range(nc)]
        elif m == 0xDA:
            ns = seg[0]
            scomp = [(seg[1 + 2 * c], seg[2 + 2 * c])
                     for c in range(ns)]
            ss, ahal = seg[1 + 2 * ns], seg[3 + 2 * ns]
            ent = i + ln
            break
        i += ln
    # split the entropy body at restart markers (stuffing preserved)
    frags, cur, j = [], bytearray(), ent
    while j < len(stream):
        b = stream[j]
        if b == 0xFF:
            m2 = stream[j + 1]
            if m2 == 0x00:
                cur += b"\xff\x00"
                j += 2
                continue
            if 0xD0 <= m2 <= 0xD7:
                frags.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break                                # EOI
        cur.append(b)
        j += 1
    frags.append(bytes(cur))
    if regroup > 1:
        frags = [
            b"".join(
                frags[t] + (b""
                            if t == min(k + regroup, len(frags)) - 1
                            else bytes([0xFF, 0xD0 + t % 8]))
                for t in range(k, min(k + regroup, len(frags)))
            )
            for k in range(0, len(frags), regroup)
        ]

    nc = len(comps)
    photometric = 1 if nc == 1 else 6
    # external value area: table blobs (dedup by id), then strips
    ext = bytearray()
    qoff: dict[int, int] = {}
    hoff: dict[tuple, int] = {}
    for tq, blob in tq_tab.items():
        qoff[tq] = len(ext)
        ext += blob
    for key, blob in th_tab.items():
        hoff[key] = len(ext)
        ext += blob

    entries = []                                 # (tag, typ, vals)
    entries.append((256, 3, (w,)))
    entries.append((257, 3, (h,)))
    entries.append((258, 3, (prec,) * nc))
    entries.append((259, 3, (6,)))
    entries.append((262, 3, (photometric,)))
    entries.append((277, 3, (nc,)))
    entries.append((278, 3, (rows_per_strip,)))
    entries.append((512, 3, (proc,)))
    if dri:
        entries.append((515, 3, (dri,)))
    if proc == 1:
        entries.append((519, 4, tuple(
            qoff[c[2]] for c in comps)))         # patched +base later
        entries.append((521, 4, tuple(
            hoff[(1, td_ta & 15)] for _, td_ta in scomp)))
    else:
        entries.append((517, 3, (ss,) * nc))
        entries.append((518, 3, (ahal & 15,) * nc))
    entries.append((520, 4, tuple(
        hoff[(0, td_ta >> 4)] for _, td_ta in scomp)))
    if photometric == 6:
        entries.append((530, 3, (comps[0][1] >> 4, comps[0][1] & 15)))
    entries.append((273, 4, (0,) * len(frags)))  # patched later
    entries.append((279, 4, tuple(len(fg) for fg in frags)))
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    ext_base = 8 + ifd_size
    # second external area for oversized tag VALUES (offset lists)
    vext = bytearray()
    strips_base = None

    def val_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack("<" + fmt, v) for v in vals)

    # strips follow table area + value area; two passes to know sizes
    vsize = sum(
        len(val_bytes(t, v)) + len(val_bytes(t, v)) % 2
        for _, t, v in entries
        if len(val_bytes(t, v)) > 4)
    strips_base = ext_base + len(ext) + vsize
    offs, pos = [], strips_base
    for fg in frags:
        offs.append(pos)
        pos += len(fg)
    fixed = []
    for tag, typ, vals in entries:
        if tag == 273:
            vals = tuple(offs)
        elif tag in (519, 520, 521):
            vals = tuple(v + ext_base for v in vals)
        vb = val_bytes(typ, vals)
        fixed.append((tag, typ, len(vals), vb))
    out_ifd = bytearray(struct.pack("<H", n))
    vpos = ext_base + len(ext)
    for tag, typ, cnt, vb in fixed:
        if len(vb) <= 4:
            loc = vb.ljust(4, b"\x00")
        else:
            loc = struct.pack("<I", vpos)
            vext += vb + (b"\x00" if len(vb) % 2 else b"")
            vpos += len(vb) + len(vb) % 2
        out_ifd += struct.pack("<HHI", tag, typ, cnt) + loc
    out_ifd += b"\x00\x00\x00\x00"
    return (struct.pack("<2sHI", b"II", 42, 8) + bytes(out_ifd)
            + bytes(ext) + bytes(vext) + b"".join(frags))


def test_old_jpeg_strip_fragments():
    """r11: the per-strip fragment form of compression 6 — tables in
    tags, one scan's entropy split across strips at restart markers.
    Reassembly must reproduce the interchange stream's pixels EXACTLY
    (same entropy bits, same decoder), for baseline gray and 4:4:4 /
    4:2:0 color, lossless (proc 14), and multi-interval strips."""
    from test_jpeg import encode_jpeg

    from evm_archive_spark.operators.jpeg import decode_jpeg
    from evm_archive_spark.operators.jpeglossless import (
        build_jpeg_lossless,
    )

    rng = np.random.default_rng(113)
    # baseline grayscale: 48x32, strips of 16 rows = 2 MCU rows
    img = np.kron(rng.integers(0, 32, (4, 6), np.uint8) * 8,
                  np.ones((8, 8), np.uint8))
    g = np.repeat(img[:, :, None], 3, axis=2)
    stream = encode_jpeg(g, grayscale=True, restart_interval=12)
    want = decode_jpeg(stream)
    t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=16)
    assert np.array_equal(decode_tiff(t), want[:32, :48])
    # multi-interval strips: 2 restart intervals per strip, internal
    # RSTn re-inserted
    t2 = encode_tiff_ojpeg_fragments(stream, rows_per_strip=32,
                                     regroup=2)
    assert np.array_equal(decode_tiff(t2), want[:32, :48])
    # baseline color, 4:4:4 and 4:2:0
    rgb = np.kron(rng.integers(0, 16, (4, 6, 3), np.uint8) * 16,
                  np.ones((8, 8, 1), np.uint8))
    for sampling, rps, ri in [((1, 1), 8, 6), ((2, 2), 16, 3)]:
        stream = encode_jpeg(rgb, sampling=sampling,
                             restart_interval=ri)
        want = decode_jpeg(stream)
        t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=rps)
        assert np.array_equal(decode_tiff(t), want[:32, :48]), sampling
    # lossless proc 14 fragments (medical-scanner form): exact
    mono = rng.integers(0, 256, (24, 10), dtype=np.uint16).astype(
        np.uint8)
    stream = build_jpeg_lossless(mono, predictor=4,
                                 restart_interval=80)
    want = decode_jpeg(stream)
    t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=8)
    assert np.array_equal(decode_tiff(t)[:, :, 0], mono)
    assert np.array_equal(decode_tiff(t), want)


def test_old_jpeg_fragment_typed_boundaries():
    """Truly divergent fragment writers stay typed: multiple strips
    with no JPEGRestartInterval, strip boundaries off restart
    boundaries, missing table tags."""
    from test_jpeg import encode_jpeg

    rng = np.random.default_rng(127)
    img = np.repeat(rng.integers(0, 256, (32, 48, 1), np.uint8),
                    3, axis=2)
    stream = encode_jpeg(img, grayscale=True, restart_interval=12)
    t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=16)
    # hide the restart-interval tag -> divergent
    bad = bytearray(t)
    i = bad.index(struct.pack("<HH", 515, 3))
    struct.pack_into("<H", bad, i, 51)
    with pytest.raises(TiffError, match="divergent"):
        decode_tiff(bytes(bad))
    # strip rows off the restart grid -> divergent
    bad = bytearray(t)
    i = bad.index(struct.pack("<HH", 278, 3))
    struct.pack_into("<H", bad, i + 8, 24)
    with pytest.raises(TiffError, match="divergent|MCU grid"):
        decode_tiff(bytes(bad))
    # missing DC tables -> typed
    bad = bytearray(t)
    i = bad.index(struct.pack("<HH", 520, 4))
    struct.pack_into("<H", bad, i, 51)
    with pytest.raises(TiffError, match="missing table tags"):
        decode_tiff(bytes(bad))


@pytest.mark.skipif(_libtiff() is None, reason="no system libtiff")
def test_old_jpeg_fragments_libtiff_pin():
    """The system libtiff's OJPEG layer accepts the per-strip fragment
    files our writer produces and decodes them to the same pixels
    (+-1 for IDCT rounding, exactly like the compression-7 pin); any
    table-tag / restart-reassembly mistake would be off by far more
    or rejected outright."""
    from test_jpeg import encode_jpeg

    lib = _libtiff()
    rng = np.random.default_rng(131)
    img = np.kron(rng.integers(0, 32, (4, 6), np.uint8) * 8,
                  np.ones((8, 8), np.uint8))
    g = np.repeat(img[:, :, None], 3, axis=2)
    for ri, rps, regroup in [(12, 16, 1), (6, 8, 1), (12, 32, 2)]:
        stream = encode_jpeg(g, grayscale=True, restart_interval=ri)
        t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=rps,
                                        regroup=regroup)
        ours = decode_tiff(t).astype(int)
        theirs = _libtiff_decode_rgba(lib, t)
        assert theirs is not None, (ri, rps)
        assert np.abs(ours - theirs.astype(int)).max() <= 1, (ri, rps)
    # 4:2:0 color
    rgb = np.kron(rng.integers(0, 16, (4, 6, 3), np.uint8) * 16,
                  np.ones((8, 8, 1), np.uint8))
    stream = encode_jpeg(rgb, sampling=(2, 2), restart_interval=3)
    t = encode_tiff_ojpeg_fragments(stream, rows_per_strip=16)
    ours = decode_tiff(t).astype(int)
    theirs = _libtiff_decode_rgba(lib, t)
    assert theirs is not None
    assert np.abs(ours - theirs.astype(int)).max() <= 2


def test_16bit_palette():
    """r11: photometric 3 with 16-bit indices — the index must reach
    the colormap at FULL width (the 16->8 display downshift applies to
    samples, never indices).  Strips and tiles, both byte orders,
    predictor, >256-entry palettes that an 8-bit index cannot hit."""
    rng = np.random.default_rng(137)
    n = 1000                                     # needs 16-bit indices
    cmap = tuple(rng.integers(0, 65536, 3 * n).tolist())
    idx = rng.integers(0, n, (13, 17)).astype(np.uint16)
    cm = np.array(cmap, dtype=np.uint32)
    want = np.stack([(cm[:n][idx] >> 8), (cm[n:2 * n][idx] >> 8),
                     (cm[2 * n:][idx] >> 8)],
                    axis=-1).astype(np.uint8)
    for bo in ("<", ">"):
        for kw in ({}, {"predictor": 2}, {"tile_size": (16, 16)},
                   {"rows_per_strip": 5}):
            t = encode_tiff(idx, photometric=3, colormap=cmap,
                            byte_order=bo, **kw)
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, :3], want), (bo, kw)
            assert (out[:, :, 3] == 255).all()
    # an index beyond the palette is typed, not a wrap-around
    bad_idx = idx.copy()
    bad_idx[0, 0] = n
    t = encode_tiff(bad_idx, photometric=3, colormap=cmap)
    with pytest.raises(TiffError, match="palette index"):
        decode_tiff(t)


def test_tiled_planar():
    """r11: PlanarConfiguration 2 over the TILE organization — the
    tile table carries SamplesPerPixel x TilesPerImage entries (all of
    plane 0's tiles first), each tile one plane, predictor per tile
    per plane.  8- and 16-bit, ragged edges, every byte-oriented
    compression."""
    rng = np.random.default_rng(139)
    rgb8 = rng.integers(0, 256, (21, 26, 3), dtype=np.uint8)
    for comp in (1, 5, 8, 32773):
        for pred in (1, 2):
            if pred == 2 and comp == 1:
                continue
            t = encode_tiff(rgb8, compression=comp, planar=2,
                            tile_size=(16, 16), predictor=pred)
            out = decode_tiff(t)
            assert np.array_equal(out[:, :, :3], rgb8), (comp, pred)
    # 16-bit planar tiles: MSB-byte contract
    rgb16 = rng.integers(0, 65536, (18, 20, 3), dtype=np.uint16)
    for bo in ("<", ">"):
        t = encode_tiff(rgb16, compression=8, planar=2,
                        tile_size=(16, 16), byte_order=bo,
                        predictor=2)
        out = decode_tiff(t)
        assert np.array_equal(out[:, :, :3],
                              (rgb16 >> 8).astype(np.uint8)), bo
    # short planar tile table is typed
    t = bytearray(encode_tiff(rgb8, planar=2, tile_size=(16, 16)))
    i = bytes(t).index(struct.pack("<HH", 324, 4))
    struct.pack_into("<I", t, i + 4, 2)          # count 6 -> 2
    with pytest.raises(TiffError, match="tile tables shorter"):
        decode_tiff(bytes(t))


@pytest.mark.skipif(_libtiff() is None, reason="no system libtiff")
def test_tiled_planar_libtiff_pin():
    """libtiff decodes our tiled planar-2 files (compressed tiles —
    this build's RGBA reader rejects UNCOMPRESSED tiles whose raw size
    differs from the RGBA raster, the standing r9 gotcha) to the same
    pixels."""
    lib = _libtiff()
    rng = np.random.default_rng(149)
    rgb = rng.integers(0, 256, (21, 26, 3), dtype=np.uint8)
    for comp in (5, 8, 32773):
        t = encode_tiff(rgb, compression=comp, planar=2,
                        tile_size=(16, 16))
        ours = decode_tiff(t)
        theirs = _libtiff_decode_rgba(lib, t)
        assert theirs is not None, comp
        assert np.array_equal(ours, theirs), comp


def test_planar2_single_sample_normalizes():
    """PlanarConfig=2 with SamplesPerPixel=1 (r12): byte-identical to
    chunky; real writers emit the tag — pinned against a
    libtiff-written file."""
    import ctypes as C
    import os
    import tempfile

    lib = _libtiff()
    rng = np.random.default_rng(284)
    img = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    path = tempfile.mktemp(suffix=".tif")
    lib.TIFFOpen.restype = C.c_void_p
    tp = C.c_void_p(lib.TIFFOpen(path.encode(), b"w"))
    assert tp.value, "TIFFOpen(w) failed"

    def setf(tag, val):
        assert lib.TIFFSetField(tp, C.c_uint32(tag),
                                C.c_uint32(val)), tag

    setf(256, 13)
    setf(257, 9)
    setf(258, 8)
    setf(259, 1)
    setf(262, 1)
    setf(277, 1)
    setf(278, 9)
    setf(284, 2)                                # PLANARCONFIG_SEPARATE
    for y in range(9):
        assert lib.TIFFWriteScanline(
            tp, C.c_char_p(img[y].tobytes()),
            C.c_uint32(y), C.c_uint16(0)) == 1
    lib.TIFFClose(tp)
    data = open(path, "rb").read()
    os.unlink(path)
    assert np.array_equal(decode_tiff(data)[:, :, 0], img)
