"""Tests for the from-scratch stdlib PNG codec (operators/png.py) and the
real strict-mode multimodal paths it unlocks (VERDICT r3 #3).

The fixtures are built by an INDEPENDENT minimal encoder in this file
(chunk writer + forward filter transforms per the W3C spec), so the
decoder's unfilter logic is checked against a second implementation, not
against itself.  encode_png round-trips are additionally covered.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from evm_archive_spark.operators import multimodal
from evm_archive_spark.operators.png import (
    PngError,
    decode_png,
    encode_png,
    grid_features,
    is_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def forward_filter(rows: np.ndarray, bpp: int, ftype: int) -> bytes:
    """Apply the spec's FORWARD filter (what an encoder does) — the
    independent half of the unfilter check."""
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y].astype(np.int32)
        line = bytearray([ftype])
        for x in range(stride):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            line.append((int(cur[x]) - pred) & 0xFF)
        out.extend(line)
        prev = cur
    return bytes(out)


def build_png(
    pixels: np.ndarray,
    color_type: int,
    ftype: int = 0,
    palette: bytes | None = None,
    trns: bytes | None = None,
    interlace: int = 0,
    depth: int = 8,
) -> bytes:
    """Independent PNG writer: pixels is (H, stride) channel bytes."""
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h, stride = pixels.shape
    w = stride // bpp
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette)
    if trns is not None:
        body += chunk(b"tRNS", trns)
    body += chunk(b"IDAT", zlib.compress(forward_filter(pixels, bpp, ftype)))
    return SIG + body + chunk(b"IEND", b"")


def rng_pixels(h: int, stride: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, stride), dtype=np.uint8
    )


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def build_png_adam7(rgba: np.ndarray) -> bytes:
    """Independent Adam7 writer: each pass is extracted by the spec's
    origin/stride grid and filtered as its own sub-image (fresh
    previous-row state per pass), all passes in one zlib stream."""
    h, w = rgba.shape[:2]
    stream = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = rgba[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp, wp = sub.shape[:2]
        stream += forward_filter(sub.reshape(hp, wp * 4), 4, 4)  # Paeth
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1)
    body = chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(stream)))
    return SIG + body + chunk(b"IEND", b"")


def build_png16(rgba_hi: np.ndarray, lo_seed: int = 3) -> bytes:
    """Independent 16-bit RGBA writer: high bytes from ``rgba_hi``, low
    bytes random (the decoder must drop them)."""
    h, w = rgba_hi.shape[:2]
    lo = np.random.default_rng(lo_seed).integers(
        0, 256, size=(h, w, 4), dtype=np.uint8
    )
    samples = np.stack([rgba_hi, lo], axis=3).reshape(h, w * 8)  # big-endian
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 6, 0, 0, 0)
    body = chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(forward_filter(samples, 8, 2))  # Up filter
    )
    return SIG + body + chunk(b"IEND", b"")


def build_png_subbyte(
    idx: np.ndarray, depth: int, color_type: int, palette: bytes | None = None
) -> bytes:
    """Independent sub-byte writer (gray or palette): MSB-first packing
    with row padding."""
    h, w = idx.shape
    rows = bytearray()
    for y in range(h):
        bits = []
        for x in range(w):
            v = int(idx[y, x])
            bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
        while len(bits) % 8:
            bits.append(0)
        packed = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            packed.append(b)
        rows += b"\x00" + bytes(packed)  # filter None per row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", palette)
    body += chunk(b"IDAT", zlib.compress(bytes(rows)))
    return SIG + body + chunk(b"IEND", b"")


def test_adam7_interlace_equals_progressive_scan():
    for h, w, seed in [(16, 16, 1), (13, 11, 2), (1, 1, 3), (7, 3, 4),
                       (2, 9, 5), (8, 8, 6)]:
        rgba = rng_pixels(h, w * 4, seed=seed).reshape(h, w, 4)
        out = decode_png(build_png_adam7(rgba))
        assert np.array_equal(out, rgba), (h, w)


def test_16bit_high_byte_presentation():
    rgba = rng_pixels(9, 7 * 4, seed=11).reshape(9, 7, 4)
    out = decode_png(build_png16(rgba))
    assert np.array_equal(out, rgba)


def test_subbyte_gray_and_palette():
    rng = np.random.default_rng(13)
    for depth in (1, 2, 4):
        hi = 1 << depth
        idx = rng.integers(0, hi, (6, 11), dtype=np.uint8)
        out = decode_png(build_png_subbyte(idx, depth, color_type=0))
        scale = 255 // (hi - 1)
        assert np.array_equal(out[:, :, 0], idx * scale), depth
        assert (out[:, :, 0] == out[:, :, 1]).all()

    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.integers(0, 16, (5, 9), dtype=np.uint8)
    out = decode_png(build_png_subbyte(idx, 4, color_type=3, palette=pal))
    expect = np.frombuffer(pal, dtype=np.uint8).reshape(16, 3)[idx]
    assert np.array_equal(out[:, :, :3], expect)


# --------------------------------------------------------------------------
# decoder vs independent encoder, every filter type x color type
# --------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgba_all_filters(ftype):
    px = rng_pixels(13, 11 * 4, seed=ftype)
    rgba = decode_png(build_png(px, color_type=6, ftype=ftype))
    assert rgba.shape == (13, 11, 4)
    assert np.array_equal(rgba.reshape(13, -1), px)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_all_filters(ftype):
    px = rng_pixels(9, 7 * 3, seed=10 + ftype)
    rgba = decode_png(build_png(px, color_type=2, ftype=ftype))
    assert rgba.shape == (9, 7, 4)
    assert np.array_equal(rgba[:, :, :3].reshape(9, -1), px)
    assert (rgba[:, :, 3] == 255).all()


def test_grayscale_and_gray_alpha():
    g = rng_pixels(5, 6, seed=1)
    rgba = decode_png(build_png(g, color_type=0, ftype=4))
    assert rgba.shape == (5, 6, 4)
    for c in range(3):
        assert np.array_equal(rgba[:, :, c], g)
    assert (rgba[:, :, 3] == 255).all()

    ga = rng_pixels(5, 6 * 2, seed=2)
    rgba = decode_png(build_png(ga, color_type=4, ftype=2))
    pairs = ga.reshape(5, 6, 2)
    for c in range(3):
        assert np.array_equal(rgba[:, :, c], pairs[:, :, 0])
    assert np.array_equal(rgba[:, :, 3], pairs[:, :, 1])


def test_palette_with_transparency():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # 4 entries
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    png = build_png(idx, color_type=3, ftype=1, palette=pal, trns=bytes([10, 255]))
    rgba = decode_png(png)
    assert tuple(rgba[0, 0]) == (255, 0, 0, 10)   # tRNS entry 0
    assert tuple(rgba[0, 1]) == (0, 255, 0, 255)  # tRNS entry 1
    assert tuple(rgba[0, 3]) == (9, 9, 9, 255)    # beyond tRNS: opaque
    assert tuple(rgba[1, 0]) == (9, 9, 9, 255)


def test_encode_decode_round_trip():
    rgba = rng_pixels(17, 12 * 4, seed=42).reshape(17, 12, 4)
    out = decode_png(encode_png(rgba))
    assert np.array_equal(out, rgba)


def test_multi_idat_chunks_concatenate():
    px = rng_pixels(6, 5 * 4, seed=3)
    raw = zlib.compress(forward_filter(px, 4, 0))
    ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 6, 0, 0, 0)
    png = (
        SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw[:10])
        + chunk(b"IDAT", raw[10:])
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png).reshape(6, -1), px)


# --------------------------------------------------------------------------
# malformed / out-of-scope rejection
# --------------------------------------------------------------------------


def test_rejections():
    px = rng_pixels(4, 4 * 4)
    good = build_png(px, color_type=6)

    assert not is_png(b"JFIF....")
    with pytest.raises(PngError, match="signature"):
        decode_png(b"notapng")
    with pytest.raises(PngError, match="CRC"):
        bad = bytearray(good)
        bad[good.index(b"IDAT") + 6] ^= 0xFF  # flip a byte of IDAT data
        decode_png(bytes(bad))
    # interlace=1 claimed but non-interlaced stream: pass-parse fails
    # (misaligned filter bytes or a pass-total size mismatch)
    with pytest.raises(PngError, match="filter|size|passes"):
        decode_png(build_png(px, color_type=6, interlace=1))
    # depth=16 claimed over 8-bit rows -> stream size mismatch
    with pytest.raises(PngError, match="size"):
        decode_png(build_png(px, color_type=6, depth=16))
    # interlace method 2 does not exist
    with pytest.raises(PngError, match="interlace"):
        decode_png(build_png(px, color_type=6, interlace=2))
    # depth invalid for the color type (RGB at depth 4)
    with pytest.raises(PngError, match="bit depth"):
        decode_png(build_png(px, color_type=2, depth=4))
    with pytest.raises(PngError, match="IEND"):
        decode_png(good[:-12])
    with pytest.raises(PngError, match="PLTE"):
        decode_png(build_png(rng_pixels(2, 2) % 2, color_type=3))  # no palette


# --------------------------------------------------------------------------
# strict-mode Spark paths (real decode through the mapInPandas contract)
# --------------------------------------------------------------------------


def _media_df(spark, payloads):
    import pandas as pd

    pdf = pd.DataFrame(
        {"media_id": list(range(len(payloads))), "payload": payloads}
    )
    return spark.createDataFrame(pdf)


def test_decode_images_strict_real_png(spark):
    """VERDICT r3 #3 'done' condition: a real PNG fixture decoded through
    image_features — true dimensions, unit-norm real-pixel features."""
    rgba0 = rng_pixels(20, 30 * 4, seed=5).reshape(20, 30, 4)
    rgba1 = np.zeros((8, 8, 4), dtype=np.uint8)
    rgba1[:, :, 3] = 255
    rgba1[:4, :, :3] = 255  # top half white, bottom black
    payloads = [encode_png(rgba0), encode_png(rgba1)]

    rows = {
        r["media_id"]: r
        for r in multimodal.decode_images(
            _media_df(spark, payloads), strict=True, feature_dim=16
        ).collect()
    }
    assert (rows[0]["width"], rows[0]["height"]) == (30, 20)
    assert (rows[1]["width"], rows[1]["height"]) == (8, 8)
    for r in rows.values():
        f = np.array(r["feature"])
        assert len(f) == 16
        assert abs(np.linalg.norm(f) - 1.0) < 1e-5
    # features reflect the actual pixels: white-over-black image puts all
    # its luminance mass in the top grid rows
    f1 = np.array(rows[1]["feature"]).reshape(4, 4)
    assert f1[:2].sum() > 0.9 and f1[2:].sum() < 1e-9
    # and the values are reproducible (decode is bit-deterministic; the
    # only delta vs a local decode is ArrayType(FloatType)'s float32 cast)
    local = grid_features(decode_png(payloads[1]), 16)
    assert np.allclose(local, rows[1]["feature"], atol=1e-6)


def test_decode_images_strict_rejects_non_png(spark):
    out = multimodal.decode_images(_media_df(spark, [b"not an image"]), strict=True)
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        out.collect()


def test_resize_images_strict_real_png(spark):
    rgba = rng_pixels(16, 16 * 4, seed=9).reshape(16, 16, 4)
    out = multimodal.resize_images(
        _media_df(spark, [encode_png(rgba)]), 4, 4, strict=True
    ).collect()
    assert len(out) == 1
    meta = out[0]["meta"]
    assert meta["mime"] == "image/png"
    resized = decode_png(bytes(out[0]["payload"]))
    assert resized.shape == (4, 4, 4)
    # nearest-neighbor: every output pixel is some input pixel
    ys = (np.arange(4) * 16 // 4).clip(0, 15)
    xs = (np.arange(4) * 16 // 4).clip(0, 15)
    assert np.array_equal(resized, rgba[ys][:, xs])


def test_image_ahash_real_pixels(spark):
    """aHash over REAL decoded PNGs (r4): identical images hash equal,
    a visually identical re-encode hashes equal, the inverted image
    hashes to the bitwise complement, and a structurally different image
    is far in Hamming distance."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    base[:, :, 3] = 255
    half = base.copy()
    half[:16] = 30   # dark top half
    half[16:] = 220  # bright bottom half
    inv = half.copy()
    inv[:, :, :3] = 255 - inv[:, :, :3]

    payloads = [
        encode_png(half),
        encode_png(half),          # identical content, fresh encode
        encode_png(inv),
        encode_png(base),
    ]
    rows = {
        r["media_id"]: r["ahash"]
        for r in multimodal.image_ahash(
            _media_df(spark, payloads), strict=True
        ).collect()
    }
    assert rows[0] == rows[1]
    mask64 = (1 << 64) - 1
    ham = bin((rows[0] ^ rows[2]) & mask64).count("1")
    assert ham == 64  # exact complement: every grid cell flips
    ham_noise = bin((rows[0] ^ rows[3]) & mask64).count("1")
    assert 10 <= ham_noise <= 54  # unrelated image: far from both poles

    # non-PNG payloads: strict raises, non-strict falls back to the fake
    bad = _media_df(spark, [b"jpeg-ish bytes"])
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        multimodal.image_ahash(bad, strict=True).collect()
    fake = multimodal.image_ahash(bad, strict=False).collect()
    assert len(fake) == 1 and isinstance(fake[0]["ahash"], int)


def test_image_near_duplicates_banded_hamming_complete(spark):
    """Pigeonhole banding is COMPLETE: pairs within max_hamming always
    share a band, so the banded join finds exactly the brute-force
    pairs — pinned on real images with planted few-bit perturbations."""
    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    base[:, :, 3] = 255

    def perturb(img, cells):
        """Flip the luminance of `cells` 4x4 grid cells hard enough to
        flip their aHash bits."""
        out = img.copy()
        for (cy, cx) in cells:
            ys, xs = slice(cy * 4, cy * 4 + 4), slice(cx * 4, cx * 4 + 4)
            out[ys, xs, :3] = 255 - out[ys, xs, :3]
        return out

    imgs = [
        base,
        perturb(base, [(0, 0)]),            # near-dup of 0
        perturb(base, [(0, 0), (7, 7)]),    # near-dup of 0 and 1
        rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8),  # unrelated
    ]
    imgs[3][:, :, 3] = 255
    hashes = multimodal.image_ahash(
        _media_df(spark, [encode_png(i) for i in imgs]), strict=True
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.image_near_duplicates(hashes, max_hamming=4).collect()
    }
    # brute force over the collected hashes (4 images)
    hs = {r.media_id: r.ahash for r in hashes.collect()}
    mask64 = (1 << 64) - 1
    expect = {
        (i, j): bin((hs[i] ^ hs[j]) & mask64).count("1")
        for i in hs
        for j in hs
        if i < j and bin((hs[i] ^ hs[j]) & mask64).count("1") <= 4
    }
    assert got == expect
    assert (0, 1) in got  # the planted near-dup was found
    assert all((3 not in pair) for pair in got)  # unrelated image is clean


def test_png_round_trip_property():
    """Hypothesis: arbitrary RGBA arrays survive encode -> decode
    bit-for-bit (sizes incl. 1x1 and wide/tall extremes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, seed):
        rgba = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 4), dtype=np.uint8
        )
        assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    check()


def build_apng(frames, color_type=6, ftypes=None):
    """Independent APNG writer: frames = list of (H, stride) pixel
    arrays; frame 0 becomes IDAT (with a preceding fcTL), the rest
    fdAT.  ``ftypes`` lets each frame use a different scanline filter —
    content hashing must be invariant to that choice."""
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    ftypes = ftypes or [0] * len(frames)
    h0, s0 = frames[0].shape
    ihdr = struct.pack(">IIBBBBB", s0 // bpp, h0, 8, color_type, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    body += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0

    def fctl(px):
        nonlocal seq
        h, s = px.shape
        data = struct.pack(
            ">IIIIIHHBB", seq, s // bpp, h, 0, 0, 1, 10, 0, 0
        )
        seq += 1
        return chunk(b"fcTL", data)

    body += fctl(frames[0])
    body += chunk(
        b"IDAT", zlib.compress(forward_filter(frames[0], bpp, ftypes[0]))
    )
    for px, ft in zip(frames[1:], ftypes[1:]):
        body += fctl(px)
        raw = zlib.compress(forward_filter(px, bpp, ft))
        body += chunk(b"fdAT", struct.pack(">I", seq) + raw)
        seq += 1
    return SIG + body + chunk(b"IEND", b"")


def test_apng_frames_decode_and_filter_invariance():
    from evm_archive_spark.operators.png import decode_apng_frames

    f0 = rng_pixels(6, 8 * 4, seed=31)
    f1 = rng_pixels(4, 5 * 4, seed=32)  # smaller sub-rectangle frame
    f2 = f1.copy()                      # same CONTENT, different filter
    apng = build_apng([f0, f1, f2], ftypes=[0, 2, 4])
    frames = list(decode_apng_frames(apng))
    assert [(i, w, h) for i, w, h, _ in frames] == [
        (0, 8, 6), (1, 5, 4), (2, 5, 4),
    ]
    assert np.array_equal(frames[0][3].reshape(6, -1), f0)
    # filter choice must not affect decoded pixels
    assert np.array_equal(frames[1][3], frames[2][3])

    # plain PNG: exactly one frame
    single = list(decode_apng_frames(build_png(f0, color_type=6)))
    assert len(single) == 1 and single[0][:3] == (0, 8, 6)


def test_frame_sample_strict_real_apng(spark):
    f0 = rng_pixels(6, 8 * 4, seed=41)
    f1 = rng_pixels(6, 8 * 4, seed=42)
    f2 = f1.copy()
    frames = [f0, f1, f2, rng_pixels(6, 8 * 4, seed=43)]
    apng = build_apng(frames, ftypes=[0, 1, 3, 4])
    out = multimodal.frame_sample(
        _media_df(spark, [apng]), every_n=1, strict=True
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
    hashes = [r["frame_hash"] for r in out]
    # same pixels (different filters) hash equal; distinct pixels differ
    assert hashes[1] == hashes[2]
    assert len({hashes[0], hashes[1], hashes[3]}) == 3

    # every_n sampling keeps frames 0 and 2
    sampled = multimodal.frame_sample(
        _media_df(spark, [apng]), every_n=2, strict=True
    ).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 2]

    # non-PNG payloads: strict raises, non-strict keeps the fake
    bad = _media_df(spark, [b"mp4 bytes go here...............!"])
    with pytest.raises(Exception, match="NotImplementedError|PNG"):
        multimodal.frame_sample(bad, strict=True).collect()
    fake = multimodal.frame_sample(bad, every_n=1, strict=False).collect()
    assert len(fake) == 1


def _pooled_nonstrict_fallback_on_out_of_scope_png(spark):
    """ADVICE r4: strict=False must NEVER fail the job — a malformed
    PNG (nonexistent interlace method 2; 16-bit and Adam7 are now
    really decoded) and a corrupt PNG (bad CRC) fall back to the
    deterministic sha256 fake in image_ahash and frame_sample, while
    strict=True still raises."""
    px = rng_pixels(4, 4 * 4)
    good = encode_png(px.reshape(4, 4, 4))
    deep = build_png(px, color_type=6, interlace=2)    # invalid header
    corrupt = bytearray(build_png(px, color_type=6))
    corrupt[corrupt.index(b"IDAT") + 6] ^= 0xFF        # CRC mismatch
    corrupt = bytes(corrupt)
    media = _media_df(spark, [good, deep, corrupt, b"not png at all"])

    rows = multimodal.image_ahash(media, strict=False).collect()
    assert len(rows) == 4  # nothing raised, every payload hashed
    frames = multimodal.frame_sample(media, every_n=1, strict=False).collect()
    assert {r["media_id"] for r in frames} == {0, 1, 2, 3}
    # the fallback is the documented fake, not a zeroed placeholder:
    # same recipe as a non-PNG payload of the same bytes
    by_id = {r["media_id"]: r["ahash"] for r in rows}
    import hashlib as _h

    h = _h.sha256(deep).digest() * 2
    g = np.frombuffer(h, dtype=np.uint8)[:64].reshape(8, 8).astype(float)
    want = 0
    for bit in (g > g.mean()).flatten():
        want = (want << 1) | int(bit)
    if want >= 1 << 63:
        want -= 1 << 64
    assert by_id[1] == want

    # strict mode still fails loudly on both
    with pytest.raises(Exception, match="interlace|PNG|Png"):
        multimodal.image_ahash(
            _media_df(spark, [deep]), strict=True
        ).collect()
    with pytest.raises(Exception, match="CRC|PNG|Png"):
        multimodal.frame_sample(
            _media_df(spark, [corrupt]), strict=True
        ).collect()


def _pooled_image_dedup_pipeline_end_to_end_and_scan_once(spark):
    """VERDICT r4 #6: aHash -> banded Hamming join -> components ->
    survivors over REAL decoded images, and the corpus payloads are
    decoded exactly once (accumulator pin on a pass-through wrapper —
    the naive plan would decode 3x: both join sides + the join-back)."""
    rng = np.random.default_rng(31)
    base = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    base[:, :, 3] = 255

    def perturb(img, cells):
        out = img.copy()
        for (cy, cx) in cells:
            block = out[cy * 4 : cy * 4 + 4, cx * 4 : cx * 4 + 4, :3]
            out[cy * 4 : cy * 4 + 4, cx * 4 : cx * 4 + 4, :3] = 255 - block
        return out

    far = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
    far[:, :, 3] = 255
    # 0 and 1: identical; 2: tiny perturbation of base; 3: unrelated
    payloads = [
        encode_png(base),
        encode_png(base),
        encode_png(perturb(base, [(0, 0)])),
        encode_png(far),
    ]
    media = _media_df(spark, payloads)
    acc = spark.sparkContext.accumulator(0)

    def counted(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    wrapped = media.mapInPandas(counted, media.schema)
    survivors = multimodal.image_dedup_pipeline(
        wrapped, max_hamming=8, strict=True
    )
    ids = sorted(r["media_id"] for r in survivors.collect())
    # cluster {0,1,2} -> min id 0 survives; 3 is alone
    assert ids == [0, 3]
    assert acc.value == 4, f"decoded {acc.value} payloads, expected 4"
    # survivors carry the hash for index append
    assert set(survivors.columns) == {"media_id", "ahash"}


def _pooled_incremental_image_dedup_against_persisted_index(spark, tmp_path):
    """Incremental form of the image lane: shard B probed against the
    PERSISTED index of admitted A — admitted B images are exactly those
    not within max_hamming of any A hash (exact-verify via the full
    hash riding in the index), without re-reading any A payload."""
    rng = np.random.default_rng(37)
    imgs = []
    for _ in range(3):
        im = rng.integers(0, 256, size=(32, 32, 4), dtype=np.uint8)
        im[:, :, 3] = 255
        imgs.append(im)
    a_payloads = [encode_png(imgs[0]), encode_png(imgs[1])]
    # shard B: a re-encode of A's first image (dup), plus a fresh one
    b_payloads = [encode_png(imgs[0]), encode_png(imgs[2])]

    media_a = _media_df(spark, a_payloads)
    admitted_a = multimodal.image_dedup_pipeline(
        media_a, max_hamming=6, strict=True
    )
    idx = multimodal.image_hash_index(admitted_a, max_hamming=6)
    spark.sql("DROP TABLE IF EXISTS img_idx_t")
    index = multimodal.persist_image_hash_index(
        spark, idx, "img_idx_t", str(tmp_path / "imgidx"), n_buckets=8
    )

    import pandas as pd

    pdf = pd.DataFrame(
        {"media_id": [10, 11], "payload": b_payloads}
    )
    media_b = spark.createDataFrame(pdf)
    admitted_b = multimodal.incremental_image_dedup(
        media_b, index, max_hamming=6, strict=True
    )
    assert [r["media_id"] for r in admitted_b.collect()] == [11]

    # append the survivors' band rows; a replay of the same shard now
    # admits nothing (the persisted state does the remembering)
    multimodal.image_hash_index(admitted_b, max_hamming=6).write.insertInto(
        "img_idx_t"
    )
    again = multimodal.incremental_image_dedup(
        media_b, spark.table("img_idx_t"), max_hamming=6, strict=True
    )
    assert again.count() == 0


def _pooled_stream_image_admission_equals_sequential_replay(spark, tmp_path):
    """Streaming image admission == sequential batch replay: two
    micro-batches of real PNGs through stream_image_admission produce
    exactly the survivors of batch-by-batch incremental_image_dedup
    against the same growing index, with a cross-batch visual dup
    dropped by the persisted state (its payload never re-read)."""
    import pandas as pd

    from evm_archive_spark.operators.multimodal import (
        image_dedup_pipeline,
        image_hash_index,
        incremental_image_dedup,
        stream_image_admission,
    )

    rng = np.random.default_rng(47)

    def img(seed):
        im = rng.integers(0, 256, size=(24, 24, 4), dtype=np.uint8)
        im[:, :, 3] = 255
        return im

    a, b, c = img(1), img(2), img(3)
    batch1 = [(0, encode_png(a)), (1, encode_png(a)), (2, encode_png(b))]
    batch2 = [(10, encode_png(a)), (11, encode_png(c))]
    schema = "media_id long, payload binary"
    b1 = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in batch1],
                      "payload": [r[1] for r in batch1]})
    )
    b2 = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in batch2],
                      "payload": [r[1] for r in batch2]})
    )
    src = tmp_path / "src"
    b1.coalesce(1).write.mode("append").parquet(str(src))
    b2.coalesce(1).write.mode("append").parquet(str(src))

    state = str(tmp_path / "state")
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = stream_image_admission(stream, state, max_hamming=6, strict=True)
    q.awaitTermination()

    got = sorted(
        r["media_id"]
        for r in spark.read.parquet(f"{state}/survivors").collect()
    )

    # sequential replay: same shards, growing in-memory index
    idx = spark.createDataFrame([], "media_id long, ahash long, bi int, bv long")
    expect = []
    for shard in (b1, b2):
        surv = incremental_image_dedup(
            shard, idx, max_hamming=6, strict=True
        ).localCheckpoint()
        expect += [r["media_id"] for r in surv.collect()]
        idx = idx.union(image_hash_index(surv, max_hamming=6)).localCheckpoint()
    assert got == sorted(expect)
    # within-batch dup (1 vs 0) and cross-batch dup (10 vs 0) dropped;
    # novel images admitted
    assert got == [0, 2, 11]
    # the index holds exactly the survivors' band rows
    # (max_hamming + 1 = 7 bands per image)
    assert spark.read.parquet(f"{state}/index").count() == 3 * 7


# --------------------------------------------------------------------------
# Cross-check against the SYSTEM libpng (round 9): the same
# both-directions pin the VP8L codec has against libwebp, through
# libpng's simplified API (png_image — a flat struct, stable ABI).
# --------------------------------------------------------------------------


def _libpng():
    import ctypes

    try:
        return ctypes.CDLL("libpng16.so.16")
    except OSError:
        return None


def _png_image_struct():
    import ctypes

    class PngImage(ctypes.Structure):
        # field ORDER per the system png.h: opaque precedes version
        _fields_ = [
            ("opaque", ctypes.c_void_p),
            ("version", ctypes.c_uint32),
            ("width", ctypes.c_uint32),
            ("height", ctypes.c_uint32),
            ("format", ctypes.c_uint32),
            ("flags", ctypes.c_uint32),
            ("colormap_entries", ctypes.c_uint32),
            ("warning_or_error", ctypes.c_uint32),
            ("message", ctypes.c_char * 64),
        ]

    return PngImage


def _libpng_decode_rgba(lib, payload: bytes):
    import ctypes

    PngImage = _png_image_struct()
    img = PngImage()
    img.version = 1                                 # PNG_IMAGE_VERSION
    if not lib.png_image_begin_read_from_memory(
            ctypes.byref(img), payload, ctypes.c_size_t(len(payload))):
        raise AssertionError(img.message)
    img.format = 3                                  # PNG_FORMAT_RGBA
    stride = img.width * 4
    buf = (ctypes.c_ubyte * (stride * img.height))()
    if not lib.png_image_finish_read(ctypes.byref(img), None, buf,
                                     ctypes.c_int32(stride), None):
        raise AssertionError(img.message)
    return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
        img.height, img.width, 4)


def _libpng_encode_rgba(lib, rgba) -> bytes:
    import ctypes

    PngImage = _png_image_struct()
    h, w = rgba.shape[:2]
    img = PngImage()
    img.version = 1
    img.width, img.height = w, h
    img.format = 3
    raw = np.ascontiguousarray(rgba).tobytes()
    size = ctypes.c_size_t(0)
    lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size),
        ctypes.c_int(0), raw, ctypes.c_int32(w * 4), None)
    assert size.value > 0, bytes(img.message)
    mem = ctypes.create_string_buffer(size.value)
    ok = lib.png_image_write_to_memory(
        ctypes.byref(img), mem, ctypes.byref(size),
        ctypes.c_int(0), raw, ctypes.c_int32(w * 4), None)
    assert ok, bytes(img.message)
    return mem.raw[: size.value]


@pytest.mark.skipif(_libpng() is None, reason="no system libpng")
def test_cross_checked_against_libpng_both_directions():
    """encode_png output decodes identically under libpng, and
    libpng-written files (truecolor AND the palette form libpng picks
    for low-color images) decode identically under decode_png."""
    lib = _libpng()
    rng = np.random.default_rng(47)
    images = [
        rng.integers(0, 256, (21, 17, 4), dtype=np.uint8),   # truecolor
        rng.integers(0, 256, (64, 48, 4), dtype=np.uint8),
        np.repeat(np.repeat(
            rng.integers(0, 4, (8, 8), dtype=np.uint8) * 80, 4, 0
        ), 4, 1)[:, :, None].repeat(4, axis=2),              # low-color
    ]
    images[2][:, :, 3] = 255
    for i, rgba in enumerate(images):
        ours = encode_png(rgba)
        assert np.array_equal(_libpng_decode_rgba(lib, ours), rgba), i
        theirs = _libpng_encode_rgba(lib, rgba)
        assert np.array_equal(decode_png(theirs), rgba), i
