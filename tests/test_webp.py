"""VP8L (lossless WebP): writer/decoder round trips across every
bitstream feature (literals, color cache, LZ77 backrefs, the four
transforms), the codec-dispatch registration, typed boundaries
(lossy VP8, truncation, bombs), and a hypothesis property over
arbitrary small images."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.webp import (
    MAX_WEBP_PIXELS,
    WebpError,
    _DIST_MAP,
    build_webp_lossless,
    decode_webp,
    is_webp,
)

VARIANTS = ("literal", "cache", "backref", "subgreen", "predictor",
            "palette", "colortx", "meta")


def _img(rng, h, w, variant):
    if variant == "palette":
        pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
        return pal[rng.integers(0, 5, (h, w))]
    a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    if variant in ("cache", "backref"):
        a[::2] = rng.integers(0, 256, (4,), dtype=np.uint8)
    return a


def test_roundtrip_all_variants_and_shapes():
    rng = np.random.default_rng(11)
    for variant in VARIANTS:
        for (h, w) in ((1, 1), (1, 9), (9, 1), (3, 5), (16, 12),
                       (33, 17)):
            a = _img(rng, h, w, variant)
            b = build_webp_lossless(a, variant=variant)
            assert is_webp(b)
            got = decode_webp(b)
            assert got.shape == a.shape, (variant, h, w)
            assert (got == a).all(), (variant, h, w)


def test_distance_map_spec_head():
    """The generated 120-entry close-neighbor map: spot-pin the head
    entries given explicitly in the spec's table and the structural
    invariants (count, x/y ranges, no forward references)."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert _DIST_MAP[12:18] == [
        (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1)]
    assert all(-7 <= x <= 8 and 0 <= y <= 7 for x, y in _DIST_MAP)
    assert all(y > 0 or x > 0 for x, y in _DIST_MAP)
    assert len(set(_DIST_MAP)) == 120


def test_close_distance_codes_decode():
    """Backrefs through the 120-entry map (dist-code <= 120): craft a
    stream via the writer's token path by round-tripping an image
    whose best backref distance is 1 (map entry (1,0) = code 2) —
    then force a map-path decode by hand-checking dist resolution."""
    # dist=1 run copy (the writer uses linear codes; the decoder's
    # map path is pinned separately in test_distance_map_spec_head +
    # the resolution arithmetic here)
    w = 7
    xi, yi = _DIST_MAP[0]                          # (0, 1) -> dist = w
    assert yi * w + xi == w
    xi, yi = _DIST_MAP[1]                          # (1, 0) -> dist = 1
    assert yi * w + xi == 1


def test_alpha_roundtrip_and_flag():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    a[:, :, 3] = 255
    b = build_webp_lossless(a)
    assert (decode_webp(b) == a).all()
    a2 = a.copy()
    a2[0, 0, 3] = 7                                # transparent pixel
    assert (decode_webp(build_webp_lossless(a2)) == a2).all()


def test_codec_dispatch_and_strict_lanes():
    from evm_archive_spark.operators.imagecodec import (
        IMAGE_ERRORS,
        decode_image,
        known_image,
    )

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    b = build_webp_lossless(a, variant="subgreen")
    assert known_image(b)
    assert (decode_image(b) == a).all()
    assert WebpError in IMAGE_ERRORS


def test_lossy_and_malformed_are_typed():
    # lossy VP8 chunk: typed out-of-scope, not a crash
    vp8 = b"\x00" * 20
    riff = b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    b = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    with pytest.raises(WebpError, match="lossy"):
        decode_webp(b)

    with pytest.raises(WebpError, match="not a WebP"):
        decode_webp(b"garbage")

    # a crafted header declaring a huge canvas fires the pixel cap
    # BEFORE any allocation
    from evm_archive_spark.operators.webp import _Bw

    bw = _Bw()
    bw.put(16383, 14)
    bw.put(16383, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    vp8l = b"\x2f" + bw.tobytes() + b"\x00" * 8
    riff = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    bomb = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    assert 16384 * 16384 > MAX_WEBP_PIXELS
    with pytest.raises(WebpError, match="cap"):
        decode_webp(bomb)

    # truncation fuzz: every cut is a typed error, never a crash
    rng = np.random.default_rng(9)
    good = build_webp_lossless(
        rng.integers(0, 256, (9, 7, 4), dtype=np.uint8), variant="cache")
    for cut in range(0, len(good), 7):
        try:
            decode_webp(good[:cut])
        except WebpError:
            pass


def test_ahash_lane_uses_real_webp_pixels():
    """The multimodal aHash lane must produce the same hash for the
    same pixels whether they arrive as PNG or lossless WebP — proof
    the decode is real, not the sha256 fake."""
    from evm_archive_spark.operators.multimodal import _ahash_of
    from evm_archive_spark.operators.png import encode_png

    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    a[:, :, 3] = 255
    h_webp = _ahash_of(build_webp_lossless(a), strict=True)
    h_png = _ahash_of(encode_png(a), strict=True)
    assert h_webp == h_png


def test_property_roundtrip_random_images():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31),
        variant=st.sampled_from(VARIANTS),
    )
    def check(h, w, seed, variant):
        rng = np.random.default_rng(seed)
        a = _img(rng, h, w, variant)
        assert (decode_webp(build_webp_lossless(a, variant=variant))
                == a).all()

    check()


def _libwebp():
    """The system libwebp, when present — the REAL cross-
    implementation pin for both directions."""
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    if not all(hasattr(lib, s) for s in (
            "WebPEncodeLosslessRGBA", "WebPDecodeRGBA", "WebPFree")):
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    return lib


@pytest.mark.skipif(_libwebp() is None, reason="no system libwebp")
def test_cross_checked_against_libwebp_both_directions():
    """Implementation-against-implementation: (1) libwebp decodes OUR
    writer's output (all 8 variants) to the original pixels; (2) OUR
    decoder agrees bit-exactly with libwebp's decoder on streams
    produced by libwebp's OWN lossless encoder.  Note the encoder
    default rewrites RGB under fully-transparent pixels (alpha
    cleanup), so direction 2 compares decoder-vs-decoder, not
    vs the original array."""
    import ctypes

    lib = _libwebp()

    def lib_decode(data: bytes) -> np.ndarray:
        w, h = ctypes.c_int(), ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            data, ctypes.c_size_t(len(data)),
            ctypes.byref(w), ctypes.byref(h))
        assert p, "libwebp failed to decode"
        arr = np.ctypeslib.as_array(
            p, shape=(h.value, w.value, 4)).copy()
        lib.WebPFree(p)
        return arr

    rng = np.random.default_rng(31)
    for variant in VARIANTS:
        for (h, w) in ((1, 1), (5, 3), (16, 12), (9, 33)):
            a = _img(rng, h, w, variant)
            ours = build_webp_lossless(a, variant=variant)
            assert (lib_decode(ours) == a).all(), (variant, h, w)

    for (h, w) in ((1, 1), (7, 5), (16, 16), (11, 40), (64, 48)):
        a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGBA(
            a.tobytes(), w, h, w * 4, ctypes.byref(out))
        assert n > 0
        enc = bytes(bytearray(out[i] for i in range(n)))
        lib.WebPFree(out)
        assert (decode_webp(enc) == lib_decode(enc)).all(), (h, w)
    # structured content drives the encoder into predictor/color
    # transforms + real LZ77 — the decode paths that matter
    grad = np.zeros((40, 56, 4), dtype=np.uint8)
    ys, xs = np.mgrid[0:40, 0:56]
    grad[:, :, 0] = (xs * 4) & 0xFF
    grad[:, :, 1] = (ys * 6) & 0xFF
    grad[:, :, 2] = ((xs + ys) * 3) & 0xFF
    grad[:, :, 3] = 255
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(
        grad.tobytes(), 56, 40, 56 * 4, ctypes.byref(out))
    enc = bytes(bytearray(out[i] for i in range(n)))
    lib.WebPFree(out)
    assert (decode_webp(enc) == grad).all()
