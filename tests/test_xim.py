"""XBM/XPM (operators/xim.py): C-source round trips, the LSB-first
XBM bit order, XPM color grammar (6/3/12-digit hex, named colors,
None transparency, multi-char keys, visual preference), typed
boundaries, and the imagecodec dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.xim import (
    XimError,
    build_xbm,
    build_xpm,
    decode_xbm,
    decode_xpm,
    is_xbm,
    is_xpm,
)


def test_xbm_roundtrip_and_bit_order():
    rng = np.random.default_rng(197)
    bits = (rng.random((9, 19)) < 0.4).astype(np.uint8)
    x = build_xbm(bits, name="icon")
    assert is_xbm(x) and not is_xpm(x)
    out = decode_xbm(x)
    assert np.array_equal(out[:, :, 0],
                          ((1 - bits) * 255).astype(np.uint8))
    # LSB-first: byte 0x01 lights pixel x=0, not x=7
    one = decode_xbm(
        b"#define t_width 8\n#define t_height 1\n"
        b"static unsigned char t_bits[] = { 0x01 };\n")
    assert one[0, 0, 0] == 0 and one[0, 7, 0] == 255
    # decimal and hex literals both legal C
    mixed = decode_xbm(
        b"#define t_width 8\n#define t_height 1\n"
        b"static unsigned char t_bits[] = { 128 };\n")
    assert mixed[0, 7, 0] == 0


def test_xpm_roundtrip_colors_transparency():
    rng = np.random.default_rng(199)
    img = rng.integers(0, 4, (7, 11, 3)).astype(np.uint8) * 80
    mask = rng.random((7, 11)) < 0.2
    for cpp in (1, 2):
        p = build_xpm(img, transparent=mask, cpp=cpp)
        assert is_xpm(p)
        out = decode_xpm(p)
        assert np.array_equal(
            out[:, :, 3], np.where(mask, 0, 255).astype(np.uint8))
        want = img.copy()
        want[mask] = 0
        assert np.array_equal(out[:, :, :3], want), cpp
    # 3-digit hex, 12-digit hex, named colors, m-visual fallback
    p = (b'/* XPM */\nstatic char *x[] = {\n"4 1 4 1",\n'
         b'"a c #F00",\n"b c blue",\n'
         b'"c c #FFFF00000000",\n"d m #00FF00",\n"abcd"};\n')
    out = decode_xpm(p)
    assert out[0, 0].tolist() == [255, 0, 0, 255]
    assert out[0, 1].tolist() == [0, 0, 255, 255]
    assert out[0, 2].tolist() == [255, 0, 0, 255]
    assert out[0, 3].tolist() == [0, 255, 0, 255]


def test_typed_boundaries():
    with pytest.raises(XimError, match="missing width"):
        decode_xbm(b"static unsigned char t_bits[] = {0x00};")
    with pytest.raises(XimError, match="short of width"):
        decode_xbm(b"#define t_width 16\n#define t_height 2\n"
                   b"static unsigned char t_bits[] = { 0x01 };\n")
    with pytest.raises(XimError, match="not an XPM"):
        decode_xpm(b"int main() { return 0; }")
    with pytest.raises(XimError, match="unmapped"):
        decode_xpm(b'/* XPM */\nstatic char *x[] = {\n"1 1 1 1",\n'
                   b'"a c #000",\n"z"};\n')
    with pytest.raises(XimError, match="out of scope"):
        decode_xpm(b'/* XPM */\nstatic char *x[] = {\n"1 1 1 1",\n'
                   b'"a c chartreuse4",\n"a"};\n')
    with pytest.raises(XimError, match="string count"):
        decode_xpm(b'/* XPM */\nstatic char *x[] = {\n"2 2 1 1",\n'
                   b'"a c #000",\n"aa"};\n')


def test_imagecodec_dispatch():
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    b = build_xbm(np.eye(6, dtype=np.uint8))
    assert known_image(b) and decode_image(b).shape == (6, 6, 4)
    p = build_xpm(np.zeros((3, 4, 3), np.uint8))
    assert known_image(p) and decode_image(p).shape == (3, 4, 4)
