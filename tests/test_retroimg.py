"""TGA + PCX decoders (operators/tga.py, operators/pcx.py): writer
round trips across variants, sniff discipline for the magic-less TGA,
typed boundaries, imagecodec routing."""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.pcx import (
    PcxError,
    build_pcx,
    decode_pcx,
    is_pcx,
)
from evm_archive_spark.operators.tga import (
    TgaError,
    build_tga,
    decode_tga,
    is_tga,
)


def _rgba(h, w, seed, quant=1):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    if quant > 1:
        img = (img // quant) * quant
        img[:, :, 3] = 255
    return img


def test_tga_roundtrip_variants():
    img = _rgba(13, 9, 3)
    gray = img.copy()
    gray[:, :, 1] = gray[:, :, 2] = gray[:, :, 0]
    pal = _rgba(13, 9, 5, quant=64)
    for src, t in ((img, 2), (gray, 3), (pal, 1)):
        for rle in (False, True):
            for td in (True, False):
                b = build_tga(src, img_type=t, rle=rle, top_down=td)
                assert is_tga(b), (t, rle, td)
                assert np.array_equal(decode_tga(b), src), (t, rle, td)
    # 32-bit alpha passes through
    a = _rgba(6, 6, 7)
    a[:, :, 3] = np.arange(36, dtype=np.uint8).reshape(6, 6) * 7
    assert np.array_equal(decode_tga(build_tga(a)), a)


def test_tga_sniff_is_footer_validated():
    img = _rgba(4, 4, 9)
    naked = build_tga(img, footer=False)
    assert not is_tga(naked)                    # magic-less v1 file
    assert np.array_equal(decode_tga(naked), img)  # direct decode ok
    assert is_tga(build_tga(img))
    assert not is_tga(b"\x00" * 64)
    # a footer glued to a bogus header is still rejected
    from evm_archive_spark.operators.tga import _FOOTER_SIG

    assert not is_tga(b"\xff" * 64 + _FOOTER_SIG)


def test_tga_typed_boundaries():
    img = _rgba(8, 8, 11)
    good = build_tga(img, rle=True)
    with pytest.raises(TgaError):
        decode_tga(good[:40])                   # truncated RLE
    with pytest.raises(TgaError, match="not a TGA"):
        decode_tga(b"junk")
    # palette image without a colormap is typed
    bad = bytearray(build_tga(_rgba(4, 4, 13, quant=64), img_type=1))
    bad[1] = 0                                  # claim no colormap
    with pytest.raises(TgaError, match="palette|colormap"):
        decode_tga(bytes(bad))


def test_pcx_roundtrip_and_boundaries():
    img = _rgba(11, 7, 15)
    assert is_pcx(build_pcx(img))
    assert np.array_equal(decode_pcx(build_pcx(img)), img)
    pal = _rgba(5, 9, 17, quant=64)             # odd width: bpl pad
    assert np.array_equal(decode_pcx(build_pcx(pal, palette=True)),
                          pal)
    good = build_pcx(img)
    with pytest.raises(PcxError):
        decode_pcx(good[:200])                  # truncated RLE
    with pytest.raises(PcxError, match="not a PCX"):
        decode_pcx(b"nope")
    # palette form without its tail marker is typed
    b = bytearray(build_pcx(pal, palette=True))
    b[-769] = 0
    with pytest.raises(PcxError, match="palette marker"):
        decode_pcx(bytes(b))


def test_imagecodec_routing():
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    img = _rgba(8, 8, 19)
    for payload in (build_tga(img), build_pcx(img)):
        assert known_image(payload)
        assert np.array_equal(decode_image(payload), img)
    # footerless TGA is NOT sniffed (never claims arbitrary payloads)
    assert not known_image(build_tga(img, footer=False))
