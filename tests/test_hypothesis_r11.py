"""Hypothesis round-trip properties for the round-11 codecs (the
LZO/LZX/CCITT pattern): arbitrary valid inputs survive NetPBM, XBM/
XPM, DICOM Annex-G RLE, and the CAB spanning-set walk exactly."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_dims = st.tuples(st.integers(1, 17), st.integers(1, 23))


@st.composite
def _gray(draw, maxval=255):
    h, w = draw(_dims)
    data = draw(st.binary(min_size=h * w * 2, max_size=h * w * 2))
    arr = np.frombuffer(data, dtype=np.uint16).reshape(h, w)
    return (arr % (maxval + 1)).astype(np.uint32)


@settings(max_examples=40, deadline=None)
@given(img=_gray(), kind=st.sampled_from(["P2", "P5"]))
def test_pnm_gray_roundtrip(img, kind):
    from evm_archive_spark.operators.netpbm import build_pnm, decode_pnm

    out = decode_pnm(build_pnm(img, kind))
    assert np.array_equal(out[:, :, 0], img.astype(np.uint8))


@settings(max_examples=25, deadline=None)
@given(img=_gray(maxval=65535))
def test_pnm_16bit_roundtrip(img):
    from evm_archive_spark.operators.netpbm import build_pnm, decode_pnm

    out = decode_pnm(build_pnm(img, "P5", maxval=65535))
    want = ((img * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(out[:, :, 0], want)


@settings(max_examples=40, deadline=None)
@given(img=_gray(maxval=1))
def test_xbm_roundtrip(img):
    from evm_archive_spark.operators.xim import build_xbm, decode_xbm

    out = decode_xbm(build_xbm(img.astype(np.uint8)))
    assert np.array_equal(
        out[:, :, 0], ((1 - img) * 255).astype(np.uint8))


@settings(max_examples=30, deadline=None)
@given(img=_gray(maxval=3), cpp=st.sampled_from([1, 2]))
def test_xpm_roundtrip(img, cpp):
    from evm_archive_spark.operators.xim import build_xpm, decode_xpm

    rgb = np.repeat((img * 85).astype(np.uint8)[:, :, None], 3, 2)
    out = decode_xpm(build_xpm(rgb, cpp=cpp))
    assert np.array_equal(out[:, :, :3], rgb)


@settings(max_examples=25, deadline=None)
@given(img=_gray(maxval=65535), bits=st.sampled_from([8, 12, 16]))
def test_dicom_rle_roundtrip(img, bits):
    from evm_archive_spark.operators.dicom import (
        UID_RLE,
        build_dicom,
        dicom_pixels,
    )

    img = (img % (1 << bits)).astype(np.uint16)
    d = build_dicom(img, bits_stored=bits, transfer_syntax=UID_RLE)
    px, ob = dicom_pixels(d)
    assert ob == bits and np.array_equal(px[:, :, 0], img)


@settings(max_examples=15, deadline=None)
@given(
    blobs=st.lists(st.binary(min_size=0, max_size=30_000),
                   min_size=1, max_size=3),
    comp=st.sampled_from(["none", "mszip"]),
    split=st.booleans(),
)
def test_cab_set_roundtrip(blobs, comp, split):
    from evm_archive_spark.operators.cab import (
        CabError,
        build_cab_set,
        cab_set_members,
    )

    files = [(f"f{k}.bin", b) for k, b in enumerate(blobs)]
    try:
        cabs = build_cab_set(files, comp, n_cabs=2, split_block=split)
    except CabError as e:
        # a tiny total stream may not span 2 cabinets — legal refusal
        assert "cannot span" in str(e)
        return
    assert list(cab_set_members(cabs)) == [
        (n, len(b), b) for n, b in files]
