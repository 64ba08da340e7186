"""JPEG 2000 Part-1 lossless subset (operators/jpeg2000.py): 5/3 DWT,
EBCOT Tier-1/Tier-2, codestream framing, JP2 container, typed
boundaries, golden freeze.

Pin strategy mirrors test_jbig2 (no system J2K codec in-env): DWT
perfect reconstruction stands alone; the MQ coder is the
fuzz+freeze-pinned jbig2.py coder; Tier-1/2 get round-trip fuzz over
depths/levels/components/sizes + golden freeze + truncation fuzz."""

import hashlib

import numpy as np
import pytest

from evm_archive_spark.operators.jpeg2000 import (
    Jpeg2000Error,
    build_jp2,
    decode_j2k,
    decode_jpx,
    dwt53_forward,
    dwt53_inverse,
    encode_j2k,
    is_jpeg2000,
)


def test_dwt53_perfect_reconstruction():
    rng = np.random.default_rng(1)
    for _ in range(40):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
        lv = int(rng.integers(0, 5))
        img = rng.integers(-4096, 4096, (h, w)).astype(np.int64)
        bands, ll = dwt53_forward(img, lv)
        rec = dwt53_inverse(bands, ll)
        assert rec.shape == img.shape and (rec == img).all(), (h, w, lv)


def test_dwt53_analytic_two_sample():
    # n=2: h[0] = x1 - x0; lo[0] = x0 + floor((2*h0 + 2)/4)
    bands, ll = dwt53_forward(np.array([[10, 14]]), 1)
    assert bands[0]["HL"][0, 0] == 4 and ll[0, 0] == 10 + ((8 + 2) >> 2)


def test_j2k_round_trips_depths_levels_components():
    rng = np.random.default_rng(22)
    for trial in range(15):
        h, w = int(rng.integers(1, 80)), int(rng.integers(1, 80))
        depth = [8, 12, 16, 4, 1][trial % 5]
        levels = trial % 4
        nc = 3 if trial % 3 == 0 else 1
        shape = (h, w, 3) if nc == 3 else (h, w)
        img = rng.integers(0, 1 << depth, shape).astype(
            np.uint16 if depth > 8 else np.uint8)
        for rct in ([True, False] if nc == 3 else [False]):
            out = decode_j2k(encode_j2k(
                img, depth=depth, levels=levels, rct=rct))
            assert out.shape == img.shape and (out == img).all(), \
                (trial, depth, levels, nc, rct)


def test_j2k_codeblock_grid_and_many_levels():
    rng = np.random.default_rng(31)
    # multiple codeblocks per band (small cb_exp), deep decomposition
    img = rng.integers(0, 4096, (70, 90)).astype(np.uint16)
    code = encode_j2k(img, depth=12, levels=5, cb_exp=(4, 4))
    assert (decode_j2k(code) == img).all()


def test_jp2_container_and_sniffer():
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    jp2 = build_jp2(img)
    raw = encode_j2k(img)
    assert is_jpeg2000(jp2) and is_jpeg2000(raw)
    assert not is_jpeg2000(b"\x89PNG") and not is_jpeg2000(b"")
    assert (decode_jpx(jp2) == img).all()
    assert (decode_jpx(raw) == img).all()


def test_multi_layer_and_sop_eph_round_trips():
    """r13 second wave: quality layers (layer-partitioned codeword
    segments, persistent inclusion/Lblock tag-tree state) and SOP/EPH
    packet markers — the two features real progressive streams use."""
    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    for layers in (2, 3, 5):
        for sop, eph in ((False, False), (True, True)):
            code = encode_j2k(img, levels=2, layers=layers,
                              sop=sop, eph=eph)
            assert (decode_j2k(code) == img).all(), (layers, sop, eph)
    # multi-codeblock grid + layers + markers, 12-bit
    deep = rng.integers(0, 4096, (30, 41)).astype(np.uint16)
    code = encode_j2k(deep, depth=12, levels=3, layers=4,
                      cb_exp=(4, 4), sop=True, eph=True)
    assert (decode_j2k(code) == deep).all()
    # layered stream with a dropped trailing layer = truncated
    # codeblocks -> NAMED typed boundary, not garbage pixels
    code1 = encode_j2k(img, levels=1, layers=3)
    # find the SOD and cut most of the body off
    sod = code1.index(b"\xff\x93")
    cut = code1[:sod + 2 + (len(code1) - sod) // 3] + b"\xff\xd9"
    with pytest.raises((Jpeg2000Error, NotImplementedError)):
        decode_j2k(cut)


def test_smooth_image_compresses():
    """EBCOT on a smooth gradient must beat raw by a wide margin —
    a degenerate coder (e.g. mis-ordered passes) still round-trips
    but loses compression; this pins the behavior matters."""
    ys, xs = np.mgrid[0:128, 0:128]
    smooth = ((ys + xs) // 2).astype(np.uint8)
    code = encode_j2k(smooth, levels=4)
    assert len(code) * 20 < smooth.size, len(code)
    assert (decode_j2k(code) == smooth).all()


def test_typed_boundaries():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_j2k(img)
    with pytest.raises(Jpeg2000Error, match="SOC"):
        decode_j2k(b"\x00\x01")
    # 9/7 wavelet flagged in COD
    bad = bytearray(good)
    cod = good.index(b"\xff\x52")
    bad[cod + 13] = 0                       # transformation byte
    with pytest.raises(NotImplementedError, match="9/7"):
        decode_j2k(bytes(bad))
    # a LYING layer count (header says 2, body carries 1 layer of
    # packets) stays typed — multi-layer itself landed r13
    bad = bytearray(good)
    bad[cod + 7] = 2                        # layers lo byte
    with pytest.raises((Jpeg2000Error, NotImplementedError)):
        decode_j2k(bytes(bad))
    # scalar quantization
    bad = bytearray(good)
    qcd = good.index(b"\xff\x5c")
    bad[qcd + 4] |= 0x02
    with pytest.raises(NotImplementedError, match="quantization"):
        decode_j2k(bytes(bad))
    with pytest.raises(Jpeg2000Error, match="jp2c|container"):
        decode_jpx(b"\x00\x00\x00\x0cjP  \r\n\x87\n")
    with pytest.raises(Jpeg2000Error):
        encode_j2k(np.zeros((1, 1, 2), dtype=np.uint8))


def test_truncation_and_corruption_fuzz_stays_typed():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    s = encode_j2k(img, levels=2)
    for cut in range(0, len(s), 7):
        try:
            decode_j2k(s[:cut])
        except (Jpeg2000Error, NotImplementedError):
            pass
    for _ in range(25):
        mut = bytearray(s)
        for _ in range(int(rng.integers(1, 5))):
            mut[int(rng.integers(0, len(mut)))] = int(
                rng.integers(0, 256))
        try:
            decode_j2k(bytes(mut))
        except (Jpeg2000Error, NotImplementedError):
            pass


def test_golden_freeze():
    """Frozen bytes: silent drift in the DWT, Tier-1 contexts, tag
    trees, or framing fails here; re-freezing is a deliberate act."""
    ys, xs = np.mgrid[0:24, 0:40]
    img = ((ys * 17 + xs * 29) % 251).astype(np.uint8)
    code = encode_j2k(img, levels=2)
    assert (decode_j2k(code) == img).all()
    assert hashlib.sha256(code).hexdigest() == ("c1a49f5d87d47eb40ae1e1e003eefb7c46acb4cdd86f3bd046619c0610eedf8f")
    rgb = np.stack([img, img[::-1], np.roll(img, 7, axis=1)], axis=2)
    code3 = encode_j2k(rgb, levels=1, rct=True)
    assert (decode_j2k(code3) == rgb).all()
    assert hashlib.sha256(code3).hexdigest() == ("d46b3f8f3b8243ae2b127f7397c5dc0d16c557bdbbbec3d895eb9a3fb27cfc6e")
