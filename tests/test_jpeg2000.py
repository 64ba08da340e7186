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
    # 9/7 landed r13: flipping the COD transformation byte on a
    # reversible-QCD stream is now a TYPED inconsistency
    bad = bytearray(good)
    cod = good.index(b"\xff\x52")
    bad[cod + 13] = 0                       # transformation byte
    with pytest.raises(Jpeg2000Error, match="without quantization"):
        decode_j2k(bytes(bad))
    # a LYING layer count (header says 2, body carries 1 layer of
    # packets) stays typed — multi-layer itself landed r13
    bad = bytearray(good)
    bad[cod + 7] = 2                        # layers lo byte
    with pytest.raises((Jpeg2000Error, NotImplementedError)):
        decode_j2k(bytes(bad))
    # scalar quantization landed r13: a style byte lying about the
    # entry width is now a TYPED length error
    bad = bytearray(good)
    qcd = good.index(b"\xff\x5c")
    bad[qcd + 4] |= 0x02
    with pytest.raises(Jpeg2000Error, match="QCD short"):
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


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


def test_lossy_97_rate_distortion_behaves():
    """r13 third wave: the irreversible 9/7 + scalar-quantization
    DECODE path.  A real codec's signature is the rate-distortion
    slope: finer steps -> more bytes -> higher PSNR, near-lossless at
    shift 0; coarser steps degrade gracefully.  (Pin strategy: no
    system J2K exists in-env, so the pin is this behavioral envelope +
    the exact integer entropy layer shared with the lossless path.)"""
    from evm_archive_spark.operators.jpeg2000 import encode_j2k_lossy

    rng = np.random.default_rng(6)
    ys, xs = np.mgrid[0:64, 0:80]
    img = (128 + 60 * np.sin(ys / 9.0) + 50 * np.cos(xs / 11.0)
           + rng.normal(0, 6, (64, 80))).clip(0, 255).astype(np.uint8)
    stats = []
    for qs in (0, 2, 4):
        code = encode_j2k_lossy(img, levels=3, quality_shift=qs)
        out = decode_j2k(code)
        assert out.shape == img.shape
        stats.append((len(code), _psnr(out, img)))
    (b0, p0), (b2, p2), (b4, p4) = stats
    assert p0 > 45 and b0 > b2 > b4 and p0 > p2 > p4, stats
    # 9/7 DWT round trip is float-exact on its own
    from evm_archive_spark.operators.jpeg2000 import (
        dwt97_forward, dwt97_inverse)

    f = rng.integers(0, 256, (45, 61)).astype(np.float64)
    bands, ll = dwt97_forward(f, 3)
    assert np.abs(dwt97_inverse(bands, ll) - f).max() < 1e-9


def test_lossy_truncated_passes_decode_gracefully():
    """Rate-control truncation (dropped trailing coding passes) is the
    normal shape of real lossy streams; PSNR degrades monotonically
    and decode never errors."""
    from evm_archive_spark.operators.jpeg2000 import encode_j2k_lossy

    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:48, 0:56]
    img = (120 + 70 * np.sin(ys / 7.0) + 40 * np.cos(xs / 9.0)
           + rng.normal(0, 5, (48, 56))).clip(0, 255).astype(np.uint8)
    prev = None
    for dp in (0, 2, 4, 6):
        code = encode_j2k_lossy(img, levels=2, quality_shift=1,
                                drop_passes=dp, layers=2)
        p = _psnr(decode_j2k(code), img)
        assert prev is None or p <= prev + 0.5, (dp, p, prev)
        prev = p


def test_qcd_styles_parse():
    """Style-1 (derived) QCD parses and decodes; bad style is typed."""
    from evm_archive_spark.operators.jpeg2000 import encode_j2k_lossy

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    code = encode_j2k_lossy(img, levels=1, quality_shift=1)
    qcd = code.index(b"\xff\x5c")
    ln = int.from_bytes(code[qcd + 2:qcd + 4], "big")
    # rewrite the expounded QCD (style 2, 4 subband entries) as a
    # derived one (style 1, single entry) — parses + decodes to the
    # declared shape (step sizes differ, fidelity is not the point)
    e0 = code[qcd + 5] >> 3 | (code[qcd + 5] >> 3)
    first = code[qcd + 5:qcd + 7]
    new_qcd = b"\xff\x5c" + (5).to_bytes(2, "big") + bytes(
        [(code[qcd + 4] & 0xE0) | 1]) + first
    patched = code[:qcd] + new_qcd + code[qcd + 2 + ln:]
    out = decode_j2k(patched)
    assert out.shape == (16, 16)
    # reserved style 3 is typed
    bad = bytearray(code)
    bad[qcd + 4] = (bad[qcd + 4] & 0xE0) | 3
    with pytest.raises(Jpeg2000Error, match="quantization style"):
        decode_j2k(bytes(bad))


def test_review_r13_multi_codeblock_zbp_tagtree():
    """Review r13: zero-bitplane tag-tree leaves must ALL be seeded
    before any packet is emitted — lazy per-block set_value let an
    earlier block commit a wrong internal-node minimum, silently
    corrupting multi-codeblock images whose codeblocks have different
    magnitudes (every prior fixture fit one codeblock)."""
    rng = np.random.default_rng(1)
    img = np.full((144, 144), 128, dtype=np.uint8)
    img[72:, 72:] = rng.integers(0, 256, (72, 72), dtype=np.uint8)
    assert (decode_j2k(encode_j2k(img, levels=2)) == img).all()
    # the minimal two-codeblock case: flat-left, bright-right
    img2 = np.zeros((8, 16), dtype=np.uint8)
    img2[:, :8] = 129
    img2[:, 8:] = 255
    assert (decode_j2k(encode_j2k(img2, levels=0,
                                  cb_exp=(3, 3))) == img2).all()
    # structured (non-uniform) sweep across grids and layers
    for t in range(2):
        h, w = int(rng.integers(40, 120)), int(rng.integers(40, 120))
        im = np.zeros((h, w), dtype=np.uint8)
        im[h // 3:, w // 3:] = rng.integers(
            0, 256, (h - h // 3, w - w // 3), dtype=np.uint8)
        for layers in (1, 3):
            assert (decode_j2k(encode_j2k(
                im, levels=2, layers=layers, cb_exp=(4, 4))) == im
            ).all(), (t, layers)


def test_review_r13_short_siz_is_typed():
    """Review r13: a SIZ whose length covers the fixed header but not
    the component records must raise Jpeg2000Error, not struct.error
    (the codecerrors guard now backs the public decode faces too)."""
    import struct

    siz = struct.pack(">HIIIIIIIIH", 0, 4, 4, 0, 0, 4, 4, 0, 0, 1)
    bad = b"\xff\x4f\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    with pytest.raises(Jpeg2000Error, match="SIZ short"):
        decode_j2k(bad)
