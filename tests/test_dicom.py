"""DICOM container (operators/dicom.py): independent-writer round
trips across all five supported transfer syntaxes, the element
grammar (explicit/implicit VR, both endiannesses, long-VR lengths,
nested sequences with undefined lengths), encapsulated fragment
reassembly, typed boundaries, and truncation fuzz.  The JPEG codecs
underneath are pinned in their own suites (jpeglossless: own encoder
+ splice pins; jpeg: libjpeg)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from evm_archive_spark.operators.dicom import (
    UID_DEFLATED_LE,
    UID_EXPLICIT_BE,
    UID_EXPLICIT_LE,
    UID_IMPLICIT_LE,
    UID_JPEG_BASELINE,
    UID_JPEG_LOSSLESS,
    UID_JPEG_LOSSLESS_SV1,
    UID_JPEG_LS,
    UID_JPEG_LS_NEAR,
    DicomError,
    build_dicom,
    dicom_metadata,
    dicom_pixels,
    is_dicom,
)

ALL_TS = (UID_IMPLICIT_LE, UID_EXPLICIT_LE, UID_EXPLICIT_BE,
          UID_DEFLATED_LE, UID_JPEG_LOSSLESS, UID_JPEG_LOSSLESS_SV1,
          UID_JPEG_LS)


def test_all_transfer_syntaxes_roundtrip():
    rng = np.random.default_rng(173)
    for bits in (8, 12, 16):
        img = rng.integers(0, 1 << bits, (12, 10), dtype=np.uint16)
        for ts in ALL_TS:
            d = build_dicom(img, bits_stored=bits,
                            transfer_syntax=ts, predictor=4,
                            modality="MR", patient="DOE^JANE")
            assert is_dicom(d)
            m = dicom_metadata(d)
            assert m["transfer_syntax"] == ts
            assert (m["rows"], m["cols"]) == (12, 10)
            assert m["bits_stored"] == bits
            assert m["modality"] == "MR"
            assert m["patient_name"] == "DOE^JANE"
            assert m["photometric"] == "MONOCHROME2"
            px, got_bits = dicom_pixels(d)
            assert got_bits == bits
            assert np.array_equal(px[:, :, 0], img), (ts, bits)


def test_encapsulated_fragments_and_predictors():
    """Multi-fragment encapsulated streams concatenate; every lossless
    predictor survives the container."""
    rng = np.random.default_rng(179)
    img = rng.integers(0, 1 << 14, (9, 11), dtype=np.uint16)
    for pred in range(1, 8):
        d = build_dicom(img, bits_stored=14,
                        transfer_syntax=UID_JPEG_LOSSLESS,
                        predictor=pred, fragment_at=48)
        px, _ = dicom_pixels(d)
        assert np.array_equal(px[:, :, 0], img), pred
    # SV1 forces predictor 1 regardless
    d = build_dicom(img, bits_stored=14,
                    transfer_syntax=UID_JPEG_LOSSLESS_SV1,
                    predictor=6)
    px, _ = dicom_pixels(d)
    assert np.array_equal(px[:, :, 0], img)


def test_baseline_encapsulated():
    """A baseline (..4.50) stream decodes through jpeg.py; the writer
    side comes from the jpeg test encoder (flat blocks decode near-
    exactly; the container must carry them bit-for-bit)."""
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg import encode_jpeg

    from evm_archive_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(181)
    blocks = rng.integers(0, 28, (2, 2), dtype=np.uint8) * 8 + 20
    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    stream = encode_jpeg(np.repeat(img[:, :, None], 3, 2),
                         grayscale=True)
    want = decode_jpeg(stream)[:, :, 0]
    # build the container manually: lossless writer + swap the frame
    d = bytearray(build_dicom(img.astype(np.uint16), bits_stored=8,
                              transfer_syntax=UID_JPEG_LOSSLESS))
    # patch the meta UID (both 22 bytes, even — no pad byte) then
    # rebuild the encapsulated element
    d = bytes(d).replace(UID_JPEG_LOSSLESS.encode(),
                         UID_JPEG_BASELINE.encode())
    i = d.index(struct.pack("<HH", 0x7FE0, 0x0010))
    enc = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
        + struct.pack("<I", 0xFFFFFFFF) \
        + struct.pack("<HHI", 0xFFFE, 0xE000, 0) \
        + struct.pack("<HHI", 0xFFFE, 0xE000,
                      len(stream) + len(stream) % 2) \
        + stream + b"\x00" * (len(stream) % 2) \
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    d = d[:i] + enc
    px, bits = dicom_pixels(d)
    assert bits == 8
    assert np.array_equal(px[:, :, 0], want.astype(np.uint16))


def test_typed_boundaries_and_fuzz():
    img = np.arange(64, dtype=np.uint16).reshape(8, 8)
    good = build_dicom(img, bits_stored=8)
    assert not is_dicom(good[130:])
    with pytest.raises(DicomError, match="not a DICOM"):
        dicom_metadata(b"\x00" * 200)
    # unknown transfer syntax is typed
    bad = good.replace(UID_EXPLICIT_LE.encode() + b"\x00",
                       b"1.2.840.10008.1.2.4.51\x00"[:20])
    with pytest.raises(DicomError):
        dicom_pixels(bad)
    # BitsStored/precision mismatch on lossless is typed
    d = bytearray(build_dicom(img, bits_stored=8,
                              transfer_syntax=UID_JPEG_LOSSLESS))
    i = bytes(d).index(struct.pack("<HH", 0x0028, 0x0101))
    struct.pack_into("<H", d, i + 8, 12)
    with pytest.raises(DicomError, match="precision"):
        dicom_pixels(bytes(d))
    # truncation fuzz: typed, never a crash
    for ts in (UID_EXPLICIT_LE, UID_JPEG_LOSSLESS, UID_DEFLATED_LE):
        g = build_dicom(img, bits_stored=8, transfer_syntax=ts)
        for cut in range(133, len(g), 23):
            try:
                dicom_pixels(g[:cut])
            except DicomError:
                pass


def test_short_raster_and_missing_tags_typed():
    img = np.arange(64, dtype=np.uint16).reshape(8, 8)
    good = bytearray(build_dicom(img, bits_stored=16))
    # shrink the declared raster: claim 16 rows
    i = bytes(good).index(struct.pack("<HH", 0x0028, 0x0010))
    struct.pack_into("<H", good, i + 8, 16)
    with pytest.raises(DicomError, match="short of Rows"):
        dicom_pixels(bytes(good))


def test_rle_transfer_syntax():
    """PS3.5 Annex G: byte planes (MSB first per sample), PackBits
    segments, the 64-byte offset header.  Exact round trips at 8/12/16
    bits, run-heavy and noisy data; typed on short segments and bad
    offsets."""
    from evm_archive_spark.operators.dicom import UID_RLE

    rng = np.random.default_rng(191)
    for bits in (8, 12, 16):
        img = rng.integers(0, 1 << bits, (14, 9), dtype=np.uint16)
        img[3:6, :] = 1234 % (1 << bits)         # long runs
        img[7, :] = 0
        d = build_dicom(img, bits_stored=bits, transfer_syntax=UID_RLE)
        m = dicom_metadata(d)
        assert m["transfer_syntax"] == UID_RLE
        px, ob = dicom_pixels(d)
        assert ob == bits and np.array_equal(px[:, :, 0], img), bits
    # corrupt the segment count -> typed
    d = bytearray(build_dicom(img, bits_stored=16,
                              transfer_syntax=UID_RLE))
    i = bytes(d).index(struct.pack("<HH", 0x7FE0, 0x0010))
    # first fragment after the empty BOT item: 12 (elem hdr) + 8 (BOT)
    struct.pack_into("<I", d, i + 12 + 8 + 8, 9)
    with pytest.raises(DicomError, match="segment count"):
        dicom_pixels(bytes(d))


def test_multiframe_objects():
    """NumberOfFrames: native rasters split by frame size; encapsulated
    streams split by a REAL Basic Offset Table (fragments grouped into
    frames by their item offsets) or the empty-BOT one-fragment-per-
    frame shortcut.  Exact volumes across native/lossless/RLE."""
    from evm_archive_spark.operators.dicom import (
        UID_RLE,
        dicom_frames,
    )

    rng = np.random.default_rng(193)
    vol = rng.integers(0, 4096, (5, 10, 8), dtype=np.uint16)
    for ts in (UID_EXPLICIT_LE, UID_IMPLICIT_LE, UID_DEFLATED_LE):
        d = build_dicom(vol, bits_stored=12, transfer_syntax=ts)
        fr, bits = dicom_frames(d)
        assert bits == 12 and fr.shape == (5, 10, 8, 1)
        assert np.array_equal(fr[:, :, :, 0], vol), ts
    for ts in (UID_JPEG_LOSSLESS, UID_RLE):
        for bot in (True, False):
            d = build_dicom(vol, bits_stored=12, transfer_syntax=ts,
                            bot=bot, predictor=4)
            fr, _bits = dicom_frames(d)
            assert np.array_equal(fr[:, :, :, 0], vol), (ts, bot)
            # dicom_pixels = frame 0
            px, _ = dicom_pixels(d)
            assert np.array_equal(px[:, :, 0], vol[0])
    # frame-count/fragment mismatch under an empty BOT is typed
    d = bytearray(build_dicom(vol, bits_stored=12,
                              transfer_syntax=UID_RLE, bot=False))
    i = bytes(d).index(b"IS")
    # NumberOfFrames "5 " -> "6 "
    assert d[i + 4:i + 6] == b"5\x00"
    d[i + 4] = ord("6")
    with pytest.raises(DicomError, match="one fragment per"):
        dicom_frames(bytes(d))


def test_image_lane_dispatch():
    """DICOM registers in imagecodec: frame 0 display-mapped to RGBA
    (top-8-bit downshift, MONOCHROME1 inversion)."""
    from evm_archive_spark.operators.dicom import UID_RLE, decode_dicom
    from evm_archive_spark.operators.imagecodec import (
        decode_image,
        known_image,
    )

    img = (np.arange(256, dtype=np.uint16).reshape(16, 16) * 16) % 4096
    d = build_dicom(img, bits_stored=12, transfer_syntax=UID_RLE)
    assert known_image(d)
    out = decode_image(d)
    assert np.array_equal(out[:, :, 0], (img >> 4).astype(np.uint8))
    assert (out[:, :, 3] == 255).all()
    # MONOCHROME1 inverts for display
    d1 = d.replace(b"MONOCHROME2", b"MONOCHROME1")
    inv = decode_dicom(d1)
    assert np.array_equal(inv[:, :, 0],
                          255 - (img >> 4).astype(np.uint8))


def test_writer_tag_order_and_meta_version():
    # PS3.5 §7.1: elements in ascending (group,element) order; PS3.10
    # requires (0002,0001) FileMetaInformationVersion (ADVICE r11)
    img = np.arange(16, dtype=np.uint16).reshape(4, 4)
    b = build_dicom(img, bits_stored=12, transfer_syntax=UID_EXPLICIT_LE)

    def pos(group, elem):
        p = b.find(struct.pack("<HH", group, elem))
        assert p >= 0, f"({group:04x},{elem:04x}) missing"
        return p

    # File Meta ascending, version element present
    assert pos(0x0002, 0x0001) < pos(0x0002, 0x0002) < pos(0x0002, 0x0010)
    # data set: the SQ at (0008,1032) precedes (0010,0010)
    assert pos(0x0008, 0x0060) < pos(0x0008, 0x1032) < pos(0x0010, 0x0010)
    meta, _ = dicom_metadata(b), dicom_pixels(b)
    assert meta["rows"] == 4


def test_deflated_over_cap_typed(monkeypatch):
    # a deflated data set larger than the cap must raise, not walk a
    # silently truncated body (ADVICE r11)
    import evm_archive_spark.operators.dicom as dcm

    img = np.zeros((64, 64), dtype=np.uint8)
    b = build_dicom(img, bits_stored=8, transfer_syntax=UID_DEFLATED_LE)
    monkeypatch.setattr(dcm, "MAX_DICOM_VALUE", 256)
    with pytest.raises(DicomError, match="exceeds"):
        dicom_metadata(b)


def test_jpegls_transfer_syntax():
    """JPEG-LS lossless (..4.80, r12): fragmented frames decode via
    jpegls.py; near-lossless (..4.81) parses its metadata but pixel
    decode is a typed NotImplementedError boundary."""
    rng = np.random.default_rng(480)
    img = rng.integers(0, 1 << 12, (9, 11), dtype=np.uint16)
    d = build_dicom(img, bits_stored=12, transfer_syntax=UID_JPEG_LS,
                    fragment_at=40)
    m = dicom_metadata(d)
    assert m["transfer_syntax"] == UID_JPEG_LS
    px, bits = dicom_pixels(d)
    assert bits == 12
    assert np.array_equal(px[:, :, 0], img)
    # the embedded stream really is JPEG-LS (SOF55)
    assert b"\xff\xf7" in d
    # near-lossless syntax (r12): decodes with the NEAR error bound
    near = build_dicom(img, bits_stored=12,
                       transfer_syntax=UID_JPEG_LS_NEAR, near=3)
    assert dicom_metadata(near)["transfer_syntax"] == UID_JPEG_LS_NEAR
    pn, bn = dicom_pixels(near)
    assert bn == 12
    err = np.abs(pn[:, :, 0].astype(np.int64) - img.astype(np.int64))
    assert 0 < err.max() <= 3


def test_rescale_and_monochrome1():
    """RescaleSlope/Intercept surface through dicom_rescaled (r12);
    MONOCHROME1 inverts only the DISPLAY face, never the rescaled
    physical values."""
    from evm_archive_spark.operators.dicom import (
        decode_dicom,
        dicom_rescaled,
    )

    rng = np.random.default_rng(1052)
    img = rng.integers(0, 1 << 12, (6, 7), dtype=np.uint16)
    d = build_dicom(img, bits_stored=12, rescale=(2.0, -1024.0),
                    photometric="MONOCHROME1")
    vals = dicom_rescaled(d)
    assert vals.dtype == np.float64
    assert np.array_equal(vals[0, :, :, 0],
                          img.astype(np.float64) * 2.0 - 1024.0)
    # display face inverts MONOCHROME1
    disp = decode_dicom(d)
    want = 255 - np.clip(img >> 4, 0, 255).astype(np.uint8)
    assert np.array_equal(disp[:, :, 0], want)
    # defaults: no rescale elements -> identity transform
    d2 = build_dicom(img, bits_stored=12)
    assert np.array_equal(dicom_rescaled(d2)[0, :, :, 0],
                          img.astype(np.float64))


def test_jpeg2000_lossless_transfer_syntax():
    """..4.90 (JPEG 2000 Lossless Only, r13): encapsulated frames are
    Part-1 codestreams through jpeg2000.py; 12/14/16-bit and
    multi-frame round-trip exactly."""
    import numpy as np

    from evm_archive_spark.operators import dicom as D

    ys, xs = np.mgrid[0:16, 0:16]
    for bits in (12, 14, 16):
        img = ((7 * 131 + ys * 17 + xs * 29) % (1 << bits)).astype(
            np.uint16)
        b = D.build_dicom(img, bits_stored=bits,
                          transfer_syntax=D.UID_J2K_LOSSLESS)
        assert D.dicom_metadata(b)["transfer_syntax"] == D.UID_J2K_LOSSLESS
        px, stored = D.dicom_pixels(b)
        assert stored == bits and (px[:, :, 0] == img).all()
    imgs = np.stack([img, img // 2, img // 3])
    b = D.build_dicom(imgs, bits_stored=16,
                      transfer_syntax=D.UID_J2K_LOSSLESS)
    fr, _ = D.dicom_frames(b)
    assert fr.shape == (3, 16, 16, 1) and (fr[:, :, :, 0] == imgs).all()


def test_jpeg2000_lossy_transfer_syntax():
    """..4.91 (JPEG 2000, r13): irreversible 9/7 frames decode; the
    near-lossless writer form stays within a tight error bound."""
    import numpy as np

    from evm_archive_spark.operators import dicom as D

    ys, xs = np.mgrid[0:16, 0:16]
    img = ((200 + ys * 40 + xs * 23) % 4096).astype(np.uint16)
    b = D.build_dicom(img, bits_stored=12, transfer_syntax=D.UID_J2K)
    assert D.dicom_metadata(b)["transfer_syntax"] == D.UID_J2K
    px, stored = D.dicom_pixels(b)
    assert stored == 12 and px.shape == (16, 16, 1)
    err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()     # shift-0 9/7 is near-lossless
