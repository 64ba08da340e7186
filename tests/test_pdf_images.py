"""PDF image-XObject extraction (pdf.pdf_images): DCT/CCITT/Flate
decode paths through the repo's own codecs, PNG-predictor DecodeParms,
typed boundaries, and the independent builder."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from evm_archive_spark.operators.pdf import (
    PdfError,
    build_pdf_with_images,
    extract_pdf_text,
    pdf_images,
)


def test_all_image_kinds_roundtrip():
    import sys

    sys.path.insert(0, "tests")
    from test_jpeg import encode_jpeg

    from evm_archive_spark.operators.jpeg import decode_jpeg

    rng = np.random.default_rng(211)
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, (7, 8, 3), dtype=np.uint8)
    bits = (rng.random((16, 24)) < 0.3).astype(np.uint8)
    img = np.kron(rng.integers(0, 16, (2, 2, 3), np.uint8) * 16,
                  np.ones((8, 8, 1), np.uint8))
    jp = encode_jpeg(img)
    pdf = build_pdf_with_images([
        ("flate_gray", gray), ("flate_rgb", rgb),
        ("ccitt_g4", bits), ("ccitt_mh", bits), ("ccitt_g3", bits),
        ("jpeg", ((16, 16), jp)),
    ])
    ims = pdf_images(pdf)
    assert [i["filter"] for i in ims] == [
        "/FlateDecode", "/FlateDecode", "/CCITTFaxDecode",
        "/CCITTFaxDecode", "/CCITTFaxDecode", "/DCTDecode"]
    assert np.array_equal(ims[0]["rgba"][:, :, 0], gray)
    assert np.array_equal(ims[1]["rgba"][:, :, :3], rgb)
    want = ((1 - bits) * 255).astype(np.uint8)   # CCITT 1 = black
    for k in (2, 3, 4):
        assert np.array_equal(ims[k]["rgba"][:, :, 0], want), k
    assert np.array_equal(ims[5]["rgba"], decode_jpeg(jp)[:16, :16])
    # the page itself still parses as a (textless) document
    text, n_pages = extract_pdf_text(pdf)
    assert n_pages == 1


def test_png_predictor_decodeparms():
    """Predictor 12 (PNG Up) rows undo exactly; mixed filter types
    (None/Sub/Up/Average/Paeth) per row all land."""
    rng = np.random.default_rng(223)
    gray = rng.integers(0, 256, (6, 11), dtype=np.uint8)
    rows = []
    prev = np.zeros(11, dtype=np.int32)
    for y, ft in enumerate([0, 1, 2, 3, 4, 2]):
        cur = gray[y].astype(np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - np.concatenate([[0], cur[:-1]])) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            a = np.concatenate([[0], cur[:-1]])
            enc = (cur - ((a + prev) >> 1)) % 256
        else:
            a = np.concatenate([[0], cur[:-1]])
            c = np.concatenate([[0], prev[:-1]])
            p = np.zeros(11, dtype=np.int32)
            for x in range(11):
                pa = abs(prev[x] - c[x])
                pb = abs(a[x] - c[x])
                pc = abs(a[x] + prev[x] - 2 * c[x])
                p[x] = a[x] if pa <= pb and pa <= pc else (
                    prev[x] if pb <= pc else c[x])
            enc = (cur - p) % 256
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = cur
    payload = zlib.compress(b"".join(rows))
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Width 11 /Height 6 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
        b"/Columns 11 /Colors 1 >> /Length "
        + str(len(payload)).encode() + b" >>\nstream\n" + payload
        + b"\nendstream\nendobj\n%%EOF\n")
    (im,) = pdf_images(pdf)
    assert np.array_equal(im["rgba"][:, :, 0], gray)


def test_typed_boundaries():
    rng = np.random.default_rng(227)
    gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    good = build_pdf_with_images([("flate_gray", gray)])
    # JBIG2 and JPX both landed r13: garbage payloads are TYPED
    # PdfErrors now; an unknown filter stays NotImplementedError
    bad = good.replace(b"/Filter /FlateDecode", b"/Filter /JPXDecodee")
    bad = bad.replace(b"/JPXDecodee", b"/JPXDecode ")
    with pytest.raises(PdfError, match="codestream|container"):
        pdf_images(bad)
    bad = good.replace(b"/Filter /FlateDecode", b"/Filter /JBIG2Decode")
    with pytest.raises(PdfError, match="truncated segment"):
        pdf_images(bad)
    bad = good.replace(b"/Filter /FlateDecode", b"/Filter /CrzyDecode")
    with pytest.raises(NotImplementedError, match="out of scope"):
        pdf_images(bad)
    # short raster is typed
    bad = good.replace(b"/Height 4", b"/Height 9")
    with pytest.raises(PdfError, match="raster short"):
        pdf_images(bad)
    # a textual PDF yields zero images, not an error
    from evm_archive_spark.operators.pdf import build_simple_pdf

    assert pdf_images(build_simple_pdf(["hello"])) == []


def test_rows_smaller_than_height_typed():
    # a crafted /Rows below /Height must raise PdfError, not a numpy
    # broadcast ValueError (ADVICE r11)
    rng = np.random.default_rng(318)
    bits = (rng.random((8, 16)) < 0.5).astype(np.uint8)
    cc = build_pdf_with_images([("ccitt_g4", bits)])
    assert b"/Rows 8" in cc
    bad = cc.replace(b"/Rows 8", b"/Rows 4")
    with pytest.raises(PdfError):
        pdf_images(bad)


def test_encoded_byte_align_roundtrips():
    """/EncodedByteAlign across all three K regimes (r12): aligned
    G4/G3 variants, the aligned-MH default, and the strict K=0
    continuous bit stream."""
    rng = np.random.default_rng(414)
    # odd width so rows do NOT naturally end on byte boundaries
    bits = (rng.random((11, 29)) < 0.4).astype(np.uint8)
    want = ((1 - bits) * 255).astype(np.uint8)
    pdf = build_pdf_with_images([
        ("ccitt_g4_ba", bits), ("ccitt_g3_ba", bits),
        ("ccitt_mh", bits), ("ccitt_mh_cont", bits),
    ])
    # the declared parms match the encodings
    assert pdf.count(b"/EncodedByteAlign true") == 3
    ims = pdf_images(pdf)
    assert len(ims) == 4
    for i, im in enumerate(ims):
        assert im["filter"] == "/CCITTFaxDecode"
        assert np.array_equal(im["rgba"][:, :, 0], want), i
    # byte-aligned payloads are strictly longer than continuous ones
    from evm_archive_spark.operators.ccittfax import encode_g4

    assert len(encode_g4(bits, byte_align=True)) > len(encode_g4(bits))


def test_jbig2_image_xobjects_roundtrip():
    """/JBIG2Decode image XObjects (r13, jbig2.py): all four fixture
    framings — arith template 0, TPGDON, template 2, MMR — decode
    through pdf_images to the exact bitmap (1 = black = 0 gray)."""
    rng = np.random.default_rng(515)
    bits = (rng.random((13, 31)) < 0.35).astype(np.uint8)
    want = ((1 - bits) * 255).astype(np.uint8)
    pdf = build_pdf_with_images([
        ("jbig2", bits), ("jbig2_tpgdon", bits),
        ("jbig2_t2", bits), ("jbig2_mmr", bits),
    ])
    ims = pdf_images(pdf)
    assert len(ims) == 4
    for i, im in enumerate(ims):
        assert im["filter"] == "/JBIG2Decode"
        assert im["bits"] == 1
        assert np.array_equal(im["rgba"][:, :, 0], want), i
    # a crafted halftone-region stream stays a NAMED typed gap
    # (symbol dictionaries + text regions landed r13)
    import struct
    sym = struct.pack(">IB", 9, 22) + bytes([0, 1]) + struct.pack(">I", 0)
    head = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Subtype /Image /Width 4 /Height 4 "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /JBIG2Decode /Length %d >>\nstream\n" % len(sym))
    doc = head + sym + b"\nendstream\nendobj\n%%EOF"
    with pytest.raises(NotImplementedError, match="halftone"):
        pdf_images(doc)
    # a corrupt JBIG2 stream stays inside the PdfError contract
    bad = struct.pack(">IB", 9, 63) + bytes([0, 1]) + struct.pack(">I", 0)
    doc2 = head.replace(b"/Length %d" % len(sym),
                        b"/Length %d" % len(bad)) \
        if len(bad) != len(sym) else head + bad + \
        b"\nendstream\nendobj\n%%EOF"
    doc2 = head + bad + b"\nendstream\nendobj\n%%EOF"
    with pytest.raises(PdfError, match="unknown segment"):
        pdf_images(doc2)


def test_jbig2_globals_stream_is_honored():
    """/JBIG2Globals: the page-info segment moved into the globals
    stream (Flate-compressed) still initializes the page."""
    import zlib as _z

    from evm_archive_spark.operators.jbig2 import encode_embedded

    rng = np.random.default_rng(616)
    bits = (rng.random((9, 17)) < 0.5).astype(np.uint8)
    full = encode_embedded(bits)
    glob_raw, rest = full[:30], full[30:]   # 11-byte hdr + 19-byte page
    gcomp = _z.compress(glob_raw)
    doc = b"%PDF-1.4\n" + (
        b"2 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n"
        % len(gcomp)) + gcomp + b"\nendstream\nendobj\n"
    doc += (b"1 0 obj\n<< /Subtype /Image /Width 17 /Height 9 "
            b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
            b"/Filter /JBIG2Decode "
            b"/DecodeParms << /JBIG2Globals 2 0 R >> /Length %d >>\n"
            b"stream\n" % len(rest)) + rest + b"\nendstream\nendobj\n%%EOF"
    ims = pdf_images(doc)
    want = ((1 - bits) * 255).astype(np.uint8)
    assert len(ims) == 1
    assert np.array_equal(ims[0]["rgba"][:, :, 0], want)


def test_jpx_image_xobjects_roundtrip():
    """/JPXDecode image XObjects (r13, jpeg2000.py): raw codestream
    and JP2-container framings, gray and RGB, decode exactly."""
    rng = np.random.default_rng(717)
    gray = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    pdf = build_pdf_with_images([("jpx", gray), ("jp2", rgb)])
    ims = pdf_images(pdf)
    assert [i["filter"] for i in ims] == ["/JPXDecode", "/JPXDecode"]
    assert np.array_equal(ims[0]["rgba"][:, :, 0], gray)
    assert np.array_equal(ims[1]["rgba"][:, :, :3], rgb)
    # a corrupt JPX payload stays inside the PdfError contract
    bad = pdf.replace(b"jp2c", b"XXXX")
    with pytest.raises(PdfError, match="jp2c|codestream"):
        pdf_images(bad)
