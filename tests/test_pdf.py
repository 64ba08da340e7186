"""PDF text-extraction tests.

The independent fixture builder here writes PDFs with a DIFFERENT
structure than pdf.build_simple_pdf (indirect /Length, TJ arrays, hex
strings, escape-table coverage, array /Contents, out-of-order object
numbers) so the parser and the module's synthesis utility share no
blind spots.
"""

from __future__ import annotations

import hashlib
import zlib

import pytest

from evm_archive_spark.operators import pdf


def _assemble(objects: dict[int, bytes]) -> bytes:
    """Hand-rolled assembler: objects keyed by number, emitted in the
    given (possibly non-sequential) order, valid xref."""
    out = bytearray(b"%PDF-1.4\n% independent fixture\n")
    offsets = {}
    for num, body in objects.items():
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    mx = max(objects) + 1
    out += f"xref\n0 {mx}\n".encode()
    out += b"0000000000 65535 f \n"
    for n in range(1, mx):
        out += (
            f"{offsets.get(n, 0):010d} 00000 n \n".encode()
            if n in offsets
            else b"0000000000 65535 f \n"
        )
    out += (
        f"trailer\n<< /Size {mx} /Root 1 0 R >>\nstartxref\n{xref_off}"
        "\n%%EOF\n"
    ).encode()
    return bytes(out)


def _fixture_pdf() -> bytes:
    """Two pages; page 1 uses TJ with kerning + hex string + escapes +
    indirect /Length and array /Contents split across two streams;
    page 2 compressed with Flate and T* line breaks."""
    s1a = b"BT /F1 10 Tf 50 700 Td [(Hel) -120 (lo,)] TJ ( ) Tj ET"
    s1b = (
        b"BT /F1 10 Tf 50 680 Td <776f726c64> Tj "
        b"(!\\051\\\\ done\\n) Tj ET"
    )  # 'world' hex, escaped ')' octal, backslash, \n escape
    body2 = (
        b"BT /F1 10 Tf 50 700 Td (line one) Tj T* (line two) Tj ET"
    )
    z2 = zlib.compress(body2)
    objs = {
        7: b"<< /Length 8 0 R >>\nstream\n" + s1a + b"\nendstream",
        8: str(len(s1a)).encode(),
        9: f"<< /Length {len(s1b)} >>".encode()
        + b"\nstream\n" + s1b + b"\nendstream",
        10: f"<< /Length {len(z2)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + z2 + b"\nendstream",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents [7 0 R 9 0 R] "
        b"/Resources << /Font << /F1 3 0 R >> >> >>",
        5: b"<< /Type /Page /Parent 2 0 R /Contents 10 0 R "
        b"/Resources << /Font << /F1 3 0 R >> >> >>",
        2: b"<< /Type /Pages /Count 2 /Kids [4 0 R 5 0 R] >>",
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
    }
    return _assemble(objs)


def test_fixture_pdf_extracts():
    text, n_pages = pdf.extract_pdf_text(_fixture_pdf())
    assert n_pages == 2
    p1, p2 = text.split("\f")
    # TJ pieces concatenate (kern numbers ignored), hex decodes,
    # escapes resolve; the Td vertical move between streams breaks line
    assert "Hello, " in p1
    assert "world!)\\ done\n" in p1
    assert p2 == "line one\nline two\n"


def test_build_round_trip_plain_and_flate():
    pages = ["alpha beta (gamma)\\delta", "second page text"]
    for compress in (False, True):
        b = pdf.build_simple_pdf(pages, compress=compress)
        assert pdf.is_pdf(b)
        text, n = pdf.extract_pdf_text(b)
        assert n == 2
        got = text.split("\f")
        assert got[0] == "alpha beta (gamma)\\delta\n"
        assert got[1] == "second page text\n"


def test_multiline_and_empty():
    b = pdf.build_simple_pdf(["l1\nl2\nl3"])
    text, n = pdf.extract_pdf_text(b)
    assert n == 1 and text == "l1\nl2\nl3\n"
    assert pdf.extract_pdf_text(pdf.build_simple_pdf([])) == ("", 0)


def test_errors_and_gaps():
    with pytest.raises(pdf.PdfError, match="not a PDF"):
        pdf.extract_pdf_text(b"plain text")
    with pytest.raises(pdf.PdfError, match="encrypted"):
        pdf.extract_pdf_text(b"%PDF-1.4\n<< /Encrypt 5 0 R >>")
    # unsupported filter names the gap
    raw = b"BT (x) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: f"<< /Length {len(raw)} /Filter /DCTDecode >>".encode()
        + b"\nstream\n" + raw + b"\nendstream",
    }
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        pdf.extract_pdf_text(_assemble(objs))
    # truncation fuzz: typed errors only (guard normalization)
    full = _fixture_pdf()
    for cut in range(8, len(full), 97):
        try:
            pdf.extract_pdf_text(full[:cut])
        except (pdf.PdfError, NotImplementedError):
            pass  # the only acceptable failures


def test_pdf_to_text_spark(spark):
    import pandas as pd

    good = pdf.build_simple_pdf(["doc body one"], compress=True)
    rows = {
        r["media_id"]: r
        for r in pdf.pdf_to_text(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "media_id": [0, 1],
                        "payload": [good, b"not a pdf"],
                    }
                )
            ),
            strict=False,
        ).collect()
    }
    assert rows[0]["text"] == "doc body one\n" and rows[0]["n_pages"] == 1
    h = hashlib.sha256(b"not a pdf").digest()
    assert rows[1]["text"] == "pdf:" + h[:8].hex()
    assert rows[1]["n_pages"] == 1 + h[8] % 9

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [9], "payload": [b"nope"]})
    )
    with pytest.raises(Exception, match="NotImplementedError|strict pdf"):
        pdf.pdf_to_text(bad, strict=True).collect()


def test_classic_stream_filters():
    """LZW (both EarlyChange variants), ASCIIHex, ASCII85 and
    RunLength filters plus filter CHAINS (r12), spec vectors
    included."""
    import base64
    import zlib as _z

    from evm_archive_spark.operators.pdf import (
        _ascii85_decode,
        _ascii_hex_decode,
        _decode_stream,
        _run_length_decode,
    )

    # spec vectors
    assert _ascii_hex_decode(b"48 65 6C6C 6F>") == b"Hello"
    assert _ascii_hex_decode(b"7>") == b"p"           # odd pad -> 0x70
    # ASCII85: stdlib a85encode is the canonical cross-pin
    for payload in (b"", b"M", b"Man ", b"Man is d",
                    b"\x00\x00\x00\x00junk", bytes(range(256))):
        enc = base64.a85encode(payload) + b"~>"
        assert _ascii85_decode(enc) == payload, payload
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _run_length_decode(b"\x02abc\x81x\x80tail") == \
        b"abc" + b"x" * 128
    # filters through _decode_stream, incl. a Flate+Hex CHAIN and both
    # LZW EarlyChange variants (fixtures via the TIFF-flavor encoder,
    # which writes the early convention)
    raw = b"the quick brown pdf stream " * 20
    flate = _z.compress(raw)
    out = _decode_stream({}, {"/Filter": ["/ASCIIHexDecode",
                                          "/FlateDecode"]},
                         flate.hex().encode() + b">")
    assert out == raw
    import sys
    sys.path.insert(0, "tests")
    from test_tiff import _lzw_encode_tiff

    lzw = _lzw_encode_tiff(raw)
    assert _decode_stream({}, {"/Filter": "/LZWDecode"}, lzw) == raw
    assert _decode_stream(
        {}, {"/Filter": "/LZWDecode",
             "/DecodeParms": {"/EarlyChange": 1}}, lzw) == raw
    # unknown filters stay typed
    with pytest.raises(NotImplementedError, match="JBIG2"):
        _decode_stream({}, {"/Filter": "/JBIG2Decode"}, b"")


def test_object_streams():
    """PDF 1.5 /ObjStm (r12): catalog + page tree compressed inside an
    object stream are still reachable; direct definitions win over
    ObjStm members."""
    import zlib as _z

    from evm_archive_spark.operators.pdf import extract_pdf_text

    # objects 1 (catalog), 2 (pages), 3 (page) live INSIDE the ObjStm
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    hdr = b""
    body = b""
    for num, val in inner:
        hdr += b"%d %d " % (num, len(body))
        body += val + b" "
    payload = hdr + body
    comp = _z.compress(payload)
    content = b"BT (compressed object stream page) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    out += (b"4 0 obj\n<< /Type /ObjStm /N 3 /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n" % (len(hdr), len(comp))
            ) + comp + b"\nendstream\nendobj\n"
    out += (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
            ) + content + b"\nendstream\nendobj\n"
    out += b"%%EOF\n"
    text, n_pages = extract_pdf_text(bytes(out))
    assert n_pages == 1
    assert "compressed object stream page" in text
    # a direct definition of object 3 wins over the ObjStm member
    upd = b"BT (direct update) Tj ET"
    override = bytes(out).replace(
        b"%%EOF",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\n"
        b"endobj\n6 0 obj\n<< /Length %d >>\nstream\n" % len(upd)
        + upd + b"\nendstream\nendobj\n%%EOF")
    text2, _ = extract_pdf_text(override)
    assert "direct update" in text2 and "compressed" not in text2


def test_filter_edge_cases_from_review():
    """Review r12 regressions: ASCII85 partial-group overflow is
    typed; a short /DecodeParms array must not drop trailing
    filters; a damaged ObjStm must not cost the direct objects."""
    import zlib as _z

    from evm_archive_spark.operators.pdf import (
        PdfError,
        _ascii85_decode,
        _decode_stream,
        build_simple_pdf,
        extract_pdf_text,
    )

    with pytest.raises(PdfError, match="overflow"):
        _ascii85_decode(b"uu~>")
    raw = b"review regression payload " * 9
    flate = _z.compress(raw)
    rl = bytes([127]) + flate[:128] + bytes(
        [len(flate) - 129]) + flate[128:] if len(flate) > 128 else \
        bytes([len(flate) - 1]) + flate
    out = _decode_stream(
        {}, {"/Filter": ["/RunLengthDecode", "/FlateDecode"],
             "/DecodeParms": [None]}, rl)
    assert out == raw
    # damaged ObjStm: direct objects still extract
    good = build_simple_pdf(["resilient page"])
    bad = good.replace(
        b"%%EOF",
        b"99 0 obj\n<< /Type /ObjStm /N 2 /First 4 /Length 3 >>\n"
        b"stream\nxyz\nendstream\nendobj\n%%EOF")
    text, n = extract_pdf_text(bad)
    assert n == 1 and "resilient page" in text


def test_advice_r12_parms_and_objstm_guards():
    """ADVICE r12 regressions: (a) a /DecodeParms that resolves to a
    non-dict truthy value (an int) must not escape the PdfError
    contract via AttributeError; (b) signed (negative) ObjStm header
    pairs must not index the body from the end."""
    import zlib as _z

    from evm_archive_spark.operators.pdf import (
        _decode_stream,
        extract_pdf_text,
        pdf_images,
    )

    raw = b"advice regression payload"
    import sys
    sys.path.insert(0, "tests")
    from test_tiff import _lzw_encode_tiff

    lzw = _lzw_encode_tiff(raw)
    # int /DecodeParms on the LZW branch: parms.get() would raise
    # AttributeError before the fix; now treated as {} (defaults)
    assert _decode_stream(
        {}, {"/Filter": "/LZWDecode", "/DecodeParms": 7}, lzw) == raw
    # same via an array slot and through pdf_images' parms path
    assert _decode_stream(
        {}, {"/Filter": ["/LZWDecode"], "/DecodeParms": [7]}, lzw) == raw
    px = bytes(range(12))                      # 2x2 RGB8
    comp = _z.compress(px)
    img = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Subtype /Image /Width 2 /Height 2 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceRGB "
        b"/Filter /FlateDecode /DecodeParms 7 /Length %d >>\n"
        b"stream\n" % len(comp)) + comp + b"\nendstream\nendobj\n%%EOF"
    imgs = pdf_images(img)
    assert len(imgs) == 1 and imgs[0]["width"] == 2 \
        and imgs[0]["height"] == 2

    # negative ObjStm offsets: member must be skipped, not parsed
    # from the end of the body; direct objects still extract
    hdr = b"1 -5 2 -1 "
    body = b"<< /A 1 >> << /B 2 >>"
    payload = hdr + body
    comp = _z.compress(payload)
    from evm_archive_spark.operators.pdf import build_simple_pdf
    good = build_simple_pdf(["objstm guard page"])
    bad = good.replace(
        b"%%EOF",
        b"98 0 obj\n<< /Type /ObjStm /N 2 /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n" % (len(hdr), len(comp))
        + comp + b"\nendstream\nendobj\n%%EOF")
    text, n = extract_pdf_text(bad)
    assert n == 1 and "objstm guard page" in text
