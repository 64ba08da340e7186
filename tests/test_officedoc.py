"""DOCX / EPUB extraction: independent-writer fixtures, escaping and
space preservation, OCF spine order, caps, corrupt contracts, and the
document_extract routing."""

from __future__ import annotations

import io
import zipfile

import pytest

from evm_archive_spark.operators.officedoc import (
    OfficeDocError,
    build_docx,
    build_epub,
    build_odt,
    docx_to_text,
    epub_to_text,
    is_docx,
    is_epub,
    is_odt,
    odt_to_text,
)


def _zip_bytes(members: list[tuple[str, str | bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, body in members:
            z.writestr(name, body)
    return buf.getvalue()


def test_docx_independent_fixture_runs_tabs_breaks():
    # hand-written WordprocessingML with split runs, a tab, a break,
    # rsid noise attributes, and an entity — not built by build_docx
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>'
        '<w:p w:rsidR="00AB"><w:r><w:t>Hello, </w:t></w:r>'
        "<w:r><w:t>world</w:t></w:r><w:r><w:tab/></w:r>"
        '<w:r><w:t xml:space="preserve"> spaced &amp; kept </w:t></w:r>'
        "</w:p><w:p><w:r><w:t>line one</w:t><w:br/>"
        "<w:t>line two</w:t></w:r></w:p>"
        "<w:p/></w:body></w:document>"
    )
    b = _zip_bytes([("word/document.xml", doc)])
    assert is_docx(b) and not is_epub(b)
    assert docx_to_text(b) == (
        "Hello, world\t spaced & kept \nline one\nline two\n"
    )


def test_docx_build_roundtrip_preserves_everything():
    paras = ["a < b & c > d", "  leading and trailing  ", "tab\there"]
    assert docx_to_text(build_docx(paras)) == "\n".join(paras)


def test_odt_independent_fixture_spans_headings_spaces():
    # hand-written ODF: heading with attributes, nested span, entity,
    # tab, counted-space element, empty paragraph — not built by
    # build_odt
    xml = (
        '<?xml version="1.0"?><office:document-content>'
        "<office:body><office:text>"
        '<text:h text:outline-level="1">Head</text:h>'
        '<text:p>one <text:span text:style-name="T1">two</text:span>'
        ' &amp; three<text:tab/>four<text:s text:c="3"/>five</text:p>'
        "<text:p/>"
        "</office:text></office:body></office:document-content>"
    )
    b = _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", xml),
        ]
    )
    assert is_odt(b) and not is_docx(b) and not is_epub(b)
    assert odt_to_text(b) == "Head\none two & three\tfour   five\n"


def test_odt_build_roundtrip_preserves_everything():
    paras = [
        "spaced   out\ttab\nbreak & <x> end  ",
        " leading space",
        "",
        "plain",
    ]
    assert odt_to_text(build_odt(paras)) == "\n".join(paras)


def test_rtf_independent_fixture():
    from evm_archive_spark.operators.officedoc import is_rtf, rtf_to_text

    # hand-written RTF: font/color/generator destinations, cp1252 hex
    # escape, \uN with \uc1 fallback, escaped braces, \~ nbsp, \tab
    f = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red0;}"
        b"{\\*\\generator Acme 1.0;}\\uc1 caf\\'e9 \\u8364? euro"
        b"\\par \\{lit\\} a\\~b\\tab end}"
    )
    assert is_rtf(f)
    assert rtf_to_text(f) == "caf\xe9 € euro\n{lit} a\xa0b\tend"


def test_rtf_build_roundtrip_and_uc_skip():
    from evm_archive_spark.operators.officedoc import build_rtf, rtf_to_text

    paras = [
        "Hello {world} \\ backslash",
        "tab\there and\nnewline",
        "unicode: \xe9 \xfc ☃ and ascii",
    ]
    assert rtf_to_text(build_rtf(paras)) == "\n".join(paras)
    # \uc2 skips TWO fallback bytes after \uN
    f = b"{\\rtf1\\ansi\\uc2 \\u8364ab after}"
    assert rtf_to_text(f) == "€ after"
    # truncation fuzz: typed error or success only
    good = build_rtf(paras)
    from evm_archive_spark.operators.officedoc import OfficeDocError

    for cut in range(0, len(good), 5):
        try:
            rtf_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_doc_roundtrip_both_piece_encodings():
    from evm_archive_spark.operators.officedoc import (
        build_doc,
        doc_to_text,
        is_doc,
    )

    t = "Hello legacy Word\nsecond para with unicode \xe9中 <>&\ttab"
    b = build_doc(t)
    assert is_doc(b) and not is_docx(b)
    # the builder appends a cp1252 marker piece, so the round trip
    # exercises BOTH piece encodings through one CLX
    assert doc_to_text(b) == t + "\nEND."
    # carriage returns in input normalize to newlines (Word stores \r)
    assert doc_to_text(build_doc("a\rb")) == "a\nb\nEND."


def test_doc_control_chars_and_errors():
    from evm_archive_spark.operators.officedoc import (
        _doc_clean,
        build_doc,
        doc_to_text,
    )

    assert _doc_clean("a\rb\x07c\x13f\x14g\x15d\x1ee\x1f") == (
        "a\nb\tcfgd-e"
    )
    with pytest.raises(OfficeDocError):
        doc_to_text(b"not a cfb at all")
    # a CFB without a WordDocument stream is typed, not a crash
    from evm_archive_spark.operators.cfb import CfbWriter

    w = CfbWriter()
    w.add("SomethingElse", b"x" * 10)
    with pytest.raises(OfficeDocError, match="WordDocument"):
        doc_to_text(w.tobytes())
    # truncation fuzz
    good = build_doc("alpha beta")
    for cut in range(0, len(good), 97):
        try:
            doc_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_cfb_reader_mini_stream_path():
    """The mini-FAT indirection (streams < 4096 bytes live in the root
    entry's mini stream in 64-byte sectors) — hand-built container,
    since CfbWriter deliberately avoids the mini layout."""
    import struct as st

    from evm_archive_spark.operators.cfb import ENDOFCHAIN, parse_cfb

    ssz = 512
    payload = b"mini stream payload " * 7           # 140 bytes -> 3 mini sectors
    # sector 0: directory; sector 1: miniFAT; sector 2: mini stream data
    dirent = bytearray(128 * 2)

    def put_entry(off, name, etype, start, size, child=0xFFFFFFFF):
        nm = name.encode("utf-16-le")
        dirent[off:off + len(nm)] = nm
        st.pack_into("<H", dirent, off + 64, len(nm) + 2)
        dirent[off + 66] = etype
        st.pack_into("<III", dirent, off + 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        st.pack_into("<I", dirent, off + 116, start)
        st.pack_into("<Q", dirent, off + 120, size)

    put_entry(0, "Root Entry", 5, 2, 192, child=1)  # mini stream @sec2
    put_entry(128, "Tiny", 2, 0, len(payload))      # mini sector 0
    dirblob = bytes(dirent) + b"\x00" * (ssz - len(dirent) % ssz)
    minifat = st.pack("<3I", 1, 2, ENDOFCHAIN)
    minifat += b"\xff" * (ssz - len(minifat))
    ministream = payload + b"\x00" * (192 - len(payload))
    ministream += b"\x00" * (ssz - len(ministream))
    fat = st.pack("<4I", ENDOFCHAIN, ENDOFCHAIN, ENDOFCHAIN, 0xFFFFFFFD)
    fat += b"\xff" * (ssz - len(fat))
    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    st.pack_into("<H", header, 28, 0xFFFE)
    st.pack_into("<H", header, 30, 9)
    st.pack_into("<H", header, 32, 6)
    st.pack_into("<I", header, 44, 1)               # one FAT sector
    st.pack_into("<I", header, 48, 0)               # dir @sec0
    st.pack_into("<I", header, 56, 4096)
    st.pack_into("<I", header, 60, 1)               # miniFAT @sec1
    st.pack_into("<I", header, 64, 1)
    st.pack_into("<I", header, 68, ENDOFCHAIN)
    difat = [0xFFFFFFFF] * 109
    difat[0] = 3                                    # FAT @sec3
    st.pack_into("<109I", header, 76, *difat)
    blob = bytes(header) + dirblob + minifat + ministream + fat
    cf = parse_cfb(blob)
    assert cf.stream("Tiny") == payload


def test_xlsx_roundtrip_and_foreign_fixture():
    from evm_archive_spark.operators.officedoc import (
        build_xlsx,
        is_xlsx,
        xlsx_to_text,
    )

    rows = [
        ["name", "qty & more", "<note>"],
        ["alpha", "42", "x y  z"],
        ["", "last", ""],
    ]
    b = build_xlsx(rows)
    assert is_xlsx(b) and not is_docx(b) and not is_epub(b)
    assert xlsx_to_text(b) == "\n".join("\t".join(r) for r in rows)

    # foreign fixture: shared string in <r> runs, numeric lexical
    # value, inline string, self-closing empty cell
    sst = "<sst><si><r><t>par</t></r><r><t>tial</t></r></si></sst>"
    sheet = (
        "<worksheet><sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1"><v>3.5</v></c>'
        '<c r="C1" t="inlineStr"><is><t>in line</t></is></c>'
        '<c r="D1"/></row>'
        "</sheetData></worksheet>"
    )
    f = _zip_bytes(
        [
            ("xl/workbook.xml", "<workbook/>"),
            ("xl/sharedStrings.xml", sst),
            ("xl/worksheets/sheet1.xml", sheet),
        ]
    )
    assert xlsx_to_text(f) == "par" + "tial\t3.5\tin line\t"
    # truncation fuzz
    for cut in range(0, len(b), 9):
        try:
            xlsx_to_text(b[:cut])
        except OfficeDocError:
            pass


def test_epub_spine_order_not_zip_order():
    # chapters stored in reverse zip order; the OPF spine must win
    opf = (
        '<package><manifest>'
        '<item id="b" href="b.xhtml" media-type="application/xhtml+xml"/>'
        '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
        '</manifest><spine><itemref idref="a"/><itemref idref="b"/>'
        "</spine></package>"
    )
    container = (
        '<container><rootfiles><rootfile full-path="pkg/x.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    b = _zip_bytes(
        [
            ("META-INF/container.xml", container),
            ("pkg/b.xhtml", "<html><body><p>SECOND</p></body></html>"),
            ("pkg/a.xhtml", "<html><body><p>FIRST</p></body></html>"),
            ("pkg/x.opf", opf),
        ]
    )
    assert is_epub(b)
    assert epub_to_text(b) == "FIRST\n\nSECOND"


def test_epub_strips_head_script_entities():
    chapter = (
        "<html><head><title>drop me</title><style>p{}</style></head>"
        "<body><script>var x=1;</script><h1>Title</h1>"
        "<p>one &lt;two&gt; &#65;</p></body></html>"
    )
    container = (
        '<container><rootfiles><rootfile full-path="c.opf"/></rootfiles>'
        "</container>"
    )
    opf = (
        '<package><manifest><item id="c" href="c.xhtml"/></manifest>'
        '<spine><itemref idref="c"/></spine></package>'
    )
    b = _zip_bytes(
        [
            ("META-INF/container.xml", container),
            ("c.opf", opf),
            ("c.xhtml", chapter),
        ]
    )
    assert epub_to_text(b) == "Title\none <two> A"


def test_errors_and_corrupt_contracts():
    with pytest.raises(OfficeDocError):
        docx_to_text(b"not a zip")
    with pytest.raises(OfficeDocError, match="missing zip member"):
        docx_to_text(_zip_bytes([("other.xml", "<x/>")]))
    with pytest.raises(OfficeDocError, match="no rootfile"):
        epub_to_text(
            _zip_bytes([("META-INF/container.xml", "<container/>")])
        )
    with pytest.raises(OfficeDocError, match="empty spine"):
        epub_to_text(
            _zip_bytes(
                [
                    (
                        "META-INF/container.xml",
                        '<container><rootfile full-path="c.opf"/>'
                        "</container>",
                    ),
                    ("c.opf", "<package><spine/></package>"),
                ]
            )
        )
    # truncation fuzz: typed error or success, never a stray exception
    good = build_epub(["alpha", "beta"])
    for cut in range(0, len(good), 7):
        try:
            epub_to_text(good[:cut])
        except OfficeDocError:
            pass
    good = build_docx(["alpha"])
    for cut in range(0, len(good), 7):
        try:
            docx_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_mimetype_member_gates_epub_sniff():
    # a zip with container.xml but a NON-epub mimetype member is not
    # sniffed as epub (e.g. an ODT would carry its own mimetype)
    b = _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("META-INF/container.xml", "<container/>"),
        ]
    )
    assert not is_epub(b)


def _pooled_document_extract_routes_docx_epub(spark):
    """document_extract routes real DOCX/EPUB payloads (sniffed and by
    MIME) alongside the existing formats; corrupt zips fall through to
    the plain-text contract."""
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract

    from evm_archive_spark.operators.officedoc import build_rtf

    docx = build_docx(["first paragraph", "second paragraph"])
    epub = build_epub(["chapter text here"])
    odt = build_odt(["odt body text"])
    rtf = build_rtf(["rtf body text"])
    rows = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3, 4],
            "payload": [
                bytearray(docx),
                bytearray(epub),
                bytearray(b"plain old text"),
                bytearray(odt),
                bytearray(rtf),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {
        r["media_id"]: r for r in document_extract(df).collect()
    }
    assert out[0]["format"] == "docx"
    assert out[0]["text"] == "first paragraph\nsecond paragraph"
    assert out[1]["format"] == "epub"
    assert out[1]["text"] == "chapter text here"
    assert out[2]["format"] == "text"
    assert out[3]["format"] == "odt"
    assert out[3]["text"] == "odt body text"
    assert out[4]["format"] == "rtf"
    assert out[4]["text"] == "rtf body text"

    # MIME wins over sniffing
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(docx)],
                "mime": [
                    "application/vnd.openxmlformats-officedocument."
                    "wordprocessingml.document"
                ],
            }
        )
    )
    got = document_extract(df2, mime_col="mime").collect()[0]
    assert got["format"] == "docx"




def test_pptx_roundtrip_and_slide_order():
    from evm_archive_spark.operators.officedoc import (
        build_pptx,
        is_pptx,
        pptx_to_text,
    )

    slides = [
        ["title & <sub>", "body  spaced\ttab"],
        ["slide two only"],
    ]
    b = build_pptx(slides)
    assert is_pptx(b) and not is_docx(b) and not is_epub(b)
    assert pptx_to_text(b) == (
        "title & <sub>\nbody  spaced\ttab\n\nslide two only"
    )
    # numeric member order: slide10 sorts AFTER slide2, not before
    b = build_pptx([[f"s{i}"] for i in range(1, 12)])
    assert pptx_to_text(b) == "\n\n".join(f"s{i}" for i in range(1, 12))
    # truncation fuzz
    good = build_pptx([["alpha", "beta"]])
    for cut in range(0, len(good), 9):
        try:
            pptx_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_pptx_independent_fixture_breaks_split_runs():
    from evm_archive_spark.operators.officedoc import pptx_to_text

    # hand-written DrawingML: split runs, a:br, attribute-bearing a:p/a:t,
    # entity, empty paragraph — not built by build_pptx
    slide = (
        '<?xml version="1.0"?><p:sld xmlns:p="http://x" xmlns:a="http://y">'
        "<p:cSld><p:spTree><p:sp><p:txBody>"
        '<a:p><a:pPr lvl="1"/><a:r><a:t>Hel</a:t></a:r>'
        "<a:r><a:t>lo</a:t></a:r><a:br/>"
        '<a:r><a:t> &amp; more</a:t></a:r></a:p>'
        "<a:p/>"
        "<a:p><a:r><a:t>last</a:t></a:r></a:p>"
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    b = _zip_bytes(
        [
            ("ppt/presentation.xml", "<p:presentation/>"),
            ("ppt/slides/slide1.xml", slide),
        ]
    )
    assert pptx_to_text(b) == "Hello\n & more\n\nlast"


def test_ods_roundtrip_and_foreign_fixture():
    import pytest as _pytest

    from evm_archive_spark.operators.officedoc import (
        build_ods,
        is_ods,
        ods_to_text,
    )

    rows = [
        ["name", "qty & more", "<note>"],
        ["a  spaced  cell", "42", " lead/trail "],
        ["", "last", ""],
    ]
    b = build_ods(rows)
    assert is_ods(b) and not is_odt(b) and not is_docx(b)
    assert ods_to_text(b) == "\n".join("\t".join(r) for r in rows)

    # foreign fixture: column repeat, covered cell, two paragraphs in
    # one cell, entity + counted space — not built by build_ods
    xml = (
        '<?xml version="1.0"?><office:document-content><office:body>'
        "<office:spreadsheet><table:table>"
        "<table:table-row>"
        '<table:table-cell table:number-columns-repeated="3">'
        "<text:p>thrice</text:p></table:table-cell>"
        "<table:table-cell><text:p>p1 &amp; x<text:s text:c=\"2\"/>y"
        "</text:p><text:p>p2</text:p></table:table-cell>"
        "</table:table-row>"
        "<table:table-row><table:table-cell/></table:table-row>"
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    b = _zip_bytes(
        [
            (
                "mimetype",
                "application/vnd.oasis.opendocument.spreadsheet",
            ),
            ("content.xml", xml),
        ]
    )
    assert ods_to_text(b) == "thrice\tthrice\tthrice\tp1 & x  y\np2\n"

    # a sheet-filler repeat bomb is a typed error, not an OOM
    bomb = xml.replace('table:number-columns-repeated="3"',
                       'table:number-columns-repeated="100000"')
    b = _zip_bytes(
        [
            (
                "mimetype",
                "application/vnd.oasis.opendocument.spreadsheet",
            ),
            ("content.xml", bomb),
        ]
    )
    with _pytest.raises(OfficeDocError, match="repeat"):
        ods_to_text(b)
    # truncation fuzz
    good = build_ods(rows)
    for cut in range(0, len(good), 9):
        try:
            ods_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_xls_roundtrip_unicode_and_continue():
    from evm_archive_spark.operators.officedoc import (
        build_xls,
        cfb_to_text,
        is_xls,
        xls_to_text,
    )

    rows = [
        ["name", "qty & more", "unicode \xe9中"],
        ["alpha", "42", "x  y  z"],
    ]
    b = build_xls(rows)
    assert is_xls(b) and not is_docx(b)
    exp = "\n".join("\t".join(r) for r in rows)
    assert xls_to_text(b) == exp
    assert cfb_to_text(b) == ("xls", exp)

    # enough distinct strings to overflow one SST record -> Continue
    big = [[f"r{ri}c{ci} " + "y" * 200 for ci in range(8)]
           for ri in range(12)]
    assert xls_to_text(build_xls(big)) == "\n".join(
        "\t".join(r) for r in big
    )
    # truncation fuzz
    good = build_xls(rows)
    for cut in range(0, len(good), 97):
        try:
            xls_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_xls_numeric_records_and_mid_string_continue():
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import xls_to_text

    def rec(op, payload):
        return st.pack("<HH", op, len(payload)) + payload

    # SST whose single string's chars CROSS into a Continue record,
    # switching width at the boundary (compressed tail after a fresh
    # option byte) — the [MS-XLS] 2.5.293 split rule
    s_head = "AB€"                       # utf-16 in the SST record
    s_tail = "cd"                             # compressed in the Continue
    sst_payload = (
        st.pack("<II", 1, 1)
        + st.pack("<HB", len(s_head) + len(s_tail), 0x01)
        + s_head.encode("utf-16-le")
    )
    cont_payload = b"\x00" + s_tail.encode("latin-1")
    glob = (
        rec(0x0809, st.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        + rec(0x00FC, sst_payload)
        + rec(0x003C, cont_payload)
        + rec(0x000A, b"")
    )
    # sheet: LabelSst, Label (inline), Number, RK int/100, MulRk pair
    sheet = (
        rec(0x0809, st.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        + rec(0x00FD, st.pack("<HHHI", 0, 0, 0, 0))
        + rec(
            0x0204,
            st.pack("<HHH", 0, 1, 0)
            + st.pack("<HB", 6, 0x00)
            + b"inline",
        )
        + rec(0x0203, st.pack("<HHH", 1, 0, 0) + st.pack("<d", 3.5))
        # RK: integer 7 -> (7 << 2) | 2 ; double 1.25/100 via f100
        + rec(0x027E, st.pack("<HHHI", 1, 1, 0, (7 << 2) | 2))
        + rec(
            0x00BD,
            st.pack("<HH", 2, 0)
            + st.pack("<HI", 0, (100 << 2) | 3)   # int 100 / 100 = 1
            + st.pack("<HI", 0, (250 << 2) | 3)   # 2.5
            + st.pack("<H", 1),
        )
        + rec(0x000A, b"")
    )
    w = CfbWriter()
    w.add("Workbook", glob + sheet)
    out = xls_to_text(w.tobytes())
    assert out == "AB€cd\tinline\n3.5\t7\n1\t2.5", repr(out)


def test_xls_errors_typed():
    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import (
        build_xls,
        cfb_to_text,
        xls_to_text,
    )

    with pytest.raises(OfficeDocError):
        xls_to_text(b"not a cfb")
    w = CfbWriter()
    w.add("SomethingElse", b"x" * 10)
    with pytest.raises(OfficeDocError, match="Workbook"):
        xls_to_text(w.tobytes())
    with pytest.raises(OfficeDocError, match="no Office stream"):
        cfb_to_text(w.tobytes())
    # BIFF4 and older (version < 0x0500) stay a typed strict boundary
    import struct as st

    w = CfbWriter()
    w.add(
        "Book",
        st.pack("<HH", 0x0809, 8) + st.pack("<HHHH", 0x0400, 5, 0, 0)
        + b"\x00\x00\x00\x00",
    )
    with pytest.raises(OfficeDocError, match="BIFF version"):
        xls_to_text(w.tobytes())
    # a single over-long cell string is a typed writer error
    with pytest.raises(OfficeDocError, match="too long"):
        build_xls([["z" * 5000]])


def _pooled_document_extract_routes_pptx_ods_xls(spark):
    """document_extract routes the round-7 office additions (sniffed and
    by MIME) without disturbing the doc/xlsx/odt lanes."""
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.operators.officedoc import (
        build_doc,
        build_ods,
        build_pptx,
        build_xls,
    )

    pptx = build_pptx([["slide text here"]])
    ods = build_ods([["c1", "c2"]])
    xls = build_xls([["x1", "x2"]])
    doc = build_doc("word text")
    rows = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3],
            "payload": [
                bytearray(pptx),
                bytearray(ods),
                bytearray(xls),
                bytearray(doc),
            ],
        }
    )
    out = {
        r["media_id"]: r
        for r in document_extract(spark.createDataFrame(rows)).collect()
    }
    assert out[0]["format"] == "pptx"
    assert out[0]["text"] == "slide text here"
    assert out[1]["format"] == "ods"
    assert out[1]["text"] == "c1\tc2"
    assert out[2]["format"] == "xls"
    assert out[2]["text"] == "x1\tx2"
    assert out[3]["format"] == "doc"
    assert out[3]["text"] == "word text\nEND."

    # MIME wins over sniffing for the CFB pair
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(xls)],
                "mime": ["application/vnd.ms-excel"],
            }
        )
    )
    got = document_extract(df2, mime_col="mime").collect()[0]
    assert got["format"] == "xls"




def test_odp_roundtrip_and_foreign_fixture():
    from evm_archive_spark.operators.officedoc import (
        build_odp,
        is_odp,
        odp_to_text,
    )

    pages = [
        ["title  spaced", "body & <x>\ttab\nbreak"],
        ["page two only "],
    ]
    b = build_odp(pages)
    assert is_odp(b) and not is_odt(b) and not is_docx(b)
    assert odp_to_text(b) == (
        "title  spaced\nbody & <x>\ttab\nbreak\n\npage two only "
    )
    # foreign fixture: attribute-bearing pages, heading, nested span,
    # notes outside text:p ignored as tags — not built by build_odp
    xml = (
        '<?xml version="1.0"?><office:document-content><office:body>'
        '<office:presentation>'
        '<draw:page draw:name="p1" draw:style-name="dp1">'
        '<draw:frame><draw:text-box>'
        '<text:h text:outline-level="1">Head</text:h>'
        '<text:p>one <text:span>two</text:span> &amp; three</text:p>'
        "</draw:text-box></draw:frame></draw:page>"
        '<draw:page draw:name="p2"><draw:frame><draw:text-box>'
        "<text:p>second</text:p></draw:text-box></draw:frame>"
        "</draw:page>"
        "</office:presentation></office:body></office:document-content>"
    )
    b = _zip_bytes(
        [
            (
                "mimetype",
                "application/vnd.oasis.opendocument.presentation",
            ),
            ("content.xml", xml),
        ]
    )
    assert odp_to_text(b) == "Head\none two & three\n\nsecond"
    # truncation fuzz
    good = build_odp(pages)
    for cut in range(0, len(good), 9):
        try:
            odp_to_text(good[:cut])
        except OfficeDocError:
            pass


def _pooled_document_extract_routes_odp(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.operators.officedoc import build_odp

    odp = build_odp([["deck text"]])
    out = document_extract(
        spark.createDataFrame(
            pd.DataFrame({"media_id": [0], "payload": [bytearray(odp)]})
        )
    ).collect()[0]
    assert out["format"] == "odp"
    assert out["text"] == "deck text"




def test_extract_routing_pooled(spark):
    """All document_extract routing checks (office zip family, CFB
    pair, sqlite, avro, columnar) through one thread pool — the
    test_operators_pooled_heavy restructure applied to the routing
    one-offs (suite-time watch, VERDICT r6 #8)."""
    from concurrent.futures import ThreadPoolExecutor

    from test_avrofile import _pooled_document_extract_routes_avro
    from test_columnar import _pooled_document_extract_routes_columnar
    from test_sqlitefile import _pooled_document_extract_routes_sqlite

    checks = [
        _pooled_document_extract_routes_docx_epub,
        _pooled_document_extract_routes_pptx_ods_xls,
        _pooled_document_extract_routes_odp,
        _pooled_document_extract_routes_sqlite,
        _pooled_document_extract_routes_avro,
        _pooled_document_extract_routes_columnar,
        _pooled_document_extract_routes_ppt,
    ]

    def run(fn):
        try:
            fn(spark)
            return fn.__name__, None
        except Exception as e:  # noqa: BLE001 — aggregated below
            return fn.__name__, f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(run, checks))
    fails = [(n, m) for n, m in results if m]
    assert not fails, "\n".join(f"{n}: {m}" for n, m in fails)


def test_self_closing_elements_with_attributes_do_not_merge():
    """Code-review regression pins: an attribute-bearing self-closing
    element must not parse as an open tag (the `[^>]*` of the open
    alternative used to swallow the '/' and the lazy body then consumed
    the FOLLOWING element)."""
    from evm_archive_spark.operators.officedoc import (
        odp_to_text,
        ods_to_text,
        pptx_to_text,
        xlsx_to_text,
    )

    # xlsx: styled empty cell (as Excel writes) before a shared-string
    # cell — the empty cell must survive and the string must resolve
    sst = "<sst><si><t>hello</t></si><si/><si><t>after</t></si></sst>"
    sheet = (
        "<worksheet><sheetData>"
        '<row r="1"><c r="A1" s="1"/><c r="B1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    b = _zip_bytes(
        [
            ("xl/workbook.xml", "<workbook/>"),
            ("xl/sharedStrings.xml", sst),
            ("xl/worksheets/sheet1.xml", sheet),
        ]
    )
    assert xlsx_to_text(b) == "\thello\nafter"

    # odt/ods: attribute-bearing empty paragraph must not merge with
    # the next one
    xml = (
        "<office:document-content><office:body><office:text>"
        '<text:p text:style-name="P1"/>'
        "<text:p>kept</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    b = _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", xml),
        ]
    )
    assert odt_to_text(b) == "\nkept"

    # ods: self-closing repeated cell with attributes
    xml = (
        "<office:document-content><office:body><office:spreadsheet>"
        "<table:table><table:table-row>"
        '<table:table-cell table:number-columns-repeated="2"/>'
        "<table:table-cell><text:p>v</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    b = _zip_bytes(
        [
            (
                "mimetype",
                "application/vnd.oasis.opendocument.spreadsheet",
            ),
            ("content.xml", xml),
        ]
    )
    assert ods_to_text(b) == "\t\tv"

    # pptx: attribute-bearing empty paragraph + empty self-closing run
    slide = (
        '<p:sld><p:cSld><p:spTree><p:sp><p:txBody>'
        '<a:p a:x="1"/>'
        '<a:p><a:r><a:t xml:space="preserve"/></a:r>'
        "<a:r><a:t>kept</a:t></a:r></a:p>"
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    b = _zip_bytes(
        [
            ("ppt/presentation.xml", "<p:presentation/>"),
            ("ppt/slides/slide1.xml", slide),
        ]
    )
    assert pptx_to_text(b) == "\nkept"

    # odp: attribute-bearing empty page must not merge with the next
    xml = (
        "<office:document-content><office:body><office:presentation>"
        '<draw:page draw:name="p1"/>'
        '<draw:page draw:name="p2"><draw:frame><draw:text-box>'
        "<text:p>second</text:p></draw:text-box></draw:frame>"
        "</draw:page>"
        "</office:presentation></office:body></office:document-content>"
    )
    b = _zip_bytes(
        [
            (
                "mimetype",
                "application/vnd.oasis.opendocument.presentation",
            ),
            ("content.xml", xml),
        ]
    )
    assert odp_to_text(b) == "\n\nsecond"


def test_xlsx_sheet_numeric_order():
    from evm_archive_spark.operators.officedoc import xlsx_to_text

    members = [("xl/workbook.xml", "<workbook/>")]
    for i in (1, 2, 10):
        members.append(
            (
                f"xl/worksheets/sheet{i}.xml",
                "<worksheet><sheetData>"
                f'<row r="1"><c r="A1" t="inlineStr"><is><t>s{i}</t>'
                "</is></c></row></sheetData></worksheet>",
            )
        )
    b = _zip_bytes(members)
    assert xlsx_to_text(b) == "s1\n\ns2\n\ns10"


def test_corrupt_member_sniffs_stay_typed_and_capped():
    """A mimetype-less ZIP whose content.xml deflate stream is corrupt
    must sniff as 'not this format' (and zip_to_text must raise the
    TYPED error), never leak a raw zlib.error through the dirty-payload
    path."""
    import io
    import struct
    import zipfile

    from evm_archive_spark.operators.officedoc import (
        is_odp,
        is_ods,
        zip_to_text,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("content.xml", "<office:document-content/>" * 50)
    b = bytearray(buf.getvalue())
    # corrupt the member's deflate payload in place (after the local
    # header: 30 bytes + name length)
    off = 30 + len("content.xml")
    b[off + 5:off + 25] = b"\x00" * 20
    b = bytes(b)
    assert is_ods(b) is False and is_odp(b) is False
    with pytest.raises(OfficeDocError):
        zip_to_text(b)


def test_legacy_mime_mislabeled_ooxml_still_extracts(spark):
    """A .xlsx served as application/vnd.ms-excel (standard real-world
    mislabeling) must extract through the ZIP dispatch, not degrade to
    raw text via the failing CFB branch."""
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.operators.officedoc import build_xlsx

    xlsx = build_xlsx([["mislabeled", "cell"]])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(xlsx)],
                "mime": ["application/vnd.ms-excel"],
            }
        )
    )
    got = document_extract(df, mime_col="mime").collect()[0]
    assert got["format"] == "xlsx"
    assert got["text"] == "mislabeled\tcell"


def test_office_roundtrip_properties():
    """Hypothesis: arbitrary text round-trips exactly through every
    office writer/reader pair, under each format's documented
    normalization (tabs/newlines are the linearization separators for
    the grid formats; RTF maps non-ASCII via \\uN so identity holds on
    any text)."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from evm_archive_spark.operators.officedoc import (
        build_doc,
        build_odp,
        build_ods,
        build_odt,
        build_pptx,
        build_rtf,
        build_xls,
        build_xlsx,
        doc_to_text,
        odp_to_text,
        ods_to_text,
        odt_to_text,
        pptx_to_text,
        rtf_to_text,
        xls_to_text,
        xlsx_to_text,
    )

    # printable unicode incl. XML specials, spaces, CJK — no control
    # chars (Word's piece walk folds those by design)
    text = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xD7FF,
            blacklist_characters="\x7f",
        ),
        max_size=120,
    )

    @settings(max_examples=25, deadline=None)
    @given(a=text, b=text)
    def check(a, b):
        assert odt_to_text(build_odt([a, b])) == f"{a}\n{b}"
        assert pptx_to_text(build_pptx([[a], [b]])) == f"{a}\n\n{b}"
        assert odp_to_text(build_odp([[a], [b]])) == f"{a}\n\n{b}"
        # Word stores \r paragraph marks; builder appends END. marker
        assert doc_to_text(build_doc(a)) == a + "\nEND."
        ca = _re.sub(r"[\t\r\n]", " ", a)
        cb = _re.sub(r"[\t\r\n]", " ", b)
        grid = [[ca, cb], [cb, ca]]
        exp = f"{ca}\t{cb}\n{cb}\t{ca}"
        assert xlsx_to_text(build_xlsx(grid)) == exp
        assert ods_to_text(build_ods(grid)) == exp
        assert xls_to_text(build_xls(grid)) == exp
        assert rtf_to_text(build_rtf([a, b])) == f"{a}\n{b}"

    check()


def test_avro_roundtrip_property():
    """Hypothesis: arbitrary (long, string, bytes, optional) records
    survive the container round trip under both codecs."""
    from hypothesis import given, settings, strategies as st

    from evm_archive_spark.operators.avrofile import avro_records, build_avro

    schema = {
        "type": "record", "name": "P",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "o", "type": ["null", "long"]},
        ],
    }
    rec = st.fixed_dictionaries(
        {
            "n": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
            "s": st.text(max_size=60),
            "b": st.binary(max_size=40),
            "o": st.none() | st.integers(min_value=-100, max_value=100),
        }
    )

    @settings(max_examples=25, deadline=None)
    @given(recs=st.lists(rec, max_size=8), codec=st.sampled_from(["null", "deflate"]))
    def check(recs, codec):
        _s, got = avro_records(
            build_avro(schema, recs, codec=codec, records_per_block=3)
        )
        assert got == recs

    check()


def test_ppt_roundtrip_walk_and_errors():
    """Legacy PowerPoint 97: record-tree walk over the CFB container;
    both text-atom encodings; hand-built fixture with noise atoms the
    builder never writes; typed boundaries; truncation fuzz."""
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import (
        build_ppt,
        cfb_to_text,
        ppt_to_text,
    )

    ts = ["hello \xe9中 slide", "ascii notes", "third & <x>\nwrapped"]
    b = build_ppt(ts)
    assert ppt_to_text(b) == "\n".join(ts)
    assert cfb_to_text(b) == ("ppt", "\n".join(ts))

    # hand-built stream: container > [noise atom, TextCharsAtom with a
    # \r and a \x0b, TextBytesAtom] — noise skipped, breaks mapped
    def rec(rt, payload, ver=0):
        return st.pack("<HHI", ver & 0xF, rt, len(payload)) + payload

    inner = (
        rec(0x03E9, b"\x01\x02\x03\x04")                 # noise atom
        + rec(0x0FA0, "par1\rpar2\x0bline".encode("utf-16-le"))
        + rec(0x0FA8, b"bytes atom")
    )
    doc = rec(0x03E8, inner, ver=0xF)
    w = CfbWriter()
    w.add("PowerPoint Document", doc)
    assert ppt_to_text(w.tobytes()) == "par1\npar2\nline\nbytes atom"

    # CFB without the stream is typed
    w = CfbWriter()
    w.add("Other", b"x" * 8)
    with pytest.raises(OfficeDocError, match="PowerPoint"):
        ppt_to_text(w.tobytes())
    # record overrun is typed; truncation fuzz
    w = CfbWriter()
    # CfbWriter pads streams to the 4096-byte mini cutoff, so the
    # declared length must overrun even the padding
    w.add("PowerPoint Document", st.pack("<HHI", 0, 1, 99999) + b"xx")
    with pytest.raises(OfficeDocError, match="overruns"):
        ppt_to_text(w.tobytes())
    good = build_ppt(ts)
    for cut in range(0, len(good), 97):
        try:
            ppt_to_text(good[:cut])
        except OfficeDocError:
            pass


def _pooled_document_extract_routes_ppt(spark):
    import pandas as pd

    from evm_archive_spark.operators.extract import document_extract
    from evm_archive_spark.operators.officedoc import build_ppt

    ppt = build_ppt(["deck body text"])
    out = document_extract(
        spark.createDataFrame(
            pd.DataFrame({"media_id": [0], "payload": [bytearray(ppt)]})
        )
    ).collect()[0]
    assert out["format"] == "ppt"
    assert out["text"] == "deck body text"
    # legacy MIME routes to the CFB dispatch
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0],
                "payload": [bytearray(ppt)],
                "mime": ["application/vnd.ms-powerpoint"],
            }
        )
    )
    got = document_extract(df2, mime_col="mime").collect()[0]
    assert got["format"] == "ppt"


# (routing check pooled into test_extract_routing_pooled)


def test_xls_large_sheet_row_emission_is_linear():
    # row emission used to rescan every cell key per row (O(rows x
    # cells)); a 10k-row sheet took minutes. Must be linear now.
    import time

    from evm_archive_spark.operators.officedoc import (
        build_xls,
        xls_to_text,
    )

    rows = [[f"r{i}", f"v{i % 7}"] for i in range(10_000)]
    b = build_xls(rows)
    t0 = time.monotonic()
    out = xls_to_text(b)
    assert time.monotonic() - t0 < 30
    assert out == "\n".join("\t".join(r) for r in rows)


def test_ppt_fastsave_live_edit_chain():
    """Fast-saved decks: only the newest edit's text surfaces (the
    CurrentUserAtom -> UserEditAtom -> PersistDirectoryAtom chain,
    [MS-PPT] 2.1.2); older directory entries merge unless overridden;
    encrypted decks and broken chains behave as typed/fallback."""
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import (
        _PPT_CU_ENCRYPTED,
        _PPT_CU_PLAIN,
        build_ppt_fastsave,
        cfb_to_text,
        ppt_to_text,
    )

    # two-edit fast save: the superseded body must NOT appear
    old = ["SUPERSEDED body", "old notes"]
    new = ["live body \xe9中", "new notes"]
    b = build_ppt_fastsave([old, new])
    assert ppt_to_text(b) == "\n".join(new)
    assert "SUPERSEDED" not in ppt_to_text(b)
    assert cfb_to_text(b) == ("ppt", "\n".join(new))

    # single-edit chain extracts identically to the whole-stream walk
    solo = build_ppt_fastsave([new])
    assert ppt_to_text(solo) == "\n".join(new)

    # three edits: only the last wins
    b3 = build_ppt_fastsave([old, ["middle text"], new])
    assert ppt_to_text(b3) == "\n".join(new)

    # directory MERGE: edit1 registers ids 1+2, edit2 overrides id 1
    # only -> live text = new id-1 body then the untouched id-2 body
    def rec(rt, payload, ver=0):
        return st.pack("<HHI", ver & 0xF, rt, len(payload)) + payload

    def doc_container(text):
        return rec(
            0x03E8,
            rec(0x0FF0, rec(0x0FA0, text.encode("utf-16-le")), ver=0xF),
            ver=0xF,
        )

    stream = b""
    d1 = len(stream); stream += doc_container("old one")
    d2 = len(stream); stream += doc_container("kept two")
    dir1 = len(stream)
    stream += rec(0x1772, st.pack("<III", 1 | (2 << 20), d1, d2))
    e1 = len(stream)
    stream += rec(0x0FF5, st.pack(
        "<IHBBIIIIHH", 256, 0, 0, 3, 0, dir1, 1, 3, 1, 0))
    d1b = len(stream); stream += doc_container("new one")
    dir2 = len(stream)
    stream += rec(0x1772, st.pack("<II", 1 | (1 << 20), d1b))
    e2 = len(stream)
    stream += rec(0x0FF5, st.pack(
        "<IHBBIIIIHH", 256, 0, 0, 3, e1, dir2, 1, 3, 1, 0))
    cu = rec(0x0FF6, st.pack(
        "<IIIHHBBH", 0x14, _PPT_CU_PLAIN, e2, 1, 0x03F4, 3, 0, 0) + b"u")
    w = CfbWriter()
    w.add("Current User", cu)
    w.add("PowerPoint Document", stream)
    assert ppt_to_text(w.tobytes()) == "new one\nkept two"

    # encrypted header token is a typed boundary
    cu_enc = rec(0x0FF6, st.pack(
        "<IIIHHBBH", 0x14, _PPT_CU_ENCRYPTED, e2, 1, 0x03F4, 3, 0, 0)
        + b"u")
    w = CfbWriter()
    w.add("Current User", cu_enc)
    w.add("PowerPoint Document", stream)
    with pytest.raises(OfficeDocError, match="encrypted"):
        ppt_to_text(w.tobytes())

    # broken chain (current-edit offset points at garbage) falls back
    # to the whole-stream walk — all text, never an exception
    cu_bad = rec(0x0FF6, st.pack(
        "<IIIHHBBH", 0x14, _PPT_CU_PLAIN, 1, 1, 0x03F4, 3, 0, 0) + b"u")
    w = CfbWriter()
    w.add("Current User", cu_bad)
    w.add("PowerPoint Document", stream)
    out = ppt_to_text(w.tobytes())
    assert "old one" in out and "new one" in out and "kept two" in out

    # cyclic chain (edit pointing at itself) also falls back, bounded
    cyc = b""
    cd = len(cyc); cyc += doc_container("cycle body")
    cdir = len(cyc)
    cyc += rec(0x1772, st.pack("<II", 1 | (1 << 20), cd))
    ce = len(cyc)
    cyc += rec(0x0FF5, st.pack(
        "<IHBBIIIIHH", 256, 0, 0, 3, ce, cdir, 1, 3, 1, 0))
    cu_cyc = rec(0x0FF6, st.pack(
        "<IIIHHBBH", 0x14, _PPT_CU_PLAIN, ce, 1, 0x03F4, 3, 0, 0) + b"u")
    w = CfbWriter()
    w.add("Current User", cu_cyc)
    w.add("PowerPoint Document", cyc)
    assert "cycle body" in ppt_to_text(w.tobytes())

    # truncation fuzz over the fast-save fixture
    good = build_ppt_fastsave([old, new])
    for cut in range(0, len(good), 97):
        try:
            ppt_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_xls_biff5_roundtrip_rstring_and_mixed_records():
    """Excel 5.0/95 (BIFF5): inline LABEL byte strings through the same
    walk; RSTRING cells; numeric records shared with BIFF8; the Book
    stream name; truncation fuzz."""
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import (
        build_xls_biff5,
        cfb_to_text,
        xls_to_text,
    )

    rows = [["caf\xe9 cell", "b1"], ["second", "r2 \xb5"]]
    b = build_xls_biff5(rows)
    exp = "caf\xe9 cell\tb1\nsecond\tr2 \xb5"
    assert xls_to_text(b) == exp
    assert cfb_to_text(b) == ("xls", exp)

    # hand-built BIFF5 sheet: RSTRING (format runs ignored), NUMBER, RK
    def rec(op, payload):
        return st.pack("<HH", op, len(payload)) + payload

    bof_g = rec(0x0809, st.pack("<HHHH", 0x0500, 0x0005, 0, 0))
    bof_s = rec(0x0809, st.pack("<HHHH", 0x0500, 0x0010, 0, 0))
    eof = rec(0x000A, b"")
    rs = b"rich text"
    body = (
        rec(0x00D6, st.pack("<HHHH", 0, 0, 0, len(rs)) + rs
            + b"\x01" + b"\x00\x00")            # 1 format run, ignored
        + rec(0x0203, st.pack("<HHH", 0, 1, 0) + st.pack("<d", 2.5))
        + rec(0x027E, st.pack("<HHHI", 1, 0, 0, (7 << 2) | 2))
    )
    w = CfbWriter()
    w.add("Book", bof_g + eof + bof_s + body + eof)
    assert xls_to_text(w.tobytes()) == "rich text\t2.5\n7"

    good = build_xls_biff5(rows)
    for cut in range(0, len(good), 97):
        try:
            xls_to_text(good[:cut])
        except OfficeDocError:
            pass


def test_doc_word6_roundtrip_and_boundaries():
    """Word 6.0/95 (wIdent 0xA5DC): contiguous fcMin..fcMac cp1252
    text for normal saves; fast saves (fComplex) walk the CLX piece
    table at FIB pair 33; out-of-range fields typed."""
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter, parse_cfb
    from evm_archive_spark.operators.officedoc import (
        build_doc_word6,
        cfb_to_text,
        doc_to_text,
    )

    t = "old Word text\nsecond para, caf\xe9"
    b = build_doc_word6(t)
    assert doc_to_text(b) == t
    assert cfb_to_text(b) == ("doc", t)

    # fComplex (fast-saved): pieces stored out of order with stale
    # bytes between them — the piece walk recovers the logical text,
    # and the CONTIGUOUS fcMin..fcMac read would NOT (the stale marker
    # sits inside the range), which is the whole point of the walk
    fs = build_doc_word6(t, fast_save=True)
    assert doc_to_text(fs) == t
    assert cfb_to_text(fs) == ("doc", t)
    wd = parse_cfb(fs).stream("WordDocument")
    fc_min, fc_mac = st.unpack_from("<II", wd, 0x18)
    contiguous = wd[fc_min:fc_mac].decode("cp1252", "replace")
    assert "STALE SUPERSEDED" in contiguous and contiguous != t

    # fComplex with a CLX that overruns the stream is typed
    wd6 = bytearray(0x300)
    st.pack_into("<H", wd6, 0, 0xA5DC)
    st.pack_into("<H", wd6, 0x0A, 0x0004)
    st.pack_into("<II", wd6, 0x18, 0x200, 0x210)
    st.pack_into("<II", wd6, 0x160, 0x280, 1 << 20)   # lcbClx overrun
    w = CfbWriter()
    w.add("WordDocument", bytes(wd6))
    with pytest.raises(OfficeDocError, match="CLX"):
        doc_to_text(w.tobytes())

    # fComplex pointing at a zeroed CLX (no Pcdt) is typed
    st.pack_into("<II", wd6, 0x160, 0x280, 0x10)
    w = CfbWriter()
    w.add("WordDocument", bytes(wd6))
    with pytest.raises(OfficeDocError, match="CLX|Pcdt"):
        doc_to_text(w.tobytes())

    # fcMin/fcMac beyond the stream is typed
    wd6 = bytearray(0x300)
    st.pack_into("<H", wd6, 0, 0xA5DC)
    st.pack_into("<II", wd6, 0x18, 0x200, 1 << 24)
    w = CfbWriter()
    w.add("WordDocument", bytes(wd6))
    with pytest.raises(OfficeDocError, match="range"):
        doc_to_text(w.tobytes())

    for good in (build_doc_word6(t), build_doc_word6(t, fast_save=True)):
        for cut in range(0, len(good), 97):
            try:
                doc_to_text(good[:cut])
            except OfficeDocError:
                pass


def test_encrypted_office_binaries_are_typed():
    """fEncrypted .doc (97 and 6/95) and FilePass .xls are typed
    boundaries — ciphertext must never surface as corpus text."""
    import struct as st

    from evm_archive_spark.operators.cfb import CfbWriter
    from evm_archive_spark.operators.officedoc import (
        doc_to_text,
        xls_to_text,
    )

    for ident in (0xA5EC, 0xA5DC):
        wd = bytearray(0x300)
        st.pack_into("<H", wd, 0, ident)
        st.pack_into("<H", wd, 0x0A, 0x0100)        # fEncrypted
        w = CfbWriter()
        w.add("WordDocument", bytes(wd))
        with pytest.raises(OfficeDocError, match="encrypted"):
            doc_to_text(w.tobytes())

    def rec(op, payload):
        return st.pack("<HH", op, len(payload)) + payload

    bof = rec(0x0809, st.pack("<HHHH", 0x0600, 0x0005, 0, 0))
    filepass = rec(0x002F, st.pack("<HHH", 1, 1, 0))
    w = CfbWriter()
    w.add("Workbook", bof + filepass + rec(0x000A, b""))
    with pytest.raises(OfficeDocError, match="encrypted"):
        xls_to_text(w.tobytes())


def test_property_roundtrip_round8_builders():
    """Hypothesis: round-8 writer/reader pairs — BIFF5 grids
    (latin-1-safe cells), Word 6/95 text, and fast-saved PPT decks
    (live edit only)."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from evm_archive_spark.operators.officedoc import (
        build_doc_word6,
        build_ppt_fastsave,
        build_xls_biff5,
        doc_to_text,
        ppt_to_text,
        xls_to_text,
    )

    # cp1252-safe (Word 6/95 stores the ANSI codepage): printable
    # latin-1 minus the C1 range cp1252 redefines
    latin = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xFF,
            blacklist_characters="\x7f\xad"
            + "".join(chr(c) for c in range(0x80, 0xA0)),
        ),
        max_size=80,
    )
    uni = st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0xD7FF,
            blacklist_characters="\x7f",
        ),
        max_size=80,
    )

    @settings(max_examples=25, deadline=None)
    @given(a=latin, b=latin, u=uni, v=latin)   # odd ppt texts store
    def check(a, b, u, v):                     # latin-1 (TextBytesAtom)
        ca = _re.sub(r"[\t\r\n]", " ", a)
        cb = _re.sub(r"[\t\r\n]", " ", b)
        grid = [[ca, cb], [cb, ca]]
        assert xls_to_text(build_xls_biff5(grid)) == (
            f"{ca}\t{cb}\n{cb}\t{ca}"
        )
        assert doc_to_text(build_doc_word6(ca)) == ca
        assert doc_to_text(build_doc_word6(ca, fast_save=True)) == ca
        # fast save: only the LAST edit's text surfaces; \x0b and
        # trailing NULs are folded by _ppt_clean, so strip them
        pu = u.replace("\x0b", " ").rstrip("\x00")
        pv = v.replace("\x0b", " ").rstrip("\x00")
        deck = build_ppt_fastsave([["old " + pv, "stale"], [pu, pv]])
        assert ppt_to_text(deck) == f"{pu}\n{pv}"

    check()
