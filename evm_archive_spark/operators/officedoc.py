"""DOCX, ODT and EPUB text extraction — from scratch, stdlib only.

All three formats are ZIP containers of XML (public specs: ISO/IEC
29500 WordprocessingML for .docx; OASIS ODF for .odt; the IDPF/W3C
EPUB OCF + OPF specs), so a training-data pipeline meets them
constantly in books/report corpora.
Extraction is a per-payload parse inside Arrow batches (the pdf.py /
mail.py placement) with the archive module's decompression caps — a
crafted container cannot inflate unbounded.

- **DOCX**: read ``word/document.xml``; paragraphs are ``<w:p>``
  elements, visible text the concatenation of ``<w:t>`` runs
  (``xml:space='preserve'`` honoured by never trimming run bodies),
  ``<w:tab/>`` a tab, ``<w:br/>``/``<w:cr/>`` a newline.
- **ODT**: read ``content.xml``; ``<text:p>``/``<text:h>`` paragraphs,
  ``<text:tab/>``/``<text:line-break/>``/``<text:s text:c>`` whitespace
  elements, character data possibly nested in spans.
- **EPUB**: ``META-INF/container.xml`` names the OPF package; the OPF
  ``<spine>`` lists chapter idrefs in reading order into the
  ``<manifest>`` hrefs (resolved against the OPF directory); each
  XHTML chapter is stripped to text.

``build_docx`` / ``build_epub`` are the synthesis writers (the
pdf.build_simple_pdf pattern): gates q_docx / q_epub round-trip REAL
containers built from document text, and the DuckDB oracle derives the
expected output from the construction — it never touches a ZIP.

Reference parity note: the reference (SummaryDev/evm-archive) has no
document surface; this extends the training-pipeline lane the brief
makes first-class.
"""

from __future__ import annotations

import io
import posixpath
import re
import struct
import zipfile

from .codecerrors import guard

MAX_XML_BYTES = 64 * 1024 * 1024  # per-member inflate cap (zip bombs)


class OfficeDocError(Exception):
    """Malformed or out-of-scope DOCX/EPUB payload."""


_ZIP_MAGIC = b"PK\x03\x04"


def _zip_of(b: bytes) -> zipfile.ZipFile:
    if b[:4] != _ZIP_MAGIC:
        raise OfficeDocError("not a ZIP container")
    try:
        return zipfile.ZipFile(io.BytesIO(b))
    except zipfile.BadZipFile as e:
        raise OfficeDocError(f"bad zip: {e}") from e


def _read_member(z: zipfile.ZipFile, name: str) -> str:
    try:
        info = z.getinfo(name)
    except KeyError:
        raise OfficeDocError(f"missing zip member {name!r}") from None
    if info.file_size > MAX_XML_BYTES:
        raise OfficeDocError(f"member {name!r} exceeds the inflate cap")
    try:
        with z.open(info) as fh:
            return fh.read(MAX_XML_BYTES + 1).decode("utf-8", "replace")
    except (zipfile.BadZipFile, OSError, NotImplementedError) as e:
        # BadZipFile (e.g. a failing member CRC) is not in the guard
        # decorator's stray list — normalize here so a corrupt member
        # is a TYPED error on every extractor, per the dirty-payload
        # contract
        raise OfficeDocError(f"bad zip member {name!r}: {e}") from e


_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
}


def _unescape(s: str) -> str:
    def sub(m: "re.Match[str]") -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(body, m.group(0))

    return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", sub, s)


def xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )



def _member_head(z: zipfile.ZipFile, name: str, cap: int) -> bytes | None:
    """Bounded, exception-typed peek at one zip member for SNIFFING:
    reads at most ``cap`` bytes and returns ``None`` on any decode
    error (a corrupt deflate stream must make a sniff say "not this
    format", never raise an untyped zlib error through a dirty-payload
    path, and never inflate unbounded)."""
    try:
        with z.open(name) as fh:
            return fh.read(cap)
    except Exception:  # noqa: BLE001 - sniffing untrusted bytes
        return None


# -- DOCX ---------------------------------------------------------------------

_W_P = re.compile(r"<w:p[ >/]", re.S)
_W_RUN = re.compile(
    r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br\s*/>|<w:cr\s*/>", re.S
)


def is_docx(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            return "word/document.xml" in z.namelist()
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def docx_to_text(b: bytes) -> str:
    """WordprocessingML -> plain text: one line per ``<w:p>`` paragraph,
    run bodies concatenated untrimmed, tabs/breaks preserved."""
    with _zip_of(b) as z:
        xml = _read_member(z, "word/document.xml")
    paras = []
    # split the body into paragraphs on the <w:p ...> opens; text before
    # the first paragraph is structural markup with no <w:t> runs
    chunks = _W_P.split(xml)[1:] if _W_P.search(xml) else []
    for chunk in chunks:
        parts = []
        for m in _W_RUN.finditer(chunk.split("</w:p>")[0]):
            if m.group(1) is not None:       # <w:t> run body
                parts.append(_unescape(m.group(1)))
            elif m.group(0).startswith("<w:tab"):
                parts.append("\t")
            else:                            # <w:br/> / <w:cr/>
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def build_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid DOCX: [Content_Types].xml + rels + one
    document.xml with the given paragraphs (escaped, space-preserved).
    Round-trips exactly through ``docx_to_text``."""
    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{xml_escape(p)}</w:t>'
        "</w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + body
        + "</w:body></w:document>"
    )
    ctypes = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.wordprocessingml.document."
        'main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ctypes)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


# -- ODT ----------------------------------------------------------------------

_ODT_MIME = b"application/vnd.oasis.opendocument.text"
# self-closing alternative FIRST (and non-capturing, so the open
# alternative keeps groups 1/2): with it second, `[^>]*` swallows the
# '/' of an attribute-bearing empty paragraph (`<text:p
# text:style-name="P1"/>`) and the lazy body merges it with the NEXT
# paragraph
_T_P = re.compile(
    r"<text:(?:p|h)(?:\s[^>]*)?/>|<text:(p|h)(?:\s[^>]*)?>(.*?)</text:\1>",
    re.S,
)
_T_SPECIAL = re.compile(
    r'<text:tab\s*/>|<text:line-break\s*/>|<text:s(?:\s+text:c="(\d+)")?\s*/>',
    re.S,
)


def is_odt(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            names = set(z.namelist())
            if "content.xml" not in names:
                return False
            if "mimetype" in names:
                head = _member_head(z, "mimetype", 256)
                return head is not None and head.strip() == _ODT_MIME
            return True
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def odt_to_text(b: bytes) -> str:
    """OpenDocument text (OASIS ODF): one line per ``<text:p>`` /
    ``<text:h>``; ``<text:tab/>`` a tab, ``<text:line-break/>`` a
    newline, ``<text:s text:c='N'/>`` N spaces (ODF collapses literal
    space runs, so writers encode them this way); character data may sit
    inside nested spans — remaining tags vanish, entities decode."""
    with _zip_of(b) as z:
        xml = _read_member(z, "content.xml")
    # self-closing <text:p/> = empty line; decoding shared with ODS/ODP
    return "\n".join(
        _odf_para_text(pm.group(2) or "") for pm in _T_P.finditer(xml)
    )


def _odf_encode(p: str) -> str:
    """Escape paragraph text for ODF content: tabs/newlines as
    whitespace elements; space runs of 2+ (and leading/trailing single
    spaces) element-encoded so ODF space collapsing can't lose them."""
    s = xml_escape(p)
    s = s.replace("\t", "<text:tab/>").replace("\n", "<text:line-break/>")
    s = re.sub(
        r"  +", lambda m: f' <text:s text:c="{len(m.group(0)) - 1}"/>', s
    )
    s = re.sub(r"^ ", '<text:s text:c="1"/>', s)
    s = re.sub(r" $", '<text:s text:c="1"/>', s)
    return s


def build_odt(paragraphs: list[str]) -> bytes:
    """Minimal valid ODT: mimetype (stored first, per ODF packaging) +
    manifest + content.xml.  Literal space runs are encoded through
    ``<text:s text:c>`` so the round trip through ``odt_to_text`` is
    exact for arbitrary text (tabs/newlines/specials included)."""
    body = "".join(
        f"<text:p>{_odf_encode(p)}</text:p>" for p in paragraphs
    )
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:'
        'opendocument:xmlns:text:1.0"><office:body><office:text>'
        + body
        + "</office:text></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        f'"{_ODT_MIME.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", _ODT_MIME, zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", manifest)
        z.writestr("content.xml", content)
    return buf.getvalue()


# -- legacy .doc ([MS-DOC] over CFB/OLE2) --------------------------------------
# Word 97-2003 binary: the WordDocument stream holds the FIB; fcClx /
# lcbClx (FibRgFcLcb97 pair 33) point into the 0Table/1Table stream
# (FIB flag bit 0x0200 picks which) at the CLX, whose PlcPcd maps CP
# ranges to text pieces — each piece either cp1252 ("fCompressed", fc/2
# offset) or UTF-16LE.  Text extraction is exactly that walk; Word's
# in-text control characters map to plain text (\r paragraph -> \n,
# cell mark -> \t, field/object marks dropped).


def is_doc(b: bytes) -> bool:
    from .cfb import is_cfb

    return is_cfb(b)


def _doc_clean(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch == "\r" or o in (0x0B, 0x0C):      # para / line / page
            out.append("\n")
        elif o == 0x07:                           # cell / row mark
            out.append("\t")
        elif o in (0x13, 0x14, 0x15, 0x01, 0x02, 0x05, 0x08):
            continue                              # field/object marks
        elif o == 0x1E:
            out.append("-")                       # non-breaking hyphen
        elif o == 0x1F:
            continue                              # optional hyphen
        else:
            out.append(ch)
    return "".join(out)


@guard(OfficeDocError)
def doc_to_text(b: bytes) -> str:
    """Word 97-2003 binary -> plain text via the CLX/PlcPcd piece
    table."""
    return _doc_text_from_cfb(_parse_cfb_typed(b))


def _parse_cfb_typed(b: bytes):
    from .cfb import CfbError, parse_cfb

    try:
        return parse_cfb(b)
    except CfbError as e:
        raise OfficeDocError(str(e)) from e


def _parse_clx(clx: bytes) -> tuple[tuple[int, ...], list[int]]:
    """CLX = [Prc]* Pcdt (same structure in Word 6/95 and 97): skip
    the 0x01-tagged property chunks, parse the 0x02-tagged PlcPcd.
    Returns (cp boundaries, raw PCD fc values) — the caller owns the
    per-format fc interpretation (Word 97 packs an fCompressed bit;
    Word 6/95 fc is a plain byte offset)."""
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        if i + 3 > len(clx):
            raise OfficeDocError("truncated CLX Prc")
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        if cb < 0:
            raise OfficeDocError("negative CLX Prc length")
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise OfficeDocError("CLX has no Pcdt")
    if i + 5 > len(clx):
        raise OfficeDocError("truncated CLX Pcdt")
    (lcb_plc,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5:i + 5 + lcb_plc]
    if len(plc) < lcb_plc or lcb_plc < 4 or (lcb_plc - 4) % 12 != 0:
        raise OfficeDocError("malformed PlcPcd")
    n = (lcb_plc - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    if any(cps[k + 1] < cps[k] for k in range(n)):
        raise OfficeDocError("PlcPcd cp boundaries not monotonic")
    fcs = []
    for k in range(n):
        (fc_raw,) = struct.unpack_from("<I", plc, (n + 1) * 4 + k * 8 + 2)
        fcs.append(fc_raw)
    return cps, fcs


@guard(OfficeDocError)
def _doc_text_from_cfb(cf) -> str:
    if "WordDocument" not in cf.streams:
        raise OfficeDocError("no WordDocument stream (not a .doc)")
    wd = cf.stream("WordDocument")
    if len(wd) < 0x200:
        raise OfficeDocError("truncated WordDocument stream")
    (w_ident,) = struct.unpack_from("<H", wd, 0)
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    if flags & 0x0100:
        # fEncrypted: XOR-obfuscated or RC4/CryptoAPI text — a
        # whole-stream decode would emit ciphertext as document text
        raise OfficeDocError("encrypted .doc is out of scope")
    if w_ident == 0xA5DC:
        # Word 6.0/95.  Normal saves: contiguous codepage text at
        # fcMin..fcMac in the WordDocument stream itself.  Fast saves
        # (fComplex, FIB flag 0x0004): a CLX piece table — fcClx/
        # lcbClx are fc/lcb pair 33 of the FIB array at 0x58 (offset
        # 0x160), and the CLX lives in the WordDocument stream (the
        # separate table stream is a Word-97 invention).  Reading
        # fcMin..fcMac contiguously on a fast-saved file surfaces
        # superseded text — the .ppt live-edit lesson.
        if flags & 0x0004:
            if len(wd) < 0x168:
                raise OfficeDocError(
                    "Word 6/95 FIB too short for fcClx")
            fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x160)
            if fc_clx + lcb_clx > len(wd):
                raise OfficeDocError(
                    "Word 6/95 CLX outside the WordDocument stream")
            cps, fcs = _parse_clx(wd[fc_clx:fc_clx + lcb_clx])
            out = []
            for k, fc_raw in enumerate(fcs):
                n_cp = cps[k + 1] - cps[k]
                # Word 6/95 text is always single-byte codepage; the
                # PCD fc is a plain byte offset (no fCompressed bit)
                raw = wd[fc_raw:fc_raw + n_cp]
                if len(raw) < n_cp:
                    raise OfficeDocError("piece outside WordDocument")
                out.append(raw.decode("cp1252", "replace"))
            return _doc_clean("".join(out))
        fc_min, fc_mac = struct.unpack_from("<II", wd, 0x18)
        if not fc_min <= fc_mac <= len(wd):
            raise OfficeDocError("Word 6/95 text range out of stream")
        return _doc_clean(wd[fc_min:fc_mac].decode("cp1252", "replace"))
    if w_ident != 0xA5EC:
        raise OfficeDocError(f"bad FIB wIdent 0x{w_ident:04X}")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    # FIB variable layout: base(32) csw rgW cslw rgLw cbRgFcLcb rgFcLcb
    pos = 32
    (csw,) = struct.unpack_from("<H", wd, pos)
    pos += 2 + csw * 2
    (cslw,) = struct.unpack_from("<H", wd, pos)
    pos += 2 + cslw * 4
    (cb_rgfclcb,) = struct.unpack_from("<H", wd, pos)
    pos += 2
    if cb_rgfclcb < 34:
        raise OfficeDocError("FIB rgFcLcb too short for fcClx")
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, pos + 33 * 8)
    table = cf.stream(table_name)
    if fc_clx + lcb_clx > len(table):
        raise OfficeDocError("CLX outside the table stream")
    cps, fcs = _parse_clx(table[fc_clx:fc_clx + lcb_clx])
    out = []
    for k, fc_raw in enumerate(fcs):
        n_cp = cps[k + 1] - cps[k]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            off = fc // 2
            raw = wd[off:off + n_cp]
            if len(raw) < n_cp:
                raise OfficeDocError("piece outside WordDocument")
            out.append(raw.decode("cp1252", "replace"))
        else:
            raw = wd[fc:fc + 2 * n_cp]
            if len(raw) < 2 * n_cp:
                raise OfficeDocError("piece outside WordDocument")
            out.append(raw.decode("utf-16-le", "replace"))
    return _doc_clean("".join(out))


def build_doc(text: str) -> bytes:
    """Minimal valid Word 97 binary: a FIB whose CLX maps two pieces —
    the text as one UTF-16 piece, then an ASCII cp1252 marker piece —
    exercising both piece encodings.  ``\\n`` is stored as Word's
    ``\\r`` paragraph mark, so ``doc_to_text(build_doc(t))`` returns
    ``t`` exactly (for text free of the control chars _doc_clean
    folds)."""
    from .cfb import CfbWriter

    stored = text.replace("\n", "\r")
    piece1 = stored.encode("utf-16-le")
    marker = "\rEND."
    piece2 = marker.encode("cp1252")
    text_off = 0x600
    wd = bytearray(text_off)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)          # nFib (Word 97)
    struct.pack_into("<H", wd, 0x0A, 0x0200)       # fWhichTblStm -> 1Table
    csw, cslw, cbfclcb = 14, 22, 0x005D
    pos = 32
    struct.pack_into("<H", wd, pos, csw)
    pos += 2 + csw * 2
    struct.pack_into("<H", wd, pos, cslw)
    pos += 2 + cslw * 4
    struct.pack_into("<H", wd, pos, cbfclcb)
    fclcb = pos + 2
    wd = wd + piece1 + piece2
    # CLX in the table stream
    n_cp1 = len(stored)
    n_cp2 = len(marker)
    cps = struct.pack("<3I", 0, n_cp1, n_cp1 + n_cp2)
    pcd1 = struct.pack("<HIH", 0, text_off, 0)               # utf-16
    pcd2 = struct.pack(
        "<HIH", 0, 0x40000000 | ((text_off + len(piece1)) * 2), 0
    )                                                        # cp1252
    plc = cps + pcd1 + pcd2
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray(0x20)  # small pad so fcClx != 0
    fc_clx = len(table)
    table += clx
    struct.pack_into("<II", wd, fclcb + 33 * 8, fc_clx, len(clx))
    w = CfbWriter()
    w.add("WordDocument", bytes(wd))
    w.add("1Table", bytes(table))
    return w.tobytes()


def build_doc_word6(text: str, fast_save: bool = False) -> bytes:
    """Minimal valid Word 6.0/95 binary (the pre-97 layout old corpora
    still carry): a wIdent 0xA5DC FIB with fcMin/fcMac bracketing
    contiguous cp1252 text in the WordDocument stream — no CLX, no
    table stream.  ``\\n`` is stored as Word's ``\\r`` paragraph mark.

    ``fast_save=True`` writes the fComplex layout a quick-saved Word
    6/95 file has: the LOGICAL text split into pieces stored OUT of
    order in the stream with superseded (stale) bytes between them,
    mapped back together by a CLX piece table at FIB pair 33 (fcClx @
    0x160).  A contiguous fcMin..fcMac read of such a file returns the
    stale interleaving — only the piece walk recovers the document."""
    from .cfb import CfbWriter

    stored = text.replace("\n", "\r").encode("cp1252", "replace")
    fc_min = 0x300
    if not fast_save:
        wd = bytearray(fc_min + len(stored))
        struct.pack_into("<H", wd, 0, 0xA5DC)
        struct.pack_into("<H", wd, 2, 101)          # nFib, Word 6.0
        struct.pack_into("<II", wd, 0x18, fc_min, fc_min + len(stored))
        wd[fc_min:] = stored
        w = CfbWriter()
        w.add("WordDocument", bytes(wd))
        return w.tobytes()

    # fast save: two pieces (second half stored FIRST), stale bytes
    # from the "previous save" between them
    cut = len(stored) // 2
    p1, p2 = stored[:cut], stored[cut:]
    stale = b"STALE SUPERSEDED TEXT. "
    fc_p2 = fc_min
    fc_stale = fc_p2 + len(p2)
    fc_p1 = fc_stale + len(stale)
    fc_mac = fc_p1 + len(p1)
    body = p2 + stale + p1
    # CLX: one Prc chunk (real fast saves carry property updates; the
    # walker must skip it) + Pcdt/PlcPcd mapping the two pieces
    pieces = [(0, len(p1), fc_p1), (len(p1), len(stored), fc_p2)]
    if not p1 and not p2:
        pieces = [(0, 0, fc_min)]
    cps = struct.pack(
        f"<{len(pieces) + 1}I",
        *[p[0] for p in pieces], pieces[-1][1],
    )
    pcds = b"".join(struct.pack("<HIH", 0, fc, 0) for _a, _b, fc in pieces)
    plc = cps + pcds
    prc = b"\x01" + struct.pack("<h", 4) + b"\x00\x00\x00\x00"
    clx = prc + b"\x02" + struct.pack("<I", len(plc)) + plc
    fc_clx = fc_mac
    wd = bytearray(fc_min)
    struct.pack_into("<H", wd, 0, 0xA5DC)
    struct.pack_into("<H", wd, 2, 101)
    struct.pack_into("<H", wd, 0x0A, 0x0004)        # fComplex
    struct.pack_into("<II", wd, 0x18, fc_min, fc_mac)
    struct.pack_into("<II", wd, 0x160, fc_clx, len(clx))
    w = CfbWriter()
    w.add("WordDocument", bytes(wd) + body + clx)
    return w.tobytes()


# -- XLSX ---------------------------------------------------------------------
# SpreadsheetML (ISO/IEC 29500): worksheets are XML grids of <c> cells;
# string cells point into xl/sharedStrings.xml <si> entries (possibly
# split into <r> runs), inline strings carry <is><t>, other cells keep
# their <v> lexical value.  Linearization is the tabular.py contract:
# one line per row, cell values tab-joined — the text face a
# training-data pipeline wants from a spreadsheet.

# Every pattern lists its SELF-CLOSING alternative FIRST: with the
# open-tag alternative first, `[^>]*` swallows the '/' of an
# attribute-bearing self-closing element (`<c r="A1" s="1"/>`, as
# Excel routinely writes for styled empty cells) and the lazy body
# then consumes the FOLLOWING element — silent cell/paragraph merging.
_XLSX_SI = re.compile(r"<si/>|<si>(.*?)</si>", re.S)
_XLSX_T = re.compile(r"<t(?:\s[^>]*)?/>|<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_XLSX_ROW = re.compile(
    r"<row(?:\s[^>]*)?/>|<row(?:\s[^>]*)?>(.*?)</row>", re.S
)
_XLSX_CELL = re.compile(
    r"<c(\s[^>]*)?/>|<c(\s[^>]*)?>(.*?)</c>", re.S
)
_XLSX_V = re.compile(r"<v(?:\s[^>]*)?>(.*?)</v>", re.S)
_SHEET_NUM = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")


def is_xlsx(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            return "xl/workbook.xml" in z.namelist()
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def xlsx_to_text(b: bytes) -> str:
    """SpreadsheetML -> text: rows newline-joined, cells tab-joined,
    shared/inline strings resolved, numeric/other cells by their
    lexical <v>.  Sheets concatenate in NUMERIC member order (sheet10
    after sheet2, the pptx slide rule) with a blank line between."""
    with _zip_of(b) as z:
        names = z.namelist()
        if "xl/workbook.xml" not in names:
            raise OfficeDocError("missing xl/workbook.xml")
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sst = _read_member(z, "xl/sharedStrings.xml")
            for si in _XLSX_SI.finditer(sst):
                shared.append(
                    _unescape(
                        "".join(
                            t.group(1)
                            for t in _XLSX_T.finditer(si.group(1) or "")
                            if t.group(1) is not None
                        )
                    )
                )
        sheets = sorted(
            (
                (int(m.group(1)), n) if m else (1 << 30, n)
                for n in names
                if n.startswith("xl/worksheets/") and n.endswith(".xml")
                for m in (_SHEET_NUM.match(n),)
            ),
        )
        out_sheets = []
        for _num, name in sheets:
            xml = _read_member(z, name)
            lines = []
            for row in _XLSX_ROW.finditer(xml):
                cells = []
                for c in _XLSX_CELL.finditer(row.group(1) or ""):
                    attrs = dict(
                        _ATTR.findall(c.group(1) or c.group(2) or "")
                    )
                    body = c.group(3) or ""
                    ctype = attrs.get("t", "n")
                    if ctype == "s":
                        v = _XLSX_V.search(body)
                        idx = int(v.group(1)) if v else -1
                        cells.append(
                            shared[idx] if 0 <= idx < len(shared) else ""
                        )
                    elif ctype == "inlineStr":
                        cells.append(
                            _unescape(
                                "".join(
                                    t.group(1)
                                    for t in _XLSX_T.finditer(body)
                                    if t.group(1) is not None
                                )
                            )
                        )
                    else:  # n / str / b / e: lexical value
                        v = _XLSX_V.search(body)
                        cells.append(_unescape(v.group(1)) if v else "")
                lines.append("\t".join(cells))
            out_sheets.append("\n".join(lines))
    return "\n\n".join(out_sheets)


def build_xlsx(rows: list[list[str]]) -> bytes:
    """Minimal valid XLSX: workbook + one sheet; every cell written as
    a shared string (deduplicated), so arbitrary cell text (minus
    tab/newline, the linearization separators) round-trips exactly."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    rows_xml = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{chr(65 + ci)}{ri}" t="s"><v>{sref(cell)}</v></c>'
            for ci, cell in enumerate(row)
        )
        rows_xml.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0"?>'
        f'<sst count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{xml_escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    workbook = (
        '<?xml version="1.0"?>'
        '<workbook><sheets><sheet name="s1" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


# -- RTF ----------------------------------------------------------------------
# Rich Text Format (public Microsoft RTF 1.9.1 spec): a control-word
# token stream over nested {} groups.  Text extraction walks the
# tokens: \par/\line -> newline, \tab -> tab, \'hh -> cp1252 byte,
# \uN -> unicode scalar (consuming the following fallback per \ucN),
# destination groups (\fonttbl, \colortbl, \stylesheet, \info, \pict,
# \*\...) are skipped whole.

_RTF_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "annotation", "field", "themedata",
    "colorschememapping", "latentstyles", "datastore", "generator",
    "xmlnstbl", "listtable", "listoverridetable", "rsidtbl",
}
_RTF_NEWLINES = {"par", "line", "row"}
_RTF_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})|\\([a-zA-Z]+)(-?\d+)? ?|\\([^a-zA-Z])|([{}])",
)


def is_rtf(b: bytes) -> bool:
    return b[:5] == b"{\\rtf"


@guard(OfficeDocError)
def rtf_to_text(b: bytes) -> str:
    """RTF -> plain text (control-word walk, destination groups
    skipped, \\uN unicode with \\ucN fallback skipping)."""
    if not is_rtf(b):
        raise OfficeDocError("not an RTF payload")
    out: list[str] = []
    pos = 0
    depth = 0
    skip_until_depth: int | None = None  # inside a destination group
    uc_stack = [1]  # \ucN fallback-byte count per group depth
    pending_uc_skip = 0
    n = len(b)
    while pos < n:
        m = _RTF_TOKEN.match(b, pos)
        if m is None:
            ch = b[pos:pos + 1]
            pos += 1
            if ch in (b"\r", b"\n", b"\x00"):
                continue
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
                continue
            if skip_until_depth is None:
                out.append(ch.decode("cp1252", "replace"))
            continue
        pos = m.end()
        hexbyte, word, num, esc, brace = m.groups()
        if brace == b"{":
            depth += 1
            uc_stack.append(uc_stack[-1])
            continue
        if brace == b"}":
            depth -= 1
            if len(uc_stack) > 1:
                uc_stack.pop()
            if skip_until_depth is not None and depth < skip_until_depth:
                skip_until_depth = None
            continue
        if skip_until_depth is not None:
            continue
        if hexbyte is not None:
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            else:
                out.append(
                    bytes([int(hexbyte, 16)]).decode("cp1252", "replace")
                )
            continue
        if esc is not None:
            if esc in (b"\\", b"{", b"}"):
                out.append(esc.decode("ascii"))
            elif esc == b"~":
                out.append("\u00a0")  # non-breaking space
            elif esc == b"*":
                # \* marks an unknown destination: skip the group
                skip_until_depth = depth
            continue
        w = word.decode("ascii")
        if w in _RTF_DESTINATIONS:
            skip_until_depth = depth
        elif w in _RTF_NEWLINES:
            out.append("\n")
        elif w == "tab":
            out.append("\t")
        elif w == "uc" and num is not None:
            uc_stack[-1] = int(num)
        elif w == "u" and num is not None:
            cp = int(num)
            if cp < 0:
                cp += 65536
            out.append(chr(cp))
            pending_uc_skip = uc_stack[-1]
        # every other control word is formatting: ignored
    return "".join(out)


def build_rtf(paragraphs: list[str]) -> bytes:
    """Minimal RTF writer: ASCII passes through (specials escaped),
    non-ASCII as \\uN with a '?' fallback, tabs/newlines as control
    words.  Round-trips exactly through ``rtf_to_text``."""
    parts = ["{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times;}}\\uc1 "]
    first = True
    for p in paragraphs:
        if not first:
            parts.append("\\par ")
        first = False
        for ch in p:
            if ch in "\\{}":
                parts.append("\\" + ch)
            elif ch == "\t":
                parts.append("\\tab ")
            elif ch == "\n":
                parts.append("\\line ")
            elif ord(ch) < 128:
                parts.append(ch)
            else:
                cp = ord(ch)
                if cp > 65535:
                    parts.append("?")  # outside the \u range
                else:
                    if cp > 32767:
                        cp -= 65536
                    parts.append(f"\\u{cp}?")
    parts.append("}")
    return "".join(parts).encode("ascii")


# -- EPUB ---------------------------------------------------------------------

_ROOTFILE = re.compile(r'<rootfile[^>]*full-path="([^"]+)"', re.S)
_MANIFEST_ITEM = re.compile(r"<item\s[^>]*>", re.S)
_ATTR = re.compile(r'([\w:-]+)="([^"]*)"')
_SPINE_REF = re.compile(r'<itemref[^>]*idref="([^"]+)"', re.S)
_TAG = re.compile(r"<[^>]+>")
_BLOCK_CLOSE = re.compile(
    r"</(?:p|div|h[1-6]|li|tr|section|article|blockquote|title)\s*>|<br\s*/?>",
    re.I,
)
_DROP = re.compile(
    r"<(script|style|head)\b.*?</\1\s*>|<!--.*?-->|<\?.*?\?>"
    r"|<!\[CDATA\[.*?\]\]>",
    re.S | re.I,
)


def _xhtml_text(xhtml: str) -> str:
    """Chapter XHTML -> text: drop script/style/comments, block closes
    become newlines, tags vanish, entities decode, blank runs collapse."""
    s = _DROP.sub(" ", xhtml)
    s = _BLOCK_CLOSE.sub("\n", s)
    s = _TAG.sub(" ", s)
    s = _unescape(s)
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def is_epub(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            names = set(z.namelist())
            if "META-INF/container.xml" not in names:
                return False
            if "mimetype" in names:
                head = _member_head(z, "mimetype", 256)
                return (
                    head is not None
                    and head.strip() == b"application/epub+zip"
                )
            return True
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def epub_to_text(b: bytes) -> str:
    """OCF walk: container.xml -> OPF -> spine reading order ->
    stripped chapter texts joined by blank lines."""
    with _zip_of(b) as z:
        container = _read_member(z, "META-INF/container.xml")
        m = _ROOTFILE.search(container)
        if not m:
            raise OfficeDocError("container.xml has no rootfile")
        opf_path = m.group(1)
        opf = _read_member(z, opf_path)
        opf_dir = posixpath.dirname(opf_path)
        hrefs: dict[str, str] = {}
        for item in _MANIFEST_ITEM.finditer(opf):
            attrs = dict(_ATTR.findall(item.group(0)))
            if "id" in attrs and "href" in attrs:
                hrefs[attrs["id"]] = attrs["href"]
        chapters = []
        for ref in _SPINE_REF.finditer(opf):
            href = hrefs.get(ref.group(1))
            if href is None:
                continue
            path = posixpath.normpath(posixpath.join(opf_dir, href))
            chapters.append(_xhtml_text(_read_member(z, path)))
        if not chapters:
            raise OfficeDocError("empty spine")
    return "\n\n".join(chapters)


def build_epub(chapters: list[str], title: str = "t") -> bytes:
    """Minimal valid EPUB: mimetype (stored), container.xml, OPF with a
    spine over one XHTML file per chapter (escaped ``<p>`` bodies).
    Round-trips exactly through ``epub_to_text``."""
    manifest = "".join(
        f'<item id="c{i}" href="c{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(
        f'<itemref idref="c{i}"/>' for i in range(len(chapters))
    )
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid"><metadata xmlns:dc="http://purl.org/dc/'
        f'elements/1.1/"><dc:identifier id="uid">x</dc:identifier>'
        f"<dc:title>{xml_escape(title)}</dc:title></metadata>"
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
        'xmlns:container"><rootfiles><rootfile full-path="OEBPS/content.opf"'
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "mimetype", "application/epub+zip", zipfile.ZIP_STORED
        )
        z.writestr("META-INF/container.xml", container)
        z.writestr("OEBPS/content.opf", opf)
        for i, ch in enumerate(chapters):
            z.writestr(
                f"OEBPS/c{i}.xhtml",
                '<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/'
                f'xhtml"><head><title>c{i}</title></head><body>'
                f"<p>{xml_escape(ch)}</p></body></html>",
            )
    return buf.getvalue()


# -- PPTX ---------------------------------------------------------------------
# PresentationML (ISO/IEC 29500): slide text lives in DrawingML
# ``<a:p>`` paragraphs of ``<a:t>`` runs inside shape text bodies; a
# ``<a:br/>`` is an intra-paragraph line break.  Slides are members
# ``ppt/slides/slideN.xml`` ordered by N (the presentation.xml sldIdLst
# references them in that order for files PowerPoint writes).  The
# reference (SummaryDev/evm-archive) has no document surface; this
# extends the training-pipeline extraction lane alongside docx/odt.

# self-closing alternatives FIRST (the _T_P rule): attribute-bearing
# empty elements must not parse as open tags
_PPTX_P = re.compile(
    r"<a:p(?:\s[^>]*)?/>|<a:p(?:\s[^>]*)?>(.*?)</a:p>", re.S
)
_PPTX_RUN = re.compile(
    r"<a:t(?:\s[^>]*)?/>|<a:t(?:\s[^>]*)?>(.*?)</a:t>|<a:br\s*/>", re.S
)
_SLIDE_NUM = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def is_pptx(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            return "ppt/presentation.xml" in z.namelist()
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def pptx_to_text(b: bytes) -> str:
    """PresentationML -> plain text: per slide one line per ``<a:p>``
    paragraph (run bodies concatenated, ``<a:br/>`` a newline); slides
    in numeric member order, joined by a blank line."""
    with _zip_of(b) as z:
        names = z.namelist()
        if "ppt/presentation.xml" not in names:
            raise OfficeDocError("missing ppt/presentation.xml")
        slides = sorted(
            (int(m.group(1)), n)
            for n in names
            for m in (_SLIDE_NUM.match(n),)
            if m
        )
        out_slides = []
        for _num, name in slides:
            xml = _read_member(z, name)
            paras = []
            for pm in _PPTX_P.finditer(xml):
                body = pm.group(1) or ""
                parts = []
                for rm in _PPTX_RUN.finditer(body):
                    if rm.group(1) is not None:
                        parts.append(_unescape(rm.group(1)))
                    elif rm.group(0).startswith("<a:br"):
                        parts.append("\n")
                    # else: self-closing empty <a:t/> run — no text
                paras.append("".join(parts))
            out_slides.append("\n".join(paras))
    return "\n\n".join(out_slides)


def build_pptx(slides: list[list[str]]) -> bytes:
    """Minimal valid PPTX: presentation.xml + one slideN.xml per slide,
    each paragraph an escaped ``<a:t>`` run.  Round-trips exactly
    through ``pptx_to_text`` for text free of the slide separator."""
    buf = io.BytesIO()
    pres = (
        '<?xml version="1.0"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main"><p:sldIdLst>'
        + "".join(
            f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
            for i in range(len(slides))
        )
        + "</p:sldIdLst></p:presentation>"
    )
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("ppt/presentation.xml", pres)
        for i, paras in enumerate(slides, start=1):
            body = "".join(
                f"<a:p><a:r><a:t>{xml_escape(p)}</a:t></a:r></a:p>"
                for p in paras
            )
            z.writestr(
                f"ppt/slides/slide{i}.xml",
                '<?xml version="1.0"?>'
                '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
                'presentationml/2006/main" xmlns:a="http://schemas.'
                'openxmlformats.org/drawingml/2006/main">'
                "<p:cSld><p:spTree><p:sp><p:txBody>"
                + body
                + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()


# -- ODS ----------------------------------------------------------------------
# OpenDocument spreadsheet (OASIS ODF): content.xml holds
# ``<table:table-row>`` rows of ``<table:table-cell>`` cells whose text
# is ``<text:p>`` paragraphs (same whitespace element encoding as ODT);
# ``table:number-columns-repeated`` fans one cell element out to N
# columns.  Linearization is the xlsx/tabular contract: cells
# tab-joined, rows newline-joined, tables joined by a blank line.

_ODS_MIME = b"application/vnd.oasis.opendocument.spreadsheet"
_ODS_TABLE = re.compile(
    r"<table:table(?:\s[^>]*)?/>"
    r"|<table:table(?:\s[^>]*)?>(.*?)</table:table>",
    re.S,
)
_ODS_ROW = re.compile(
    r"<table:table-row(?:\s[^>]*)?/>"
    r"|<table:table-row(?:\s[^>]*)?>(.*?)</table:table-row>",
    re.S,
)
_ODS_CELL = re.compile(
    r"<table:table-cell(\s[^>]*)?/>"
    r"|<table:table-cell(\s[^>]*)?>(.*?)</table:table-cell>",
    re.S,
)
_MAX_ODS_REPEAT = 4096  # column-repeat fan-out cap (sheet-filler bombs)


def is_ods(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            names = set(z.namelist())
            if "content.xml" not in names:
                return False
            if "mimetype" in names:
                head = _member_head(z, "mimetype", 256)
                return head is not None and head.strip() == _ODS_MIME
            body = _member_head(z, "content.xml", MAX_XML_BYTES)
            return body is not None and b"office:spreadsheet" in body
    except zipfile.BadZipFile:
        return False


def _odf_para_text(body: str) -> str:
    """Shared ODT/ODS paragraph-body decoding: whitespace elements,
    nested-span tag removal, entity decode."""
    body = _T_SPECIAL.sub(
        lambda m: (
            "\t"
            if m.group(0).startswith("<text:tab")
            else "\n"
            if m.group(0).startswith("<text:line-break")
            else " " * int(m.group(1) or 1)
        ),
        body,
    )
    return _unescape(_TAG.sub("", body))


@guard(OfficeDocError)
def ods_to_text(b: bytes) -> str:
    """OpenDocument spreadsheet -> text: cell paragraphs newline-joined
    within the cell, cells tab-joined, rows newline-joined, tables
    joined by a blank line; column repeats expanded (capped)."""
    with _zip_of(b) as z:
        xml = _read_member(z, "content.xml")
    tables = []
    for tm in _ODS_TABLE.finditer(xml):
        lines = []
        for rm in _ODS_ROW.finditer(tm.group(1) or ""):
            cells: list[str] = []
            for cm in _ODS_CELL.finditer(rm.group(1) or ""):
                attrs = dict(
                    _ATTR.findall(cm.group(1) or cm.group(2) or "")
                )
                body = cm.group(3) or ""
                text = "\n".join(
                    _odf_para_text(pm.group(2) or "")
                    for pm in _T_P.finditer(body)
                )
                rep = int(attrs.get("table:number-columns-repeated", "1"))
                if rep > _MAX_ODS_REPEAT:
                    raise OfficeDocError(
                        f"column repeat {rep} over cap {_MAX_ODS_REPEAT}"
                    )
                cells.extend([text] * max(rep, 1))
            lines.append("\t".join(cells))
        tables.append("\n".join(lines))
    return "\n\n".join(tables)


def build_ods(rows: list[list[str]]) -> bytes:
    """Minimal valid ODS: mimetype + manifest + content.xml with one
    table; cell text whitespace-element-encoded (the build_odt rule), so
    arbitrary cell text minus the tab/newline separators round-trips
    exactly."""
    body = "".join(
        "<table:table-row>"
        + "".join(
            "<table:table-cell><text:p>"
            f"{_odf_encode(c)}</text:p></table:table-cell>"
            for c in row
        )
        + "</table:table-row>"
        for row in rows
    )
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:table="urn:oasis:names:tc:'
        'opendocument:xmlns:table:1.0" xmlns:text="urn:oasis:names:tc:'
        'opendocument:xmlns:text:1.0"><office:body><office:spreadsheet>'
        '<table:table table:name="s1">'
        + body
        + "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        f'"{_ODS_MIME.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", _ODS_MIME, zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", manifest)
        z.writestr("content.xml", content)
    return buf.getvalue()


# -- legacy .xls ([MS-XLS] BIFF8 over CFB/OLE2) ---------------------------------
# Excel 97-2003 binary: the Workbook stream is a sequence of BIFF
# records (opcode u16, length u16, payload).  The globals substream
# carries the SST shared-string table (XLUnicodeRichExtendedString
# entries, possibly spanning Continue records with a fresh option byte
# at each fragment boundary); each worksheet substream carries cell
# records — LabelSst (SST index), Label (inline string), Number (IEEE
# double), RK (packed 30-bit), MulRk (a run of RKs).  Linearization is
# the xlsx contract: cells tab-joined in column order, rows
# newline-joined, sheets joined by a blank line.

_BIFF_BOF = 0x0809
_BIFF_EOF = 0x000A
_BIFF_SST = 0x00FC
_BIFF_CONTINUE = 0x003C
_BIFF_LABELSST = 0x00FD
_BIFF_LABEL = 0x0204
_BIFF_NUMBER = 0x0203
_BIFF_RK = 0x027E
_BIFF_MULRK = 0x00BD
_BIFF_RSTRING = 0x00D6        # BIFF5 rich byte string (runs ignored)
_BIFF_FILEPASS = 0x002F       # encryption marker (XOR / RC4)
_BIFF_MAX_DATA = 8224  # max record payload ([MS-XLS] 2.1.4)


def is_xls(b: bytes) -> bool:
    from .cfb import is_cfb

    return is_cfb(b)


def _biff_records(data: bytes):
    i = 0
    while i + 4 <= len(data):
        op, ln = struct.unpack_from("<HH", data, i)
        if i + 4 + ln > len(data):
            raise OfficeDocError("truncated BIFF record")
        yield op, data[i + 4:i + 4 + ln]
        i += 4 + ln


def _rk_number(rk: int) -> float:
    v = rk >> 2
    if rk & 2:                                 # 30-bit signed integer
        x = float(v - (1 << 30) if v & (1 << 29) else v)
    else:                                      # high 30 bits of a double
        x = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return x / 100 if rk & 1 else x


def _xls_num(x: float) -> str:
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _sst_strings(frags: list[bytes], unique: int) -> list[str]:
    """Decode ``unique`` XLUnicodeRichExtendedString entries from an SST
    payload plus its Continue fragments.  A string whose character data
    crosses a fragment boundary restarts with a fresh option byte
    ([MS-XLS] 2.5.293)."""
    fi, off = 0, 8                              # skip cstTotal/cstUnique
    out: list[str] = []

    def _avail() -> int:
        return len(frags[fi]) - off

    def _advance():
        nonlocal fi, off
        fi += 1
        off = 0
        if fi >= len(frags):
            raise OfficeDocError("SST truncated (missing Continue)")

    for _ in range(unique):
        while _avail() == 0:
            _advance()
        if _avail() < 3:
            raise OfficeDocError("SST string header split across records")
        cch, flags = struct.unpack_from("<HB", frags[fi], off)
        off += 3
        high = flags & 0x01
        crun = cbext = 0
        if flags & 0x08:
            (crun,) = struct.unpack_from("<H", frags[fi], off)
            off += 2
        if flags & 0x04:
            (cbext,) = struct.unpack_from("<i", frags[fi], off)
            off += 4
        chars: list[str] = []
        remaining = cch
        while remaining:
            if _avail() == 0:
                _advance()
                high = frags[fi][off] & 0x01    # fresh option byte
                off += 1
            width = 2 if high else 1
            n = min(remaining, _avail() // width)
            if n == 0:
                raise OfficeDocError("SST char split mid-code-unit")
            raw = frags[fi][off:off + n * width]
            off += n * width
            chars.append(
                raw.decode("utf-16-le" if high else "latin-1", "replace")
            )
            remaining -= n
        skip = crun * 4 + max(cbext, 0)
        while skip:
            if _avail() == 0:
                _advance()
            k = min(skip, _avail())
            off += k
            skip -= k
        out.append("".join(chars))
    return out


@guard(OfficeDocError)
def xls_to_text(b: bytes) -> str:
    """Excel binary -> linearized text via the BIFF record walk:
    BIFF8 (Excel 97-2003, SST shared strings) and BIFF5 (Excel 5.0/95,
    SST-less — LABEL/RSTRING byte strings inline, decoded latin-1;
    the workbook CODEPAGE is out of the fixture scope).  Older BIFF
    streams (2-4) are a typed boundary."""
    return _xls_text_from_cfb(_parse_cfb_typed(b))


@guard(OfficeDocError)
def _xls_text_from_cfb(cf) -> str:
    name = next(
        (n for n in ("Workbook", "Book") if n in cf.streams), None
    )
    if name is None:
        raise OfficeDocError("no Workbook stream (not a .xls)")
    data = cf.stream(name)
    recs = list(_biff_records(data))
    if not recs or recs[0][0] != _BIFF_BOF:
        raise OfficeDocError("Workbook stream does not start with BOF")
    (vers,) = struct.unpack_from("<H", recs[0][1], 0)
    if vers not in (0x0600, 0x0500):
        raise OfficeDocError(f"unsupported BIFF version 0x{vers:04X}")
    biff5 = vers == 0x0500

    # SST from the globals substream (with its Continue fragments)
    shared: list[str] = []
    i = 0
    while i < len(recs) and not (
        recs[i][0] == _BIFF_BOF and i > 0
    ):
        op, payload = recs[i]
        if op == _BIFF_FILEPASS:
            # encrypted workbook (XOR or RC4): the cell records are
            # ciphertext — emitting them as text would corrupt a corpus
            raise OfficeDocError("encrypted .xls is out of scope")
        if op == _BIFF_SST:
            frags = [payload]
            j = i + 1
            while j < len(recs) and recs[j][0] == _BIFF_CONTINUE:
                frags.append(recs[j][1])
                j += 1
            (_total, unique) = struct.unpack_from("<II", payload, 0)
            shared = _sst_strings(frags, unique)
            i = j
            continue
        i += 1

    # worksheet substreams: collect (row, col) -> text per sheet
    sheets: list[dict[tuple[int, int], str]] = []
    cells: dict[tuple[int, int], str] | None = None
    for k in range(i, len(recs)):
        op, p = recs[k]
        if op == _BIFF_BOF:
            (dt,) = struct.unpack_from("<H", p, 2)
            cells = {} if dt == 0x0010 else None
            if cells is not None:
                sheets.append(cells)
            continue
        if cells is None:
            continue
        if op == _BIFF_LABELSST:
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", p, 0)
            cells[(row, col)] = (
                shared[isst] if 0 <= isst < len(shared) else ""
            )
        elif op == _BIFF_LABEL or (biff5 and op == _BIFF_RSTRING):
            row, col, _ixfe = struct.unpack_from("<HHH", p, 0)
            if biff5:
                # BIFF5 byte string: cch u16 + codepage bytes (no
                # option flags); RSTRING's trailing format runs ignored
                (cch,) = struct.unpack_from("<H", p, 6)
                if 8 + cch > len(p):
                    raise OfficeDocError("BIFF5 label overruns record")
                cells[(row, col)] = p[8:8 + cch].decode("latin-1")
            else:
                cells[(row, col)] = _sst_strings(
                    [b"\x00" * 8 + p[6:]], 1
                )[0]
        elif op == _BIFF_NUMBER:
            row, col, _ixfe = struct.unpack_from("<HHH", p, 0)
            (x,) = struct.unpack_from("<d", p, 6)
            cells[(row, col)] = _xls_num(x)
        elif op == _BIFF_RK:
            row, col, _ixfe, rk = struct.unpack_from("<HHHI", p, 0)
            cells[(row, col)] = _xls_num(_rk_number(rk))
        elif op == _BIFF_MULRK:
            row, col0 = struct.unpack_from("<HH", p, 0)
            (col_last,) = struct.unpack_from("<H", p, len(p) - 2)
            for ci in range(col_last - col0 + 1):
                (rk,) = struct.unpack_from("<I", p, 4 + ci * 6 + 2)
                cells[(row, col0 + ci)] = _xls_num(_rk_number(rk))

    out_sheets = []
    for cells in sheets:
        by_row: dict[int, dict[int, str]] = {}
        for (r, c), text in cells.items():
            by_row.setdefault(r, {})[c] = text
        lines = []
        for r in sorted(by_row):
            row_cells = by_row[r]
            lines.append(
                "\t".join(row_cells[c] for c in sorted(row_cells)))
        out_sheets.append("\n".join(lines))
    return "\n\n".join(out_sheets)


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def build_xls(rows: list[list[str]], sheet: str = "Sheet1") -> bytes:
    """Minimal valid Excel 97 binary: a CFB container whose Workbook
    stream holds a globals substream (BOF, BoundSheet8, SST) and one
    worksheet substream of LabelSst cells.  Every cell is a deduplicated
    UTF-16 shared string, split across Continue records at string
    boundaries when the SST overflows one record — so arbitrary cell
    text (minus the tab/newline separators) round-trips exactly."""
    from .cfb import CfbWriter

    strings: list[str] = []
    index: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    cell_recs = b"".join(
        _rec(
            _BIFF_LABELSST,
            struct.pack("<HHHI", ri, ci, 0, sref(cell)),
        )
        for ri, row in enumerate(rows)
        for ci, cell in enumerate(row)
    )
    total = sum(len(r) for r in rows)

    # SST payload: greedy packing, Continue split at string boundaries
    encoded = []
    for s in strings:
        raw = s.encode("utf-16-le")
        enc = struct.pack("<HB", len(s), 0x01) + raw
        if len(enc) > _BIFF_MAX_DATA - 8:
            raise OfficeDocError("cell string too long for one SST record")
        encoded.append(enc)
    first = struct.pack("<II", total, len(strings))
    conts: list[bytes] = []
    cur = bytearray(first)
    for enc in encoded:
        limit = _BIFF_MAX_DATA
        if len(cur) + len(enc) > limit:
            conts.append(bytes(cur))
            cur = bytearray()
        cur += enc
    conts.append(bytes(cur))
    sst = _rec(_BIFF_SST, conts[0]) + b"".join(
        _rec(_BIFF_CONTINUE, c) for c in conts[1:]
    )

    bof_globals = _rec(
        _BIFF_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)
    )
    bof_sheet = _rec(
        _BIFF_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)
    )
    eof = _rec(_BIFF_EOF, b"")
    nm = sheet.encode("latin-1")
    bsheet = _rec(
        0x0085,
        struct.pack("<IHBB", 0, 0, len(nm), 0) + nm,
    )
    globals_sub = bof_globals + bsheet + sst + eof
    # patch BoundSheet8.lbPlyPos = offset of the sheet BOF
    off = len(globals_sub)
    globals_sub = bytearray(globals_sub)
    struct.pack_into("<I", globals_sub, len(bof_globals) + 4, off)
    stream = bytes(globals_sub) + bof_sheet + cell_recs + eof
    w = CfbWriter()
    w.add("Workbook", stream)
    return w.tobytes()


def build_xls_biff5(rows: list[list[str]], sheet: str = "Sheet1") -> bytes:
    """Minimal valid Excel 5.0/95 workbook (BIFF5, the pre-97 SST-less
    path old corpora still carry): a CFB container whose ``Book``
    stream holds a globals substream (BOF vers 0x0500, BoundSheet with
    the BIFF5 byte-string name) and one worksheet substream of inline
    LABEL byte-string cells.  latin-1-safe text (minus the tab/newline
    separators) round-trips exactly."""
    from .cfb import CfbWriter

    cell_recs = b""
    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            enc = cell.encode("latin-1", "replace")
            if len(enc) > 255:
                raise OfficeDocError("BIFF5 cell string too long")
            cell_recs += _rec(
                _BIFF_LABEL,
                struct.pack("<HHHH", ri, ci, 0, len(enc)) + enc,
            )
    bof_globals = _rec(_BIFF_BOF, struct.pack("<HHHH", 0x0500, 0x0005, 0, 0))
    bof_sheet = _rec(_BIFF_BOF, struct.pack("<HHHH", 0x0500, 0x0010, 0, 0))
    eof = _rec(_BIFF_EOF, b"")
    nm = sheet.encode("latin-1")[:31]
    bsheet = _rec(0x0085, struct.pack("<IHB", 0, 0, len(nm)) + nm)
    globals_sub = bytearray(bof_globals + bsheet + eof)
    # patch BoundSheet.lbPlyPos = offset of the sheet BOF
    struct.pack_into("<I", globals_sub, len(bof_globals) + 4,
                     len(globals_sub))
    stream = bytes(globals_sub) + bof_sheet + cell_recs + eof
    w = CfbWriter()
    w.add("Book", stream)                 # Excel 5/95 stream name
    return w.tobytes()


def cfb_to_text(b: bytes) -> tuple[str, str]:
    """Dispatch a CFB/OLE2 payload on its streams with ONE container
    parse: ``WordDocument`` -> .doc piece walk, ``Workbook``/``Book`` ->
    .xls BIFF walk, ``PowerPoint Document`` -> .ppt record walk.
    Returns ``(format, text)``."""
    cf = _parse_cfb_typed(b)
    if "WordDocument" in cf.streams:
        return "doc", _doc_text_from_cfb(cf)
    if "Workbook" in cf.streams or "Book" in cf.streams:
        return "xls", _xls_text_from_cfb(cf)
    if "PowerPoint Document" in cf.streams:
        return "ppt", _ppt_text_from_cfb(cf)
    raise OfficeDocError("CFB container with no Office stream")


# -- ODP ----------------------------------------------------------------------
# OpenDocument presentation (OASIS ODF): content.xml holds
# ``<draw:page>`` slides whose text sits in ``<text:p>`` paragraphs
# (inside draw frames/text boxes — the paragraph walk is the shared ODT
# one, tags between paragraphs and character data vanish).  Pages join
# with a blank line, the pptx contract.

_ODP_MIME = b"application/vnd.oasis.opendocument.presentation"
_ODP_PAGE = re.compile(
    r"<draw:page(?:\s[^>]*)?/>"
    r"|<draw:page(?:\s[^>]*)?>(.*?)</draw:page>",
    re.S,
)


def is_odp(b: bytes) -> bool:
    if b[:4] != _ZIP_MAGIC:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            names = set(z.namelist())
            if "content.xml" not in names:
                return False
            if "mimetype" in names:
                head = _member_head(z, "mimetype", 256)
                return head is not None and head.strip() == _ODP_MIME
            body = _member_head(z, "content.xml", MAX_XML_BYTES)
            return body is not None and b"office:presentation" in body
    except zipfile.BadZipFile:
        return False


@guard(OfficeDocError)
def odp_to_text(b: bytes) -> str:
    """OpenDocument presentation -> text: per ``<draw:page>`` one line
    per ``<text:p>``/``<text:h>`` paragraph; pages joined by a blank
    line."""
    with _zip_of(b) as z:
        xml = _read_member(z, "content.xml")
    pages = []
    for gm in _ODP_PAGE.finditer(xml):
        paras = [
            _odf_para_text(pm.group(2) or "")
            for pm in _T_P.finditer(gm.group(1) or "")
        ]
        pages.append("\n".join(paras))
    return "\n\n".join(pages)


def build_odp(pages: list[list[str]]) -> bytes:
    """Minimal valid ODP: mimetype + manifest + content.xml with one
    ``<draw:page>`` per slide, paragraphs whitespace-element-encoded
    for exact round trips."""
    body = "".join(
        f'<draw:page draw:name="page{i}"><draw:frame><draw:text-box>'
        + "".join(f"<text:p>{_odf_encode(p)}</text:p>" for p in paras)
        + "</draw:text-box></draw:frame></draw:page>"
        for i, paras in enumerate(pages, start=1)
    )
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:draw="urn:oasis:names:tc:'
        'opendocument:xmlns:drawing:1.0" xmlns:text="urn:oasis:names:tc:'
        'opendocument:xmlns:text:1.0"><office:body><office:presentation>'
        + body
        + "</office:presentation></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?>'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        f'"{_ODP_MIME.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", _ODP_MIME, zipfile.ZIP_STORED)
        z.writestr("META-INF/manifest.xml", manifest)
        z.writestr("content.xml", content)
    return buf.getvalue()


# -- unified ZIP dispatch -------------------------------------------------------
# document_extract's sniff path used to open the same ZipFile up to
# seven times (one per is_* probe).  At corpus scale the container
# should be opened ONCE and dispatched on its member names / mimetype
# member — the cfb_to_text rule applied to the ZIP family.

_EPUB_MIME = b"application/epub+zip"


def zip_to_text(b: bytes) -> tuple[str, str]:
    """Dispatch a ZIP payload on its members with ONE container open:
    OOXML by part name (word/ -> docx, xl/ -> xlsx, ppt/ -> pptx), ODF
    and EPUB by their ``mimetype`` member (ODF content sniffed when the
    member is absent), OCF ``container.xml`` -> epub.  Returns
    ``(format, text)``; raises ``OfficeDocError`` for a ZIP that is
    none of these."""
    with _zip_of(b) as z:
        names = set(z.namelist())
        mimetype = None
        if "mimetype" in names:
            head = _member_head(z, "mimetype", 256)
            if head is None:
                raise OfficeDocError("bad mimetype member")
            mimetype = head.strip()
    if "word/document.xml" in names:
        return "docx", docx_to_text(b)
    if "xl/workbook.xml" in names:
        return "xlsx", xlsx_to_text(b)
    if "ppt/presentation.xml" in names:
        return "pptx", pptx_to_text(b)
    if mimetype == _EPUB_MIME or (
        mimetype is None and "META-INF/container.xml" in names
    ):
        return "epub", epub_to_text(b)
    if "content.xml" in names:
        if mimetype == _ODS_MIME:
            return "ods", ods_to_text(b)
        if mimetype == _ODP_MIME:
            return "odp", odp_to_text(b)
        if mimetype == _ODT_MIME:
            return "odt", odt_to_text(b)
        if mimetype is None:
            if is_ods(b):
                return "ods", ods_to_text(b)
            if is_odp(b):
                return "odp", odp_to_text(b)
            return "odt", odt_to_text(b)
    raise OfficeDocError("ZIP container with no known document layout")


# -- legacy .ppt ([MS-PPT] over CFB/OLE2) ---------------------------------------
# PowerPoint 97-2003 binary: the "PowerPoint Document" stream is a tree
# of 8-byte-headed records (recVer/recInstance u16, recType u16,
# recLen u32); a record whose recVer nibble is 0xF is a CONTAINER of
# child records.  Visible text lives in TextCharsAtom (0x0FA0,
# UTF-16LE) and TextBytesAtom (0x0FA8, "low bytes of UTF-16" = latin-1)
# atoms; PowerPoint stores paragraph breaks as \r and soft line breaks
# as \x0b, both mapped to newlines (the _doc_clean rule).
#
# Incrementally-saved ("fast save") decks append superseded copies of
# edited objects; the LIVE state is reached through the [MS-PPT] §2.1.2
# edit chain: the "Current User" stream's CurrentUserAtom gives
# offsetToCurrentEdit -> newest UserEditAtom -> offsetLastEdit chain of
# prior edits, each edit carrying an offsetPersistDirectory whose
# PersistDirectoryAtom maps persist ids to stream offsets (newer edits
# override older entries).  Only the offsets in the merged directory
# are live; everything else is a superseded remnant.

_PPT_TEXTCHARS = 0x0FA0
_PPT_TEXTBYTES = 0x0FA8
_PPT_USEREDIT = 0x0FF5
_PPT_CURRENTUSER = 0x0FF6
_PPT_PERSISTDIR = 0x1772
_PPT_CU_PLAIN = 0xE391C05F       # CurrentUserAtom.headerToken, plaintext
_PPT_CU_ENCRYPTED = 0xF3D1C4DF   # ... encrypted deck
MAX_PPT_EDITS = 1 << 12          # fast-save chain hop cap
MAX_PPT_PERSIST = 1 << 20        # merged persist-directory size cap


def _ppt_records(b: bytes, s: int, e: int):
    """Yield ``(rec_type, rec_ver, body_start, body_end)`` for the
    records spanning [s, e)."""
    pos = s
    while pos + 8 <= e:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", b, pos)
        body = pos + 8
        if body + rlen > e:
            raise OfficeDocError("PPT record overruns its parent")
        yield rtype, ver_inst & 0x0F, body, body + rlen
        pos = body + rlen


def _ppt_clean(s: str) -> str:
    return (
        s.replace("\r", "\n").replace("\x0b", "\n").rstrip("\x00")
    )


def _ppt_walk_text(b: bytes, s: int, e: int, out: list, depth: int = 0):
    if depth > 32:
        raise OfficeDocError("PPT record nesting over the depth cap")
    for rtype, rver, bs, be in _ppt_records(b, s, e):
        if rver == 0x0F:                       # container
            _ppt_walk_text(b, bs, be, out, depth + 1)
        elif rtype == _PPT_TEXTCHARS:
            out.append(
                _ppt_clean(b[bs:be].decode("utf-16-le", "replace"))
            )
        elif rtype == _PPT_TEXTBYTES:
            out.append(_ppt_clean(b[bs:be].decode("latin-1")))


def _ppt_current_edit(cf) -> int | None:
    """``offsetToCurrentEdit`` from the Current User stream's
    CurrentUserAtom ([MS-PPT] §2.3.2); ``None`` when the stream is
    absent or unresolvable (callers fall back to the whole-stream
    walk).  Encrypted decks are a typed boundary — a whole-stream walk
    over ciphertext would emit garbage as text."""
    if "Current User" not in cf.streams:
        return None
    cu = cf.stream("Current User")
    pos = 0
    while pos + 8 <= len(cu):
        _vi, rtype, rlen = struct.unpack_from("<HHI", cu, pos)
        body = pos + 8
        if body + rlen > len(cu):
            return None
        if rtype == _PPT_CURRENTUSER and rlen >= 12:
            _size, token, off = struct.unpack_from("<III", cu, body)
            if token == _PPT_CU_ENCRYPTED:
                raise OfficeDocError("encrypted .ppt is out of scope")
            return off if token == _PPT_CU_PLAIN else None
        pos = body + rlen
    return None


def _ppt_live_persists(doc: bytes, cur: int) -> list[int] | None:
    """Follow the UserEditAtom chain from the current edit, merging
    PersistDirectoryAtoms oldest-to-newest (newer entries override) ->
    live persist-object stream offsets in persist-id order.  ``None``
    when the chain does not resolve (corrupt or hand-rolled file —
    callers fall back to the whole-stream walk)."""
    dirs: list[int] = []                  # newest edit first
    off = cur
    seen: set[int] = set()
    while off:
        if off in seen or len(dirs) >= MAX_PPT_EDITS:
            return None
        seen.add(off)
        if off + 8 > len(doc):
            return None
        _vi, rtype, rlen = struct.unpack_from("<HHI", doc, off)
        body = off + 8
        if rtype != _PPT_USEREDIT or rlen < 20 or body + rlen > len(doc):
            return None
        (off_last, off_dir) = struct.unpack_from("<II", doc, body + 8)
        dirs.append(off_dir)
        off = off_last
    table: dict[int, int] = {}
    for off_dir in reversed(dirs):        # oldest first, newer override
        if off_dir + 8 > len(doc):
            return None
        _vi, rtype, rlen = struct.unpack_from("<HHI", doc, off_dir)
        pos, end = off_dir + 8, off_dir + 8 + rlen
        if rtype != _PPT_PERSISTDIR or end > len(doc):
            return None
        while pos + 4 <= end:
            (word,) = struct.unpack_from("<I", doc, pos)
            pid, cnt = word & 0xFFFFF, word >> 20
            pos += 4
            if pos + 4 * cnt > end or len(table) + cnt > MAX_PPT_PERSIST:
                return None
            for i in range(cnt):
                (po,) = struct.unpack_from("<I", doc, pos)
                pos += 4
                table[pid + i] = po
    if not table:
        return None
    return [table[k] for k in sorted(table)]


@guard(OfficeDocError)
def _ppt_text_from_cfb(cf) -> str:
    if "PowerPoint Document" not in cf.streams:
        raise OfficeDocError(
            "no PowerPoint Document stream (not a .ppt)"
        )
    doc = cf.stream("PowerPoint Document")
    out: list[str] = []
    cur = _ppt_current_edit(cf)
    offs = _ppt_live_persists(doc, cur) if cur else None
    if offs is None:
        # no resolvable edit chain: single-save or hand-rolled deck —
        # the whole stream IS the live state
        _ppt_walk_text(doc, 0, len(doc), out)
    else:
        for po in offs:
            if po + 8 > len(doc):
                continue                   # stale remnant entry
            _vi, _rt, rlen = struct.unpack_from("<HHI", doc, po)
            if po + 8 + rlen > len(doc):
                continue
            _ppt_walk_text(doc, po, po + 8 + rlen, out)
    return "\n".join(out)


@guard(OfficeDocError)
def ppt_to_text(b: bytes) -> str:
    """PowerPoint 97-2003 binary -> plain text via the record-tree
    walk (one line per text atom; \\r / \\x0b paragraph breaks map to
    newlines).

    Incrementally-saved ("fast save") decks are walked through the
    CurrentUserAtom -> UserEditAtom -> PersistDirectoryAtom live-edit
    chain ([MS-PPT] §2.1.2), so superseded copies of edited text do
    not surface; when the chain is absent or does not resolve the
    whole stream is walked (single-save decks — the overwhelming
    majority at rest — extract identically either way).  Encrypted
    decks raise a typed error."""
    return _ppt_text_from_cfb(_parse_cfb_typed(b))


def _ppt_rec(rtype: int, payload: bytes, ver: int = 0) -> bytes:
    return struct.pack("<HHI", ver & 0x0F, rtype, len(payload)) + payload


def build_ppt(texts: list[str]) -> bytes:
    """Minimal valid PowerPoint 97 binary: a CFB container whose
    PowerPoint Document stream nests each text inside a container
    record — even-indexed texts as UTF-16 TextCharsAtoms, odd-indexed
    as latin-1 TextBytesAtoms (both encodings exercised).  ``\\n`` is
    stored as PowerPoint's ``\\r``, so
    ``ppt_to_text(build_ppt(ts))`` returns ``"\\n".join(ts)`` exactly
    for latin-1-safe odd entries and even entries free of the control
    characters ``_ppt_clean`` folds (``\\x0b`` -> newline, trailing
    NULs stripped)."""
    from .cfb import CfbWriter

    # Document container (0x03E8) > SlideListWithText (0x0FF0) > atoms
    w = CfbWriter()
    w.add("PowerPoint Document", _ppt_doc_container(texts))
    return w.tobytes()


def _ppt_doc_container(texts: list[str]) -> bytes:
    atoms = b""
    for i, t in enumerate(texts):
        stored = t.replace("\n", "\r")
        if i % 2 == 0:
            atoms += _ppt_rec(_PPT_TEXTCHARS, stored.encode("utf-16-le"))
        else:
            atoms += _ppt_rec(
                _PPT_TEXTBYTES, stored.encode("latin-1", "replace")
            )
    return _ppt_rec(0x03E8, _ppt_rec(0x0FF0, atoms, ver=0x0F), ver=0x0F)


def build_ppt_fastsave(edits: list[list[str]]) -> bytes:
    """Simulate PowerPoint's incremental ("fast") save: each edit
    appends a fresh DocumentContainer (persist id 1), a
    PersistDirectoryAtom re-pointing id 1 at it, and a UserEditAtom
    chained to the previous edit via offsetLastEdit; the Current User
    stream's CurrentUserAtom points at the newest UserEditAtom.
    ``ppt_to_text`` must surface only the LAST edit's text — earlier
    edits' containers are superseded remnants a whole-stream walk
    would wrongly include."""
    from .cfb import CfbWriter

    stream = b""
    prev_edit = 0
    cur_edit = 0
    for texts in edits:
        doc_off = len(stream)
        stream += _ppt_doc_container(texts)
        dir_off = len(stream)
        # one entry: persist id 1 (cPersist 1) -> this edit's container
        stream += _ppt_rec(
            _PPT_PERSISTDIR, struct.pack("<II", 1 | (1 << 20), doc_off)
        )
        edit_body = struct.pack(
            "<IHBBIIIIHH",
            256,            # lastSlideIdRef
            0,              # version
            0, 3,           # minorVersion, majorVersion
            prev_edit,      # offsetLastEdit (0 terminates the chain)
            dir_off,        # offsetPersistDirectory
            1,              # docPersistIdRef
            2,              # persistIdSeed
            1, 0,           # lastView, unused
        )
        cur_edit = len(stream)
        stream += _ppt_rec(_PPT_USEREDIT, edit_body)
        prev_edit = cur_edit
    name = b"fixture"
    cu_body = struct.pack(
        "<IIIHHBBH",
        0x14, _PPT_CU_PLAIN, cur_edit,
        len(name), 0x03F4, 3, 0, 0,
    ) + name
    w = CfbWriter()
    w.add("Current User", _ppt_rec(_PPT_CURRENTUSER, cu_body))
    w.add("PowerPoint Document", stream)
    return w.tobytes()
