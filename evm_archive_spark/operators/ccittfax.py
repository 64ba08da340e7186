"""CCITT Group 3 / Group 4 fax codecs (ITU-T T.4 / T.6) — from
scratch, stdlib + numpy.

Scanned-document corpora are dominated by fax-era bilevel TIFFs:
compression 2 (Modified Huffman, byte-aligned rows), 3 (Group 3 —
EOL-delimited rows, 1-D MH or mixed 2-D MR per the T4Options flag)
and 4 (Group 4 — pure 2-D MMR, no EOLs).  All three share the T.4
run-length Huffman alphabet (terminating codes 0-63 per color,
color-specific make-up codes 64-1728, shared extended make-ups
1792-2560) and the 2-D vertical/horizontal/pass mode alphabet; T.6
is the 2-D coder with an imaginary all-white reference line above
row 0 and no EOL resynchronization.

Row representation at the boundary: packed MSB-first bit rows where
bit 0 = a "white" run pixel and bit 1 = "black", exactly the bytes an
uncompressed bilevel TIFF would store — the photometric tag then maps
bits to display values exactly as for compression 1, which is also
libtiff's behavior.

``encode_mh`` / ``encode_g3`` / ``encode_g4`` are the independent
fixture writers (they share only the constant tables with the
decoders, not the walk); pytest cross-pins both directions against
the system libtiff where present.

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea and never decodes; this extends the strict
image lane (tiff.py) to the fax compressions it previously typed as
out of scope.  Placement: per-payload work inside Arrow batches (the
codec boundary).
"""

from __future__ import annotations

import numpy as np

MAX_FAX_PIXELS = 64 * 1024 * 1024


class CcittError(ValueError):
    """Malformed or out-of-scope CCITT fax stream."""


# -- T.4 code tables -----------------------------------------------------------
# (run, bit-length, code-string); the strings keep the table auditable
# against the published T.4 tables 2/3 — they compile to int maps below.

_WHITE_TERM = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"),
    (31, "00011010"), (32, "00011011"), (33, "00010010"),
    (34, "00010011"), (35, "00010100"), (36, "00010101"),
    (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"),
    (43, "00101100"), (44, "00101101"), (45, "00000100"),
    (46, "00000101"), (47, "00001010"), (48, "00001011"),
    (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"),
    (55, "01011000"), (56, "01011001"), (57, "01011010"),
    (58, "01011011"), (59, "01001010"), (60, "01001011"),
    (61, "00110010"), (62, "00110011"), (63, "00110100"),
]

_WHITE_MAKEUP = [
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]

_BLACK_TERM = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
]

_BLACK_MAKEUP = [
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"),
    (576, "0000001101101"), (640, "0000001001010"),
    (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"),
    (960, "0000001110011"), (1024, "0000001110100"),
    (1088, "0000001110101"), (1152, "0000001110110"),
    (1216, "0000001110111"), (1280, "0000001010010"),
    (1344, "0000001010011"), (1408, "0000001010100"),
    (1472, "0000001010101"), (1536, "0000001011010"),
    (1600, "0000001011011"), (1664, "0000001100100"),
    (1728, "0000001100101"),
]

# extended make-ups (T.4 table 4): shared by both colors
_EXT_MAKEUP = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"),
    (2112, "000000010100"), (2176, "000000010101"),
    (2240, "000000010110"), (2304, "000000010111"),
    (2368, "000000011100"), (2432, "000000011101"),
    (2496, "000000011110"), (2560, "000000011111"),
]

# 2-D mode alphabet (T.4 §4.2.1.3 / T.6): value = signed vertical
# offset for V codes, or the mode marker constants below
_PASS, _HORIZ = -100, -200
_MODES = [
    ("1", 0), ("011", 1), ("010", -1), ("000011", 2), ("000010", -2),
    ("0000011", 3), ("0000010", -3), ("0001", _PASS), ("001", _HORIZ),
]

_EOL = "000000000001"


def _decode_map(pairs, makeups):
    """(bit-length, code-int) -> (run, is_terminating)."""
    m = {}
    for run, code in pairs:
        m[(len(code), int(code, 2))] = (run, True)
    for run, code in makeups:
        m[(len(code), int(code, 2))] = (run, False)
    for run, code in _EXT_MAKEUP:
        m[(len(code), int(code, 2))] = (run, False)
    return m


_WHITE_DEC = _decode_map(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_map(_BLACK_TERM, _BLACK_MAKEUP)
_MODE_DEC = {(len(code), int(code, 2)): v for code, v in _MODES}

_WHITE_ENC = {run: code for run, code in
              _WHITE_TERM + _WHITE_MAKEUP + _EXT_MAKEUP}
_BLACK_ENC = {run: code for run, code in
              _BLACK_TERM + _BLACK_MAKEUP + _EXT_MAKEUP}
_MODE_ENC = {v: code for code, v in _MODES}


# -- bit I/O -------------------------------------------------------------------


class _Bits:
    """MSB-first reader over a byte string with save/seek (fax codes
    are at most 13 bits + the 12-bit EOL)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self) -> int:
        if self.pos >= self.bits.size:
            raise CcittError("fax stream exhausted mid-code")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack: int = 0) -> bool:
        return self.pos + slack >= self.bits.size


def _read_code(br: _Bits, table, what: str):
    ln = 0
    val = 0
    while ln < 14:
        val = (val << 1) | br.read()
        ln += 1
        hit = table.get((ln, val))
        if hit is not None:
            return hit
    raise CcittError(f"invalid {what} code")


def _read_run(br: _Bits, black: bool) -> int:
    """One full run: zero or more make-up codes + a terminating code."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    for _ in range(64):                        # run cap: 64 * 2560
        run, terminating = _read_code(
            br, table, "black run" if black else "white run")
        total += run
        if terminating:
            return total
    raise CcittError("runaway make-up code chain")


# -- 1-D (Modified Huffman) ----------------------------------------------------


def _decode_row_1d(br: _Bits, width: int) -> list[int]:
    """One MH row as its changing-element positions (transitions)."""
    transitions: list[int] = []
    pos = 0
    black = False
    while pos < width:
        run = _read_run(br, black)
        pos += run
        if pos > width:
            raise CcittError("fax run overruns row width")
        transitions.append(pos)
        black = not black
    return transitions


def _transitions_to_bits(transitions: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    flips = [t for t in transitions if t < width]
    # transitions alternate white->black / black->white
    for i in range(0, len(flips), 2):
        end = flips[i + 1] if i + 1 < len(flips) else width
        row[flips[i]:end] = 1
    return row


def _bits_to_transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    head = [0] if row.size and row[0] else []   # row starting black
    return head + [int(x) for x in d]


def _skip_eol(br: _Bits, required: bool) -> bool:
    """Consume fill bits + one EOL if present at the cursor.  Returns
    True when an EOL was consumed; rewinds and returns False when the
    next code is not (fill+)EOL and ``required`` is False."""
    save = br.pos
    zeros = 0
    while not br.exhausted():
        b = br.read()
        if b == 1:
            if zeros >= 11:
                return True
            break
        zeros += 1
        if zeros > 64 + 11:                    # fill is bounded
            break
    if required:
        raise CcittError("missing G3 EOL")
    br.pos = save
    return False


# -- 2-D (MR / MMR) ------------------------------------------------------------


def _decode_row_2d(br: _Bits, ref: list[int], width: int) -> list[int]:
    cur: list[int] = []
    a0 = -1
    black = False
    steps = 0
    while a0 < width:
        steps += 1
        if steps > 2 * width + 16:             # corrupt-stream stall guard
            raise CcittError("2-D row fails to advance")
        mode = _read_mode(br)
        # b1: first ref transition > a0 whose parity matches the color
        # opposite to a0's (even index = white->black)
        i = 1 if black else 0
        while i < len(ref) and ref[i] <= a0:
            i += 2
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        if mode == _PASS:
            a0 = b2
        elif mode == _HORIZ:
            start = a0 if a0 > 0 else 0
            r1 = _read_run(br, black)
            r2 = _read_run(br, not black)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise CcittError("2-D horizontal run overruns row")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:                                  # vertical: a1 = b1 + d
            a1 = b1 + mode
            if not 0 <= a1 <= width or (a0 >= 0 and a1 <= a0):
                raise CcittError("2-D vertical move out of order")
            cur.append(a1)
            black = not black
            a0 = a1
    return cur


def _read_mode(br: _Bits):
    ln = 0
    val = 0
    while ln < 7:
        val = (val << 1) | br.read()
        ln += 1
        hit = _MODE_DEC.get((ln, val))
        if hit is not None:
            return hit
    raise CcittError("invalid 2-D mode code")


# -- public decoders -----------------------------------------------------------


def decode_mh(data: bytes, width: int, height: int,
              byte_align: bool = True) -> np.ndarray:
    """TIFF compression 2 (CCITT RLE): each row independently 1-D MH
    coded and starting on a byte boundary; no EOLs.  With
    ``byte_align=False`` the rows form one continuous bit stream —
    the PDF CCITTFaxDecode K=0 shape when /EncodedByteAlign is
    false (PDF 32000-1:2008 §7.4.6)."""
    _check_dims(width, height)
    br = _Bits(data)
    rows = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        if y and byte_align:
            br.align()
        rows[y] = _transitions_to_bits(
            _decode_row_1d(br, width), width)
    return _pack(rows)


def decode_g3(data: bytes, width: int, height: int,
              two_d: bool = False,
              byte_align: bool = False) -> np.ndarray:
    """TIFF compression 3 (Group 3, T.4): rows prefixed by (fill+)EOL;
    with ``two_d`` (T4Options bit 0) each EOL carries a tag bit —
    1 = next row 1-D, 0 = 2-D against the previous row.

    T4Options fill bits (bit 2, the T.4 §4.1.2 fill) need no flag on
    the decode side: ``_skip_eol`` consumes any bounded zero fill
    before each EOL.  ``byte_align`` is the PDF /EncodedByteAlign
    convention instead: each encoded LINE (its EOL included) begins
    on a byte boundary, so the reader realigns before every row."""
    _check_dims(width, height)
    br = _Bits(data)
    rows = np.zeros((height, width), dtype=np.uint8)
    ref: list[int] = []
    for y in range(height):
        if byte_align:
            br.align()
        seen = _skip_eol(br, required=False)
        if not seen and (y > 0 or two_d):
            # 1-D writers may omit the very first EOL; 2-D needs the
            # EOL+tag pair on every row
            raise CcittError("missing G3 EOL")
        one_d = True
        if two_d:
            one_d = bool(br.read())
        if one_d:
            tr = _decode_row_1d(br, width)
        else:
            tr = _decode_row_2d(br, ref, width)
        rows[y] = _transitions_to_bits(tr, width)
        ref = [t for t in tr if t < width] + [width, width]
    return _pack(rows)


def decode_g4(data: bytes, width: int, height: int,
              byte_align: bool = False) -> np.ndarray:
    """TIFF compression 4 (Group 4, T.6 MMR): every row 2-D coded, the
    reference line above row 0 imaginary all-white; EOFB optional.
    ``byte_align`` = the PDF /EncodedByteAlign convention: every
    row's codes begin on a byte boundary."""
    _check_dims(width, height)
    br = _Bits(data)
    rows = np.zeros((height, width), dtype=np.uint8)
    ref: list[int] = [width, width]
    for y in range(height):
        if y and byte_align:
            br.align()
        tr = _decode_row_2d(br, ref, width)
        rows[y] = _transitions_to_bits(tr, width)
        ref = [t for t in tr if t < width] + [width, width]
    return _pack(rows)


def _check_dims(width: int, height: int) -> None:
    if width <= 0 or height <= 0 or width * height > MAX_FAX_PIXELS:
        raise CcittError("fax dimensions out of range")


def _pack(rows: np.ndarray) -> np.ndarray:
    """(h, w) 0/1 -> packed bilevel row bytes, the uncompressed-TIFF
    layout the caller unpacks with its shared photometric mapping."""
    return np.packbits(rows, axis=1)


# -- independent encoders ------------------------------------------------------


class _BitW:
    __slots__ = ("parts",)

    def __init__(self):
        self.parts: list[str] = []

    def put(self, code: str) -> None:
        self.parts.append(code)

    def align(self) -> None:
        n = sum(len(p) for p in self.parts) & 7
        if n:
            self.parts.append("0" * (8 - n))

    def fill_to_eol(self) -> None:
        """T.4 §4.1.2 fill: zeros so the NEXT 12 bits (an EOL) end on
        a byte boundary — the TIFF T4Options bit-2 convention."""
        n = (sum(len(p) for p in self.parts) + 12) & 7
        if n:
            self.parts.append("0" * (8 - n))

    def bytes(self) -> bytes:
        s = "".join(self.parts)
        s += "0" * (-len(s) % 8)
        return np.packbits(np.frombuffer(
            s.encode(), dtype=np.uint8) - ord("0")).tobytes()


def _put_run(w: _BitW, run: int, black: bool) -> None:
    enc = _BLACK_ENC if black else _WHITE_ENC
    while run >= 64:
        step = min(run - run % 64, 2560)
        w.put(enc[step])
        run -= step
    w.put(enc[run])


def _put_row_1d(w: _BitW, row: np.ndarray) -> None:
    width = row.size
    pos = 0
    black = False
    for t in _bits_to_transitions(row) + [width]:
        _put_run(w, t - pos, black)
        pos = t
        black = not black
        if pos >= width:
            break


def _put_row_2d(w: _BitW, row: np.ndarray, ref: list[int]) -> None:
    cur = _bits_to_transitions(row) + [row.size, row.size]
    width = row.size
    a0 = -1
    black = False
    ci = 0
    while a0 < width:
        parity = 1 if black else 0
        i = parity
        while i < len(ref) and ref[i] <= (a0 if a0 >= 0 else -1):
            i += 2
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        a1 = cur[ci] if ci < len(cur) else width
        if b2 < a1:
            w.put(_MODE_ENC[_PASS])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.put(_MODE_ENC[a1 - b1])
            a0 = a1
            ci += 1
            black = not black
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else width
            start = a0 if a0 > 0 else 0
            w.put(_MODE_ENC[_HORIZ])
            _put_run(w, a1 - start, black)
            _put_run(w, a2 - a1, not black)
            a0 = a2
            ci += 2


def encode_mh(rows: np.ndarray, byte_align: bool = True) -> bytes:
    """Compression-2 stream: per-row MH, rows byte-aligned.  With
    ``byte_align=False`` the rows run on as one continuous bit
    stream (PDF K=0 without /EncodedByteAlign)."""
    rows = _as_rows(rows)
    w = _BitW()
    for y in range(rows.shape[0]):
        if y and byte_align:
            w.align()
        _put_row_1d(w, rows[y])
    return w.bytes()


def encode_g3(rows: np.ndarray, two_d: bool = False,
              k: int = 4, byte_align: bool = False,
              fill_bits: bool = False) -> bytes:
    """Group 3 stream: EOL before every row; in 2-D mode every K-th
    row is 1-D (the T.4 error-confinement rule) with the tag bit after
    each EOL.  ``fill_bits`` writes the TIFF T4Options bit-2
    convention (zero fill before each EOL so the EOL ends on a byte
    boundary); ``byte_align`` the PDF /EncodedByteAlign one (each
    line, EOL included, starts on a byte boundary)."""
    rows = _as_rows(rows)
    w = _BitW()
    ref: list[int] = []
    for y in range(rows.shape[0]):
        if byte_align:
            w.align()
        elif fill_bits:
            w.fill_to_eol()
        w.put(_EOL)
        one_d = (not two_d) or (y % k == 0)
        if two_d:
            w.put("1" if one_d else "0")
        if one_d:
            _put_row_1d(w, rows[y])
        else:
            _put_row_2d(w, rows[y], ref)
        ref = _bits_to_transitions(rows[y]) + [rows.shape[1]] * 2
    return w.bytes()


def encode_g4(rows: np.ndarray, byte_align: bool = False) -> bytes:
    """Group 4 stream: all rows 2-D, imaginary white reference above
    row 0, EOFB terminator.  ``byte_align`` starts every row's codes
    on a byte boundary (PDF /EncodedByteAlign)."""
    rows = _as_rows(rows)
    w = _BitW()
    ref: list[int] = [rows.shape[1], rows.shape[1]]
    for y in range(rows.shape[0]):
        if y and byte_align:
            w.align()
        _put_row_2d(w, rows[y], ref)
        ref = _bits_to_transitions(rows[y]) + [rows.shape[1]] * 2
    w.put(_EOL)
    w.put(_EOL)
    return w.bytes()


def _as_rows(rows: np.ndarray) -> np.ndarray:
    rows = np.asarray(rows)
    if rows.ndim != 2 or rows.size == 0:
        raise CcittError("encoder wants a (h, w) 0/1 array")
    return (rows != 0).astype(np.uint8)


def build_tiff_fax(rows: np.ndarray | list, compression: int = 4,
                   two_d: bool = False) -> bytes:
    """A complete bilevel TIFF (photometric 0, WhiteIsZero) holding
    ``rows`` (0 = white, nonzero = black) under compression 2 (MH),
    3 (G3; ``two_d`` sets the T4Options 2-D flag) or 4 (G4) — the
    fixture writer for the fax lane, independent of the TIFF reader's
    IFD walk.  A LIST of row arrays writes a multi-page file (one IFD
    per page on the next-IFD chain — the scanned-document shape;
    ``compression`` may then also be a per-page list)."""
    import struct

    pages = rows if isinstance(rows, list) else [rows]
    comps = (compression if isinstance(compression, list)
             else [compression] * len(pages))
    if not pages or len(comps) != len(pages):
        raise CcittError("build_tiff_fax wants >= 1 page, one "
                         "compression per page")
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    for pi, (page, comp) in enumerate(zip(pages, comps)):
        page = _as_rows(page)
        h, w = page.shape
        if comp == 2:
            body = encode_mh(page)
        elif comp == 3:
            body = encode_g3(page, two_d=two_d)
        elif comp == 4:
            body = encode_g4(page)
        else:
            raise CcittError(f"not a fax compression: {comp}")
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1),
            (259, 3, 1, comp), (262, 3, 1, 0), (273, 4, 1, None),
            (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(body)),
        ]
        if comp == 3:
            entries.append((292, 4, 1, 1 if two_d else 0))
        entries.sort(key=lambda e: e[0])
        ifd_off = len(out)
        strip_off = ifd_off + 2 + 12 * len(entries) + 4
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if val is None:
                val = strip_off
            ifd += struct.pack("<HHII", tag, typ, cnt, val)
        last = pi == len(pages) - 1
        ifd += struct.pack("<I", 0 if last else strip_off + len(body))
        out += ifd + body
    return bytes(out)
