"""JBIG2 (ITU-T T.88) generic-region codec — the PDF ``/JBIG2Decode``
image-filter lane (VERDICT r12 next-round #3).

Scope: the **embedded stream** organisation PDF uses (PDF 32000-1
§7.4.7 — segment headers without a file header, page 1, optional
``/JBIG2Globals`` segments prepended), with

- **immediate generic region** segments (types 38/39), both coding
  modes: MMR=1 (T.6/G4 through the libtiff-cross-pinned
  ``ccittfax.decode_g4``) and MMR=0 (MQ arithmetic coding, GB
  templates 0-3, explicit AT pixels, TPGDON typical prediction);
- page info (48), end of page/stripe/file (49/50/51), profiles/tables
  (52/53) and extension (62) segments parsed/skipped as appropriate;
- all five external combination operators (OR/AND/XOR/XNOR/REPLACE).

Symbol dictionaries + text regions (0/4/6/7), pattern dictionaries +
halftone regions (16/20/22/23), refinement regions (40/42/43),
intermediate regions (36), unknown-length segments and striped
(unknown-height) pages stay **typed NotImplementedError/Jbig2Error
boundaries** — named gaps, not crashes.

The MQ coder here is the T.88 Annex E coder (47-state Qe table, 0x5601
start, 7-bit BYTEIN after a 0xFF byte) — a different coder from the
T.81 QM-coder in jpegarith.py (113 states, 0x5A1D, stuffed-byte
convention); the two are implemented independently because their
byte-level conventions genuinely differ.

Pin strategy (the jpegls.py pattern — no system JBIG2 codec exists in
this container; libjbig.so is JBIG1/T.82, a different standard): the
encoder below is an independent from-scratch implementation used to
build fixtures; correctness evidence is (a) the MMR arm, which is
byte-identical T.6 and therefore pinned transitively through
ccittfax.py's libtiff cross-pins, (b) exhaustive round-trip fuzz over
all templates / AT placements / TPGDON, (c) golden-freeze bytes so the
bitstream can never drift silently, and (d) truncation/corruption fuzz
(typed errors only).  Context bit-layout note: a bijective relabeling
of context values is transparent to a matched encoder/decoder pair;
the layout used here is the spec's (the one interoperable decoders
use), but with no independent JBIG2 stream source in-env that aspect
is documented rather than machine-pinned.

Reference parity: the reference (SummaryDev/evm-archive) stores media
as opaque hex/bytea and decodes nothing; this lane is part of the
multimodal extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecerrors import guard


class Jbig2Error(ValueError):
    """Typed JBIG2 failure (corrupt stream, unsupported-but-named
    variants raise NotImplementedError instead)."""


# --------------------------------------------------------------------------
# MQ arithmetic coder (T.88 Annex E): 47-state Qe table
# --------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1
MQ_STATES: tuple[tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MqDecoder:
    """T.88 Annex E MQ decoder.  Context state lives in the caller's
    ``stats`` list (``state*2 + mps`` per context — the adaptive part),
    so one decoder serves many context sets.  Reads past the end of
    ``data`` behave as the spec's marker rule (feed 1-bits)."""

    def __init__(self, data: bytes):
        self._d = data
        self._bp = 0
        b = data[0] if data else 0xFF
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self._d, self._bp
        cur = d[bp] if bp < len(d) else 0xFF
        if cur == 0xFF:
            nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
            if nxt > 0x8F:
                # marker (or end of data): feed 1-bits, do not advance
                self.c += 0xFF00
                self.ct = 8
            else:
                self._bp = bp + 1
                self.c += nxt << 9
                self.ct = 7
        else:
            self._bp = bp + 1
            nxt = d[bp + 1] if bp + 1 < len(d) else 0xFF
            self.c += nxt << 8
            self.ct = 8

    def decode(self, stats: list, cx: int) -> int:
        sv = stats[cx]
        mps = sv & 1
        qe, nmps, nlps, switch = MQ_STATES[sv >> 1]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange
            if self.a < qe:
                d = mps
                stats[cx] = (nmps << 1) | mps
            else:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                stats[cx] = (nlps << 1) | mps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                stats[cx] = (nlps << 1) | mps
            else:
                d = mps
                stats[cx] = (nmps << 1) | mps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MqEncoder:
    """T.88 Annex E MQ encoder (the fixture-writer side).  Same
    ``stats`` convention as the decoder."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self._bytes: list[int] = [0]  # scratch byte; dropped if still 0

    def _byteout(self) -> None:
        bs = self._bytes
        if bs[-1] == 0xFF:
            bs.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            bs.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            bs[-1] += 1  # carry into the previous byte
            if bs[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                bs.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                bs.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, stats: list, cx: int, bit: int) -> None:
        sv = stats[cx]
        mps = sv & 1
        qe, nmps, nlps, switch = MQ_STATES[sv >> 1]
        if bit == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            stats[cx] = (nmps << 1) | mps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps ^= 1
            stats[cx] = (nlps << 1) | mps
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (T.88 E.3.8)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        bs = self._bytes
        out = bytes(bs[1:] if bs[0] == 0 else bs)
        # the spec permits dropping trailing 0xFF bytes; keep them —
        # the decoder's marker rule regenerates the same 1-bits either
        # way, and keeping them makes the golden freeze simpler
        return out


# --------------------------------------------------------------------------
# generic region decoding procedure (T.88 §6.2)
# --------------------------------------------------------------------------

# context neighborhoods, LSB-first; "A1".."A4" are the adaptive (AT)
# slots at their spec bit positions (T.88 figures 4-7 / §6.2.5.7)
_TEMPLATES: dict[int, tuple] = {
    0: ((-1, 0), (-2, 0), (-3, 0), (-4, 0), "A1",
        (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1), "A2",
        (1, -2), (0, -2), (-1, -2), "A3", "A4"),
    1: ((-1, 0), (-2, 0), (-3, 0), "A1",
        (2, -1), (1, -1), (0, -1), (-1, -1), (-2, -1),
        (2, -2), (1, -2), (0, -2), (-1, -2)),
    2: ((-1, 0), (-2, 0), "A1",
        (1, -1), (0, -1), (-1, -1), (-2, -1),
        (1, -2), (0, -2), (-1, -2)),
    3: ((-1, 0), (-2, 0), (-3, 0), (-4, 0), "A1",
        (1, -1), (0, -1), (-1, -1), (-2, -1), (-3, -1)),
}
NOMINAL_AT: dict[int, tuple] = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}
# SLTP pseudo-pixel context per template (T.88 §6.2.5.7)
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

MAX_PIXELS = 1 << 24  # the webp/pdf rule: crafted dims must not OOM
_MAX_AT = 127  # AT coordinates are signed bytes


def _resolve_template(template: int, at: tuple | None):
    if template not in _TEMPLATES:
        raise Jbig2Error(f"bad GB template {template}")
    if at is None:
        at = NOMINAL_AT[template]
    if len(at) != len(NOMINAL_AT[template]):
        raise Jbig2Error(
            f"template {template} needs {len(NOMINAL_AT[template])} "
            f"AT pixels, got {len(at)}")
    offs = []
    for slot in _TEMPLATES[template]:
        if isinstance(slot, str):
            ax, ay = at[int(slot[1]) - 1]
            if ay > 0 or (ay == 0 and ax >= 0):
                raise Jbig2Error("AT pixel not strictly causal")
            offs.append((ax, ay))
        else:
            offs.append(slot)
    return offs


def _check_region_dims(w: int, h: int) -> None:
    if w < 1 or h < 1 or w * h > MAX_PIXELS:
        raise Jbig2Error(f"bad region dimensions {w}x{h}")


def decode_generic(data: bytes, w: int, h: int, template: int = 0,
                   at: tuple | None = None,
                   tpgdon: bool = False,
                   mq: "MqDecoder | None" = None,
                   stats: list | None = None) -> np.ndarray:
    """Decode one MQ-coded generic region to an (h, w) uint8 bitmap
    (1 = black).  Out-of-bounds context pixels read 0, per spec.

    ``mq``/``stats`` inject a SHARED decoder + GB context state — the
    symbol-dictionary procedure (6.5.5) decodes every symbol bitmap
    through one arithmetic decoder interleaved with the IAx integer
    fields, retaining GB stats across symbols."""
    _check_region_dims(w, h)
    offs = _resolve_template(template, at)
    pad = 1 + _MAX_AT  # any signed-byte AT offset stays in the pad
    P = np.zeros((h + 2 + 2 * pad, w + 2 * pad), dtype=np.uint8)
    y0, x0 = 2 + pad, pad  # origin of the real bitmap inside P
    if mq is None:
        mq = MqDecoder(data)
    nbits = len(offs)
    if stats is None:
        stats = [0] * (1 << nbits)
    weights = [(dx, dy, 1 << i) for i, (dx, dy) in enumerate(offs)]
    sltp_cx = _TPGDON_CTX[template]
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(stats, sltp_cx)
            if ltp:
                if y:
                    P[y0 + y] = P[y0 + y - 1]
                continue
        py = y0 + y
        row = P[py]
        for x in range(w):
            px = x0 + x
            cx = 0
            for dx, dy, wbit in weights:
                if P[py + dy, px + dx]:
                    cx |= wbit
            if mq.decode(stats, cx):
                row[px] = 1
    return np.ascontiguousarray(
        P[y0:y0 + h, x0:x0 + w])


def encode_generic(bits: np.ndarray, template: int = 0,
                   at: tuple | None = None,
                   tpgdon: bool = False,
                   mq: "MqEncoder | None" = None,
                   stats: list | None = None) -> bytes:
    """Encode an (h, w) 0/1 bitmap as one MQ-coded generic region —
    the exact mirror of ``decode_generic`` (fixture writer).  With an
    injected ``mq`` the caller owns flush() and the return is b""."""
    b = (np.asarray(bits) > 0).astype(np.uint8)
    if b.ndim != 2:
        raise Jbig2Error("bitmap must be 2-D")
    h, w = b.shape
    _check_region_dims(w, h)
    offs = _resolve_template(template, at)
    pad = 1 + _MAX_AT
    P = np.zeros((h + 2 + 2 * pad, w + 2 * pad), dtype=np.uint8)
    y0, x0 = 2 + pad, pad
    P[y0:y0 + h, x0:x0 + w] = b
    own = mq is None
    if own:
        mq = MqEncoder()
    if stats is None:
        stats = [0] * (1 << len(offs))
    weights = [(dx, dy, 1 << i) for i, (dx, dy) in enumerate(offs)]
    sltp_cx = _TPGDON_CTX[template]
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = int(
                y > 0 and bool((b[y] == b[y - 1]).all()))
            mq.encode(stats, sltp_cx, typical ^ ltp)
            ltp = typical
            if ltp:
                continue
        py = y0 + y
        for x in range(w):
            px = x0 + x
            cx = 0
            for dx, dy, wbit in weights:
                if P[py + dy, px + dx]:
                    cx |= wbit
            mq.encode(stats, cx, int(b[y, x]))
    return mq.flush() if own else b""


# --------------------------------------------------------------------------
# segment layer (T.88 §7) — embedded-stream organisation
# --------------------------------------------------------------------------

_REGION_TYPES = frozenset({36, 38, 39})
_SKIP_TYPES = frozenset({49, 50, 51, 52, 53, 62})
_UNSUPPORTED = {
    16: "pattern dictionary", 20: "intermediate halftone region",
    22: "immediate halftone region",
    23: "immediate lossless halftone region",
    40: "intermediate refinement region",
}


def _be32(b: bytes, p: int) -> int:
    if p + 4 > len(b):
        raise Jbig2Error("truncated segment header")
    return struct.unpack_from(">I", b, p)[0]


def _parse_segment_header(b: bytes, p: int):
    """Returns (seg_number, seg_type, referred, page, data_start,
    data_len)."""
    num = _be32(b, p)
    if p + 6 > len(b):
        raise Jbig2Error("truncated segment header")
    flags = b[p + 4]
    stype = flags & 0x3F
    page4 = bool(flags & 0x40)
    q = p + 5
    rts = b[q]
    cnt = rts >> 5
    if cnt == 7:
        cnt = _be32(b, q) & 0x1FFFFFFF
        if cnt > 64:
            raise Jbig2Error(
                f"implausible referred-segment count {cnt}")
        q += 4 + (cnt + 8) // 8  # 4-byte count + retain bits
    elif cnt > 4:
        raise Jbig2Error(f"reserved referred-segment count {cnt}")
    else:
        q += 1
    rsz = 1 if num <= 256 else (2 if num <= 65536 else 4)
    if q + cnt * rsz > len(b):
        raise Jbig2Error("truncated referred-segment list")
    referred = []
    for i in range(cnt):
        o = q + i * rsz
        referred.append(
            b[o] if rsz == 1 else
            struct.unpack_from(">H", b, o)[0] if rsz == 2 else
            _be32(b, o))
    q += cnt * rsz
    if page4:
        page = _be32(b, q)
        q += 4
    else:
        if q >= len(b):
            raise Jbig2Error("truncated segment header")
        page = b[q]
        q += 1
    dlen = _be32(b, q)
    q += 4
    if dlen == 0xFFFFFFFF:
        raise NotImplementedError(
            "JBIG2 unknown-length segment (T.88 7.2.7) not supported")
    if q + dlen > len(b):
        raise Jbig2Error("segment data overruns stream")
    return num, stype, referred, page, q, dlen


def _iter_segments(b: bytes):
    p = 0
    while p < len(b):
        num, stype, referred, page, start, dlen = \
            _parse_segment_header(b, p)
        yield num, stype, referred, page, b[start:start + dlen]
        p = start + dlen


def _decode_region_segment(payload: bytes):
    """Region segment info (§7.4.1) + generic region data (§7.4.6)."""
    if len(payload) < 18:
        raise Jbig2Error("truncated region segment")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    gflags = payload[17]
    mmr = gflags & 1
    template = (gflags >> 1) & 3
    tpgdon = bool(gflags & 8)
    q = 18
    _check_region_dims(w, h)
    if x > MAX_PIXELS or y > MAX_PIXELS:
        raise Jbig2Error("implausible region origin")
    if comb > 4:
        raise Jbig2Error(f"bad combination operator {comb}")
    if mmr:
        from .ccittfax import CcittError, decode_g4

        try:
            packed = decode_g4(payload[q:], w, h)
        except CcittError as e:
            raise Jbig2Error(f"bad MMR region: {e}") from e
        bits = np.unpackbits(packed, axis=1)[:, :w]
    else:
        n_at = len(NOMINAL_AT[template])
        if q + 2 * n_at > len(payload):
            raise Jbig2Error("truncated AT pixels")
        at = tuple(
            (struct.unpack_from("b", payload, q + 2 * i)[0],
             struct.unpack_from("b", payload, q + 2 * i + 1)[0])
            for i in range(n_at))
        q += 2 * n_at
        bits = decode_generic(payload[q:], w, h, template, at, tpgdon)
    return x, y, comb, bits


@guard(Jbig2Error)
def decode_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (optionally preceded by the
    ``/JBIG2Globals`` segments) to the page bitmap — (h, w) uint8,
    1 = black.  Only generic-region pages are supported; segment types
    needing symbol/halftone/refinement machinery raise a NAMED
    NotImplementedError."""
    page_w = page_h = None
    page_default = 0
    page: np.ndarray | None = None
    sym_by_seg: dict[int, list] = {}
    for num, stype, referred, _pg, payload in \
            list(_iter_segments(bytes(globals_data))) \
            + list(_iter_segments(bytes(data))):
        if stype == 0:   # symbol dictionary (r13)
            insyms: list = []
            for rn in referred:
                insyms.extend(sym_by_seg.get(rn, []))
            sym_by_seg[num] = decode_symbol_dict(payload, insyms)
            continue
        if stype in (4, 6, 7):  # text regions (r13)
            syms: list = []
            for rn in referred:
                syms.extend(sym_by_seg.get(rn, []))
            if not syms:     # tolerate encoders omitting the refs
                for v in sym_by_seg.values():
                    syms.extend(v)
            if stype == 4:
                raise NotImplementedError(
                    "JBIG2 intermediate text region (needs a "
                    "referring refinement region) not supported")
            x, y, comb, bits = decode_text_region(payload, syms)
            hh, ww = bits.shape
            if page is None:
                page_w, page_h = x + ww, y + hh
                _check_region_dims(page_w, page_h)
                page = np.zeros((page_h, page_w), dtype=np.uint8)
            if y + hh > page.shape[0] or x + ww > page.shape[1]:
                raise Jbig2Error("region outside page")
            _combine(page[y:y + hh, x:x + ww], bits, comb)
            continue
        if stype in (42, 43):  # generic refinement regions (r13)
            if len(payload) < 18:
                raise Jbig2Error("truncated refinement region")
            ww, hh, x, y = struct.unpack_from(">IIII", payload, 0)
            comb = payload[16] & 0x07
            rflags = payload[17]
            template = rflags & 1
            tpgron = bool(rflags & 2)
            q = 18
            _check_region_dims(ww, hh)
            if comb > 4:
                raise Jbig2Error(f"bad combination operator {comb}")
            at = None
            if template == 0:
                if q + 4 > len(payload):
                    raise Jbig2Error("truncated refinement AT pixels")
                at = tuple(
                    (struct.unpack_from("b", payload, q + 2 * i)[0],
                     struct.unpack_from("b", payload, q + 2 * i + 1)[0])
                    for i in range(2))
                q += 4
            if page is None or y + hh > page.shape[0]                     or x + ww > page.shape[1]:
                raise Jbig2Error(
                    "refinement region outside page (refines the "
                    "page content at its location)")
            ref = page[y:y + hh, x:x + ww].copy()
            bits = decode_refinement(payload[q:], ref, template,
                                     at, tpgron)
            _combine(page[y:y + hh, x:x + ww], bits, comb)
            continue
        if stype == 48:  # page info
            if len(payload) < 19:
                raise Jbig2Error("truncated page info")
            page_w, page_h = struct.unpack_from(">II", payload, 0)
            pflags = payload[16]
            page_default = (pflags >> 2) & 1
            if page_h == 0xFFFFFFFF:
                raise NotImplementedError(
                    "JBIG2 striped page (unknown height) not supported")
            _check_region_dims(page_w, page_h)
            page = np.full((page_h, page_w), page_default,
                           dtype=np.uint8)
        elif stype in _REGION_TYPES:
            if stype == 36:
                raise NotImplementedError(
                    "JBIG2 intermediate generic region (needs a "
                    "referring refinement region) not supported")
            x, y, comb, bits = _decode_region_segment(payload)
            h, w = bits.shape
            if page is None:
                # PDF streams normally carry page info; tolerate its
                # absence by sizing the page to the first region
                page_w, page_h = x + w, y + h
                _check_region_dims(page_w, page_h)
                page = np.zeros((page_h, page_w), dtype=np.uint8)
            if y + h > page.shape[0] or x + w > page.shape[1]:
                raise Jbig2Error("region outside page")
            _combine(page[y:y + h, x:x + w], bits, comb)
        elif stype in _SKIP_TYPES:
            continue
        elif stype in _UNSUPPORTED:
            raise NotImplementedError(
                f"JBIG2 {_UNSUPPORTED[stype]} segment not supported "
                "(generic regions only)")
        else:
            raise Jbig2Error(f"unknown segment type {stype}")
    if page is None:
        raise Jbig2Error("no page in JBIG2 stream")
    return page


def _segment(num: int, stype: int, page: int, payload: bytes,
             referred: tuple[int, ...] = ()) -> bytes:
    flags = stype & 0x3F
    out = struct.pack(">IB", num, flags)
    if len(referred) > 4:
        raise Jbig2Error("writer emits at most 4 referred segments")
    out += bytes([len(referred) << 5])
    out += bytes(referred)  # segment numbers stay <= 256 here
    out += bytes([page])
    out += struct.pack(">I", len(payload))
    return out + payload


def encode_embedded(bits: np.ndarray, template: int = 0,
                    at: tuple | None = None, tpgdon: bool = False,
                    mmr: bool = False, comb_op: int = 0) -> bytes:
    """Write a minimal PDF-embeddable JBIG2 stream: page info + one
    immediate lossless generic region + end of page."""
    b = (np.asarray(bits) > 0).astype(np.uint8)
    h, w = b.shape
    _check_region_dims(w, h)
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    rinfo = struct.pack(">IIIIB", w, h, 0, 0, comb_op & 7)
    if mmr:
        from .ccittfax import encode_g4

        body = rinfo + bytes([1]) + encode_g4(b)
    else:
        gflags = ((template & 3) << 1) | (8 if tpgdon else 0)
        ats = at if at is not None else NOMINAL_AT[template]
        atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in ats)
        body = rinfo + bytes([gflags]) + atb \
            + encode_generic(b, template, at, tpgdon)
    return (_segment(1, 48, 1, page_info)
            + _segment(2, 39, 1, body)
            + _segment(3, 49, 1, b""))


# --------------------------------------------------------------------------
# arithmetic integer decoding (T.88 Annex A) + symbol dictionaries /
# text regions (6.4, 6.5) — the scanned-document core (r13)
# --------------------------------------------------------------------------

OOB = object()          # IADS/IADW end-of-class sentinel (A.2)

# (prefix-length, n value bits, offset) per Annex A range line
_INT_RANGES = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))


class _IntCtx:
    """One IAx integer arithmetic context (IADH/IADW/IAEX/IAAI/IADT/
    IAFS/IADS/IAIT/IARI/IARDW/...): 512-state PREV-tracked context
    array over the shared MQ coder."""

    def __init__(self):
        self.stats = [0] * 512

    def _bit_dec(self, mq, prev):
        b = mq.decode(self.stats, prev)
        if prev < 256:
            prev = (prev << 1) | b
        else:
            prev = ((((prev << 1) | b) & 511) | 256)
        return b, prev

    def decode(self, mq: MqDecoder):
        prev = 1
        s, prev = self._bit_dec(mq, prev)
        nbits, offset = None, None
        for i, (nb, off) in enumerate(_INT_RANGES):
            if i == len(_INT_RANGES) - 1:
                nbits, offset = nb, off
                break
            b, prev = self._bit_dec(mq, prev)
            if not b:
                nbits, offset = nb, off
                break
        v = 0
        for _ in range(nbits):
            b, prev = self._bit_dec(mq, prev)
            v = (v << 1) | b
        v += offset
        if s and v == 0:
            return OOB
        return -v if s else v

    def _bit_enc(self, mq, prev, bit):
        mq.encode(self.stats, prev, bit)
        if prev < 256:
            prev = (prev << 1) | bit
        else:
            prev = ((((prev << 1) | bit) & 511) | 256)
        return prev

    def encode(self, mq: MqEncoder, value) -> None:
        prev = 1
        if value is OOB:
            s, v = 1, 0
        else:
            s, v = (1, -value) if value < 0 else (0, value)
        prev = self._bit_enc(mq, prev, s)
        for i, (nb, off) in enumerate(_INT_RANGES):
            last = i == len(_INT_RANGES) - 1
            hi = off + (1 << nb) - 1 if not last else None
            if last or v <= hi:
                if not last:
                    prev = self._bit_enc(mq, prev, 0)
                for k in range(nb - 1, -1, -1):
                    prev = self._bit_enc(mq, prev, (v - off >> k) & 1)
                return
            prev = self._bit_enc(mq, prev, 1)


class _IdCtx:
    """IAID symbol-ID context: SBSYMCODELEN-bit tree (A.3)."""

    def __init__(self, nsyms: int):
        self.codelen = max(1, (max(1, nsyms - 1)).bit_length())
        self.stats = [0] * (1 << (self.codelen + 1))

    def decode(self, mq: MqDecoder) -> int:
        prev = 1
        for _ in range(self.codelen):
            prev = (prev << 1) | mq.decode(self.stats, prev)
        return prev - (1 << self.codelen)

    def encode(self, mq: MqEncoder, value: int) -> None:
        prev = 1
        for k in range(self.codelen - 1, -1, -1):
            b = (value >> k) & 1
            mq.encode(self.stats, prev, b)
            prev = (prev << 1) | b


MAX_SYMBOLS = 1 << 16


def _combine(tgt: np.ndarray, bits: np.ndarray, op: int) -> None:
    """External/text combination operators (7.4.1/6.4): OR/AND/XOR/
    XNOR/REPLACE onto a page or region window, in place."""
    if op == 0:
        tgt |= bits
    elif op == 1:
        tgt &= bits
    elif op == 2:
        tgt ^= bits
    elif op == 3:
        tgt[:] = 1 - (tgt ^ bits)
    else:
        tgt[:] = bits


def decode_symbol_dict(payload: bytes,
                       input_syms: list | None = None) -> list:
    """Symbol dictionary segment data (6.5) -> exported symbol bitmaps.
    ``input_syms`` are the referred dictionaries' exports (SDINSYMS) —
    export runs walk input + new symbols, so shared /JBIG2Globals
    dictionaries can re-export imported symbols (review r13).
    Scope: arithmetic coding (SDHUFF=0) without refinement/aggregation
    (SDREFAGG=0) — the form generic JBIG2 encoders emit for scanned
    text; Huffman tables and refinement stay typed."""
    if len(payload) < 2:
        raise Jbig2Error("truncated symbol dictionary")
    flags = struct.unpack_from(">H", payload, 0)[0]
    if flags & 1:
        raise NotImplementedError(
            "JBIG2 Huffman-coded symbol dictionary (SDHUFF) not "
            "supported")
    if flags & 2:
        raise NotImplementedError(
            "JBIG2 refinement/aggregate symbol coding (SDREFAGG) not "
            "supported")
    if flags & 0x100:
        raise NotImplementedError(
            "JBIG2 retained bitmap coding contexts not supported")
    template = (flags >> 10) & 3
    q = 2
    n_at = len(NOMINAL_AT[template])
    if q + 2 * n_at + 8 > len(payload):
        raise Jbig2Error("truncated symbol dictionary header")
    at = tuple(
        (struct.unpack_from("b", payload, q + 2 * i)[0],
         struct.unpack_from("b", payload, q + 2 * i + 1)[0])
        for i in range(n_at))
    q += 2 * n_at
    n_ex, n_new = struct.unpack_from(">II", payload, q)
    q += 8
    if n_new > MAX_SYMBOLS or n_ex > MAX_SYMBOLS:
        raise Jbig2Error("implausible symbol counts")
    mq = MqDecoder(payload[q:])
    iadh, iadw, iaex, iaai = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    offs = _resolve_template(template, at)
    gb_stats = [0] * (1 << len(offs))
    syms: list = []
    hcheight = 0
    while len(syms) < n_new:
        dh = iadh.decode(mq)
        if dh is OOB:
            raise Jbig2Error("OOB height-class delta")
        hcheight += dh
        if hcheight < 1 or hcheight > 1 << 14:
            raise Jbig2Error(f"bad height class {hcheight}")
        symwidth = 0
        while True:
            dw = iadw.decode(mq)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth < 1 or symwidth > 1 << 14:
                raise Jbig2Error(f"bad symbol width {symwidth}")
            if len(syms) >= n_new:
                raise Jbig2Error("more symbols than SDNUMNEWSYMS")
            syms.append(decode_generic(
                b"", symwidth, hcheight, template, at,
                False, mq=mq, stats=gb_stats))
    # export runs (6.5.10): alternating not-exported/exported over
    # INPUT symbols (referred dicts' exports) followed by new ones
    allsyms = list(input_syms or []) + syms
    exported: list = []
    exflag = False
    i = 0
    nruns = 0
    while i < len(allsyms):
        run = iaex.decode(mq)
        nruns += 1
        if nruns > 2 * len(allsyms) + 2:
            # a crafted stream of zero-runs must not spin forever
            # (review r13 — the MQ decoder never runs out of input)
            raise Jbig2Error("export runs make no progress")
        if run is OOB or run < 0:
            raise Jbig2Error("bad export run")
        if run > len(allsyms) - i:
            raise Jbig2Error("export run overruns symbol list")
        if exflag:
            exported.extend(allsyms[i:i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise Jbig2Error(
            f"export count {len(exported)} != SDNUMEXSYMS {n_ex}")
    return exported


def encode_symbol_dict(symbols: list, template: int = 0) -> bytes:
    """Mirror writer: all ``symbols`` new and exported, height-class
    grouped (requires the list sorted by ascending height)."""
    if not symbols:
        raise Jbig2Error("empty symbol dictionary")
    heights = [s.shape[0] for s in symbols]
    if heights != sorted(heights):
        raise Jbig2Error("symbols must be sorted by ascending height")
    at = NOMINAL_AT[template]
    mq = MqEncoder()
    iadh, iadw, iaex, iaai = _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx()
    offs = _resolve_template(template, at)
    gb_stats = [0] * (1 << len(offs))
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        iadh.encode(mq, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == h:
            w = symbols[i].shape[1]
            iadw.encode(mq, w - symwidth)
            symwidth = w
            encode_generic(symbols[i], template, at, False,
                           mq=mq, stats=gb_stats)
            i += 1
        iadw.encode(mq, OOB)
    iaex.encode(mq, 0)                 # zero symbols not exported
    iaex.encode(mq, len(symbols))      # then all of them
    body = mq.flush()
    head = struct.pack(">H", (template & 3) << 10)
    head += b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
    head += struct.pack(">II", len(symbols), len(symbols))
    return head + body


def decode_text_region(payload: bytes, symbols: list):
    """Text region segment data (6.4) -> (x, y, comb_op, bitmap).
    Scope: arithmetic (SBHUFF=0), no refinement (REFINE=0); both
    transposed and all four reference corners handled."""
    if len(payload) < 21:
        raise Jbig2Error("truncated text region")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    flags = struct.unpack_from(">H", payload, 17)[0]
    q = 19
    if flags & 1:
        raise NotImplementedError(
            "JBIG2 Huffman-coded text region (SBHUFF) not supported")
    refine = bool(flags & 2)
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = bool(flags & 0x40)
    sb_comb = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    rtemplate = (flags >> 15) & 1
    if refine:
        raise NotImplementedError(
            "JBIG2 text-region refinement (REFINE) not supported")
    if q + 4 > len(payload):
        raise Jbig2Error("truncated text region header")
    n_inst = struct.unpack_from(">I", payload, q)[0]
    q += 4
    _check_region_dims(w, h)
    if comb > 4 or n_inst > MAX_SYMBOLS * 16:
        raise Jbig2Error("bad text region parameters")
    if not symbols:
        raise Jbig2Error("text region with no symbol dictionary")
    strips = 1 << log_strips
    mq = MqDecoder(payload[q:])
    iadt, iafs, iads, iait = (_IntCtx(), _IntCtx(), _IntCtx(),
                              _IntCtx())
    iaid = _IdCtx(len(symbols))
    page = np.full((h, w), defpixel, dtype=np.uint8)

    def draw(sym: np.ndarray, s: int, t: int) -> None:
        """Place with reference corner semantics (6.4.5 3.c).  The
        spec's pre-advance for right/bottom corners exactly cancels
        the corner offset along the S axis, so the symbol's S-edge is
        always the strip cursor at entry; only the T-axis placement
        depends on the corner.  REFCORNER: 0=BL 1=TL 2=BR 3=TR."""
        sh, sw = sym.shape
        if transposed:
            yy = s                              # S runs vertically
            xx = t if refcorner in (0, 1) else t - sw + 1
        else:
            xx = s
            yy = t if refcorner in (1, 3) else t - sh + 1
        if yy < 0 or xx < 0 or yy + sh > h or xx + sw > w:
            raise Jbig2Error("symbol instance outside region")
        _combine(page[yy:yy + sh, xx:xx + sw], sym,
                 3 if sb_comb == 3 else sb_comb)

    stript = iadt.decode(mq)
    if stript is OOB:
        raise Jbig2Error("OOB initial strip T")
    stript = -stript * strips
    firsts = 0
    ninst = 0
    while ninst < n_inst:
        dt = iadt.decode(mq)
        if dt is OOB:
            raise Jbig2Error("OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                dfs = iafs.decode(mq)
                if dfs is OOB:
                    raise Jbig2Error("OOB first S")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = iads.decode(mq)
                if ids is OOB:
                    break
                curs += ids + dsoffset
            curt = iait.decode(mq) if strips > 1 else 0
            if curt is OOB:
                raise Jbig2Error("OOB T offset")
            t = stript + curt
            sid = iaid.decode(mq)
            if sid >= len(symbols):
                raise Jbig2Error(f"symbol id {sid} out of range")
            sym = symbols[sid]
            draw(sym, curs, t)
            curs += (sym.shape[0] if transposed else sym.shape[1]) - 1
            ninst += 1
            if ninst > n_inst:
                raise Jbig2Error("instance overrun")
    return x, y, comb, page


def encode_text_region(w: int, h: int, placements: list,
                       n_symbols: int) -> bytes:
    """Mirror writer for one immediate text region: ``placements`` =
    [(sym_id, x_left, y_top, sym_w, sym_h)] drawn TL/untransposed with
    OR onto a 0-default region.  Instances are grouped into 1-row
    strips (SBSTRIPS=1), sorted by (y, x)."""
    _check_region_dims(w, h)
    mq = MqEncoder()
    iadt, iafs, iads, iait = (_IntCtx(), _IntCtx(), _IntCtx(),
                              _IntCtx())
    iaid = _IdCtx(n_symbols)
    by_t: dict[int, list] = {}
    for sid, x, y, sw, sh in placements:
        by_t.setdefault(y, []).append((x, sid, sw))
    iadt.encode(mq, 0)                      # STRIPT starts at 0
    prev_t = 0
    firsts = 0
    for t in sorted(by_t):
        iadt.encode(mq, t - prev_t)
        prev_t = t
        row = sorted(by_t[t])
        first = True
        curs = 0
        for x, sid, sw in row:
            if first:
                iafs.encode(mq, x - firsts)
                firsts = x
                curs = x
                first = False
            else:
                iads.encode(mq, x - curs)
                curs = x
            iaid.encode(mq, sid)
            curs += sw - 1
        iads.encode(mq, OOB)
    body = mq.flush()
    rinfo = struct.pack(">IIIIB", w, h, 0, 0, 0)
    flags = (1 << 4)                        # REFCORNER=TL, else zeros
    head = rinfo + struct.pack(">H", flags) + struct.pack(
        ">I", len(placements))
    return head + body


def encode_embedded_text(symbols: list, placements: list,
                         w: int, h: int) -> bytes:
    """A PDF-embeddable JBIG2 stream whose page is drawn from a symbol
    dictionary + immediate text region (the scanned-text shape):
    page info, symbol dictionary (type 0), immediate lossless text
    region (type 7, referring to the dictionary), end of page."""
    order = sorted(range(len(symbols)),
                   key=lambda i: symbols[i].shape[0])
    remap = {orig: new for new, orig in enumerate(order)}
    sorted_syms = [np.asarray(symbols[i], dtype=np.uint8)
                   for i in order]
    pl = [(remap[sid], x, y, symbols[sid].shape[1],
           symbols[sid].shape[0]) for sid, x, y in placements]
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    sd = encode_symbol_dict(sorted_syms)
    tr = encode_text_region(w, h, pl, len(sorted_syms))
    return (_segment(1, 48, 1, page_info)
            + _segment(2, 0, 1, sd)
            + _segment(3, 7, 1, tr, referred=(2,))
            + _segment(4, 49, 1, b""))


# --------------------------------------------------------------------------
# generic refinement regions (T.88 6.3 + 7.4.7) — r13 third wave
# --------------------------------------------------------------------------

# refinement context neighborhoods, LSB-first: entries are
# ("c", dx, dy) = the bitmap being decoded (strictly causal),
# ("r", dx, dy) = the reference bitmap (dx/dy relative AFTER the
# reference offset is applied), "A1"/"A2" = adaptive slots (template 0
# only: A1 in the current bitmap, A2 in the reference).
_R_TEMPLATES: dict[int, tuple] = {
    0: (("c", -1, 0), ("c", 1, -1), ("c", 0, -1), "A1",
        ("r", 1, 1), ("r", 0, 1), ("r", -1, 1),
        ("r", 1, 0), ("r", 0, 0), ("r", -1, 0),
        ("r", 1, -1), ("r", 0, -1), "A2"),
    1: (("c", -1, 0), ("c", 1, -1), ("c", 0, -1), ("c", -1, -1),
        ("r", 1, 1), ("r", 0, 1),
        ("r", 1, 0), ("r", 0, 0), ("r", -1, 0),
        ("r", 0, -1)),
}
R_NOMINAL_AT: dict[int, tuple] = {0: ((-1, -1), (-1, -1)), 1: ()}
_TPGRON_CTX = {0: 0x0008, 1: 0x0080}


def _resolve_r_template(template: int, at: tuple | None):
    if template not in _R_TEMPLATES:
        raise Jbig2Error(f"bad GR template {template}")
    if at is None:
        at = R_NOMINAL_AT[template]
    if len(at) != len(R_NOMINAL_AT[template]):
        raise Jbig2Error(
            f"refinement template {template} needs "
            f"{len(R_NOMINAL_AT[template])} AT pixels, got {len(at)}")
    offs = []
    for slot in _R_TEMPLATES[template]:
        if slot == "A1":
            ax, ay = at[0]
            if ay > 0 or (ay == 0 and ax >= 0):
                raise Jbig2Error("refinement A1 not strictly causal")
            offs.append(("c", ax, ay))
        elif slot == "A2":
            offs.append(("r",) + tuple(at[1]))
        else:
            offs.append(slot)
    return offs


def _refine_codec(bits_or_none, ref: np.ndarray, template: int,
                  at: tuple | None, tpgron: bool, mq, stats=None):
    """Shared decode/encode walk for one refinement region.  Decodes
    when ``bits_or_none`` is None (mq: MqDecoder), encodes otherwise
    (mq: MqEncoder)."""
    offs = _resolve_r_template(template, at)
    h, w = ref.shape
    pad = 1 + _MAX_AT
    C = np.zeros((h + 2 * pad, w + 2 * pad), dtype=np.uint8)
    R = np.zeros((h + 2 * pad, w + 2 * pad), dtype=np.uint8)
    R[pad:pad + h, pad:pad + w] = ref
    encoding = bits_or_none is not None
    if encoding:
        tgt = (np.asarray(bits_or_none) > 0).astype(np.uint8)
        if tgt.shape != ref.shape:
            raise Jbig2Error("refinement target/reference mismatch")
    if stats is None:
        stats = [0] * (1 << len(offs))
    sltp_cx = _TPGRON_CTX[template]
    ltp = 0
    for y in range(h):
        if tpgron:
            if encoding:
                # LTP row rule: every pixel's 3x3 reference window is
                # uniform AND the target equals that uniform value
                typical = 1
                for x in range(w):
                    win = R[pad + y - 1:pad + y + 2,
                            pad + x - 1:pad + x + 2]
                    sm = int(win.sum())
                    if sm not in (0, 9) or tgt[y, x] != win[1, 1]:
                        typical = 0
                        break
                mq.encode(stats, sltp_cx, typical ^ ltp)
                ltp = typical
            else:
                ltp ^= mq.decode(stats, sltp_cx)
        py, px0 = pad + y, pad
        for x in range(w):
            px = px0 + x
            if ltp:
                win = R[py - 1:py + 2, px - 1:px + 2]
                sm = int(win.sum())
                if sm == 0:
                    C[py, px] = 0
                    continue
                if sm == 9:
                    C[py, px] = 1
                    continue
            cx = 0
            for i, (kind, dx, dy) in enumerate(offs):
                plane = C if kind == "c" else R
                if plane[py + dy, px + dx]:
                    cx |= 1 << i
            if encoding:
                bit = int(tgt[y, x])
                mq.encode(stats, cx, bit)
            else:
                bit = mq.decode(stats, cx)
            C[py, px] = bit
    return C[pad:pad + h, pad:pad + w].copy()


def decode_refinement(data: bytes, ref: np.ndarray, template: int = 0,
                      at: tuple | None = None,
                      tpgron: bool = False) -> np.ndarray:
    h, w = ref.shape
    _check_region_dims(w, h)
    return _refine_codec(None, ref, template, at, tpgron,
                         MqDecoder(data))


def encode_refinement(bits: np.ndarray, ref: np.ndarray,
                      template: int = 0, at: tuple | None = None,
                      tpgron: bool = False) -> bytes:
    h, w = ref.shape
    _check_region_dims(w, h)
    mq = MqEncoder()
    _refine_codec(bits, ref, template, at, tpgron, mq)
    return mq.flush()


def encode_refinement_segment(bits: np.ndarray, x: int, y: int,
                              template: int = 0,
                              tpgron: bool = False,
                              ref: np.ndarray | None = None) -> bytes:
    """One immediate lossless refinement region segment (type 43)
    refining the page content at (x, y) into ``bits``."""
    b = (np.asarray(bits) > 0).astype(np.uint8)
    h, w = b.shape
    rinfo = struct.pack(">IIIIB", w, h, x, y, 4)     # REPLACE
    flags = (template & 1) | (2 if tpgron else 0)
    if ref is None:
        raise Jbig2Error("writer needs the current page window as ref")
    body = encode_refinement(b, ref, template, None, tpgron)
    atb = b""
    if template == 0:
        atb = b"".join(struct.pack("bb", ax, ay)
                       for ax, ay in R_NOMINAL_AT[0])
    return rinfo + bytes([flags]) + atb + body
