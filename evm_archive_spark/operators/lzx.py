"""LZX decompressor (the CAB variant) — from scratch, stdlib only
(public format: Microsoft's LZX DELTA specification [MS-PATCH] and
the cabinet SDK's LZX documentation).

LZX is CAB's high-compression mode (``makecab /D CompressionType=LZX``
— most real-world driver/installer cabinets).  The format:

- a bitstream of LITTLE-ENDIAN 16-bit words whose bits are consumed
  MSB-first within each word;
- a 1-bit header: when set, a 32-bit "Intel E8 translation size"
  follows and decoded output is post-processed per 32 kB frame
  (CALL-instruction absolute->relative address translation);
- blocks: 3-bit type, 24-bit uncompressed size.  Type 3
  (uncompressed) realigns to a word boundary (consuming a FULL pad
  word when already aligned), reads new R0/R1/R2 repeated offsets as
  u32le, then raw bytes (+1 pad byte when odd).  Types 1 (verbatim)
  and 2 (aligned offset) carry Huffman trees whose code lengths are
  DELTA-coded against the previous block's lengths through a 20-entry
  pretree (symbols 0-16 = (prev - sym) mod 17; 17/18 = zero runs;
  19 = 4-5 repeats of a further delta), then a token stream: main
  symbols < 256 are literals, others split into a position slot and
  a 3-bit length header (7 -> + a length-tree symbol), offsets from
  the slot base + footer bits (slots 0-2 = MRU repeated offsets;
  aligned blocks code the low 3 footer bits through an 8-symbol
  aligned tree when >= 3 footer bits).

``lzx_compress`` is the independent fixture writer: uncompressed
blocks and literal-only verbatim blocks (flat 8-bit main tree via the
pretree) — simple but fully valid streams that libarchive's own LZX
reader must extract byte-identically (the cross-pin in pytest).

Reference parity note: closes cab.py's LZX typed boundary.
Placement: per-payload work inside Arrow batches (the codec
boundary)."""

from __future__ import annotations

import struct


class LzxError(ValueError):
    """Malformed or out-of-scope LZX stream."""


_PRETREE_SYMS = 20
_ALIGNED_SYMS = 8
_LEN_SYMS = 249
_FRAME = 32768

_SLOTS_BY_WBITS = {15: 30, 16: 32, 17: 34, 18: 36, 19: 38, 20: 42,
                   21: 50}


def _pos_tables(n_slots: int):
    extra = [0, 0, 0, 0] + [
        min((i >> 1) - 1, 17) for i in range(4, n_slots)]
    base = [0] * n_slots
    for i in range(1, n_slots):
        base[i] = base[i - 1] + (1 << extra[i - 1])
    return extra, base


class _Bits:
    """LZX bit reader: 16-bit LE words, MSB-first within each word."""

    __slots__ = ("b", "pos", "acc", "nbits")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 2 <= len(self.b):
            w = self.b[self.pos] | (self.b[self.pos + 1] << 8)
            self.pos += 2
        elif self.pos < len(self.b):
            w = self.b[self.pos]
            self.pos += 1
        else:
            raise LzxError("LZX bitstream exhausted")
        self.acc = (self.acc << 16) | w
        self.nbits += 16

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def frame_align(self) -> None:
        """At each 32 kB output frame boundary the bitstream realigns
        to a 16-bit word (sub-word remainder bits are discarded)."""
        rem = self.nbits % 16
        if rem:
            self.read(rem)

    def align_uncompressed(self) -> int:
        """The uncompressed-block alignment rule: skip 1-16 bits to
        the next word boundary (a FULL word when already aligned);
        returns the byte offset where raw data starts."""
        rem = self.nbits % 16
        self.read(rem if rem else 16)
        p = self.pos - self.nbits // 8
        self.acc = 0
        self.nbits = 0
        return p


class _Huff:
    """Canonical Huffman decoder from code lengths."""

    __slots__ = ("table", "maxlen")

    def __init__(self, lengths: list[int]):
        self.maxlen = max(lengths, default=0)
        self.table = {}
        code = 0
        for ln in range(1, self.maxlen + 1):
            for sym, sl in enumerate(lengths):
                if sl == ln:
                    self.table[(ln, code)] = sym
                    code += 1
            code <<= 1
        if self.maxlen and code != (1 << (self.maxlen + 1)):
            # allow the degenerate one-symbol tree (len-1 single code)
            n_codes = sum(1 for x in lengths if x)
            if not (n_codes == 1 and self.maxlen == 1):
                raise LzxError("LZX Huffman lengths not canonical")

    def decode(self, br: _Bits) -> int:
        ln = 0
        code = 0
        while ln <= self.maxlen:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise LzxError("invalid LZX Huffman code")


def _read_lengths(br: _Bits, prev: list[int], count: int) -> list[int]:
    """Pretree-coded delta lengths for ``count`` symbols."""
    pre = [br.read(4) for _ in range(_PRETREE_SYMS)]
    ptree = _Huff(pre)
    out = list(prev)
    i = 0
    while i < count:
        sym = ptree.decode(br)
        if sym == 17:
            run = br.read(4) + 4
            for _ in range(run):
                if i < count:
                    out[i] = 0
                    i += 1
        elif sym == 18:
            run = br.read(5) + 20
            for _ in range(run):
                if i < count:
                    out[i] = 0
                    i += 1
        elif sym == 19:
            run = br.read(1) + 4
            d = ptree.decode(br)
            if d > 16:
                raise LzxError("bad pretree repeat delta")
            val = (prev[i] - d) % 17
            for _ in range(run):
                if i < count:
                    out[i] = val
                    i += 1
        elif sym <= 16:
            out[i] = (prev[i] - sym) % 17
            i += 1
        else:
            raise LzxError("bad pretree symbol")
    return out


def lzx_decompress(data: bytes, out_len: int,
                   window_bits: int = 15) -> bytes:
    """Decompress one LZX folder stream to ``out_len`` bytes."""
    n_slots = _SLOTS_BY_WBITS.get(window_bits)
    if n_slots is None:
        raise LzxError(f"LZX window bits {window_bits} out of range")
    extra, base = _pos_tables(n_slots)
    n_main = 256 + (n_slots << 3)
    br = _Bits(data)
    out = bytearray()
    r0, r1, r2 = 1, 1, 1
    main_prev = [0] * n_main
    len_prev = [0] * _LEN_SYMS

    intel = br.read(1)
    intel_size = 0
    if intel:
        intel_size = (br.read(16) << 16) | br.read(16)

    next_frame = _FRAME
    while len(out) < out_len:
        while len(out) >= next_frame:            # lazy frame realign
            br.frame_align()
            next_frame += _FRAME
        btype = br.read(3)
        bsize = (br.read(8) << 16) | br.read(16)
        if bsize == 0 or len(out) + bsize > out_len:
            raise LzxError("LZX block size out of range")
        if btype == 3:                           # uncompressed
            p = br.align_uncompressed()
            if p + 12 + bsize > len(data):
                raise LzxError("uncompressed LZX block overruns")
            r0, r1, r2 = struct.unpack_from("<III", data, p)
            if min(r0, r1, r2) < 1:
                raise LzxError("bad LZX repeated offsets")
            p += 12
            out += data[p:p + bsize]
            p += bsize + (bsize & 1)             # odd sizes pad a byte
            br.pos = p
            br.acc = 0
            br.nbits = 0
            next_frame = (len(out) // _FRAME + 1) * _FRAME
            continue
        if btype not in (1, 2):
            raise LzxError(f"bad LZX block type {btype}")
        atree = None
        if btype == 2:                           # aligned offset tree
            atree = _Huff([br.read(3) for _ in range(_ALIGNED_SYMS)])
        lens = _read_lengths(br, main_prev[:256], 256)
        lens += _read_lengths(br, main_prev[256:], n_main - 256)
        main_prev = lens
        mtree = _Huff(lens)
        len_prev = _read_lengths(br, len_prev, _LEN_SYMS)
        ltree = _Huff(len_prev)
        produced = 0
        while produced < bsize:
            while len(out) >= next_frame:        # mid-block boundary
                br.frame_align()
                next_frame += _FRAME
            sym = mtree.decode(br)
            if sym < 256:
                out.append(sym)
                produced += 1
                continue
            sym -= 256
            slot = sym >> 3
            mlen = (sym & 7) + 2
            if mlen == 9:                        # header 7: extend
                mlen = ltree.decode(br) + 9
            if slot == 0:
                off = r0
            elif slot == 1:
                off = r1
                r1, r0 = r0, off
            elif slot == 2:
                off = r2
                r2, r0 = r0, off
            else:
                if slot >= n_slots:
                    raise LzxError("LZX position slot out of range")
                eb = extra[slot]
                if btype == 2 and eb >= 3:
                    v = (br.read(eb - 3) << 3) if eb > 3 else 0
                    v += atree.decode(br)
                elif eb:
                    v = br.read(eb)
                else:
                    v = 0
                off = base[slot] + v - 2
                if off < 1:
                    raise LzxError("bad LZX match offset")
                r2, r1, r0 = r1, r0, off
            if off > len(out) or produced + mlen > bsize + 0 \
                    or len(out) + mlen > out_len:
                raise LzxError("LZX match out of window/block")
            start = len(out) - off
            for k in range(mlen):
                out.append(out[start + k])
            produced += mlen

    if intel and intel_size:
        out = _e8_decode(out, intel_size)
    return bytes(out[:out_len])


def _e8_decode(buf: bytearray, filesize: int) -> bytearray:
    """Per-frame Intel E8 CALL translation (absolute -> relative),
    skipping the last 10 bytes of each frame (the spec's guard band);
    only the first 0x40000000 bytes are ever translated."""
    n = len(buf)
    pos = 0
    while pos < n and pos < 0x40000000:
        end = min(pos + _FRAME, n) - 10
        i = pos
        while i < end:
            if buf[i] == 0xE8:
                (absv,) = struct.unpack_from("<i", buf, i + 1)
                if -i <= absv < filesize:
                    rel = absv - i if absv >= 0 else absv + filesize
                    struct.pack_into("<i", buf, i + 1, rel)
                i += 5
            else:
                i += 1
        pos += _FRAME
    return buf


# -- independent encoder ---------------------------------------------------


class _BitW:
    """LZX bit writer: MSB-first into 16-bit LE words."""

    __slots__ = ("words", "cur", "nbits")

    def __init__(self):
        self.words: list[int] = []
        self.cur = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 16:
                self.words.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.put(0, 16 - self.nbits)

    def nbytes(self) -> int:
        return 2 * len(self.words)

    def bytes(self) -> bytes:
        self.align()
        return b"".join(struct.pack("<H", w) for w in self.words)


def lzx_frames(data: bytes, window_bits: int = 15,
               mode: str = "verbatim") -> list[tuple[bytes, int]]:
    """Valid LZX streams for fixtures, sliced into the 32 kB output
    frames CAB's CFDATA blocks carry (the bit writer word-aligns at
    every frame boundary, mirroring the decoder's realign rule):
    ``mode='uncompressed'`` (one raw block) or ``'verbatim'``
    (literal-only blocks under a flat 8-bit main tree).  No matches
    are emitted — simple output any conforming decoder (libarchive's
    included) must accept.  Returns ``[(frame_bytes, uncomp_len)]``."""
    if window_bits not in _SLOTS_BY_WBITS:
        raise LzxError(f"LZX window bits {window_bits} out of range")
    n_main = 256 + (_SLOTS_BY_WBITS[window_bits] << 3)
    if not data:
        raise LzxError("LZX encoder wants non-empty input")
    if mode == "uncompressed":
        head = _BitW()
        head.put(0, 1)                           # no E8 translation
        head.put(3, 3)
        head.put(len(data) >> 16, 8)
        head.put(len(data) & 0xFFFF, 16)
        # header is 28 bits: the decoder's 1-16-bit alignment skip
        # lands exactly on the writer's word padding
        stream = bytearray(head.bytes())
        stream += struct.pack("<III", 1, 1, 1)   # fresh R0/R1/R2
        first_extra = len(stream)
        stream += data
        if len(data) & 1:
            stream += b"\x00"
        frames = []
        pos = 0
        for off in range(0, len(data), _FRAME):
            u = min(_FRAME, len(data) - off)
            comp = u + (first_extra if off == 0 else 0)
            if off + _FRAME >= len(data):
                comp = len(stream) - pos         # trailing pad byte
            frames.append((bytes(stream[pos:pos + comp]), u))
            pos += comp
        return frames
    if mode != "verbatim":
        raise LzxError(f"LZX encoder mode {mode!r}")
    w = _BitW()
    w.put(0, 1)                                  # no E8 translation
    w.put(1, 3)
    w.put(len(data) >> 16, 8)
    w.put(len(data) & 0xFFFF, 16)

    # pretree for the literal half: symbol 9 ((0-8) mod 17) and
    # symbol 0 both length 1 — a complete 2-leaf tree
    pre = [0] * _PRETREE_SYMS
    pre[0] = 1
    pre[9] = 1
    # canonical: symbol 0 -> code 0, symbol 9 -> code 1 (both len 1)
    for ln in pre:
        w.put(ln, 4)
    for _ in range(256):
        w.put(1, 1)                              # delta 8 -> length 8
    # pretree for the position half: all zero lengths via symbol 0
    for ln in pre:
        w.put(ln, 4)
    for _ in range(n_main - 256):
        w.put(0, 1)                              # delta 0 -> length 0
    # length tree: all zeros
    for ln in pre:
        w.put(ln, 4)
    for _ in range(_LEN_SYMS):
        w.put(0, 1)
    # flat 8-bit canonical main tree: code(symbol) == symbol;
    # word-align + cut a frame at every 32 kB of output
    frames = []
    cut = 0
    for i, byte in enumerate(data):
        w.put(byte, 8)
        if (i + 1) % _FRAME == 0:
            w.align()
            frames.append((w.nbytes() - cut, _FRAME))
            cut = w.nbytes()
    w.align()
    if len(data) % _FRAME or not frames:
        frames.append((w.nbytes() - cut, len(data) % _FRAME or _FRAME))
    blob = w.bytes()
    out = []
    pos = 0
    for comp, u in frames:
        out.append((blob[pos:pos + comp], u))
        pos += comp
    return out


def lzx_compress(data: bytes, window_bits: int = 15,
                 mode: str = "verbatim") -> bytes:
    """The frames concatenated — the whole-folder stream form."""
    return b"".join(f for f, _u in lzx_frames(data, window_bits, mode))
