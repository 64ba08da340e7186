"""LZO1X block codec — from scratch, stdlib only.

LZO1X is the compressor embedded firmware images favor (SquashFS's
``-comp lzo``, kernel initramfs, jffs2): byte-oriented instructions
mixing literal runs with matches at up to 48 kB distance.  The
decompressor implements the full public instruction encoding (the
format Linux documents for its in-kernel decompressor and every LZO
port agrees on); the compressor is an independent greedy encoder that
emits a simple instruction subset (first-byte literal runs, state-0
long literal runs, M3 matches with S-bit trailing literals) — valid
input for ANY LZO1X decompressor, sharing no state walk with ours.

Instruction map (b = first instruction byte, H = following byte(s),
LE16 = following little-endian 16-bit value, S = 2 low bits = number
of trailing literals copied verbatim after the match):

- ``0..15`` state 0: long literal run, length ``3 + b`` with the
  zero-byte 255-extension; state 1-3: two-byte match, length 2,
  ``distance = (H << 2) + (b >> 2) + 1``; state 4: length-3 match,
  ``distance = (H << 2) + (b >> 2) + 2049``.
- ``16..31`` (M4): match in the 16..48 kB band, length
  ``2 + (b & 7)`` extended, ``distance = 16384 + ((b & 8) << 11) +
  (LE16 >> 2)``; distance exactly 16384 is the end-of-stream marker.
- ``32..63`` (M3): length ``2 + (b & 31)`` extended, ``distance =
  (LE16 >> 2) + 1`` (<= 16 kB).
- ``64..127`` (M2): length ``3 + ((b >> 5) & 1)``, ``distance =
  (H << 3) + ((b >> 2) & 7) + 1``.
- ``128..255``: length ``5 + ((b >> 5) & 3)``, same distance form.
- First byte ``> 17``: initial literal run of ``b - 17`` bytes.

Reference parity note: the reference (SummaryDev/evm-archive) never
decompresses payloads; this closes the last common SquashFS
compressor (squashfs.py's dispatch).  Placement: per-payload work
inside Arrow batches (the codec boundary).
"""

from __future__ import annotations


class LzoError(ValueError):
    """Malformed or out-of-scope LZO1X stream."""


def lzo1x_decompress(src: bytes, max_out: int) -> bytes:
    """Decompress one LZO1X block, output capped at ``max_out``."""
    n = len(src)
    if n < 3:
        raise LzoError("LZO stream too short")
    out = bytearray()
    ip = 0

    def byte() -> int:
        nonlocal ip
        if ip >= n:
            raise LzoError("LZO stream exhausted mid-instruction")
        b = src[ip]
        ip += 1
        return b

    def literals(count: int) -> None:
        nonlocal ip
        if ip + count > n:
            raise LzoError("LZO literal run overruns input")
        if len(out) + count > max_out:
            raise LzoError("LZO output exceeds cap")
        out.extend(src[ip:ip + count])
        ip += count

    def extend(t: int, base: int) -> int:
        """The zero-byte 255-run length extension."""
        if t:
            return t
        t = base
        while True:
            b = byte()
            if b:
                return t + b
            t += 255
            if t > (1 << 24):
                raise LzoError("runaway LZO length extension")

    def copy(length: int, dist: int) -> None:
        if dist < 1 or dist > len(out):
            raise LzoError("LZO match distance out of window")
        if len(out) + length > max_out:
            raise LzoError("LZO output exceeds cap")
        start = len(out) - dist
        if dist >= length:
            out.extend(out[start:start + length])
        else:                                   # overlapping copy
            for i in range(length):
                out.append(out[start + i])

    state = 0
    b0 = src[0]
    if b0 > 17:
        ip = 1
        t = b0 - 17
        literals(t)
        state = t if t < 4 else 4

    while True:
        b = byte()
        if b <= 15:
            if state == 0:
                t = extend(b, 15)
                literals(t + 3)
                state = 4
                continue
            h = byte()
            if state == 4:
                copy(3, (h << 2) + (b >> 2) + 2049)
            else:
                copy(2, (h << 2) + (b >> 2) + 1)
        elif b <= 31:                           # M4
            t = extend(b & 7, 7)
            le = byte() | (byte() << 8)
            d = 16384 + ((b & 8) << 11) + (le >> 2)
            if d == 16384:
                if t != 1:                      # marker is 17 0 0
                    raise LzoError("bad LZO end-of-stream marker")
                break
            copy(t + 2, d)
            b = le                              # S bits live in LE16
        elif b <= 63:                           # M3
            t = extend(b & 31, 31)
            le = byte() | (byte() << 8)
            copy(t + 2, (le >> 2) + 1)
            b = le
        elif b <= 127:                          # M2
            h = byte()
            copy(3 + ((b >> 5) & 1), (h << 3) + ((b >> 2) & 7) + 1)
        else:
            h = byte()
            copy(5 + ((b >> 5) & 3), (h << 3) + ((b >> 2) & 7) + 1)
        state = b & 3
        literals(state)
    return bytes(out)


# -- independent greedy compressor ---------------------------------------------

_MIN_MATCH = 4
_MAX_M3_LEN = 33                                # single length byte
_MAX_DIST = 16384


def lzo1x_compress(src: bytes) -> bytes:
    """Greedy LZO1X encoder over a 16 kB window: hash-chained 4-byte
    anchors, M3 matches only, literal runs via the first-byte form,
    state-0 long runs and match S bits.  Valid for any decompressor;
    shares only the instruction constants with ours."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out += bytes([17, 0, 0])                # bare EOS marker
        return bytes(out)

    table: dict[bytes, int] = {}
    matches: list[tuple[int, int, int]] = []    # (pos, length, dist)
    i = 0
    while i + _MIN_MATCH <= n:
        key = src[i:i + _MIN_MATCH]
        j = table.get(key)
        table[key] = i
        if j is not None and 0 < i - j <= _MAX_DIST:
            length = _MIN_MATCH
            limit = min(n - i, _MAX_M3_LEN)
            while length < limit and src[j + length] == src[i + length]:
                length += 1
            matches.append((i, length, i - j))
            # index interior anchors sparsely (every other) to keep
            # the dict walk linear
            for k in range(i + 1, min(i + length, n - _MIN_MATCH), 2):
                table[src[k:k + _MIN_MATCH]] = k
            i += length
            continue
        i += 1

    def emit_literal_run(lo: int, hi: int, first: bool) -> None:
        """Literals src[lo:hi] as a standalone run (length >= 1)."""
        run = hi - lo
        if run <= 0:
            return
        if first and run <= 238:
            out.append(17 + run)
        else:
            t = run - 3
            if t < 1:
                raise LzoError("internal: short mid-stream run")
            if t <= 15:
                out.append(t)
            else:
                out.append(0)
                t -= 15
                while t > 255:
                    out.append(0)
                    t -= 255
                out.append(t)
        out.extend(src[lo:hi])

    pos = 0
    mi = 0
    pending_s = None                            # index of last match LE16 low byte
    while pos < n:
        if mi < len(matches):
            mpos, mlen, mdist = matches[mi]
        else:
            mpos = n
        run = mpos - pos
        if run:
            if pending_s is not None and 1 <= run <= 3:
                out[pending_s] |= run           # S bits of previous match
                out.extend(src[pos:pos + run])
            else:
                emit_literal_run(pos, mpos, first=(pos == 0))
            pending_s = None
            pos = mpos
        if mi >= len(matches):
            break
        # M3: length byte (2 + L), LE16 = (dist - 1) << 2 | S
        out.append(32 + (mlen - 2))
        le = (mdist - 1) << 2
        out.append(le & 0xFF)
        pending_s = len(out) - 1                # S bits patched if 1-3
        out.append((le >> 8) & 0xFF)            # literals follow
        pos = mpos + mlen
        mi += 1
    out += bytes([17, 0, 0])                    # EOS
    return bytes(out)
