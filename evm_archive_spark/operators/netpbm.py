"""NetPBM image decode (PBM/PGM/PPM/PAM, P1-P7) — from scratch,
stdlib + numpy (public format: the netpbm format manpages).

The PNM family is the lingua franca of image tooling pipelines and
shows up raw in crawls and datasets.  All seven headers:

- **P1/P2/P3**: ASCII bitmap / graymap / pixmap — whitespace-separated
  decimal samples, ``#`` comments legal anywhere in the header and
  between ASCII samples;
- **P4**: binary bitmap, rows packed MSB-first to byte boundaries
  (1 = BLACK, the PBM rule — inverse of the usual convention);
- **P5/P6**: binary graymap / pixmap, one or two bytes per sample;
  two-byte samples are BIG-endian and legal for any maxval > 255;
- **P7**: PAM — header keywords (WIDTH/HEIGHT/DEPTH/MAXVAL/TUPLTYPE
  ... ENDHDR), depths 1-4 mapped as gray / gray+alpha / RGB / RGBA.

Samples scale to 8-bit by the rounding rule real converters use:
``(v * 255 + maxval // 2) // maxval`` (exact identity at maxval 255).
Output is the shared image-lane contract: (h, w, 4) uint8 RGBA.

``build_pnm`` is the independent synthesis writer (ASCII and binary
forms, comment injection, any maxval 1-65535, PAM).

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the image-lane codec registry
(imagecodec._CODECS).  Placement: per-payload work inside mapInPandas
Arrow batches (the codec boundary).
"""

from __future__ import annotations

import numpy as np

MAX_PNM_PIXELS = 1 << 26               # decompression-bomb guard


class PnmError(ValueError):
    """Malformed or out-of-scope NetPBM payload."""


_MAGICS = {b"P1", b"P2", b"P3", b"P4", b"P5", b"P6", b"P7"}


def is_pnm(b: bytes) -> bool:
    return (len(b) >= 3 and b[:2] in _MAGICS
            and b[2:3] in b" \t\r\n#")


class _Toks:
    """Header/ASCII-sample tokenizer: whitespace-separated fields,
    ``#`` comments running to end-of-line."""

    def __init__(self, b: bytes, i: int):
        self.b = b
        self.i = i

    def _skip(self) -> None:
        b, i, n = self.b, self.i, len(self.b)
        while i < n:
            c = b[i]
            if c in b" \t\r\n":
                i += 1
            elif c == 0x23:                      # '#'
                while i < n and b[i] not in b"\r\n":
                    i += 1
            else:
                break
        self.i = i

    def word(self) -> bytes:
        self._skip()
        b, i, n = self.b, self.i, len(self.b)
        j = i
        while j < n and b[j] not in b" \t\r\n":
            j += 1
        if j == i:
            raise PnmError("truncated NetPBM header")
        self.i = j
        return b[i:j]

    def number(self, what: str, lo: int = 0,
               hi: int = 1 << 31) -> int:
        w = self.word()
        if not w.isdigit():
            raise PnmError(f"bad NetPBM {what}: {w[:20]!r}")
        v = int(w)
        if not lo <= v <= hi:
            raise PnmError(f"NetPBM {what} {v} out of range")
        return v

    def raster_start(self) -> int:
        """Binary rasters begin after EXACTLY ONE whitespace byte
        following the last header field (the spec rule that keeps a
        raster starting with '#' or whitespace unambiguous)."""
        if self.i >= len(self.b) or self.b[self.i] not in b" \t\r\n":
            raise PnmError("missing raster separator")
        return self.i + 1


def _scale(arr: np.ndarray, maxval: int) -> np.ndarray:
    if maxval == 255:
        return arr.astype(np.uint8)
    return ((arr.astype(np.uint32) * 255 + maxval // 2)
            // maxval).astype(np.uint8)


def _to_rgba(plane: np.ndarray) -> np.ndarray:
    h, w, d = plane.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if d == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = plane[:, :, 0]
    elif d == 2:                                 # gray + alpha (PAM)
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = plane[:, :, 0]
        out[:, :, 3] = plane[:, :, 1]
    elif d == 3:
        out[:, :, :3] = plane
    else:
        out[:, :, :] = plane[:, :, :4]
    return out


def decode_pnm(b: bytes) -> np.ndarray:
    """Decode any P1-P7 payload to (h, w, 4) uint8 RGBA."""
    if not is_pnm(b):
        raise PnmError("not a NetPBM payload")
    kind = b[1:2]
    t = _Toks(b, 2)
    if kind == b"7":
        return _decode_pam(b, t)
    width = t.number("width", 1)
    height = t.number("height", 1)
    if width * height > MAX_PNM_PIXELS:
        raise PnmError("NetPBM dimensions exceed the pixel cap")
    depth = 3 if kind in (b"3", b"6") else 1
    bitmap = kind in (b"1", b"4")
    maxval = 1 if bitmap else t.number("maxval", 1, 65535)
    n = width * height * depth
    if kind in (b"1", b"2", b"3"):
        if kind == b"1":
            # P1 digits need no separators ("0110..." is legal)
            t._skip()
            vals = []
            i = t.i
            while len(vals) < n and i < len(b):
                c = b[i]
                if c in b"01":
                    vals.append(c - 0x30)
                    i += 1
                elif c in b" \t\r\n":
                    i += 1
                elif c == 0x23:
                    while i < len(b) and b[i] not in b"\r\n":
                        i += 1
                else:
                    raise PnmError(f"bad P1 raster byte {c:#x}")
            if len(vals) < n:
                raise PnmError("P1 raster short of declared size")
            arr = np.array(vals, dtype=np.uint16)
        else:
            vals = np.empty(n, dtype=np.uint32)
            for k in range(n):
                vals[k] = t.number("sample", 0, maxval)
            arr = vals
    else:
        start = t.raster_start()
        if bitmap:
            row_bytes = (width + 7) // 8
            need = row_bytes * height
            raw = b[start:start + need]
            if len(raw) < need:
                raise PnmError("P4 raster short of declared size")
            bits = np.unpackbits(np.frombuffer(
                raw, dtype=np.uint8).reshape(height, row_bytes),
                axis=1)[:, :width]
            arr = bits.reshape(-1).astype(np.uint16)
        else:
            two = maxval > 255
            need = n * (2 if two else 1)
            raw = b[start:start + need]
            if len(raw) < need:
                raise PnmError("raster short of declared size")
            arr = np.frombuffer(raw, dtype=">u2" if two else np.uint8)
            arr = arr.astype(np.uint32)
            if int(arr.max(initial=0)) > maxval:
                raise PnmError("sample exceeds declared maxval")
    if bitmap:
        # PBM: 1 = black, 0 = white
        plane = ((1 - arr.astype(np.int32)) * 255).astype(np.uint8)
    else:
        plane = _scale(arr, maxval)
    return _to_rgba(plane.reshape(height, width, depth))


_PAM_TUPL_DEPTH = {
    b"BLACKANDWHITE": 1, b"GRAYSCALE": 1, b"GRAYSCALE_ALPHA": 2,
    b"RGB": 3, b"RGB_ALPHA": 4,
}


def _decode_pam(b: bytes, t: _Toks) -> np.ndarray:
    width = height = depth = maxval = None
    while True:
        w = t.word()
        if w == b"ENDHDR":
            break
        if w == b"WIDTH":
            width = t.number("width", 1)
        elif w == b"HEIGHT":
            height = t.number("height", 1)
        elif w == b"DEPTH":
            depth = t.number("depth", 1, 4)
        elif w == b"MAXVAL":
            maxval = t.number("maxval", 1, 65535)
        elif w == b"TUPLTYPE":
            tt = t.word()
            if tt not in _PAM_TUPL_DEPTH:
                raise PnmError(f"PAM tuple type {tt!r} out of scope")
        else:
            raise PnmError(f"unknown PAM header field {w[:20]!r}")
    if None in (width, height, depth, maxval):
        raise PnmError("PAM header missing a required field")
    if width * height * depth > MAX_PNM_PIXELS:
        raise PnmError("PAM dimensions exceed the pixel cap")
    start = t.raster_start()
    two = maxval > 255
    need = width * height * depth * (2 if two else 1)
    raw = b[start:start + need]
    if len(raw) < need:
        raise PnmError("PAM raster short of declared size")
    arr = np.frombuffer(raw, dtype=">u2" if two else np.uint8)
    arr = arr.astype(np.uint32)
    if int(arr.max(initial=0)) > maxval:
        raise PnmError("sample exceeds declared maxval")
    return _to_rgba(
        _scale(arr, maxval).reshape(height, width, depth))


# -- synthesis writer ----------------------------------------------------------


def build_pnm(img: np.ndarray, kind: str = "P6", maxval: int = 255,
              comment: str | None = None) -> bytes:
    """Independent NetPBM writer.  ``img``: (h, w) gray or (h, w, 3)
    RGB with samples already in [0, maxval]; for P1/P4, nonzero =
    black.  ``kind``: any of P1-P6, or P7 for PAM ((h, w, 1..4)
    input)."""
    if kind not in ("P1", "P2", "P3", "P4", "P5", "P6", "P7"):
        raise PnmError(f"build_pnm kind {kind!r}")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, d = img.shape
    want_d = {"P1": 1, "P2": 1, "P3": 3, "P4": 1, "P5": 1, "P6": 3}
    if kind != "P7" and d != want_d[kind]:
        raise PnmError(f"{kind} needs depth {want_d[kind]}, got {d}")
    cm = f"# {comment}\n" if comment else ""
    flat = img.reshape(-1).astype(np.uint32)
    if kind == "P7":
        tt = {1: "GRAYSCALE", 2: "GRAYSCALE_ALPHA", 3: "RGB",
              4: "RGB_ALPHA"}[d]
        head = (f"P7\n{cm}WIDTH {w}\nHEIGHT {h}\nDEPTH {d}\n"
                f"MAXVAL {maxval}\nTUPLTYPE {tt}\nENDHDR\n").encode()
        body = (flat.astype(">u2") if maxval > 255
                else flat.astype(np.uint8)).tobytes()
        return head + body
    if kind in ("P1", "P4"):
        bits = (img[:, :, 0] > 0).astype(np.uint8)
        if kind == "P1":
            rows = "\n".join(
                " ".join(str(v) for v in row) for row in bits)
            return f"P1\n{cm}{w} {h}\n{rows}\n".encode()
        packed = np.packbits(bits, axis=1).tobytes()
        return f"P4\n{cm}{w} {h}\n".encode() + packed
    head = f"{kind}\n{cm}{w} {h}\n{maxval}\n".encode()
    if kind in ("P2", "P3"):
        vals = " ".join(str(v) for v in flat)
        return head + vals.encode() + b"\n"
    body = (flat.astype(">u2") if maxval > 255
            else flat.astype(np.uint8)).tobytes()
    return head + body
