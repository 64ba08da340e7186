"""X11 text-image formats: XBM and XPM — from scratch, stdlib + numpy
(public formats: the X11 bitmap C-source convention and XPM 3).

Both are C source files carrying pixels — ubiquitous in source trees,
tarballs and old web assets, and exactly the kind of payload a crawl
extraction lane must not feed to a compiler:

- **XBM**: ``#define <name>_width W`` / ``_height H`` and a
  ``<name>_bits[]`` array of byte literals; rows padded to whole
  bytes, bits LSB-FIRST within each byte (the inverse of PBM), 1 =
  foreground (rendered black);
- **XPM 3**: ``/* XPM */`` magic, a values row ``"W H ncolors cpp"``,
  ``ncolors`` rows mapping a ``cpp``-character key to a color
  (``c #RRGGBB`` / ``c #RGB`` / a few named colors / ``None`` =
  transparent; the ``c`` visual preferred over ``m``/``g``), then H
  row strings of W*cpp characters.

Output is the shared image-lane contract: (h, w, 4) uint8 RGBA.
``build_xbm`` / ``build_xpm`` are the independent synthesis writers.

Reference parity note: the reference (SummaryDev/evm-archive) stores
media as opaque bytea; this extends the image-lane codec registry
(imagecodec._CODECS).  Placement: per-payload work inside mapInPandas
Arrow batches (the codec boundary).
"""

from __future__ import annotations

import re

import numpy as np

MAX_XIM_PIXELS = 1 << 24


class XimError(ValueError):
    """Malformed or out-of-scope XBM/XPM payload."""


_XBM_SNIFF = re.compile(
    rb"#define\s+\w+_width\s+\d+", re.DOTALL)
_XPM_SNIFF = re.compile(rb"/\*\s*XPM\s*\*/")


def is_xbm(b: bytes) -> bool:
    head = b[:512]
    return bool(_XBM_SNIFF.search(head)) and b"_bits[]" in b[:4096]


def is_xpm(b: bytes) -> bool:
    return bool(_XPM_SNIFF.search(b[:64]))


def decode_xbm(b: bytes) -> np.ndarray:
    """XBM C source -> (h, w, 4) RGBA (foreground black on white)."""
    text = b.decode("ascii", "replace")
    mw = re.search(r"#define\s+\w+_width\s+(\d+)", text)
    mh = re.search(r"#define\s+\w+_height\s+(\d+)", text)
    if not mw or not mh:
        raise XimError("XBM missing width/height defines")
    w, h = int(mw.group(1)), int(mh.group(1))
    if not w or not h or w * h > MAX_XIM_PIXELS:
        raise XimError("XBM dimensions out of range")
    mb = re.search(r"_bits\[\]\s*=\s*\{(.*?)\}", text, re.DOTALL)
    if not mb:
        raise XimError("XBM missing bits array")
    vals = []
    for tok in mb.group(1).split(","):
        tok = tok.strip()
        if not tok:
            continue
        try:
            v = int(tok, 0)
        except ValueError as e:
            raise XimError(f"bad XBM byte literal {tok[:12]!r}") from e
        if not 0 <= v <= 255:
            raise XimError(f"XBM byte {v} out of range")
        vals.append(v)
    row_bytes = (w + 7) // 8
    if len(vals) < row_bytes * h:
        raise XimError("XBM bits array short of width*height")
    raw = np.array(vals[:row_bytes * h], dtype=np.uint8).reshape(
        h, row_bytes)
    bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :w]
    out = np.empty((h, w, 4), dtype=np.uint8)
    g = ((1 - bits) * 255).astype(np.uint8)      # 1 = foreground/black
    out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
    out[:, :, 3] = 255
    return out


_NAMED = {
    "black": (0, 0, 0), "white": (255, 255, 255),
    "red": (255, 0, 0), "green": (0, 255, 0), "blue": (0, 0, 255),
    "gray": (190, 190, 190), "grey": (190, 190, 190),
    "yellow": (255, 255, 0), "none": None,
}


def _xpm_color(spec: str):
    s = spec.strip()
    if s.startswith("#"):
        hx = s[1:]
        if len(hx) == 6:
            return tuple(int(hx[i:i + 2], 16) for i in (0, 2, 4))
        if len(hx) == 3:
            return tuple(int(c * 2, 16) for c in hx)
        if len(hx) == 12:                        # 16-bit components
            return tuple(int(hx[i:i + 4], 16) >> 8 for i in (0, 4, 8))
        raise XimError(f"bad XPM hex color {s!r}")
    low = s.lower()
    if low in _NAMED:
        return _NAMED[low]
    raise XimError(f"XPM color {s!r} out of scope")


def decode_xpm(b: bytes) -> np.ndarray:
    """XPM 3 C source -> (h, w, 4) RGBA (``None`` colors -> alpha 0)."""
    text = b.decode("utf-8", "replace")
    if not _XPM_SNIFF.search(text[:64].encode()):
        raise XimError("not an XPM payload")
    strings = re.findall(r'"((?:[^"\\]|\\.)*)"', text)
    if not strings:
        raise XimError("XPM carries no strings")
    head = strings[0].split()
    if len(head) < 4:
        raise XimError(f"bad XPM values row {strings[0]!r}")
    try:
        w, h, nc, cpp = (int(x) for x in head[:4])
    except ValueError as e:
        raise XimError("non-numeric XPM values row") from e
    if not w or not h or w * h > MAX_XIM_PIXELS \
            or not 1 <= cpp <= 4 or not 1 <= nc <= 1 << 16:
        raise XimError("XPM values out of range")
    if len(strings) < 1 + nc + h:
        raise XimError("XPM string count short of declared layout")
    cmap: dict[str, tuple | None] = {}
    for row in strings[1:1 + nc]:
        key, rest = row[:cpp], row[cpp:]
        toks = rest.split()
        # prefer the 'c' (color) visual; fall back to m/g/g4
        color = None
        chosen = False
        for vis in ("c", "m", "g", "g4"):
            for i, t in enumerate(toks):
                if t == vis and i + 1 < len(toks):
                    color = _xpm_color(toks[i + 1])
                    chosen = True
                    break
            if chosen:
                break
        if not chosen:
            raise XimError(f"XPM color row without a visual: {row!r}")
        cmap[key] = color
    out = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        row = strings[1 + nc + y]
        if len(row) < w * cpp:
            raise XimError(f"XPM pixel row {y} short of width")
        for x in range(w):
            key = row[x * cpp:(x + 1) * cpp]
            if key not in cmap:
                raise XimError(f"XPM pixel key {key!r} unmapped")
            c = cmap[key]
            if c is None:
                continue                         # transparent
            out[y, x, 0], out[y, x, 1], out[y, x, 2] = c
            out[y, x, 3] = 255
    return out


# -- synthesis writers ---------------------------------------------------------


def build_xbm(bits: np.ndarray, name: str = "synth") -> bytes:
    """(h, w) array, nonzero = foreground; the standard C layout."""
    h, w = bits.shape
    packed = np.packbits((bits > 0).astype(np.uint8), axis=1,
                         bitorder="little")
    body = ", ".join(f"0x{v:02x}" for v in packed.reshape(-1))
    return (f"#define {name}_width {w}\n"
            f"#define {name}_height {h}\n"
            f"static unsigned char {name}_bits[] = {{\n"
            f"   {body}}};\n").encode()


def build_xpm(img: np.ndarray, name: str = "synth",
              cpp: int = 1, transparent=None) -> bytes:
    """(h, w, 3) RGB (+ optional ``transparent`` boolean mask) to an
    XPM 3 C source; palette derived from the distinct colors."""
    h, w = img.shape[:2]
    colors = {}
    keys = ("abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.#")
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            if transparent is not None and transparent[y, x]:
                c = None
            else:
                c = tuple(int(v) for v in img[y, x, :3])
            if c not in colors:
                k = len(colors)
                if k >= len(keys) ** cpp:
                    raise XimError("too many colors for cpp")
                key = "".join(
                    keys[(k // len(keys) ** p) % len(keys)]
                    for p in range(cpp))
                colors[c] = key
            row.append(colors[c])
        rows.append("".join(row))
    lines = [f'"{w} {h} {len(colors)} {cpp}"']
    for c, key in colors.items():
        spec = "None" if c is None else f"#{c[0]:02X}{c[1]:02X}{c[2]:02X}"
        lines.append(f'"{key} c {spec}"')
    lines += [f'"{r}"' for r in rows]
    return ("/* XPM */\n"
            f"static char *{name}[] = {{\n"
            + ",\n".join(lines) + "};\n").encode()
