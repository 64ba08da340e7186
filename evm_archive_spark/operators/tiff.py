"""Baseline TIFF decoder — from scratch, stdlib + numpy.

Implements the public TIFF 6.0 specification's baseline subset plus
extensions: header + IFD walk (both byte orders), strip-based AND
tiled image organization (tiles are what DNG raws and GeoTIFFs use;
edge tiles padded, predictor reset per tile; bilevel tiles included),
bilevel/grayscale/palette/RGB(A) photometric interpretations at
1/8/16-bit depths (16-bit samples downshift to their high byte for
the RGBA contract, both byte orders, predictor mod-65536; palette
INDICES stay full-width — 16-bit palettes address up to 65536
entries), planar configuration 2 (plane-separated strips AND tiles:
the tile table carries SamplesPerPixel x TilesPerImage entries, all
of plane 0's first), and
Compression 1 (none), 5 (LZW with horizontal differencing predictor),
8/32946 (Deflate/zlib, both the official and legacy tags), 32773
(PackBits), and 7 (new-style JPEG-in-TIFF: each strip/tile a complete
JPEG bitstream, optional JPEGTables splice — with SOF3 payloads this
is the DNG raw layout, and the shared jpeg.py dispatch handles
baseline/progressive/arithmetic/lossless streams alike); 2/3/4
(CCITT fax: Modified Huffman rows, Group 3 per the T4Options flag,
Group 4 MMR — the scanned-document compressions, via ccittfax.py);
and 6 (old-style JPEG, the deprecated TIFF 6.0 §22 layout — both the
JPEGInterchangeFormat whole-stream form and the per-strip FRAGMENT
form: one scan's entropy split across strips at restart markers,
tables in tags 512/515/517-521/530, reassembled exactly).

Scope notes (clear errors, no silent wrong pixels): CCITT
uncompressed mode, old-JPEG fragment writers whose strips are not
restart-aligned, and Quantum-era oddities raise ``TiffError`` naming
the gap.  Output matches the other codecs' contract: (h, w, 4) uint8
RGBA.

TIFF's LZW differs from GIF's: codes are MSB-first, code width starts
at 9 and bumps at dictionary sizes 511/1023/2047 (one EARLIER than the
power of two — the spec's famous "off-by-one"), and strings are byte
sequences with 256=Clear, 257=EOI.

Reference parity note: the reference stores media as opaque bytea and
never decodes; this backs the strict=True multimodal paths for
``image/tiff`` payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from .codecerrors import guard


class TiffError(Exception):
    """Malformed or out-of-scope TIFF payload."""


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


# baseline tags
_TAGS = {
    256: "width", 257: "height", 258: "bits_per_sample",
    259: "compression", 262: "photometric", 273: "strip_offsets",
    277: "samples_per_pixel", 278: "rows_per_strip",
    279: "strip_byte_counts", 317: "predictor", 320: "colormap",
    322: "tile_width", 323: "tile_length", 324: "tile_offsets",
    325: "tile_byte_counts", 338: "extra_samples",
    284: "planar_config", 347: "jpeg_tables",
    292: "t4_options", 293: "t6_options",
    513: "jpeg_interchange", 514: "jpeg_interchange_length",
    512: "jpeg_proc", 515: "jpeg_restart_interval",
    517: "jpeg_lossless_predictors", 518: "jpeg_point_transforms",
    519: "jpeg_q_tables", 520: "jpeg_dc_tables", 521: "jpeg_ac_tables",
    530: "ycbcr_subsampling",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, off: int, bo: str) -> dict:
    if off + 2 > len(data):
        raise TiffError("truncated IFD")
    (n,) = struct.unpack_from(bo + "H", data, off)
    fields = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            raise TiffError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        voff = e + 8 if total <= 4 else struct.unpack_from(
            bo + "I", data, e + 8
        )[0]
        raw = data[voff : voff + total]
        if len(raw) < total:
            raise TiffError(f"tag {tag}: value overruns payload")
        if typ in (3, 8):
            vals = struct.unpack_from(f"{bo}{cnt}H", raw)
        elif typ in (4, 9):
            vals = struct.unpack_from(f"{bo}{cnt}I", raw)
        elif typ in (1, 6, 7):
            vals = tuple(raw)
        else:
            vals = (raw,)
        name = _TAGS.get(tag)
        if name:
            fields[name] = vals
    return fields


def _lzw_decode_tiff(data: bytes, max_out: int,
                     early: bool = True) -> bytes:
    """TIFF-flavor LZW: MSB-first variable codes, 256=Clear 257=EOI,
    width bumps one code EARLY (at table sizes 510/1022/2046 + first).
    ``early=False`` is the PDF LZWDecode EarlyChange=0 variant (width
    bumps one code later); pdf.py reuses this decoder."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    while len(out) < max_out:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise TiffError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise TiffError("LZW: code beyond table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early width bump (TIFF writes the longer code one step early)
        if len(table) + (1 if early else 0) >= (1 << width) \
                and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise TiffError("PackBits: truncated run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


@guard(TiffError)
def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD as an (h, w, 4) uint8 RGBA array."""
    if not is_tiff(data):
        raise TiffError("bad signature: not a TIFF payload")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    return _decode_ifd(data, ifd_off, bo)


MAX_TIFF_PAGES = 4096


@guard(TiffError)
def tiff_pages(data: bytes):
    """Every page of a multi-page TIFF (the scanned-document shape:
    one IFD per page on the next-IFD chain) as a list of (h, w, 4)
    uint8 RGBA arrays, round 10.  A single-page TIFF yields one
    entry; a broken chain (cycle, overrun) is typed."""
    if not is_tiff(data):
        raise TiffError("bad signature: not a TIFF payload")
    bo = "<" if data[:2] == b"II" else ">"
    (off,) = struct.unpack_from(bo + "I", data, 4)
    seen: set[int] = set()
    pages = []
    while off:
        if off in seen or len(seen) >= MAX_TIFF_PAGES:
            raise TiffError("TIFF IFD chain cycles or over cap")
        seen.add(off)
        pages.append(_decode_ifd(data, off, bo))
        if off + 2 > len(data):
            raise TiffError("truncated IFD")
        (n,) = struct.unpack_from(bo + "H", data, off)
        nxt = off + 2 + 12 * n
        if nxt + 4 > len(data):
            raise TiffError("truncated next-IFD pointer")
        (off,) = struct.unpack_from(bo + "I", data, nxt)
    return pages


def _ojpeg_reassemble(data: bytes, f: dict, height: int, width: int,
                      rows_per_strip: int, frags: list[bytes]) -> bytes:
    """TIFF 6.0 §22 per-strip old-JPEG fragments -> one interchange
    stream.  The fragment layout is a SINGLE scan split at restart
    markers across the strips (DC prediction resets per strip via the
    restart), with the tables and frame geometry carried by tags
    512/515/517-521/530 instead of in-stream markers.  Reassembly is
    exact: synthesize SOI + DQT/DHT from the table tags + DRI + SOF +
    SOS, then join the fragments with the cycling RSTn markers the
    writer omitted.  Writers whose strips are NOT restart-aligned
    (no JPEGRestartInterval with multiple strips, strip boundaries off
    interval boundaries) are truly divergent and stay typed."""
    proc = f.get("jpeg_proc", (1,))[0]
    photo = f.get("photometric", (1,))[0]
    spp = f.get("samples_per_pixel", (1,))[0]
    bps = f.get("bits_per_sample", (8,) * spp)
    prec = bps[0]
    ri = f.get("jpeg_restart_interval", (0,))[0]
    if proc not in (1, 14):
        raise TiffError(f"old-JPEG process {proc} not supported "
                        "(baseline 1 / lossless 14)")
    if proc == 1 and prec != 8:
        raise TiffError("old-JPEG baseline requires 8-bit samples")
    if photo == 6 and spp == 3:
        sub = f.get("ycbcr_subsampling", (2, 2))
        samp = [(sub[0], sub[1]), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * spp
    if proc == 14:
        mcu_w = mcu_h = 1                       # one sample per MCU
    else:
        mcu_w = 8 * max(s[0] for s in samp)
        mcu_h = 8 * max(s[1] for s in samp)
    mcus_per_row = -(-width // mcu_w)
    if len(frags) > 1:
        if not ri:
            raise TiffError(
                "old-JPEG fragments without a JPEGRestartInterval "
                "are writer-divergent (no defined strip boundary "
                "semantics)")
        if rows_per_strip % mcu_h:
            raise TiffError(
                "old-JPEG strip height off the MCU grid not supported")
        mcus_per_strip = mcus_per_row * (rows_per_strip // mcu_h)
        if mcus_per_strip % ri:
            raise TiffError(
                "old-JPEG strip boundaries off restart boundaries "
                "are writer-divergent")
    else:
        mcus_per_strip = mcus_per_row * max(
            1, -(-height // mcu_h))

    def tag_tables(name: str, qt: bool) -> list[bytes]:
        out = []
        for o in f.get(name, ()):
            if qt:
                if o + 64 > len(data):
                    raise TiffError("old-JPEG quant table overruns "
                                    "payload")
                out.append(data[o:o + 64])
            else:
                if o + 16 > len(data):
                    raise TiffError("old-JPEG Huffman table overruns "
                                    "payload")
                nv = sum(data[o:o + 16])
                if o + 16 + nv > len(data):
                    raise TiffError("old-JPEG Huffman table overruns "
                                    "payload")
                out.append(data[o:o + 16 + nv])
        return out

    qts = tag_tables("jpeg_q_tables", qt=True)
    dcs = tag_tables("jpeg_dc_tables", qt=False)
    acs = tag_tables("jpeg_ac_tables", qt=False)
    if len(dcs) < spp or (proc == 1 and (len(qts) < spp
                                         or len(acs) < spp)):
        raise TiffError("old-JPEG fragment layout missing table tags")

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker])
                   + struct.pack(">H", len(body) + 2) + body)

    if proc == 1:
        for i in range(spp):
            seg(0xDB, bytes([i]) + qts[i])
    for i in range(spp):
        seg(0xC4, bytes([i]) + dcs[i])           # class 0, id i
    if proc == 1:
        for i in range(spp):
            seg(0xC4, bytes([0x10 | i]) + acs[i])
    if ri:
        seg(0xDD, struct.pack(">H", ri))
    body = struct.pack(">BHHB", prec, height, width, spp)
    for i in range(spp):
        body += bytes([i + 1, (samp[i][0] << 4) | samp[i][1],
                       i if proc == 1 else 0])
    seg(0xC0 if proc == 1 else 0xC3, body)
    sos = bytes([spp])
    for i in range(spp):
        sos += bytes([i + 1, (i << 4) | (i if proc == 1 else 0)])
    if proc == 1:
        sos += bytes([0, 63, 0])
    else:
        preds = f.get("jpeg_lossless_predictors", (1,) * spp)
        pts = f.get("jpeg_point_transforms", (0,) * spp)
        if len(set(preds[:spp])) != 1 or len(set(pts[:spp])) != 1:
            raise TiffError(
                "old-JPEG per-component lossless predictors/point "
                "transforms cannot share one scan")
        sos += bytes([preds[0], 0, pts[0]])
    seg(0xDA, sos)
    ips = mcus_per_strip // ri if ri else 1      # intervals per strip
    for k, frag in enumerate(frags):
        out += frag
        if k < len(frags) - 1:
            out += bytes([0xFF, 0xD0 + (ips * (k + 1) - 1) % 8])
    out += b"\xff\xd9"
    return bytes(out)


def _decode_ifd(data: bytes, ifd_off: int, bo: str) -> np.ndarray:
    f = _read_ifd(data, ifd_off, bo)
    tiled = "tile_width" in f
    try:
        width = f["width"][0]
        height = f["height"][0]
        if f.get("compression", (1,))[0] == 6:
            # old-JPEG: the whole-stream form often carries NO strip
            # tables; the per-strip fragment form (r11) does
            offsets = f.get("strip_offsets", ())
            counts = f.get("strip_byte_counts", ())
        elif tiled:
            offsets = f["tile_offsets"]
            counts = f["tile_byte_counts"]
        else:
            offsets = f["strip_offsets"]
            counts = f["strip_byte_counts"]
    except KeyError as e:
        raise TiffError(f"missing required tag {e}") from e
    comp = f.get("compression", (1,))[0]
    photo = f.get("photometric", (1,))[0]
    spp = f.get("samples_per_pixel", (1,))[0]
    bps = f.get("bits_per_sample", (1,) * spp)
    planar = f.get("planar_config", (1,))[0]
    rows_per_strip = f.get("rows_per_strip", (height,))[0] or height
    predictor = f.get("predictor", (1,))[0]
    if planar not in (1, 2):
        raise TiffError(f"planar configuration {planar} not supported")
    if comp not in (1, 5, 8, 32946, 32773, 7, 2, 3, 4, 6):
        raise TiffError(
            f"compression {comp} not supported "
            "(none/CCITT/LZW/Deflate/PackBits/JPEG only)"
        )
    if comp == 6:
        # old-style JPEG (TIFF 6.0 §22, deprecated), two recoverable
        # layouts: ONE complete stream behind JPEGInterchangeFormat/
        # -Length (round 10), or the per-strip FRAGMENT form (r11) —
        # one scan split at restart markers across the strips, with
        # tables/dimensions carried by the 51x tags.  The fragment
        # form is what 1990s scanner fleets actually wrote.
        ji = f.get("jpeg_interchange", ())
        jl = f.get("jpeg_interchange_length", ())
        from .jpeg import JpegError, decode_jpeg

        if ji and jl:
            stream = data[ji[0]: ji[0] + jl[0]]
            if len(stream) < jl[0]:
                raise TiffError("old-JPEG interchange stream overruns "
                                "payload")
        else:
            if not offsets or not counts:
                raise TiffError(
                    "old-JPEG without a JPEGInterchangeFormat stream "
                    "or strip fragments not supported")
            frags = []
            for o, c in zip(offsets, counts):
                if o + c > len(data):
                    raise TiffError("old-JPEG fragment overruns "
                                    "payload")
                frags.append(data[o:o + c])
            stream = _ojpeg_reassemble(
                data, f, height, width, rows_per_strip, frags)
        try:
            rgba = decode_jpeg(bytes(stream))
        except JpegError as e:
            raise TiffError(f"old-JPEG stream: {e}") from e
        if rgba.shape[0] < height or rgba.shape[1] < width:
            raise TiffError("old-JPEG stream smaller than declared")
        return np.ascontiguousarray(rgba[:height, :width])
    if comp in (2, 3, 4):
        # CCITT fax (round 10): MH rows / Group 3 / Group 4 via the
        # shared T.4/T.6 codecs
        if bps != (1,) or spp != 1:
            raise TiffError("CCITT compression requires bilevel data")
        t4opts = f.get("t4_options", (0,))[0]
        t6opts = f.get("t6_options", (0,))[0]
        if (comp == 3 and t4opts & 2) or (comp == 4 and t6opts & 2):
            raise TiffError("CCITT uncompressed mode not supported")
    if bps and len(set(bps)) != 1:
        raise TiffError(f"mixed bits-per-sample {bps} not supported")
    if bps[0] not in (1, 8, 16) or (bps[0] == 1 and spp != 1):
        raise TiffError(
            f"bits-per-sample {bps} not supported (1, 8 or 16)")
    itemsize = 2 if bps[0] == 16 else 1
    u16 = np.dtype(bo + "u2")
    if planar == 2 and spp == 1:
        # single-sample "separated" planes are byte-identical to the
        # chunky layout; real writers emit the tag anyway (r12)
        planar = 1
    if planar == 2 and (comp == 7 or bps[0] == 1):
        raise TiffError(
            "planar configuration 2 only supported for 8/16-bit "
            "multi-sample images")
    if comp == 7:
        # new-style JPEG-in-TIFF (TIFF/EP, and the DNG layout when the
        # strips carry SOF3 lossless streams): each strip is a complete
        # JPEG bitstream; an optional JPEGTables tag holds an
        # abbreviated tables-only stream spliced in after each strip's
        # SOI.  JPEG photometrics (6 = YCbCr) come back as RGB from
        # the decoder.
        tables = bytes(f.get("jpeg_tables", ()))
        if tables and not (
                tables[:2] == b"\xff\xd8" and tables[-2:] == b"\xff\xd9"):
            raise TiffError("malformed JPEGTables stream")
        if spp not in (1, 3) or bps[0] != 8:
            raise TiffError(
                f"JPEG-compressed TIFF with {spp} samples at "
                f"{bps[0]} bits not supported")
        if photo == 6:
            photo = 2 if spp == 3 else 1
        predictor = 1          # horizontal differencing never applies

    def inflate_chunk(chunk: bytes, want: int, what: str) -> bytes:
        """One strip/tile through the byte-oriented compressions, with
        the output CAPPED at the expected size (a crafted tiny chunk
        can otherwise expand to gigabytes on untrusted corpora)."""
        if comp == 1:
            if len(chunk) < want:
                raise TiffError(f"uncompressed {what} short")
            return chunk[:want]
        if comp == 5:
            return _lzw_decode_tiff(chunk, want)
        if comp in (8, 32946):  # Deflate (official 8 / legacy 32946)
            try:
                return zlib.decompressobj().decompress(bytes(chunk), want)
            except zlib.error as e:
                raise TiffError(f"deflate {what}: {e}") from e
        return _packbits_decode(chunk, want)

    def jpeg_pixels(chunk: bytes, need_h: int, need_w: int, what: str):
        from .jpeg import JpegError, decode_jpeg

        stream = bytes(chunk)
        if tables:
            stream = tables[:-2] + stream[2:]
        try:
            rgba = decode_jpeg(stream)
        except JpegError as e:
            raise TiffError(f"JPEG {what}: {e}") from e
        if rgba.shape[0] < need_h or rgba.shape[1] < need_w:
            raise TiffError(f"JPEG {what} smaller than declared")
        if spp == 1:
            # a gray-declared TIFF must carry a grayscale JPEG — our
            # 1-component decode emits R==G==B by construction, so a
            # channel mismatch means a (malformed) color stream and
            # returning channel 0 would silently yield the red plane
            # (r9 ADVICE)
            if not (np.array_equal(rgba[:, :, 0], rgba[:, :, 1])
                    and np.array_equal(rgba[:, :, 1], rgba[:, :, 2])):
                raise TiffError(
                    f"color JPEG {what} inside gray-declared TIFF")
            return rgba[:, :, 0:1]
        return rgba[:, :, :3]

    if tiled:
        # tiled organization (what DNG raws and GeoTIFFs use): a grid
        # of fixed (tw, th) tiles, edge tiles padded to full size; the
        # horizontal predictor resets per tile ROW within each tile
        tw = f["tile_width"][0]
        th = f.get("tile_length", (0,))[0]
        if not tw or not th:
            raise TiffError("bad tile dimensions")
        ta = -(-width // tw)
        td = -(-height // th)
        if ta * td > (1 << 20):
            raise TiffError("tile count over cap")
        # PlanarConfiguration 2 (r11): the tile table carries
        # SamplesPerPixel x TilesPerImage entries, all of plane 0's
        # tiles first; each tile holds ONE plane and the predictor
        # resets per tile per plane
        n_planes = spp if planar == 2 else 1
        spp_t = 1 if planar == 2 else spp
        if len(offsets) < ta * td * n_planes \
                or len(counts) < ta * td * n_planes:
            raise TiffError("tile tables shorter than the tile grid")
        bilevel_grid = bps[0] == 1
        tile_bytes = ((tw + 7) // 8 * th if bilevel_grid
                      else tw * th * spp_t * itemsize)
        px = np.zeros((height, width, spp),
                      dtype=np.uint16 if itemsize == 2 else np.uint8)
        for tg in range(ta * td * n_planes):
            pi, ti = divmod(tg, ta * td)
            off, cnt = offsets[tg], counts[tg]
            chunk = data[off: off + cnt]
            if len(chunk) < cnt:
                raise TiffError("tile overruns payload")
            ty, tx = divmod(ti, ta)
            hh = min(th, height - ty * th)
            ww = min(tw, width - tx * tw)
            if comp == 7:
                tile = jpeg_pixels(chunk, hh, ww, "tile")
            elif comp in (2, 3, 4):
                # CCITT tiles (round 10): each tile an independent fax
                # stream at the full tile width
                from .ccittfax import (
                    CcittError,
                    decode_g3,
                    decode_g4,
                    decode_mh,
                )

                try:
                    if comp == 2:
                        packed = decode_mh(chunk, tw, th)
                    elif comp == 3:
                        packed = decode_g3(chunk, tw, th,
                                           two_d=bool(t4opts & 1))
                    else:
                        packed = decode_g4(chunk, tw, th)
                except CcittError as e:
                    raise TiffError(f"CCITT tile: {e}") from e
                bits = np.unpackbits(packed, axis=1)[:, :tw]
                tile = (bits * 255 if photo == 1
                        else (1 - bits) * 255).astype(
                            np.uint8)[:, :, None]
            else:
                dec = inflate_chunk(chunk, tile_bytes, "tile")
                if len(dec) < tile_bytes:
                    raise TiffError("tile decode short of expected size")
                if bilevel_grid:
                    # bilevel tiles (round 10): 1-bit rows padded to
                    # byte boundaries per tile row
                    bits = np.unpackbits(np.frombuffer(
                        dec[:tile_bytes], dtype=np.uint8).reshape(
                            th, -1), axis=1)[:, :tw]
                    tile = (bits * 255 if photo == 1
                            else (1 - bits) * 255).astype(
                                np.uint8)[:, :, None]
                elif itemsize == 2:
                    tile = np.frombuffer(
                        dec[:tile_bytes], dtype=u16).reshape(
                            th, tw, spp_t)
                    if predictor == 2:
                        tile = np.cumsum(
                            tile.astype(np.uint64), axis=1).astype(
                                np.uint16)
                else:
                    tile = np.frombuffer(
                        dec[:tile_bytes], dtype=np.uint8
                    ).reshape(th, tw, spp_t)
                    if predictor == 2:
                        tile = np.cumsum(
                            tile.astype(np.uint32), axis=1).astype(
                                np.uint8)
            if planar == 2:
                px[ty * th: ty * th + hh, tx * tw: tx * tw + ww, pi] \
                    = tile[:hh, :ww, 0]
            else:
                px[ty * th: ty * th + hh, tx * tw: tx * tw + ww] = \
                    tile[:hh, :ww]
        if itemsize == 2 and photo != 3:
            px = (px >> 8).astype(np.uint8)     # MSB, libtiff's rule
        if bilevel_grid:
            photo = 1                           # already display-mapped
        spp_eff = spp
    else:
        def read_strips(offs, cnts, row_bytes, samples):
            raw = bytearray()
            row0 = 0
            for off, cnt in zip(offs, cnts):
                strip = data[off: off + cnt]
                if len(strip) < cnt:
                    raise TiffError("strip overruns payload")
                nrows = min(rows_per_strip, height - row0)
                want = row_bytes * nrows
                if comp == 7:
                    pix = jpeg_pixels(strip, nrows, width, "strip")
                    dec = np.ascontiguousarray(
                        pix[:nrows, :width]).tobytes()
                elif comp in (2, 3, 4):
                    from .ccittfax import (
                        CcittError,
                        decode_g3,
                        decode_g4,
                        decode_mh,
                    )

                    try:
                        if comp == 2:
                            packed = decode_mh(strip, width, nrows)
                        elif comp == 3:
                            packed = decode_g3(strip, width, nrows,
                                               two_d=bool(t4opts & 1))
                        else:
                            packed = decode_g4(strip, width, nrows)
                    except CcittError as e:
                        raise TiffError(f"CCITT strip: {e}") from e
                    dec = packed.tobytes()
                else:
                    dec = inflate_chunk(strip, want, "strip")
                if len(dec) < want:
                    raise TiffError("strip decode short of expected size")
                raw += dec[:want]
                row0 += nrows
            if row0 < height:
                raise TiffError("strips cover fewer rows than ImageLength")
            arr = np.frombuffer(
                bytes(raw), dtype=u16 if itemsize == 2 else np.uint8)
            return arr.reshape(height, -1, samples) \
                if bps[0] != 1 else arr

        def undiff(arr):
            """Horizontal predictor: per-channel cumsum along width."""
            if predictor != 2:
                return arr
            wide = np.uint64 if itemsize == 2 else np.uint32
            return np.cumsum(arr.astype(wide), axis=1).astype(
                np.uint16 if itemsize == 2 else np.uint8)

        if bps[0] == 1:
            raw = read_strips(
                offsets, counts, (width + 7) // 8, 1)
            bits = np.unpackbits(raw.reshape(height, -1),
                                 axis=1)[:, :width]
            # photometric 0: 0=white; 1: 0=black
            g = (bits * 255 if photo == 1 else (1 - bits) * 255).astype(
                np.uint8
            )
            px = g[:, :, None]
            photo = 1                           # already display-mapped
            spp_eff = 1
        elif planar == 2:
            # planar organization (round 10): strips hold one sample
            # plane each, all of plane 0's strips first (TIFF 6.0
            # PlanarConfiguration 2); predictor applies per plane
            spp_strips = -(-height // rows_per_strip)
            if len(offsets) < spp * spp_strips \
                    or len(counts) < spp * spp_strips:
                raise TiffError(
                    "planar strip tables shorter than planes x strips")
            planes = []
            for p in range(spp):
                sl = slice(p * spp_strips, (p + 1) * spp_strips)
                plane = read_strips(
                    offsets[sl], counts[sl], width * itemsize, 1)
                planes.append(undiff(plane)[:, :, 0])
            px = np.stack(planes, axis=-1)
            spp_eff = spp
        else:
            px = undiff(read_strips(
                offsets, counts, width * spp * itemsize, spp))
            spp_eff = spp
        if itemsize == 2 and bps[0] == 16 and photo != 3:
            px = (px >> 8).astype(np.uint8)     # MSB, libtiff's rule

    out = np.empty((height, width, 4), dtype=np.uint8)
    out[:, :, 3] = 255
    if photo == 3:  # palette
        # 8-bit and (r11) 16-bit indices: the lookup sees the FULL
        # index width (the >>8 display downshift above must not apply
        # to indices — a 16-bit palette has up to 65536 entries)
        if bps[0] not in (8, 16):
            raise TiffError(
                f"palette TIFF at {bps[0]} bits not supported")
        cmap = f.get("colormap")
        if not cmap:
            raise TiffError("palette image without ColorMap")
        cm = np.array(cmap[0] if len(cmap) == 1 else cmap, dtype=np.uint32)
        n = cm.size // 3
        r, g, b = cm[:n], cm[n : 2 * n], cm[2 * n :]
        idx = px[:, :, 0]
        if idx.max(initial=0) >= n:
            raise TiffError("palette index out of range")
        out[:, :, 0] = (r[idx] >> 8).astype(np.uint8)
        out[:, :, 1] = (g[idx] >> 8).astype(np.uint8)
        out[:, :, 2] = (b[idx] >> 8).astype(np.uint8)
    elif photo in (0, 1) and spp_eff == 1:
        g = px[:, :, 0]
        if photo == 0 and bps[0] >= 8:
            g = 255 - g
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = g
    elif photo == 2 and spp_eff >= 3:
        out[:, :, :3] = px[:, :, :3]
        if spp_eff >= 4:
            out[:, :, 3] = px[:, :, 3]
    else:
        raise TiffError(
            f"photometric {photo} with {spp_eff} samples not supported"
        )
    return out
