"""JPEG codec tests — baseline + progressive (decoder: operators/jpeg.py).

The fixtures are produced by an INDEPENDENT from-scratch encoder defined
here (mirroring tests/test_png.py's pattern): its zig-zag order is derived
algorithmically (diagonal walk) rather than copied from the decoder's
table, its DCT is the direct O(N^4) textbook formula rather than the
decoder's matrix form, and its Huffman tables are equal-length canonical
codes built from observed symbol frequencies — so agreement between the
two is evidence of spec conformance, not shared code.
"""

from __future__ import annotations

import numpy as np
import pytest

from evm_archive_spark.operators.jpeg import JpegError, decode_jpeg, is_jpeg


# --------------------------------------------------------------------------
# independent encoder
# --------------------------------------------------------------------------


def zigzag_order():
    """Anti-diagonal walk (derived, not copied): odd diagonals run
    top-right -> bottom-left, even ones the reverse."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        order += diag if s % 2 else diag[::-1]
    return order


_ZZ = zigzag_order()

QL = np.array(  # simple quality-ish luma table (valid: any 1..255 works)
    [[16, 11, 10, 16, 24, 40, 51, 61],
     [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56],
     [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77],
     [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
QC = np.full((8, 8), 24, dtype=np.int32)
QC[:2, :2] = [[17, 18], [18, 21]]


def fdct(block):
    """Direct forward DCT-II (T.81 A.3.3 textbook formula)."""
    out = np.zeros((8, 8))
    xs = np.arange(8)
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for v in range(8):
            cv = (1 / np.sqrt(2)) if v == 0 else 1.0
            basis = np.outer(
                np.cos((2 * xs + 1) * u * np.pi / 16),
                np.cos((2 * xs + 1) * v * np.pi / 16),
            )
            out[u, v] = 0.25 * cu * cv * (block * basis).sum()
    return out


def _category(v):
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nacc = 0, 0

    def pad(self):
        while self.nacc:
            self.put(1, 1)  # pad with 1-bits per the spec


def _block_symbols(qblk):
    """(dc_category, ac_symbols) emitted for one quantized zig-zag block;
    qblk[0] must already be the DC DIFF."""
    dc = _category(qblk[0])
    acs = []
    run = 0
    last_nz = max([k for k in range(1, 64) if qblk[k]] or [0])
    for k in range(1, 64):
        if k > last_nz:
            acs.append(0x00)  # EOB
            break
        if qblk[k] == 0:
            run += 1
            if run == 16:
                acs.append(0xF0)
                run = 0
            continue
        acs.append((run << 4) | _category(qblk[k]))
        run = 0
    else:
        if last_nz == 63 and qblk[63]:
            pass  # block ended exactly on a coefficient: no EOB
    return dc, acs


def _amplitude(v):
    t = _category(v)
    return (v if v >= 0 else v + (1 << t) - 1), t


def _equal_len_table(symbols):
    """Equal-length canonical Huffman table over the observed symbol set:
    BITS has one populated length L with all codes, HUFFVAL is the sorted
    symbol list; the all-ones code stays unused (n <= 2^L - 1)."""
    vals = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(vals):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    code = {s: (i, L) for i, s in enumerate(vals)}
    return bits, bytes(vals), code


def _prepare(rgb, sampling=(1, 1), grayscale=False):
    """Shared color-convert/subsample/DCT/quantize stage: returns
    (comps, blocks, mcux, mcuy) where ``comps`` is
    [(cid, h, v, tq, plane)] and ``blocks[cid]`` is the MCU-padded 2d
    grid of zig-zag quantized-coefficient lists — both the baseline and
    the progressive writers serialize the SAME coefficients, which is
    what makes the equal-pixels cross-check meaningful."""
    h, w = rgb.shape[:2]
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    sh, sv = sampling
    if grayscale:
        comps = [(1, 1, 1, 0, y)]
    else:
        # chroma averaged over sh x sv boxes (pad first to multiples)
        def avg(p):
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return pp.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

        comps = [
            (1, sh, sv, 0, y),
            (2, 1, 1, 1, avg(cb)),
            (3, 1, 1, 1, avg(cr)),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    q_by_t = {0: QL, 1: QC}
    blocks = {}  # cid -> 2d list [row][col] of zig-zag int arrays
    for cid, ch, cv, tq, plane in comps:
        bw, bh = mcux * ch, mcuy * cv
        pad_h, pad_w = bh * 8, bw * 8
        pp = np.pad(
            plane,
            ((0, pad_h - plane.shape[0]), (0, pad_w - plane.shape[1])),
            mode="edge",
        )
        rows = []
        for by in range(bh):
            row = []
            for bx in range(bw):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = fdct(blk)
                qz = np.round(coef / q_by_t[tq]).astype(np.int64)
                row.append([qz[i, j] for (i, j) in _ZZ])
            rows.append(row)
        blocks[cid] = rows
    return comps, blocks, mcux, mcuy


def encode_jpeg(
    rgb: np.ndarray,
    sampling=(1, 1),
    restart_interval=0,
    grayscale=False,
    dqt_16bit=False,
):
    """From-scratch baseline JPEG encoder (test fixture generator).

    ``sampling`` is the (h, v) factor of the LUMA component relative to
    chroma — (1, 1) = 4:4:4, (2, 1) = 4:2:2, (2, 2) = 4:2:0."""
    h, w = rgb.shape[:2]
    comps, blocks, mcux, mcuy = _prepare(rgb, sampling, grayscale)

    # MCU walk twice: collect symbols, then write
    def mcu_blocks():
        n_mcu = mcux * mcuy
        for m in range(n_mcu):
            my, mx = divmod(m, mcux)
            if restart_interval and m and m % restart_interval == 0:
                yield ("RST", (m // restart_interval - 1) % 8, None, None)
            for cid, ch, cv, tq, _ in comps:
                for by in range(cv):
                    for bx in range(ch):
                        yield (
                            cid,
                            None,
                            blocks[cid][my * cv + by][mx * ch + bx],
                            tq,
                        )

    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    pred = {c[0]: 0 for c in comps}
    for cid, _, zz, tq in mcu_blocks():
        if cid == "RST":
            pred = {c[0]: 0 for c in comps}
            continue
        tclass = 0 if cid == 1 else 1
        diff = zz[0] - pred[cid]
        pred[cid] = zz[0]
        dzz = list(zz)
        dzz[0] = diff
        dc, acs = _block_symbols(dzz)
        dc_syms[tclass].append(dc)
        ac_syms[tclass].extend(acs)

    tables = {}
    for tclass in (0, 1):
        if not dc_syms[tclass]:
            continue
        tables[("dc", tclass)] = _equal_len_table(dc_syms[tclass])
        tables[("ac", tclass)] = _equal_len_table(ac_syms[tclass])

    import struct as st

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, QL), (1, QC)):
        if grayscale and tq == 1:
            continue
        zzq = [int(q[i, j]) for (i, j) in _ZZ]
        if dqt_16bit:
            seg(0xDB, bytes([0x10 | tq]) + b"".join(
                st.pack(">H", v) for v in zzq
            ))
        else:
            seg(0xDB, bytes([tq]) + bytes(zzq))

    sof = bytearray(st.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq, _ in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    seg(0xC0, bytes(sof))

    for (kind, tclass), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tclass]) + bytes(bits) + vals)

    if restart_interval:
        seg(0xDD, st.pack(">H", restart_interval))

    sos = bytearray([len(comps)])
    for cid, *_ in comps:
        tclass = 0 if cid == 1 else 1
        sos += bytes([cid, (tclass << 4) | tclass])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    bw_ = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    for cid, rst_m, zz, tq in mcu_blocks():
        if cid == "RST":
            bw_.pad()
            out.extend(bw_.out)
            bw_.out = bytearray()
            out.extend(bytes([0xFF, 0xD0 + rst_m]))
            pred = {c[0]: 0 for c in comps}
            continue
        tclass = 0 if cid == 1 else 1
        dc_code = tables[("dc", tclass)][2]
        ac_code = tables[("ac", tclass)][2]
        diff = zz[0] - pred[cid]
        pred[cid] = zz[0]
        t = _category(diff)
        c, ln = dc_code[t]
        bw_.put(c, ln)
        if t:
            amp, _ = _amplitude(diff)
            bw_.put(amp, t)
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
        for k in range(1, 64):
            if k > last_nz:
                c, ln = ac_code[0x00]
                bw_.put(c, ln)
                break
            v = zz[k]
            if v == 0:
                run += 1
                if run == 16:
                    c, ln = ac_code[0xF0]
                    bw_.put(c, ln)
                    run = 0
                continue
            s = _category(v)
            c, ln = ac_code[(run << 4) | s]
            bw_.put(c, ln)
            amp, _ = _amplitude(v)
            bw_.put(amp, s)
            run = 0
    bw_.pad()
    out.extend(bw_.out)
    out.extend(b"\xff\xd9")
    return bytes(out)




# --------------------------------------------------------------------------
# progressive encoder (scan-script writer for the SOF2 decoder paths)
# --------------------------------------------------------------------------


class _Stats:
    """First-pass sink: records Huffman symbols, discards raw bits."""

    def __init__(self):
        self.syms = []

    def sym(self, v):
        self.syms.append(v)

    def bits(self, v, n):
        pass

    def restart(self):
        pass


class _Emit:
    """Second-pass sink: writes Huffman codes + raw bits."""

    def __init__(self, bw, code):
        self.bw = bw
        self.code = code
        self.rst = 0

    def sym(self, v):
        c, ln = self.code[v]
        self.bw.put(c, ln)

    def bits(self, v, n):
        if n:
            self.bw.put(v, n)

    def restart(self):
        """Pad to a byte boundary and emit RSTm (m cycles 0-7 per scan)."""
        self.bw.pad()
        self.bw.out.extend(bytes([0xFF, 0xD0 + (self.rst & 7)]))
        self.rst += 1


def _dc_first_scan(sink, comps, blocks, mcux, mcuy, al, ri=0):
    pred = {c[0]: 0 for c in comps}
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            sink.restart()
            pred = {c[0]: 0 for c in comps}  # predictors reset per segment
        my, mx = divmod(m, mcux)
        for cid, ch, cv, _tq, _ in comps:
            for by in range(cv):
                for bx in range(ch):
                    zz = blocks[cid][my * cv + by][mx * ch + bx]
                    v = int(zz[0]) >> al  # DC point transform: arith shift
                    diff = v - pred[cid]
                    pred[cid] = v
                    t = _category(diff)
                    sink.sym(t)
                    amp, _ = _amplitude(diff)
                    sink.bits(amp, t)


def _dc_refine_scan(bw, comps, blocks, mcux, mcuy, al, ri=0, rst=None):
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            # raw-bit scan: pad + RSTm directly (no Huffman sink here)
            bw.pad()
            bw.out.extend(bytes([0xFF, 0xD0 + (rst[0] & 7)]))
            rst[0] += 1
        my, mx = divmod(m, mcux)
        for cid, ch, cv, _tq, _ in comps:
            for by in range(cv):
                for bx in range(ch):
                    zz = blocks[cid][my * cv + by][mx * ch + bx]
                    bw.put((int(zz[0]) >> al) & 1, 1)


def _noninterleaved_grid(w, h, ch, cv, hmax, vmax):
    cw = -(-(w * ch) // hmax)
    chh = -(-(h * cv) // vmax)
    return -(-cw // 8), -(-chh // 8)


def _ac_first_scan(sink, rows, nbw, nbh, ss, se, al, ri=0):
    state = {"eobrun": 0}

    def flush_eob():
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(n - (1 << r), r)
            state["eobrun"] = 0

    for row in range(nbh):
        for col in range(nbw):
            u = row * nbw + col
            if ri and u and u % ri == 0:
                flush_eob()  # EOB runs never cross a restart
                sink.restart()
            zz = rows[row][col]
            t = [
                (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> al)
                for k in range(ss, se + 1)
            ]
            if not any(t):
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            last_nz = max(i for i, v in enumerate(t) if v)
            for i, v in enumerate(t):
                if i > last_nz:
                    break
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    sink.sym(0xF0)
                    r -= 16
                s = _category(v)
                sink.sym((r << 4) | s)
                amp, _ = _amplitude(v)
                sink.bits(amp, s)
                r = 0
            if last_nz < len(t) - 1:
                state["eobrun"] += 1
    flush_eob()


def _ac_refine_scan(sink, rows, nbw, nbh, ss, se, al, ri=0):
    """Mirror of the decoder's G.1.2.3 correction-bit pass (the libjpeg
    encode_mcu_AC_refine structure): newly-significant coefficients emit
    run/1 + sign, history coefficients buffer correction bits flushed
    after the next emitted symbol; blocks ending in zeros/corrections
    fold into an EOB run whose buffered bits follow the EOBn symbol."""
    state = {"eobrun": 0, "br": []}

    def flush_eob():
        if state["eobrun"] or state["br"]:
            n = max(state["eobrun"], 1)
            r = n.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(n - (1 << r), r)
            for b in state["br"]:
                sink.bits(b, 1)
            state["eobrun"] = 0
            state["br"] = []

    for row in range(nbh):
        for col in range(nbw):
            u = row * nbw + col
            if ri and u and u % ri == 0:
                flush_eob()  # pending EOB run + correction bits flushed
                sink.restart()
            zz = rows[row][col]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for i, v in enumerate(absv):
                if v == 1:
                    eob = i
            r = 0
            br = []
            for i, v in enumerate(absv):
                if v == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush_eob()
                    sink.sym(0xF0)
                    for b in br:
                        sink.bits(b, 1)
                    br = []
                    r -= 16
                if v > 1:
                    br.append(v & 1)
                    continue
                # newly significant at this precision
                flush_eob()
                sink.sym((r << 4) | 1)
                sink.bits(1 if zz[ss + i] >= 0 else 0, 1)
                for b in br:
                    sink.bits(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                state["eobrun"] += 1
                state["br"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    rgb, sampling=(1, 1), grayscale=False, restart_interval=0
):
    """From-scratch PROGRESSIVE JPEG encoder (SOF2): the scan script is
    DC first (Al=1, interleaved) -> DC refinement -> per component AC
    first scans for bands 1..5 and 6..63 at Al=1 -> per component AC
    refinement scans for the same bands (Ah=1, Al=0) — exercising
    spectral selection, successive approximation, EOB runs, ZRL-in-
    refinement, and non-interleaved scan geometry.  Serializes the SAME
    quantized coefficients as encode_jpeg, so decoded pixels must be
    IDENTICAL to the baseline stream's."""
    import struct as st

    h, w = rgb.shape[:2]
    comps, blocks, mcux, mcuy = _prepare(rgb, sampling, grayscale)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(
            bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body
        )

    for tq, q in ((0, QL), (1, QC)):
        if grayscale and tq == 1:
            continue
        zzq = [int(q[i, j]) for (i, j) in _ZZ]
        seg(0xDB, bytes([tq]) + bytes(zzq))

    sof = bytearray(st.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq, _ in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    seg(0xC2, bytes(sof))
    ri = restart_interval
    if ri:
        seg(0xDD, st.pack(">H", ri))  # DRI applies to every scan below

    def emit_scan(scan_fn, scan_comps, ss, se, ah, al, tc, with_table):
        if with_table:
            stats = _Stats()
            scan_fn(stats)
            bits, vals, code = _equal_len_table(stats.syms or [0])
            seg(0xC4, bytes([(tc << 4) | 0]) + bytes(bits) + vals)
        sos = bytearray([len(scan_comps)])
        for cid, *_ in scan_comps:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        bw = _BitWriter()
        scan_fn(_Emit(bw, code) if with_table else bw)
        bw.pad()
        out.extend(bw.out)

    # 1. DC first, interleaved, Al=1
    emit_scan(
        lambda sk: _dc_first_scan(sk, comps, blocks, mcux, mcuy, 1, ri),
        comps, 0, 0, 0, 1, 0, True,
    )
    # 2. DC refinement (raw bits, no table)
    rstn = [0]
    emit_scan(
        lambda bw: _dc_refine_scan(bw, comps, blocks, mcux, mcuy, 0, ri, rstn),
        comps, 0, 0, 1, 0, 0, False,
    )
    # 3-4. AC first per component per band, Al=1
    for cid, ch, cv, tq, _ in comps:
        nbw, nbh = _noninterleaved_grid(w, h, ch, cv, hmax, vmax)
        for ss, se in ((1, 5), (6, 63)):
            emit_scan(
                lambda sk, c=cid, a=nbw, b=nbh, s0=ss, s1=se:
                    _ac_first_scan(sk, blocks[c], a, b, s0, s1, 1, ri),
                [(cid,)], ss, se, 0, 1, 1, True,
            )
    # 5-6. AC refinement per component per band, Ah=1 -> Al=0
    for cid, ch, cv, tq, _ in comps:
        nbw, nbh = _noninterleaved_grid(w, h, ch, cv, hmax, vmax)
        for ss, se in ((1, 5), (6, 63)):
            emit_scan(
                lambda sk, c=cid, a=nbw, b=nbh, s0=ss, s1=se:
                    _ac_refine_scan(sk, blocks[c], a, b, s0, s1, 0, ri),
                [(cid,)], ss, se, 1, 0, 1, True,
            )
    out.extend(b"\xff\xd9")
    return bytes(out)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def _rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    # smooth content (JPEG is lossy; smooth fields survive quantization)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 80 * np.sin(xx / 9.0),
            128 + 80 * np.cos(yy / 7.0),
            128 + 60 * np.sin((xx + yy) / 11.0),
        ],
        axis=2,
    )
    return np.clip(base + rng.normal(0, 2, size=(h, w, 3)), 0, 255).astype(
        np.uint8
    )


def test_sniff_and_flat_color_roundtrip():
    img = np.full((16, 24, 3), (90, 160, 40), dtype=np.uint8)
    data = encode_jpeg(img)
    assert is_jpeg(data) and not is_jpeg(b"\x89PNG")
    out = decode_jpeg(data)
    assert out.shape == (16, 24, 4)
    assert (out[:, :, 3] == 255).all()
    err = np.abs(out[:, :, :3].astype(int) - img.astype(int)).max()
    assert err <= 2, err  # flat field: quantization barely bites


def test_smooth_image_444_accuracy():
    img = _rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(
        out[:, :, :3].astype(float) - img.astype(float)
    ).mean()
    assert out.shape == (40, 56, 4)
    assert err < 4.0, err  # mean abs error small on smooth content


def test_subsampled_420_and_422():
    # gray content: chroma flat, so subsampling costs ~nothing and the
    # luma path is measured through the full MCU interleave logic
    g = _rgb(33, 41)[:, :, :1]  # odd dims exercise edge padding
    img = np.repeat(g, 3, axis=2)
    for sampling in ((2, 2), (2, 1)):
        out = decode_jpeg(encode_jpeg(img, sampling=sampling))
        assert out.shape == (33, 41, 4)
        err = np.abs(
            out[:, :, :3].astype(float) - img.astype(float)
        ).mean()
        assert err < 4.0, (sampling, err)


def test_grayscale_single_component():
    g = _rgb(24, 24)[:, :, :1]
    img = np.repeat(g, 3, axis=2)
    out = decode_jpeg(encode_jpeg(img, grayscale=True))
    assert (out[:, :, 0] == out[:, :, 1]).all()
    err = np.abs(out[:, :, 0].astype(float) - g[:, :, 0]).mean()
    assert err < 4.0, err


def test_restart_markers_do_not_change_pixels():
    img = _rgb(48, 32, seed=9)
    plain = decode_jpeg(encode_jpeg(img))
    restarted = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert (plain == restarted).all()


def test_16bit_dqt_precision():
    img = _rgb(24, 24, seed=5)
    a = decode_jpeg(encode_jpeg(img))
    b = decode_jpeg(encode_jpeg(img, dqt_16bit=True))
    assert (a == b).all()  # same tables, wider wire encoding


def test_rejections():
    img = _rgb(16, 16)
    good = bytearray(encode_jpeg(img))
    with pytest.raises(JpegError, match="signature"):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 -> SOF11 (lossless arithmetic — still out of scope;
    # SOF9/SOF10 arithmetic DCT processes decode for real since
    # jpegarith.py)
    i = good.index(b"\xff\xc0")
    lossless = good[:i] + b"\xff\xcb" + good[i + 2 :]
    with pytest.raises(JpegError, match="arithmetic"):
        decode_jpeg(bytes(lossless))
    with pytest.raises(JpegError, match="truncated|ran off|ended early"):
        decode_jpeg(bytes(good[:40]))
    # corrupt the sample precision byte (SOF payload starts after len)
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(JpegError, match="precision"):
        decode_jpeg(bytes(bad))


def test_zigzag_tables_agree():
    """The decoder's hardcoded ZIGZAG permutation equals the encoder's
    algorithmically derived diagonal walk — two derivations, one spec."""
    from evm_archive_spark.operators.jpeg import ZIGZAG

    derived = [r * 8 + c for (r, c) in _ZZ]
    # decoder's table maps zigzag index -> raster position
    assert list(ZIGZAG) == derived


# --------------------------------------------------------------------------
# strict-mode Spark paths (real JPEG decode through the mapInPandas
# contract — VERDICT r4 #5 'done' condition)
# --------------------------------------------------------------------------


def _media_df(spark, payloads):
    import pandas as pd

    pdf = pd.DataFrame(
        {"media_id": list(range(len(payloads))), "payload": payloads}
    )
    return spark.createDataFrame(pdf)


def _pooled_jpeg_through_decode_images_and_ahash(spark):
    """A real baseline JPEG through decode_images (true dims) and
    image_ahash (pixel-derived hash): a JPEG and a PNG of the SAME image
    hash identically (aHash is over decoded pixels, codec-invariant by
    construction), and an unrelated image is far away."""
    from evm_archive_spark.operators import multimodal
    from evm_archive_spark.operators.png import encode_png

    rng = np.random.default_rng(17)
    img = np.zeros((32, 48, 4), dtype=np.uint8)
    img[:, :, 3] = 255
    img[:16, :, :3] = 40
    img[16:, :, :3] = 210  # strong structure survives lossy encode
    other = rng.integers(0, 256, size=(32, 48, 4), dtype=np.uint8)
    other[:, :, 3] = 255

    jpeg_payload = encode_jpeg(img[:, :, :3])
    png_payload = encode_png(img)
    media = _media_df(spark, [jpeg_payload, png_payload, encode_jpeg(other[:, :, :3])])

    feats = {
        r["media_id"]: r
        for r in multimodal.decode_images(media, strict=True).collect()
    }
    assert (feats[0]["width"], feats[0]["height"]) == (48, 32)
    assert (feats[1]["width"], feats[1]["height"]) == (48, 32)

    hashes = {
        r["media_id"]: r["ahash"]
        for r in multimodal.image_ahash(media, strict=True).collect()
    }
    assert hashes[0] == hashes[1]  # codec-invariant perceptual hash
    mask64 = (1 << 64) - 1
    assert bin((hashes[0] ^ hashes[2]) & mask64).count("1") >= 10

    # frame_sample: a JPEG is its single frame, hashed over real pixels
    frames = multimodal.frame_sample(
        _media_df(spark, [jpeg_payload]), every_n=1, strict=True
    ).collect()
    assert len(frames) == 1 and frames[0]["frame_idx"] == 0

    # resize accepts JPEG input and emits real PNG at the target size
    from evm_archive_spark.operators.png import decode_png

    resized = multimodal.resize_images(
        _media_df(spark, [jpeg_payload]), 16, 12, strict=True
    ).collect()
    assert resized[0]["meta"]["mime"] == "image/png"
    assert decode_png(bytes(resized[0]["payload"])).shape == (12, 16, 4)


def _pooled_out_of_scope_jpeg_nonstrict_fallback(spark):
    """An out-of-scope JPEG process falls back to the deterministic
    fake at strict=False and raises at strict=True — the ADVICE r4
    never-fails contract on the codec boundary.  SOF9/SOF10
    (arithmetic DCT) decode for real since jpegarith.py, so the
    out-of-scope probe is SOF11 (lossless arithmetic)."""
    from evm_archive_spark.operators import multimodal

    img = _rgb(16, 16)
    good = bytearray(encode_jpeg(img))
    i = good.index(b"\xff\xc0")
    lossless = bytes(good[:i] + b"\xff\xcb" + good[i + 2 :])
    media = _media_df(spark, [lossless])

    rows = multimodal.image_ahash(media, strict=False).collect()
    assert len(rows) == 1  # no raise
    with pytest.raises(Exception, match="arithmetic"):
        multimodal.image_ahash(media, strict=True).collect()
    frames = multimodal.frame_sample(media, every_n=1, strict=False).collect()
    assert len(frames) >= 1
    with pytest.raises(Exception, match="arithmetic"):
        multimodal.frame_sample(media, every_n=1, strict=True).collect()


# --------------------------------------------------------------------------
# AVI/MJPEG container: real video frames through frame_sample
# --------------------------------------------------------------------------


def build_avi(frames, junk_chunk=False):
    """Independent minimal AVI writer (RIFF('AVI ', LIST hdrl, LIST movi))
    — the fixture generator for the container walk in operators/avi.py."""
    import struct

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi = b"movi"
    for i, f in enumerate(frames):
        if junk_chunk and i == 1:
            movi += chunk(b"01wb", b"\x01\x02\x03")  # audio chunk: skipped
        movi += chunk(b"00dc", f)
    hdrl = b"hdrl" + chunk(b"avih", b"\x00" * 56)
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frame_walk():
    from evm_archive_spark.operators.avi import (
        AviError, avi_frames, decode_avi_frames, is_avi,
    )

    f1 = encode_jpeg(_rgb(16, 24, seed=1))
    f2 = encode_jpeg(_rgb(16, 24, seed=2))
    avi = build_avi([f1, f2], junk_chunk=True)
    assert is_avi(avi) and not is_avi(f1)
    assert [(i, p) for i, p in avi_frames(avi)] == [(0, f1), (1, f2)]
    dec = list(decode_avi_frames(avi))
    assert [(i, w, h) for i, w, h, _ in dec] == [(0, 24, 16), (1, 24, 16)]
    # frame pixels equal the standalone decode of the same payload
    assert (dec[0][3] == decode_jpeg(f1)).all()
    with pytest.raises(AviError, match="movi|overruns"):
        list(avi_frames(avi[:40] + b"\x00" * 8))
    # non-MJPEG stream: named error, not silent garbage
    raw = build_avi([b"\x00" * 64])
    with pytest.raises(AviError, match="MJPEG"):
        list(decode_avi_frames(raw))


def _pooled_frame_sample_strict_real_avi(spark):
    """A real video container through the strict frame-sample path: the
    every_n-th MJPEG frames are decoded and pixel-hashed, and a frame
    hash equals the hash of the SAME image sampled from a standalone
    JPEG — container-invariant frame identity."""
    from evm_archive_spark.operators import multimodal

    imgs = [_rgb(16, 24, seed=s) for s in (1, 2, 3, 4)]
    frames = [encode_jpeg(im) for im in imgs]
    avi = build_avi(frames)
    media = _media_df(spark, [avi])
    got = {
        r["frame_idx"]: r["frame_hash"]
        for r in multimodal.frame_sample(
            media, every_n=2, strict=True
        ).collect()
    }
    assert sorted(got) == [0, 2]
    solo = multimodal.frame_sample(
        _media_df(spark, [frames[2]]), every_n=1, strict=True
    ).collect()
    assert solo[0]["frame_hash"] == got[2]
    # strict=False on a broken AVI: deterministic fake, no job failure
    broken = avi[:60]
    rows = multimodal.frame_sample(
        _media_df(spark, [broken]), every_n=1, strict=False
    ).collect()
    assert len(rows) >= 1



# --------------------------------------------------------------------------
# progressive (SOF2) decoding
# --------------------------------------------------------------------------


def test_progressive_equals_baseline_pixels():
    """The strong progressive pin: the progressive writer serializes the
    SAME quantized coefficients as the baseline writer, so the decoded
    pixels must be IDENTICAL — any error in DC successive approximation,
    EOB runs, spectral bands, refinement correction bits, or
    non-interleaved geometry shows up as a pixel diff against the
    already-validated baseline path."""
    cases = [
        ((40, 56), (1, 1), False),
        ((33, 41), (2, 2), False),   # 4:2:0, odd dims -> padded MCUs
        ((17, 25), (2, 1), False),   # 4:2:2 + nbw < storage-bw geometry
        ((24, 24), (1, 1), True),    # grayscale single component
    ]
    for (h, w), sampling, gray in cases:
        img = _rgb(h, w, seed=h * w)
        base = decode_jpeg(encode_jpeg(img, sampling=sampling,
                                       grayscale=gray))
        prog_bytes = encode_jpeg_progressive(img, sampling=sampling,
                                             grayscale=gray)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        # really multi-scan: count SOS markers
        n_scans = prog_bytes.count(b"\xff\xda")
        assert n_scans >= (4 if gray else 8), n_scans
        prog = decode_jpeg(prog_bytes)
        assert (prog == base).all(), (
            (h, w), sampling, gray,
            int(np.abs(prog.astype(int) - base.astype(int)).max()),
        )


def test_progressive_sparse_and_extreme_blocks():
    """Targeted coefficient patterns: flat blocks (all-EOB runs spanning
    many blocks), single-coefficient blocks (long zero runs + ZRL), and
    high-contrast blocks (refinement corrections on large values)."""
    flat = np.full((48, 48, 3), 77, dtype=np.uint8)
    stripe = np.zeros((48, 48, 3), dtype=np.uint8)
    stripe[::2] = 255  # maximal vertical frequency
    rng = np.random.default_rng(3)
    spots = np.full((48, 48, 3), 128, dtype=np.uint8)
    ys, xs = rng.integers(0, 48, 12), rng.integers(0, 48, 12)
    spots[ys, xs] = 255
    for img in (flat, stripe, spots):
        base = decode_jpeg(encode_jpeg(img))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert (prog == base).all()


def _pooled_progressive_through_spark_strict_paths(spark):
    """Progressive JPEG through the strict multimodal operators: same
    aHash as the baseline encoding of the same image (codec-invariant),
    true dimensions in decode_images."""
    from evm_archive_spark.operators import multimodal

    img = np.zeros((32, 48, 3), dtype=np.uint8)
    img[:16] = 40
    img[16:] = 210
    media = _media_df(
        spark, [encode_jpeg(img), encode_jpeg_progressive(img)]
    )
    hashes = [
        r["ahash"]
        for r in multimodal.image_ahash(media, strict=True).collect()
    ]
    assert hashes[0] == hashes[1]
    feats = multimodal.decode_images(media, strict=True).collect()
    assert all(
        (r["width"], r["height"]) == (48, 32) for r in feats
    )


def test_progressive_random_sweep():
    """Randomized shapes x samplings: every stream must reproduce its
    baseline twin exactly."""
    rng = np.random.default_rng(101)
    for trial in range(6):
        h = int(rng.integers(9, 50))
        w = int(rng.integers(9, 50))
        sampling = [(1, 1), (2, 1), (2, 2)][trial % 3]
        img = np.clip(
            rng.normal(128, 60, size=(h, w, 3)), 0, 255
        ).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, sampling=sampling))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, sampling=sampling)
        )
        assert (prog == base).all(), (trial, h, w, sampling)


def test_progressive_with_restart_intervals():
    """Progressive + DRI (the NOTES.md documented gap): restart markers
    inside every progressive scan kind — interleaved DC first (predictor
    reset), raw-bit DC refinement, AC first (EOB runs never crossing a
    segment), AC refinement (pending correction bits flushed) — must
    decode to the same pixels as the unrestarted progressive stream and
    the baseline stream of the same coefficients."""
    for seed, (h, w), sampling, gray in [
        (21, (40, 32), (1, 1), False),
        (22, (33, 41), (2, 2), False),   # odd dims + 4:2:0
        (23, (24, 24), (1, 1), True),
    ]:
        img = _rgb(h, w, seed=seed)
        base = decode_jpeg(encode_jpeg(img, sampling=sampling, grayscale=gray))
        for ri in (1, 2, 7):
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    img, sampling=sampling, grayscale=gray,
                    restart_interval=ri,
                )
            )
            assert (prog == base).all(), (seed, sampling, gray, ri)


def test_progressive_restart_sweep_random():
    rng = np.random.default_rng(77)
    for _ in range(6):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        sampling = [(1, 1), (2, 1), (2, 2)][int(rng.integers(0, 3))]
        ri = int(rng.integers(1, 9))
        img = _rgb(h, w, seed=int(rng.integers(0, 1 << 30)))
        base = decode_jpeg(encode_jpeg(img, sampling=sampling))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, sampling=sampling, restart_interval=ri)
        )
        assert (prog == base).all(), (h, w, sampling, ri)


def test_extended_sequential_sof1_decodes_as_baseline():
    """SOF1 (extended sequential, Huffman) at 8-bit precision is a
    strict superset of baseline: retagging a baseline file's SOF
    marker must decode to identical pixels, and libjpeg (when the
    harness is available) must agree the retagged file is valid."""
    img = _rgb(24, 16)
    base = encode_jpeg(img)
    i = base.index(b"\xff\xc0")
    ext = base[:i] + b"\xff\xc1" + base[i + 2:]
    assert np.array_equal(decode_jpeg(ext), decode_jpeg(base))
    try:
        from tests.test_jpegarith import _harness, _lib_dec
    except ImportError:
        from test_jpegarith import _harness, _lib_dec
    h = _harness()
    if h is not None:
        ref = _lib_dec(h, ext)
        ours = decode_jpeg(ext)[:, :, :3]
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
