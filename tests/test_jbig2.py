"""JBIG2 (T.88) generic-region codec: MQ coder, templates, TPGDON,
MMR arm, segment layer, typed boundaries, golden freeze.

Pin strategy mirrors test_jpegls (no system JBIG2 exists in-env): the
MMR arm is byte-identical T.6 and transits the libtiff-pinned ccittfax
machinery; the MQ arm gets exhaustive round-trip fuzz + golden freeze
+ truncation fuzz."""

import hashlib

import numpy as np
import pytest

from evm_archive_spark.operators.jbig2 import (
    Jbig2Error,
    MqDecoder,
    MqEncoder,
    NOMINAL_AT,
    decode_embedded,
    decode_generic,
    encode_embedded,
    encode_generic,
)


def _pattern(h, w, seed=0):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((seed * 131 + ys * 17 + xs * 29) % 5) < 2).astype(np.uint8)


def test_mq_coder_round_trip_fuzz():
    """The MQ coder round-trips arbitrary bit sequences through
    arbitrary context streams, including streams that emit 0xFF bytes
    (exercising the 7-bit BYTEIN/BYTEOUT convention) and carry
    propagation."""
    rng = np.random.default_rng(11)
    saw_ff = False
    for trial in range(40):
        n = int(rng.integers(1, 2000))
        ncx = int(rng.integers(1, 16))
        bits = rng.integers(0, 2, n).tolist()
        cxs = rng.integers(0, ncx, n).tolist()
        enc = MqEncoder()
        st = [0] * ncx
        for b, c in zip(bits, cxs):
            enc.encode(st, c, int(b))
        data = enc.flush()
        saw_ff = saw_ff or (0xFF in data)
        dec = MqDecoder(data)
        st2 = [0] * ncx
        got = [dec.decode(st2, c) for c in cxs]
        assert got == [int(b) for b in bits], trial
    assert saw_ff  # the stuffing path was actually exercised


def test_generic_region_all_templates_round_trip():
    rng = np.random.default_rng(3)
    for tpl in (0, 1, 2, 3):
        for tp in (False, True):
            for density in (0.05, 0.5, 0.95):
                h, w = int(rng.integers(1, 48)), int(rng.integers(1, 80))
                bits = (rng.random((h, w)) < density).astype(np.uint8)
                enc = encode_generic(bits, template=tpl, tpgdon=tp)
                dec = decode_generic(enc, w, h, template=tpl, tpgdon=tp)
                assert (dec == bits).all(), (tpl, tp, density)


def test_generic_region_non_nominal_at_pixels():
    rng = np.random.default_rng(5)
    bits = (rng.random((25, 41)) < 0.4).astype(np.uint8)
    for tpl, at in [
        (0, ((-5, -3), (1, -4), (7, -2), (-8, -1))),
        (1, ((-127, -1),)),
        (2, ((0, -2),)),
        (3, ((-1, -2),)),
    ]:
        enc = encode_generic(bits, template=tpl, at=at)
        assert (decode_generic(enc, 41, 25, template=tpl, at=at)
                == bits).all(), tpl
    # non-causal AT pixel refuses typed
    with pytest.raises(Jbig2Error, match="causal"):
        encode_generic(bits, template=2, at=((1, 0),))
    with pytest.raises(Jbig2Error, match="AT pixels"):
        encode_generic(bits, template=0, at=((1, -1),))


def test_tpgdon_compresses_repeated_rows():
    """TPGDON's whole point: a repeated row costs ~1 SLTP bit instead
    of a row of context decisions.  The row must be RANDOM — for a
    periodic row the adaptive contexts learn the repetition and the
    plain coder is already near-free (measured: 21 bytes for 300
    repeats of a 400-px periodic row)."""
    rng = np.random.default_rng(2)
    row = (rng.random((1, 1200)) < 0.5).astype(np.uint8)
    img = np.repeat(row, 150, axis=0)
    plain = encode_generic(img, tpgdon=False)
    typical = encode_generic(img, tpgdon=True)
    assert len(typical) * 3 < len(plain), (len(typical), len(plain))
    assert (decode_generic(typical, 1200, 150, tpgdon=True) == img).all()


def test_embedded_stream_arith_and_mmr_and_comb_ops():
    bits = _pattern(19, 37, seed=4)
    for mmr in (False, True):
        out = decode_embedded(encode_embedded(bits, mmr=mmr))
        assert out.shape == (19, 37) and (out == bits).all(), mmr
    # REPLACE / XOR / AND / XNOR composition onto the blank page
    for comb, expect in [(4, bits), (2, bits), (0, bits),
                         (1, np.zeros_like(bits)),
                         (3, 1 - bits)]:
        out = decode_embedded(encode_embedded(bits, comb_op=comb))
        assert (out == expect).all(), comb


def test_embedded_without_page_info_sizes_from_region():
    bits = _pattern(8, 16, seed=2)
    s = encode_embedded(bits)
    # strip the page-info segment (11-byte header + 19-byte payload)
    no_page = s[30:]
    assert (decode_embedded(no_page) == bits).all()


def test_typed_boundaries():
    bits = _pattern(6, 10)
    s = encode_embedded(bits)
    # halftone segment type is a NAMED NotImplementedError (symbol
    # dictionaries LANDED r13 — a truncated one is typed instead)
    import struct
    sym = struct.pack(">IB", 9, 22) + bytes([0]) + bytes([1]) \
        + struct.pack(">I", 0)
    with pytest.raises(NotImplementedError, match="halftone"):
        decode_embedded(sym + s)
    trunc = struct.pack(">IB", 9, 0) + bytes([0]) + bytes([1]) \
        + struct.pack(">I", 0)
    with pytest.raises(Jbig2Error, match="truncated symbol"):
        decode_embedded(trunc + s)
    # unknown-length segment
    unk = struct.pack(">IB", 9, 38) + bytes([0]) + bytes([1]) \
        + struct.pack(">I", 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="unknown-length"):
        decode_embedded(unk)
    # striped page (unknown height)
    page = struct.pack(">IIIIBH", 10, 0xFFFFFFFF, 0, 0, 0, 0)
    seg = struct.pack(">IB", 1, 48) + bytes([0]) + bytes([1]) \
        + struct.pack(">I", len(page)) + page
    with pytest.raises(NotImplementedError, match="striped"):
        decode_embedded(seg)
    # crafted giant region must refuse fast, not allocate
    huge = struct.pack(">IIII", 1 << 20, 1 << 20, 0, 0) + b"\x00\x00"
    seg = struct.pack(">IB", 1, 38) + bytes([0]) + bytes([1]) \
        + struct.pack(">I", len(huge)) + huge
    with pytest.raises(Jbig2Error, match="dimensions"):
        decode_embedded(seg)
    with pytest.raises(Jbig2Error, match="no page"):
        decode_embedded(b"")


def test_truncation_and_corruption_fuzz_stays_typed():
    """Every prefix/corruption either decodes to SOME bitmap (the MQ
    marker rule feeds 1-bits past the end) or raises a typed error —
    never IndexError/struct.error/OverflowError."""
    bits = _pattern(12, 23, seed=7)
    s = encode_embedded(bits)
    for cut in range(0, len(s), 9):
        try:
            decode_embedded(s[:cut])
        except (Jbig2Error, NotImplementedError):
            pass
    rng = np.random.default_rng(13)
    for _ in range(24):
        mut = bytearray(s)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(0, len(mut)))] = int(
                rng.integers(0, 256))
        try:
            decode_embedded(bytes(mut))
        except (Jbig2Error, NotImplementedError):
            pass


def test_golden_freeze():
    """Frozen encoded bytes for a fixed bitmap: any silent bitstream
    drift (coder tables, context layout, segment framing) fails here.
    Re-freezing requires a deliberate decision."""
    img = _pattern(24, 40, seed=12)
    s = encode_embedded(img, tpgdon=True)
    assert (decode_embedded(s) == img).all()
    assert hashlib.sha256(s).hexdigest() == (
        "b1b12fec31eb1623d7fd21050ed3db347db954b74f2963a99076fe71d83279cc")
    s2 = encode_embedded(img, template=2)
    assert hashlib.sha256(s2).hexdigest() == (
        "5c13d3e6773ed9845c7e2809b47d840eabef7f284afb4b81b4b92373e02da720")


def test_nominal_at_table_shape():
    assert {k: len(v) for k, v in NOMINAL_AT.items()} == \
        {0: 4, 1: 1, 2: 1, 3: 1}


def test_symbol_dict_and_text_region_end_to_end():
    """r13 second wave: a glyph alphabet coded once in a symbol
    dictionary, instances placed by an immediate text region (the
    scanned-text shape) — exact page reproduction, and dictionary
    reuse beats generic coding on repetitive pages."""
    import numpy as np

    from evm_archive_spark.operators.jbig2 import (
        decode_embedded, encode_embedded, encode_embedded_text)

    rng = np.random.default_rng(8)
    glyphs = [(rng.random((int(rng.integers(4, 12)),
                           int(rng.integers(3, 10)))) < 0.5
               ).astype(np.uint8) for _ in range(12)]
    W, H = 200, 100
    placements, expected = [], np.zeros((H, W), dtype=np.uint8)
    x, y = 2, 3
    for _ in range(60):
        sid = int(rng.integers(0, len(glyphs)))
        g = glyphs[sid]
        if x + g.shape[1] + 1 >= W:
            x, y = 2, y + 14
        if y + g.shape[0] >= H:
            break
        placements.append((sid, x, y))
        expected[y:y + g.shape[0], x:x + g.shape[1]] |= g
        x += g.shape[1] + 2
    s = encode_embedded_text(glyphs, placements, W, H)
    out = decode_embedded(s)
    assert out.shape == (H, W) and (out == expected).all()
    # dictionary reuse: repetitive content codes smaller than the
    # generic coder on the SAME page
    generic = encode_embedded(expected)
    assert len(s) < len(generic), (len(s), len(generic))


def test_symbol_dict_typed_gaps_and_integer_coder():
    import struct

    import numpy as np

    from evm_archive_spark.operators.jbig2 import (
        MqDecoder, MqEncoder, OOB, _IntCtx, decode_embedded,
        decode_symbol_dict, encode_embedded_text)

    # Annex-A integer coder round trip across every range line
    vals = [0, 1, -1, 3, 4, 19, 20, -83, 84, 339, 340, -4435, 4436,
            100000, -2**20, OOB]
    enc = MqEncoder()
    c = _IntCtx()
    for v in vals:
        c.encode(enc, v)
    data = enc.flush()
    dec = MqDecoder(data)
    c2 = _IntCtx()
    got = [c2.decode(dec) for _ in vals]
    assert got == vals
    # SDHUFF / SDREFAGG stay NAMED gaps
    with pytest.raises(NotImplementedError, match="SDHUFF"):
        decode_symbol_dict(struct.pack(">H", 1) + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="SDREFAGG"):
        decode_symbol_dict(struct.pack(">H", 2) + b"\x00" * 20)
    # truncation of a text stream stays typed
    g = np.ones((3, 3), dtype=np.uint8)
    s = encode_embedded_text([g], [(0, 1, 1)], 8, 8)
    for cut in range(0, len(s), 5):
        try:
            decode_embedded(s[:cut])
        except (Jbig2Error, NotImplementedError):
            pass


def test_text_page_golden_freeze():
    import numpy as np

    from evm_archive_spark.operators.jbig2 import encode_embedded_text

    a = np.array([[1, 0, 1], [0, 1, 0], [1, 1, 1]], dtype=np.uint8)
    b = np.array([[1, 1], [1, 0], [0, 1], [1, 1]], dtype=np.uint8)
    s = encode_embedded_text([a, b], [(0, 1, 1), (1, 6, 2), (0, 10, 1)],
                             16, 8)
    assert hashlib.sha256(s).hexdigest() == ("1988f3bbfc9b87f9dc7e14de6ed7822a27b4f2bde91ee5afe9e799236dce475f")


def test_review_r13_export_run_dos_is_typed():
    """Review r13: a crafted symbol dictionary emitting endless
    zero-length IAEX export runs must raise quickly (the MQ decoder
    never runs out of input — past end-of-data it feeds 1-bits), not
    hang the task."""
    import struct
    import time

    import numpy as np

    from evm_archive_spark.operators.jbig2 import (
        MqEncoder, NOMINAL_AT, _IntCtx, _resolve_template,
        decode_symbol_dict, encode_generic)

    mq = MqEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    gb = [0] * (1 << len(_resolve_template(0, NOMINAL_AT[0])))
    iadh.encode(mq, 3)
    iadw.encode(mq, 3)
    encode_generic(np.ones((3, 3), dtype=np.uint8), 0, None, False,
                   mq=mq, stats=gb)
    from evm_archive_spark.operators.jbig2 import OOB
    iadw.encode(mq, OOB)
    for _ in range(500):
        iaex.encode(mq, 0)          # zero-run spam, never advancing
    head = struct.pack(">H", 0)
    head += b"".join(struct.pack("bb", ax, ay) for ax, ay in
                     NOMINAL_AT[0])
    head += struct.pack(">II", 1, 1)
    t0 = time.monotonic()
    with pytest.raises(Jbig2Error, match="no progress"):
        decode_symbol_dict(head + mq.flush())
    assert time.monotonic() - t0 < 5


def test_review_r13_shared_dictionary_imports():
    """Review r13: a symbol dictionary that IMPORTS a referred
    dictionary's exports (SDINSYMS — the /JBIG2Globals shared-dict
    pattern) re-exports input + new symbols; the text region then
    indexes the combined list."""
    import struct

    import numpy as np

    from evm_archive_spark.operators.jbig2 import (
        MqEncoder, NOMINAL_AT, OOB, _IntCtx, _resolve_template,
        _segment, decode_embedded, encode_symbol_dict,
        encode_text_region)

    a = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.uint8)
    b = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)
    dict_a = encode_symbol_dict([a])
    # dict B: 1 new symbol, exports input(A) + new(B) -> runs (0, 2)
    mq = MqEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    from evm_archive_spark.operators.jbig2 import encode_generic
    gb = [0] * (1 << len(_resolve_template(0, NOMINAL_AT[0])))
    iadh.encode(mq, 3)
    iadw.encode(mq, 3)
    encode_generic(b, 0, None, False, mq=mq, stats=gb)
    iadw.encode(mq, OOB)
    iaex.encode(mq, 0)
    iaex.encode(mq, 2)
    head = struct.pack(">H", 0)
    head += bytes(sum((list(struct.pack("bb", ax, ay))
                       for ax, ay in NOMINAL_AT[0]), []))
    head += struct.pack(">II", 2, 1)       # n_ex=2, n_new=1
    dict_b = head + mq.flush()
    page_info = struct.pack(">IIIIBH", 16, 6, 0, 0, 0, 0)
    tr = encode_text_region(16, 6, [(0, 1, 1, 3, 3), (1, 6, 1, 3, 3)],
                            2)
    stream = (_segment(1, 48, 1, page_info)
              + _segment(2, 0, 1, dict_a)
              + _segment(3, 0, 1, dict_b, referred=(2,))
              + _segment(4, 7, 1, tr, referred=(3,))
              + _segment(5, 49, 1, b""))
    out = decode_embedded(stream)
    expected = np.zeros((6, 16), dtype=np.uint8)
    expected[1:4, 1:4] |= a
    expected[1:4, 6:9] |= b
    assert (out == expected).all()


def test_refinement_regions_round_trip_and_page_flow():
    """r13 third wave: generic refinement regions (T.88 6.3) — both
    templates, TPGRON on/off, sparse-flip targets; and the page-level
    lossy->lossless flow (generic coarse region + type-43 refinement
    to the exact bitmap)."""
    import struct

    import numpy as np

    from evm_archive_spark.operators.jbig2 import (
        _segment, decode_embedded, decode_refinement, encode_embedded,
        encode_generic, encode_refinement, encode_refinement_segment)

    rng = np.random.default_rng(5)
    for t in range(4):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 60))
        ref = (rng.random((h, w)) < 0.5).astype(np.uint8)
        tgt = ref.copy()
        tgt[rng.random((h, w)) < 0.05] ^= 1
        for tpl in (0, 1):
            for tp in (False, True):
                enc = encode_refinement(tgt, ref, template=tpl,
                                        tpgron=tp)
                assert (decode_refinement(enc, ref, template=tpl,
                                          tpgron=tp) == tgt).all()
    # near-identical refinement codes far smaller than generic
    ref = (rng.random((60, 80)) < 0.5).astype(np.uint8)
    tgt = ref.copy()
    tgt[10, 10] ^= 1
    assert len(encode_refinement(tgt, ref, tpgron=True)) * 2 < \
        len(encode_generic(tgt))
    # page flow: coarse generic region + refinement -> exact
    coarse = (rng.random((30, 50)) < 0.5).astype(np.uint8)
    exact = coarse.copy()
    exact[rng.random((30, 50)) < 0.06] ^= 1
    page_info = struct.pack(">IIIIBH", 50, 30, 0, 0, 0, 0)
    gen = encode_embedded(coarse)[30:]
    seg = encode_refinement_segment(exact, 0, 0, tpgron=True,
                                    ref=coarse)
    stream = (_segment(1, 48, 1, page_info) + gen[:-11]
              + _segment(9, 43, 1, seg) + _segment(10, 49, 1, b""))
    assert (decode_embedded(stream) == exact).all()
    # a refinement with no page beneath it is typed
    alone = _segment(1, 43, 1, seg)
    with pytest.raises(Jbig2Error, match="outside page|no page"):
        decode_embedded(alone)
