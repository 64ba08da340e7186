"""Cross-document exact substring dedup (dedup.cross_doc_span_dedup):
positional winnowing + keep-first anchor pairing + maximal exact
extension + island merge.  The q_span_dedup gate covers the planted-
family construction; these tests pin the semantics the gate can't:
maximal extension edges, overlapping-span merge, short/empty docs,
and the winnowing guarantee threshold."""

from __future__ import annotations

from evm_archive_spark.operators.dedup import cross_doc_span_dedup


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in cross_doc_span_dedup(df, **kw).collect()}


def _check_keep_first_and_exact_extension(spark):
    shared = " ".join(f"s{i}" for i in range(1, 11))  # 10 tokens
    out = _run(
        spark,
        [
            (1, "a1 a2 a3 " + shared + " a4"),
            (2, "b1 " + shared + " b2 b3"),
        ],
        k=5,
        window=4,
    )
    assert out[1].n_removed == 0 and "s1" in out[1].text_out
    # the FULL 10-token span goes, not just the anchored 5-gram
    assert out[2].text_out == "b1 b2 b3"
    assert out[2].n_removed == 10 and out[2].n_tokens == 13


def _check_overlapping_spans_merge(spark):
    # doc 3 shares one run with doc 1 and an overlapping run with doc 2;
    # the merged island must not double-remove or leave residue
    r1 = " ".join(f"x{i}" for i in range(1, 9))  # x1..x8
    r2 = " ".join(f"x{i}" for i in range(5, 13))  # x5..x12 (overlaps)
    full = " ".join(f"x{i}" for i in range(1, 13))  # x1..x12
    out = _run(
        spark,
        [(1, r1 + " q1 q2"), (2, "p1 p2 " + r2), (3, full + " t1")],
        k=5,
        window=4,
    )
    assert out[3].text_out == "t1"
    assert out[3].n_removed == 12


def _check_below_threshold_runs_survive(spark):
    # shared run of 7 tokens < k + window - 1 = 8: no guarantee, and
    # with unique salt context the winnow picks salted grams, so the
    # run must survive untouched
    shared = " ".join(f"s{i}" for i in range(1, 8))  # 7 tokens
    out = _run(
        spark,
        [
            (1, "a1 a2 a3 a4 " + shared + " a5 a6 a7 a8"),
            (2, "b1 b2 b3 b4 " + shared + " b5 b6 b7 b8"),
        ],
        k=5,
        window=4,
    )
    # not guaranteed removable; implementation must keep both intact
    # only if no common anchor was selected — assert it never removes
    # from the FIRST document at least, and totals stay consistent
    assert out[1].n_removed == 0
    assert out[1].n_tokens == 15 and out[2].n_tokens == 15


def _check_short_and_empty_docs(spark):
    out = _run(
        spark,
        [(1, None), (2, ""), (3, "one two"), (4, "one two")],
        k=5,
        window=4,
    )
    assert out[1].text_out == "" and out[1].n_tokens == 0
    assert out[2].text_out == "" and out[2].n_tokens == 0
    # docs shorter than k produce no grams -> nothing to remove
    assert out[3].n_removed == 0 and out[4].n_removed == 0


def _check_whole_doc_duplicate_removes_everything(spark):
    shared = " ".join(f"w{i}" for i in range(1, 9))
    out = _run(spark, [(1, shared), (2, shared)], k=5, window=4)
    assert out[1].n_removed == 0
    assert out[2].text_out == "" and out[2].n_removed == 8


def _check_three_way_duplicate_keeps_only_min(spark):
    shared = " ".join(f"z{i}" for i in range(1, 10))
    out = _run(
        spark,
        [
            (5, "a0 " + shared),
            (7, "b0 " + shared + " b1"),
            (9, shared + " c0"),
        ],
        k=5,
        window=4,
    )
    assert out[5].n_removed == 0
    assert out[7].text_out == "b0 b1"
    assert out[9].text_out == "c0"


def _pooled_spandedup_module(spark):
    """Pooled runner (the test_operators_pooled_heavy pattern): the
    independent checks above run through a thread pool as one pytest
    item — identical coverage, a fraction of the wall clock."""
    import inspect
    import pathlib
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    def run(fn):
        try:
            kwargs = {}
            if "tmp_path" in inspect.signature(fn).parameters:
                kwargs["tmp_path"] = pathlib.Path(tempfile.mkdtemp())
            fn(spark, **kwargs)
            return fn.__name__, None
        except Exception as e:  # noqa: BLE001 — aggregated below
            return fn.__name__, f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, [_check_keep_first_and_exact_extension, _check_overlapping_spans_merge, _check_below_threshold_runs_survive, _check_short_and_empty_docs, _check_whole_doc_duplicate_removes_everything, _check_three_way_duplicate_keeps_only_min, _check_fuzz_vs_python_reference]))
    fails = [(n, m) for n, m in results if m]
    assert not fails, "\n".join(f"{n}: {m}" for n, m in fails)


def _check_fuzz_vs_python_reference(spark):
    """Randomized corpora with planted shared spans: the Spark operator
    must equal a sequential Python implementation of the same
    algorithm (winnow -> keep-first -> verify+extend -> merge) —
    catches positional off-by-ones the planted gates can't."""
    import hashlib
    import random

    K, W = 5, 4

    def ref(docs):
        def toks(t):
            return [x for x in (t or "").split() if x]

        def ghs(ts):
            out = []
            for i in range(len(ts) - K + 1):
                g = " ".join(ts[i : i + K])
                out.append(hashlib.md5(g.encode()).hexdigest()[:16])
            return out

        def selected(g):
            if not g:
                return []
            if len(g) < W:
                m = min(g)
                return [(g.index(m) + 1, m)]
            sel = set()
            for j in range(len(g) - W + 1):
                win = g[j : j + W]
                m = min(win)
                sel.add((j + win.index(m) + 1, m))
            return sorted(sel)

        tokmap = {d: toks(t) for d, t in docs}
        anchors = []
        for d, _t in docs:
            for pos, gh in selected(ghs(tokmap[d])):
                anchors.append((d, pos, gh))
        src = {}
        for d, pos, gh in sorted(anchors):
            if gh not in src or (d, pos) < src[gh]:
                src[gh] = (d, pos)
        spans = {}
        for d, pos, gh in anchors:
            sa, pa = src[gh]
            if sa == d:
                continue
            A, B = tokmap[sa], tokmap[d]
            if A[pa - 1 : pa - 1 + K] != B[pos - 1 : pos - 1 + K]:
                continue
            el = 0
            while (
                pa - 1 - el - 1 >= 0
                and pos - 1 - el - 1 >= 0
                and A[pa - 2 - el] == B[pos - 2 - el]
            ):
                el += 1
            er = 0
            while (
                pa - 1 + K + er < len(A)
                and pos - 1 + K + er < len(B)
                and A[pa - 1 + K + er] == B[pos - 1 + K + er]
            ):
                er += 1
            spans.setdefault(d, []).append(
                (pos - el, pos + K - 1 + er)
            )
        out = {}
        for d, _t in docs:
            ts = tokmap[d]
            merged = []
            for s, e in sorted(spans.get(d, [])):
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            covered = set()
            for s, e in merged:
                covered.update(range(s, e + 1))
            kept = [t for i, t in enumerate(ts, 1) if i not in covered]
            out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
        return out

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    shared_runs = [
        [f"dup{j}_{i}" for i in range(rng.randint(8, 14))]
        for j in range(4)
    ]
    docs = []
    for d in range(14):
        n_parts = rng.randint(1, 3)
        parts = []
        for _ in range(n_parts):
            parts += [rng.choice(vocab) for _ in range(rng.randint(3, 10))]
            if rng.random() < 0.7:
                parts += rng.choice(shared_runs)
        docs.append((d, " ".join(parts)))

    expect = ref(docs)
    got = {
        r.doc_id: (r.text_out, r.n_tokens, r.n_removed)
        for r in cross_doc_span_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), k=K, window=W
        ).collect()
    }
    diffs = {d: (got[d], expect[d]) for d in expect if got[d] != expect[d]}
    assert diffs == {}
