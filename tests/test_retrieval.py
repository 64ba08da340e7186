"""Keyword retrieval: the BM25 scorer is checked against an
independent Python reference (plain dict arithmetic, no Spark) on a
small corpus; the intweight twin is checked for exact-integer
equality; ranking determinism and the broadcast-probe plan shape are
pinned."""

from __future__ import annotations

import math
import re

import pytest

from evm_archive_spark.operators.retrieval import build_postings, keyword_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat naps all day the cat purrs"),
    (3, "foxes and dogs are not cats they are canids"),
    (4, "spark shuffles partitions and broadcasts small tables"),
    (5, "quick quick quick brown brown fox"),
]
QUERIES = [(100, "quick brown fox"), (200, "cats and dogs")]


def _terms(t):
    return [w for w in re.split(r"[^a-z]+", t.lower()) if len(w) >= 3]


def _ref_bm25(k1=1.2, b=0.75):
    tf, dl = {}, {}
    for did, text in DOCS:
        ts = _terms(text)
        dl[did] = len(ts)
        for t in ts:
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df = {}
    for (_d, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(DOCS)
    avgdl = sum(dl.values()) / n
    out = {}
    for qid, q in QUERIES:
        scores = {}
        for t in dict.fromkeys(_terms(q)):
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for did in dl:
                f = tf.get((did, t), 0)
                if not f:
                    continue
                norm = f * (k1 + 1) / (
                    f + k1 * (1 - b + b * dl[did] / avgdl)
                )
                scores[did] = scores.get(did, 0.0) + idf * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = ranked
    return out


def _check_bm25_matches_independent_reference(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    got = keyword_topk(docs, qs, topk=10, scoring="bm25").collect()
    ref = _ref_bm25()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, ranked in ref.items():
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in ranked]
        for r, (_d, s) in zip(rows, ranked):
            assert r.score == pytest.approx(s, abs=1e-9)


def _check_intweight_exact_integers(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame([(1, "quick fox")], ["query_id", "query"])
    got = {
        r.doc_id: r.score
        for r in keyword_topk(docs, qs, topk=10, scoring="intweight").collect()
    }
    # df(quick)=3 -> w=333333; df(fox)=2 -> w=500000
    assert got[5] == 3 * 333333 + 1 * 500000
    assert got[1] == 1 * 333333 + 1 * 500000
    assert got[2] == 1 * 333333


def _check_topk_and_tie_break(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta")],
        ["doc_id", "text"],
    )
    qs = spark.createDataFrame([(1, "alpha")], ["query_id", "query"])
    rows = keyword_topk(docs, qs, topk=2, scoring="intweight").collect()
    assert [(r.rank, r.doc_id) for r in sorted(rows, key=lambda r: r.rank)] == [
        (1, 1),
        (2, 2),
    ]


def _check_postings_shape(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    p = {(r.doc_id, r.term): (r.tf, r.dl) for r in build_postings(docs).collect()}
    assert p[(5, "quick")] == (3, 6)
    assert p[(2, "cat")] == (2, 10)


def _check_query_probe_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    plan = (
        keyword_topk(docs, qs, scoring="intweight")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def _check_indexed_incremental_equals_batch(spark, tmp_path):
    from evm_archive_spark.operators.retrieval import (
        append_postings_index,
        keyword_topk_indexed,
        persist_postings_index,
    )

    shard_a = spark.createDataFrame(DOCS[:3], ["doc_id", "text"])
    shard_b = spark.createDataFrame(DOCS[3:], ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    table = "t_postings_inc"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        idx = persist_postings_index(
            spark, shard_a, table, str(tmp_path / "idx"), n_buckets=8
        )
        append_postings_index(
            shard_b, table, str(tmp_path / "idx"), n_buckets=8
        )
        idx = spark.table(table)
        got = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in keyword_topk_indexed(idx, qs, topk=10).collect()
        )
        batch = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in keyword_topk(
                spark.createDataFrame(DOCS, ["doc_id", "text"]),
                qs,
                topk=10,
                scoring="intweight",
            ).collect()
        )
        assert got == batch
        # scale pin: the indexed probe's isin pushdown prunes term
        # buckets — the scan must NOT read all 8
        plan = (
            keyword_topk_indexed(idx, qs, topk=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SelectedBucketsCount" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _check_stream_postings_equals_batch_and_compacts(spark, tmp_path):
    import os

    import pandas as pd

    from evm_archive_spark.operators.retrieval import (
        compact_postings_index,
        keyword_topk_indexed,
        stream_postings_admission,
    )

    b1 = pd.DataFrame(DOCS[:3], columns=["doc_id", "text"])
    b2 = pd.DataFrame(DOCS[3:], columns=["doc_id", "text"])
    src = tmp_path / "src"
    stamped = set()
    for i, b in enumerate((b1, b2)):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        for f in os.listdir(src):  # pin mtimes (NOTES.md gotcha)
            if f.endswith(".parquet") and f not in stamped:
                t = 1_700_000_000 + i
                os.utime(src / f, (t, t))
                stamped.add(f)

    state = str(tmp_path / "state")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    stream_postings_admission(stream, state)
    assert any(
        d.startswith("batch_id=")
        for d in os.listdir(f"{state}/postings")
    )

    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    streamed_idx = spark.read.parquet(f"{state}/postings")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in keyword_topk_indexed(streamed_idx, qs).collect()
    )
    batch = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in keyword_topk(
            spark.createDataFrame(DOCS, ["doc_id", "text"]),
            qs,
            scoring="intweight",
        ).collect()
    )
    assert got == batch

    table = "t_postings_compact"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        idx = compact_postings_index(
            spark, state, table, str(tmp_path / "bidx"), n_buckets=8
        )
        got2 = sorted(
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in keyword_topk_indexed(idx, qs).collect()
        )
        assert got2 == batch
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _pooled_retrieval_module(spark):
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
        results = list(ex.map(run, [_check_bm25_matches_independent_reference, _check_intweight_exact_integers, _check_topk_and_tie_break, _check_postings_shape, _check_query_probe_is_broadcast, _check_indexed_incremental_equals_batch, _check_stream_postings_equals_batch_and_compacts]))
    fails = [(n, m) for n, m in results if m]
    assert not fails, "\n".join(f"{n}: {m}" for n, m in fails)
