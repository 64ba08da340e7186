"""Tests for the token-count class-affinity classifier
(operators/classify.py) — train/score/classify vs a plain-Python
reference, plus the DCLM-style seed-vs-rest quality filter composition.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pytest

from evm_archive_spark.operators.classify import (
    nb_classify,
    nb_score,
    nb_train,
    quality_classifier_filter,
)

CORPUS = [
    (1, "spark table join shuffle partition", "eng"),
    (2, "join agg window table scan", "eng"),
    (3, "der tisch und der stuhl", "deu"),
    (4, "und der baum und das haus", "deu"),
    (5, "table und join der scan", "mix"),
]


def _py_reference(docs):
    """Plain-Python replay of train + score + argmax."""
    tok = lambda t: [w for w in re.split(r"\s+", t.strip()) if w]
    tc: dict = defaultdict(Counter)
    n_tokens: Counter = Counter()
    for _, text, lab in docs:
        ws = tok(text)
        tc[lab].update(ws)
        n_tokens[lab] += len(ws)
    scores = {}
    for did, text, _ in docs:
        ws = tok(text)
        if not ws:
            continue
        per = {}
        for lab in n_tokens:
            sum_cnt = sum(tc[lab][w] for w in ws if w in tc[lab])
            per[lab] = (
                sum_cnt,
                sum(1 for w in ws if w in tc[lab]),
                sum_cnt * 1_000_000 // n_tokens[lab],
            )
        scores[did] = per
    return scores


def _pooled_classify_vs_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    ct, tc = nb_train(df, label_col="label")
    ref = _py_reference(CORPUS)

    scored = nb_score(df, ct, tc)
    for r in scored.collect():
        sum_cnt, n_hits, ppm = ref[r["doc_id"]][r["label"]]
        assert (r["sum_cnt"], r["n_hits"], r["affinity_ppm"]) == (
            sum_cnt, n_hits, ppm,
        ), (r["doc_id"], r["label"])

    pred = {
        r["doc_id"]: r["predicted"]
        for r in nb_classify(df, ct, tc).collect()
    }
    for did, per in ref.items():
        best = max(per.items(), key=lambda kv: (kv[1][2], ), default=None)
        # argmax with lexicographic tie-break
        best_lab = sorted(per.items(), key=lambda kv: (-kv[1][2], kv[0]))[0][0]
        assert pred[did] == best_lab, did
    # self-training sanity: in-domain docs classify to their own class
    assert pred[1] == "eng" and pred[3] == "deu"


def test_every_class_scored_for_every_doc(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    ct, tc = nb_train(df, label_col="label")
    scored = nb_score(df, ct, tc)
    assert scored.count() == 5 * 3  # full doc x class grid
    # a doc with zero overlap with a class still gets a 0 row
    zero = scored.filter("doc_id = 1 AND label = 'deu'").collect()[0]
    assert zero["sum_cnt"] == 0 and zero["affinity_ppm"] == 0


def _pooled_quality_classifier_filter_seed_vs_rest(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in CORPUS], ["doc_id", "text"]
    )
    seed = spark.createDataFrame(
        [(1, CORPUS[0][1]), (2, CORPUS[1][1])], ["doc_id", "text"]
    )
    kept = quality_classifier_filter(docs, seed, min_ppm=0)
    ids = {r["doc_id"] for r in kept.collect()}
    # the seed docs themselves survive; the German docs do not
    assert {1, 2} <= ids
    assert 3 not in ids and 4 not in ids


def test_score_plan_broadcasts_model(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    ct, tc = nb_train(df, label_col="label")
    plan = (
        nb_score(df, ct, tc)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan  # fully JVM
