"""Chat flattening / stats and fill-in-the-middle transforms."""

from __future__ import annotations

import json

from evm_archive_spark.operators.chatformat import (
    FIM_MIDDLE,
    FIM_PREFIX,
    FIM_SUFFIX,
    chat_stats,
    chat_to_text,
    fim_transform,
)


def _conv(*turns):
    return json.dumps([{"role": r, "content": c} for r, c in turns])


def _check_chat_to_text_chatml_and_plain(spark):
    msgs = _conv(("system", "be nice"), ("user", "hi"), ("assistant", "hello"))
    df = spark.createDataFrame(
        [(1, msgs), (2, "not json"), (3, None)], ["doc_id", "messages"]
    )
    out = {r.doc_id: r for r in chat_to_text(df).collect()}
    assert out[1].text_out == (
        "<|im_start|>system\nbe nice<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>"
    )
    assert out[1].n_turns == 3
    assert out[2].text_out == "" and out[2].n_turns == 0
    assert out[3].text_out == "" and out[3].n_turns == 0
    plain = {r.doc_id: r for r in chat_to_text(df, template="plain").collect()}
    assert plain[1].text_out == "system: be nice\nuser: hi\nassistant: hello"


def _check_chat_stats_alternation(spark):
    ok1 = _conv(("system", "s"), ("user", "a"), ("assistant", "b"),
                ("user", "c"), ("assistant", "d"))
    ok2 = _conv(("user", "a"), ("assistant", "b"))
    bad_start = _conv(("assistant", "b"), ("user", "a"))
    bad_double = _conv(("user", "a"), ("user", "b"), ("assistant", "c"))
    df = spark.createDataFrame(
        [(1, ok1), (2, ok2), (3, bad_start), (4, bad_double)],
        ["doc_id", "messages"],
    )
    out = {r.doc_id: r for r in chat_stats(df).collect()}
    assert out[1].alternation_ok == 1 and out[1].n_turns == 5
    assert out[1].n_user == 2 and out[1].n_assistant == 2
    assert out[1].content_chars == 5
    assert out[2].alternation_ok == 1
    assert out[3].alternation_ok == 0
    assert out[4].alternation_ok == 0


def _check_chat_dirty_messages_dropped(spark):
    msgs = json.dumps(
        [
            {"role": "user", "content": "q"},
            {"role": None, "content": "x"},
            {"role": "assistant"},
            {"role": "assistant", "content": "a"},
        ]
    )
    df = spark.createDataFrame([(1, msgs)], ["doc_id", "messages"])
    r = chat_to_text(df).head()
    assert r.n_turns == 2
    assert "x" not in r.text_out


def _check_fim_reassembles_and_is_deterministic(spark):
    texts = [
        (1, "0123456789abcdef"),
        (2, "xy"),
        (3, "a"),  # too short: passthrough
        (4, None),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r for r in fim_transform(df).collect()}
    for did, text in texts[:2]:
        r = out[did]
        body = r.fim_text
        assert body.startswith(FIM_PREFIX)
        p = body[len(FIM_PREFIX): body.index(FIM_SUFFIX)]
        s = body[body.index(FIM_SUFFIX) + len(FIM_SUFFIX): body.index(FIM_MIDDLE)]
        m = body[body.index(FIM_MIDDLE) + len(FIM_MIDDLE):]
        assert p + m + s == text  # lossless split
        assert len(p) == r.cut1 and len(p) + len(m) == r.cut2
        assert 1 <= r.cut1 <= len(text) // 2 < r.cut2 <= len(text)
    assert out[3].fim_text == "a" and out[3].cut1 == 0
    assert out[4].fim_text == "" and out[4].cut1 == 0
    # deterministic: second run identical
    again = {r.doc_id: r.fim_text for r in fim_transform(df).collect()}
    assert again == {k: v.fim_text for k, v in out.items()}


def _check_fim_spm_style(spark):
    df = spark.createDataFrame([(1, "0123456789")], ["doc_id", "text"])
    r = fim_transform(df, style="spm").head()
    assert r.fim_text.startswith(FIM_SUFFIX)
    i_p = r.fim_text.index(FIM_PREFIX)
    s = r.fim_text[len(FIM_SUFFIX): i_p]
    p = r.fim_text[i_p + len(FIM_PREFIX): r.fim_text.index(FIM_MIDDLE)]
    m = r.fim_text[r.fim_text.index(FIM_MIDDLE) + len(FIM_MIDDLE):]
    assert p + m + s == "0123456789"


def _check_preference_to_text(spark):
    from evm_archive_spark.operators.chatformat import preference_to_text

    df = spark.createDataFrame(
        [
            (1, "why?", "because of X", "idk"),
            (2, None, "a", "b"),
            (3, "q", None, "b"),
        ],
        ["doc_id", "prompt", "chosen", "rejected"],
    )
    rows = preference_to_text(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.chosen_text == (
        "<|im_start|>user\nwhy?<|im_end|>\n"
        "<|im_start|>assistant\nbecause of X<|im_end|>"
    )
    assert r.rejected_text.endswith("idk<|im_end|>")
    assert r.len_ratio_permille == 12 * 1000 // 3


def _check_split_sentences(spark):
    from evm_archive_spark.operators.textanalysis import split_sentences

    df = spark.createDataFrame(
        [
            (1, "First one. Second!  Third? no terminator tail"),
            (2, ""),
            (3, None),
            (4, "Just one sentence."),
        ],
        ["doc_id", "text"],
    )
    out = {}
    for r in split_sentences(df).collect():
        out.setdefault(r.doc_id, []).append((r.sent_id, r.sentence))
    assert out[1] == [
        (0, "First one."),
        (1, "Second!"),
        (2, "Third?"),
        (3, "no terminator tail"),
    ]
    assert 2 not in out and 3 not in out
    assert out[4] == [(0, "Just one sentence.")]


def _pooled_chatformat_module(spark):
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
        results = list(ex.map(run, [_check_chat_to_text_chatml_and_plain, _check_chat_stats_alternation, _check_chat_dirty_messages_dropped, _check_fim_reassembles_and_is_deterministic, _check_fim_spm_style, _check_preference_to_text, _check_split_sentences]))
    fails = [(n, m) for n, m in results if m]
    assert not fails, "\n".join(f"{n}: {m}" for n, m in fails)
