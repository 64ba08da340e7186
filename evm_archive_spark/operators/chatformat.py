"""Conversation / code training-format transforms.

Two format stages every fine-tuning pipeline runs after curation:

- **Chat flattening**: SFT corpora ship as JSON message arrays
  (``[{"role": ..., "content": ...}, ...]``); training consumes one
  flat text per conversation in a chat template.  ``chat_to_text``
  renders ChatML (``<|im_start|>role\\ncontent<|im_end|>``) or a plain
  ``role: content`` template, and ``chat_stats`` profiles turn
  structure (counts, strict user/assistant alternation after an
  optional system turn) for admission filtering.
- **Fill-in-the-middle** (Bavarian et al. 2022; the StarCoder recipe):
  split a document into prefix/middle/suffix and re-serialize as
  ``<fim_prefix>P<fim_suffix>S<fim_middle>M`` (PSM) or SPM.  Split
  points here are derived from md5 of (id, text) — deterministic and
  oracle-replayable where a real pipeline would use an RNG; the
  determinism is the point (same corpus -> same transform, resumable
  at 100 TB).

Everything is pure JVM (``from_json`` + HOFs + substring arithmetic):
no UDFs, no shuffle — both transforms ride the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

CHAT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("role", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
)

FIM_PREFIX = "<fim_prefix>"
FIM_MIDDLE = "<fim_middle>"
FIM_SUFFIX = "<fim_suffix>"


def _messages(col) -> F.Column:
    return F.coalesce(
        F.from_json(F.coalesce(col, F.lit("")), CHAT_SCHEMA), F.array()
    )


def chat_to_text(
    df: DataFrame,
    id_col: str = "doc_id",
    messages_col: str = "messages",
    template: str = "chatml",
) -> DataFrame:
    """JSON message arrays -> one training text per conversation.
    Output: (doc_id, text_out, n_turns).  Messages with a NULL role or
    content are dropped (dirty-record contract); invalid JSON yields
    zero turns and an empty text, never a failure."""
    if template not in ("chatml", "plain"):
        raise ValueError(f"unknown template {template!r}")
    msgs = F.filter(
        _messages(F.col(messages_col)),
        lambda m: m["role"].isNotNull() & m["content"].isNotNull(),
    )
    if template == "chatml":
        rendered = F.transform(
            msgs,
            lambda m: F.concat(
                F.lit("<|im_start|>"),
                m["role"],
                F.lit("\n"),
                m["content"],
                F.lit("<|im_end|>"),
            ),
        )
    else:
        rendered = F.transform(
            msgs,
            lambda m: F.concat(m["role"], F.lit(": "), m["content"]),
        )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(rendered, "\n").alias("text_out"),
        F.size(msgs).cast("long").alias("n_turns"),
    )


def chat_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    messages_col: str = "messages",
) -> DataFrame:
    """Turn-structure profile for conversation admission: per-role
    counts, total content chars, and ``alternation_ok`` — 1 iff after
    an optional leading system turn the roles strictly alternate
    user/assistant starting with user (the shape SFT trainers
    assume)."""
    msgs = F.filter(
        _messages(F.col(messages_col)),
        lambda m: m["role"].isNotNull() & m["content"].isNotNull(),
    )
    body = F.when(
        (F.size(msgs) >= 1)
        & (F.element_at(msgs, 1)["role"] == "system"),
        F.slice(msgs, 2, F.greatest(F.size(msgs) - 1, F.lit(1))),
    ).otherwise(msgs)
    # position p (1-based) in the body must be user when odd,
    # assistant when even
    ok = F.when(F.size(body) < 1, F.lit(False)).otherwise(
        F.size(
            F.filter(
                F.zip_with(
                    body,
                    F.sequence(F.lit(1), F.size(body)),
                    lambda m, p: m["role"]
                    == F.when(p % 2 == 1, F.lit("user")).otherwise(
                        F.lit("assistant")
                    ),
                ),
                lambda x: ~x,
            )
        )
        == 0
    )
    count_role = lambda r: F.size(  # noqa: E731
        F.filter(msgs, lambda m: m["role"] == r)
    ).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(msgs).cast("long").alias("n_turns"),
        count_role("system").alias("n_system"),
        count_role("user").alias("n_user"),
        count_role("assistant").alias("n_assistant"),
        F.aggregate(
            msgs,
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.length(m["content"]),
        ).alias("content_chars"),
        ok.cast("long").alias("alternation_ok"),
    )


def preference_to_text(
    df: DataFrame,
    id_col: str = "doc_id",
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    template: str = "chatml",
) -> DataFrame:
    """Preference triples (prompt, chosen, rejected) -> the rendered
    pair a DPO/RM trainer consumes: ``chosen_text`` / ``rejected_text``
    in the chat template, plus ``len_ratio_permille`` =
    1000 * len(chosen) DIV max(len(rejected), 1) — the length-bias
    signal preference pipelines filter on (a pair won on length alone
    is a label artifact).  Rows with a NULL prompt or either side NULL
    are dropped.  Pure JVM string assembly."""

    def render(resp_col) -> F.Column:
        if template == "chatml":
            return F.concat(
                F.lit("<|im_start|>user\n"),
                F.col(prompt_col),
                F.lit("<|im_end|>\n<|im_start|>assistant\n"),
                resp_col,
                F.lit("<|im_end|>"),
            )
        if template == "plain":
            return F.concat(
                F.lit("user: "), F.col(prompt_col),
                F.lit("\nassistant: "), resp_col,
            )
        raise ValueError(f"unknown template {template!r}")

    return (
        df.filter(
            F.col(prompt_col).isNotNull()
            & F.col(chosen_col).isNotNull()
            & F.col(rejected_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("doc_id"),
            render(F.col(chosen_col)).alias("chosen_text"),
            render(F.col(rejected_col)).alias("rejected_text"),
            F.floor(
                F.length(chosen_col).cast("long")
                * 1000
                / F.greatest(F.length(rejected_col), F.lit(1))
            )
            .cast("long")
            .alias("len_ratio_permille"),
        )
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    style: str = "psm",
) -> DataFrame:
    """Deterministic fill-in-the-middle: cut points are character
    offsets derived from md5(id, text) — cut1 uniform in the first
    half, cut2 in the second half — so prefix/middle/suffix are all
    non-degenerate on any text of length >= 2.  Output: (doc_id,
    fim_text, cut1, cut2).  Texts shorter than 2 chars pass through
    untransformed (cut1 = cut2 = 0).  ``style``: 'psm' emits
    prefix-suffix-middle, 'spm' suffix-prefix-middle."""
    if style not in ("psm", "spm"):
        raise ValueError(f"unknown style {style!r}")
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    h = F.md5(F.concat_ws("|", F.col(id_col), t))
    b0 = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
    b1 = F.conv(F.substring(h, 5, 4), 16, 10).cast("long")
    # floor(n/2) on the Spark side == n // 2 on the DuckDB side (a
    # plain double cast would TRUNCATE in Spark but ROUND in DuckDB)
    nd2 = F.floor(n / 2).cast("long")
    cut1 = (b0 % F.greatest(nd2, F.lit(1))) + 1  # 1..n/2
    cut2 = nd2 + (b1 % F.greatest(n - nd2, F.lit(1))) + 1  # n/2+1..n
    prefix = F.substring(t, F.lit(1), cut1.cast("int"))
    middle = F.substring(t, (cut1 + 1).cast("int"), (cut2 - cut1).cast("int"))
    suffix = F.substring(t, (cut2 + 1).cast("int"), n.cast("int"))
    if style == "psm":
        fim = F.concat(
            F.lit(FIM_PREFIX), prefix,
            F.lit(FIM_SUFFIX), suffix,
            F.lit(FIM_MIDDLE), middle,
        )
    else:
        fim = F.concat(
            F.lit(FIM_SUFFIX), suffix,
            F.lit(FIM_PREFIX), prefix,
            F.lit(FIM_MIDDLE), middle,
        )
    short = n < 2
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(short, t).otherwise(fim).alias("fim_text"),
        F.when(short, F.lit(0)).otherwise(cut1).cast("long").alias("cut1"),
        F.when(short, F.lit(0)).otherwise(cut2).cast("long").alias("cut2"),
    )
