"""Count-based n-gram language-model training and document scoring —
the CCNet/KenLM-style LM-quality-filter lane of an LLM data pipeline
(Wenzek et al. 2020 filter corpora by LM perplexity; Brants et al. 2007
"stupid backoff" shows plain counts are enough at corpus scale).

Spark-first shape: training is one tokenize + explode + groupBy over the
token / token-pair domain (partial aggregation collapses the corpus to
vocab-sized tables before the shuffle); scoring re-joins those count
tables back to the exploded corpus.  The count tables are vocab-sized —
orders of magnitude smaller than the corpus — so the score joins
broadcast by default; at trillion-token scale pass ``broadcast=False``
and the joins shuffle on compact token keys where AQE's skew handling
covers the stopword hot keys.

Everything emitted is an exact BIGINT sufficient statistic (pair counts,
hit counts, summed numerators/denominators), never a float log-prob, so
the parity gate hash-checks the full scoring computation against an
independent DuckDB replay; a float perplexity is a trivial driver-side
epilogue over these columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textanalysis import tokens
from .util import fan_out


def _pairs(t) -> F.Column:
    """Adjacent token pairs as array<struct<w1,w2>> from a token-array
    COLUMN — map-side only.

    ``t`` must be a materialized attribute (project ``tokens(text)``
    into a column first), not the split expression itself: Spark does
    not common-subexpression-eliminate inside higher-order-function
    lambdas, so an inlined ``split`` would re-tokenize the document for
    EVERY element index — O(len^2) per document (measured 80 s of
    executor CPU per corpus scan at sf0.1 vs ~2 s materialized)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"),
            F.element_at(t, i + 1).alias("w2"),
        ),
    )
    # guard <2-token docs: sequence(1, 0) is DESCENDING in Spark, not empty
    guarded = F.when(F.size(t) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    # drop pairs touching empty tokens (split keeps boundary empties for
    # leading/trailing whitespace) — the same exclusion the unigram table
    # applies, so hit_den never loses a count(w1) term to a NULL join
    return F.filter(
        guarded, lambda s: (s["w1"] != "") & (s["w2"] != "")
    )


def lm_train(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train bigram LM counts over a corpus.

    Returns ``(unigrams, bigrams)``: ``unigrams(tok, cnt)`` and
    ``bigrams(w1, w2, cnt)``, counts as BIGINT.  One corpus scan per
    table, explode + groupBy with map-side partial aggregation; the
    shuffle carries only (token, partial-count) pairs, so its volume is
    bounded by partitions x vocab, not by corpus tokens.
    """
    df = fan_out(df)
    tk = df.select(tokens(text_col).alias("__t"))
    toks = tk.select(F.explode("__t").alias("tok")).filter(
        F.col("tok") != ""
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    prs = tk.select(F.explode(_pairs(F.col("__t"))).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bi = prs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    return uni, bi


def lm_score(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Score documents against trained counts with stupid-backoff
    sufficient statistics.

    Per document: every adjacent pair (w1, w2) is a *hit* when the
    bigram was seen in training — it contributes count(w1,w2) to
    ``hit_num`` and count(w1) to ``hit_den`` (the conditional-probability
    fraction) — otherwise it *backs off* to the unigram count of w2
    (``bo_num``).  Output columns (all BIGINT, exact):

    ``n_pairs``   adjacent pairs in the doc
    ``n_hits``    pairs whose bigram exists in the LM
    ``hit_num``   sum of bigram counts over hits
    ``hit_den``   sum of prefix unigram counts over hits
    ``bo_num``    sum of w2 unigram counts over backoffs

    Plan: explode to pairs (map-side), two joins against vocab-sized
    count tables (broadcast by default), one groupBy on the doc key.
    The corpus is never shuffled when the joins broadcast.
    """
    b = (lambda d: F.broadcast(d)) if broadcast else (lambda d: d)
    uni = unigrams.select(
        F.col("tok"), F.col("cnt").cast("long").alias("ucnt")
    )
    bi = bigrams.select(
        F.col("w1").alias("b1"),
        F.col("w2").alias("b2"),
        F.col("cnt").cast("long").alias("bcnt"),
    )
    prs = fan_out(df).select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).select(
        F.col(id_col), F.explode(_pairs(F.col("__t"))).alias("p")
    ).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    scored = (
        prs.join(
            b(bi),
            (F.col("w1") == F.col("b1")) & (F.col("w2") == F.col("b2")),
            "left",
        )
        .join(
            b(uni.withColumnRenamed("tok", "u1")),
            F.col("w1") == F.col("u1"),
            "left",
        )
        .join(
            b(
                uni.select(
                    F.col("tok").alias("u2"),
                    F.col("ucnt").alias("ucnt2"),
                )
            ),
            F.col("w2") == F.col("u2"),
            "left",
        )
    )
    hit = F.col("bcnt").isNotNull()
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hits"),
        F.sum(F.when(hit, F.col("bcnt")).otherwise(0))
        .cast("long")
        .alias("hit_num"),
        F.sum(F.when(hit, F.col("ucnt")).otherwise(0))
        .cast("long")
        .alias("hit_den"),
        F.sum(F.when(~hit, F.coalesce(F.col("ucnt2"), F.lit(0))).otherwise(0))
        .cast("long")
        .alias("bo_num"),
    )
