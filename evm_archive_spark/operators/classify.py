"""Token-count class-affinity classifier — the trainable quality-
classifier lane of an LLM data pipeline (the fastText/DCLM shape:
Joulin et al. 2016 bag-of-tokens linear classifiers; DCLM and LLaMA
filter web corpora with a classifier trained on seed sets; CCNet uses
the same train-on-reference/score-corpus pattern).

Spark-first shape, mirroring lm.py: training is one tokenize + explode
+ groupBy over the (label, token) domain — partial aggregation
collapses the corpus to vocab-sized statistics before the shuffle;
scoring joins those tables back to the exploded corpus (broadcast by
default: the model is vocab x classes, orders of magnitude smaller than
the corpus; pass ``broadcast=False`` at trillion-token scale to shuffle
on compact token keys under AQE skew handling).

Everything emitted is an exact BIGINT sufficient statistic (token-hit
counts, summed class counts, per-million affinities via single integer
divisions), never a float log-prob — so the parity gate hash-checks the
full pipeline against an independent DuckDB replay.  The multinomial
Naive-Bayes log-pooled posterior is a trivial driver-side epilogue over
the same (sum_cnt, n_hits, class_tokens, class_docs) statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textanalysis import tokens
from .util import fan_out


def nb_train(
    df: DataFrame, text_col: str = "text", label_col: str = "label"
) -> tuple[DataFrame, DataFrame]:
    """Train per-class token statistics.

    Returns ``(class_totals, token_counts)``:
    ``class_totals(label, n_docs, n_tokens)`` and
    ``token_counts(label, tok, cnt)`` — all BIGINT.  One corpus scan
    per table; the shuffles carry (label[, token], partial-count) pairs
    bounded by partitions x vocab, not corpus tokens.
    """
    df = fan_out(df)
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    token_counts = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # n_tokens = sum of per-token counts — derived from token_counts
    # instead of a second tokenize+size pass over the corpus; the
    # (label, tok) exchange below both aggregates is identical, so the
    # planner reuses it and the corpus is tokenized ONCE for training
    # (r13: the old shape re-ran split+filter over every document)
    n_tokens = token_counts.groupBy("label").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens")
    )
    n_docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    class_totals = n_docs.join(n_tokens, "label", "left").select(
        "label",
        "n_docs",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )
    return class_totals, token_counts


def nb_score(
    docs: DataFrame,
    class_totals: DataFrame,
    token_counts: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Per-(document, class) affinity statistics.

    Output: ``(doc_id, label, n_tok, n_hits, sum_cnt, affinity_ppm)``
    where ``sum_cnt`` = sum over doc tokens of the class token count,
    ``n_hits`` = doc tokens present in the class vocabulary, and
    ``affinity_ppm = sum_cnt * 1_000_000 // n_tokens_class`` — the
    class-frequency-normalized affinity as an exact integer (linear-
    pooled multinomial score).  Every class appears for every document
    (cross join with the tiny class table) so downstream argmax is
    total."""
    tc = F.broadcast(token_counts) if broadcast else token_counts
    ct = F.broadcast(class_totals) if broadcast else class_totals

    doc_toks = (
        fan_out(docs)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # per-(doc, class) hit statistics over tokens present in the model.
    # (r13 note: collapsing doc_toks to per-(doc, tok) multiplicities
    # first — one tokenize feeding both aggregates through a shared
    # exchange — measured SLOWER at sf0.1: the keyed token shuffle costs
    # more than the second map-side tokenize pass it saves.  Kept the
    # two-branch shape deliberately; both branches are map-side partial
    # aggregations over the broadcast model, no token-carrying shuffle.)
    hits = (
        doc_toks.join(tc, "tok")
        .groupBy(id_col, "label")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
        )
    )
    n_tok = doc_toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    # total per-(doc, class) grid so absent classes score 0
    grid = n_tok.crossJoin(ct)
    out = (
        grid.join(hits, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            F.col("label"),
            F.col("n_tok"),
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("bigint")
            .alias("n_hits"),
            F.coalesce(F.col("sum_cnt"), F.lit(0))
            .cast("bigint")
            .alias("sum_cnt"),
            F.col("n_tokens"),
        )
        # exact integer division (DIV, not float '/': ppm numerators
        # overflow double precision at corpus scale)
        .withColumn(
            "affinity_ppm", F.expr("sum_cnt * 1000000 DIV n_tokens")
        )
        .drop("n_tokens")
    )
    return out


def nb_classify(
    docs: DataFrame,
    class_totals: DataFrame,
    token_counts: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Predicted class per document: argmax affinity_ppm, ties broken
    by the lexicographically smallest label (deterministic).  Output
    ``(doc_id, predicted, best_ppm)``."""
    scored = nb_score(
        docs, class_totals, token_counts,
        id_col=id_col, text_col=text_col, broadcast=broadcast,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("affinity_ppm").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("label").alias("predicted"),
            F.col("affinity_ppm").alias("best_ppm"),
        )
    )


def quality_classifier_filter(
    docs: DataFrame,
    seed_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ppm: int = 0,
    broadcast: bool = True,
) -> DataFrame:
    """The DCLM/CCNet composition: train token statistics on a curated
    seed set vs the rest, keep corpus documents whose seed-affinity
    beats their rest-affinity by ``min_ppm``.  Returns the surviving
    docs with both affinities attached."""
    seed = seed_docs.select(
        F.lit("seed").alias("label"), F.col(text_col)
    )
    rest = docs.join(
        seed_docs.select(id_col), id_col, "left_anti"
    ).select(F.lit("rest").alias("label"), F.col(text_col))
    class_totals, token_counts = nb_train(
        seed.unionByName(rest), text_col=text_col, label_col="label"
    )
    scored = nb_score(
        docs, class_totals, token_counts,
        id_col=id_col, text_col=text_col, broadcast=broadcast,
    )
    pivot = scored.groupBy(id_col).agg(
        F.max(F.when(F.col("label") == "seed", F.col("affinity_ppm")))
        .alias("seed_ppm"),
        F.max(F.when(F.col("label") == "rest", F.col("affinity_ppm")))
        .alias("rest_ppm"),
    )
    return docs.join(pivot, id_col).filter(
        F.col("seed_ppm") - F.col("rest_ppm") >= min_ppm
    )
