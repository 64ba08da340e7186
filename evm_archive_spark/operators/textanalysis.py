"""Text analysis operators for training-data pipelines (north-star
extension): tokenization stats, quality scoring, language ID heuristic,
document fingerprinting.

Everything is built-in-function Column expressions — at 100 TB these run
inside whole-stage codegen over the parquet scan with zero shuffles (pure
map-side), which is the entire point: a Python-UDF version of the same
logic would be 10-100x slower.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .util import bind_once  # noqa: F401  (re-export: gram/chunk builders)

# small deterministic stopword lists per language for the lang-id heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "para"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "eine", "mit", "von"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), "\\s+")


# Python mirror of tokens() for Arrow-batched twins (ADVICE r2): Spark
# `trim` strips ASCII space (0x20) ONLY, Java `\s` is the ASCII class
# [ \t\n\x0b\f\r] (NBSP/U+3000 are NOT separators), and `split` uses
# limit -1 so leading/trailing empty tokens are KEPT.  `.strip().split()`
# is NOT equivalent: Python strips/splits Unicode whitespace and drops
# empties.  Pinned bit-equal against the expr path by
# test_tokens_py_matches_expr (whitespace-perturbed inputs).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens_py(t: str | None) -> list[str]:
    return _JAVA_WS.split((t or "").strip(" "))


def token_count(col) -> F.Column:
    return F.size(tokens(col)).cast("long")


def stopword_hits(col, lang: str) -> F.Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(arr, F.lower(t)))
    ).cast("long")


def punct_ratio(col) -> F.Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(c).cast("double")
    )


def mean_token_len(col) -> F.Column:
    t = tokens(col)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(t).cast("double")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-signal battery (Gopher/C4-style heuristics):
    length, token count, mean token length, punctuation ratio, stopword
    ratio, all-caps ratio."""
    t = tokens(text_col)
    n_tok = F.size(t).cast("long")
    return df.withColumns(
        {
            "q_n_chars": F.length(text_col).cast("long"),
            "q_n_tokens": n_tok,
            "q_mean_tok_len": mean_token_len(text_col),
            "q_punct_ratio": punct_ratio(text_col),
            "q_stop_ratio_en": F.when(n_tok == 0, 0.0).otherwise(
                stopword_hits(text_col, "en").cast("double") / n_tok
            ),
            "q_upper_ratio": F.when(F.length(text_col) == 0, 0.0).otherwise(
                F.length(F.regexp_replace(F.col(text_col), "[^A-Z]", ""))
                .cast("double")
                / F.length(text_col)
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from the feature battery — a simple,
    deterministic linear gate (each term clamps to [0,1])."""
    feats = quality_features(df, text_col)
    len_term = F.least(F.col("q_n_tokens").cast("double") / 20.0, F.lit(1.0))
    stop_term = F.least(F.col("q_stop_ratio_en") * 5.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("q_punct_ratio") * 4.0)
    return feats.withColumn(
        "q_score", (len_term + stop_term + punct_term) / 3.0
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len_x10: int = 20,
    max_mean_word_len_x10: int = 120,
    max_symbol_word_ratio_x10: int = 1,
    min_alpha_word_ratio_x10: int = 7,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based document filter (Rae et al. 2021 §A1.1):
    per-rule boolean columns plus a composite ``keep``.

    Ratio thresholds are integer-scaled (x10) and evaluated by integer
    cross-multiplication (``total_len*10 >= min_x10*n_words`` instead of
    ``total_len/n_words >= min``), so every rule is exact integer
    arithmetic — deterministic across engines and hash-stable for parity
    gates.  All pure Column expressions: map-side only, zero shuffles,
    whole-stage codegen at 100 TB.

    Rules (names match output columns):
      r_words     min_words <= word count <= max_words
      r_mean_len  mean word length in [min, max] (x10 scaled)
      r_symbol    words containing '#' or '...' <= ratio threshold
      r_alpha     words containing [A-Za-z] >= ratio threshold
      r_stop      at least min_stop_hits English stopword occurrences
    """
    t = tokens(text_col)
    n_words = F.size(t).cast("long")
    total_len = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_sym = F.size(
        F.filter(t, lambda w: w.contains("#") | w.contains("..."))
    ).cast("long")
    n_alpha = F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = stopword_hits(text_col, "en")
    out = df.withColumns(
        {
            "n_words": n_words,
            "total_len": total_len,
            "n_sym": n_sym,
            "n_alpha": n_alpha,
            "n_stop": n_stop,
        }
    )
    c = F.col
    rules = {
        "r_words": (c("n_words") >= min_words) & (c("n_words") <= max_words),
        "r_mean_len": (
            c("total_len") * 10 >= min_mean_word_len_x10 * c("n_words")
        )
        & (c("total_len") * 10 <= max_mean_word_len_x10 * c("n_words")),
        "r_symbol": c("n_sym") * 10 <= max_symbol_word_ratio_x10 * c("n_words"),
        "r_alpha": c("n_alpha") * 10 >= min_alpha_word_ratio_x10 * c("n_words"),
        "r_stop": c("n_stop") >= min_stop_hits,
    }
    out = out.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: argmax of per-language
    stopword hit counts (CJK detected by codepoint range first).  Pure
    column expressions — a greatest-of-N over per-language counters."""
    has_cjk = F.length(
        F.regexp_replace(F.col(text_col), r"[^一-鿿]", "")
    )
    scores = {
        lang: stopword_hits(text_col, lang) for lang in ("en", "es", "fr", "de")
    }
    # argmax via chained CASE (deterministic tie-break by language order)
    best = F.lit("und")
    best_score = F.lit(-1).cast("long")
    for lang in ("en", "es", "fr", "de"):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    pred = (
        F.when(has_cjk > 0, F.lit("zh"))
        .when(best_score <= 0, F.lit("und"))
        .otherwise(best)
    )
    return df.withColumn("lang_pred", pred)


#: Unicode scripts profiled by ``script_profile``: (name, Java regex
#: class, RE2 regex class) — Java spells scripts \p{IsX}, RE2 \p{X};
#: the DuckDB oracle helper below uses the RE2 spelling.
SCRIPTS = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("hangul", r"\p{IsHangul}", r"\p{Hangul}"),
    ("devanagari", r"\p{IsDevanagari}", r"\p{Devanagari}"),
    # bare class CONTENT (it lands inside [^...]): "[0-9]" would nest
    # brackets, which Java accepts as a class union but RE2 does not
    ("digit", "0-9", "0-9"),
]


def script_profile(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group Unicode-script composition: total characters plus each
    script's share in ppm — the multilingual-corpus mix report that
    decides per-script pipeline routing (CJK segmentation, RTL
    handling) before any per-language work starts.  Pure JVM column
    expressions (one regexp_replace+length per script riding a single
    scan; map-side partial aggregation); exact integers only."""
    counts = [
        F.sum(
            F.length(F.regexp_replace(F.col(text_col), f"[^{java}]", ""))
        ).alias(f"_{name}")
        for name, java, _ in SCRIPTS
    ]
    total = F.sum(F.length(F.col(text_col))).alias("n_chars")
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(total, *counts)
    out = agg.select(
        F.col("grp").alias(group_col),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        *[
            F.expr(f"_{name} * 1000000 DIV n_chars")
            .alias(f"{name}_ppm")
            for name, *_ in SCRIPTS
        ],
    )
    return out


def normalize_unicode(col, form: str = "NFC") -> F.Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
    step before any hash-based text dedup (visually identical strings
    with different codepoint sequences must collide).

    Spark has no built-in normalizer, so this is a genuine Python-
    boundary operation: an Arrow-batched pandas UDF over stdlib
    ``unicodedata`` (UAX #15).  The q_nfc parity gate cross-checks it
    against DuckDB's independent utf8proc implementation — two
    implementations of the public algorithm agreeing byte-for-byte."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    return _norm(F.col(col) if isinstance(col, str) else col)


def duckdb_script_profile_sql(
    table: str = "documents", text_col: str = "text", group_col: str = "source"
) -> str:
    """DuckDB replay of ``script_profile`` (RE2 script spellings)."""
    cols = ", ".join(
        f"CAST(SUM(length(regexp_replace({text_col}, '[^{re2}]', '', 'g')))"
        f" * 1000000 // SUM(length({text_col})) AS BIGINT) AS {name}_ppm"
        for name, _, re2 in SCRIPTS
    )
    return (
        f"SELECT {group_col}, CAST(SUM(length({text_col})) AS BIGINT) "
        f"AS n_chars, {cols} FROM {table} GROUP BY {group_col} "
        f"ORDER BY {group_col} NULLS FIRST"
    )


def markdown_to_text(col) -> F.Column:
    """Markdown -> plain-text extraction as a pure JVM regexp chain —
    the README/docs-corpus mirror of ``weburl.html_to_text``
    (conservative, deterministic, no third-party parser):

    1. fence lines (```lang) drop, fenced code CONTENT stays (code is
       trainable text),
    2. images ``![alt](url)`` keep the alt, links ``[text](url)`` /
       ``[text][id]`` keep the text, reference-definition lines drop,
    3. ATX heading markers, blockquote markers, list markers
       (``- * +`` and ``1.``) strip; setext/hr marker lines drop,
    4. emphasis runs (``*``/``_`` x1-3) unwrap, inline-code backticks
       drop,
    5. raw HTML tags drop (markdown allows them inline),
    6. whitespace collapses exactly like ``html_to_text`` (horizontal
       runs -> one space, blank lines -> one newline, edges trim).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "(?m)^\\s*```[A-Za-z0-9+-]*\\s*$", "")
    c = F.regexp_replace(c, "(?m)^\\[[^\\]]+\\]:[^\\n]*$", "")
    c = F.regexp_replace(c, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    c = F.regexp_replace(c, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    c = F.regexp_replace(c, "\\[([^\\]]*)\\]\\[[^\\]]*\\]", "$1")
    c = F.regexp_replace(c, "(?m)^(={3,}|-{3,}|\\*{3,}|_{3,})\\s*$", "")
    c = F.regexp_replace(c, "(?m)^#{1,6}[ \\t]*", "")
    c = F.regexp_replace(c, "(?m)^[ \\t]*>[ \\t]?", "")
    c = F.regexp_replace(
        c, "(?m)^[ \\t]*([-*+]|[0-9]+\\.)[ \\t]+", ""
    )
    c = F.regexp_replace(c, "\\*{1,3}([^*\\n]+)\\*{1,3}", "$1")
    c = F.regexp_replace(c, "_{1,3}([^_\\n]+)_{1,3}", "$1")
    c = F.regexp_replace(c, "`", "")
    c = F.regexp_replace(c, "<[^>\\n]*>", " ")
    c = F.regexp_replace(c, "[ \\t\\x0B\\f\\r]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n+", "\n")
    return F.regexp_replace(c, "^\\s+|\\s+$", "")


def word_terms(col) -> F.Column:
    """Normalized word terms for TF-IDF: lowercase, split on non-letter
    runs, keep terms of length >= 3 (engine- and locale-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), "[^a-z]+"), lambda t: F.length(t) >= 3
    )


def tfidf_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """TF-IDF sufficient statistics: (doc, term, tf, df, n_docs) — all
    exact integers, so the result is engine-independent (float idf weights
    are applied downstream, see ``tfidf_topk``).

    Plan shape at 100 TB: explode is map-side; tf = one shuffle keyed
    (doc, term) with partial aggregation; df = a partial-aggregated
    ``groupBy(term)`` over the tf rows joined back on term — NOT a window
    over term, which would funnel every (doc, term) row of a high-df term
    (stopword-adjacent terms in billions of docs) into one unbounded
    window partition; residual join skew on hot terms is AQE-splittable,
    which window skew is not (the line_dedup / ADVICE r2 pattern)."""
    # n_docs as a lazy 1-row broadcast (no driver-side action)
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    term_rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_terms(text_col)).alias("term"),
    )
    tf = term_rows.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # each tf row is a distinct (doc, term), so count-per-term IS the
    # document frequency
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", "df", "n_docs")
    )


def tfidf_topk(
    df: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (tf * (ln((n+1)/(df+1)) + 1)), ties broken lexicographically."""
    from pyspark.sql import Window

    stats = tfidf_stats(df, id_col, text_col)
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        score.desc(), F.col("term")
    )
    return (
        stats.withColumn("tfidf", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("doc_id", "rnk")
    )


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram frequency table ``(term, term_count)`` over the
    normalized word terms.  One explode + one shuffle on term — the
    map-side partial aggregation makes the shuffle carry only distinct
    (partition, term) pairs, so at 100 TB this moves the vocabulary, not
    the token stream."""
    return (
        df.select(F.explode(word_terms(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("term_count"))
    )


def commonness_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram commonness — an exact-integer analog of the
    CCNet-style LM quality filter: rank documents by how frequent their
    words are in the corpus (rare-word-heavy docs are outliers; all-filler
    docs score uniformly high).  Emits sufficient statistics only
    (``n_terms, sum_term_count, min_term_count`` — all BIGINT), so the
    result is engine-exact; any float scoring (e.g. mean log frequency)
    is a downstream projection.

    Plan shape: explode -> join to the vocab (broadcastable when the
    vocabulary is small; AQE decides) -> re-aggregate by document.  The
    vocab may be precomputed/persisted and passed in (the 100 TB path:
    score a new shard against a frozen corpus vocabulary without
    rescanning the corpus).  Documents with zero terms are absent from
    the output (inner-join semantics).
    """
    if vocab is None:
        vocab = unigram_counts(df, text_col)
    tok = df.select(F.col(id_col), F.explode(word_terms(text_col)).alias("term"))
    return (
        tok.join(vocab, "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("term_count").cast("long").alias("sum_term_count"),
            F.min("term_count").cast("long").alias("min_term_count"),
        )
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``n_tokens``            total whitespace tokens
    - ``distinct_token_frac`` |distinct tokens| / n_tokens
    - ``top_bigram_count``    occurrences of the most frequent word 2-gram
    - ``top_bigram_frac``     top_bigram_count * 2 / n_tokens (fraction of
                              tokens covered by the dominant 2-gram)

    Fractions are emitted as exact integer ratios quantized *1e6 (the
    suite's determinism convention).

    Plan shape at 100 TB: bigrams are exploded map-side; the per-(doc,
    gram) count is one keyed shuffle with partial aggregation; the per-doc
    argmax is a second keyed shuffle on doc id.  No self-joins, no
    per-document O(n^2) array scans (the in-array ``filter``-count
    alternative is quadratic in document length and dies on long docs).
    """
    t = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        t.alias("_toks"),
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("_toks"), 1, F.size("_toks") - 1),
                lambda w, i: F.concat_ws(
                    " ", w, F.element_at(F.col("_toks"), i + 2)
                ),
            )
        ).alias("gram"),
    )
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return (
        base.drop("_toks")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                F.col("n_distinct") * 1_000_000 / F.col("n_tokens")
            ).alias("distinct_token_frac_ppm"),
            F.coalesce("top_bigram_count", F.lit(0)).alias(
                "top_bigram_count"
            ),
            F.floor(
                F.coalesce("top_bigram_count", F.lit(0))
                * 2_000_000
                / F.col("n_tokens")
            ).alias("top_bigram_frac_ppm"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> DataFrame:
    """Exact substring-duplication signal — the ExactSubstr criterion of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") approximated at word ``n``-gram granularity: for each
    document, how many token positions start a word n-gram that occurs
    more than once anywhere in the corpus (including elsewhere in the same
    document).

    Output per document (all exact BIGINT):
      ``n_positions``      number of n-gram start positions (tokens-n+1)
      ``n_dup_positions``  positions whose n-gram is globally non-unique
      ``dup_frac_ppm``     floor(n_dup_positions * 1e6 / n_positions)

    Plan shape at 100 TB: grams are exploded map-side and immediately
    xxhash64-hashed, so the global-occurrence shuffle carries 8-byte long
    keys, never the gram strings (the oracle counts raw grams — the gate
    compares per-doc COUNTS, so any collision-free hash agrees; a 64-bit
    collision at gate scale is ~1e-9).  The global
    count is a partial-aggregated ``groupBy(digest)`` whose repeated set
    (occ > 1) joins back onto the gram stream — NOT a window over the
    digest, which would funnel every copy of a boilerplate gram (the
    exact grams this operator targets) into one unbounded window
    partition; residual join skew is AQE-splittable (the line_dedup /
    ADVICE r2 pattern).  Then one keyed shuffle back to doc id with
    partial aggregation.  A true suffix-array ExactSubstr is
    character-exact but needs a global sort of every suffix; the word-gram
    formulation is the Spark-native approximation that keeps the corpus
    scan linear.
    """
    t = tokens(text_col)
    cnt = F.size(t) - (n - 1)

    def gram_hashes(tv):
        c = F.size(tv) - (n - 1)
        return F.when(
            c >= 1,
            F.transform(
                F.sequence(F.lit(1), c),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tv, i, n))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # bind the token array once per row: an inlined ``t`` would be
    # re-split per gram index inside the lambda (O(len^2) per doc)
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bind_once(t, gram_hashes)).alias("g"),
    )
    dup_digests = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("g")
    )
    dup = (
        grams.join(dup_digests, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_positions"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(cnt.cast("long"), F.lit(0).cast("long")).alias(
            "n_positions"
        ),
    )
    return base.join(dup, "doc_id", "left").select(
        "doc_id",
        "n_positions",
        F.coalesce("n_dup_positions", F.lit(0).cast("long")).alias(
            "n_dup_positions"
        ),
        F.when(F.col("n_positions") > 0, F.floor(
            F.coalesce("n_dup_positions", F.lit(0))
            * 1_000_000
            / F.col("n_positions")
        )).otherwise(F.lit(0).cast("long")).alias("dup_frac_ppm"),
    )


# Boilerplate phrases the C4 cleanup drops documents for (Raffel et al.
# 2020 §2.2) — matched case-insensitively as substrings.
C4_BOILERPLATE: tuple[str, ...] = (
    "lorem ipsum",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
)


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    badwords: tuple[str, ...] = (),
    min_words: int = 5,
    max_word_len: int = 1000,
) -> DataFrame:
    """C4-style document cleanup rules (Raffel et al. 2020 §2.2): per-rule
    boolean columns plus a composite ``keep``.  Complements
    ``gopher_rules`` (statistical thresholds) with C4's content rules:

      r_min_words  at least ``min_words`` whitespace tokens
      r_word_len   no token longer than ``max_word_len`` chars (C4 drops
                   lines with words > 1000 chars — concatenated junk)
      r_badwords   no token is in the lowercase ``badwords`` list
      r_brace      no '{' anywhere (C4's code/JSON page filter)
      r_boiler     none of the C4_BOILERPLATE phrases appear (lowercased)

    All pure Column expressions over one tokenization — map-side only,
    zero shuffles, whole-stage codegen with the parquet scan; keep/drop is
    exact string/integer logic, bit-identical on every engine and
    partitioning.
    """
    t = tokens(text_col)
    lower = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    bad_arr = F.array(*[F.lit(w) for w in badwords])
    rules: dict[str, F.Column] = {
        "r_min_words": F.size(t) >= min_words,
        "r_word_len": F.size(
            F.filter(t, lambda w: F.length(w) > max_word_len)
        ) == 0,
        "r_badwords": (
            F.lit(True)
            if not badwords
            else F.size(
                F.filter(t, lambda w: F.array_contains(bad_arr, F.lower(w)))
            ) == 0
        ),
        "r_brace": ~lower.contains("{"),
        "r_boiler": F.lit(True),
    }
    boiler = F.lit(False)
    for phrase in C4_BOILERPLATE:
        boiler = boiler | lower.contains(phrase)
    rules["r_boiler"] = ~boiler
    out = df.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def word_ngrams(col, n: int) -> F.Column:
    """Distinct word n-grams (space-joined) of a text column — the unit of
    benchmark-decontamination matching.  Pure array expressions; the
    token array is bound once per row (``bind_once``) so gram
    construction is O(len * n), not the O(len^2) an inlined re-split
    inside the transform lambda would cost."""

    def grams(t):
        cnt = F.size(t) - (n - 1)
        return F.when(
            cnt >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), cnt),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens(col), grams)


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    keep: bool = True,
) -> DataFrame:
    """Benchmark decontamination: drop (``keep=True``) or flag
    (``keep=False``, adds ``contaminated``) corpus documents sharing any
    word ``n``-gram with the evaluation set — the GPT-3-style n-gram
    overlap rule.

    Scale shape: the eval set is benchmarks (thousands of docs), so its
    distinct-gram table broadcasts; the corpus side is a map-side explode
    into a broadcast semi join inside the scan stage.  The only shuffled
    data is the matched-id set (contaminated docs — tiny), which AQE then
    broadcasts back for the anti join; the 100 TB corpus itself is never
    shuffled.
    """
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    if keep:
        bad = corpus_grams.join(
            F.broadcast(eval_grams), "gram", "left_semi"
        ).select(id_col).distinct()
        return corpus.join(bad, id_col, "left_anti")
    flagged = corpus_grams.join(
        F.broadcast(eval_grams), "gram", "left_semi"
    ).select(F.col(id_col).alias("__bad_id")).distinct()
    return corpus.join(
        flagged, corpus[id_col] == F.col("__bad_id"), "left"
    ).select(
        corpus["*"], F.col("__bad_id").isNotNull().alias("contaminated")
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{7,}\b", "<NUM>"),
]


def scrub_pii(col) -> F.Column:
    """Replace emails, IPv4 literals, and long digit runs with typed
    placeholder tokens.  Pure regexp_replace chain — map-side, codegen,
    streaming-safe."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def fingerprint(col, k: int = 8) -> F.Column:
    """64-bit document fingerprint: xxhash64 fold over the k-shingle set
    (rolling-hash style content signature, independent of whitespace
    normalization differences)."""
    from .dedup import shingles

    sh = F.array_sort(F.transform(shingles(col, k), lambda s: F.xxhash64(s)))
    return F.aggregate(
        sh,
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    )


def normalize_text(
    col,
    *,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    lower: bool = False,
) -> F.Column:
    """Standard corpus text normalization (the cleanup stage C4/RefinedWeb
    run before any hashing or dedup): strip non-whitespace control
    characters, collapse whitespace runs to single spaces, trim, and
    optionally case-fold.  Pure regexp/string Column expressions —
    map-side, codegen-fused, and portable (the same patterns run on RE2
    and Java regex engines, which the parity oracle exploits).

    Order matters and is pinned: control-strip first (so a control char
    between spaces cannot create a fresh run), then collapse, then trim,
    then case-fold.  Normalize BEFORE fingerprinting/minhash — otherwise
    whitespace variants of the same document hash apart."""
    c = F.col(col) if isinstance(col, str) else col
    if strip_control:
        c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, "\\s+", " "))
    if lower:
        c = F.lower(c)
    return c


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 20,
) -> list[tuple[str, str]]:
    """Learn byte-pair-encoding merges from a corpus (Sennrich et al.
    2016), distributed the way BPE actually scales: ONE corpus pass
    builds the weighted ``(word, count)`` vocabulary, and every merge
    iteration then runs on that vocabulary table — O(|vocab|) per merge,
    independent of corpus size, which is why training at 100 TB is cheap
    while a naive per-document formulation would re-scan everything.

    Within-word training (GPT-2 convention): each vocab word starts as a
    character sequence; per iteration the highest-count adjacent symbol
    pair merges, ties broken lexicographically (deterministic on every
    engine and partitioning).  The vocab table is localCheckpoint-ed
    between rounds (the connected_components idiom) so the merge-fold
    lineage never stacks.

    Returns the ordered merge list ``[(left, right), ...]``.
    """
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.filter(F.split("w", "(?!^)"), lambda s: s != "").alias(
                "syms"
            ),
            "n",
        )
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("a"), b.alias("b")
                        ),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < 2:
            break
        a, b = pairs[0]["p"]["a"], pairs[0]["p"]["b"]
        merges.append((a, b))
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        vocab = vocab.select(merged.alias("syms"), "n").localCheckpoint()
    return merges


def bpe_segment(col, merges: list[tuple[str, str]]) -> F.Column:
    """Apply a learned merge list to a text column: per token, start from
    characters and greedily apply each merge left-to-right in order —
    exactly the training fold, so segmenting the training corpus with its
    own merges reproduces the final training state.  Returns
    ``array<array<string>>`` (symbols per token).

    Implementation note: the chain is generated as a SQL expression with
    explicit per-level lambda variable names — PySpark's Python-lambda
    HOFs auto-name their variables and the resolver rejects the collision
    once transform/aggregate nest three deep.  One fold per merge rule is
    fine for rule lists in the tens; for production vocabularies segment
    through an Arrow-batched UDF instead (the pq_encode split)."""

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    inner = "filter(split(w, '(?!^)'), c0 -> c0 != '')"
    for i, (a, b) in enumerate(merges):
        inner = (
            f"aggregate({inner}, CAST(array() AS ARRAY<STRING>), "
            f"(acc{i}, s{i}) -> CASE WHEN size(acc{i}) > 0 "
            f"AND element_at(acc{i}, -1) = {q(a)} AND s{i} = {q(b)} "
            f"THEN concat(slice(acc{i}, 1, size(acc{i}) - 1), "
            f"array({q(a + b)})) "
            f"ELSE concat(acc{i}, array(s{i})) END)"
        )
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("bpe_segment requires a column name")
    return F.expr(
        f"transform(split(trim({name}), '\\\\s+'), w -> {inner})"
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows (the RAG /
    long-context training chunking stage): windows start every ``stride``
    tokens and span ``chunk_tokens`` (the final window may be short; empty
    documents produce no chunks).  ``stride < chunk_tokens`` gives
    ``chunk_tokens - stride`` tokens of overlap so no boundary context is
    lost.

    Pure map-side: one tokenization, a sequence of window starts, and a
    posexplode — no shuffle at any corpus size; chunk ids are
    deterministic (0-based within document), so downstream dedup/indexing
    keys on (doc_id, chunk_id) stably across reruns.

    Output: (doc_id, chunk_id BIGINT, n_tokens BIGINT, text).
    """
    t = tokens(text_col)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # guard on trimmed length, not size(t): split('') yields [''], so an
    # empty document would otherwise emit one empty chunk.  The token
    # array is bound once per row (bind_once): an inlined ``t`` would
    # re-split the document per window inside the transform lambda.
    def windows(tv):
        starts = F.when(
            F.length(F.trim(c)) > 0,
            F.sequence(F.lit(1), F.size(tv), F.lit(stride)),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda st: F.struct(
                F.concat_ws(" ", F.slice(tv, st, chunk_tokens)).alias("text"),
                F.least(
                    F.lit(chunk_tokens), F.size(tv) - st + 1
                ).cast("long").alias("n_tokens"),
            ),
        )

    chunks = bind_once(t, windows)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.text").alias("text"),
    )


def split_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_chars: int = 1,
) -> DataFrame:
    """Split documents into sentences — the unit for per-sentence
    dedup, alignment, and citation-grain decontamination.  Rule-based
    and language-naive by design (a terminator ``.!?`` followed by
    whitespace ends a sentence; the terminator stays attached; common
    abbreviation traps are a documented non-goal — at corpus scale a
    deterministic cheap rule beats a model-grade splitter you cannot
    replay): lookbehind split + trim + length floor, one posexplode.

    Output: (doc_id, sent_id BIGINT, sentence).  Pure map-side — no
    shuffle at any corpus size; sentence ids are 0-based in document
    order so downstream joins key stably on (doc_id, sent_id)."""
    c = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""),
    )
    parts = F.filter(
        F.transform(
            F.split(c, "(?<=[.!?])\\s+"), lambda s: F.trim(s)
        ),
        lambda s: F.length(s) >= min_chars,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(parts).alias("sent_id", "sentence"),
    ).select(
        "doc_id",
        F.col("sent_id").cast("long").alias("sent_id"),
        "sentence",
    )


def fingerprint_md5(col, k: int = 8) -> F.Column:
    """Portable twin of ``fingerprint``: identical construction (sorted
    shingle-hash fold) with every hash an md5-32 — checkable against an
    independent engine (q_fingerprint_md5, the q_minhash_md5/
    q_simhash_md5 convention).  Production code wants ``fingerprint``
    (xxhash64, JVM-native); this form exists so the *construction* has an
    external correctness signal."""
    from .dedup import shingles

    def h32(c):
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")

    sh = F.array_sort(F.transform(shingles(col, k), h32))
    return F.aggregate(
        sh,
        F.lit(0).cast("long"),
        lambda acc, h: F.conv(
            F.substring(
                F.md5(F.concat_ws(":", acc.cast("string"), h.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )


def bpe_segment_arrow(col: str, merges: list[tuple[str, str]]) -> F.Column:
    """Arrow-batched twin of ``bpe_segment`` for production merge lists
    (hundreds to tens of thousands of rules): per token, greedy
    left-to-right application of each merge in order, in Python over
    Arrow batches — bit-equal to the generated-SQL fold chain (pinned by
    test), without its per-merge expression level.  The merge list rides
    along as a closure (broadcast once per executor)."""
    import pandas as pd

    rules = list(merges)

    def _seg(texts):
        out = []
        for t in texts:
            words = []
            # tokens_py mirrors the SQL chain's split(trim(x),'\s+')
            # exactly (empty tokens kept -> empty symbol arrays, matching
            # the fold over filter(split(w,'(?!^)'), ...) on '')
            for w in tokens_py(t):
                syms = list(w)
                for a, b in rules:
                    nxt: list[str] = []
                    for x in syms:
                        if nxt and nxt[-1] == a and x == b:
                            nxt[-1] = a + b
                        else:
                            nxt.append(x)
                    syms = nxt
                words.append(syms)
            out.append(words)
        return pd.Series(out)

    _seg.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    seg = F.pandas_udf(_seg, "array<array<string>>")
    return seg(F.col(col))


def length_percentiles(
    docs: DataFrame,
    *,
    value_col: str = "n_chars",
    strata_col: str = "lang",
    key_col: str = "doc_id",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-stratum length percentiles (corpus health profile: is a
    language's doc-length distribution collapsing to boilerplate?).

    Discrete (type-preserving) percentiles by total order: value at
    1-based position ceil(p*n) in the stratum's (value, key) order —
    exact integers, no interpolation, so the result is engine-exact
    (libm-free, unlike percentile_cont).  One window + one group-by on
    the stratum key.  At scale the window sorts each stratum once; for
    a skew-heavy stratum use approx_percentile as the screening pass and
    reserve this for the report cut (documented; the driver gate runs
    the exact path).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(value_col, key_col)
    n = Window.partitionBy(strata_col)
    r = docs.select(
        strata_col,
        F.col(value_col).cast("long").alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(n).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__rn") == F.ceil(F.col("__n") * F.lit(p)).cast("long"),
                F.col("__v"),
            )
        ).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    return r.groupBy(strata_col).agg(*aggs)


def vocab_profile(
    docs: DataFrame,
    *,
    text_col: str = "text",
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum vocabulary profile: total tokens, distinct tokens
    (vocabulary size), and the type-token ratio as exact ppm — the
    Heaps-law health check that catches template-generated or
    deduplication-damaged sources (vocabulary stops growing while token
    count doesn't).

    One explode + one two-level aggregate; countDistinct plans as the
    partial-distinct expand, shuffling only (stratum, token-digest)-sized
    keys.  All-integer output (q_tfidf convention).
    """
    toks = docs.select(strata_col, F.explode(tokens(text_col)).alias("__tok"))
    return (
        toks.groupBy(strata_col)
        .agg(
            F.count("*").cast("long").alias("total_tokens"),
            F.countDistinct("__tok").cast("long").alias("distinct_tokens"),
        )
        .select(
            strata_col,
            "total_tokens",
            "distinct_tokens",
            F.expr(
                "CAST(distinct_tokens * 1000000 DIV total_tokens AS BIGINT)"
            ).alias("ttr_ppm"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """The inverse view of ``decontaminate``: per EVAL item, how
    compromised is it — how many corpus documents share at least one
    word ``n``-gram with it, and how many of its grams are hit at all.
    ``decontaminate`` cleans the corpus; this report tells you which
    benchmarks were already leaked into the corpus badly enough that
    their scores are suspect even after cleaning (the audit run before
    trusting an eval).

    Output per eval doc: ``n_grams`` (its distinct gram count),
    ``n_grams_hit`` (distinct grams found anywhere in the corpus),
    ``n_corpus_docs`` (distinct corpus docs sharing >= 1 gram) — exact
    BIGINTs.  Eval docs with zero overlap appear with zeros.

    Scale shape: same as decontaminate — the eval gram table (with its
    owning eval id) broadcasts onto the corpus gram stream; the only
    shuffles aggregate (eval_id, gram digest) and (eval_id, corpus id)
    pairs, both bounded by matches, never corpus volume.
    """
    eval_grams = (
        eval_df.select(
            F.col(eval_id_col).alias("eval_id"),
            F.explode(word_ngrams(text_col, n)).alias("gram"),
        )
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    )
    hits = corpus_grams.join(F.broadcast(eval_grams), "gram")
    per_eval = hits.groupBy("eval_id").agg(
        F.countDistinct("gram").cast("long").alias("n_grams_hit"),
        F.countDistinct("corpus_id").cast("long").alias("n_corpus_docs"),
    )
    totals = eval_grams.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    return (
        totals.join(per_eval, "eval_id", "left")
        .fillna(0, subset=["n_grams_hit", "n_corpus_docs"])
        .select(
            "eval_id",
            "n_grams",
            F.col("n_grams_hit").cast("long").alias("n_grams_hit"),
            F.col("n_corpus_docs").cast("long").alias("n_corpus_docs"),
        )
    )
