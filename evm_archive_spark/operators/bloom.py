"""Deterministic Bloom-filter membership for corpus-scale set tests
(north-star extension; complements ``textanalysis.decontaminate``).

``decontaminate`` broadcasts the *exact* benchmark n-gram set; that is the
right call up to a few hundred MB of grams.  Past that, the scale path is a
Bloom filter (Bloom 1970): k hashed bit positions per member, OR-ed into an
m-bit array.  The filter is ~10 bits/member at 1% false-positive rate, so a
billion-gram eval suite compresses to ~1.2 GB — broadcastable where the
gram set itself is not — and membership tests stay map-side over the
corpus scan (false positives only, never false negatives: safe for
decontamination, which over-drops slightly rather than leaking).

Portability is the design constraint here: positions derive from
``md5(i || ':' || value)`` (first 8 hex digits → int, mod m), the same
digest idiom the parity suite already uses for hash splits and minhash
(q_split / q_minhash_md5), so an independent engine (the DuckDB oracle)
reproduces the filter bit-for-bit.  Words are 32 bits wide so every shift
stays far from BIGINT sign trouble on any engine.

Plan shape at 100 TB: building the filter is one explode + one groupBy on
``word`` (tiny domain, m/32 rows); probing with the dense form is pure
Column logic fused into the corpus scan — zero shuffles.  The join-based
probe (for filters too big to inline) broadcasts the sparse (word, bits)
table and pays one groupBy back to the row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_BITS = 32


def _col(c) -> F.Column:
    return F.col(c) if isinstance(c, str) else c


def _mask(bit: F.Column) -> F.Column:
    """``1 << bit`` for a Column bit index: element_at over a 32-entry mask
    literal (the Python shiftleft wrapper only takes int shift amounts).
    ``F.lit(list)`` — a true Catalyst Literal, materialized once — not
    ``F.array(*lits)``, whose CreateArray rebuilds the array per row."""
    masks = F.lit([1 << b for b in range(WORD_BITS)]).cast("array<bigint>")
    return F.element_at(masks, bit.cast("int") + 1)


def bloom_positions(col, *, num_bits: int, num_hashes: int) -> F.Column:
    """Array of ``num_hashes`` bit positions (BIGINT in [0, num_bits)) for a
    string value — the portable md5 family ``h_i = md5(i ':' value)``."""
    c = _col(col)
    return F.transform(
        F.sequence(F.lit(1), F.lit(num_hashes)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(":", i.cast("string"), c)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % num_bits,
    )


def bloom_build(
    df: DataFrame, col, *, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """Build the sparse filter: one row per touched 32-bit word,
    ``(word BIGINT, bits BIGINT)``.  One explode (map-side) + one groupBy
    on the tiny word domain."""
    pos = df.select(
        F.explode(
            bloom_positions(col, num_bits=num_bits, num_hashes=num_hashes)
        ).alias("p")
    )
    built = pos.groupBy(
        F.floor(F.col("p") / WORD_BITS).cast("long").alias("word")
    ).agg(F.bit_or(_mask(F.col("p") % WORD_BITS)).alias("bits"))
    return _stamp_params(built, num_bits, num_hashes)


def _stamp_params(bloom_df: DataFrame, num_bits: int, num_hashes: int):
    """Carry (num_bits, num_hashes) in the ``bits`` column metadata so
    merge can refuse incompatible filters; survives select and parquet
    round trips, invisible to row values."""
    return bloom_df.withColumn(
        "bits",
        F.col("bits").alias(
            "bits", metadata={"num_bits": num_bits, "num_hashes": num_hashes}
        ),
    )


def _read_params(bloom_df: DataFrame):
    md = dict(bloom_df.schema["bits"].metadata or {})
    if "num_bits" in md and "num_hashes" in md:
        return int(md["num_bits"]), int(md["num_hashes"])
    return None


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union sparse Bloom filters built with the SAME (num_bits,
    num_hashes): union the word rows, bit_or per word.

    This is the incremental-state lane for decontamination: per-shard
    filters built independently (tonight's new benchmark suite, last
    week's) merge into one filter EXACTLY equal to a from-scratch build
    over the concatenated member sets — Bloom OR-composition is lossless
    by construction, so the merged filter's false-negative guarantee
    (none) survives.  One tiny-domain groupBy; never touches member
    values again (test pins merge == rebuild bit-for-bit).

    Filters built by ``bloom_build`` carry (num_bits, num_hashes) in the
    ``bits`` column metadata; merging filters whose recorded parameters
    disagree raises ``ValueError`` (the OR of differently-parameterized
    filters silently loses the no-false-negative guarantee).  Filters
    without metadata (hand-assembled word/bits rows) are accepted
    unchecked."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    params = {p for p in (_read_params(f) for f in filters) if p is not None}
    if len(params) > 1:
        raise ValueError(
            "bloom_merge: incompatible filter parameters "
            f"{sorted(params)}; all inputs must share (num_bits, "
            "num_hashes) or the merged filter loses its no-false-"
            "negative guarantee"
        )
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    merged = out.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    if params:
        merged = _stamp_params(merged, *params.pop())
    return merged


def bloom_dense(bloom_df: DataFrame, *, num_bits: int) -> list[int]:
    """Collect the sparse filter into a dense word list (driver-side; the
    filter is small by construction — this is the broadcast payload)."""
    n_words = (num_bits + WORD_BITS - 1) // WORD_BITS
    dense = [0] * n_words
    for r in bloom_df.collect():
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_contains(
    col, dense: list[int], *, num_bits: int, num_hashes: int
) -> F.Column:
    """Boolean Column: value's k positions are all set in the dense filter.
    Pure expression (array literal + element_at) — fuses into the scan.
    Suitable up to ~1M bits; beyond that use ``bloom_might_contain_join``."""
    arr = F.lit([int(w) for w in dense]).cast("array<bigint>")
    c = _col(col)
    return F.forall(
        bloom_positions(c, num_bits=num_bits, num_hashes=num_hashes),
        lambda p: (
            F.element_at(
                arr, (F.floor(p / WORD_BITS) + 1).cast("int")
            ).bitwiseAND(_mask(p % WORD_BITS))
            != 0
        ),
    )


def bloom_might_contain_join(
    df: DataFrame,
    col,
    bloom_df: DataFrame,
    *,
    id_col: str,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Membership via broadcast join against the sparse filter — the path
    for filters too large to inline as a literal.  Explodes k rows per
    input, broadcast-joins (word → bits), and requires all k hits; one
    groupBy on ``id_col`` brings it back to row grain with column
    ``maybe_member``."""
    pos = df.select(
        F.col(id_col),
        _col(col).alias("__v"),
        F.explode(
            bloom_positions(col, num_bits=num_bits, num_hashes=num_hashes)
        ).alias("p"),
    ).withColumn("word", F.floor(F.col("p") / WORD_BITS).cast("long"))
    joined = pos.join(F.broadcast(bloom_df), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0).cast("long"))
        .bitwiseAND(_mask(F.col("p") % WORD_BITS))
        != 0
    )
    return joined.groupBy(id_col, "__v").agg(
        F.min(hit.cast("int")).cast("boolean").alias("maybe_member")
    ).drop("__v")


def bloom_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    impl: str = "arrow",
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: build the filter
    from the eval set's distinct word n-grams, then flag every corpus
    document containing ANY maybe-member gram.  Per document:

      ``n_grams``             distinct n-grams probed (BIGINT)
      ``n_hits``              grams the filter reports present (BIGINT)
      ``maybe_contaminated``  n_hits > 0

    False positives over-flag (never under-flag) — the safe direction.
    The probe is map-side; the only shuffles are the tiny filter build.
    Both impls are bit-identical (pinned by test): ``impl='expr'`` keeps
    the pure Column formulation (gram construction + forall over the
    dense literal); ``impl='arrow'`` (default) runs the probe through an
    Arrow-batched UDF — gram building and k md5 probes per gram are the
    interpreted-HOF hot spot, and the vectorized batch path is ~5-10x
    (the pq_encode precedent)."""
    from .textanalysis import word_ngrams

    # no .distinct() on the eval grams: duplicate Bloom inserts are
    # idempotent (bit OR), so the dedup shuffle would be pure waste
    bloom = bloom_build(
        eval_df.select(F.explode(word_ngrams(text_col, n)).alias("g")),
        "g",
        num_bits=num_bits,
        num_hashes=num_hashes,
    )
    dense = bloom_dense(bloom, num_bits=num_bits)
    if impl == "arrow":
        return _bloom_decontaminate_arrow(
            docs, dense, id_col, text_col, n, num_bits, num_hashes
        )
    # materialize the gram array once (its construction dominates the
    # probe); n_hits is then referenced by name, never recomputed
    g = docs.select(
        F.col(id_col), word_ngrams(text_col, n).alias("__grams")
    )
    scored = g.select(
        F.col(id_col),
        F.size("__grams").cast("long").alias("n_grams"),
        F.size(
            F.filter(
                F.col("__grams"),
                lambda gg: bloom_contains(
                    gg, dense, num_bits=num_bits, num_hashes=num_hashes
                ),
            )
        )
        .cast("long")
        .alias("n_hits"),
    )
    return scored.withColumn(
        "maybe_contaminated", F.col("n_hits") > 0
    ).drop("__grams")


def _bloom_decontaminate_arrow(
    docs: DataFrame,
    dense: list[int],
    id_col: str,
    text_col: str,
    n: int,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Arrow-batched probe: per document, distinct word n-grams and their
    k md5 bit probes computed in Python over Arrow batches.  Exactly the
    expr path's arithmetic — ``md5(i ':' gram)`` first 8 hex → int mod m
    on the identical byte strings — so results are bit-equal (pinned by
    test).  Early-exits on the first unset bit per gram."""
    import hashlib

    import pandas as pd

    dense_t = tuple(int(w) for w in dense)

    def _probe(texts):
        from .textanalysis import tokens_py

        n_grams, n_hits = [], []
        for t in texts:
            # tokens_py mirrors the expr path's split(trim(x),'\s+')
            # exactly (ADVICE r2): empty tokens are kept and participate
            # in grams just as word_ngrams' slice-join does
            toks = tokens_py(t)
            if len(toks) >= n:
                grams = {
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                }
            else:
                grams = set()
            hits = 0
            for g in grams:
                ok = True
                for i in range(1, num_hashes + 1):
                    h = (
                        int(
                            hashlib.md5(
                                f"{i}:{g}".encode()
                            ).hexdigest()[:8],
                            16,
                        )
                        % num_bits
                    )
                    if not (dense_t[h // WORD_BITS] >> (h % WORD_BITS)) & 1:
                        ok = False
                        break
                if ok:
                    hits += 1
            n_grams.append(len(grams))
            n_hits.append(hits)
        return pd.DataFrame({"n_grams": n_grams, "n_hits": n_hits})

    _probe.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    probe = F.pandas_udf(_probe, "n_grams bigint, n_hits bigint")
    scored = docs.select(
        F.col(id_col), probe(F.col(text_col)).alias("__p")
    ).select(
        id_col,
        F.col("__p.n_grams").alias("n_grams"),
        F.col("__p.n_hits").alias("n_hits"),
    )
    return scored.withColumn("maybe_contaminated", F.col("n_hits") > 0)
