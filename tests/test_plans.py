"""Plan-shape assertions: the scale contract, not just correctness.

These pin the physical-plan properties that matter at 100 TB (SCALING.md):
filters and projections reach the parquet scan, small dimensions broadcast
(the fact table is never shuffled for a join), and nothing degenerates to
an unbroadcast cartesian product.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from evm_archive_spark.parity.queries import PARITY_QUERIES

SF_DIR = "/root/testdata/sf0.001"

_BYNAME = {q.name: q for q in PARITY_QUERIES}


def plan_of(spark, name: str) -> str:
    df = _BYNAME[name].spark(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q_f1")
    assert "GreaterThan(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,25.0)" in plan
    # pruned to exactly the two filter columns
    assert "ReadSchema: struct<l_quantity:double,l_discount:double>" in plan


def test_projection_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q_sc2")
    scan = plan[plan.index("ReadSchema:"):].splitlines()[0]
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_comment" not in scan and "l_extendedprice" not in scan


def test_join_chain_broadcasts_dims_and_never_shuffles_fact(spark):
    plan = plan_of(spark, "q_j2")
    # orders/customer/nation all broadcast; lineitem side stays in place
    # (tree lines only — the formatted detail section repeats operators)
    assert plan.count("BroadcastHashJoin Inner BuildRight (") == 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_join_is_broadcast_semi(spark):
    plan = plan_of(spark, "q_j4")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_knn_broadcasts_query_side(spark):
    plan = plan_of(spark, "q_knn")
    # inequality join: BroadcastNestedLoop with the small query set as the
    # build side — the corpus is never shuffled or replicated
    assert "BroadcastNestedLoopJoin" in plan
    assert "BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_multitable_lsh_single_corpus_scan(spark):
    """n_tables independent LSH tables must NOT mean n_tables corpus
    scans: all buckets come from one array column posexploded before the
    self-join, so the candidate plan reads the parquet exactly twice
    (the two sides of the self-join) regardless of n_tables."""
    import tempfile

    from evm_archive_spark.operators.similarity import lsh_near_duplicates
    from evm_archive_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    with tempfile.TemporaryDirectory() as tmp:
        emb.write.mode("overwrite").parquet(tmp)
        stored = spark.read.parquet(tmp)
        df = lsh_near_duplicates(stored, threshold=0.4, n_planes=4, n_tables=8)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # 2 scans for the bucket self-join + 2 for the verify's vector
        # lookups; the 8 tables add zero extra scans (count the detail
        # headers — the tree section repeats each node)
        import re

        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 4


def test_decode_view_filter_pushdown(spark):
    # topic0 equality from the generated Transfer view must reach the scan
    # when logs live in parquet (B25: data-skipping replaces btree indexes)
    import tempfile

    from pyspark.sql import functions as F

    from evm_archive_spark import fixtures, views

    logs = fixtures.logs_df(spark)
    with tempfile.TemporaryDirectory() as tmp:
        logs.write.mode("overwrite").parquet(tmp)
        stored = spark.read.parquet(tmp)
        views.register_event_views(spark, stored)
        df = spark.table(
            "Transfer_address_from_address_to_uint256_amount_d"
        ).filter(F.col("evt_block_number") > 0)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "EqualTo(topic0," in plan
        assert "GreaterThan(block_number,0)" in plan


def test_pack_row_window_is_shard_partitioned(spark):
    """pack_by_budget's per-row cumsum must run as a PARTITIONED window
    (parallel across shards) — the naive global `SUM() OVER (ORDER BY)`
    would single-partition the corpus.  Global (SinglePartition) steps are
    allowed only for the tiny bounds/shard-totals tables."""
    plan = plan_of(spark, "q_pack")
    row_window = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(_shard#" in ln and ", doc_id#" in ln
    ]
    assert row_window, "per-row cumsum window must partition by _shard"
    assert "hashpartitioning(_shard#" in plan


def test_commonness_vocab_join_broadcasts_and_aggregates_partially(spark):
    """commonness_stats: the corpus-frequency vocab must reach the token
    stream as a broadcast join (AQE decides from the runtime vocab size —
    pin the final adaptive plan), and both aggregations must have map-side
    partial stages so the shuffles carry distinct keys, not the token
    stream."""
    df = _BYNAME["q_commonness"].spark(spark, SF_DIR)
    df.collect()  # materialize so explain shows the AQE final plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin Inner BuildRight" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count(1)" in plan  # vocab count is map-side partial
    assert "partial_sum(term_count" in plan  # per-doc agg likewise


def test_decontam_broadcasts_eval_and_matched_ids(spark):
    """decontaminate: eval grams broadcast into a semi join, matched ids
    broadcast into the anti join — the corpus is never sort-merge joined
    or replicated."""
    plan = plan_of(spark, "q_decontam")
    assert "BroadcastHashJoin LeftSemi BuildRight" in plan
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pq_encode_is_map_side_zero_shuffle(spark):
    """PQ encode must fuse into the scan: codeword literals, no exchange,
    no join — the scalar_quantize plan shape."""
    from evm_archive_spark.operators.similarity import pq_encode, pq_train
    import contextlib, io

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    book = pq_train(emb, sample_mod=41)
    coded = pq_encode(emb, book)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        coded.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bloom_dense_probe_is_map_side(spark):
    """The dense Bloom probe is a pure Column expression over the corpus
    scan — the only exchanges in a decontamination job belong to the tiny
    filter build, never the probe side."""
    from evm_archive_spark.operators.bloom import (
        bloom_build, bloom_contains, bloom_dense,
    )
    import contextlib, io
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter("doc_id % 23 = 0").select(F.col("text").alias("v"))
    bits, k = 1 << 12, 4
    dense = bloom_dense(
        bloom_build(ev, "v", num_bits=bits, num_hashes=k), num_bits=bits
    )
    probe = docs.select(
        "doc_id",
        bloom_contains("text", dense, num_bits=bits, num_hashes=k).alias(
            "hit"
        ),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_semantic_dedup_assignment_fold_has_no_expansion(spark):
    """Cluster assignment folds over one packed broadcast row: the corpus
    side must reach its self-join with no row-expanding explode/window and
    only broadcast exchanges before the centroid_id shuffle."""
    from evm_archive_spark.operators.similarity import semantic_dedup
    import contextlib, io

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_dedup(emb, threshold_num=2, threshold_den=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan          # no explode of centroids
    assert "CartesianProduct" not in plan  # packed row broadcast, not NLJ


def test_corpus_profile_is_single_scan_single_agg(spark):
    """The profile must stay one scan + one aggregate: no explode, no
    join, and exactly one exchange pair (partial -> final agg)."""
    from evm_archive_spark.operators.corpus import corpus_profile
    import contextlib, io

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus_profile(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Generate" not in plan and "Join" not in plan
    # tree section: a single shuffle between partial and final HashAggregate
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Scan parquet") == 1, tree


def test_pq_adc_scan_reads_only_code_column(spark, tmp_path):
    """The 32x-compression claim is real only if the ADC scan never
    touches the float embeddings: score a persisted coded corpus and pin
    the parquet ReadSchema to (vec_id, pq_codes)."""
    from evm_archive_spark.operators.similarity import (
        _int_dot, pq_encode, pq_train,
    )
    import contextlib, io
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    book = pq_train(emb, sample_mod=41)
    path = str(tmp_path / "coded")
    pq_encode(emb, book).select("vec_id", "pq_codes").write.parquet(path)
    coded = spark.read.parquet(path)
    lut = F.lit(
        [[1] * len(book[0]) for _ in range(len(book))]
    ).cast("array<array<bigint>>")
    scored = coded.select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("pq_codes"),
                lut,
                lambda c, l: F.element_at(l, (c + 1).cast("int")),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dot"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    scan = plan[plan.index("ReadSchema:"):].splitlines()[0]
    assert "pq_codes" in scan and "embedding" not in scan, scan


def test_asof_nearest_is_one_shuffle_one_sort_one_window(spark):
    """direction='nearest' computes BOTH candidate frames off a single
    Exchange+Sort and Catalyst fuses them into ONE Window operator — the
    whole point of running the forward frame over the backward sort order
    (operators/asof.py module doc)."""
    import re

    from evm_archive_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 10, 0)], "k string, t long, rid long")
    right = spark.createDataFrame([("a", 7, 70)], "k string, t long, v long")
    out = asof_join(
        left, right, on="t", by_left="k", by_right="k", value_cols=["v"],
        direction="nearest", tolerance=5, matched_on="mt",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1


def test_dsir_joins_broadcast_corpus_never_sort_merged(spark):
    """The 64-row bucket table broadcasts onto the exploded corpus (and the
    raw|target table join is hinted): no SortMergeJoin anywhere, so the
    token stream shuffles only for the per-doc re-aggregation."""
    from pyspark.sql import functions as F

    from evm_archive_spark.operators.sampling import dsir_stats

    docs = spark.createDataFrame(
        [(0, "a b", "en")], "doc_id long, text string, lang string"
    )
    out = dsir_stats(docs, F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_stratified_cap_first_window_is_salted(spark):
    """The heavy first top-k window partitions by (stratum, salt bucket);
    only the <= k*salt survivors hit the per-stratum window — the
    straggler-avoidance contract of sampling.stratified_cap."""
    import re

    from evm_archive_spark.operators.sampling import stratified_cap

    df = spark.createDataFrame([("s", 1)], "source string, doc_id long")
    out = stratified_cap(df, "source", "doc_id", 5, salt=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = re.sub(r"#\d+L?", "", buf.getvalue())
    assert "windowspecdefinition(source, __cap_s, __cap_h ASC" in plan
    assert "windowspecdefinition(source, __cap_h ASC" in plan


def test_aqe_converts_skewed_join_at_runtime(spark):
    """The unsalted complement to operators/skew.py: with AQE skew-join on
    (our session default), a 90%-one-key join is split at RUNTIME —
    executed plan shows SortMergeJoin(skew=true) — so ad-hoc joins
    survive skew even when nobody applied manual salting.  Thresholds are
    lowered to make fixture-sized partitions eligible; production relies
    on the same mechanism at its default sizes."""
    tuned = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).selectExpr(
            "CAST(CASE WHEN id % 10 < 9 THEN 0 ELSE id % 1000 END AS LONG) AS k",
            "id AS v",
        )
        right = spark.range(1000).selectExpr("id AS k", "id * 2 AS w")
        joined = left.join(right, "k")
        # collect() (not count()) so the inspected QueryExecution is the
        # one that actually ran
        assert len(joined.collect()) == 300_000
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lm_score_broadcasts_counts_corpus_not_sortmerged(spark):
    """lm_score's three count-table joins must broadcast (the tables are
    vocab-sized); the exploded corpus is never sort-merge shuffled for a
    join — its only shuffle is the final doc-key aggregation."""
    plan = plan_of(spark, "q_lm_score")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_hard_negatives_broadcasts_query_side(spark):
    """Label-exclusion join: small query set broadcasts, corpus stays
    partition-local (the q_knn contract with the extra predicate)."""
    plan = plan_of(spark, "q_hard_neg")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BuildRight" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iteration_joins_are_key_equi(spark):
    """Every pagerank iteration joins on node keys — no nested-loop or
    cartesian fallback anywhere in the 5-iteration plan."""
    plan = plan_of(spark, "q_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_is_single_join(spark):
    """The diff is ONE full-outer key join of the two snapshots — no
    extra exchanges beyond the two join-side hash partitionings and no
    plan-level duplication of either scan."""
    plan = plan_of(spark, "q_snapshot_diff")
    assert plan.count("SortMergeJoin FullOuter") == 1
    assert "CartesianProduct" not in plan


def test_length_bucket_row_window_is_bucket_shard_partitioned(spark):
    """length_bucket_batches' per-row ordinal must run as a window
    partitioned by (bucket, _shard) — parallel across shard ranges within
    each bucket; the naive per-bucket ROW_NUMBER would hot-partition the
    most common length bucket.  The only bucket-partitioned (unsharded)
    window is the tiny shard-totals prefix table (<= #buckets x shards
    rows)."""
    plan = plan_of(spark, "q_len_bucket")
    row_window = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(bucket#" in ln and "_shard#" in ln
        and ", doc_id#" in ln
    ]
    assert row_window, "per-row ordinal window must partition by (bucket, _shard)"
    assert "hashpartitioning(bucket#" in plan


def test_image_neardup_is_banded_equi_join(spark):
    """image_near_duplicates must plan the pigeonhole candidate stage as
    a hash-partitioned EQUI join on the (band, bits) keys — never a
    cartesian/all-pairs comparison — with verification as a post-join
    filter (bit_count), not a join condition re-evaluation."""
    plan = plan_of(spark, "q_image_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "bit_count" in plan  # verify stage survives into the plan


def test_bloom_merge_is_one_tiny_groupby(spark):
    """bloom_merge is a union + ONE bit_or groupBy on the tiny word
    domain — no joins at all (the member texts are hashed map-side)."""
    plan = plan_of(spark, "q_bloom_merge")
    assert "Join" not in plan
    assert "bit_or" in plan


def test_incr_corpus_pipeline_has_no_allpairs(spark):
    """The composed admission lane inherits its stages' shapes: digest
    anti-join + band semi/anti joins, all key-equi — no cartesian, no
    nested loop, no window over an unbounded corpus-frequency key."""
    plan = plan_of(spark, "q_incr_corpus")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_is_bucket_equi(spark):
    """VERDICT r6 #7 (the range_join precedent applied to
    rangejoin.interval_overlap_join, the q_av_align primitive): two
    LARGE parquet-backed interval sides — autoBroadcast disabled so
    neither side can hide behind a broadcast — must plan a hash-
    partitioned EQUI join on the exploded bucket id, never a
    BroadcastNestedLoopJoin or CartesianProduct, with the exact overlap
    predicate as a post-join filter."""
    import tempfile

    from pyspark.sql import functions as F

    from evm_archive_spark.operators.rangejoin import interval_overlap_join

    with tempfile.TemporaryDirectory() as tmp:
        spark.range(5000).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("l_lo"),
            (F.col("id") * 10 + 7).alias("l_hi"),
        ).write.parquet(f"{tmp}/l")
        spark.range(5000).select(
            F.col("id").alias("k2"),
            (F.col("id") * 10 + 3).alias("r_lo"),
            (F.col("id") * 10 + 12).alias("r_hi"),
        ).write.parquet(f"{tmp}/r")
        left = spark.read.parquet(f"{tmp}/l")
        right = spark.read.parquet(f"{tmp}/r")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = interval_overlap_join(
                left, right, "l_lo", "l_hi", "r_lo", "r_hi", 16.0
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                out.explain("formatted")
            plan = buf.getvalue()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_archive_fanout_is_map_side_only(spark):
    """The r8 archive fan-out lanes (q_7z, q_tgz) must be pure map
    jobs: payload synthesis, the container walk, and the member
    explode all happen inside mapInPandas passes.  The ONLY Exchange
    allowed is the ``ranged_by`` range partitioning of the tiny build
    INPUT (carries (id, text) rows only); the presentation order comes
    from sortWithinPartitions, so the decoded members are never
    shuffled at all — a final global orderBy would re-execute the
    whole build+decode chain as the range exchange's sampling pass
    (the r13 double-decode finding)."""
    import re

    for name in ("q_7z", "q_tgz"):
        plan = plan_of(spark, name)
        assert "Join" not in plan, name
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, (name, exchanges)
        assert "hashpartitioning" not in plan.lower(), name
        assert "rangepartitioning" in plan.lower(), name


#: Every ranged_by-converted map-side decode lane (r13 changes #3/#11,
#: r14 q_boilerplate/q_cdc_bounded): codec, archive, office, image,
#: audio, text and metadata families.  The pair/graph lanes with real
#: joins are deliberately NOT here.
_RANGED_MAP_SIDE_LANES = (
    "q_docx", "q_sqlite", "q_avro", "q_mkv_decode", "q_webp",
    "q_jpeg_arith", "q_squashfs", "q_ccitt_fax", "q_rar", "q_font_meta",
    "q_cab", "q_cab_set", "q_dicom", "q_pnm", "q_ics", "q_vad",
    "q_gopher", "q_html_extract", "q_boilerplate", "q_jpeg2000",
    "q_jbig2", "q_pdf_images", "q_lang_id", "q_fingerprint", "q_cdc",
    "q_cdc_bounded", "q_audio_meta", "q_image_meta", "q_exif_scrub",
    "q_video_meta", "q_phash", "q_markdown", "q_ipynb", "q_epub",
    "q_odt", "q_rtf", "q_xlsx", "q_doc", "q_pptx", "q_ods", "q_xls",
    "q_odp",
)


def test_ranged_lanes_are_map_side_only(spark):
    """The 'identical global order' invariant of ranged_by +
    sortWithinPartitions holds only while everything between them stays
    map-side (ADVICE r13 #4): a later shuffle-introducing change would
    silently break the declared output order, because the parity gate
    compares order-insensitively.  Pin every converted lane to the
    q_7z/q_tgz contract — exactly ONE Exchange (the range partitioning
    of the cheap build input), no hash partitioning, no Join."""
    import re

    for name in _RANGED_MAP_SIDE_LANES:
        plan = plan_of(spark, name)
        assert "Join" not in plan, name
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) == 1, (name, exchanges)
        assert "hashpartitioning" not in plan.lower(), name
        assert "rangepartitioning" in plan.lower(), name


def test_generate_filters_not_inferred_for_expensive_arrays(spark):
    """r13: InferFiltersFromGenerate turns explode(expensive_expr) into
    a pushed-down ``size(expr) > 0`` filter that re-evaluates the whole
    array build below the fan-out exchange (measured: the positional
    CDC md5 fold as a 20 s single-task scan stage at sf0.1).  The
    operators use the *_outer generate forms, which the inference rule
    skips — so each expensive array expression must appear exactly once
    in the plan (its Project), never again inside a Filter."""
    plan = plan_of(spark, "q_cdc")
    assert plan.count("aggregate(filter(sequence") == 1, (
        "cdc md5 fold duplicated (inferred generate filter is back)"
    )
    plan = plan_of(spark, "q_quantize")
    assert plan.count("zip_with(") == 2, (  # the one nested quantize expr
        "quantize zip_with duplicated (inferred generate filter)"
    )
    plan = plan_of(spark, "q_ipynb")
    assert plan.count("zip_with(") == 1, (
        "ipynb cell-merge zip_with duplicated (inferred generate filter)"
    )
