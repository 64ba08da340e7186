"""Partitioned-layout tests: directory pruning + round-trip fidelity."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from evm_archive_spark import fixtures, storage


def _synthetic_logs(spark, n=2000, range_size=100):
    i = F.col("id")
    return spark.range(n).select(
        F.format_string("0x%040x", F.pmod(i, F.lit(7))).alias("address"),
        F.format_string("0x%064x", F.pmod(i, F.lit(3))).alias("topic0"),
        F.lit("").alias("topic1"),
        F.lit("").alias("topic2"),
        F.lit("").alias("topic3"),
        F.format_string("0x%064x", i).alias("data"),
        F.format_string("0x%064x", F.expr("id DIV 10")).alias("block_hash"),
        F.expr("id DIV 2").alias("block_number"),
        F.format_string("0x%064x", i).alias("transaction_hash"),
        F.lit(0).cast("long").alias("transaction_index"),
        F.pmod(i, F.lit(2)).cast("long").alias("log_index"),
        F.lit(False).alias("removed"),
        F.lit(None).cast("timestamp").alias("block_timestamp"),
    )


def test_partitioned_roundtrip_and_layout(spark, tmp_path):
    path = str(tmp_path / "logs_part")
    logs = _synthetic_logs(spark)
    storage.write_logs_partitioned(logs, path, range_size=100)
    # hive-style block_range=N directories exist
    dirs = sorted(d for d in os.listdir(path) if d.startswith("block_range="))
    assert dirs == [f"block_range={i}" for i in range(10)]
    back = storage.read_logs(spark, path)
    assert back.count() == logs.count()
    assert sorted(back.columns) == sorted(logs.columns)


def test_block_window_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "logs_part")
    storage.write_logs_partitioned(_synthetic_logs(spark), path, range_size=100)
    df = storage.read_logs_block_window(spark, path, 150, 249, range_size=100)
    rows = df.select("block_number").distinct().collect()
    got = sorted(r[0] for r in rows)
    assert got[0] == 150 and got[-1] == 249
    # the derived block_range predicate must surface as a partition filter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "block_range" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_sorted_layout_skips_on_address(spark, tmp_path):
    # address/topic0 predicates must be pushed so row-group stats of the
    # sorted files can skip (the btree emulation, SCALING.md §1)
    path = str(tmp_path / "logs_part")
    storage.write_logs_partitioned(_synthetic_logs(spark), path, range_size=100)
    df = storage.read_logs(spark, path).filter(
        (F.col("address") == "0x" + "0" * 39 + "1")
        & (F.col("topic0") == "0x" + "0" * 63 + "1")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "EqualTo(address," in plan and "EqualTo(topic0," in plan
    assert df.count() > 0


def test_compact_block_range(spark, tmp_path):
    import os

    path = str(tmp_path / "logs_part")
    logs = _synthetic_logs(spark)
    # write fragmented: many small files inside each partition
    (
        logs.withColumn(
            "block_range", (F.col("block_number") / F.lit(100)).cast("long")
        )
        .repartition(16)
        .write.mode("overwrite")
        .partitionBy("block_range")
        .parquet(path)
    )
    part = os.path.join(path, "block_range=0")
    before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert before > 1
    n_before = spark.read.parquet(part).count()

    n = storage.compact_block_range(spark, path, 0)
    after = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert after == 1
    assert n == n_before
    # whole-table read still sees every row with the logical schema
    assert storage.read_logs(spark, path).count() == logs.count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key by write_bucketed join with
    ZERO Exchange (and, with matching sortBy, zero per-task Sort above
    the scans): the pay-the-shuffle-once-at-write-time contract."""
    import contextlib
    import io
    import re

    from evm_archive_spark.storage import write_bucketed

    logs = spark.range(0, 1000).selectExpr(
        "id AS block_number", "id % 7 AS address_id", "id * 2 AS v"
    )
    prices = spark.range(0, 500).selectExpr(
        "id AS block_number", "id * 10 AS price"
    )
    write_bucketed(
        logs, "t_logs_b", str(tmp_path / "logs_b"), ["block_number"], 4
    )
    write_bucketed(
        prices, "t_prices_b", str(tmp_path / "prices_b"), ["block_number"], 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join must pick SMJ — the layout claim
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_logs_b").join(
            spark.table("t_prices_b"), "block_number"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan
        # values survive the layout round-trip
        assert joined.count() == 500
        row = joined.filter("block_number = 42").collect()[0]
        assert (row["v"], row["price"]) == (84, 420)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_logs_b")
        spark.sql("DROP TABLE IF EXISTS t_prices_b")


def test_zorder_manifest_prunes_both_dimensions(spark, tmp_path):
    """Z-order + manifest: a range predicate on EITHER clustered column
    prunes files; under a plain single-column sort only the first column
    is selective.  Result equality vs a full-scan filter is exact."""
    from evm_archive_spark import skipping

    n = 40_000
    df = spark.range(n).selectExpr(
        "id",
        "CAST(id % 200 AS LONG) AS a",
        "CAST((id * 7919) % 200 AS LONG) AS b",
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    skipping.write_zordered(df, zpath, ["a", "b"], n_files=16)
    # contrast layout: sorted by a only
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )

    man_z = skipping.build_manifest(spark, zpath, ["a", "b"]).cache()
    man_s = skipping.build_manifest(spark, spath, ["a", "b"]).cache()
    total_z = man_z.count()
    total_s = man_s.count()

    pred = {"a": (20, 40), "b": (100, 120)}
    kept_z = len(skipping.prune_files(man_z, pred))
    assert kept_z < total_z  # 2-dim predicate prunes under z-order

    # predicate on the SECOND column only: z-order prunes, plain sort can't
    kept_z_b = len(skipping.prune_files(man_z, {"b": (100, 120)}))
    kept_s_b = len(skipping.prune_files(man_s, {"b": (100, 120)}))
    assert kept_z_b < total_z
    assert kept_s_b == total_s

    got = (
        skipping.read_pruned(spark, man_z, pred)
        .filter("a BETWEEN 20 AND 40 AND b BETWEEN 100 AND 120")
        .select("id")
    )
    expect = df.filter("a BETWEEN 20 AND 40 AND b BETWEEN 100 AND 120").select("id")
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in expect.collect()
    )
    man_z.unpersist()
    man_s.unpersist()


def test_incremental_minhash_bucketed_index_one_sided(spark, tmp_path):
    """VERDICT r3 #5: the persisted MinHash band index, written bucketed
    by (band, bhash), joins the incoming shard with a ONE-SIDED shuffle —
    exactly one Exchange in the dedup plan (the shard's band rows), zero
    above the bucketed index scan.  Results are pinned equal to the
    unbucketed path."""
    import contextlib
    import io
    import re

    from evm_archive_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_index,
        persist_minhash_band_index,
    )

    docs = spark.range(200).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN concat('shared text body number ', id % 10) "
        "ELSE concat('unique document payload ', id, ' tail ', id * 7) END AS text",
    )
    corpus = docs.filter("doc_id >= 100")
    shard = docs.filter("doc_id < 100")

    idx = minhash_band_index(corpus, num_perm=8, bands=4)
    bucketed = persist_minhash_band_index(
        spark, idx, "t_mh_band_idx", str(tmp_path / "mh_idx"), n_buckets=4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        survivors = incremental_minhash_dedup(
            shard, bucketed, num_perm=8, bands=4
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            survivors.explain("formatted")
        plan = buf.getvalue()
        # one-sided: every Exchange sits under the shard side (band rows
        # into the semi join, distinct hits, anti-join back); the bucketed
        # index scan must feed its join with NO Exchange above it.  Walk
        # the tree from the scan line upward by indentation: every
        # ancestor until the join must be Exchange-free.
        assert "SortMergeJoin" in plan, plan
        assert re.search(r"Bucketed: true", plan), plan
        tree = [
            ln for ln in plan.splitlines() if re.search(r"[+:]- \(?\w|^\w", ln)
        ]
        scan_i = next(
            i for i, ln in enumerate(tree) if "t_mh_band_idx" in ln
        )
        depth = tree[scan_i].index("- ")
        ancestors = []
        for ln in reversed(tree[:scan_i]):
            d = ln.index("- ") if "- " in ln else -1
            if d < depth:
                ancestors.append(ln)
                depth = d
                if "SortMergeJoin" in ln:
                    break
        assert any("SortMergeJoin" in ln for ln in ancestors), plan
        assert not any("Exchange" in ln for ln in ancestors), (
            f"Exchange above the bucketed index scan:\n{plan}"
        )
        got = sorted(r["doc_id"] for r in survivors.collect())
        want = sorted(
            r["doc_id"]
            for r in incremental_minhash_dedup(
                shard, idx, num_perm=8, bands=4
            ).collect()
        )
        assert got == want and len(got) < 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_mh_band_idx")


def test_incremental_image_index_bucketed_one_sided(spark, tmp_path):
    """The image mirror of the MinHash one-sided pin (VERDICT r4 #6): a
    persisted image_hash_index bucketed by (bi, bv) joins the incoming
    shard's band rows with ZERO Exchange above the bucketed index scan,
    and the bucketed probe's admissions equal the unbucketed path's."""
    import contextlib
    import io
    import re

    import numpy as np
    import pandas as pd

    from evm_archive_spark.operators import multimodal
    from evm_archive_spark.operators.png import encode_png

    rng = np.random.default_rng(41)

    def img_bytes(seed):
        im = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
        im[:, :, 3] = 255
        return encode_png(im)

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": range(20), "payload": [img_bytes(i) for i in range(20)]}
        )
    )
    shard = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": range(100, 110),
             "payload": [img_bytes(i) for i in range(10)]}
        )
    )
    admitted = multimodal.image_dedup_pipeline(corpus, strict=True)
    idx = multimodal.image_hash_index(admitted)
    spark.sql("DROP TABLE IF EXISTS t_img_band_idx")
    bucketed = multimodal.persist_image_hash_index(
        spark, idx, "t_img_band_idx", str(tmp_path / "img_idx"), n_buckets=4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        survivors = multimodal.incremental_image_dedup(
            shard, bucketed, strict=True
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            survivors.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert re.search(r"Bucketed: true", plan), plan
        tree = [
            ln for ln in plan.splitlines() if re.search(r"[+:]- \(?\w|^\w", ln)
        ]
        scan_i = next(
            i for i, ln in enumerate(tree) if "t_img_band_idx" in ln
        )
        depth = tree[scan_i].index("- ")
        ancestors = []
        for ln in reversed(tree[:scan_i]):
            d = ln.index("- ") if "- " in ln else -1
            if d < depth:
                ancestors.append(ln)
                depth = d
                if "SortMergeJoin" in ln:
                    break
        assert any("SortMergeJoin" in ln for ln in ancestors), plan
        assert not any("Exchange" in ln for ln in ancestors), (
            f"Exchange above the bucketed index scan:\n{plan}"
        )
        got = sorted(r["media_id"] for r in survivors.collect())
        want = sorted(
            r["media_id"]
            for r in multimodal.incremental_image_dedup(
                shard, idx, strict=True
            ).collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_img_band_idx")
