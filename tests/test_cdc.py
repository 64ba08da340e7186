"""Content-defined chunking tests: FastCDC invariants + resync
property, positional twin vs an independent python reference, and
chunk-level dedup stats."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from evm_archive_spark.operators import cdc


def test_fastcdc_invariants():
    rng = np.random.default_rng(11)
    b = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    cuts = cdc.fastcdc_boundaries(b, min_size=64, avg_size=256, max_size=1024)
    assert cuts[-1] == len(b)
    assert cuts == sorted(set(cuts))
    sizes = [e - s for s, e in zip([0] + cuts[:-1], cuts)]
    # every chunk but the last obeys min/max
    assert all(64 <= sz <= 1024 for sz in sizes[:-1])
    assert sizes[-1] <= 1024
    # deterministic
    assert cuts == cdc.fastcdc_boundaries(
        b, min_size=64, avg_size=256, max_size=1024
    )
    # avg lands in the right decade (normalized chunking)
    assert 100 <= len(b) / len(sizes) <= 600
    assert cdc.fastcdc_boundaries(b"") == []
    with pytest.raises(ValueError):
        cdc.fastcdc_boundaries(b, avg_size=300)  # not a power of two


def test_fastcdc_resync_property():
    """Prepending bytes shifts early boundaries but the chunker
    re-synchronizes: the digest sequences share a long common suffix —
    the property that makes CDC dedup catch shifted content."""
    rng = np.random.default_rng(12)
    b1 = rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes()
    b2 = b"PREFIX" * 10 + b1

    def digests(b):
        cuts = cdc.fastcdc_boundaries(
            b, min_size=64, avg_size=256, max_size=1024
        )
        return [
            hashlib.md5(b[s:e]).hexdigest()
            for s, e in zip([0] + cuts[:-1], cuts)
        ]

    d1, d2 = digests(b1), digests(b2)
    common = 0
    while (
        common < min(len(d1), len(d2))
        and d1[-1 - common] == d2[-1 - common]
    ):
        common += 1
    assert common >= len(d1) - 4, (common, len(d1))


def _positional_reference(text: str, w: int = 8):
    """Independent python replay of the positional twin (character
    positions, md5 over utf-8)."""
    out, prev = [], 0
    n = len(text)
    for i in range(1, n + 1):
        window = text[max(0, i - w) : i]
        if i == n or (
            i >= w
            and hashlib.md5(window.encode()).hexdigest().startswith("0")
        ):
            chunk = text[prev:i]
            out.append(
                (
                    len(out),
                    prev + 1,
                    i - prev,
                    hashlib.md5(chunk.encode()).hexdigest(),
                )
            )
            prev = i
    return out


def test_positional_chunks_vs_reference(spark):
    import pandas as pd

    texts = [
        "the quick brown fox jumps over the lazy dog " * 40,
        "héllo wörld ünïcode — " * 60,
        "short",
        "",
        None,
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {}
    for r in cdc.cdc_chunks_positional(df).collect():
        got.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["start_pos"], r["length"], r["chunk_md5"])
        )
    for mid, text in enumerate(texts):
        ref = _positional_reference(text or "")
        assert sorted(got.get(mid, [])) == ref, mid


def test_cdc_chunks_spark_tiles_payload(spark):
    import pandas as pd

    rng = np.random.default_rng(13)
    payloads = [
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
        b"",
        None,
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2], "payload": payloads})
    )
    rows = cdc.cdc_chunks(
        df, min_size=64, avg_size=256, max_size=1024
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    assert set(by_doc) == {0}  # empty/null payloads chunk to nothing
    chunks = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    # chunks tile the payload and digests re-verify against the bytes
    pos = 1
    b = payloads[0]
    for r in chunks:
        assert r["start_pos"] == pos
        s, ln = r["start_pos"] - 1, r["length"]
        assert (
            hashlib.md5(b[s : s + ln]).hexdigest() == r["chunk_md5"]
        )
        pos += ln
    assert pos - 1 == len(b)


def test_incremental_cdc_admission(spark):
    """Shard admission against a chunk-digest index: exact clones and
    SHIFTED clones of ingested payloads are dropped (the resync
    property working across the index), fresh content survives; the
    corpus payloads are never re-read (only the index df is used)."""
    import pandas as pd

    rng = np.random.default_rng(21)
    corpus_payload = rng.integers(0, 256, 25_000, dtype=np.uint8).tobytes()
    fresh = rng.integers(0, 256, 25_000, dtype=np.uint8).tobytes()
    corpus = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [corpus_payload]})
    )
    kw = dict(min_size=64, avg_size=256, max_size=1024)
    index = (
        cdc.cdc_chunks(corpus, **kw).select("chunk_md5").distinct()
    )
    shard = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [10, 11, 12],
                "payload": [
                    corpus_payload,  # exact clone
                    b"SHIFT" * 20 + corpus_payload,  # shifted clone
                    fresh,
                ],
            }
        )
    )
    chunks = cdc.cdc_chunks(shard, **kw)
    out = {
        r["media_id"]: r
        for r in cdc.incremental_cdc_dedup(
            shard, chunks, index, max_dup_ppm=500_000
        ).collect()
    }
    assert set(out) == {12}
    assert out[12]["dup_ppm"] == 0
    # the dropped ones really were digest-level hits, not accidents
    stats = {
        r["__hid"]: None
        for r in chunks.join(index, "chunk_md5", "left_semi")
        .select(F.col("media_id").alias("__hid"))
        .collect()
    }
    assert 10 in stats and 11 in stats


def test_incremental_cdc_bucketed_index_one_sided(spark, tmp_path):
    """persist_chunk_index bucketed by chunk_md5 probes the shard with
    a one-sided shuffle: zero Exchange above the bucketed index scan;
    results pinned equal to the unbucketed path."""
    import contextlib
    import io
    import re

    import pandas as pd

    rng = np.random.default_rng(22)
    corpus_payload = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    corpus = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [corpus_payload]})
    )
    kw = dict(min_size=64, avg_size=256, max_size=1024)
    idx_df = cdc.cdc_chunks(corpus, **kw)
    bucketed = cdc.persist_chunk_index(
        spark, idx_df, "t_cdc_idx", str(tmp_path / "cdc_idx"), n_buckets=4
    )
    shard = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "payload": [
                    corpus_payload,
                    rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes(),
                ],
            }
        )
    )
    chunks = cdc.cdc_chunks(shard, **kw)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        survivors = cdc.incremental_cdc_dedup(shard, chunks, bucketed)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            survivors.explain("formatted")
        plan = buf.getvalue()
        assert re.search(r"Bucketed: true", plan), plan
        tree = [
            ln for ln in plan.splitlines()
            if re.search(r"[+:]- \(?\w|^\w", ln)
        ]
        scan_i = next(
            i for i, ln in enumerate(tree) if "t_cdc_idx" in ln
        )
        depth = tree[scan_i].index("- ")
        ancestors = []
        for ln in reversed(tree[:scan_i]):
            d = ln.index("- ") if "- " in ln else -1
            if d < depth:
                ancestors.append(ln)
                depth = d
                if "Join" in ln:
                    break
        assert not any("Exchange" in ln for ln in ancestors), (
            f"Exchange above the bucketed index scan:\n{plan}"
        )
        got = sorted(r["media_id"] for r in survivors.collect())
        want = sorted(
            r["media_id"]
            for r in cdc.incremental_cdc_dedup(
                shard, chunks, idx_df.select("chunk_md5").distinct()
            ).collect()
        )
        assert got == want == [2]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_cdc_idx")


def _pooled_stream_cdc_admission_equals_sequential_replay(spark, tmp_path):
    """Two micro-batches through stream_cdc_admission produce exactly
    the survivors of the sequential batch replay against the same
    persisted digest state: a cross-batch clone (and a shifted clone)
    is dropped by state fed forward from batch 1; bucketed state mode
    admits the identical set."""
    import os

    import pandas as pd

    rng = np.random.default_rng(23)
    p0 = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    p2 = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    shifted = b"NEWHEAD" * 8 + p0
    b1 = pd.DataFrame({"media_id": [0], "payload": [p0]})
    b2 = pd.DataFrame(
        {"media_id": [10, 11, 12], "payload": [p0, shifted, p2]}
    )
    kw = dict(min_size=64, avg_size=256, max_size=1024)
    src = tmp_path / "src"
    stamped: set[str] = set()
    for i, b in enumerate((b1, b2)):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        # pin mtimes so the file source orders the batches (NOTES.md)
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in stamped:
                t = 1_700_000_000 + i
                os.utime(src / f, (t, t))
                stamped.add(f)

    schema = "media_id long, payload binary"
    for bucketed, sub in ((False, "plain"), (True, "bucketed")):
        state = str(tmp_path / f"state_{sub}")
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src))
        q = cdc.stream_cdc_admission(
            stream, state, bucketed_state=bucketed,
            table_prefix=f"t_cdcadm_{sub}", n_buckets=4, **kw
        )
        q.awaitTermination()
        got = sorted(
            r["media_id"]
            for r in spark.read.parquet(f"{state}/survivors").collect()
        )
        assert got == [0, 12], (sub, got)
        assert any(
            d.startswith("batch_id=")
            for d in os.listdir(f"{state}/survivors")
        )
        spark.sql(f"DROP TABLE IF EXISTS t_cdcadm_{sub}_chunks")

    # sequential replay over the same shards and fresh state
    index = spark.createDataFrame([], "chunk_md5 string")
    expect = []
    for b in (b1, b2):
        df = spark.createDataFrame(b)
        chunks = cdc.cdc_chunks(df, **kw)
        surv = cdc.incremental_cdc_dedup(df, chunks, index).localCheckpoint()
        expect += [r["media_id"] for r in surv.collect()]
        delta = chunks.join(
            surv.select(F.col("media_id").alias("__sid")),
            F.col("media_id") == F.col("__sid"),
            "left_semi",
        ).select("chunk_md5")
        index = index.union(delta).distinct().localCheckpoint()
    assert sorted(expect) == [0, 12]


def test_chunk_dedup_stats(spark):
    import pandas as pd

    rng = np.random.default_rng(14)
    base = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    unique = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 1, 2], "payload": [base, base, unique]}
        )
    )
    chunks = cdc.cdc_chunks(df, min_size=64, avg_size=256, max_size=1024)
    stats = {
        r["media_id"]: r for r in cdc.chunk_dedup_stats(chunks).collect()
    }
    # doc 1 is byte-identical to doc 0: every chunk is a duplicate
    assert stats[1]["dup_chunks"] == stats[1]["n_chunks"]
    assert stats[1]["dup_bytes"] == stats[1]["total_bytes"] == len(base)
    assert stats[1]["dup_bytes_ppm"] == 1_000_000
    # doc 0 holds the first copies; doc 2 is independent randomness
    assert stats[0]["dup_chunks"] == 0
    assert stats[2]["dup_chunks"] == 0 and stats[2]["dup_bytes_ppm"] == 0
