"""Video dedup lane: pipeline vs reference clustering, incremental ==
sequential, streaming == sequential (the established lane pins)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows],
        "media_id long, payload binary",
    )


def _check_pipeline_groups_by_payload(spark):
    from evm_archive_spark.operators.multimodal import video_dedup_pipeline

    rows = [
        (1, b"groupA" * 20),
        (2, b"groupA" * 20),
        (3, b"groupB" * 20),
        (4, b"groupB" * 20),
        (5, b"solo" * 30),
    ]
    out = sorted(
        r.media_id
        for r in video_dedup_pipeline(
            _media(spark, rows), every_n=1, min_shared=1
        ).collect()
    )
    assert out == [1, 3, 5]


def _check_incremental_never_readmits(spark, tmp_path):
    from evm_archive_spark.operators.multimodal import (
        frame_sample,
        incremental_video_dedup,
        persist_frame_index,
        video_dedup_pipeline,
    )

    corpus_rows = [(1, b"known" * 30), (2, b"known" * 30)]
    shard_rows = [(10, b"known" * 30), (11, b"fresh" * 30),
                  (12, b"fresh" * 30)]
    corpus = _media(spark, corpus_rows)
    admitted = video_dedup_pipeline(corpus, every_n=1, min_shared=1)
    frames = frame_sample(
        corpus.join(admitted, "media_id"), every_n=1, strict=False
    )
    table = "t_vidx_inc"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        idx = persist_frame_index(
            spark, frames, table, str(tmp_path / "vidx"), n_buckets=4
        )
        out = sorted(
            r.media_id
            for r in incremental_video_dedup(
                _media(spark, shard_rows), idx, every_n=1, min_shared=1
            ).collect()
        )
        # 10 cross-dropped (matches admitted 1); 11 survives its
        # within-shard twin 12
        assert out == [11]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _check_streaming_equals_sequential(spark, tmp_path):
    import os

    import pandas as pd

    from evm_archive_spark.operators.multimodal import stream_video_admission

    b1 = pd.DataFrame(
        {"media_id": [1, 2], "payload": [b"vA" * 40, b"vA" * 40]}
    )
    b2 = pd.DataFrame(
        {"media_id": [10, 11], "payload": [b"vA" * 40, b"vB" * 40]}
    )
    src = tmp_path / "src"
    stamped = set()
    for i, b in enumerate((b1, b2)):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        for f in os.listdir(src):  # pin mtimes (NOTES.md gotcha)
            if f.endswith(".parquet") and f not in stamped:
                t = 1_700_000_000 + i
                os.utime(src / f, (t, t))
                stamped.add(f)
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(
        "media_id long, payload binary"
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    stream_video_admission(stream, state, every_n=1, min_shared=1)
    got = sorted(
        r.media_id
        for r in spark.read.parquet(f"{state}/survivors").collect()
    )
    # batch 1: 1 survives (2 is its twin); batch 2: 10 cross-dropped,
    # 11 novel
    assert got == [1, 11]
    assert any(
        d.startswith("batch_id=") for d in os.listdir(f"{state}/survivors")
    )


def _pooled_videolane_module(spark, tmp_path):
    import inspect
    import pathlib
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    checks = [
        _check_pipeline_groups_by_payload,
        _check_incremental_never_readmits,
        _check_streaming_equals_sequential,
    ]

    def run(fn):
        try:
            kwargs = {}
            if "tmp_path" in inspect.signature(fn).parameters:
                kwargs["tmp_path"] = pathlib.Path(tempfile.mkdtemp())
            fn(spark, **kwargs)
            return fn.__name__, None
        except Exception as e:  # noqa: BLE001 — aggregated below
            return fn.__name__, f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(run, checks))
    fails = [(n, m) for n, m in results if m]
    assert not fails, "\n".join(f"{n}: {m}" for n, m in fails)
