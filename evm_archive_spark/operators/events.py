"""Event-sequence analytics over the events table: ordered funnels and
cohort retention — the product-analytics queries a clickstream/event
archive serves daily (and the reference's Postgres delegation would hand
to window functions).

Both are compositions of aggregates and equi-joins — no per-user
collect_list of unbounded history, no window over a global order:

- funnel: n-1 chained (aggregate -> equi-join -> filter) rounds; every
  intermediate is one row per surviving user, monotonically shrinking.
- retention: two aggregates and one join, all keyed on (user) or
  (cohort, offset) — small-domain keys with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user earliest strictly-ordered completion time of each funnel
    prefix: ``__t0`` = first ``steps[0]``, ``__ti`` = first ``steps[i]``
    AFTER ``__t(i-1)``.  Users absent from step 0 are absent entirely;
    later columns are NULL where the funnel stalled."""
    per_user = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t0"))
    )
    for i in range(1, len(steps)):
        stage = events.filter(F.col(type_col) == steps[i]).select(
            user_col, ts_col
        )
        nxt = (
            per_user.select(user_col, f"__t{i - 1}")
            .join(stage, user_col)
            .filter(F.col(ts_col) > F.col(f"__t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"__t{i}"))
        )
        per_user = per_user.join(nxt, user_col, "left")
    return per_user


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion counts: (step_idx, step, n_users) where
    ``n_users`` completed the ordered prefix ``steps[0..i]``."""
    per_user = funnel_times(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    agg = per_user.agg(
        *[
            F.count(f"__t{i}").cast("long").alias(f"__s{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"__s{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; ``n_users`` active per (cohort, offset_w) week offset."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(user_col).agg(
        F.min(wk).alias("__cohort")
    )
    active = events.select(
        F.col(user_col), wk.alias("__w")
    ).distinct()
    return (
        active.join(first, user_col)
        .select(
            F.col("__cohort").cast("date").alias("cohort"),
            F.expr(
                "CAST(datediff(CAST(__w AS DATE), CAST(__cohort AS DATE)) "
                "DIV 7 AS BIGINT)"
            ).alias("offset_w"),
            F.col(user_col),
        )
        .groupBy("cohort", "offset_w")
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch gap-based sessionization: assign every event a session id
    (``user_id``, ``session_seq``) where a new session starts when the
    gap to the previous event of the same user exceeds ``gap_seconds`` —
    the batch twin of the streaming session_window gate (q_st4).

    Per-user window (lag + running sum of boundary flags): partitions are
    bounded by one user's history, which is the natural unit; a single
    user with unbounded events is an application bug, not a plan hazard.
    Output: input columns + ``session_seq`` (1-based per user) —
    ``(user_col, session_seq)`` is the session key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_seconds * 1_000_000
        )
    ).cast("long")
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_seq", F.sum(new_sess).over(run).cast("long")
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling N-day distinct active users per calendar day (7-day DAU/
    WAU) — the metric a naive ``COUNT(DISTINCT) OVER (RANGE N DAYS)``
    cannot express (distinct aggregates are not supported over window
    frames in Spark or standard SQL).

    The offset-explode idiom instead: reduce to distinct (user, day)
    pairs first (one partial-aggregated shuffle — this is what bounds the
    explosion), then each pair votes for the ``window_days`` report days
    it falls into (map-side explode of N offsets), and one
    ``countDistinct`` per report day finishes.  Shuffle volume is
    |distinct pairs| x N compact keys, independent of raw event volume.
    Report days cover only days with >= 1 active user in window.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    pairs = events.select(
        F.col(user_col).alias("__u"), day.alias("__d")
    ).distinct()
    exploded = pairs.select(
        "__u",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda i: F.date_add(F.col("__d"), i),
            )
        ).alias("report_day"),
    )
    return (
        exploded.groupBy("report_day")
        .agg(F.countDistinct("__u").cast("long").alias("n_users"))
    )


def ewma_by_key(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    alpha_ppm: int = 200_000,
) -> "DataFrame":
    """Integer fixed-point exponentially-weighted moving average per key:
    ``r_1 = x_1;  r_t = (alpha * x_t + (1e6 - alpha) * r_{t-1}) DIV 1e6``
    over the series ordered by ``order_cols`` — the smoothed-metric /
    anomaly-baseline primitive, in exact BIGINT arithmetic (values are
    milli-quantized first) so the recurrence replays identically on any
    engine with a left fold.

    An EWMA is inherently sequential per key, so it CANNOT be a window
    frame; the shape here is one groupBy collecting the ordered series
    into an array and a JVM ``aggregate`` fold over it — map-side after
    the single key shuffle.  Contract: a key's series must fit an array
    (bounded per-key cardinality); unbounded streams belong on the
    applyInPandasWithState lane (streaming/stateful.py).

    Returns ``(key_col, n_obs, ewma_q)``.
    """
    from pyspark.sql import functions as F

    ppm = 1_000_000
    keep = ppm - alpha_ppm
    # NULL observations are dropped (they would poison the whole key's
    # fold: alpha*NULL propagates); n_obs counts values actually folded
    df = df.filter(F.col(value_col).isNotNull())
    xq = F.floor(F.col(value_col) * 1000).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(*[F.col(c) for c in order_cols], xq.alias("xq"))
        )
    )
    g = df.groupBy(key_col).agg(arr.alias("__arr"))
    xs = g.select(
        key_col,
        F.transform(F.col("__arr"), lambda s: s["xq"]).alias("__xs"),
    )
    fold = (
        f"aggregate(slice(__xs, 2, size(__xs) - 1), element_at(__xs, 1), "
        f"(acc, x) -> CAST(({alpha_ppm} * x + {keep} * acc) DIV {ppm} "
        f"AS BIGINT))"
    )
    return xs.select(
        key_col,
        F.size(F.col("__xs")).cast("long").alias("n_obs"),
        F.expr(fold).alias("ewma_q"),
    )
