"""Event-stream batch analytics over the `events` table
(event_id, ts, user_id, event_type, value, props): gap-based
sessionization, ordered funnels, and tumbling rollups — the
ordered/interleaved batch shapes that complement `streaming/windowed.py`'s
event-time operators.

Timestamps travel as epoch milliseconds (bigint) end-to-end, derived with
``timestampdiff`` from a TIMESTAMP_NTZ epoch literal: the column is
TIMESTAMP_NTZ (naive), and ``unix_millis(cast(ts as timestamp))`` would
re-interpret it through the SESSION timezone — a silent shift on any
non-UTC driver — while the NTZ-to-NTZ diff is timezone-free and matches
DuckDB ``epoch_ms`` exactly. Event ordering is always (ts_ms, event_id) —
event_id breaks same-millisecond ties deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MS = 30 * 60 * 1000  # classic 30-minute inactivity cutoff

# timezone-independent epoch ms for TIMESTAMP_NTZ columns (see module doc)
_TS_MS = "timestampdiff(MILLISECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def sessionize(events: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Gap-based sessionization: within each user's (ts, event_id)-ordered
    stream, an event opens a new session when it is the user's first or
    arrives more than ``gap_ms`` after the previous event. Emits one row
    per session: ordinal, event count, start/end epoch-ms, duration.

    Scale: ONE event-stream shuffle — the hashpartitioning(user_id) window
    exchange (within-user ordering is Spark's external spill-capable sort,
    so a bot user with 10^8 events degrades to disk, not OOM). The session
    rollup's second exchange moves only map-side partially-aggregated
    session rows: every (user, session) group is COMPLETE inside one
    window partition, so partial aggregation collapses it to its final row
    before the exchange — the shuffle carries the answer, not the events."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = events.select(
        "user_id", "event_id", F.expr(_TS_MS).alias("ts_ms")
    )
    prev = F.lag("ts_ms").over(w)
    flagged = e.select(
        "user_id",
        "ts_ms",
        "event_id",
        F.when(prev.isNull() | (F.col("ts_ms") - prev > gap_ms), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id", "ts_ms", F.sum("new_sess").over(run).alias("session_idx")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_ms").cast("long").alias("start_ms"),
        F.max("ts_ms").cast("long").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).cast("long").alias("duration_ms"),
    ).withColumn("session_idx", F.col("session_idx").cast("long"))


def funnel(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered-funnel conversion counts: a user completes step k when their
    FIRST occurrence of step k's event type comes strictly after their
    first occurrence of step k-1 (first-touch chain — the deterministic
    textbook definition; completing step k requires completing every
    earlier step). Emits (step, step_idx, n_users).

    Scale: one shuffle — the per-user conditional-min aggregation (partial
    map-side, k cells per user); the final count collapses to k rows."""
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.expr(_TS_MS))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    conds = []
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if i > 0:
            c = c & conds[i - 1] & (F.col(f"t{i}") > F.col(f"t{i-1}"))
        conds.append(c)
    flags = firsts.select(
        *[c.cast("long").alias(f"c{i}") for i, c in enumerate(conds)]
    )
    tot = flags.agg(*[F.sum(f"c{i}").alias(f"s{i}") for i in range(len(steps))])
    stack_args = ", ".join(
        f"'{s}', cast({i} as bigint), cast(s{i} as bigint)" for i, s in enumerate(steps)
    )
    return tot.selectExpr(
        f"stack({len(steps)}, {stack_args}) as (step, step_idx, n_users)"
    )


def retention_cohorts(events: DataFrame, week_ms: int = 7 * 86400 * 1000) -> DataFrame:
    """Weekly retention matrix: cohort = the epoch-week of a user's FIRST
    event; cell (cohort_week, week_offset) counts the distinct cohort
    users active ``week_offset`` weeks later — offset 0 is the cohort size,
    and the decay along each row is the retention curve.

    Scale: the first-event aggregation and the events↔firsts join are both
    keyed on user_id (co-partitioned; AQE broadcasts the firsts side when
    the user dimension is small). Distinct-user counting dedups on
    (cohort, offset, user) FIRST — partial map-side, cardinality bounded by
    users × active weeks — so no count-distinct state ever exceeds the
    dedup'd relation. Week ids use integer epoch-ms division (NTZ-safe)."""
    e = events.select(
        "user_id", F.expr(f"({_TS_MS}) div {int(week_ms)}").cast("long").alias("week")
    )
    firsts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def event_rollup(events: DataFrame, window_ms: int = 3600 * 1000) -> DataFrame:
    """Tumbling time-window rollup per event type — the batch twin of the
    streaming watermark+window aggregation (`streaming/windowed.py`):
    (window_start_ms, event_type) → event count and value mass. Values are
    floored to e2 fixed-point PER EVENT before summing, so both engines sum
    integers and the result is order-independent (a float sum is neither).

    Scale: narrow projection + one partial-aggregated groupBy; cardinality
    is windows × types, independent of event volume."""
    # integer div, not floor(double/double): epoch-ms values sit near 2^41
    # where a double quotient can land an exact multiple at x.999…
    e = events.select(
        (F.expr(f"({_TS_MS}) div {int(window_ms)}") * window_ms)
        .cast("long")
        .alias("window_start_ms"),
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_e2"),
    )
    return e.groupBy("window_start_ms", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value_e2").cast("long").alias("sum_value_e2"),
    )


def rate_spikes(
    events: DataFrame,
    window_ms: int = 3600 * 1000,
    trailing: int = 3,
    num: int = 3,
    den: int = 1,
) -> DataFrame:
    """Ingestion-monitor anomaly detection: windows whose event count jumps
    ≥ num/den × the mean of the previous ``trailing`` PRESENT windows of
    the same event type (calendar-empty windows produce no row in the
    rollup and are skipped — documented semantics, mirrored by the oracle;
    an ingestion monitor cares about jumps relative to recent observed
    load, and a gap of silence makes the next burst exactly the thing to
    flag).

    The comparison is pure integer cross-multiplication —
    ``n · den · k ≥ num · Σtrailing`` — no float mean. Windows with fewer
    than ``trailing`` predecessors are never flagged (cold start).

    Scale: rides the event_rollup (one shuffle of partial aggregates); the
    lag window runs over the tiny (windows × types) relation, partitioned
    by event_type — never over raw events.

    Output: (window_start_ms, event_type, n_events, trailing_sum,
    trailing_n, spike).
    """
    from pyspark.sql import Window

    roll = event_rollup(events, window_ms)
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start_ms")
        .rowsBetween(-trailing, -1)
    )
    out = roll.select(
        "window_start_ms",
        "event_type",
        "n_events",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long").alias("trailing_sum"),
        F.coalesce(F.count("n_events").over(w), F.lit(0)).cast("long").alias("trailing_n"),
    )
    return out.withColumn(
        "spike",
        (F.col("trailing_n") == trailing)
        & (F.col("n_events") * den * trailing >= F.lit(num) * F.col("trailing_sum")),
    )


def conversion_lag(
    events: DataFrame, start: str = "view", end: str = "purchase"
) -> DataFrame:
    """Time-to-convert distribution: for users whose first ``end`` event
    comes strictly after their first ``start`` event, the lag bucketed on
    a log2 scale (bucket = bit_length(lag_ms + 1), the same integer
    bit-length trick as length_histogram — no float log in either
    engine). Emits (bucket, n_users, min_lag_ms, max_lag_ms).

    One per-user conditional-min shuffle (two cells per user, partial
    agg) + a k-row bucket rollup."""
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == start, F.expr(_TS_MS))).alias("t0"),
        F.min(F.when(F.col("event_type") == end, F.expr(_TS_MS))).alias("t1"),
    )
    lag = (
        firsts.where(F.col("t0").isNotNull() & F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
        .select((F.col("t1") - F.col("t0")).alias("lag_ms"))
    )
    return (
        lag.select(
            F.length(F.bin(F.col("lag_ms") + 1)).cast("long").alias("bucket"),
            "lag_ms",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("lag_ms").cast("long").alias("min_lag_ms"),
            F.max("lag_ms").cast("long").alias("max_lag_ms"),
        )
    )


GAP_QUANTILE_PCTS = (50, 95, 99)


def gap_quantiles(
    events: DataFrame, pcts: tuple[int, ...] = GAP_QUANTILE_PCTS
) -> DataFrame:
    """Exact inter-arrival-time order statistics per event kind —
    (event_type, p, gap_ms, n_gaps): for each event type, the p-th
    percentile of the within-user gaps between consecutive events of
    that type (the latency profile an on-call dashboard plots; a p99
    blowout on one kind is a producer stall). Q(p) = smallest gap with
    100·cum_count ≥ p·n — corpus.length_quantiles' integer ≥-rule, over
    a (kind, gap) HISTOGRAM, never an all-values percentile buffer.

    Scale: one (user, kind)-partitioned window computes the lag deltas
    (per-user-per-kind streams — high-cardinality keys, external-sort
    spill for bot users), then the histogram partial-agg reduces state
    to |distinct gap values| per kind and the quantile windows run over
    that tiny relation. First events (no predecessor) contribute no gap.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    base = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(_TS_MS).cast("long").alias("ts_ms"),
    )
    gaps = (
        base.select(
            "event_type",
            (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
        )
        .where(F.col("gap_ms").isNotNull())
    )
    hist = gaps.groupBy("event_type", "gap_ms").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("gap_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "gap_ms",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    exploded = cum.select(
        "event_type",
        "gap_ms",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(int(p)).cast("long") for p in pcts])).alias("p"),
    )
    return (
        exploded.where(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("event_type", "p")
        .agg(
            F.min("gap_ms").cast("long").alias("gap_ms"),
            F.max("n").cast("long").alias("n_gaps"),
        )
    )
