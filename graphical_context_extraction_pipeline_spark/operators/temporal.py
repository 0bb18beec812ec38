"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of joins (most-recent-preceding alignment) and interval-overlap joins
with time-bucket blocking.

Both are classic "missing operators" a training-data / analytics engine
needs at crawl scale (attribution, log enrichment, concurrency audits),
and both are re-expressed here as compositions of existing DataFrame ops
so Catalyst keeps the whole plan (no Python anywhere):

- ``asof_join``: the union–window formulation. Tagging both inputs,
  sorting each key group by (ts, side) and carrying the last-seen right
  payload forward turns the as-of lookup into ONE shuffle + ONE
  spill-capable window sort — linear, no per-key buffering, no
  equality-join blowup. (The naive alternative — theta join on
  ``l.ts >= r.ts`` + max — is quadratic per key and is exactly what this
  operator exists to avoid. DuckDB's native ASOF JOIN is the independent
  oracle: a different algorithm computing the same relation.)
- ``interval_overlap_counts``: time-bucket blocking for interval×interval
  overlap. Each interval replicates to the fixed-width buckets it spans
  (bounded fanout = duration/bucket + 1), candidates meet in an equi-join
  on the bucket key, and each qualifying pair is counted exactly once by
  claiming it in the bucket holding ``greatest(start_a, start_b)``.
  Shuffle is keyed by bucket — time-uniform, executor-count-independent.

Timestamps travel as epoch-ms bigints throughout (same TIMESTAMP_NTZ
contract as operators/events.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .events import SESSION_GAP_MS, _TS_MS, sessionize


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tie: str | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (< when ``inclusive=False``) within the
    same ``by`` group — LEFT OUTER semantics (unmatched left rows keep
    NULL value columns).

    Determinism: when several right rows share the winning timestamp, the
    one with the greatest ``right_tie`` wins (callers pass a unique id);
    without a tie column the choice among exact ts duplicates would be
    plan-dependent.

    Scale: one hashpartitioning(by) exchange moves ``|left| + |right|``
    rows once; within each key group the window sort is Spark's external
    (disk-spilling) sort, so a key with 10^8 rows degrades to spill, not
    OOM. The carried state is one struct per row — no collect, no buffer
    proportional to match counts. Matches the single-pass merge a native
    ASOF join performs, expressed in pure Catalyst operators.
    """
    # right rows sort before left rows at equal ts when inclusive (so the
    # boundary row is visible to the left row), after them when strict
    right_side = 0 if inclusive else 2
    payload = F.struct(*[F.col(c) for c in value_cols]).alias("_match")
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).cast("long").alias("_ts"),
        F.lit(right_side).alias("_side"),
        (F.col(right_tie) if right_tie is not None else F.lit(0)).cast("long").alias("_tie"),
        payload,
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tie"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_match", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_m.{c}").alias(c) for c in value_cols]
    )


def view_attribution(
    events: DataFrame,
    conversion_types: tuple[str, ...] = ("click", "purchase"),
    source_type: str = "view",
) -> DataFrame:
    """First-class as-of query: attribute each conversion event to the
    user's most recent preceding (or same-instant) ``source_type`` event.
    Emits (user_id, event_id, event_type, ts_ms, view_event_id,
    view_ts_ms, latency_ms) with -1 sentinels for never-attributed
    conversions (NULL would be a NaN≠NaN trap in the driver's hash
    compare).

    Rows with NULL user_id/ts are excluded up front: Spark's window would
    group NULL keys while a join-based oracle drops them — the filter
    makes both engines see the same relation.
    """
    e = events.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(_TS_MS).alias("ts_ms"),
    )
    views = e.where(F.col("event_type") == source_type).select(
        "user_id",
        F.col("ts_ms").alias("view_ts_ms"),
        F.col("event_id").alias("view_event_id"),
    )
    conv = e.where(F.col("event_type").isin(*conversion_types))
    j = asof_join(
        conv,
        views,
        by=["user_id"],
        left_ts="ts_ms",
        right_ts="view_ts_ms",
        value_cols=["view_event_id", "view_ts_ms"],
        right_tie="view_event_id",
    )
    hit = F.col("view_ts_ms").isNotNull()
    return j.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("ts_ms").cast("long").alias("ts_ms"),
        F.coalesce(F.col("view_event_id"), F.lit(-1)).cast("long").alias("view_event_id"),
        F.coalesce(F.col("view_ts_ms"), F.lit(-1)).cast("long").alias("view_ts_ms"),
        F.when(hit, F.col("ts_ms") - F.col("view_ts_ms")).otherwise(-1).cast("long").alias("latency_ms"),
    )


# Pre-division offset for bucket ids: Spark DIV truncates toward zero
# while a floor-dividing replay (DuckDB //) disagrees on negative
# numerators (the repo's pinned trap). Bucket ids are internal — and both
# truncation and floor are monotone, so the claim bucket always lies in
# the replicated range either way — but offsetting keeps every numerator
# positive so the two conventions are provably the SAME function on the
# whole input domain instead of agreeing by a monotonicity argument.
# 2^43 ms clears epoch-ms magnitudes back to year ~1691.
_BUCKET_OFFSET = 1 << 43


def _bucketed(intervals: DataFrame, bucket_ms: int, prefix: str) -> DataFrame:
    """Replicate each interval to every ``bucket_ms`` bucket it touches.
    Integer DIV keeps the bucket ids exact (float quotients round across
    integer boundaries near 2^41 — the events.py trap); the positive
    offset makes DIV ≡ floor-division for pre-1970 timestamps too."""
    cols = [F.col(c).alias(f"{prefix}{c}") for c in intervals.columns]
    return intervals.select(
        F.expr(
            f"explode(sequence((start_ms + {_BUCKET_OFFSET}) DIV {bucket_ms},"
            f" (end_ms + {_BUCKET_OFFSET}) DIV {bucket_ms}))"
        ).alias("bucket"),
        *cols,
    )


def interval_overlap_counts(
    intervals: DataFrame,
    key_cols: list[str],
    bucket_ms: int,
) -> DataFrame:
    """For each interval (closed [start_ms, end_ms], identified by
    ``key_cols``), the number of OTHER intervals it overlaps. Linear
    output for an interval×interval predicate join.

    Pair-once discipline: a pair overlapping k shared buckets would be
    counted k times; claiming it only in the bucket containing
    ``greatest(start_a, start_b)`` (which both sides replicate to, since
    it lies inside both intervals) counts it exactly once with no
    distinct-shuffle.

    Scale: fanout per interval is duration/bucket_ms + 1; the join key is
    the time bucket, so load spreads over the timeline regardless of key
    skew. A globally hot INSTANT (one bucket holding b intervals) costs
    O(b²) in-bucket comparisons — shrink ``bucket_ms`` to split candidate
    sets; the sweep-line alternative (rank-of-start minus rank-of-end) is
    cheaper still but needs a global order, i.e. a range-partitioned sort,
    which this formulation avoids.
    """
    base = intervals.select(*key_cols, F.col("start_ms").cast("long"), F.col("end_ms").cast("long"))
    a = _bucketed(base, bucket_ms, "a_")
    b = _bucketed(base, bucket_ms, "b_")
    same = None
    for k in key_cols:
        c = F.col(f"a_{k}") == F.col(f"b_{k}")
        same = c if same is None else (same & c)
    overlap = (F.col("a_start_ms") <= F.col("b_end_ms")) & (
        F.col("b_start_ms") <= F.col("a_end_ms")
    )
    claim = F.col("bucket") == F.expr(
        f"(greatest(a_start_ms, b_start_ms) + {_BUCKET_OFFSET}) DIV {bucket_ms}"
    )
    pairs = a.join(b, on="bucket", how="inner").where(~same & overlap & claim)
    counts = pairs.groupBy(*[F.col(f"a_{k}").alias(k) for k in key_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_overlaps")
    )
    return base.select(*key_cols).join(counts, on=key_cols, how="left").select(
        *key_cols, F.coalesce("n_overlaps", F.lit(0)).cast("long").alias("n_overlaps")
    )


def concurrent_sessions(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    bucket_ms: int = 3600 * 1000,
) -> DataFrame:
    """Concurrency audit over gap-based sessions: for each (user, session)
    interval from :func:`events.sessionize`, how many OTHER sessions (any
    user) were active at some overlapping instant. Emits
    (user_id, session_idx, start_ms, end_ms, n_concurrent).

    Same-user sessions never overlap by construction (the gap cutoff
    separates them), so "other" reduces to excluding the self pair.

    Scale: sessionize's one event shuffle, then the bucket-blocked overlap
    join over SESSION rows (already thousands-fold smaller than events).
    """
    sess = sessionize(events, gap_ms).select(
        "user_id", "session_idx", "start_ms", "end_ms"
    )
    # sessions are re-derived on each downstream reference; truncate the
    # lineage so the self-join's two sides share one computed relation
    sess = sess.localCheckpoint(eager=False)
    counts = interval_overlap_counts(sess, ["user_id", "session_idx"], bucket_ms)
    return (
        sess.join(counts, on=["user_id", "session_idx"], how="inner")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_idx").cast("long").alias("session_idx"),
            F.col("start_ms").cast("long").alias("start_ms"),
            F.col("end_ms").cast("long").alias("end_ms"),
            F.col("n_overlaps").alias("n_concurrent"),
        )
    )
