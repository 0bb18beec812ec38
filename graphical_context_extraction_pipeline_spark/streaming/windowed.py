"""Watermarked event-time windowed aggregation over the span-event stream.

The ingestion monitor for a 10^12-doc pipeline: span events carry an
event-time (when the span was produced upstream); this operator maintains
per-(window, kind) arrival counts with a watermark so state is bounded and
stragglers beyond the lateness budget are dropped deterministically —
Spark's canonical late-data pattern (withWatermark + window + append mode),
NOT a custom stateful operator.

Event-time here derives from the span offset against a caller-supplied
epoch: offset ms after the document's ingest start. Tests stage late events
(event times far behind the watermark already advanced by a newer file) and
pin that they are excluded, matching a batch recomputation that applies the
same cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stateful import EVENTS_DDL


def with_event_time(events: DataFrame, epoch: str = "2026-01-01 00:00:00") -> DataFrame:
    """offset-ms → event_time timestamp column (epoch + offset)."""
    return events.withColumn(
        "event_time",
        F.timestamp_millis(
            F.unix_millis(F.to_timestamp(F.lit(epoch)))
            + F.coalesce(F.col("offset").cast("long"), F.lit(0))
        ),
    )


def windowed_span_counts(
    events: DataFrame,
    watermark: str = "10 seconds",
    window: str = "5 seconds",
) -> DataFrame:
    """Per-(event-time window, kind) span counts with bounded state.

    Append output mode: a window's row is emitted exactly once, when the
    watermark passes its end — late events within the budget still count;
    events later than the watermark are dropped. State held: only windows
    newer than (max event_time − watermark), regardless of stream length.
    """
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "kind")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "kind",
            "n_events",
        )
    )


def dedup_events_within_watermark(
    events_with_time: DataFrame, watermark: str = "30 seconds"
) -> DataFrame:
    """Streaming exactly-once event delivery: duplicate span events (ingest
    retries, at-least-once upstream queues) are suppressed on the full
    natural event identity (doc_id, kind, offset, text, media_ref, end_ms,
    scene_id) for as long as the watermark keeps their dedup state alive —
    Spark's bounded-state streaming dedup (dropDuplicatesWithinWatermark),
    the streaming counterpart of the batch exact-dedup family in
    operators/dedup.py.

    The identity MUST include media_ref/end_ms/scene_id, not just
    (doc_id, kind, offset, text): frame events carry text=NULL and are
    distinguished only by media_ref, and two chrome-OCR blocks with
    identical text on different frames can collide on (ts + arrival)
    offset — keying on the text-only subset would drop genuine spans
    before downstream assembly. (confidence/bbox are span *attributes*,
    not identity: a redelivery with a re-scored confidence is still the
    same event.)

    A duplicate arriving later than the watermark re-emits (state for its
    identity has been evicted) — the standard bounded-state tradeoff; size
    the watermark to the upstream's maximum redelivery lag."""
    return events_with_time.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["doc_id", "kind", "offset", "text", "media_ref", "end_ms", "scene_id"]
    )


def stream_dedup_events(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 1,
):
    """File-source events → watermark-bounded dedup → parquet (append)."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = dedup_events_within_watermark(with_event_time(stream), watermark)
    return (
        deduped.drop("event_time")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_span_counts(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 seconds",
    window: str = "5 seconds",
    max_files_per_trigger: int = 1,
):
    """File-source events → watermarked windowed counts → parquet (append:
    only watermark-closed windows are written, so the sink rows are final)."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    counts = windowed_span_counts(with_event_time(stream), watermark, window)
    return (
        counts.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
