"""Watermarked windowed aggregation: late events beyond the watermark are
dropped; append mode emits each closed window exactly once with its final
count.

Deterministic 3-batch construction (watermark advances at batch END, so
the drop is observable only once a LATER batch runs with it active):
  batch 0 — f1: the full on-time stream (advances the watermark on commit)
  batch 1 — f2: one dummy far-future event (runs WITH f1's watermark
             active → emits/evicts all f1 windows, advances further)
  batch 2 — f3: late re-sends of f1's earliest events (now far behind the
             active watermark → dropped entirely)
Expected sink: exactly the f1 windows with on-time-only counts; the dummy's
own window stays open (past the final watermark) and is never emitted."""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.streaming.stateful import (
    EVENTS_DDL,
    spans_to_events,
)
from graphical_context_extraction_pipeline_spark.streaming.windowed import (
    stream_dedup_events,
    stream_windowed_span_counts,
    windowed_span_counts,
    with_event_time,
)

OUT_DDL = "w_start timestamp, w_end timestamp, kind string, n_events long"


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_late_events_dropped_and_windows_final(spark, docs_path, tmp_path):
    docs = spark.read.parquet(docs_path).where(
        F.col("doc_id").isin([f"doc_{i:08d}" for i in range(5, 8)])
    )
    ev = spans_to_events(docs, with_eof=False).where(F.col("offset").isNotNull())
    late = ev.where(F.col("offset") < 10_000)
    assert late.count() > 0

    # dummy far beyond every real event: keeps its own window open (never
    # emitted) while pushing the watermark far past all f1 windows
    hi = ev.agg(F.max("offset")).collect()[0][0]
    dummy_off = int(hi) + 600_000
    dummy = spark.createDataFrame(
        [("doc_dummy", "scene", "0:1", None, dummy_off, 1, None, None, None, None, None)],
        EVENTS_DDL,
    )

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _stage_file(ev, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(dummy, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))
    time.sleep(1.1)
    _stage_file(late, str(tmp_path / "s3"), os.path.join(in_dir, "f3.parquet"))

    q = stream_windowed_span_counts(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(180)

    got = spark.read.schema(OUT_DDL).parquet(out_dir).collect()
    got_m = {(r["w_start"], r["kind"]): r["n_events"] for r in got}
    assert len(got_m) == len(got), "append mode must emit each window exactly once"

    want = {
        (r["w_start"], r["kind"]): r["n_events"]
        for r in windowed_span_counts(with_event_time(ev)).collect()
    }
    # every f1 window emitted with its on-time-only count (late re-sends
    # dropped); the dummy's window (past the final watermark) not emitted
    assert got_m == want, {
        k: (got_m.get(k), want.get(k))
        for k in set(got_m) ^ set(want) | {k for k in got_m if got_m[k] != want.get(k)}
    }


def test_streaming_dedup_suppresses_redelivery(spark, docs_path, tmp_path):
    """At-least-once upstream redelivery collapses to exactly-once output:
    a full re-send of earlier events in a later micro-batch (within the
    watermark) emits nothing new."""
    docs = spark.read.parquet(docs_path).where(F.col("doc_id") == "doc_00000005")
    ev = spans_to_events(docs, with_eof=False).where(F.col("offset").isNotNull())
    identity = ["doc_id", "kind", "offset", "text", "media_ref", "end_ms", "scene_id"]
    n_distinct = ev.dropDuplicates(identity).count()

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _stage_file(ev, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(ev, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))  # full re-send

    # watermark far larger than the event-time span → all dedup state lives
    # for the whole (short) stream
    q = stream_dedup_events(spark, in_dir, out_dir, ckpt, watermark="2 hours")
    q.awaitTermination(180)

    got = spark.read.schema(EVENTS_DDL).parquet(out_dir)
    assert got.count() == n_distinct
    assert got.dropDuplicates(identity).count() == n_distinct


def test_streaming_dedup_identity_covers_media_ref(spark, tmp_path):
    """Distinct spans that collide on (doc_id, kind, offset, text) but
    differ in media_ref / end_ms / scene_id are NOT merged: two keyframes
    of one doc at the same timestamp (text=NULL, different frame paths)
    and identical chrome-OCR text on different frames must all survive —
    the text-only identity subset would silently drop genuine spans."""
    rows = [
        # two frames, same offset, different media_ref, text NULL
        ("d1", "frame", None, "frames/f_0001.jpg", 5000, None, None, None, None),
        ("d1", "frame", None, "frames/f_0002.jpg", 5000, None, None, None, None),
        # identical OCR text on two different frames, colliding offset
        ("d1", "ocr", "Subscribe", "frames/f_0001.jpg", 7000, None, 0.9, None, None),
        ("d1", "ocr", "Subscribe", "frames/f_0002.jpg", 7000, None, 0.9, None, None),
        # a TRUE duplicate (redelivery) — must collapse
        ("d1", "ocr", "Subscribe", "frames/f_0001.jpg", 7000, None, 0.9, None, None),
    ]
    ev = spark.createDataFrame(
        [
            {
                "doc_id": r[0], "kind": r[1], "text": r[2], "media_ref": r[3],
                "offset": r[4], "end_ms": r[5], "confidence": r[6],
                "bbox": r[7], "scene_id": r[8],
            }
            for r in rows
        ],
        schema=EVENTS_DDL,
    )
    in_dir = str(tmp_path / "events")
    os.makedirs(in_dir)
    _stage_file(ev, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_dedup_events(spark, in_dir, out_dir, ckpt, watermark="2 hours")
    q.awaitTermination(180)
    got = spark.read.schema(EVENTS_DDL).parquet(out_dir)
    assert got.count() == 4  # 5 staged − 1 true duplicate
    assert got.where(F.col("kind") == "frame").count() == 2
    assert got.where(F.col("kind") == "ocr").count() == 2
