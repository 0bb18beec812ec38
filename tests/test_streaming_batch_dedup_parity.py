"""Streaming ↔ batch dedup parity (VERDICT r2 item 4).

The SAME seen-corpus / new-batch split used by the `dedup_incremental`
driver query is replayed through the streaming bounded-state dedup
(`stream_dedup_events`) as two micro-batches: micro-batch 0 carries the
seen corpus, micro-batch 1 the planted ingest batch, with every event time
inside the watermark so no dedup state is evicted between them. Where the
two windows overlap (everything, here), the semantics must coincide:

  streaming survivors FROM THE BATCH  ==  dedup_incremental(batch, seen)

keyed on the same md5(lower(text)) identity. Each document is encoded as
ONE span event whose natural identity IS the text dedup key (doc_id column
= md5 key, constant offset/kind, NULL media fields), so
dropDuplicatesWithinWatermark's full-identity dedup reduces exactly to
document-level exact dedup. Provenance (seen vs batch) rides in
`confidence`, which is deliberately NOT part of the streaming identity —
a redelivery with different attributes is still the same event.
"""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from __spark_entry__ import _planted_batch
from graphical_context_extraction_pipeline_spark.operators.dedup import dedup_incremental
from graphical_context_extraction_pipeline_spark.streaming.stateful import EVENTS_DDL
from graphical_context_extraction_pipeline_spark.streaming.windowed import stream_dedup_events

SF_DIR = "/root/testdata/sf0.001"


def _stage_file(df, staging_dir: str, dest_path: str, mtime: float | None = None) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)
    if mtime is not None:
        # explicit mtimes: micro-batch order must not depend on filesystem
        # timestamp granularity or wall-clock races
        os.utime(dest_path, (mtime, mtime))


def _doc_events(docs, provenance_conf: float):
    """One event per document; streaming identity == text dedup key."""
    return docs.select(
        F.md5(F.lower("text")).alias("doc_id"),
        F.lit("doc").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
        F.lit(None).cast("int").alias("end_ms"),
        F.lit(provenance_conf).cast("double").alias("confidence"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("int").alias("scene_id"),
        F.lit(None).cast("int").alias("n_words"),
    )


def test_streaming_dedup_matches_batch_incremental(spark, tmp_path):
    seen = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    batch = _planted_batch(seen)

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    # micro-batch order = file modification-time order under availableNow
    t0 = time.time()
    _stage_file(_doc_events(seen, 1.0), str(tmp_path / "s1"),
                os.path.join(in_dir, "f1.parquet"), mtime=t0)
    _stage_file(_doc_events(batch, 2.0), str(tmp_path / "s2"),
                os.path.join(in_dir, "f2.parquet"), mtime=t0 + 10)

    q = stream_dedup_events(spark, in_dir, out_dir, ckpt, watermark="2 hours")
    q.awaitTermination(180)
    sink = spark.read.schema(EVENTS_DDL).parquet(out_dir)

    # batch-side survivors: rows the streaming dedup emitted from micro-batch 1
    stream_keys = {
        r["doc_id"] for r in sink.where(F.col("confidence") == 2.0).select("doc_id").collect()
    }
    batch_ref = dedup_incremental(batch, seen)
    ref_keys = {r["dup_key"] for r in batch_ref.select("dup_key").collect()}

    assert stream_keys == ref_keys
    # one emission per surviving identity (exactly-once on the sink)
    assert sink.where(F.col("confidence") == 2.0).count() == len(ref_keys)

    # non-trivial split: the planted batch contains pure re-deliveries of
    # seen texts AND an in-batch duplicate pair — both suppression paths ran
    n_batch = batch.count()
    assert 0 < len(ref_keys) < n_batch

    # seen side: micro-batch 0 emitted exactly its distinct text keys
    n_seen_keys = seen.select(F.md5(F.lower("text"))).distinct().count()
    assert sink.where(F.col("confidence") == 1.0).count() == n_seen_keys
