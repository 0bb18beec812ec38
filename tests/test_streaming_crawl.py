"""Streaming crawl ingestion (streaming/crawl.py): canonical-URL
redeliveries suppressed with bounded state; extracted rows ≡ the batch
main_content of the surviving pages."""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import ensure_html
from graphical_context_extraction_pipeline_spark.operators.html_extract import main_content
from graphical_context_extraction_pipeline_spark.streaming.crawl import (
    PAGES_STREAM_DDL,
    stream_extract_pages,
)

OUT_DDL = (
    "doc_id long, url string, main_text string, n_kept long, n_blocks long,"
    " kept_text_len long, canonical_url string"
)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_stream_dedup_and_batch_parity(spark, tmp_path):
    pages = (
        spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
        .where(F.col("doc_id") < 20)
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    )
    # batch 2: redeliveries of half the pages — same canonical URL, a
    # tracking-param variant, a minute later (inside the watermark horizon
    # as of their arrival) — plus one genuinely new page
    redeliver = (
        pages.where(F.col("doc_id") < 10)
        .withColumn("url", F.concat("url", F.lit("?utm_source=refetch")))
        .withColumn("doc_id", F.col("doc_id") + 1000)
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:10")))
    )
    fresh = (
        spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
        .where(F.col("doc_id") == 30)
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:10")))
    )
    b2 = redeliver.select(*pages.columns).unionAll(fresh.select(*pages.columns))

    in_dir = str(tmp_path / "pages")
    os.makedirs(in_dir)
    _stage_file(pages, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    q = stream_extract_pages(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        watermark="1 hour",
    )
    q.awaitTermination(180)

    got = spark.read.schema(OUT_DDL).parquet(str(tmp_path / "out"))
    # every canonical URL exactly once: the 20 originals collapse to 19
    # (datagen plants doc 5 on doc 4's canonical base — an IN-BATCH
    # collision the stream also dedups) + the 1 fresh page
    assert got.count() == 20
    assert got.select("canonical_url").distinct().count() == 20
    assert got.where(F.col("doc_id") >= 1000).count() == 0  # redeliveries lost
    kept_45 = [r.doc_id for r in got.where(F.col("doc_id").isin(4, 5)).collect()]
    assert len(kept_45) == 1  # exactly one of the planted pair survives

    # per-page batch ≡ streaming (stateless extraction): compare against the
    # batch main_content of exactly the surviving pages
    survivors = pages.unionAll(fresh.select(*pages.columns))
    want = {r.doc_id: r for r in main_content(survivors).collect()}
    for r in got.collect():
        w = want[r.doc_id]
        assert (r.main_text, r.n_kept, r.n_blocks, r.kept_text_len) == (
            w.main_text, w.n_kept, w.n_blocks, w.kept_text_len
        )
