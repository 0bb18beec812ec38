"""Streaming crawl ingestion: canonical-URL dedup + on-the-fly DOM
extraction.

The incremental twin of the batch web pipeline (operators/urls.py +
operators/html_extract.py): pages arrive continuously from a crawl
frontier (file source stands in for the object-store prefix / queue), the
stream suppresses canonical-URL redeliveries with BOUNDED state
(``dropDuplicatesWithinWatermark`` keyed on the canonicalized URL — mirror
crawls and tracking-param re-fetches collapse here, exactly like the batch
``urls.url_dedup``), and surviving pages go through the same
``main_content`` expressions as batch — the projection is stateless, so
batch ≡ streaming per page by construction (pinned by test).

State bound: one dedup entry per canonical URL seen within the watermark
horizon, evicted as event time advances. A re-fetch later than the
watermark re-emits (its dedup state is gone) — size the watermark to the
crawler's revisit policy; downstream batch dedup (url_dedup over the
accumulated sink) remains the corpus-wide backstop, the same
stream-bounded / batch-exact split as the minhash incremental family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.html_extract import main_content
from ..operators.urls import _canonical

PAGES_STREAM_DDL = "doc_id long, url string, html string, fetch_time timestamp"


def dedup_pages_within_watermark(
    pages: DataFrame, watermark: str = "30 seconds"
) -> DataFrame:
    """First fetch of each canonical URL within the watermark horizon wins;
    later redeliveries (same canonical identity, any query-param/fragment
    variation) are suppressed while their state lives."""
    return (
        pages.withColumn("canonical_url", _canonical(F.col("url")))
        .withWatermark("fetch_time", watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )


def stream_extract_pages(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 1,
):
    """File-source pages → canonical dedup → main-content extraction →
    parquet (append). Output rows carry the canonical_url alongside the
    extracted article body."""
    stream = (
        spark.readStream.schema(PAGES_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = dedup_pages_within_watermark(stream, watermark)
    # canonical_url is a pure function of url — recompute it on the output
    # projection instead of joining the pre-extraction stream back in
    out = main_content(deduped).withColumn("canonical_url", _canonical(F.col("url")))
    return (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
