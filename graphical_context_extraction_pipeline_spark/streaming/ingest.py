"""Structured-Streaming ingestion of the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.9) — this is the engine's
continuous-arrival story: new document files land in a directory (at cluster
scale: an object-store prefix / Iceberg incremental scan), each micro-batch
runs the SAME zero-shuffle extraction operator via foreachBatch, appending
to the chunks sink. foreachBatch gives exactly-once per epoch when paired
with the write-audit commit in pipeline.py (epoch id recorded per run).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..datagen import SPANS_DDL
from ..operators.extract import extract_documents


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Watch input_dir for new spans parquet files; extract incrementally."""
    stream = (
        spark.readStream.schema(SPANS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        chunks = extract_documents(batch_df)
        chunks.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
