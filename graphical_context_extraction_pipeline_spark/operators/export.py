"""Export sinks — rebuild of the reference's exporter
(reference: phase 2/src/exporter.py:21-99): JSON array, JSONL, Parquet.

Spark-native: JSONL is Spark's JSON sink; Parquet is the primary sink
(zstd, optionally partitioned); the JSON-array form exists for parity with
the reference's debug artifact and is driver-materialized, so it is guarded
by a row-count cap — at 100 TB you never want a single JSON array.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

JSON_ARRAY_MAX_ROWS = 100_000


def export_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def export_jsonl(df: DataFrame, path: str) -> None:
    """One record per line — Spark's native JSON sink IS JSONL (S12)."""
    df.write.mode("overwrite").json(path)


def export_json_array(df: DataFrame, path: str, max_rows: int = JSON_ARRAY_MAX_ROWS) -> int:
    """Single JSON array file (reference S11 parity artifact). Driver-side by
    nature; refuses unboundedly large results."""
    rows = df.limit(max_rows + 1).toJSON().collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"export_json_array is a debug sink capped at {max_rows} rows; "
            "use export_jsonl/export_parquet for large outputs"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("[\n" + ",\n".join(rows) + "\n]")
    return len(rows)


def transcript_lines(docs: DataFrame) -> DataFrame:
    """S17/F7 rebuild: human-readable transcript lines per document —
    ``[HH:MM:SS.mmm --> HH:MM:SS.mmm] text`` over the asr spans in start
    order (reference: phase 1/src/extract/asr.py:246-266). Pipe the `line`
    column to ``df.write.text`` for the file artifact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def hms(ms_col):
        return F.format_string(
            "%02d:%02d:%02d.%03d",
            (ms_col / 3600000).cast("long"),
            ((ms_col / 60000).cast("long") % 60),
            ((ms_col / 1000).cast("long") % 60),
            (ms_col % 1000).cast("long"),
        )

    s = (
        docs.select(
            "doc_id",
            F.explode(F.arrays_zip(F.col("spans").alias("s"), F.col("span_attrs").alias("a"))).alias("z"),
        )
        .where(F.col("z.s.kind") == "asr")
        .select(
            "doc_id",
            F.col("z.s.offset").cast("long").alias("st"),
            F.col("z.a.end_ms").cast("long").alias("en"),
            F.col("z.s.text").alias("text"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("st", "en", "text")
    return s.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("seq"),
        F.format_string("[%s --> %s] %s", hms(F.col("st")), hms(F.col("en")), F.col("text")).alias(
            "line"
        ),
    )


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def to_json_strings(df: DataFrame) -> DataFrame:
    """chunks → one JSON string column (to_json over the full struct)."""
    from pyspark.sql import functions as F

    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))
