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

    from ..functions.exprs import zip_spans

    s = (
        docs.select("doc_id", F.explode(zip_spans(("end_ms",))).alias("z"))
        .where(F.col("z.s.kind") == "asr")
        .select(
            "doc_id",
            F.col("z.s.offset").cast("long").alias("st"),
            F.col("z.end_ms").cast("long").alias("en"),
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


# canonical serialization separators (control chars that cannot occur in
# span text: normalize_text collapses all whitespace and the corpora carry
# no other control characters)
CANON_FIELD_SEP = "\x1f"
CANON_ROW_SEP = "\x1e"


def chunks_canonical(chunks: DataFrame) -> DataFrame:
    """Hash-stable flat projection of the chunk table: every column is
    string / bigint / boolean so any engine (or the driver's pandas
    canonicalizer) hashes it identically — array columns are serialized
    with control-char separators, float confidences floored to e6 ints.

    ``part_id`` is deliberately excluded: it is execution lineage (which
    task produced the row), not chunk content.
    """
    from pyspark.sql import functions as F

    US, RS = CANON_FIELD_SEP, CANON_ROW_SEP

    out_spans_s = F.array_join(
        F.transform(
            F.col("out_spans"),
            lambda s: F.concat_ws(
                US,
                s["kind"],
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
                s["offset"].cast("string"),
            ),
        ),
        RS,
    )
    return chunks.select(
        "chunk_id",
        "doc_id",
        "source",
        F.col("t_start_ms").cast("long").alias("t_start_ms"),
        F.col("t_end_ms").cast("long").alias("t_end_ms"),
        F.col("chapter_index").cast("long").alias("chapter_index"),
        "chapter_title",
        F.col("scene_id").cast("long").alias("scene_id"),
        F.array_join(F.transform("merged_scene_ids", lambda x: x.cast("string")), ",").alias(
            "merged_scene_ids_s"
        ),
        "asr_text",
        "ocr_text",
        "merged_text",
        out_spans_s.alias("out_spans_s"),
        F.array_join(F.col("span_ctx"), RS, "").alias("span_ctx_s"),
        F.array_join(F.transform("keyframe_ids", lambda x: x.cast("string")), ",").alias(
            "keyframe_ids_s"
        ),
        F.array_join(F.col("keyframe_paths"), RS).alias("keyframe_paths_s"),
        "has_keyframe",
        F.floor(F.col("asr_confidence") * 1000000.0).cast("long").alias("asr_conf_e6"),
        F.floor(F.col("ocr_confidence") * 1000000.0).cast("long").alias("ocr_conf_e6"),
        F.floor(F.col("alignment_score") * 1000000.0).cast("long").alias("alignment_e6"),
        F.col("completeness.has_speech").alias("has_speech"),
        F.col("completeness.has_visual").alias("has_visual"),
        F.col("completeness.has_ocr_text").alias("has_ocr_text"),
        F.coalesce(F.col("provenance.video_title"), F.lit("")).alias("video_title"),
        F.coalesce(F.col("provenance.channel"), F.lit("")).alias("channel"),
        F.coalesce(F.col("provenance.video_description"), F.lit("")).alias("video_description"),
        F.array_join(F.coalesce(F.col("provenance.tags"), F.array().cast("array<string>")), RS).alias("tags_s"),
        F.coalesce(F.col("provenance.publish_date"), F.lit("")).alias("publish_date"),
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


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_bytes_per_file: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files sized
    for scan efficiency. A 10^12-doc sink accumulates micro-batch and
    straggler files; thousands of KB-sized files per partition turn every
    downstream scan into a metadata storm (one footer read + task per
    file). Target file count = ceil(input_bytes / target), realized with
    coalesce (narrow — no shuffle; partition mix only matters for file
    SIZES here, not key placement).

    Returns {"files_in", "files_out", "bytes_in", "rows"} so callers can
    audit the rewrite. The write goes to a NEW directory — pair with the
    pipeline's write-audit protocol to swap it in atomically; never
    compact in place.
    """
    import math
    import os

    files = []
    for root, _dirs, names in os.walk(src_path):
        files.extend(
            os.path.join(root, n) for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_bytes_per_file))
    df = spark.read.parquet(src_path)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_path)
    rows = spark.read.parquet(dst_path).count()
    files_out = sum(
        1 for n in os.listdir(dst_path) if n.endswith(".parquet") and not n.startswith("_")
    )
    return {
        "files_in": len(files),
        "files_out": files_out,
        "bytes_in": bytes_in,
        "rows": rows,
    }
