"""Stateful streaming document assembly ≡ batch extraction.

Span events for each document are split across TWO input files (first half
without eof, second half + eof markers), forcing the applyInPandasWithState
operator to carry per-doc state across micro-batches before emitting."""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.streaming.stateful import (
    spans_to_events,
    stream_assemble_documents,
)

N_DOCS = 6


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_streaming_assembly_matches_batch(spark, docs_path, tmp_path):
    docs = spark.read.parquet(docs_path).where(
        F.col("doc_id").isin([f"doc_{i:08d}" for i in range(N_DOCS)])
    )

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    ev = spans_to_events(docs, with_eof=False)
    split = F.crc32(
        F.concat_ws("|", "doc_id", "kind", F.coalesce(F.col("offset").cast("string"), F.lit("")))
    ) % 2
    half1 = ev.where(split == 0)
    half2 = ev.where(split == 1)
    eof_rows = spans_to_events(docs).where(F.col("kind") == "eof")

    _stage_file(half1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)  # distinct mtimes → deterministic file-source ordering
    _stage_file(half2.unionByName(eof_rows), str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    q = stream_assemble_documents(spark, in_dir, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    got = (
        spark.read.schema(
            "chunk_id string, doc_id string, t_start_ms int, t_end_ms int, "
            "chapter_index int, scene_id int, asr_text string, ocr_text string, "
            "merged_text string, n_out_spans int"
        )
        .parquet(out_dir)
        .collect()
    )
    want = extract_documents(docs).collect()

    got_m = {r["chunk_id"]: r for r in got}
    want_m = {r["chunk_id"]: r for r in want}
    assert set(got_m) == set(want_m)
    for cid, w in want_m.items():
        g = got_m[cid]
        assert g["asr_text"] == w["asr_text"], cid
        assert g["ocr_text"] == w["ocr_text"], cid
        assert g["merged_text"] == w["merged_text"], cid
        assert g["t_start_ms"] == w["t_start_ms"] and g["t_end_ms"] == w["t_end_ms"]
        assert g["n_out_spans"] == len(w["out_spans"]), cid
