"""Sinks (S11-S13) + streaming ingest: round-trips and incremental parity."""

import json

from graphical_context_extraction_pipeline_spark.operators.export import (
    export_json_array,
    export_jsonl,
    export_parquet,
)
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.streaming.ingest import stream_extract


def test_export_roundtrips(spark, docs_path, tmp_path):
    chunks = extract_documents(spark.read.parquet(docs_path))
    n = chunks.count()

    pq = str(tmp_path / "chunks.parquet")
    export_parquet(chunks, pq)
    assert spark.read.parquet(pq).count() == n

    jl = str(tmp_path / "chunks.jsonl")
    export_jsonl(chunks.select("chunk_id", "doc_id", "t_start_ms", "asr_text"), jl)
    back = spark.read.json(jl)
    assert back.count() == n

    ja = str(tmp_path / "chunks.json")
    small = chunks.select("chunk_id", "t_start_ms").limit(20)
    wrote = export_json_array(small, ja)
    data = json.load(open(ja))
    assert wrote == len(data) == 20
    assert {"chunk_id", "t_start_ms"} <= set(data[0].keys())


def test_stream_extract_matches_batch(spark, docs_path, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, docs_path, out, ckpt, max_files_per_trigger=2)
    q.awaitTermination(300)

    batch = extract_documents(spark.read.parquet(docs_path))
    streamed = spark.read.parquet(out)
    assert streamed.count() == batch.count()
    b_keys = {r.chunk_id for r in batch.select("chunk_id").collect()}
    s_keys = {r.chunk_id for r in streamed.select("chunk_id").collect()}
    assert b_keys == s_keys
    assert streamed.select("epoch_id").distinct().count() >= 1


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from graphical_context_extraction_pipeline_spark.operators.export import compact_parquet

    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    import os
    n_in = sum(1 for n in os.listdir(src) if n.endswith(".parquet"))
    assert n_in == 64
    stats = compact_parquet(spark, src, dst, target_bytes_per_file=1 << 30)
    assert stats == {"files_in": 64, "files_out": 1, "bytes_in": stats["bytes_in"], "rows": 10_000}
    assert spark.read.parquet(dst).count() == 10_000
