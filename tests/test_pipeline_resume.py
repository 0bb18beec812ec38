"""Checkpoint/resume semantics: crash between data write and audit commit
must be invisible — resume reprocesses and the final committed table equals
a single clean run (the reference's skip_if_exists artifact-reuse story,
reference: phase 1/src/ingest/downloader.py:34-44)."""

import pytest

from graphical_context_extraction_pipeline_spark.pipeline import ExtractionPipeline


def _chunk_key_set(df):
    return {(r.chunk_id, r.t_start_ms, r.t_end_ms, len(r.out_spans)) for r in df.collect()}


@pytest.fixture()
def docs(spark, docs_path):
    return spark.read.parquet(docs_path)


def test_clean_run_then_noop_resume(spark, docs, tmp_path):
    pipe = ExtractionPipeline(spark, str(tmp_path / "out"))
    first = pipe.run(docs)
    assert first is not None
    keys = _chunk_key_set(first)
    assert len(keys) == first.count()  # no duplicate chunks

    # second run: everything already processed → no new chunks
    second = pipe.run(docs)
    assert _chunk_key_set(second) == keys
    runs = pipe.committed_runs()
    assert len(runs) == 2
    assert runs[1]["n_docs_attempted"] == 0
    assert runs[1]["n_chunks"] == 0


def test_crash_before_commit_then_resume(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    pipe = ExtractionPipeline(spark, out)

    # split corpus: commit first half, crash on second half, resume
    half = docs.where("doc_id < 'doc_00000010'")
    pipe.run(half)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run(docs, fail_before_commit=True)

    # crashed run left data but no audit record → invisible to readers
    committed = pipe.read_chunks()
    assert committed.select("doc_id").distinct().count() <= 10

    final = pipe.run(docs)  # resume: reprocesses the uncommitted half

    clean_pipe = ExtractionPipeline(spark, str(tmp_path / "clean"))
    clean = clean_pipe.run(docs)
    assert _chunk_key_set(final) == _chunk_key_set(clean)


def test_partition_metrics_lineage(spark, docs, tmp_path):
    pipe = ExtractionPipeline(spark, str(tmp_path / "out"))
    chunks = pipe.run(docs)
    run = pipe.committed_runs()[0]
    assert run["n_chunks"] == chunks.count()
    assert run["partition_metrics"], "per-partition metrics must be recorded"
    assert sum(m["n_chunks"] for m in run["partition_metrics"]) == run["n_chunks"]
    # lineage column present on every row
    assert chunks.where("part_id is null or part_id < 0").count() == 0
