"""Property tests for the cross-doc boilerplate model and the
sliding-window overlap chunker (north-star ops beyond the reference)."""

import math

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import boilerplate as BP
from graphical_context_extraction_pipeline_spark.operators.relational import (
    sliding_window_chunks,
)

WINDOW, STRIDE = 30000, 15000


def _docs(spark, docs_path):
    return spark.read.parquet(docs_path)


def test_partition_local_matches_global_on_one_partition(spark, docs_path):
    """With everything in one partition the partition-local frequency model
    IS the global model — same (norm, n_docs) set."""
    docs = _docs(spark, docs_path)
    glob = {
        (r["norm"], r["n_docs"])
        for r in BP.boilerplate_lines(docs).collect()
    }
    loc = {
        (r["norm"], r["n_docs"])
        for r in BP.boilerplate_lines_partition_local(docs.coalesce(1)).collect()
    }
    assert glob == loc
    assert glob, "fixture corpus should contain cross-doc boilerplate"


def test_partition_local_is_zero_shuffle(spark, docs_path):
    plan = BP.boilerplate_lines_partition_local(
        _docs(spark, docs_path)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_strip_removes_exactly_the_boilerplate_set(spark, docs_path):
    docs = _docs(spark, docs_path)
    bl = {r["norm"] for r in BP.boilerplate_lines(docs).collect()}
    kept = BP.strip_boilerplate(docs)
    kept_ocr_norms = {
        r["norm"]
        for r in kept.where(F.col("kind") == "ocr")
        .select(BP._norm_line(F.col("text")).alias("norm"))
        .collect()
    }
    assert not (kept_ocr_norms & bl)
    # non-OCR spans are untouched: counts match the input
    n_in = (
        docs.select(F.explode("spans").alias("s")).where(F.col("s.kind") != "ocr").count()
    )
    n_out = kept.where(F.col("kind") != "ocr").count()
    assert n_in == n_out


def test_sliding_windows_overlap_and_anchor_order(spark, docs_path):
    docs = _docs(spark, docs_path)
    win = sliding_window_chunks(docs, WINDOW, STRIDE)
    rows = win.collect()
    assert rows

    # every span lands in every window containing it: recompute the expected
    # multiplicity for one doc from raw spans
    doc_id = rows[0]["doc_id"]
    raw = docs.where(F.col("doc_id") == doc_id).select(
        F.col("meta.duration_ms").alias("dur"), "spans"
    ).first()
    k_max = max(0, math.ceil((raw["dur"] - WINDOW) / STRIDE))
    expected = 0
    for sp in raw["spans"]:
        k_lo = max(0, math.ceil((sp["offset"] - WINDOW + 1) / STRIDE))
        k_hi = min(sp["offset"] // STRIDE, k_max)
        if k_lo <= k_hi:
            expected += k_hi - k_lo + 1
    got = sum(r["n_spans"] for r in rows if r["doc_id"] == doc_id)
    assert got == expected

    # window geometry: stride spacing, fixed width, overlap = WINDOW - STRIDE
    for r in rows:
        assert r["w_end_ms"] - r["w_start_ms"] == WINDOW
        assert r["w_start_ms"] == r["win_seq"] * STRIDE

    # media anchors are offset-ordered within each window (use a doc that
    # actually has media spans)
    m_doc = win.where(F.col("media_refs") != "").select("doc_id").first()["doc_id"]
    by_doc = win.where((F.col("doc_id") == m_doc) & (F.col("media_refs") != "")).collect()
    assert by_doc
    m_raw = docs.where(F.col("doc_id") == m_doc).select("spans").first()
    frame_ts = {
        sp["media_ref"]: sp["offset"]
        for sp in m_raw["spans"]
        if sp["media_ref"] is not None
    }
    for r in by_doc:
        offs = [frame_ts[m] for m in r["media_refs"].split("|")]
        assert offs == sorted(offs)
        assert all(r["w_start_ms"] <= o < r["w_end_ms"] for o in offs)
