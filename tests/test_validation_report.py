"""validation_report: the per-doc ValidationReport rollup with the
reference report generator's pass/partial/fail verdict (phase 3/src/
report_generator.py:80-81: pass ≥90 %, partial 70-89 %, fail <70 %).
Boundary docs are constructed to sit exactly ON the thresholds."""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.operators.validate import validation_report


def _doc(doc_id, covered_windows, n_windows=10, extra_spans=(), extra_attrs=()):
    """A doc with ``n_windows`` 5 s windows of which the first
    ``covered_windows`` are covered by one ASR segment each."""
    spans, attrs = [], []
    for w in range(covered_windows):
        spans.append(("asr", f"seg {w}", None, w * 5000 + 100))
        attrs.append((w * 5000 + 400, 0.9, None, None, 2, None))
    spans += list(extra_spans)
    attrs += list(extra_attrs)
    meta = (f"t{doc_id}", "ch", "", [], "20240101", n_windows * 5000)
    return (doc_id, spans, attrs, meta)


@pytest.fixture(scope="module")
def report(spark):
    rows = [
        _doc("d_pass", 9),     # 90.00 % — exactly on the pass boundary
        _doc("d_partial", 7),  # 70.00 % — exactly on the partial boundary
        _doc("d_fail", 6),     # 60.00 %
        # gap-carrying doc: frames at 0/20s/60s (gaps 20 s medium, 40 s
        # high) and ASR at 0-0.4 s then 30 s (29.6 s silence gap)
        _doc(
            "d_gaps",
            1,
            n_windows=14,
            extra_spans=[
                ("frame", None, "f/a.jpg", 0),
                ("frame", None, "f/b.jpg", 20000),
                ("frame", None, "f/c.jpg", 60000),
                ("asr", "late", None, 30000),
                ("ocr", "hi", "f/a.jpg", 1),       # conf ≥ .5 → counted
                ("ocr", "lo", "f/a.jpg", 2),       # conf < .5 → not counted
            ],
            extra_attrs=[
                (None, None, None, None, None, None),
                (None, None, None, None, None, None),
                (None, None, None, None, None, None),
                (30400, 0.8, None, None, 1, None),
                (None, 0.9, [0.0, 0.0, 1.0, 1.0], None, None, None),
                (None, 0.4, [0.0, 0.0, 1.0, 1.0], None, None, None),
            ],
        ),
    ]
    docs = spark.createDataFrame(rows, SPANS_DDL)
    return {
        r["doc_id"]: r
        for r in validation_report(docs, extract_documents(docs)).collect()
    }


def test_verdict_boundaries(report):
    assert report["d_pass"]["verdict"] == "pass"
    assert report["d_pass"]["coverage_bp"] == 9000
    assert report["d_partial"]["verdict"] == "partial"
    assert report["d_partial"]["coverage_bp"] == 7000
    assert report["d_fail"]["verdict"] == "fail"
    assert report["d_fail"]["coverage_bp"] == 6000


def test_gap_and_total_counts(report):
    g = report["d_gaps"]
    assert g["n_keyframe_gaps"] == 2        # 20 s and 40 s both > 15 s
    assert g["n_high_keyframe_gaps"] == 1   # only 40 s > 30 s
    assert g["n_asr_gaps"] == 1             # 29.6 s silence > 5 s
    assert g["n_keyframes"] == 3
    assert g["n_asr_segments"] == 2
    assert g["n_ocr_blocks"] == 1           # the conf-0.4 block is excluded
    assert g["verdict"] == "fail"


def test_chunk_side_rollup(report):
    # chunked docs carry chunk + flag counts; ASR-only docs produce no
    # scene-based chunks, so counts coalesce to zero rather than NULL
    for d in ("d_pass", "d_partial", "d_fail"):
        assert report[d]["n_chunks"] == 0
        assert report[d]["n_quality_flags"] == 0
