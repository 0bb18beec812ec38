"""Parity against the reference's OWN published input/output pair: the
committed phase-1 artifacts for video XNQTWZ87K4I are converted into one
interleaved-spans row and run through both the pure-Python oracle and the
Spark pipeline; results must match the reference's phase-2 chunks.json
(9 chunks, reference: phase 2/output/XNQTWZ87K4I/chunks.json).

Text comparisons are whitespace-normalized: this engine deliberately
normalizes Unicode/whitespace (north-rule OCR-noise cleaning), while the
reference joins raw block texts (trailing spaces survive there).
Published alignment_score is 0.0 in the reference output (its aligner
result was not persisted), so that field is not compared.
"""

import os

import pytest

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.functions.textnorm import normalize_text
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.oracle import extract_chunks
from graphical_context_extraction_pipeline_spark.sources.golden import (
    load_reference_chunks,
    load_reference_doc,
)

ART_DIR = "/root/reference/phase 1/XNQTWZ87K4I"
OUT_DIR = "/root/reference/phase 2/output/XNQTWZ87K4I"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ART_DIR), reason="reference artifacts not available"
)


@pytest.fixture(scope="module")
def golden_doc():
    return load_reference_doc(ART_DIR)


@pytest.fixture(scope="module")
def ref_chunks():
    return load_reference_chunks(OUT_DIR)


def _check(mine: list[dict], ref: list[dict]):
    assert len(mine) == len(ref) == 9
    for m, r in zip(mine, ref):
        for k in [
            "chunk_id",
            "source",
            "t_start_ms",
            "t_end_ms",
            "chapter_index",
            "chapter_title",
            "scene_id",
            "has_keyframe",
            "keyframe_ids",
        ]:
            assert m[k] == r[k], (m["chunk_id"], k)
        assert [p.rsplit("/", 1)[-1] for p in m["keyframe_paths"]] == [
            p.rsplit("/", 1)[-1] for p in r["keyframe_paths"]
        ]
        assert m["asr_text"] == normalize_text(r["asr_text"]), m["chunk_id"]
        assert m["ocr_text"] == normalize_text(r["ocr_text"]), m["chunk_id"]
        assert m["merged_text"] == normalize_text(r["merged_text"]), m["chunk_id"]
        assert m["asr_confidence"] == pytest.approx(r["asr_confidence"], abs=1e-6)
        assert m["ocr_confidence"] == pytest.approx(r["ocr_confidence"], abs=1e-6)
        for flag in ["has_speech", "has_visual", "has_ocr_text"]:
            assert m["completeness"][flag] == r["completeness"][flag], (m["chunk_id"], flag)


def test_oracle_matches_reference_output(golden_doc, ref_chunks):
    _check(extract_chunks(golden_doc), ref_chunks)


def test_spark_matches_reference_output(spark, golden_doc, ref_chunks):
    row = (
        golden_doc["doc_id"],
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in golden_doc["spans"]],
        [
            (
                a["end_ms"],
                a["confidence"],
                a["bbox"],
                a["scene_id"],
                a["n_words"],
                None
                if a.get("words") is None
                else [(w["word"], w["start_ms"], w["end_ms"], w["score"]) for w in a["words"]],
            )
            for a in golden_doc["span_attrs"]
        ],
        (
            golden_doc["meta"]["title"],
            golden_doc["meta"]["channel"],
            golden_doc["meta"]["description"],
            golden_doc["meta"]["tags"],
            golden_doc["meta"]["upload_date"],
            golden_doc["meta"]["duration_ms"],
        ),
    )
    df = spark.createDataFrame([row], schema=SPANS_DDL)
    rows = extract_documents(df).collect()
    rows.sort(key=lambda x: x.t_start_ms)
    mine = [
        {
            "chunk_id": x.chunk_id,
            "source": x.source,
            "t_start_ms": x.t_start_ms,
            "t_end_ms": x.t_end_ms,
            "chapter_index": x.chapter_index,
            "chapter_title": x.chapter_title,
            "scene_id": x.scene_id,
            "has_keyframe": x.has_keyframe,
            "keyframe_ids": list(x.keyframe_ids),
            "keyframe_paths": list(x.keyframe_paths),
            "asr_text": x.asr_text,
            "ocr_text": x.ocr_text,
            "merged_text": x.merged_text,
            "asr_confidence": x.asr_confidence,
            "ocr_confidence": x.ocr_confidence,
            "completeness": {
                "has_speech": x.completeness.has_speech,
                "has_visual": x.completeness.has_visual,
                "has_ocr_text": x.completeness.has_ocr_text,
            },
        }
        for x in rows
    ]
    _check(mine, ref_chunks)
