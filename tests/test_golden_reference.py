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


def _spark_row(doc: dict) -> tuple:
    return (
        doc["doc_id"],
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in doc["spans"]],
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
            for a in doc["span_attrs"]
        ],
        (
            doc["meta"]["title"],
            doc["meta"]["channel"],
            doc["meta"]["description"],
            doc["meta"]["tags"],
            doc["meta"]["upload_date"],
            doc["meta"]["duration_ms"],
        ),
    )


def test_spark_matches_reference_output(spark, golden_doc, ref_chunks):
    df = spark.createDataFrame([_spark_row(golden_doc)], schema=SPANS_DDL)
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


def test_word_spans_reference_parity(spark, golden_doc):
    """VERDICT r2 item 7: the contract's per-word ASR detail is re-emitted
    for downstream consumers — every word in the reference's own asr.json
    (phase 1/XNQTWZ87K4I) comes through ``word_spans`` with its timing and
    score intact (reference ASRSegment.words, phase 2/src/loader.py:12-18)."""
    import json

    from graphical_context_extraction_pipeline_spark.operators.relational import word_spans

    segs = json.load(open(os.path.join(ART_DIR, "asr.json")))["segments"]
    ref = {}
    for seg in segs:
        for k, w in enumerate(seg.get("words") or []):
            score = float(w["score"]) if "score" in w else None
            ref[(int(seg["start"]), k)] = (
                w["word"],
                int(w["start"]),
                int(w["end"]),
                # round, not floor: scores are 4-decimal, so the e4 int is
                # exact under rounding (0.935 stored as 0.9349999... must
                # emit 9350, not 9349)
                -1 if score is None else round(score * 10000),
            )
    assert len(ref) >= 500  # the artifact carries substantial word detail

    df = spark.createDataFrame([_spark_row(golden_doc)], schema=SPANS_DDL)
    got = word_spans(df).collect()
    assert len(got) == len(ref)
    for r in got:
        assert ref[(r.seg_start_ms, r.word_idx)] == (r.word, r.start_ms, r.end_ms, r.score_e4)
