"""Parity against the reference's OWN published timeline artifact
(phase 2/output/XNQTWZ87K4I/timeline.json, 121 events): the engine's
interleaved span stream must reproduce the reference timeline's event
structure — per-kind timestamps, start/end interval bounds, and per-frame
OCR full_text in the reference's arrival order."""

import json
import os

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators.relational import (
    timeline_interleave,
)
from graphical_context_extraction_pipeline_spark.sources.golden import load_reference_doc

ART_DIR = "/root/reference/phase 1/XNQTWZ87K4I"
TIMELINE = "/root/reference/phase 2/output/XNQTWZ87K4I/timeline.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TIMELINE), reason="reference artifacts not available"
)


@pytest.fixture(scope="module")
def ref_events():
    with open(TIMELINE) as f:
        return json.load(f)["events"]


@pytest.fixture(scope="module")
def golden(spark):
    doc = load_reference_doc(ART_DIR)
    row = (
        doc["doc_id"],
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in doc["spans"]],
        [
            (a["end_ms"], a["confidence"], a["bbox"], a["scene_id"], a["n_words"], a.get("words"))
            for a in doc["span_attrs"]
        ],
        (
            doc["meta"]["title"], doc["meta"]["channel"], doc["meta"]["description"],
            doc["meta"]["tags"], doc["meta"]["upload_date"], doc["meta"]["duration_ms"],
        ),
    )
    return doc, spark.createDataFrame([row], SPANS_DDL)


def _by_type(events, t):
    return [e for e in events if e["event_type"] == t]


def test_interval_events_match_span_bounds(golden, ref_events):
    doc, _ = golden
    for kind, start_t, end_t in (("chapter", "chapter_start", "chapter_end"),
                                 ("scene", "scene_start", "scene_end")):
        spans = [
            (s["offset"], a["end_ms"])
            for s, a in zip(doc["spans"], doc["span_attrs"])
            if s["kind"] == kind
        ]
        assert sorted(s for s, _ in spans) == sorted(
            e["timestamp_ms"] for e in _by_type(ref_events, start_t)
        )
        assert sorted(e for _, e in spans) == sorted(
            e["timestamp_ms"] for e in _by_type(ref_events, end_t)
        )


def test_point_events_match_span_offsets(golden, ref_events):
    doc, df = golden
    tl = timeline_interleave(df).collect()
    asr_off = sorted(r["offset"] for r in tl if r["kind"] == "asr")
    assert asr_off == sorted(e["timestamp_ms"] for e in _by_type(ref_events, "asr_segment"))
    kf_off = sorted(r["offset"] for r in tl if r["kind"] == "frame")
    assert kf_off == sorted(e["timestamp_ms"] for e in _by_type(ref_events, "keyframe"))
    # reference groups OCR per frame: one event per frame at the frame ts;
    # our per-block spans reduce to the same distinct frame timestamps
    ocr_frames = sorted(
        {min(r["offset"] for r in tl if r["kind"] == "ocr" and r["media_ref"] == p)
         for p in {r["media_ref"] for r in tl if r["kind"] == "ocr"}}
    )
    assert ocr_frames == sorted(e["timestamp_ms"] for e in _by_type(ref_events, "ocr_block"))
    assert len(tl) > 0


def test_per_frame_full_text_matches_reference(golden, ref_events):
    """Per-frame OCR content parity vs the reference's published full_text.

    Compared as token MULTISETS: the reference built full_text from raw
    EasyOCR arrival order but persisted text_blocks re-sorted to reading
    order (phase 1/src/extract/ocr.py:241-248), so the original
    concatenation order is unrecoverable from the artifacts — content
    equality is the strongest well-defined check."""
    _, df = golden
    joined = (
        df.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "ocr")
        .groupBy(F.col("s.media_ref").alias("path"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s.offset", "s.text"))),
                    lambda x: x["text"],
                ),
                " ",
            ).alias("full_text")
        )
        .collect()
    )
    from collections import Counter

    ours = {os.path.basename(r["path"]): r["full_text"] for r in joined}
    checked = 0
    for e in _by_type(ref_events, "ocr_block"):
        name = os.path.basename(e["data"]["image_path"])
        if name in ours:
            assert Counter(ours[name].split()) == Counter(
                e["data"]["full_text"].split()
            ), name
            checked += 1
    assert checked == len(_by_type(ref_events, "ocr_block"))


def test_validator_reproduces_published_metrics(golden):
    """The reference's README/EXECUTIVE_SUMMARY publish 97.8% extraction
    coverage and 4 keyframe gaps for the golden video; the engine's
    validator reproduces both exactly (45/46 five-second windows covered →
    9782 basis points)."""
    from graphical_context_extraction_pipeline_spark.operators import validate as V

    _, df = golden
    cov = V.coverage(df).first()
    assert cov["n_windows"] == 46
    assert cov["n_covered"] == 45
    assert cov["coverage_bp"] == 9782  # == the published 97.8%
    assert V.keyframe_gaps(df).count() == 4  # published "4 gaps"
