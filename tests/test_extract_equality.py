"""Span-sequence equality: the Spark extraction pipeline must match the
pure-Python oracle (the executable spec transcribed from the reference)
per document under (kind, text, media_ref, order) — plus every scalar
chunk field. This is the correctness contract from BASELINE.json."""

import pytest

from graphical_context_extraction_pipeline_spark.datagen import DOCS_PER_SF, generate_doc
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.oracle import extract_chunks


def _spark_chunks_by_doc(spark, docs_path):
    df = spark.read.parquet(docs_path)
    rows = extract_documents(df).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r.t_start_ms)
    return by_doc


@pytest.fixture(scope="module")
def spark_chunks(spark, docs_path):
    return _spark_chunks_by_doc(spark, docs_path)


def test_all_docs_span_sequence_equality(spark_chunks):
    n_docs = DOCS_PER_SF["sf0.001"]
    checked_chunks = 0
    for i in range(n_docs):
        doc = generate_doc(i)
        expected = extract_chunks(doc)
        actual = spark_chunks.get(doc["doc_id"], [])
        assert len(actual) == len(expected), f"{doc['doc_id']}: chunk count"
        for exp, act in zip(expected, actual):
            exp_seq = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["out_spans"]
            ]
            act_seq = [(s.kind, s.text, s.media_ref, s.offset) for s in act.out_spans]
            assert act_seq == exp_seq, f"{exp['chunk_id']}: span sequence"
            checked_chunks += 1
    assert checked_chunks > 100  # meaningful corpus


def test_all_scalar_fields(spark_chunks):
    for i in range(DOCS_PER_SF["sf0.001"]):
        doc = generate_doc(i)
        for exp, act in zip(extract_chunks(doc), spark_chunks.get(doc["doc_id"], [])):
            assert act.chunk_id == exp["chunk_id"]
            assert act.t_start_ms == exp["t_start_ms"]
            assert act.t_end_ms == exp["t_end_ms"]
            assert act.chapter_index == exp["chapter_index"]
            assert act.chapter_title == exp["chapter_title"]
            assert act.scene_id == exp["scene_id"]
            assert list(act.merged_scene_ids) == exp["merged_scene_ids"]
            assert act.asr_text == exp["asr_text"], exp["chunk_id"]
            assert act.ocr_text == exp["ocr_text"], exp["chunk_id"]
            assert act.merged_text == exp["merged_text"]
            assert list(act.keyframe_ids) == exp["keyframe_ids"]
            assert list(act.keyframe_paths) == exp["keyframe_paths"]
            assert act.has_keyframe == exp["has_keyframe"]
            assert act.asr_confidence == pytest.approx(exp["asr_confidence"], abs=1e-9)
            assert act.ocr_confidence == pytest.approx(exp["ocr_confidence"], abs=1e-9)
            assert act.alignment_score == pytest.approx(exp["alignment_score"], abs=1e-9)
            assert act.completeness.has_speech == exp["completeness"]["has_speech"]
            assert act.completeness.has_visual == exp["completeness"]["has_visual"]
            assert act.completeness.has_ocr_text == exp["completeness"]["has_ocr_text"]
            assert list(act.span_ctx) == exp["span_ctx"], exp["chunk_id"]
            assert act.provenance.video_title == exp["provenance"]["video_title"]
            assert act.provenance.video_description == exp["provenance"]["video_description"]


def test_edge_docs_present():
    # the generator's prefix-stable edge docs exercise every branch
    assert generate_doc(0)["spans"] == []  # empty doc → zero chunks
    d1 = generate_doc(1)  # asr-only
    assert not any(s["kind"] in ("frame", "ocr") for s in d1["spans"])
    d2 = generate_doc(2)  # ocr-only
    assert not any(s["kind"] == "asr" for s in d2["spans"])
    d3 = generate_doc(3)  # no chapters → Unknown fallback
    assert not any(s["kind"] == "chapter" for s in d3["spans"])
    chunks3 = extract_chunks(d3)
    assert all(c["chapter_title"] == "Unknown" for c in chunks3)
    d4 = generate_doc(4)  # chapters end early → last-chapter fallback
    ch_spans = [s for s in d4["spans"] if s["kind"] == "chapter"]
    last_end = max(a["end_ms"] for s, a in zip(d4["spans"], d4["span_attrs"]) if s["kind"] == "chapter")
    chunks4 = extract_chunks(d4)
    late = [c for c in chunks4 if c["t_start_ms"] >= last_end]
    assert late, "doc 4 must have chunks past the last chapter"
    assert all(c["chapter_index"] == len(ch_spans) - 1 for c in late)


def test_chain_merge_and_boundary_duplication():
    # chain merge: ≥1 chunk with >2 merged scenes somewhere in the corpus;
    # boundary-touching ASR segments appear in both adjacent chunks
    chain_seen = dup_seen = False
    for i in range(DOCS_PER_SF["sf0.001"]):
        chunks = extract_chunks(generate_doc(i))
        for c in chunks:
            if len(c["merged_scene_ids"]) > 2:
                chain_seen = True
        for a, b in zip(chunks, chunks[1:]):
            a_asr = {(s["text"], s["offset"]) for s in a["out_spans"] if s["kind"] == "asr"}
            b_asr = {(s["text"], s["offset"]) for s in b["out_spans"] if s["kind"] == "asr"}
            if a_asr & b_asr:
                dup_seen = True
    assert chain_seen
    assert dup_seen
