"""Differential fuzzing: the Spark kernel (operators/extract._doc_chunks)
and the pure-Python oracle (oracle.extract_chunks) are INDEPENDENT
implementations of the same spec — hypothesis generates random
structurally-valid documents (beyond the seeded corpus's distribution:
degenerate intervals, overlapping scenes, empty texts, unicode noise,
orphan OCR paths, out-of-range chapter times) and both must agree on every
field of every chunk. Runs driver-side (no Spark session) so hundreds of
examples are cheap."""

from hypothesis import given, settings
from hypothesis import strategies as st

from graphical_context_extraction_pipeline_spark.operators.extract import (
    CHUNK_COLUMNS,
    _doc_chunks,
)
from graphical_context_extraction_pipeline_spark.oracle import extract_chunks

NOISE = "  ​’“”﻿"
text_st = st.text(alphabet="ab c" + NOISE, min_size=0, max_size=24)
word_st = st.text(alphabet="abcxyz", min_size=1, max_size=6)


@st.composite
def doc_st(draw):
    n_scenes = draw(st.integers(0, 6))
    scenes = []
    for i in range(n_scenes):
        start = draw(st.integers(0, 200_000))
        dur = draw(st.integers(0, 70_000))
        scenes.append((i, start, start + dur))

    n_chap = draw(st.integers(0, 3))
    chapters = []
    for i in range(n_chap):
        c0 = draw(st.integers(0, 150_000))
        c1 = c0 + draw(st.integers(0, 120_000))
        chapters.append((f"ch{i}", c0, c1))

    n_asr = draw(st.integers(0, 8))
    asr = []
    for _ in range(n_asr):
        a0 = draw(st.integers(0, 200_000))
        a1 = a0 + draw(st.integers(0, 12_000))
        # optionally carry per-word detail (A3 must then derive from the raw
        # scores; None/empty exercises the segment-level fallback)
        words = draw(
            st.one_of(
                st.none(),
                st.lists(
                    st.tuples(
                        word_st,
                        st.integers(0, 200_000),
                        st.integers(0, 200_000),
                        # None = word without a 'score' key (WhisperX emits
                        # these for numerals) — must be excluded from the
                        # chunk-confidence sum AND count (enricher.py:51-68)
                        st.one_of(st.none(), st.floats(0.0, 1.0, allow_nan=False)),
                    ),
                    max_size=5,
                ),
            )
        )
        asr.append(
            (
                draw(text_st),
                a0,
                a1,
                round(draw(st.floats(0.0, 1.0, allow_nan=False)), 4),
                draw(st.integers(0, 20)),
                None
                if words is None
                else [
                    {"word": w, "start_ms": ws, "end_ms": we, "score": s}
                    for w, ws, we, s in words
                ],
            )
        )

    n_frames = draw(st.integers(0, 5))
    frames = []
    for i in range(n_frames):
        sid = draw(st.one_of(st.none(), st.integers(-1, n_scenes + 1)))
        frames.append((f"frames/f_{i:03d}.jpg", draw(st.integers(0, 200_000)), sid))

    n_ocr = draw(st.integers(0, 10))
    ocr = []
    for _ in range(n_ocr):
        if frames and draw(st.booleans()):
            path = frames[draw(st.integers(0, len(frames) - 1))][0]
        else:
            path = "frames/orphan.jpg"
        bbox = draw(
            st.one_of(
                st.none(),
                st.tuples(*[st.floats(0, 1000, allow_nan=False)] * 4).map(list),
            )
        )
        ocr.append(
            (
                path,
                draw(text_st),
                round(draw(st.floats(0.0, 1.0, allow_nan=False)), 4),
                bbox,
                draw(st.integers(0, 200_000)),
            )
        )

    spans, attrs = [], []

    def add(kind, text, media_ref, offset, end_ms=None, conf=None, bbox=None, scene_id=None, n_words=None, words=None):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        attrs.append(
            {"end_ms": end_ms, "confidence": conf, "bbox": bbox, "scene_id": scene_id,
             "n_words": n_words, "words": words}
        )

    for t, c0, c1 in chapters:
        add("chapter", t, None, c0, end_ms=c1)
    for sid, s0, s1 in scenes:
        add("scene", f"{sid}:{s1}", None, s0, end_ms=s1)
    for t, a0, a1, c, w, words in asr:
        add("asr", t, None, a0, end_ms=a1, conf=c, n_words=w, words=words)
    for p, ts, sid in frames:
        add("frame", None, p, ts, scene_id=sid)
    for p, t, c, bbox, ts in ocr:
        add("ocr", t, p, ts, conf=c, bbox=bbox)

    # random interleave — both implementations must be input-order-invariant
    perm = draw(st.permutations(range(len(spans))))
    spans = [spans[j] for j in perm]
    attrs = [attrs[j] for j in perm]
    meta = {
        "title": "t",
        "channel": "c",
        "description": draw(st.text(alphabet="de f", max_size=30)),
        "tags": ["x"],
        "upload_date": "20250101",
        "duration_ms": max([s[2] for s in scenes], default=0),
    }
    return {"doc_id": "fuzz", "spans": spans, "span_attrs": attrs, "meta": meta}


@settings(max_examples=250, deadline=None, derandomize=True)
@given(doc_st())
def test_kernel_matches_oracle_on_random_docs(doc):
    expected = extract_chunks(doc)
    actual_rows = _doc_chunks(doc["doc_id"], doc["spans"], doc["span_attrs"], doc["meta"])
    actual = [dict(zip(CHUNK_COLUMNS, r)) for r in actual_rows]

    assert len(actual) == len(expected)
    for exp, act in zip(expected, actual):
        act_seq = [tuple(s) for s in act["out_spans"]]
        exp_seq = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["out_spans"]
        ]
        assert act_seq == exp_seq, exp["chunk_id"]
        for f in (
            "chunk_id", "source", "t_start_ms", "t_end_ms", "chapter_index",
            "chapter_title", "scene_id", "merged_scene_ids", "asr_text", "ocr_text",
            "merged_text", "keyframe_ids", "keyframe_paths", "has_keyframe", "span_ctx",
        ):
            assert act[f] == exp[f], (exp["chunk_id"], f)
        for f in ("asr_confidence", "ocr_confidence", "alignment_score"):
            assert abs(act[f] - exp[f]) < 1e-12, (exp["chunk_id"], f)
