"""W2-targeted differential fuzz: documents whose frames share >=90% of
their token sets with perturbed confidences — hammering the near-dup
keep-chain and its replace-in-place tiebreak (the reference's subtlest
semantics) across the kernel and the pure-Python oracle. 4000 randomized
examples were clean at round 1 end; this derandomized gate keeps a fixed
corpus of them in CI."""
from hypothesis import given, settings, strategies as st
from graphical_context_extraction_pipeline_spark.operators.extract import CHUNK_COLUMNS, _doc_chunks
from graphical_context_extraction_pipeline_spark.oracle import extract_chunks

VOCAB = ["alpha","beta","gamma","delta","eps","zeta","eta","theta","iota","kappa"]

@st.composite
def doc_st(draw):
    n_scenes = draw(st.integers(1, 3))
    scenes, t = [], 0
    for i in range(n_scenes):
        dur = draw(st.integers(6000, 20000))
        scenes.append((i, t, t + dur)); t += dur
    n_frames = draw(st.integers(2, 10))
    frames = []
    for i in range(n_frames):
        sid = draw(st.integers(0, n_scenes - 1))
        ts = draw(st.integers(scenes[sid][1], scenes[sid][2] - 1))
        frames.append((f"frames/f_{i:03d}.jpg", ts, sid))
    # base token set; each frame perturbs slightly (mostly >=90% overlap)
    base = draw(st.lists(st.sampled_from(VOCAB), min_size=8, max_size=10, unique=True))
    ocr = []
    for p, ts, _ in frames:
        toks = list(base)
        if draw(st.booleans()):
            k = draw(st.integers(0, 1))
            for _ in range(k):
                toks[draw(st.integers(0, len(toks) - 1))] = draw(st.sampled_from(VOCAB))
        n_blocks = draw(st.integers(1, 3))
        chunks_of = [toks[j::n_blocks] for j in range(n_blocks)]
        for b, ch in enumerate(chunks_of):
            ocr.append((p, " ".join(ch),
                        round(draw(st.floats(0.5, 1.0, allow_nan=False)), 4),
                        [float(b), float(b), 10.0, 10.0], ts + b))
    spans, attrs = [], []
    def add(kind, text, media_ref, offset, end_ms=None, conf=None, bbox=None, scene_id=None, n_words=None):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        attrs.append({"end_ms": end_ms, "confidence": conf, "bbox": bbox, "scene_id": scene_id, "n_words": n_words})
    for sid, s0, s1 in scenes: add("scene", f"{sid}:{s1}", None, s0, end_ms=s1)
    for p, ts, sid in frames: add("frame", None, p, ts, scene_id=sid)
    for p, txt, c, bbox, ts in ocr: add("ocr", txt, p, ts, conf=c, bbox=bbox)
    perm = draw(st.permutations(range(len(spans))))
    return {"doc_id": "w2", "spans": [spans[j] for j in perm], "span_attrs": [attrs[j] for j in perm],
            "meta": {"title": "t", "channel": "c", "description": "", "tags": [],
                     "upload_date": "20250101", "duration_ms": t}}


@settings(max_examples=200, deadline=None, derandomize=True)
@given(doc_st())
def test_w2_keepchain_kernel_matches_oracle(doc):
    exp = extract_chunks(doc)
    act = [dict(zip(CHUNK_COLUMNS, r)) for r in _doc_chunks(doc["doc_id"], doc["spans"], doc["span_attrs"], doc["meta"])]
    assert len(act) == len(exp)
    for e, a in zip(exp, act):
        assert a["ocr_text"] == e["ocr_text"]
        assert a["merged_text"] == e["merged_text"]
        assert [tuple(s) for s in a["out_spans"]] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in e["out_spans"]
        ]
        assert abs(a["ocr_confidence"] - e["ocr_confidence"]) <= 1e-12
