"""MMC4/OBELICS-style interleave curation (operators/multimodal.py):
hand-built fixtures with known run structure, gate edge cases, the
transition matrix, and the zero-shuffle plan pins.

Oracle parity at corpus scale runs through test_oracle_parity.py
(interleave_stats / interleave_gate / kind_transitions entries); this file
pins the SEMANTICS on documents small enough to check by hand.
"""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import multimodal as MM
from graphical_context_extraction_pipeline_spark.plans.explain import (
    count_exchanges,
    physical_plan,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text, off):
    return {"kind": kind, "text": text, "media_ref": None, "offset": off}


@pytest.fixture(scope="module")
def fixture_docs(spark):
    long_text = "x" * 250
    rows = [
        # alternating: text, frame, frame, text → 3 runs, max media run 2
        (
            "doc_a",
            [
                _span("asr", "ab", 0),
                _span("frame", None, 10),
                _span("frame", None, 20),
                _span("asr", "cde", 30),
            ],
        ),
        # pure image gallery → has_text false
        ("doc_b", [_span("frame", None, 0), _span("frame", None, 1)]),
        # empty spans → excluded from every output
        ("doc_c", []),
        # passes every gate rule: long text, one bounded media run
        (
            "doc_d",
            [
                _span("chapter", long_text, 0),
                _span("frame", None, 5),
                _span("asr", "tail", 9),
            ],
        ),
        # text-only → has_media false
        ("doc_e", [_span("ocr", "only text here", 0)]),
        # out-of-order offsets: stats must follow offset order, not array
        # order (media run is CONSECUTIVE only after the intra-row sort)
        (
            "doc_f",
            [
                _span("frame", None, 30),
                _span("asr", "mid", 20),
                _span("frame", None, 10),
            ],
        ),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_interleave_stats_by_hand(fixture_docs):
    st = {r["doc_id"]: r.asDict() for r in MM.interleave_stats(fixture_docs).collect()}
    assert set(st) == {"doc_a", "doc_b", "doc_d", "doc_e", "doc_f"}  # doc_c dropped
    a = st["doc_a"]
    assert (a["n_spans"], a["n_text"], a["n_media"]) == (4, 2, 2)
    assert a["media_share_bp"] == 5000
    assert (a["n_runs"], a["max_media_run"]) == (3, 2)
    assert a["text_chars"] == 5
    assert (a["first_class"], a["last_class"]) == ("text", "text")
    b = st["doc_b"]
    assert (b["n_text"], b["n_media"], b["media_share_bp"]) == (0, 2, 10000)
    assert (b["n_runs"], b["max_media_run"], b["text_chars"]) == (1, 2, 0)
    assert (b["first_class"], b["last_class"]) == ("media", "media")
    # doc_f sorted by offset is frame, asr, frame → alternating, runs of 1
    f = st["doc_f"]
    assert (f["n_runs"], f["max_media_run"]) == (3, 1)
    assert (f["first_class"], f["last_class"]) == ("media", "media")


def test_interleave_gate_rules(fixture_docs):
    g = {r["doc_id"]: r.asDict() for r in MM.interleave_gate(fixture_docs).collect()}
    assert g["doc_d"]["keep"] is True
    assert not g["doc_b"]["has_text"] and g["doc_b"]["keep"] is False
    assert not g["doc_e"]["has_media"] and g["doc_e"]["keep"] is False
    # doc_a fails only the text-length rule
    assert g["doc_a"]["has_text"] and g["doc_a"]["has_media"]
    assert g["doc_a"]["ok_media_share"] and g["doc_a"]["ok_media_run"]
    assert not g["doc_a"]["ok_text_len"] and g["doc_a"]["keep"] is False
    # rule knobs: loosening the text floor admits doc_a
    loose = {
        r["doc_id"]: r["keep"]
        for r in MM.interleave_gate(fixture_docs, min_text_chars=5).collect()
    }
    assert loose["doc_a"] is True


def test_kind_transitions_by_hand(fixture_docs):
    kt = {
        (r["prev_kind"], r["kind"]): r["n"]
        for r in MM.kind_transitions(fixture_docs).collect()
    }
    # doc_a: asr→frame, frame→frame, frame→asr; doc_b: frame→frame;
    # doc_d: chapter→frame, frame→asr; doc_e: no pairs;
    # doc_f (offset order): frame→asr, asr→frame
    assert kt[("asr", "frame")] == 2
    assert kt[("frame", "frame")] == 2
    assert kt[("frame", "asr")] == 3
    assert kt[("chapter", "frame")] == 1
    assert sum(kt.values()) == 8  # 3 (doc_a) + 1 (doc_b) + 2 (doc_d) + 2 (doc_f)


def test_mm_curate_statuses(spark):
    long_text = "y" * 240

    def media(ref, off):
        return {"kind": "frame", "text": None, "media_ref": ref, "offset": off}

    rows = [
        # doc_m and doc_n share 2 of 3 assets (jaccard 6666 ≥ 5000) and
        # both pass the gate → component = doc_m keeps, doc_n is the dup
        (
            "doc_m",
            [
                _span("asr", long_text, 0),
                media("r1", 10),
                _span("asr", "mid", 20),
                media("r2", 30),
                media("r3", 40),
            ],
        ),
        (
            "doc_n",
            [
                _span("asr", long_text, 0),
                media("r1", 10),
                _span("asr", "other", 20),
                media("r2", 30),
            ],
        ),
        # fails the gate (no text) → rejected, and its assets must NOT
        # enter the dedup stage even though they'd pair with doc_m
        ("doc_r", [media("r1", 0), media("r2", 1), media("r3", 2)]),
        # passes the gate, unpaired → kept
        ("doc_k", [_span("asr", long_text, 0), media("q1", 10)]),
        ("doc_empty", []),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    st = {r["doc_id"]: r["status"] for r in MM.mm_curate(docs).collect()}
    assert st == {
        "doc_m": "kept",
        "doc_n": "media_dup",
        "doc_r": "rejected",
        "doc_k": "kept",
    }


def test_mm_pack_image_cost(spark):
    # one bucket so the fold order is the plain doc_id order
    def media(ref, off):
        return {"kind": "frame", "text": None, "media_ref": ref, "offset": off}

    rows = [
        # 2 text tokens + 1 image = 2 + 64 = 66
        ("doc_1", [_span("asr", "two words", 0), media("r1", 5)]),
        # 40 images = 2560 > budget 2048 → oversize singleton bin
        ("doc_2", [media(f"r{i}", i) for i in range(40)]),
        # 3 text tokens, no image = 3
        ("doc_3", [_span("asr", "a b c", 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {
        r["doc_id"]: r.asDict()
        for r in MM.mm_pack(docs, budget=2048, image_tokens=64, n_buckets=1).collect()
    }
    assert out["doc_1"]["n_tokens"] == 66
    assert out["doc_2"]["n_tokens"] == 2560
    assert out["doc_3"]["n_tokens"] == 3
    # doc_id order: doc_1 opens bin 0 (fill 66); doc_2 overflows → bin 1
    # alone (oversize); doc_3 overflows doc_2's full bin → bin 2
    assert (out["doc_1"]["seq_idx"], out["doc_1"]["fill"]) == (0, 66)
    assert (out["doc_2"]["seq_idx"], out["doc_2"]["fill"]) == (1, 2560)
    assert (out["doc_3"]["seq_idx"], out["doc_3"]["fill"]) == (2, 3)


def test_caption_ocr_agreement_by_hand(spark):
    def ocr(ref, text, off):
        return {"kind": "ocr", "text": text, "media_ref": ref, "offset": off}

    def media(ref, off):
        return {"kind": "frame", "text": None, "media_ref": ref, "offset": off}

    rows = [
        (
            "doc_a",
            [
                _span("asr", "Alpha beta gamma", 100),
                media("f1", 105),  # caption = nearest asr
                ocr("f1", "beta GAMMA delta", 105),
                media("f2", 300),  # no OCR on f2
            ],
        ),
        # frames but no ASR → no rows (caption_pairs contract)
        ("doc_b", [media("g1", 0), ocr("g1", "words", 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {
        r["media_ref"]: r.asDict()
        for r in MM.caption_ocr_agreement(docs).collect()
    }
    assert set(out) == {"f1", "f2"}  # doc_b emits nothing
    a = out["f1"]
    # ctoks {alpha,beta,gamma}, otoks {beta,gamma,delta} → 2 shared / 4
    assert (a["n_caption_toks"], a["n_ocr_toks"], a["n_shared"]) == (3, 3, 2)
    assert a["agreement_bp"] == 5000
    assert a["caption"] == "Alpha beta gamma"
    b = out["f2"]
    assert (b["n_ocr_toks"], b["n_shared"], b["agreement_bp"]) == (0, 0, 0)


FULL_SCHEMA = SPAN_SCHEMA + (
    ", span_attrs array<struct<end_ms:int,confidence:double,"
    "bbox:array<double>,scene_id:int,n_words:int,"
    "words:array<struct<word:string,start_ms:int,end_ms:int,score:double>>>>"
)


def test_asr_quality_flags(spark):
    from graphical_context_extraction_pipeline_spark.operators.relational import (
        asr_quality,
    )

    def attr(end_ms, words):
        return {
            "end_ms": end_ms,
            "confidence": 0.9,
            "bbox": None,
            "scene_id": 0,
            "n_words": len(words),
            "words": words,
        }

    def w(word, score):
        return {"word": word, "start_ms": 0, "end_ms": 100, "score": score}

    rows = [
        # 150 words over 60 s → wpm 150 (ok); scores 0.8 → mean 8000 (ok)
        (
            "doc_ok",
            [_span("asr", "t", 0)],
            [attr(60000, [w(f"a{i}", 0.8) for i in range(150)])],
        ),
        # 10 words over 60 s → wpm 10 < 80 → rate fail
        (
            "doc_slow",
            [_span("asr", "t", 0)],
            [attr(60000, [w(f"b{i}", 0.9) for i in range(10)])],
        ),
        # rate ok but scoreless words → mean sentinel −1, conf fail
        (
            "doc_unscored",
            [_span("asr", "t", 0)],
            [attr(60000, [w(f"c{i}", None) for i in range(150)])],
        ),
        # no word detail at all → no row
        ("doc_bare", [_span("asr", "t", 0)], [attr(60000, [])]),
    ]
    docs = spark.createDataFrame(rows, FULL_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in asr_quality(docs).collect()}
    assert set(out) == {"doc_ok", "doc_slow", "doc_unscored"}
    assert out["doc_ok"]["wpm"] == 150 and out["doc_ok"]["keep"] is True
    assert out["doc_ok"]["mean_score_e4"] == 8000
    assert out["doc_slow"]["wpm"] == 10 and not out["doc_slow"]["ok_rate"]
    u = out["doc_unscored"]
    assert u["ok_rate"] and u["mean_score_e4"] == -1 and not u["ok_conf"]
    assert u["keep"] is False


def test_interleave_plans_are_minimal(fixture_docs):
    st = MM.interleave_stats(fixture_docs)
    assert count_exchanges(st) == 0, physical_plan(st)
    gate = MM.interleave_gate(fixture_docs)
    assert count_exchanges(gate) == 0, physical_plan(gate)
    # one partial-agg groupBy over the exploded pairs, nothing else
    kt = MM.kind_transitions(fixture_docs)
    plan = physical_plan(kt)
    assert count_exchanges(kt) == 1, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    # the composed chains never degrade to a cartesian or row-Python
    for df in (MM.mm_curate(fixture_docs), MM.mm_pack(fixture_docs)):
        p = physical_plan(df)
        assert "CartesianProduct" not in p and "BatchEvalPython" not in p, p
