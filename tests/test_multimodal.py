"""Interleaved text+media construction (operators/multimodal.py):
nearest-caption tie-breaks, sequence order/counters, degenerate docs."""

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators import multimodal as MM


def _span(kind, text=None, ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": offset}


def _doc(spark, spans, doc_id="d1"):
    attrs = [
        {"end_ms": None, "confidence": None, "bbox": None, "scene_id": None,
         "n_words": None, "words": None}
        for _ in spans
    ]
    return spark.createDataFrame([(doc_id, spans, attrs, None)], SPANS_DDL)


def test_caption_nearest_and_tiebreak(spark):
    doc = _doc(
        spark,
        [
            _span("asr", text="early words", offset=1000),
            _span("asr", text="late words", offset=5000),
            _span("frame", ref="f/a.jpg", offset=1800),  # closer to early (800 vs 3200)
            _span("frame", ref="f/b.jpg", offset=3000),  # tie (2000 both) → earlier ts
        ],
    )
    got = {r.media_ref: r for r in MM.caption_pairs(doc).collect()}
    assert got["f/a.jpg"].caption == "early words"
    assert got["f/a.jpg"].distance_ms == 800
    assert got["f/b.jpg"].caption == "early words"  # tie broken to earlier caption_ts
    assert got["f/b.jpg"].caption_ts == 1000


def test_caption_no_text_emits_nothing(spark):
    doc = _doc(spark, [_span("frame", ref="f/a.jpg", offset=100)])
    assert MM.caption_pairs(doc).count() == 0


def test_mm_sequence_order_and_counts(spark):
    doc = _doc(
        spark,
        [
            _span("frame", ref="f/b.jpg", offset=2000),
            _span("asr", text="hello world", offset=1000),
            _span("ocr", text="chrome junk", offset=1500),  # structural → skipped
            _span("asr", text="bye", offset=3000),
        ],
    )
    row = MM.mm_sequence(doc).collect()[0]
    assert row.mm_text == "hello world <image> bye"
    assert row.n_text_tokens == 3
    assert row.n_media == 1
    assert row.n_items == 3


def test_mm_sequence_same_offset_text_before_image(spark):
    # W7 priority: asr(2) < frame(3) at equal offsets
    doc = _doc(
        spark,
        [
            _span("frame", ref="f/a.jpg", offset=1000),
            _span("asr", text="tied", offset=1000),
        ],
    )
    assert MM.mm_sequence(doc).collect()[0].mm_text == "tied <image>"


def test_mm_sequence_empty_doc_row_survives(spark):
    doc = _doc(spark, [])
    row = MM.mm_sequence(doc).collect()[0]
    assert row.mm_text == "" and row.n_items == 0
    null_doc = spark.createDataFrame([("dn", None, None, None)], SPANS_DDL)
    assert MM.mm_sequence(null_doc).count() == 0
    assert MM.caption_pairs(null_doc).count() == 0
