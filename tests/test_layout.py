"""PDF/layout-parse heuristics (operators/layout.py): hand-crafted
geometry pinning column split, reading order, the paragraph-gap boundary,
and the integer heading rule."""

import pytest

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators import layout as LY


def _ocr(text, bbox, offset, ref="frames/d/frame_00000.jpg"):
    span = {"kind": "ocr", "text": text, "media_ref": ref, "offset": offset}
    attr = {
        "end_ms": None,
        "confidence": 0.9,
        "bbox": [float(v) for v in bbox],
        "scene_id": None,
        "n_words": None,
        "words": None,
    }
    return span, attr


def _mk(spark, blocks):
    spans, attrs = zip(*blocks)
    return spark.createDataFrame([("d1", list(spans), list(attrs), None)], SPANS_DDL)


def test_reading_order_column_major(spark):
    # two columns: left blocks (center < 640) read before right blocks
    # even when the right block sits higher on the page
    doc = _mk(
        spark,
        [
            _ocr("right-top", [700, 10, 900, 30], 0),
            _ocr("left-low", [100, 500, 300, 520], 1),
            _ocr("left-high", [100, 100, 300, 120], 2),
        ],
    )
    rows = LY.reading_order(doc).orderBy("block_idx").collect()
    assert [r.text for r in rows] == ["left-high", "left-low", "right-top"]
    assert [r.col for r in rows] == [0, 0, 1]
    assert [r.block_idx for r in rows] == [0, 1, 2]


def test_reading_order_midline_boundary(spark):
    # center exactly AT the midline (x1+x2 == 1280) → right column;
    # one e2 unit below → left
    doc = _mk(
        spark,
        [
            _ocr("at-mid", [540, 10, 740, 30], 0),  # center 640.0
            _ocr("below-mid", [539.99, 50, 740, 70], 1),  # center 639.995
        ],
    )
    got = {r.text: r.col for r in LY.reading_order(doc).collect()}
    assert got == {"at-mid": 1, "below-mid": 0}


def test_reading_order_index_restarts_per_frame(spark):
    doc = _mk(
        spark,
        [
            _ocr("a", [10, 10, 100, 30], 0, ref="f/a.jpg"),
            _ocr("b", [10, 50, 100, 70], 1, ref="f/a.jpg"),
            _ocr("c", [10, 10, 100, 30], 2, ref="f/b.jpg"),
        ],
    )
    rows = {(r.media_ref, r.text): r.block_idx for r in LY.reading_order(doc).collect()}
    assert rows == {("f/a.jpg", "a"): 0, ("f/a.jpg", "b"): 1, ("f/b.jpg", "c"): 0}


def test_paragraph_gap_boundary(spark):
    # gap exactly PARA_GAP_PX merges; one pixel more splits.
    doc = _mk(
        spark,
        [
            _ocr("p1a", [10, 100, 100, 120], 0),
            _ocr("p1b", [10, 180, 100, 200], 1),  # gap 60 == PARA_GAP_PX → merge
            _ocr("p2", [10, 261, 100, 280], 2),  # gap 61 → new paragraph
        ],
    )
    rows = LY.paragraphs(doc).orderBy("para_idx").collect()
    assert [r.para_text for r in rows] == ["p1a p1b", "p2"]
    assert rows[0].n_blocks == 2 and rows[0].y_top_e2 == 10000 and rows[0].y_bottom_e2 == 20000


def test_paragraph_splits_on_column_and_frame(spark):
    doc = _mk(
        spark,
        [
            _ocr("left", [10, 100, 100, 120], 0),
            _ocr("right", [700, 110, 900, 130], 1),  # same y-ish, other column
            _ocr("next-frame", [10, 100, 100, 120], 2, ref="f/z.jpg"),
        ],
    )
    assert LY.paragraphs(doc).count() == 3


def test_heading_integer_rule(spark):
    # frame mean height = (60+20+20+20)/4 = 30; heading iff h >= 45:
    # the 60px block qualifies (2*6000*4 >= 3*12000), the rest do not.
    doc = _mk(
        spark,
        [
            _ocr("HEAD", [10, 10, 400, 70], 0),
            _ocr("a", [10, 100, 400, 120], 1),
            _ocr("b", [10, 200, 400, 220], 2),
            _ocr("c", [10, 300, 400, 320], 3),
        ],
    )
    rows = LY.headings(doc).collect()
    assert [r.text for r in rows] == ["HEAD"]
    assert rows[0].h_e2 == 6000 and rows[0].n_blocks_frame == 4


def test_heading_exact_threshold_and_singleton(spark):
    # exactly 1.5× the mean is a heading (>=); a single-block frame never is.
    doc = _mk(
        spark,
        [
            _ocr("at-1.5x", [10, 10, 400, 70], 0),  # h=60
            _ocr("short", [10, 100, 400, 120], 1),  # h=20; mean=40, 60 == 1.5*40
            _ocr("alone", [10, 10, 400, 200], 2, ref="f/solo.jpg"),
        ],
    )
    assert [r.text for r in LY.headings(doc).collect()] == ["at-1.5x"]


def test_layout_empty_and_null(spark):
    empty = spark.createDataFrame([], SPANS_DDL)
    nulls = spark.createDataFrame([("d", None, None, None)], SPANS_DDL)
    for fn in (LY.reading_order, LY.paragraphs, LY.headings):
        assert fn(empty).count() == 0
        assert fn(nulls).count() == 0
