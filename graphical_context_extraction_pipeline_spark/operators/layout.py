"""PDF/layout-parse heuristics over the OCR block geometry.

The BASELINE north rule names "PDF/layout parse, DOM heuristics" as
first-class extraction capabilities. The reference pipeline consumes OCR
blocks with pixel bboxes (reference: phase 1/src/extract/ocr.py — 4-point
polygon → rect) but only ever sorts them by (y, x); this module adds the
layout-analysis pass a PDF/scan extraction pipeline performs on the same
geometry:

- **column detection** — classic recursive-XY-cut degenerate case: split a
  page at a vertical midline by block x-center (two-column scientific/PDF
  layout);
- **reading order** — column-major (column, y, x) order, the order a human
  reads a multi-column page, as opposed to the raw (y, x) used for
  single-column frames;
- **paragraph grouping** — consecutive blocks in reading order merge into
  one paragraph while the vertical gap stays ≤ ``PARA_GAP_PX`` and the
  column does not change (whitespace-gap segmentation, the standard
  docstrum/XY-cut stopping rule);
- **heading detection** — blocks ≥ 1.5× the mean block height of their
  frame (font-size proxy; pure integer comparison so both engines agree).

All three operators are **zero-shuffle, zero-Python**: the spans already
arrive one row per document, so sorting, indexing and grouping happen
intra-row with higher-order functions, then explode. At 10^12 documents
the plan is scan → project → generate: embarrassingly parallel, no
Exchange, no skew sensitivity beyond per-document span width (bounded by
the media contract).

Intra-row grouping is O(n) per document, NOT an ``aggregate`` fold: a fold
that appends to its accumulator array copies the array every step — O(n²)
per row, measured 4.9 s for the paragraph pass over sf0.1's skew documents
(~6k blocks each) vs 0.4 s for this formulation. Instead, group boundaries
are computed positionally on the sorted array (``element_at(arr, i)`` vs
``element_at(arr, i-1)`` is O(1) random access), boundary indexes pair
into [start, end) segments via ``consecutive_pairs``, and each group is a
single ``slice`` — total work linear in the block count.

Floats never decide anything: pixel coordinates are 2-decimal by contract,
so every comparison runs on ``round(v * 100)`` integers (e2 fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import bind, segments as _segments, zip_spans

# Frame width is 1280 by the media contract (datagen bbox ranges mirror the
# reference's 720p frames); the column split sits at the midline.
COLUMN_MIDLINE_X = 640.0
# Paragraph break: vertical whitespace between consecutive blocks in the
# same column exceeding this many pixels starts a new paragraph.
PARA_GAP_PX = 60.0
# Heading: block height ≥ 3/2 × mean block height of its frame.
HEADING_NUM, HEADING_DEN = 3, 2

_BLOCK_T = (
    "struct<media_ref:string,col:bigint,y1_e2:bigint,x1_e2:bigint,"
    "offset:bigint,y2_e2:bigint,h_e2:bigint,text:string>"
)


def _e2(v):
    """round(v*100) as a long — WITHOUT F.round, whose double path allocates
    a BigDecimal per call (measured 3.0 → 1.7 s on the sf0.1 block explode
    with 6 rounds per block). floor(x + 0.5) via long cast is identical for
    the non-negative pixel coordinates of the media contract and matches
    DuckDB's round-half-away on the same values."""
    return (v * 100 + F.lit(0.5)).cast("long")


def _sorted_blocks(midline: float):
    """Per-document array of OCR blocks with geometry in e2 fixed point,
    sorted in column-major reading order (media_ref, col, y1, x1, offset).

    ``offset`` is the span offset (frame ts + arrival), unique per
    (doc, frame) by construction, so the sort key is total and both engines
    order identically.
    """
    z = F.filter(
        zip_spans(("bbox",)),
        lambda b: (b["s"]["kind"] == "ocr")
        & b["bbox"].isNotNull()
        & (F.size(b["bbox"]) == 4)
        & b["s"]["text"].isNotNull(),
    )

    def rec(b):
        x1, y1 = F.element_at(b["bbox"], 1), F.element_at(b["bbox"], 2)
        x2, y2 = F.element_at(b["bbox"], 3), F.element_at(b["bbox"], 4)
        col = (
            F.when(_e2(x1) + _e2(x2) < F.lit(int(round(2 * midline * 100))), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            F.coalesce(b["s"]["media_ref"], F.lit("")).alias("media_ref"),
            col.alias("col"),
            _e2(y1).alias("y1_e2"),
            _e2(x1).alias("x1_e2"),
            b["s"]["offset"].cast("long").alias("offset"),
            _e2(y2).alias("y2_e2"),
            (_e2(y2) - _e2(y1)).alias("h_e2"),
            b["s"]["text"].alias("text"),
        ).cast(_BLOCK_T)

    return F.array_sort(F.transform(z, rec))




def _frame_start(arr, i):
    # element_at(arr, 0) raises under ANSI semantics and SQL OR does not
    # short-circuit — gate the i-1 access behind a CASE branch instead.
    return F.when(i == 1, F.lit(True)).otherwise(
        F.element_at(arr, i)["media_ref"] != F.element_at(arr, i - 1)["media_ref"]
    )


def reading_order(docs: DataFrame, midline: float = COLUMN_MIDLINE_X) -> DataFrame:
    """Column-major reading order per frame.

    Output one row per OCR block: (doc_id, media_ref, block_idx, col,
    y1_e2, x1_e2, text) where ``block_idx`` restarts at 0 for each frame
    and counts in (col, y1, x1) order — the order a two-column page is
    read.

    Plan: single scan of (doc_id, spans{kind,text,media_ref,offset},
    span_attrs.bbox), intra-row sort + positional frame segmentation,
    Generate. Zero exchanges, O(blocks) per document.
    """

    def indexed(arr):
        return F.flatten(
            F.transform(
                _segments(arr, _frame_start),
                lambda seg: F.transform(
                    F.sequence(seg["a"], seg["b"] - 1),
                    lambda j: F.struct(
                        F.element_at(arr, j).alias("blk"),
                        (j - seg["a"]).cast("long").alias("block_idx"),
                    ),
                ),
            )
        )

    out = bind(
        _sorted_blocks(midline),
        lambda arr: F.when(F.size(arr) > 0, indexed(arr)).otherwise(
            F.array().cast(f"array<struct<blk:{_BLOCK_T},block_idx:bigint>>")
        ),
    )
    return docs.select("doc_id", F.explode(out).alias("b")).select(
        "doc_id",
        F.col("b.blk.media_ref").alias("media_ref"),
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.blk.col").alias("col"),
        F.col("b.blk.y1_e2").alias("y1_e2"),
        F.col("b.blk.x1_e2").alias("x1_e2"),
        F.col("b.blk.text").alias("text"),
    )


def paragraphs(
    docs: DataFrame,
    midline: float = COLUMN_MIDLINE_X,
    gap_px: float = PARA_GAP_PX,
) -> DataFrame:
    """Whitespace-gap paragraph grouping in reading order.

    Consecutive blocks merge into one paragraph while they share a frame
    AND a column AND the vertical gap (next.y1 − previous block's y2) is
    ≤ ``gap_px`` — the docstrum/XY-cut inter-line-gap stopping rule, stated
    on the PREVIOUS BLOCK (not a running max) so the grouping is exactly a
    lag + conditional-sum in SQL. Output one row per paragraph: (doc_id,
    media_ref, col, para_idx, n_blocks, y_top_e2, y_bottom_e2, para_text)
    with ``para_idx`` the document-wide paragraph ordinal in reading order,
    ``y_bottom_e2`` the max block bottom, and ``para_text`` the
    space-joined block texts.

    Same zero-shuffle shape as :func:`reading_order`: paragraph boundaries
    are positional starter flags, each paragraph is one slice — O(blocks)
    per document.
    """
    gap_e2 = int(round(gap_px * 100))
    para_t = (
        "struct<media_ref:string,col:bigint,n_blocks:bigint,y_top_e2:bigint,"
        "y_bottom_e2:bigint,para_text:string>"
    )

    def para_start(arr, i):
        cur, prev = F.element_at(arr, i), F.element_at(arr, i - 1)
        return F.when(i == 1, F.lit(True)).otherwise(
            (cur["media_ref"] != prev["media_ref"])
            | (cur["col"] != prev["col"])
            | (cur["y1_e2"] - prev["y2_e2"] > F.lit(gap_e2))
        )

    def emit(arr):
        def para(seg):
            return bind(
                F.slice(arr, seg["a"], seg["b"] - seg["a"]),
                lambda sl: F.struct(
                    F.element_at(sl, 1)["media_ref"].alias("media_ref"),
                    F.element_at(sl, 1)["col"].alias("col"),
                    F.size(sl).cast("long").alias("n_blocks"),
                    F.element_at(sl, 1)["y1_e2"].alias("y_top_e2"),
                    F.array_max(F.transform(sl, lambda b: b["y2_e2"])).alias("y_bottom_e2"),
                    F.array_join(F.transform(sl, lambda b: b["text"]), " ").alias("para_text"),
                ).cast(para_t),
            )

        return F.transform(_segments(arr, para_start), para)

    paras = bind(
        _sorted_blocks(midline),
        lambda arr: F.when(F.size(arr) > 0, emit(arr)).otherwise(
            F.array().cast(f"array<{para_t}>")
        ),
    )
    return docs.select("doc_id", F.posexplode(paras).alias("para_idx", "p")).select(
        "doc_id",
        F.col("p.media_ref").alias("media_ref"),
        F.col("p.col").alias("col"),
        F.col("para_idx").cast("long").alias("para_idx"),
        F.col("p.n_blocks").alias("n_blocks"),
        F.col("p.y_top_e2").alias("y_top_e2"),
        F.col("p.y_bottom_e2").alias("y_bottom_e2"),
        F.col("p.para_text").alias("para_text"),
    )


def headings(docs: DataFrame, midline: float = COLUMN_MIDLINE_X) -> DataFrame:
    """Font-size-proxy heading detection: a block is a heading when its
    height is ≥ 3/2 × the mean block height of its frame (and the frame has
    ≥ 2 blocks — a single block can never clear 1.5× its own mean).

    The per-frame mean never materializes as a float: the predicate is
    ``2 · h · n_frame ≥ 3 · Σh_frame`` on e2 integers, so Spark and the
    DuckDB oracle agree bit-for-bit.

    Zero-shuffle and O(blocks): frames are the positional segments of the
    sorted array, each frame's (Σh, n) is computed once on its slice, and
    the slice's blocks are filtered against those totals in place. Output:
    (doc_id, media_ref, col, y1_e2, x1_e2, h_e2, n_blocks_frame,
    sum_h_e2_frame, text).
    """
    head_t = (
        "struct<media_ref:string,col:bigint,y1_e2:bigint,x1_e2:bigint,h_e2:bigint,"
        "n_blocks_frame:bigint,sum_h_e2_frame:bigint,text:string>"
    )

    def emit(arr):
        def frame_heads(seg):
            return bind(
                F.slice(arr, seg["a"], seg["b"] - seg["a"]),
                lambda sl: bind(
                    F.struct(
                        F.size(sl).cast("long").alias("n"),
                        F.aggregate(
                            F.transform(sl, lambda b: b["h_e2"]),
                            F.lit(0).cast("long"),
                            lambda s, h: s + h,
                        ).alias("sum_h"),
                    ),
                    lambda tot: F.transform(
                        F.filter(
                            sl,
                            lambda b: (tot["n"] >= 2)
                            & (
                                F.lit(HEADING_DEN) * b["h_e2"] * tot["n"]
                                >= F.lit(HEADING_NUM) * tot["sum_h"]
                            ),
                        ),
                        lambda b: F.struct(
                            b["media_ref"].alias("media_ref"),
                            b["col"].alias("col"),
                            b["y1_e2"].alias("y1_e2"),
                            b["x1_e2"].alias("x1_e2"),
                            b["h_e2"].alias("h_e2"),
                            tot["n"].alias("n_blocks_frame"),
                            tot["sum_h"].alias("sum_h_e2_frame"),
                            b["text"].alias("text"),
                        ).cast(head_t),
                    ),
                ),
            )

        return F.flatten(F.transform(_segments(arr, _frame_start), frame_heads))

    heads = bind(
        _sorted_blocks(midline),
        lambda arr: F.when(F.size(arr) > 0, emit(arr)).otherwise(
            F.array().cast(f"array<{head_t}>")
        ),
    )
    return docs.select("doc_id", F.explode(heads).alias("h")).select(
        "doc_id",
        F.col("h.media_ref").alias("media_ref"),
        F.col("h.col").alias("col"),
        F.col("h.y1_e2").alias("y1_e2"),
        F.col("h.x1_e2").alias("x1_e2"),
        F.col("h.h_e2").alias("h_e2"),
        F.col("h.n_blocks_frame").alias("n_blocks_frame"),
        F.col("h.sum_h_e2_frame").alias("sum_h_e2_frame"),
        F.col("h.text").alias("text"),
    )
