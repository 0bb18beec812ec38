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
intra-row with higher-order functions (the W2 fold idiom from
``relational.ocr_frame_dedup``), then explode. At 10^12 documents the plan
is scan → project → generate: embarrassingly parallel, no Exchange, no
skew sensitivity beyond per-document span width (bounded by the media
contract).

Floats never decide anything: pixel coordinates are 2-decimal by contract,
so every comparison runs on ``round(v * 100)`` integers (e2 fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import bind, zip_spans

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
    return F.round(v * 100).cast("long")


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


def reading_order(docs: DataFrame, midline: float = COLUMN_MIDLINE_X) -> DataFrame:
    """Column-major reading order per frame.

    Output one row per OCR block: (doc_id, media_ref, block_idx, col,
    y1_e2, x1_e2, text) where ``block_idx`` restarts at 0 for each frame
    and counts in (col, y1, x1) order — the order a two-column page is
    read.

    Plan: single scan of (doc_id, spans{kind,text,media_ref,offset},
    span_attrs.bbox), intra-row sort + index fold, Generate. Zero
    exchanges; the per-frame index is a running counter inside the fold
    (no window function, no shuffle).
    """
    acc_t = f"struct<ref:string,i:bigint,out:array<{_BLOCK_T[:-1]},block_idx:bigint>>>"

    def fold(arr):
        def step(acc, b):
            new_i = F.when(b["media_ref"] == acc["ref"], acc["i"] + 1).otherwise(
                F.lit(0).cast("long")
            )
            out_rec = F.struct(
                *[b[f].alias(f) for f in
                  ("media_ref", "col", "y1_e2", "x1_e2", "offset", "y2_e2", "h_e2", "text")],
                new_i.alias("block_idx"),
            )
            return F.struct(
                b["media_ref"].alias("ref"),
                new_i.alias("i"),
                F.concat(acc["out"], F.array(out_rec)).alias("out"),
            ).cast(acc_t)

        init = F.struct(
            F.lit("").alias("ref"),
            F.lit(-1).cast("long").alias("i"),
            F.array().cast(f"array<{_BLOCK_T[:-1]},block_idx:bigint>>").alias("out"),
        ).cast(acc_t)
        return F.aggregate(arr, init, step, lambda acc: acc["out"])

    indexed = bind(_sorted_blocks(midline), fold)
    return docs.select("doc_id", F.explode(indexed).alias("b")).select(
        "doc_id",
        F.col("b.media_ref").alias("media_ref"),
        F.col("b.block_idx").alias("block_idx"),
        F.col("b.col").alias("col"),
        F.col("b.y1_e2").alias("y1_e2"),
        F.col("b.x1_e2").alias("x1_e2"),
        F.col("b.text").alias("text"),
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

    Same zero-shuffle shape as :func:`reading_order`: one fold appends to
    the open paragraph or closes it, explode at the end.
    """
    gap_e2 = int(round(gap_px * 100))
    para_t = (
        "struct<media_ref:string,col:bigint,y_top_e2:bigint,y_bottom_e2:bigint,"
        "y_last_e2:bigint,n_blocks:bigint,para_text:string>"
    )
    acc_t = f"struct<open:boolean,cur:{para_t},out:array<{para_t}>>"

    def fold(arr):
        def mk(b):
            return F.struct(
                b["media_ref"].alias("media_ref"),
                b["col"].alias("col"),
                b["y1_e2"].alias("y_top_e2"),
                b["y2_e2"].alias("y_bottom_e2"),
                b["y2_e2"].alias("y_last_e2"),
                F.lit(1).cast("long").alias("n_blocks"),
                b["text"].alias("para_text"),
            ).cast(para_t)

        def step(acc, b):
            cur = acc["cur"]
            same = (
                acc["open"]
                & (b["media_ref"] == cur["media_ref"])
                & (b["col"] == cur["col"])
                & (b["y1_e2"] - cur["y_last_e2"] <= F.lit(gap_e2))
            )
            merged = F.struct(
                cur["media_ref"].alias("media_ref"),
                cur["col"].alias("col"),
                cur["y_top_e2"].alias("y_top_e2"),
                F.greatest(cur["y_bottom_e2"], b["y2_e2"]).alias("y_bottom_e2"),
                b["y2_e2"].alias("y_last_e2"),
                (cur["n_blocks"] + 1).alias("n_blocks"),
                F.concat_ws(" ", cur["para_text"], b["text"]).alias("para_text"),
            ).cast(para_t)
            return F.struct(
                F.lit(True).alias("open"),
                F.when(same, merged).otherwise(mk(b)).alias("cur"),
                F.when(same | ~acc["open"], acc["out"])
                .otherwise(F.concat(acc["out"], F.array(cur)))
                .alias("out"),
            ).cast(acc_t)

        init = F.struct(
            F.lit(False).alias("open"),
            F.lit(None).cast(para_t).alias("cur"),
            F.array().cast(f"array<{para_t}>").alias("out"),
        ).cast(acc_t)
        return F.aggregate(
            arr,
            init,
            step,
            lambda acc: F.when(
                acc["open"], F.concat(acc["out"], F.array(acc["cur"]))
            ).otherwise(acc["out"]),
        )

    paras = bind(_sorted_blocks(midline), fold)
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

    Zero-shuffle: per-frame Σh and n come from a second intra-row pass over
    the (already column-pruned) block array — ``map`` from media_ref to the
    frame totals via two folds — then each block checks its own frame's
    entry. Output: (doc_id, media_ref, col, y1_e2, x1_e2, h_e2,
    n_blocks_frame, sum_h_e2_frame, text).
    """

    def emit(arr):
        refs = F.array_distinct(F.transform(arr, lambda b: b["media_ref"]))
        totals = F.map_from_arrays(
            refs,
            F.transform(
                refs,
                lambda r: bind(
                    F.filter(arr, lambda b: b["media_ref"] == r),
                    lambda fr: F.struct(
                        F.size(fr).cast("long").alias("n"),
                        F.aggregate(
                            fr, F.lit(0).cast("long"), lambda s, b: s + b["h_e2"]
                        ).alias("sum_h"),
                    ),
                ),
            ),
        )
        return bind(
            totals,
            lambda tm: F.filter(
                F.transform(
                    arr,
                    lambda b: F.struct(
                        b["media_ref"].alias("media_ref"),
                        b["col"].alias("col"),
                        b["y1_e2"].alias("y1_e2"),
                        b["x1_e2"].alias("x1_e2"),
                        b["h_e2"].alias("h_e2"),
                        F.element_at(tm, b["media_ref"])["n"].alias("n_blocks_frame"),
                        F.element_at(tm, b["media_ref"])["sum_h"].alias("sum_h_e2_frame"),
                        b["text"].alias("text"),
                    ),
                ),
                lambda r: (r["n_blocks_frame"] >= 2)
                & (
                    F.lit(HEADING_DEN) * r["h_e2"] * r["n_blocks_frame"]
                    >= F.lit(HEADING_NUM) * r["sum_h_e2_frame"]
                ),
            ),
        )

    heads = bind(_sorted_blocks(midline), emit)
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
