"""Validator analytics — the rebuild of phase 3's deterministic validator
(reference: phase 3/src/validator.py:101-384) as native Spark SQL.

Scale design: everything that is per-document is computed **intra-row** with
higher-order functions over the `spans` array (zero shuffle, whole-stage
codegen); only the final corpus-level rollups (top-k density) shuffle, and
they shuffle pre-aggregated per-doc rows, not spans.

Each function returns a DataFrame with stable aliased columns so the driver
can hash-compare against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYFRAME_GAP_MS = 15000  # reference: phase 3/src/validator.py:258
KEYFRAME_GAP_HIGH_MS = 30000  # severity boundary (validator.py:259)
ASR_GAP_MS = 5000  # reference: phase 3/src/validator.py:283
WINDOW_MS = 5000  # coverage window (phase 3/src/config.py:51)


def _spans_of_kind(kind: str):
    return F.filter(F.col("spans"), lambda s: s["kind"] == F.lit(kind))


def keyframe_gaps(docs: DataFrame) -> DataFrame:
    """W3: consecutive keyframe timestamp gaps > 15 s, severity high > 30 s.

    Intra-row formulation: sort the doc's frame spans inside the row
    (array_sort), pair consecutive elements (the zero-shuffle lead()
    equivalent), filter, explode — the frame stream never shuffles.
    """
    from ..functions.exprs import consecutive_pairs

    frames = F.array_sort(
        F.transform(
            _spans_of_kind("frame"),
            lambda s: F.struct(
                s["offset"].cast("long").alias("ts"),
                F.coalesce(s["media_ref"], F.lit("")).alias("path"),
            ),
        )
    )
    gaps = F.filter(
        consecutive_pairs(frames), lambda p: p["b"]["ts"] - p["a"]["ts"] > KEYFRAME_GAP_MS
    )
    return docs.select("doc_id", F.explode(gaps).alias("g")).select(
        "doc_id",
        F.col("g.a.ts").alias("gap_start_ms"),
        F.col("g.b.ts").alias("gap_end_ms"),
        (F.col("g.b.ts") - F.col("g.a.ts")).alias("gap_ms"),
        F.when(F.col("g.b.ts") - F.col("g.a.ts") > KEYFRAME_GAP_HIGH_MS, "high")
        .otherwise("medium")
        .alias("severity"),
    )


def asr_gaps(docs: DataFrame) -> DataFrame:
    """W4: silence gaps between consecutive ASR segments > 5 s (severity
    low). Same intra-row sort + consecutive-pair shape as W3."""
    from ..functions.exprs import consecutive_pairs

    from ..functions.exprs import zip_spans

    segs = F.array_sort(
        F.transform(
            F.filter(zip_spans(("end_ms",)), lambda z: z["s"]["kind"] == F.lit("asr")),
            lambda z: F.struct(
                z["s"]["offset"].cast("long").alias("start_ms"),
                z["end_ms"].cast("long").alias("end_ms"),
                F.coalesce(z["s"]["text"], F.lit("")).alias("text"),
            ),
        )
    )
    gaps = F.filter(
        consecutive_pairs(segs), lambda p: p["b"]["start_ms"] - p["a"]["end_ms"] > ASR_GAP_MS
    )
    return docs.select("doc_id", F.explode(gaps).alias("g")).select(
        "doc_id",
        F.col("g.a.end_ms").alias("gap_start_ms"),
        F.col("g.b.start_ms").alias("gap_end_ms"),
        (F.col("g.b.start_ms") - F.col("g.a.end_ms")).alias("gap_ms"),
        F.lit("low").alias("severity"),
    )


def coverage(docs: DataFrame) -> DataFrame:
    """W6+A7: tumbling 5 s windows; covered iff an ASR segment overlaps or a
    keyframe falls inside. Entirely intra-row (sequence + exists HOFs) —
    zero shuffle at any scale."""
    from ..functions.exprs import zip_spans

    dur = F.col("meta.duration_ms")
    win_starts = F.sequence(F.lit(0).cast("long"), dur - 1, F.lit(WINDOW_MS).cast("long"))
    asr_zip = F.filter(zip_spans(("end_ms",)), lambda z: z["s"]["kind"] == F.lit("asr"))
    frames = _spans_of_kind("frame")

    def covered(w0):
        w1 = F.least(w0 + WINDOW_MS, dur)
        has_asr = F.exists(
            asr_zip, lambda z: (z["s"]["offset"] < w1) & (z["end_ms"] > w0)
        )
        has_kf = F.exists(frames, lambda s: (s["offset"] >= w0) & (s["offset"] < w1))
        return has_asr | has_kf

    cov_flags = F.transform(win_starts, covered)
    n_windows = F.size(cov_flags)
    n_covered = F.size(F.filter(cov_flags, lambda c: c))
    return docs.where(dur > 0).select(
        "doc_id",
        n_windows.cast("long").alias("n_windows"),
        n_covered.cast("long").alias("n_covered"),
        # basis points as integer — float division never enters the
        # cross-engine comparison contract
        F.floor(n_covered * 10000.0 / n_windows).cast("long").alias("coverage_bp"),
    )


def chapter_counts(docs: DataFrame) -> DataFrame:
    """J7+A8: per-chapter counts of fully-contained scenes, point-in-range
    keyframes, and overlapping ASR segments; chapter coverage flag = 100 iff
    both a keyframe and an ASR segment exist. Intra-row transform over the
    chapter array, then one explode — no join, no shuffle."""
    from ..functions.exprs import zip_spans

    zipped = zip_spans(("end_ms",))
    chapters = F.filter(zipped, lambda z: z["s"]["kind"] == F.lit("chapter"))
    scenes = F.filter(zipped, lambda z: z["s"]["kind"] == F.lit("scene"))
    asr = F.filter(zipped, lambda z: z["s"]["kind"] == F.lit("asr"))
    frames = _spans_of_kind("frame")

    def per_chapter(ch, idx):
        c0 = ch["s"]["offset"]
        c1 = ch["end_ms"]
        n_scenes = F.size(
            F.filter(scenes, lambda z: (z["s"]["offset"] >= c0) & (z["end_ms"] <= c1))
        )
        n_frames = F.size(F.filter(frames, lambda s: (s["offset"] >= c0) & (s["offset"] < c1)))
        n_asr = F.size(F.filter(asr, lambda z: (z["s"]["offset"] < c1) & (z["end_ms"] > c0)))
        return F.struct(
            idx.cast("long").alias("chapter_index"),
            ch["s"]["text"].alias("chapter_title"),
            c0.cast("long").alias("start_ms"),
            c1.cast("long").alias("end_ms"),
            n_scenes.cast("long").alias("n_scenes"),
            n_frames.cast("long").alias("n_frames"),
            n_asr.cast("long").alias("n_asr"),
            ((n_frames > 0) & (n_asr > 0)).alias("covered"),
        )

    return (
        docs.select("doc_id", F.explode(F.transform(chapters, per_chapter)).alias("c"))
        .select("doc_id", "c.*")
    )


def quality_flags(chunks: DataFrame) -> DataFrame:
    """Quality flags per chunk (reference: phase 3/src/validator.py:296-361):
    no_ocr_text / low_ocr_text (<10 chars) / no_visual / no_speech."""
    flags = F.array_compact(
        F.array(
            F.when(F.length("ocr_text") == 0, F.lit("no_ocr_text")),
            F.when((F.length("ocr_text") > 0) & (F.length("ocr_text") < 10), F.lit("low_ocr_text")),
            F.when(~F.col("completeness.has_visual"), F.lit("no_visual")),
            F.when(~F.col("completeness.has_speech"), F.lit("no_speech")),
        )
    )
    return (
        chunks.select("doc_id", "chunk_id", F.explode(flags).alias("flag"))
        .orderBy("chunk_id", "flag")
    )


def density_topk(chunks: DataFrame, k: int = 3) -> DataFrame:
    """O4: per-doc top-k richest and bottom-k thinnest chunks by content
    density score len(asr_text)+len(ocr_text); density = chars/sec,
    reported as density_e6 (micro-chars/sec) via pure INTEGER division so
    the value is bit-identical in any engine. Rank 0 ⇒ not in that top-k
    (non-null so the column stays integral through pandas)."""
    from pyspark.sql import Window

    scored = chunks.select(
        "doc_id",
        "chunk_id",
        (F.length("asr_text") + F.length("ocr_text")).cast("long").alias("content_chars"),
        F.greatest(F.col("t_end_ms") - F.col("t_start_ms"), F.lit(1)).cast("long").alias("dur_ms"),
    ).select(
        "doc_id",
        "chunk_id",
        "content_chars",
        F.expr("content_chars * 1000000000 div dur_ms").alias("density_e6"),
    )
    w_desc = Window.partitionBy("doc_id").orderBy(
        F.desc("content_chars"), F.asc("chunk_id")
    )
    w_asc = Window.partitionBy("doc_id").orderBy(
        F.asc("content_chars"), F.asc("chunk_id")
    )
    return (
        scored.withColumn("rich_rank", F.row_number().over(w_desc))
        .withColumn("thin_rank", F.row_number().over(w_asc))
        .where((F.col("rich_rank") <= k) | (F.col("thin_rank") <= k))
        .select(
            "doc_id",
            "chunk_id",
            "content_chars",
            "density_e6",
            F.when(F.col("rich_rank") <= k, F.col("rich_rank")).otherwise(0).cast("long").alias("rich_rank"),
            F.when(F.col("thin_rank") <= k, F.col("thin_rank")).otherwise(0).cast("long").alias("thin_rank"),
        )
    )


def validation_report(docs: DataFrame, chunks: DataFrame) -> DataFrame:
    """The reference's per-video ValidationReport rollup (phase 3/src/
    validator.py:56-81,101-142) as ONE per-doc row: overall coverage with
    the report generator's pass/partial/fail verdict (report_generator.py:
    80-81 — pass ≥90 %, partial 70-89 %, fail <70 %), gap counts, artifact
    totals, chunk count, and quality-flag count.

    Scale design: every spans-side ingredient (coverage windows, gap
    counts, kind totals) is intra-row over the document's own arrays —
    zero shuffle, whole-stage codegen; the chunk-side ingredients
    aggregate the (already small) chunks relation per doc_id and join back
    along that key — one shuffle each, both map-side combined. n_ocr_blocks
    counts OCR spans at confidence ≥ 0.5, matching what the reference's
    phase-1 writer persists (extract/ocr.py conf filter) and therefore what
    its validator ever sees."""
    from ..functions.exprs import consecutive_pairs, zip_spans
    from .extract import OCR_CONF_MIN

    dur = F.col("meta.duration_ms")
    zipped = zip_spans(("end_ms", "confidence"))
    frames = _spans_of_kind("frame")
    frame_ts = F.array_sort(F.transform(frames, lambda s: s["offset"].cast("long")))
    kf_deltas = F.transform(consecutive_pairs(frame_ts), lambda p: p["b"] - p["a"])
    asr_zip = F.filter(zipped, lambda z: z["s"]["kind"] == F.lit("asr"))
    asr_sorted = F.array_sort(
        F.transform(
            asr_zip,
            lambda z: F.struct(
                z["s"]["offset"].cast("long").alias("start_ms"),
                z["end_ms"].cast("long").alias("end_ms"),
                F.coalesce(z["s"]["text"], F.lit("")).alias("text"),
            ),
        )
    )
    asr_deltas = F.transform(
        consecutive_pairs(asr_sorted), lambda p: p["b"]["start_ms"] - p["a"]["end_ms"]
    )
    ocr_blocks = F.filter(
        zipped,
        lambda z: (z["s"]["kind"] == F.lit("ocr"))
        & z["confidence"].isNotNull()
        & (z["confidence"] >= F.lit(OCR_CONF_MIN)),
    )

    # coverage: same construction as coverage() above
    win_starts = F.sequence(F.lit(0).cast("long"), dur - 1, F.lit(WINDOW_MS).cast("long"))

    def covered(w0):
        w1 = F.least(w0 + WINDOW_MS, dur)
        has_asr = F.exists(
            asr_zip, lambda z: (z["s"]["offset"] < w1) & (z["end_ms"] > w0)
        )
        has_kf = F.exists(frames, lambda s: (s["offset"] >= w0) & (s["offset"] < w1))
        return has_asr | has_kf

    cov_flags = F.transform(win_starts, covered)
    n_windows = F.size(cov_flags)
    n_covered = F.size(F.filter(cov_flags, lambda c: c))
    coverage_bp = F.floor(n_covered * 10000.0 / n_windows).cast("long")

    base = docs.where(dur > 0).select(
        "doc_id",
        dur.cast("long").alias("duration_ms"),
        n_windows.cast("long").alias("n_windows"),
        n_covered.cast("long").alias("n_covered"),
        coverage_bp.alias("coverage_bp"),
        # pct ≥ 90 ⇔ bp ≥ 9000 exactly (floor cannot cross the boundary)
        F.when(coverage_bp >= 9000, "pass")
        .when(coverage_bp >= 7000, "partial")
        .otherwise("fail")
        .alias("verdict"),
        F.size(F.filter(kf_deltas, lambda d: d > KEYFRAME_GAP_MS)).cast("long").alias("n_keyframe_gaps"),
        F.size(F.filter(kf_deltas, lambda d: d > KEYFRAME_GAP_HIGH_MS)).cast("long").alias("n_high_keyframe_gaps"),
        F.size(F.filter(asr_deltas, lambda d: d > ASR_GAP_MS)).cast("long").alias("n_asr_gaps"),
        F.size(frames).cast("long").alias("n_keyframes"),
        F.size(asr_zip).cast("long").alias("n_asr_segments"),
        F.size(ocr_blocks).cast("long").alias("n_ocr_blocks"),
    )

    flag_count = F.size(
        F.array_compact(
            F.array(
                F.when(F.length("ocr_text") == 0, F.lit("no_ocr_text")),
                F.when(
                    (F.length("ocr_text") > 0) & (F.length("ocr_text") < 10),
                    F.lit("low_ocr_text"),
                ),
                F.when(~F.col("completeness.has_visual"), F.lit("no_visual")),
                F.when(~F.col("completeness.has_speech"), F.lit("no_speech")),
            )
        )
    )
    chunk_agg = chunks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(flag_count).cast("long").alias("n_quality_flags"),
    )
    return base.join(chunk_agg, "doc_id", "left").select(
        base["doc_id"],
        "duration_ms",
        "n_windows",
        "n_covered",
        "coverage_bp",
        "verdict",
        "n_keyframe_gaps",
        "n_high_keyframe_gaps",
        "n_asr_gaps",
        "n_keyframes",
        "n_asr_segments",
        "n_ocr_blocks",
        F.coalesce(F.col("n_chunks"), F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce(F.col("n_quality_flags"), F.lit(0)).cast("long").alias("n_quality_flags"),
    )
