"""Relational (Catalyst-native) formulations of the pipeline's core
operators — window functions, order-sensitive aggregations, interval joins —
with zero Python UDFs. These are independently implemented from the pandas
pipeline (operators/extract.py) and are each checked against an ANSI-SQL
DuckDB oracle by the driver.

Why both exist: the pandas pipeline is the zero-shuffle production path for
whole-document processing; these relational forms prove the same semantics
compose from Spark primitives (and give Catalyst room to push down/prune
when only one facet is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_SCENE_MS = 5000
OCR_CONF_MIN = 0.5

KIND_PRIORITY_SQL = (
    "CASE kind WHEN 'chapter' THEN 0 WHEN 'scene' THEN 1 WHEN 'asr' THEN 2 "
    "WHEN 'frame' THEN 3 ELSE 4 END"
)


def _zipped(docs: DataFrame, kind: str, attrs: tuple[str, ...] = ("end_ms",)) -> DataFrame:
    """One row per span of ``kind`` with the NAMED attr fields zipped in as
    z.<field> — attr fields ride as individually extracted arrays so the
    parquet scan prunes span_attrs to exactly those fields (see
    functions.exprs.zip_spans for why the raw-column zip must not return)."""
    from ..functions.exprs import zip_spans

    return (
        docs.select("doc_id", F.explode(zip_spans(attrs)).alias("z"))
        .where(F.col("z.s.kind") == kind)
    )


def scenes_view(docs: DataFrame) -> DataFrame:
    return _zipped(docs, "scene").select(
        "doc_id",
        F.split(F.col("z.s.text"), ":")[0].cast("long").alias("sid"),
        F.col("z.s.offset").cast("long").alias("st"),
        F.col("z.end_ms").cast("long").alias("en"),
    )


def chunk_segmentation(docs: DataFrame) -> DataFrame:
    """W1 as a window cumsum: a scene starts a new chunk iff it is the first
    of its doc or ≥ MIN_SCENE_MS long; chunk id = running starter count.
    (Works because the reference's running merge only ever extends the
    immediately-previous chunk — reference: phase 2/src/chunker.py:104-150.)
    """
    sc = scenes_view(docs)
    w = Window.partitionBy("doc_id").orderBy("st", "en", "sid")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    starter = (F.row_number().over(w) == 1) | ((F.col("en") - F.col("st")) >= MIN_SCENE_MS)
    return (
        sc.withColumn("chunk_seq", F.sum(starter.cast("long")).over(wc))
        .groupBy("doc_id", "chunk_seq")
        .agg(
            F.min("st").alias("t_start_ms"),
            # reference semantics: each merge SETS the chunk end to the
            # merged scene's end, so the final end is the LAST scene's en in
            # (st, en, sid) order — not max(en); they differ when scenes
            # overlap (found by relational-vs-kernel fuzzing)
            F.max_by("en", F.struct("st", "en", "sid")).alias("t_end_ms"),
            F.min_by("sid", F.struct("st", "en", "sid")).alias("primary_scene"),
            F.count("*").cast("long").alias("n_merged"),
        )
    )


def chunk_asr_text(docs: DataFrame) -> DataFrame:
    """A10+J1: order-sensitive per-chunk ASR concat via inclusive interval
    overlap (boundary-touching segments duplicate into both chunks)."""
    chunks = chunk_segmentation(docs)
    asr = _zipped(docs, "asr").select(
        "doc_id",
        F.col("z.s.offset").cast("long").alias("st"),
        F.col("z.end_ms").cast("long").alias("en"),
        F.col("z.s.text").alias("text"),
    )
    j = chunks.join(asr, "doc_id").where(
        (F.col("en") >= F.col("t_start_ms")) & (F.col("st") <= F.col("t_end_ms"))
    )
    ordered = F.array_sort(F.collect_list(F.struct("st", "en", "text")))
    return j.groupBy("doc_id", "chunk_seq").agg(
        F.array_join(F.transform(ordered, lambda s: s["text"]), " ").alias("asr_text"),
        F.count("*").cast("long").alias("n_segments"),
    )


def chunk_chapter_assign(docs: DataFrame) -> DataFrame:
    """J4: broadcast interval-containment join of chunk starts against the
    chapter dimension; fallback to the doc's last chapter."""
    chunks = chunk_segmentation(docs)
    ch_w = Window.partitionBy("doc_id").orderBy("st")
    chapters = (
        _zipped(docs, "chapter")
        .select(
            "doc_id",
            F.col("z.s.text").alias("title"),
            F.col("z.s.offset").cast("long").alias("st"),
            F.col("z.end_ms").cast("long").alias("en"),
        )
        .withColumn("chapter_index", F.row_number().over(ch_w) - 1)
    )
    contained = (
        chunks.join(F.broadcast(chapters), "doc_id")
        .where((F.col("st") <= F.col("t_start_ms")) & (F.col("t_start_ms") < F.col("en")))
        .groupBy("doc_id", "chunk_seq")
        .agg(F.min("chapter_index").alias("ci"))
    )
    last_ch = chapters.groupBy("doc_id").agg(
        F.max("chapter_index").alias("li"), F.max_by("title", "chapter_index").alias("lt")
    )
    titles = chapters.select(
        F.col("doc_id").alias("t_doc"), F.col("chapter_index").alias("t_ci"), "title"
    )
    return (
        chunks.join(contained, ["doc_id", "chunk_seq"], "left")
        .join(F.broadcast(last_ch), "doc_id", "left")
        .withColumn("chapter_index", F.coalesce("ci", "li", F.lit(0)).cast("long"))
        .join(
            F.broadcast(titles),
            (F.col("chapter_index") == F.col("t_ci")) & (F.col("doc_id") == F.col("t_doc")),
            "left",
        )
        .select(
            "doc_id",
            "chunk_seq",
            "t_start_ms",
            "chapter_index",
            F.coalesce("title", F.lit("Unknown")).alias("chapter_title"),
        )
    )


def span_kind_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def ocr_conf_stats(docs: DataFrame) -> DataFrame:
    """P1+A2: per-doc OCR block counts and exact integer confidence sums
    (confidences are 4-decimal by construction → e4 ints are lossless)."""
    o = _zipped(docs, "ocr", attrs=("confidence",)).select(
        "doc_id", F.round(F.col("z.confidence") * 10000, 0).cast("long").alias("conf_e4")
    )
    return o.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("conf_e4") >= 5000, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("conf_e4") >= 5000, F.col("conf_e4")).otherwise(0)).cast("long").alias("sum_kept_conf_e4"),
    )


def chrome_tokens(docs: DataFrame) -> DataFrame:
    """A1: per-doc UI-chrome tokens — occurrence count ≥ 0.8 × frames-with-OCR
    (occurrences, not distinct frames: quirk pinned from the reference,
    ocr_cleanup.py:48). Integer form: 10·count ≥ 8·total_frames.

    ZERO-shuffle plan: the OCR filter, frame count, tokenization AND the
    per-token occurrence counting all run as array HOFs INSIDE the document
    row — the token array is sorted intra-row and counts come from run-
    boundary detection (first index of each distinct token; run length =
    next start − this start), then the ≥0.8 threshold filters inside the
    row too, so only the handful of surviving chrome tokens is ever
    exploded. This replaces the former explode → groupBy(doc, token)
    formulation whose token-level hash aggregation + shuffle was 28% of the
    benchmark suite wall; per-token state never leaves the row, so there is
    no hot key at any corpus size. Scan-side the parquet reader prunes to
    (doc_id, spans, span_attrs.confidence) — zip_spans keeps the heavy
    `words` arrays out of the scan."""
    from ..functions.exprs import bind as _bind
    from ..functions.exprs import zip_spans

    z = F.filter(
        zip_spans(("confidence",)),
        lambda z: (z["s"]["kind"] == "ocr") & (z["confidence"] >= OCR_CONF_MIN),
    )
    base = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.transform(z, lambda y: y["s"]["media_ref"]))).alias(
            "total_frames"
        ),
        F.flatten(
            F.transform(
                z, lambda y: F.filter(F.split(F.lower(y["s"]["text"]), r"\s+"), lambda t: t != "")
            )
        ).alias("toks"),
    ).where(F.col("total_frames") > 0)

    def run_counts(s):
        # s sorted: run starts where the previous element differs; for
        # idx 0 F.get yields NULL and (idx==0) short-circuits the OR
        starts = F.filter(
            F.transform(s, lambda x, i: F.struct(x.alias("token"), i.alias("idx"))),
            lambda p: (p["idx"] == 0) | (F.get(s, p["idx"] - 1) != p["token"]),
        )
        return _bind(
            starts,
            lambda st: F.transform(
                st,
                lambda p, j: F.struct(
                    p["token"].alias("token"),
                    (F.coalesce(F.get(st, j + 1)["idx"], F.size(s)) - p["idx"])
                    .cast("long")
                    .alias("n_occ"),
                ),
            ),
        )

    counts = _bind(F.array_sort(F.col("toks")), run_counts)
    kept = F.filter(counts, lambda r: r["n_occ"] * 10 >= F.col("total_frames").cast("long") * 8)
    return (
        base.select("doc_id", "total_frames", F.explode(kept).alias("r"))
        .select(
            "doc_id",
            F.col("r.token").alias("token"),
            F.col("r.n_occ").alias("n_occ"),
            F.col("total_frames").cast("long").alias("total_frames"),
        )
    )


def frame_ocr_basename_join(docs: DataFrame) -> DataFrame:
    """J6 + F6 + F9 as a first-class relational form: keyframes associated
    to their OCR blocks by media BASENAME equi join (the reference keys OCR
    results to keyframes through the frame image filename), with the frame
    number re-derived by regex from the basename (reference parses
    ``frame_00042.jpg`` → 42).

    Output per frame: (doc_id, frame_basename, frame_number, ts, n_blocks,
    sum_conf_e4) — LEFT join, so frames with no (conf ≥ 0.5) OCR appear
    with zero blocks.

    Scale: both sides are span streams keyed by (doc_id, basename) — an
    equi join with perfectly co-partitionable keys (doc_id leading), no
    fan-out beyond the true block multiplicity; AQE picks the strategy.
    """
    frames = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "frame")
        .select(
            "doc_id",
            F.substring_index(F.col("s.media_ref"), "/", -1).alias("frame_basename"),
            F.col("s.offset").cast("long").alias("ts"),
        )
        .withColumn(
            "frame_number",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.col("frame_basename"), r"(\d+)", 1), F.lit("")
                ).cast("long"),
                F.lit(-1).cast("long"),
            ),
        )
    )
    ocr = (
        _zipped(docs, "ocr", attrs=("confidence",))
        .where(F.col("z.confidence") >= OCR_CONF_MIN)
        .select(
            "doc_id",
            F.substring_index(F.col("z.s.media_ref"), "/", -1).alias("frame_basename"),
            F.round(F.col("z.confidence") * 10000).cast("long").alias("conf_e4"),
        )
    )
    return (
        frames.join(ocr, ["doc_id", "frame_basename"], "left")
        .groupBy("doc_id", "frame_basename", "frame_number", "ts")
        .agg(
            F.count("conf_e4").cast("long").alias("n_blocks"),
            F.coalesce(F.sum("conf_e4"), F.lit(0)).cast("long").alias("sum_conf_e4"),
        )
    )


NEAR_DUP_BP = 9000  # 0.9 token-set overlap, basis points


def ocr_frame_dedup(docs: DataFrame) -> DataFrame:
    """W2 — the reference's hardest stateful operator (consecutive near-dup
    frame dedup against the last KEPT frame, ocr_cleanup.py:82-115) —
    expressed PURELY relationally: the keep-chain is an ``aggregate`` fold
    over the per-doc frame array, entirely inside the row (zero shuffle,
    zero Python). The DuckDB oracle replays the identical fold with
    ``list_reduce``.

    Semantics per doc: P1-filter OCR blocks (conf ≥ 0.5), group by frame
    path, reading-order concat per frame, frames in (ts, path) order, then:
    ≥90% token-set overlap with the last kept frame → keep the
    higher-confidence of the two (replace-in-place), else append.
    Confidence means are integer e4 (block confs are 4-decimal by
    construction) so the tiebreak is float-free across engines.

    This is the demonstration form — the production path remains the pandas
    kernel (the per-path block grouping here is O(paths·blocks) per row).
    Output: kept frames (doc_id, rank, ts, path, full_text, conf_e4).
    """
    from ..functions.exprs import bind, zip_spans

    # Let-binding discipline (the construction-time duplication trap): the
    # filtered block zip is referenced by the path census AND by every
    # per-path group — unbound it re-evaluates once per path; the per-path
    # blocks feed four statistics; the frame token sets feed the fold's
    # near-dup test, whose predicate gates two branches. Binding each
    # level (and tokenizing every frame ONCE, before the fold, instead of
    # re-tokenizing the last-kept frame at every step) took the sf0.1 wall
    # 40.1 s → ~4 s with identical rows.
    zed = F.filter(
        zip_spans(("confidence", "bbox")),
        lambda y: (y["s"]["kind"] == "ocr")
        & (y["confidence"] >= OCR_CONF_MIN)
        & y["s"]["text"].isNotNull(),
    )

    def toks(txt):
        return F.array_distinct(F.filter(F.split(F.lower(txt), r"\s+"), lambda t: t != ""))

    def over_z(zz):
        paths = F.array_distinct(F.transform(zz, lambda y: y["s"]["media_ref"]))

        def frame_struct(p):
            def over_blocks(blocks):
                ordered = F.array_sort(
                    F.transform(
                        blocks,
                        lambda y: F.struct(
                            F.coalesce(F.element_at(y["bbox"], 2), F.lit(0.0)).alias("y"),
                            F.coalesce(F.element_at(y["bbox"], 1), F.lit(0.0)).alias("x"),
                            y["s"]["text"].alias("text"),
                            (-F.round(y["confidence"] * 10000).cast("long")).alias("negc"),
                        ),
                    )
                )
                n = F.size(blocks)
                conf_e4 = F.floor(
                    F.aggregate(
                        blocks,
                        F.lit(0).cast("long"),
                        lambda acc, y: acc + F.round(y["confidence"] * 10000).cast("long"),
                    )
                    / n
                ).cast("long")
                ts = F.array_min(F.transform(blocks, lambda y: y["s"]["offset"])).cast("long")
                return F.struct(
                    ts.alias("ts"),
                    p.alias("path"),
                    F.array_join(F.transform(ordered, lambda b: b["text"]), " ").alias("text"),
                    conf_e4.alias("conf_e4"),
                )

            return bind(F.filter(zz, lambda y: y["s"]["media_ref"] == p), over_blocks)

        # sort on the original 4-field struct (toks must not join the
        # lexicographic tie-break), THEN attach each frame's token set
        frames = F.transform(
            F.array_sort(F.transform(paths, frame_struct)),
            lambda f: F.struct(
                f["ts"].alias("ts"),
                f["path"].alias("path"),
                f["text"].alias("text"),
                f["conf_e4"].alias("conf_e4"),
                toks(f["text"]).alias("toks"),
            ),
        )

        def step(acc, f):
            last = F.element_at(acc, -1)

            def decide(p):
                replaced = F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(f))
                return (
                    F.when(F.size(acc) == 0, F.array(f))
                    .when(
                        p["near"] & (f["conf_e4"] > F.element_at(acc, -1)["conf_e4"]),
                        replaced,
                    )
                    .when(p["near"], acc)
                    .otherwise(F.concat(acc, F.array(f)))
                )

            # widened before the e4 scale-up: size() is int32 and a
            # pathological frame with >214k distinct tokens would overflow
            denom = F.greatest(
                F.size(f["toks"]).cast("long"), F.size(last["toks"]).cast("long")
            )
            near = (denom > 0) & (
                F.size(F.array_intersect(f["toks"], last["toks"])).cast("long") * 10000
                >= denom * NEAR_DUP_BP
            )
            # the bind evaluates its argument EAGERLY, so the element_at(-1)
            # inside `near` must stay behind a lazy CASE branch for the
            # empty-accumulator first step (ANSI element_at throws on it;
            # the pre-bind form was protected by the decide CASE itself)
            near_guarded = F.when(F.size(acc) > 0, near).otherwise(F.lit(False))
            return bind(F.struct(near_guarded.alias("near")), decide)

        return F.aggregate(
            F.filter(frames, lambda f: f["text"] != ""),
            F.array().cast(
                "array<struct<ts:bigint,path:string,text:string,conf_e4:bigint,"
                "toks:array<string>>>"
            ),
            step,
        )

    kept = bind(zed, over_z)
    return docs.select("doc_id", F.posexplode(kept).alias("rank", "f")).select(
        "doc_id",
        (F.col("rank") + 1).cast("long").alias("rank"),
        F.col("f.ts").alias("ts"),
        F.col("f.path").alias("path"),
        F.col("f.text").alias("full_text"),
        F.col("f.conf_e4").alias("conf_e4"),
    )


def sliding_window_chunks(
    docs: DataFrame, window_ms: int = 30000, stride_ms: int = 15000
) -> DataFrame:
    """Sliding-window chunk segmentation with overlap (north-star
    requirement beyond the reference's scene-fold): windows of
    ``window_ms`` every ``stride_ms``; a span belongs to every window
    containing its offset, so consecutive chunks share boundary context.
    Media_ref anchors are preserved in offset order within each window.

    Plan shape: the span→window fan-out is computed arithmetically per row
    (k ∈ [⌈(offset−window+1)/stride⌉, ⌊offset/stride⌋] clamped to the doc's
    window range) via ``sequence`` + ``explode`` — no join against a window
    dimension, no shuffle before the single per-(doc,window) aggregation.

    Output: (doc_id, win_seq, w_start_ms, w_end_ms, n_spans, n_text_spans,
    text — ordered concat of asr/ocr span text, media_refs — frame/ocr
    anchors in offset order).
    """
    s = docs.select(
        "doc_id",
        F.col("meta.duration_ms").cast("long").alias("dur"),
        F.explode("spans").alias("s"),
    ).where(F.col("dur") > 0)
    k_max = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((F.col("dur") - F.lit(window_ms)) / F.lit(float(stride_ms))).cast("long"),
    )
    o = F.col("s.offset").cast("long")
    k_lo = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((o - F.lit(window_ms) + 1) / F.lit(float(stride_ms))).cast("long"),
    )
    k_hi = F.least(F.floor(o / F.lit(float(stride_ms))).cast("long"), k_max)
    fan = (
        s.select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            o.alias("offset"),
            F.explode(F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi)).otherwise(
                F.array().cast("array<long>")
            )).alias("win_seq"),
        )
    )
    pri = F.expr(KIND_PRIORITY_SQL)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("offset"),
                pri.alias("pri"),
                F.coalesce("text", F.lit("")).alias("t"),
                F.coalesce("media_ref", F.lit("")).alias("m"),
                F.col("kind"),
            )
        )
    )
    return (
        fan.groupBy("doc_id", "win_seq")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("kind").isin("asr", "ocr"), 1).otherwise(0))
            .cast("long")
            .alias("n_text_spans"),
            ordered.alias("ord"),
        )
        .select(
            "doc_id",
            F.col("win_seq").cast("long").alias("win_seq"),
            (F.col("win_seq") * stride_ms).cast("long").alias("w_start_ms"),
            (F.col("win_seq") * stride_ms + window_ms).cast("long").alias("w_end_ms"),
            "n_spans",
            "n_text_spans",
            F.array_join(
                F.transform(
                    F.filter(F.col("ord"), lambda x: x["kind"].isin("asr", "ocr") & (x["t"] != "")),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("text"),
            F.array_join(
                F.transform(F.filter(F.col("ord"), lambda x: x["m"] != ""), lambda x: x["m"]),
                "|",
            ).alias("media_refs"),
        )
    )


def _kind_pri(kind_col):
    return (
        F.when(kind_col == "chapter", 0)
        .when(kind_col == "scene", 1)
        .when(kind_col == "asr", 2)
        .when(kind_col == "frame", 3)
        .otherwise(4)
    )


def sorted_span_rows(spans_arr) -> F.Column:
    """array<span-struct> → array sorted by the W7 stable order
    (offset, kind-priority, text, media_ref), sort keys leading so plain
    ``array_sort`` struct comparison realizes the ordering INSIDE the row."""
    return F.array_sort(
        F.transform(
            spans_arr,
            lambda s: F.struct(
                s["offset"].cast("long").alias("offset"),
                _kind_pri(s["kind"]).alias("pri"),
                F.coalesce(s["text"], F.lit("")).alias("t"),
                F.coalesce(s["media_ref"], F.lit("")).alias("m"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def timeline_interleave(docs: DataFrame) -> DataFrame:
    """W7+O2: globally-ordered per-doc event sequence with the stable
    kind-priority tiebreak (chapter<scene<asr<frame<ocr).

    Zero-shuffle formulation: the per-doc sort happens INSIDE the row
    (``array_sort`` over sort-key-leading structs), and seq comes from
    ``posexplode`` — no window, so the (huge) span stream is never
    shuffled. The previous row_number()-over-doc_id form repartitioned
    every span at 100 TB just to number them."""
    return docs.select(
        "doc_id", F.posexplode(sorted_span_rows(F.col("spans"))).alias("pos", "s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
        (F.col("pos") + 1).cast("long").alias("seq"),
    )


def word_spans(docs: DataFrame) -> DataFrame:
    """Word-level span table: re-emits the contract's per-word ASR detail
    (word, start_ms, end_ms, score — reference phase 2/src/loader.py:12-18,
    ASRSegment.words) as one row per word for downstream consumers
    (word-aligned subtitles, token-time supervision). Segments without word
    detail contribute nothing — the segment-level fallback stays inside the
    chunk confidence (A3, operators/extract.py).

    Zero shuffle: two nested lateral explodes of the already-colocated
    span arrays; scores emitted as e4 fixed-point (round, not floor — the
    contract's scores are 4-decimal by construction so rounding is
    lossless, while floor loses a unit whenever the stored double sits
    just under the decimal, e.g. 0.29 → 2899) with a -1 sentinel for
    scoreless words (the enricher filter's subjects, enricher.py:51-68)
    so every compared column is int/string."""
    seg = _zipped(docs, "asr", attrs=("end_ms", "words")).where(
        F.col("z.words").isNotNull() & (F.size("z.words") > 0)
    ).select(
        "doc_id",
        F.col("z.s.offset").cast("long").alias("seg_start_ms"),
        F.col("z.end_ms").cast("long").alias("seg_end_ms"),
        F.col("z.words").alias("words"),
    )
    return seg.select(
        "doc_id",
        "seg_start_ms",
        "seg_end_ms",
        F.posexplode("words").alias("pos", "w"),
    ).select(
        "doc_id",
        "seg_start_ms",
        "seg_end_ms",
        F.col("pos").cast("long").alias("word_idx"),
        F.col("w.word").alias("word"),
        F.col("w.start_ms").cast("long").alias("start_ms"),
        F.col("w.end_ms").cast("long").alias("end_ms"),
        F.coalesce(
            F.round(F.col("w.score") * 10000, 0).cast("bigint"), F.lit(-1).cast("bigint")
        ).alias("score_e4"),
    )


def asr_quality(
    docs: DataFrame,
    min_wpm: int = 80,
    max_wpm: int = 360,
    min_score_e4: int = 5000,
) -> DataFrame:
    """Speech-corpus quality gate over the word-detailed ASR segments —
    the standard admit filter ASR-derived text corpora run before
    training (speech-rate sanity + word-confidence floor): implausibly
    fast or slow words-per-minute flags hallucinated/looped transcripts,
    a low mean word score flags audio the recognizer guessed through.

    One row per document with ≥1 word-detailed ASR segment:

        (doc_id, n_segments, n_words, speech_ms, wpm, n_scored,
         mean_score_e4, ok_rate, ok_conf, keep)

    - ``speech_ms`` = Σ max(end_ms − offset, 0) over those segments
    - ``wpm`` = (60000·n_words) DIV speech_ms (0 when speech_ms = 0)
    - ``mean_score_e4`` = ⌊Σ round(1e4·score) / n_scored⌋ over scored
      words (−1 sentinel when no word carries a score)
    - ``ok_rate`` = speech_ms > 0 ∧ min_wpm ≤ wpm ≤ max_wpm;
      ``ok_conf`` = n_scored > 0 ∧ mean_score_e4 ≥ min_score_e4;
      ``keep`` = both

    Scale: per-segment statistics are intra-row expressions on the zipped
    scan (span_attrs pruned to end_ms/words); ONE doc_id-keyed partial-agg
    groupBy builds the doc rollup — no window, no second shuffle. All
    divisions floor on non-negative operands (engine-portable)."""
    seg = (
        _zipped(docs, "asr", attrs=("end_ms", "words"))
        .where(F.col("z.words").isNotNull() & (F.size("z.words") > 0))
        .select(
            "doc_id",
            F.greatest(
                F.col("z.end_ms").cast("long") - F.col("z.s.offset").cast("long"),
                F.lit(0).cast("long"),
            ).alias("dur_ms"),
            F.size("z.words").cast("long").alias("n_w"),
            F.aggregate(
                F.col("z.words"),
                F.lit(0).cast("long"),
                lambda acc, w: acc
                + F.coalesce(
                    F.round(w["score"] * 10000, 0).cast("long"), F.lit(0).cast("long")
                ),
            ).alias("sum_e4"),
            F.size(
                F.filter(F.col("z.words"), lambda w: w["score"].isNotNull())
            ).cast("long").alias("n_scored"),
        )
    )
    agg = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("n_w").cast("long").alias("n_words"),
        F.sum("dur_ms").cast("long").alias("speech_ms"),
        F.sum("sum_e4").cast("long").alias("sum_e4"),
        F.sum("n_scored").cast("long").alias("n_scored"),
    )
    wpm = F.when(
        F.col("speech_ms") > 0,
        F.floor(F.col("n_words") * 60000 / F.col("speech_ms")),
    ).otherwise(F.lit(0)).cast("long")
    mean = F.when(
        F.col("n_scored") > 0, F.floor(F.col("sum_e4") / F.col("n_scored"))
    ).otherwise(F.lit(-1)).cast("long")
    out = agg.select(
        "doc_id",
        "n_segments",
        "n_words",
        "speech_ms",
        wpm.alias("wpm"),
        "n_scored",
        mean.alias("mean_score_e4"),
    )
    ok_rate = (
        (F.col("speech_ms") > 0)
        & (F.col("wpm") >= min_wpm)
        & (F.col("wpm") <= max_wpm)
    )
    ok_conf = (F.col("n_scored") > 0) & (F.col("mean_score_e4") >= min_score_e4)
    return out.select(
        "*",
        ok_rate.alias("ok_rate"),
        ok_conf.alias("ok_conf"),
        (ok_rate & ok_conf).alias("keep"),
    )
