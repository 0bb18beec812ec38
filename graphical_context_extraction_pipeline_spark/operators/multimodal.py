"""Interleaved text+media training-data construction.

The corpus payload is INTERLEAVED documents (text and media spans on one
timeline — the BASELINE graft cell's payload axis). Multimodal training
pipelines consume that interleaving two ways, both built here with
zero-shuffle intra-row expressions:

- :func:`caption_pairs` — (image, caption) pair mining: each frame span is
  paired with the temporally nearest ASR text span (the LAION/alt-text
  recipe transplanted to timeline distance). Deterministic tie-break:
  smaller |Δt| wins, then the earlier text span, then lexicographic text.
- :func:`mm_sequence` — the training-ready flattened sequence per
  document: spans in the W7 stable timeline order, text spans contributing
  their text and frame spans an ``<image>`` placeholder token (the
  interleaved-sequence format of Flamingo/MMC4-style corpora), plus token
  and media counters for packing/budgeting downstream.

Scale: both are scan → project (+Generate for caption_pairs) — no
exchange, no Python. caption_pairs does an O(F·T) intra-row scan per
document (frames × text spans, both bounded by the per-document media
contract); the production path for unbounded documents is the extraction
kernel's searchsorted, this is the relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import bind
from .relational import sorted_span_rows

IMAGE_TOKEN = "<image>"


def caption_pairs(docs: DataFrame) -> DataFrame:
    """One row per frame span: (doc_id, media_ref, frame_ts, caption,
    caption_ts, distance_ms). Documents with frames but no ASR text emit
    nothing (no caption exists)."""
    z = F.col("spans")
    texts = F.filter(
        z, lambda s: (s["kind"] == "asr") & s["text"].isNotNull() & (s["text"] != "")
    )
    frames = F.filter(z, lambda s: (s["kind"] == "frame") & s["media_ref"].isNotNull())

    def pair(fr, ts):
        best = F.array_min(
            F.transform(
                ts,
                lambda t: F.struct(
                    F.abs(t["offset"].cast("long") - fr["offset"].cast("long")).alias(
                        "distance_ms"
                    ),
                    t["offset"].cast("long").alias("caption_ts"),
                    t["text"].alias("caption"),
                ),
            )
        )
        return F.struct(
            fr["media_ref"].alias("media_ref"),
            fr["offset"].cast("long").alias("frame_ts"),
            best["caption"].alias("caption"),
            best["caption_ts"].alias("caption_ts"),
            best["distance_ms"].alias("distance_ms"),
        )

    pairs = bind(
        texts,
        lambda ts: F.when(
            F.size(ts) > 0, F.transform(frames, lambda fr: pair(fr, ts))
        ).otherwise(
            F.array().cast(
                "array<struct<media_ref:string,frame_ts:bigint,caption:string,"
                "caption_ts:bigint,distance_ms:bigint>>"
            )
        ),
    )
    return docs.select("doc_id", F.explode(pairs).alias("p")).select("doc_id", "p.*")


def mm_sequence(docs: DataFrame) -> DataFrame:
    """One row per document: (doc_id, mm_text, n_text_tokens, n_media,
    n_items). ``mm_text`` is the space-joined stream of ASR span texts and
    ``<image>`` placeholders in stable timeline order; other span kinds
    (scene/chapter/ocr) are structural and skipped. n_text_tokens counts
    whitespace tokens of the contributing text (F1 semantics), n_media the
    placeholders."""
    ordered = sorted_span_rows(F.col("spans"))
    items = F.filter(
        ordered,
        lambda s: ((s["kind"] == "asr") & s["text"].isNotNull() & (s["text"] != ""))
        | ((s["kind"] == "frame") & s["media_ref"].isNotNull()),
    )

    def emit(it):
        pieces = F.transform(
            it,
            lambda s: F.when(s["kind"] == "asr", s["text"]).otherwise(F.lit(IMAGE_TOKEN)),
        )
        n_media = F.size(F.filter(it, lambda s: s["kind"] == "frame")).cast("long")
        n_tok = F.aggregate(
            F.filter(it, lambda s: s["kind"] == "asr"),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.size(F.filter(F.split(s["text"], r"\s+"), lambda w: w != "")).cast("long"),
        )
        return F.struct(
            F.array_join(pieces, " ").alias("mm_text"),
            n_tok.alias("n_text_tokens"),
            n_media.alias("n_media"),
            F.size(it).cast("long").alias("n_items"),
        )

    out = bind(items, emit)
    return (
        docs.where(F.col("spans").isNotNull())
        .select("doc_id", out.alias("o"))
        .select(
            "doc_id",
            F.col("o.mm_text").alias("mm_text"),
            F.col("o.n_text_tokens").alias("n_text_tokens"),
            F.col("o.n_media").alias("n_media"),
            F.col("o.n_items").alias("n_items"),
        )
    )


def media_ref_pairs(
    docs: DataFrame, min_jaccard_bp: int = 5000, max_docs_per_ref: int = 1024
) -> DataFrame:
    """Interleaved-document near-dup signal on the MEDIA axis: pairs of
    documents whose frame media_ref sets overlap with Jaccard ≥ threshold
    (basis points) — (doc_a, doc_b, n_shared, n_union, jaccard_bp).
    Re-posted / syndicated pages keep their image assets even when the
    surrounding text is rewritten, a regime the text-shingle family
    (``dedup.ngram_jaccard_pairs``) is blind to; CC-derived multimodal
    corpora (MMC4, OBELICS) dedup on exactly this signal.

    Each doc's distinct ref set is built intra-row (filter + array_distinct
    over its own spans — zero shuffle), hashed to 64-bit keys, and fed to
    the shared blocking machinery (``dedup._set_jaccard_pairs``): hot
    assets — a site logo shared by millions of pages — are dropped from
    blocking at ``max_docs_per_ref`` occupancy with the identical-set
    hub-star fallback, every aggregation buffer bounded. Jaccard on hashed
    distinct refs equals Jaccard on the strings up to 64-bit collisions.
    """
    from .dedup import _set_jaccard_pairs, _with_sizes

    rset = F.array_distinct(
        F.transform(
            F.filter(
                F.coalesce(F.col("spans"), F.array().cast(docs.schema["spans"].dataType)),
                lambda s: (s["kind"] == "frame") & s["media_ref"].isNotNull(),
            ),
            lambda s: F.xxhash64(s["media_ref"]),
        )
    )
    base = docs.select("doc_id", F.explode(_with_sizes(rset)).alias("z")).select(
        "doc_id", F.col("z.shingle").alias("shingle"), F.col("z.n_sh").alias("n_sh")
    )
    return _set_jaccard_pairs(base, min_jaccard_bp, max_docs_per_ref)
