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
    from .dedup import _set_jaccard_pairs

    return _set_jaccard_pairs(
        media_ref_postings(docs), min_jaccard_bp, max_docs_per_ref
    )


def media_ref_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle, n_sh): one row per distinct frame-asset hash per
    document — the posting relation media_ref_pairs blocks on, shared with
    the streaming ingest twin (streaming/mmingest.py) so the two regimes
    agree by construction. shingle = xxhash64(media_ref); n_sh = the doc's
    distinct-asset count (the Jaccard denominator's per-doc half). Built
    intra-row (filter + array_distinct over the doc's own spans), zero
    shuffle; docs without frame assets emit nothing."""
    from .dedup import _with_sizes

    rset = F.array_distinct(
        F.transform(
            F.filter(
                F.coalesce(F.col("spans"), F.array().cast(docs.schema["spans"].dataType)),
                lambda s: (s["kind"] == "frame") & s["media_ref"].isNotNull(),
            ),
            lambda s: F.xxhash64(s["media_ref"]),
        )
    )
    return docs.select("doc_id", F.explode(_with_sizes(rset)).alias("z")).select(
        "doc_id", F.col("z.shingle").alias("shingle"), F.col("z.n_sh").alias("n_sh")
    )


MEDIA_KIND = "frame"


def _ordered_kinds(spans):
    """spans → array<struct<off,kind>> in (offset, kind) document order —
    the rendering order of the interleaved sequence. Natural struct
    ordering sorts field-by-field, so no comparator lambda is needed (and
    the datagen contract holds no null offsets/kinds to order)."""
    return F.array_sort(
        F.transform(
            spans,
            lambda s: F.struct(s["offset"].alias("off"), s["kind"].alias("kind")),
        )
    )


def interleave_stats(docs: DataFrame) -> DataFrame:
    """Per-document interleaving profile of the text|media span sequence —
    the diagnostics MMC4 / OBELICS-style interleaved-corpus curation keys
    on (image-wall pages, caption-less galleries, text-only docs).

    Spans are ordered intra-row by (offset, kind); a span is MEDIA when
    ``kind == MEDIA_KIND`` ('frame' — the media_ref-carrying kind), TEXT
    otherwise. One row per non-empty document:

        (doc_id, n_spans, n_text, n_media, media_share_bp, n_runs,
         max_media_run, text_chars, first_class, last_class)

    - ``media_share_bp`` = ⌊10000·n_media / n_spans⌋
    - ``n_runs`` = number of maximal same-class runs (= alternations + 1)
    - ``max_media_run`` = longest consecutive-media run (0 if no media)
    - ``text_chars`` = Σ length(text) over TEXT spans

    Scale: scan → project. Every statistic is an intra-row expression over
    the doc's own spans (run detection via the O(n) ``segments`` primitive
    — no accumulating fold), so the operator is shuffle-free and
    embarrassingly partition-parallel; ties inside (offset, kind) leave
    every output invariant (equal keys ⇒ equal class), so both engines
    agree without a total order. Replaces nothing in the reference — the
    reference's single-video pipeline has no corpus-curation stage; this
    is the interleaved-payload analogue of its coverage report
    (phase 2/src/validate.py)."""
    # The two-step select is single-evaluation as written: st is a named
    # projection attribute, and CollapseProject's is-cheap guard refuses to
    # inline a non-trivial expression referenced by several output columns,
    # so the st.* expansion references ONE evaluation of the profile. (A
    # Generate barrier — explode of a 1-element array — also guarantees it
    # but costs 7x here by breaking codegen fusion; measured at sf0.1.)
    return (
        docs.where(F.size("spans") > 0)
        .select("doc_id", _profile_expr(F.col("spans")).alias("st"))
        .select("doc_id", "st.*")
    )


def _profile_expr(spans_col):
    """The interleave_stats struct as ONE intra-row expression over a spans
    column — shared by interleave_stats and mm_curate (which needs the
    keep decision on the same row as the spans, without a self-join)."""
    from ..functions.exprs import segments

    def over_spans(spans):
        def over_c(carr):
            n = F.size(carr)
            n_media = F.size(F.filter(carr, lambda c: c == 1))
            segs = segments(
                carr,
                lambda a, i: F.when(i == 1, F.lit(True)).otherwise(
                    F.element_at(a, i.cast("int"))
                    != F.element_at(a, (i - 1).cast("int"))
                ),
            )
            media_runs = F.filter(
                segs, lambda s: F.element_at(carr, s["a"].cast("int")) == 1
            )
            max_media_run = F.coalesce(
                F.array_max(
                    F.transform(media_runs, lambda s: (s["b"] - s["a"]).cast("long"))
                ),
                F.lit(0).cast("long"),
            )
            text_chars = F.aggregate(
                F.filter(spans, lambda s: s["kind"] != MEDIA_KIND),
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))),
            )
            cls = lambda c: F.when(c == 1, F.lit("media")).otherwise(F.lit("text"))  # noqa: E731
            return F.struct(
                n.cast("long").alias("n_spans"),
                (n - n_media).cast("long").alias("n_text"),
                n_media.cast("long").alias("n_media"),
                # exact on int64-scale numerators (≤ 1e4·n): floor(a/b) on
                # non-negative operands == DIV, and both stay < 2^53
                F.floor(n_media * 10000 / n).cast("long").alias("media_share_bp"),
                F.size(segs).cast("long").alias("n_runs"),
                max_media_run.alias("max_media_run"),
                text_chars.alias("text_chars"),
                cls(F.element_at(carr, 1)).alias("first_class"),
                cls(F.element_at(carr, -1)).alias("last_class"),
            )

        return bind(
            F.transform(
                _ordered_kinds(spans),
                lambda x: F.when(x["kind"] == MEDIA_KIND, 1).otherwise(0),
            ),
            over_c,
        )

    return bind(spans_col, over_spans)


def _keep_expr(
    st, max_media_share_bp: int, max_run: int, min_text_chars: int
):
    """The gate conjunction over a _profile_expr struct column."""
    return (
        (st["n_text"] >= 1)
        & (st["n_media"] >= 1)
        & (st["media_share_bp"] <= max_media_share_bp)
        & (st["max_media_run"] <= max_run)
        & (st["text_chars"] >= min_text_chars)
    )


def gate_keep_col(
    max_media_share_bp: int = 7000, max_run: int = 4, min_text_chars: int = 200
):
    """The gate's keep decision as ONE column over the spans row, shared by
    mm_curate and the streaming ingest twin. The predicate gets inlined
    into Filters that Catalyst merges with the size(spans) > 0 guard into
    ONE conjunction — and SQL AND does not short-circuit, so the profile
    arithmetic (division by n_spans, element_at on the class array) is
    gated behind a CASE branch (lazily evaluated) to stay empty-row-safe.

    The profile struct is let-bound (``bind``) so the five conjuncts of
    _keep_expr share ONE evaluation of the profile HOF chain — referencing
    the struct expression directly would inline a full copy per conjunct
    (measured 1.62 s vs 0.43 s best-of-3 at sf0.1)."""
    from ..functions.exprs import bind

    return (
        F.when(
            F.size("spans") > 0,
            bind(
                _profile_expr(F.col("spans")),
                lambda st: _keep_expr(
                    st, max_media_share_bp, max_run, min_text_chars
                ),
            ),
        )
        .otherwise(F.lit(False))
    )


def interleave_gate(
    docs: DataFrame,
    max_media_share_bp: int = 7000,
    max_run: int = 4,
    min_text_chars: int = 200,
) -> DataFrame:
    """MMC4/OBELICS-shape keep/drop gate for interleaved documents: per-rule
    boolean columns + the conjunction, one row per non-empty document —
    the same audit-friendly contract as gopher_rules (every rule
    inspectable, the funnel reconstructible from the flags).

        has_text        n_text ≥ 1        (drop pure image galleries)
        has_media       n_media ≥ 1       (drop text-only docs — this gate
                                           curates the INTERLEAVED corpus)
        ok_media_share  media_share_bp ≤ max_media_share_bp
        ok_media_run    max_media_run ≤ max_run  (drop image walls)
        ok_text_len     text_chars ≥ min_text_chars
        keep            AND of the five

    Scale: interleave_stats' shuffle-free scan plus a projection — the
    flags are pure arithmetic on its row, so the gate adds zero exchanges
    and composes with the curation ladder like any other rung."""
    st = interleave_stats(docs)
    flags = {
        "has_text": F.col("n_text") >= 1,
        "has_media": F.col("n_media") >= 1,
        "ok_media_share": F.col("media_share_bp") <= max_media_share_bp,
        "ok_media_run": F.col("max_media_run") <= max_run,
        "ok_text_len": F.col("text_chars") >= min_text_chars,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return st.select(
        "doc_id",
        *[c.alias(k) for k, c in flags.items()],
        keep.alias("keep"),
    )


def kind_transitions(docs: DataFrame) -> DataFrame:
    """Corpus-level first-order kind-transition matrix of the interleaved
    span sequences: (prev_kind, kind, n) over consecutive spans in
    (offset, kind) document order. The 25-cell (5 kinds²) relation answers
    the layout questions interleaved-pretraining recipes ask — how often
    does an image follow text vs pile into galleries, do chapters open
    documents — without materializing any per-doc sequence.

    Scale: pair construction is intra-row (consecutive_pairs — zero
    shuffle before the explode); ONE explode feeds ONE kinds²-bounded
    partial-agg groupBy. Equal (offset, kind) sort keys carry equal kind
    values, so the matrix is permutation-invariant under ties."""
    from ..functions.exprs import consecutive_pairs

    pairs = consecutive_pairs(
        F.transform(_ordered_kinds(F.col("spans")), lambda x: x["kind"])
    )
    return (
        docs.where(F.size("spans") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.a").alias("prev_kind"),
            F.col("p.b").alias("kind"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def mm_curate(
    docs: DataFrame,
    max_media_share_bp: int = 7000,
    max_run: int = 4,
    min_text_chars: int = 200,
    min_jaccard_bp: int = 5000,
) -> DataFrame:
    """End-to-end interleaved-corpus curation — the multimodal twin of
    ``curate.curate_corpus``: the MMC4/OBELICS gate first, then media-axis
    near-dup closure (frame-asset-set Jaccard → connected components) over
    the gate survivors, keeping each cluster's minimum doc_id. One status
    row per non-empty document:

        rejected   failed the interleave gate (never enters dedup)
        media_dup  passed the gate but lost its media-asset cluster
        kept       passed the gate; cluster canonical member or unpaired

    Scale: the gate keep decision is computed ON the spans row (shared
    ``_profile_expr`` — no stats self-join), so the dedup stage's input is
    one filtered scan; pairs ride media_ref_pairs' hot-capped blocking and
    the closure is the O(log n) star default. The only doc_id-keyed join
    is the final left join against the (clustered docs only) membership
    relation — the same shape curate_corpus pins.

    The survivor POSTINGS relation — (doc_id, shingle, n_sh), 8-byte hashes,
    orders of magnitude smaller than the spans it came from — is
    materialized (localCheckpoint) before the pair machinery:
    _set_jaccard_pairs references its input from three sides (hot-asset
    census, the anti-join against it, the all-hot fallback), and the
    closure is iterative besides; without the barrier each reference
    re-evaluates the gate + ref-set extraction over the full spans scan
    (measured 100 s → 8 s for the composed chain at sf0.1). On a real
    cluster this is the natural cache/checkpoint point for the same
    reason."""
    from .cluster import neardup_clusters
    from .dedup import _set_jaccard_pairs

    base = docs.where(F.size("spans") > 0).select(
        "doc_id",
        "spans",
        gate_keep_col(max_media_share_bp, max_run, min_text_chars).alias("keep"),
    )
    posts = media_ref_postings(
        base.where(F.col("keep")).select("doc_id", "spans")
    ).localCheckpoint(eager=True)
    pairs = _set_jaccard_pairs(posts, min_jaccard_bp, 1024)
    clusters = neardup_clusters(pairs).select("doc_id", "component")
    return base.select("doc_id", "keep").join(clusters, "doc_id", "left").select(
        "doc_id",
        F.when(~F.col("keep"), F.lit("rejected"))
        .when(
            F.col("component").isNotNull() & (F.col("component") != F.col("doc_id")),
            F.lit("media_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def mm_pack(
    docs: DataFrame,
    budget: int = 2048,
    image_tokens: int = 64,
    n_buckets: int = 8,
) -> DataFrame:
    """Interleaved sequence packing: mm_sequence rows first-fit packed into
    fixed token-budget training sequences where every ``<image>``
    placeholder costs ``image_tokens`` — the fixed vision-encoder patch
    budget interleaved-pretraining batchers charge per image (LLaVA-style
    n tokens/image), so a media-heavy doc consumes budget even when its
    text is short. One row per document:

        (doc_id, bucket, n_tokens, seq_idx, fill)

    with ``n_tokens = n_text_tokens + image_tokens·n_media`` and
    seq_idx/fill from the same first-fit-sequential fold as
    pack_sequences (oversize docs get singleton bins).

    Scale: mm_sequence's shuffle-free scan computes the cost, docs deal to
    md5 salt buckets, and the inherently sequential reset-on-overflow fold
    runs as the shared Arrow grouped-map kernel (``_firstfit_fold``) —
    text never enters the shuffle, only (doc_id, bucket, cost). The DuckDB
    oracle replays the identical fold as a recursive CTE."""
    from .sampling import _firstfit_fold, hash_bucket

    seq = mm_sequence(docs)
    base = seq.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "pack:", n_buckets).alias("bucket"),
        (F.col("n_text_tokens") + F.lit(image_tokens) * F.col("n_media"))
        .cast("long")
        .alias("n_tokens"),
    )
    return base.groupBy("bucket").applyInPandas(
        _firstfit_fold(budget),
        "doc_id string, bucket long, n_tokens long, seq_idx long, fill long",
    )


def caption_ocr_agreement(docs: DataFrame) -> DataFrame:
    """Per frame: lexical agreement between the mined nearest-ASR caption
    and the frame's own OCR tokens — the engine-independent stand-in for
    CLIP-score image-text alignment filtering (the LAION admit gate):
    low-agreement pairs are the noisy-caption arm a multimodal curation
    pipeline drops or down-weights before (image, caption) training.

    One row per frame span whose document has ≥1 ASR text span:

        (doc_id, media_ref, caption, n_caption_toks, n_ocr_toks,
         n_shared, agreement_bp)

    Tokens are distinct lowercase whitespace tokens (the _TOKS contract);
    agreement_bp = ⌊10000·|C∩O| / |C∪O|⌋ (0 when both sets are empty).
    The caption is caption_pairs' nearest-ASR pick with the identical
    (|Δt|, earlier, lexicographic) tie-break.

    Scale: scan → project → Generate, zero exchanges — caption mining AND
    the per-frame OCR token set are intra-row expressions over the doc's
    own spans (O(F·(T+B)) per document, the caption_pairs contract); the
    production path for unbounded documents is the extraction kernel's
    searchsorted, this is the relational form."""
    z = F.col("spans")
    texts = F.filter(
        z, lambda s: (s["kind"] == "asr") & s["text"].isNotNull() & (s["text"] != "")
    )
    frames = F.filter(z, lambda s: (s["kind"] == "frame") & s["media_ref"].isNotNull())
    ocrs = F.filter(
        z,
        lambda s: (s["kind"] == "ocr")
        & s["media_ref"].isNotNull()
        & s["text"].isNotNull(),
    )

    def toks(t):
        return F.array_distinct(
            F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")
        )

    def per_frame(fr, ts, ocr_spans):
        # Each intermediate (nearest caption, the two token sets, the
        # intersection) is let-bound before anything references it twice:
        # referencing the raw expression would duplicate the whole subtree
        # per reference at CONSTRUCTION time — the agreement arithmetic
        # alone touches the caption-token set 3x and the intersection 3x,
        # compounding to ~10 evaluations of the O(T)+O(B·w) chains per
        # frame (measured 26.6 s → expected few s at sf0.1).
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

        def with_best(b):
            cap = b["caption"]
            ctoks = toks(cap)
            otoks = F.array_distinct(
                F.flatten(
                    F.transform(
                        F.filter(
                            ocr_spans, lambda o: o["media_ref"] == fr["media_ref"]
                        ),
                        lambda o: toks(o["text"]),
                    )
                )
            )

            def with_toks(p):
                shared = F.size(F.array_intersect(p["ct"], p["ot"])).cast("long")

                def with_counts(q):
                    union = q["n_ct"] + q["n_ot"] - q["shared"]
                    return F.struct(
                        fr["media_ref"].alias("media_ref"),
                        q["cap"].alias("caption"),
                        q["n_ct"].alias("n_caption_toks"),
                        q["n_ot"].alias("n_ocr_toks"),
                        q["shared"].alias("n_shared"),
                        F.when(union > 0, F.floor(q["shared"] * 10000 / union))
                        .otherwise(F.lit(0))
                        .cast("long")
                        .alias("agreement_bp"),
                    )

                return bind(
                    F.struct(
                        p["cap"].alias("cap"),
                        F.size(p["ct"]).cast("long").alias("n_ct"),
                        F.size(p["ot"]).cast("long").alias("n_ot"),
                        shared.alias("shared"),
                    ),
                    with_counts,
                )

            return bind(
                F.struct(cap.alias("cap"), ctoks.alias("ct"), otoks.alias("ot")),
                with_toks,
            )

        return bind(best, with_best)

    empty = (
        "array<struct<media_ref:string,caption:string,n_caption_toks:bigint,"
        "n_ocr_toks:bigint,n_shared:bigint,agreement_bp:bigint>>"
    )
    rows = bind(
        texts,
        lambda ts: bind(
            ocrs,
            lambda os_: F.when(
                F.size(ts) > 0, F.transform(frames, lambda fr: per_frame(fr, ts, os_))
            ).otherwise(F.array().cast(empty)),
        ),
    )
    return docs.select("doc_id", F.explode(rows).alias("p")).select("doc_id", "p.*")
