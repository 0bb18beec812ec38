"""Corpus-management operators: snapshot comparison and shape profiling.

A training-data pipeline re-ingests its corpus continuously; these are the
operators that answer "what changed since the last snapshot" and "what does
the length distribution look like" without collecting anything to the
driver. Outputs are integer/string typed for hash-stable oracle comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _tokens


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per doc_id whose
    membership or content changed — status 'added' (only in new),
    'removed' (only in old), or 'changed' (present in both, md5(text)
    differs). Unchanged docs are filtered out, so the result is bounded by
    the churn, not the corpus.

    Scale: each side reduces to (doc_id, 16-byte md5) before the single
    full-outer sort-merge join on doc_id — text never enters the shuffle.
    With both snapshots bucketed by doc_id (the natural layout for an
    append-log corpus) the join is shuffle-free; AQE handles the common
    small-delta case by broadcasting whichever side is an incremental
    batch."""
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    o = old.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        h.alias("h_old"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        h.alias("h_new"),
        F.lit(True).alias("in_new"),
    )
    return (
        o.join(n, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("in_old").isNull(), F.lit("added"))
            .when(F.col("in_new").isNull(), F.lit("removed"))
            .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .where(F.col("status") != "unchanged")
    )


# --- HyperLogLog distinct-token profile -----------------------------------
# m = 256 registers (first 2 hex digits of the token md5); the next 10 hex
# digits are the 40-bit rank value, so rho ∈ [1, 41]. All arithmetic is
# integer fixed point (alpha at e6, power-of-two sums via bit shifts) so the
# DuckDB oracle replays the estimator bit-for-bit.
HLL_M = 256
HLL_VBITS = 40
HLL_ALPHA_E6 = 718_244  # 0.7213 / (1 + 1.079/256) at e6
# A = floor(alpha·m²) — folded to one constant BEFORE the 2^K scale so the
# numerator A·2^K = 6.63e18 stays inside bigint. K=47 keeps every per-bucket
# term 2^(K-rho) ≥ 2^6 exact (rho ≤ 41).
_HLL_A = HLL_ALPHA_E6 * HLL_M * HLL_M // 1_000_000
_HLL_K = 47
# Linear-counting table for the small range (raw ≤ 5m/2 and ≥1 empty
# bucket): lc[V-1] = round(m·ln(m/V)) for V empty buckets. Precomputed ONCE
# in Python and inlined as integer literals into both engines, so the only
# float (ln) never runs inside either engine.
_HLL_LC = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]


def hll_registers(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group HyperLogLog register table over the token stream: one row
    per (group, bucket) with the max rank, rho = 41 − bit_length(v) for the
    40-bit value v sliced from each token's md5 (v = 0 ⇒ rho = 41).

    The register table IS the mergeable sketch: registers of a union corpus
    equal the bucket-wise max of the parts' registers (pinned by test), so
    at 100 TB each ingest increment maintains its own ≤ m-row table and the
    corpus-wide cardinality is a tiny max-merge — no re-scan, no distinct
    shuffle of the token space.

    Scale: one partial-aggregated groupBy; duplicate tokens collapse
    map-side (max is idempotent), so the exchange carries at most
    |groups|·m rows per map partition regardless of corpus size."""
    h = F.md5(F.col("tok"))
    v = F.conv(F.substring(h, 3, 10), 16, 10).cast("long")
    rho = (
        F.when(v == F.lit(0), F.lit(HLL_VBITS + 1))
        .otherwise(F.lit(HLL_VBITS + 1) - F.length(F.bin(v)))
        .cast("long")
    )
    return (
        docs.select(F.col(group_col).alias("grp"), F.explode(_tokens(F.col("text"))).alias("tok"))
        .select(
            "grp",
            F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_distinct(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group distinct-token estimate from the HLL registers: one row
    per group with (n_present, est_distinct).

    raw = A·2^K DIV Σ_j 2^(K − M_j), absent buckets contributing M_j = 0
    (the Flajolet raw estimator; standard error ≈ 1.04/√m ≈ 6.5% at
    m = 256), with the standard small-range switch: when raw ≤ 5m/2 and at
    least one bucket is empty, linear counting m·ln(m/V) is used instead —
    looked up from the precomputed integer table (the ln never runs in
    either engine). Accuracy vs exact distinct is pinned by test; the
    estimator arithmetic is integer-only so the oracle matches exactly."""
    return hll_estimate(hll_registers(docs, group_col), group_col)


def hll_estimate(registers: DataFrame, group_col: str = "source") -> DataFrame:
    """The estimate projection over a register table (as produced by
    :func:`hll_registers`, or max-merged from several) — shared by the
    batch profile and the streaming register maintenance so the two paths
    cannot drift."""
    per = (
        registers.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_present"),
            F.sum(
                F.expr(f"shiftleft(cast(1 as bigint), cast({_HLL_K} - max_rho as int))")
            ).alias("s_present"),
        )
    )
    raw = F.expr(
        f"{_HLL_A * (1 << _HLL_K)} DIV "
        f"(s_present + ({HLL_M} - n_present) * shiftleft(cast(1 as bigint), {_HLL_K}))"
    ).cast("long")
    n_empty = F.lit(HLL_M) - F.col("n_present")
    lc = F.element_at(F.array(*[F.lit(x) for x in _HLL_LC]), n_empty.cast("int"))
    return per.select(
        F.col("grp").alias(group_col),
        "n_present",
        F.when((raw <= F.lit(5 * HLL_M // 2)) & (n_empty >= F.lit(1)), lc)
        .otherwise(raw)
        .cast("long")
        .alias("est_distinct"),
    )


# --- count-min sketch ------------------------------------------------------
CMS_D = 4  # hash rows (Kirsch-Mitzenmacher positions, same family as bloom)


def _cms_positions(tok, w: int):
    """CMS_D deterministic row positions for one token: h1/h2 are 32-bit
    hex slices of md5(tok), pos_i = (h1 + i·h2 + i²) mod w — identical in
    DuckDB so oracles recompute the matrix bit-for-bit."""
    h = F.md5(tok)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.array(*[F.pmod(h1 + i * h2 + i * i, F.lit(w)) for i in range(CMS_D)])


def cms_counts(docs: DataFrame, w: int = 8192) -> DataFrame:
    """Count-min sketch of the corpus token frequencies: the d×w counter
    matrix as a relation (row, pos, cnt) — at most d·w rows regardless of
    corpus size, mergeable by SUM (two increments' sketches add), the
    counting twin of the HLL membership sketch. Use for heavy-hitter
    estimates over a 100 TB corpus without materializing the full
    (token, count) relation: the sketch is the shuffle-bounded summary an
    incremental ingest maintains by adding its own batch matrix.

    Scale: one partial-aggregated groupBy of (row, pos) int pairs — the
    exchange carries at most d·w rows per map partition no matter how many
    tokens the scan produces."""
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    return (
        toks.select(
            F.posexplode(_cms_positions(F.col("tok"), w)).alias("row", "pos")
        )
        .groupBy("row", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, probes: DataFrame, w: int = 8192) -> DataFrame:
    """Point-query the sketch: for each probe token, est = min over the d
    rows of the counter at that row's position — never below the true
    count, above it only by collision mass (≤ 2N/w per row w.h.p.; the
    ≥-true-count side is deterministic and pinned by test).

    ``probes`` is a (tok) relation (typically a short heavy-hitter
    candidate list); the join against the ≤ d·w-row sketch broadcasts the
    sketch side."""
    pr = probes.select(
        "tok", F.posexplode(_cms_positions(F.col("tok"), w)).alias("row", "pos")
    )
    return (
        pr.join(F.broadcast(cms), ["row", "pos"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count"))
    )


def cms_token_estimates(docs: DataFrame, w: int = 8192) -> DataFrame:
    """Demo/gate composition: sketch the corpus once and point-query every
    distinct token — (tok, est_count). At production scale the probe side
    is a short candidate list, not the vocabulary."""
    probes = docs.select(F.explode(_tokens(F.col("text"))).alias("tok")).distinct()
    return cms_estimate(cms_counts(docs, w), probes, w)


def length_histogram(docs: DataFrame) -> DataFrame:
    """Per-source token-length histogram on log2 buckets: bucket k holds
    docs with 2^(k-1) ≤ n_tokens+1 < 2^k (k = bit_length(n_tokens+1), so
    the empty doc lands in bucket 1 and buckets cover all lengths in ~40
    rows per source). Emits doc count and token mass per bucket — the
    profile that sizes sequence-packing budgets and flags truncation tails.

    The bucket is computed as length(bin(n_tokens+1)) — integer bit length,
    identical in DuckDB — rather than floor(log2(·)), which rounds through
    doubles and can land boundary values (exact powers of two) in the wrong
    bucket on one engine but not the other.

    Scale: narrow projection + one partial-aggregated groupBy collapsing to
    |sources|·~40 rows; the scan reads only (source, text)."""
    n_tok = F.size(_tokens(F.col("text"))).cast("long")
    return (
        docs.select(
            "source",
            F.length(F.bin(n_tok + 1)).cast("long").alias("bucket"),
            n_tok.alias("n_tokens"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def forget_docs(docs: DataFrame, forget: DataFrame) -> DataFrame:
    """Right-to-be-forgotten deletion: the corpus minus the requested
    doc_ids — one broadcast-able LEFT ANTI join (the forget set is a
    request batch, orders of magnitude smaller than the corpus). Pair with
    :func:`forget_audit` for the deletion certificate and with the
    write-audit snapshot protocol in pipeline.py so the removal is an
    auditable snapshot commit, not an in-place mutation."""
    return docs.join(forget.select("doc_id").distinct(), "doc_id", "left_anti")


def forget_audit(docs: DataFrame, forget: DataFrame) -> DataFrame:
    """The deletion certificate: one row per REQUESTED doc_id with
    (doc_id, found, text_md5) — md5 of the removed content (proof of what
    was deleted without retaining it) or the 'absent' marker for ids not
    in the corpus (idempotent re-requests, already-deleted docs).

    Scale: the corpus side reduces to (doc_id, md5) before the join and
    the request side broadcasts; emitted rows are bounded by the request
    batch."""
    keyed = docs.select("doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_md5"))
    req = forget.select("doc_id").distinct()
    return (
        req.join(keyed, "doc_id", "left")
        .select(
            "doc_id",
            F.col("text_md5").isNotNull().alias("found"),
            F.coalesce("text_md5", F.lit("absent")).alias("text_md5"),
        )
    )


QUANTILE_PCTS = (25, 50, 75, 90, 99)


def length_quantiles(
    docs: DataFrame,
    pcts: tuple[int, ...] = QUANTILE_PCTS,
    group_col: str = "source",
) -> DataFrame:
    """Exact per-group token-length order statistics WITHOUT an all-values
    aggregation buffer: Q(p) = the smallest v with 100·cum_count(v) ≥ p·n
    (the classic ⌈np⌉-th order statistic, integer arithmetic only).

    Spark's built-in exact ``percentile`` buffers every value per group —
    OOM bait at 10^12 rows. This two-phase histogram form aggregates
    (group, length) frequencies first (partial map-side combine; state =
    |distinct lengths| per group, a few thousand cells regardless of row
    count), then windows over the tiny distinct-value relation. The same
    shape serves any integer-domain column. Emits
    (source, p, value, n_docs).
    """
    v = F.size(_tokens(F.coalesce(F.col("text"), F.lit("")))).cast("long")
    hist = (
        docs.select(F.col(group_col).alias("source"), v.alias("v"))
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "v",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    exploded = cum.select(
        "source", "v", "cum", "n",
        # generators must be top-level expressions (no wrapping cast) —
        # the longs are cast inside the literal array instead
        F.explode(F.array(*[F.lit(int(p)).cast("long") for p in pcts])).alias("p"),
    )
    return (
        exploded.where(F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("source", "p")
        .agg(
            F.min("v").cast("long").alias("value"),
            F.max("n").cast("long").alias("n_docs"),
        )
    )


def corpus_health(docs: DataFrame) -> DataFrame:
    """Per-source operations dashboard — the one-stop rollup a corpus
    owner monitors per ingest: volume (docs, tokens), exact-duplicate
    rate (md5 identity), and quality-gate pass rate (the same
    passes_quality_expr the curation pipeline applies, inline — no
    self-join against a scores table). Emits (source, n_docs, n_unique,
    dup_rate_bp, n_quality, quality_rate_bp, total_tokens).

    One aggregation shuffle; text reduces to (md5, token count, gate
    bit) inside the scan projection. The distinct-count rides AQE's
    distinct-aggregate expansion like domain_stats.
    """
    from .text_analysis import passes_quality_expr

    return (
        docs.select(
            "source",
            F.md5(F.col("text")).alias("h"),
            F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
            passes_quality_expr().cast("long").alias("ok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_unique"),
            F.sum("ok").cast("long").alias("n_quality"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.expr("(10000 * (n_docs - n_unique)) DIV n_docs").cast("long").alias("dup_rate_bp"),
            "n_quality",
            F.expr("(10000 * n_quality) DIV n_docs").cast("long").alias("quality_rate_bp"),
            "total_tokens",
        )
    )


def source_overlap(docs: DataFrame, n: int = 3, source_col: str = "source") -> DataFrame:
    """Cross-source n-gram overlap matrix: for every pair of sources, the
    count of shared distinct word-n-gram shingles plus Jaccard and both
    directed containments (bp). This is the mixture-construction
    diagnostic — "how much of source A is already inside source B" decides
    whether a new dump adds signal or re-weights duplicates (the CCNet /
    RedPajama dump-overlap question, lifted from doc granularity to source
    granularity).

    Only pairs sharing ≥1 shingle appear (the pair relation is join-born;
    disjoint sources emit nothing — consumers needing the zero rows outer-
    join against the source list).

    Scale: the corpus reduces to distinct (source, 64-bit shingle hash)
    rows — one shuffle with map-side distinct partials; per-source set
    sizes are a tiny rollup of that relation. The self-join on shingle
    expands each shingle bucket to at most S(S−1)/2 rows for S sources —
    bounded by the SOURCE count (dozens–hundreds), not the corpus, so no
    hot-shingle cap is needed; the pair rollup is map-side-combinable and
    the sizes join broadcasts (S rows)."""
    from .dedup import _hashed_shingles

    base = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(_hashed_shingles(F.col("text"), n)).alias("shingle"),
        )
        .distinct()
    )
    sizes = base.groupBy("source").agg(F.count("*").alias("n_sh"))
    a, b = base.alias("a"), base.alias("b")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb")))
    union = F.col("na") + F.col("nb") - F.col("n_shared")
    return (
        pairs.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.floor(F.col("n_shared") * 10000.0 / union).cast("long").alias("jaccard_bp"),
            F.floor(F.col("n_shared") * 10000.0 / F.col("na")).cast("long").alias("contain_a_bp"),
            F.floor(F.col("n_shared") * 10000.0 / F.col("nb")).cast("long").alias("contain_b_bp"),
        )
    )
