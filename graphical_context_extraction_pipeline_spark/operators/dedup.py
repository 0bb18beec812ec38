"""Deduplication operators for training-data pipelines, over the flat
`documents` table.

Scale design:
- exact: hash-groupBy — one shuffle on a 16-byte key, AQE-coalesced.
- n-gram Jaccard: shingle-blocking self-join (equi-join on shingle) —
  candidate generation without O(n²); at 100 TB the shingle join is replaced
  by MinHash banding below, which bounds candidates per band bucket.
- MinHash+LSH: portable md5-based hash (identical in Spark and DuckDB so the
  oracle can recompute signatures bit-for-bit), banded bucket join.
- SimHash: 64-bit sign-aggregated token hashes; hamming-close pairs via
  4×16-bit band blocking.

All outputs integer/string typed for hash-stable oracle comparison.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


from ..functions.exprs import bind as _bind  # single-eval let-binding (see exprs.py)


MAX_DOCS_PER_BUCKET = 1024  # hot-bucket cutoff for the LSH pair expansions


def _bucket_pairs(df, keys: list[str], payload: list[str] | None = None,
                  max_bucket: int = MAX_DOCS_PER_BUCKET):
    """(a, b) member-struct pairs sharing a bucket key — via groupBy +
    within-bucket pair expansion instead of a self-join: singleton buckets
    (the vast majority) never enter a shuffle-join, and each bucket's pairs
    are generated locally.

    Hot-bucket cap: a bucket with more than ``max_bucket`` members (every
    member of one giant near-dup cluster — template pages, boilerplate
    docs — shares ALL its band keys, so cluster size = bucket size there)
    would buffer m structs in one collect_list aggregation buffer and
    expand m²/2 pairs. Hot buckets are detected FIRST (count aggregation,
    map-side partial) and routed to a hub-star expansion instead: every
    member pairs with the bucket's min-doc_id hub — m−1 pairs, no
    collect_list, and for dedup consumers (connected-component closure /
    candidate verification) the star carries exactly the connectivity the
    complete graph does. Non-hot buckets keep the exact expansion with
    every aggregation buffer bounded by ``max_bucket`` structs.

    ``payload``: extra per-member columns carried into the a/b structs
    (e.g. the simhash value for the downstream hamming filter). Note the
    star path pairs members with the HUB only — a payload-based filter
    applied afterwards (hamming ≤ d) sees hub-member pairs, not all
    member-member pairs; for buckets of >max_bucket near-identical docs
    the hub is representative by construction.
    """
    cols = ["doc_id"] + (payload or [])
    member = F.struct(*cols)
    stats = df.groupBy(*keys).agg(
        F.count("*").alias("n_members"),
        F.min_by(member, F.col("doc_id")).alias("hub"),
    )
    hot = stats.where(F.col("n_members") > max_bucket).select(*keys, "hub")
    nonhot = df.join(hot.select(*keys), keys, "left_anti")
    grouped = (
        nonhot.groupBy(*keys)
        .agg(F.collect_list(member).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = (
        grouped.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    # hub.doc_id is the bucket minimum, so hub < member always holds here
    star = (
        df.join(hot, keys)  # hot is tiny by construction — AQE broadcasts
        .where(F.col("doc_id") != F.col("hub.doc_id"))
        .select(F.col("hub").alias("a"), member.alias("b"))
    )
    return pairs.unionByName(star)


def _hashed_shingles(col, n: int = 3):
    """Distinct 64-bit hashes of word n-grams — built WITHOUT materializing
    shingle strings: each token is xxhash64'd once, then consecutive token
    hashes are folded pairwise with the multi-column form of xxhash64 via
    ``zip_with`` over shifted slices (vectorized, no per-index element_at).

    Shuffling 8-byte keys instead of shingle strings cuts candidate-join
    shuffle volume ~10×; Jaccard on hashed distinct shingles equals Jaccard
    on the strings up to 64-bit collisions (~n²/2⁶⁵, negligible)."""

    def fold(th):
        m = F.size(th) - (n - 1)
        acc = F.zip_with(F.slice(th, 1, m), F.slice(th, 2, m), lambda x, y: F.xxhash64(x, y))
        for k in range(2, n):
            acc = F.zip_with(acc, F.slice(th, k + 1, m), lambda x, y: F.xxhash64(x, y))
        return acc

    return _bind(
        F.transform(_tokens(col), lambda t: F.xxhash64(t)),
        lambda th: F.when(F.size(th) >= n, F.array_distinct(fold(th))).otherwise(
            F.array().cast("array<bigint>")
        ),
    )


def _with_sizes(arr):
    """array<bigint> → array<struct<shingle,n_sh>> computed in ONE pass.

    The lambda-binding via a 1-element array wrapper is load-bearing:
    referencing the (expensive) shingle-array expression from two separate
    projection columns (size + explode) lets Catalyst's CollapseProject
    inline and evaluate it twice (~2.4× slower measured); binding it as a
    higher-order-function argument forces single evaluation."""
    return F.element_at(
        F.transform(
            F.array(arr),
            lambda a: F.transform(a, lambda s: F.struct(s.alias("shingle"), F.size(a).alias("n_sh"))),
        ),
        1,
    )


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup via md5 hash-groupBy: groups with >1 member."""
    keyed = docs.select(F.col("doc_id"), F.md5(F.lower("text")).alias("dup_key"))
    return (
        keyed.groupBy("dup_key")
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("canonical_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .where(F.col("n_members") > 1)
    )


MAX_DOCS_PER_SHINGLE = 64  # stop-shingle cutoff (see ngram_jaccard_pairs)


def dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Materialize the exact-deduplicated corpus: one surviving row per
    distinct normalized text — the member with the smallest doc_id (the
    reference-style canonical-keep policy).

    Plan: single hash aggregation on the md5 key with min_by carrying the
    kept doc — one shuffle of (16-byte key, id) pairs with map-side partial
    min, never a self-join; at 100 TB this is the cheapest possible shape
    for global exact dedup."""
    keyed = docs.select("doc_id", F.md5(F.lower("text")).alias("dup_key"))
    return (
        keyed.groupBy("dup_key")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select("doc_id", "dup_key", "n_members")
    )


def dedup_incremental(new_docs: DataFrame, seen_docs: DataFrame) -> DataFrame:
    """Incremental exact dedup: rows of ``new_docs`` whose normalized text
    was NOT already present in ``seen_docs`` AND is the first among the new
    batch's own duplicates — the shape of a daily ingest against an
    existing 100 TB corpus.

    Plan: the seen side reduces to distinct 16-byte keys before the
    LEFT ANTI join (broadcast by AQE when the day's key set is small, hash
    join otherwise — never the raw seen corpus), then the within-batch
    keep-first aggregation. At scale the seen-keys relation is the
    incrementally-maintained dedup index (or a bloom-filter pre-pass feeding
    this exact join)."""
    seen_keys = seen_docs.select(F.md5(F.lower("text")).alias("dup_key")).distinct()
    new_keyed = new_docs.select("doc_id", F.md5(F.lower("text")).alias("dup_key"))
    fresh = new_keyed.join(seen_keys, "dup_key", "left_anti")
    return (
        fresh.groupBy("dup_key")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").cast("long").alias("n_batch_dups"))
        .select("doc_id", "dup_key", "n_batch_dups")
    )


BLOOM_K = 4  # bit positions per key (Kirsch-Mitzenmacher double hashing)


def _bloom_positions(dup_key, m_bits: int):
    """BLOOM_K deterministic bit positions from the md5 dup_key: two 32-bit
    hex slices h1/h2 of the digest, pos_i = (h1 + i·h2 + i²) mod m — the
    same portable double-hash family as the minhash signatures, so the
    DuckDB oracle recomputes identical positions."""
    h1 = F.conv(F.substring(dup_key, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(dup_key, 9, 8), 16, 10).cast("long")
    return F.array(*[F.pmod(h1 + i * h2 + i * i, F.lit(m_bits)) for i in range(BLOOM_K)])


def bloom_index(seen_docs: DataFrame, m_bits: int = 1 << 22) -> DataFrame:
    """The seen corpus's bloom bit set: the distinct bit positions set by
    any seen doc's dup_key — at most ``m_bits`` rows no matter how large
    the corpus. This is the compact membership summary an incremental
    ingest broadcasts instead of joining the multi-TB key index; rebuild
    is one scan + distinct, and appends only ADD positions (monotone), so
    the index is incrementally maintainable with a union+distinct."""
    keyed = seen_docs.select(F.md5(F.lower("text")).alias("dup_key"))
    return keyed.select(
        F.explode(_bloom_positions(F.col("dup_key"), m_bits)).alias("bit_pos")
    ).distinct()


def dedup_incremental_bloom(
    new_docs: DataFrame, seen_docs: DataFrame, m_bits: int = 1 << 22
) -> DataFrame:
    """Bloom-prefiltered incremental exact dedup — same OUTPUT as
    :func:`dedup_incremental` (bloom filters have no false negatives, so
    correctness is exact; equality is pinned by test), but batch docs with
    ANY absent bloom bit are classified definitely-new locally and never
    enter the exact anti-join. Only the "maybe seen" fraction (true dups +
    the false-positive rate, ~0.6% at k=4 and 10 bits/key) pays the join
    against the seen key index — at 100 TB that join's probe side shrinks
    by two orders of magnitude for a typical mostly-fresh ingest.

    Plan: the bit set is explicitly broadcast (m_bits=2²² ⇒ ≤32 MB of
    longs, far less after distinct); the batch side explodes to k=4 rows
    per doc, left-joins the broadcast bits, and reduces back per doc —
    zero batch-side shuffle before the (small) maybe-side anti-join."""
    bits = bloom_index(seen_docs, m_bits).withColumn("hit", F.lit(1))
    new_keyed = new_docs.select("doc_id", F.md5(F.lower("text")).alias("dup_key"))
    classified = (
        new_keyed.select(
            "doc_id",
            "dup_key",
            F.explode(_bloom_positions(F.col("dup_key"), m_bits)).alias("bit_pos"),
        )
        .join(F.broadcast(bits), "bit_pos", "left")
        .groupBy("doc_id", "dup_key")
        .agg((F.count("hit") == F.lit(BLOOM_K)).alias("maybe_seen"))
    )
    maybe = classified.where(F.col("maybe_seen")).select("doc_id", "dup_key")
    fresh_fast = classified.where(~F.col("maybe_seen")).select("doc_id", "dup_key")
    seen_keys = seen_docs.select(F.md5(F.lower("text")).alias("dup_key")).distinct()
    confirmed = maybe.join(seen_keys, "dup_key", "left_anti")
    return (
        fresh_fast.unionByName(confirmed)
        .groupBy("dup_key")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").cast("long").alias("n_batch_dups"))
        .select("doc_id", "dup_key", "n_batch_dups")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    min_jaccard_bp: int = 6000,
    max_docs_per_shingle: int = MAX_DOCS_PER_SHINGLE,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard ≥ threshold (basis points).

    Blocking: explode distinct shingle hashes → bucket-grouped pair
    expansion → count shared shingles per pair → Jaccard via
    inclusion-exclusion.

    Scale notes: shingles are shuffled as 64-bit hashes (not strings); each
    doc's shingle-set size rides along into the bucket expansion so NO
    post-hoc join against a sizes table is needed — the whole operator is
    two shuffles (explode→groupBy(shingle), pair groupBy) with map-side
    partial aggregation on both.

    Hot-shingle cap: a shingle appearing in more than ``max_docs_per_shingle``
    documents (a stop-phrase) is dropped from blocking entirely — its
    within-bucket pair expansion is quadratic while the shingle itself
    carries almost no Jaccard signal (a 3-gram shared by >K docs contributes
    ≤1/|union| to each pair). This bounds every bucket's expansion at
    K(K−1)/2 regardless of corpus size; the documented alternative for
    exact near-dup sets dominated by stop-phrases is MinHash banding
    (minhash_lsh_pairs), whose band buckets are probabilistically balanced.
    The DuckDB oracle applies the identical cutoff, and the reported
    jaccard_bp is exact inclusion-exclusion over NON-hot shingles — a
    conservative (under-) estimate for pairs that additionally share hot
    shingles.

    The cutoff is applied BEFORE any bucket is materialized (a post-hoc
    ``where(size(ds) ≤ K)`` would still buffer the 10⁹-member bucket inside
    collect_list): a count aggregation (map-side partial, 16-byte rows)
    finds hot shingles, an anti-join (AQE broadcasts it when tiny — and the
    hot set is tiny by construction at sane K) removes their occurrences,
    and only then are buckets collected — every aggregation buffer is
    bounded by K structs.

    All-hot fallback (the recall hole the plain cutoff leaves): a text
    duplicated across MORE than K documents has ALL of its shingles
    classified hot, so such docs would otherwise emit zero pairs — exactly
    the most heavily duplicated content in a boilerplate-dominated crawl.
    Docs whose entire shingle set is hot are detected (anti-join against
    the docs that kept ≥1 shingle) and routed through an identical-set
    signature group: md5 over the sorted distinct shingle hashes. Docs with
    IDENTICAL shingle sets (true Jaccard = 1) pair as a hub star within
    their signature group — linear, no collect buffers, connectivity
    preserved for downstream closure, and the emitted jaccard_bp = 10000
    is exact. Residual (documented): an all-hot doc whose set merely
    OVERLAPS (≠ equals) another's still emits no pair — MinHash banding
    (minhash_lsh_pairs) remains the instrument for that corner. The DuckDB
    oracle replays the identical fallback.
    """
    base = docs.select(
        "doc_id", F.explode(_with_sizes(_hashed_shingles(F.col("text"), n))).alias("z")
    ).select("doc_id", F.col("z.shingle").alias("shingle"), F.col("z.n_sh").alias("n_sh"))
    return _set_jaccard_pairs(base, min_jaccard_bp, max_docs_per_shingle)


def _set_jaccard_pairs(
    base: DataFrame, min_jaccard_bp: int, max_docs_per_shingle: int
) -> DataFrame:
    """The blocking / hot-cap / all-hot-star machinery of
    :func:`ngram_jaccard_pairs` over an arbitrary element-set table ``base``
    (doc_id, shingle: bigint, n_sh = the owning doc's distinct-set size) —
    every scale note in that docstring applies verbatim. Shared by the
    word-shingle family and the media-ref set similarity
    (``multimodal.media_ref_pairs``)."""
    hot = (
        base.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_docs_per_shingle)
        .select("shingle")
    )
    surviving = base.join(hot, "shingle", "left_anti")
    grouped = (
        surviving
        .groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = (
        grouped.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    main = pairs.select(
        "doc_a",
        "doc_b",
        "n_shared",
        (F.col("na") + F.col("nb") - F.col("n_shared")).alias("n_union"),
        F.floor(
            F.col("n_shared") * 10000.0 / (F.col("na") + F.col("nb") - F.col("n_shared"))
        )
        .cast("long")
        .alias("jaccard_bp"),
    ).where(F.col("jaccard_bp") >= min_jaccard_bp)

    # --- all-hot fallback (see docstring): docs that kept NO shingle ---
    # per-doc buffers only (a doc's own distinct shingles — bounded by doc
    # length, never by corpus size); signature groups expand as hub stars.
    all_hot = (
        base.join(surviving.select("doc_id").distinct(), "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_set("shingle")), lambda x: x.cast("string")
                    ),
                )
            ).alias("sig"),
            F.first("n_sh").alias("n_sh"),
        )
    )
    sig_stats = all_hot.groupBy("sig").agg(
        F.count("*").alias("n_members"), F.min("doc_id").alias("hub")
    )
    star = (
        all_hot.join(sig_stats.where(F.col("n_members") > 1), "sig")
        .where(F.col("doc_id") != F.col("hub"))
        .select(
            F.col("hub").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("n_sh").cast("long").alias("n_shared"),
            F.col("n_sh").cast("long").alias("n_union"),
            F.lit(10000).cast("long").alias("jaccard_bp"),
        )
    )
    if min_jaccard_bp > 10000:  # degenerate threshold excludes even exact dups
        return main
    return main.unionByName(star)


N_MINHASH = 16
LSH_BANDS = 4  # 4 bands × 4 rows
MH_P = 2147483647  # 2^31 - 1, the minhash family's modulus
MH_C = 1000003  # polynomial-combine multiplier


def _portable_hash(col, seed: int):
    """First 15 hex digits of md5(seed||value) as bigint — identical in
    Spark (conv) and DuckDB ('0x'||… cast), so oracles can recompute."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), col)), 1, 15), 16, 10).cast("long")


def _shingle_hash_pairs(col, n: int = 3):
    """Distinct (h1, h2) 31-bit double-hashes of the word n-grams, packed
    into one bigint (h1·2³¹ + h2).

    Portable construction (bit-identical in DuckDB, see the oracle): each
    token is md5-hashed ONCE; two independent 32-bit slices of that digest
    are polynomial-combined across the n-gram:  h ← (h·C + tokᵢ) mod P.
    One md5 per token replaces the previous one-md5-per-(shingle × 16
    hash functions) — ~50× less hashing work — and the double hash (h1,h2)
    seeds the whole minhash family arithmetically (Kirsch-Mitzenmacher).
    """
    def poly(arr, m):
        acc = F.zip_with(
            F.slice(arr, 1, m),
            F.slice(arr, 2, m),
            lambda x, y: F.pmod(x * F.lit(MH_C) + y, F.lit(MH_P)),
        )
        for k in range(2, n):
            acc = F.zip_with(
                acc,
                F.slice(arr, k + 1, m),
                lambda x, y: F.pmod(x * F.lit(MH_C) + y, F.lit(MH_P)),
            )
        return acc

    def packed(tm):
        m = F.size(tm) - (n - 1)
        ta = F.transform(tm, lambda d: F.conv(F.substring(d, 1, 8), 16, 10).cast("long"))
        tb = F.transform(tm, lambda d: F.conv(F.substring(d, 9, 8), 16, 10).cast("long"))
        return _bind(
            ta,
            lambda a: _bind(
                tb,
                lambda b: F.zip_with(poly(a, m), poly(b, m), lambda x, y: x * F.lit(2**31) + y),
            ),
        )

    return _bind(
        F.transform(_tokens(col), lambda t: F.md5(t)),
        lambda tm: F.when(F.size(tm) >= n, F.array_distinct(packed(tm))).otherwise(
            F.array().cast("array<bigint>")
        ),
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: mhᵢ = min over shingles of
    (h1 + i·h2 + i²) mod P — the double-hashing family over the portable
    shingle hash (one shuffle, map-side partial min)."""
    sh = docs.select("doc_id", F.explode(_shingle_hash_pairs(F.col("text"))).alias("hh")).select(
        "doc_id",
        F.shiftright("hh", 31).alias("h1"),
        F.col("hh").bitwiseAND(F.lit((1 << 31) - 1)).alias("h2"),
    )
    aggs = [
        F.min(
            F.pmod(F.col("h1") + F.lit(i) * F.col("h2") + F.lit(i * i), F.lit(MH_P))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_signatures(
    docs: DataFrame, n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> DataFrame:
    """(doc_id, band, bkey) LSH band keys — the banded signature INDEX.
    Band key = polynomial combine of the band's signature rows. This is the
    relation a production deployment materializes and maintains
    incrementally (append the new batch's rows per ingest); both the
    self-join dedup (minhash_lsh_pairs) and the batch-vs-corpus incremental
    path (minhash_incremental_pairs) are joins over it."""
    sig = minhash_signatures(docs, n_hashes)
    rows_per_band = n_hashes // bands
    band_cols = []
    for bI in range(bands):
        key = F.lit(0).cast("long")
        for j in range(rows_per_band):
            key = F.pmod(key * F.lit(MH_C) + F.col(f"mh{bI * rows_per_band + j}"), F.lit(MH_P))
        band_cols.append(F.struct(F.lit(bI).alias("band"), key.alias("bkey")))
    return sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    max_bucket: int = MAX_DOCS_PER_BUCKET,
) -> DataFrame:
    """Candidate pairs that collide in ≥1 LSH band (band key = polynomial
    combine of its rows' signature values), deduped. Verification against
    true Jaccard is the consumer's second stage (see ngram_jaccard_pairs).

    Band buckets exceeding ``max_bucket`` members (one giant near-dup
    cluster sharing every band key) expand as a hub star instead of all
    pairs — linear, buffer-bounded, connectivity-preserving (see
    _bucket_pairs); the DuckDB oracle applies the identical cap."""
    banded = banded_signatures(docs, n_hashes, bands)
    return (
        _bucket_pairs(banded, ["band", "bkey"], max_bucket=max_bucket)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_incremental_pairs(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    max_bucket: int = MAX_DOCS_PER_BUCKET,
) -> DataFrame:
    """Near-dup candidates of an ingest batch against the already-seen
    corpus: (doc_new, doc_seen) pairs colliding in ≥1 LSH band —
    ``dedup_incremental``'s daily-ingest shape lifted from exact to
    near-duplicate.

    Scale design: the seen side reduces to its banded signature index
    (``banded_signatures`` — in production a MATERIALIZED (band, bkey,
    doc_id) table appended to per ingest, so the 100 TB corpus text is
    never re-read). Seen buckets larger than ``max_bucket`` (one giant
    boilerplate cluster shares every band key) are represented in the
    index by their min-doc_id hub alone: a batch doc hitting such a bucket
    gains exactly one candidate — all an accept/reject decision needs —
    and per-batch-row join fan-out stays bounded by ``max_bucket`` per
    band. The batch side is a day's ingest (small); AQE broadcasts it into
    the index join. The DuckDB oracle applies the identical hub cap."""
    new_b = banded_signatures(new_docs, n_hashes, bands)
    seen_b = banded_signatures(seen_docs, n_hashes, bands)
    stats = seen_b.groupBy("band", "bkey").agg(
        F.count("*").alias("n_members"), F.min("doc_id").alias("hub")
    )
    hot = stats.where(F.col("n_members") > max_bucket)
    index = seen_b.join(hot.select("band", "bkey"), ["band", "bkey"], "left_anti").unionByName(
        hot.select("band", "bkey", F.col("hub").alias("doc_id"))
    )
    return (
        new_b.join(
            index.select("band", "bkey", F.col("doc_id").alias("doc_seen")), ["band", "bkey"]
        )
        .select(F.col("doc_id").alias("doc_new"), "doc_seen")
        .distinct()
    )


def neardup_incremental_survivors(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    max_bucket: int = MAX_DOCS_PER_BUCKET,
) -> DataFrame:
    """The ADMITTED subset of an ingest batch — what actually gets appended
    to the corpus (and whose band keys get appended to the signature
    index): batch docs with no near-dup candidate in the seen corpus,
    resolved to one canonical (minimum doc_id) per within-batch near-dup
    component. Output (doc_id, n_merged) as in cluster.neardup_survivors.

    Candidate-level semantics (deliberate, mirroring dedup_incremental):
    a batch doc is rejected iff it LSH-collides with the seen corpus;
    batch docs colliding only with REJECTED batch docs (a chain through a
    rejected doc, no direct seen collision) still survive. Consumers
    wanting chain-through-rejected closure run the full corpus-wide
    closure (cluster.neardup_survivors over seen ∪ batch) instead."""
    from .cluster import neardup_survivors

    hits = (
        minhash_incremental_pairs(new_docs, seen_docs, n_hashes, bands, max_bucket)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    clean = new_docs.join(hits, "doc_id", "left_anti")
    in_batch = minhash_lsh_pairs(clean, n_hashes, bands, max_bucket)
    return neardup_survivors(clean, in_batch)


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash: per token-occurrence hash, bit-majority sign.

    Built from the portable md5 hash so the DuckDB oracle can recompute it.
    Emitted as 4×16-bit integer bands (blocking keys for hamming search).
    """
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    h = toks.select("doc_id", _portable_hash(F.col("tok"), 999).alias("h"))
    # bit b of the 60-bit hash → ±1 contribution; sum over tokens; sign → bit
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(60)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"s{b}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**b)).cast("long")
            for b in range(60)
        ).alias("simhash"),
    )
    return sim.select(
        "doc_id",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 15 * i).bitwiseAND(F.lit((1 << 15) - 1)).alias(f"band{i}")
            for i in range(4)
        ],
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, max_bucket: int = MAX_DOCS_PER_BUCKET
) -> DataFrame:
    """Near-dup pairs: SimHash band collision candidates filtered by true
    hamming distance ≤ max_hamming.

    Hot buckets (> ``max_bucket`` members) are handled in two tiers —
    NOT the plain hub star, because simhash band keys are only 15 bits
    wide: past ~``max_bucket · 2¹⁵`` (~33 M) docs the average bucket is
    hot even for mutually DISSIMILAR content, and a star around one
    arbitrary hub would hamming-filter away almost every candidate:

    1. members are grouped by their FULL simhash; each identical-simhash
       group expands as a star around its own min-doc hub — hamming 0, so
       the filter passes every pair: giant identical-content clusters
       (the case that actually creates hot buckets below saturation) stay
       LOSSLESS and linear;
    2. the distinct group hubs — one row per distinct simhash in the
       bucket — re-enter the standard bounded expansion (_bucket_pairs):
       all hub×hub pairs while ≤ ``max_bucket`` groups, hub star beyond.

    Every aggregation buffer stays ≤ ``max_bucket`` structs. Residual
    (documented, information-theoretic): a bucket with more than
    ``max_bucket`` DISTINCT simhashes still reduces to a star over group
    hubs — at that corpus scale (≳10⁸ docs for the default layout) no
    within-bucket algorithm avoids quadratic blowup; the fix is wider
    blocking keys, i.e. re-band the 60-bit hash into fewer, wider bands
    (Manku et al., WWW'07 permuted-table design) so expected bucket size
    stays under the cap. The DuckDB oracle replays both tiers."""
    sim = simhash(docs)
    banded = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("bkey")) for i in range(4)])
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))

    keys = ["band", "bkey"]
    hot = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") > max_bucket)
        .select(*keys)
    )
    nonhot = banded.join(hot, keys, "left_anti")
    # every nonhot bucket is ≤ max_bucket by construction: _bucket_pairs
    # applies the pure exact expansion there
    exact = _bucket_pairs(nonhot, keys, payload=["simhash"], max_bucket=max_bucket)

    hot_members = banded.join(hot, keys)
    groups = hot_members.groupBy("band", "bkey", "simhash").agg(
        F.min("doc_id").alias("ghub")
    )
    member = F.struct("doc_id", "simhash")
    intra = (
        hot_members.join(groups, ["band", "bkey", "simhash"])
        .where(F.col("doc_id") != F.col("ghub"))
        .select(
            F.struct(F.col("ghub").alias("doc_id"), F.col("simhash")).alias("a"),
            member.alias("b"),
        )
    )
    ghub_rel = groups.select(F.col("ghub").alias("doc_id"), "simhash", "band", "bkey")
    cross = _bucket_pairs(ghub_rel, keys, payload=["simhash"], max_bucket=max_bucket)

    cand = (
        exact.unionByName(intra).unionByName(cross)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        hamming <= max_hamming
    )


def contamination_pairs(
    train: DataFrame, eval_docs: DataFrame, n: int = 3, min_shared: int = 2
) -> DataFrame:
    """Eval-set contamination scan: (train_doc, eval_doc, n_shared) for every
    training document sharing ≥ ``min_shared`` distinct word-n-grams with a
    benchmark/eval document — the decontamination pass an LLM training
    pipeline runs so test sets don't leak into training data (GPT-3 appx C /
    PaLM-style n-gram overlap; production uses n = 8–13, the knob is free).

    Scale shape: the eval side is a benchmark suite — thousands of docs
    against a 100 TB train corpus — so its exploded shingle relation is
    broadcast and the train side is ONE scan feeding a map-side hash join;
    the only shuffle is the (train_doc, eval_doc) count aggregation, whose
    cardinality is bounded by the answer itself. No collect_list buffers:
    a stop-phrase shingle inflates join output only linearly in its
    train-side occurrences (cf. the quadratic bucket expansion the pair
    dedup operators must cap).
    """
    t_sh = train.select(
        F.col("doc_id").alias("train_doc"),
        F.explode(_hashed_shingles(F.col("text"), n)).alias("shingle"),
    )
    e_sh = eval_docs.select(
        F.col("doc_id").alias("eval_doc"),
        F.explode(_hashed_shingles(F.col("text"), n)).alias("shingle"),
    )
    return (
        t_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, n: int = 3, min_shared: int = 2
) -> DataFrame:
    """Training corpus with contaminated docs removed: train docs that hit
    NO eval doc at the ``contamination_pairs`` threshold. One extra
    doc_id-keyed LEFT ANTI join (the contaminated id set is small — AQE
    broadcasts it) over the pairs plan."""
    bad = contamination_pairs(train, eval_docs, n, min_shared).select(
        F.col("train_doc").alias("doc_id")
    ).distinct()
    return train.select("doc_id").join(bad, "doc_id", "left_anti")


def _string_shingles(col, n: int):
    """Distinct space-joined word n-grams as STRINGS (the human-readable
    counterpart of ``_hashed_shingles``): consecutive-token concat via the
    same shifted-slice ``zip_with`` fold, no per-index element_at."""

    def fold(ts):
        m = F.size(ts) - (n - 1)
        acc = F.zip_with(
            F.slice(ts, 1, m), F.slice(ts, 2, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
        for k in range(2, n):
            acc = F.zip_with(acc, F.slice(ts, k + 1, m), lambda x, y: F.concat(x, F.lit(" "), y))
        return acc

    return _bind(
        _tokens(col),
        lambda ts: F.when(F.size(ts) >= n, F.array_distinct(fold(ts))).otherwise(
            F.array().cast("array<string>")
        ),
    )


def duplicate_passages(docs: DataFrame, n: int = 8, min_docs: int = 2) -> DataFrame:
    """Passage-level duplication scan: every word ``n``-gram that appears in
    ≥ ``min_docs`` DISTINCT documents, with its document frequency and the
    smallest containing doc_id — the sub-document signal behind
    "deduplicating training data" passage removal (doc-level pair dedup
    misses a boilerplate paragraph shared by otherwise-unrelated pages).

    Each doc contributes each of its distinct passages once (array_distinct
    before explode), so count(*) per passage IS the document frequency —
    a plain partial-aggregated count, no collect_list, no per-key buffer:
    a passage in 10^7 docs costs exactly one combiner cell per map task.

    Scale: one shuffle keyed by the passage string. At 100 TB, shuffle the
    8-byte ``_hashed_shingles`` key instead and drop the text column (the
    hash is the removal key; Jaccard-of-hashes ≡ Jaccard-of-strings up to
    2^-64 collisions) — the string form is kept here because the passage
    text is the useful survey output and the oracle replays it verbatim."""
    p = docs.select(
        "doc_id", F.explode(_string_shingles(F.col("text"), n)).alias("passage")
    )
    return (
        p.groupBy("passage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("example_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _all_shingles(col, n: int):
    """Every consecutive word n-gram as a string, in position order (NOT
    distinct — index i of the result is the shingle starting at token i).
    Same shifted-slice ``zip_with`` fold as ``_string_shingles``."""

    def fold(ts):
        m = F.size(ts) - (n - 1)
        acc = F.zip_with(
            F.slice(ts, 1, m), F.slice(ts, 2, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
        for k in range(2, n):
            acc = F.zip_with(acc, F.slice(ts, k + 1, m), lambda x, y: F.concat(x, F.lit(" "), y))
        return acc

    return _bind(
        _tokens(col),
        lambda ts: F.when(F.size(ts) >= n, fold(ts)).otherwise(
            F.array().cast("array<string>")
        ),
    )


def strip_duplicate_passages(docs: DataFrame, n: int = 8, min_docs: int = 2) -> DataFrame:
    """Sub-document dedup's END PRODUCT (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"-style removal): every
    token covered by ANY occurrence of a word ``n``-gram that appears in
    ≥ ``min_docs`` distinct documents is dropped from the document, and
    the surviving tokens are re-joined. Emits
    (doc_id, clean_text, n_tokens, n_removed).

    ``clean_text`` is the whitespace-normalized token stream (the same
    tokenizer contract every dedup operator here uses) — sub-token
    whitespace does not survive removal by construction.

    Scale: the positioned-shingle explode shuffles (passage, doc_id,
    start) triples keyed by the passage string (at 100 TB: the 8-byte
    ``_hashed_shingles`` key — see ``duplicate_passages``); covered start
    offsets aggregate per doc (``collect_set`` bounded by the doc's own
    token count — per-doc state, never per-passage); the corpus payload
    itself is shuffled exactly once, in the doc_id join that brings the
    covered-offset sets back to the text. Token masking is one intra-row
    ``array_except`` (hash-based, linear) — no per-token membership scan.
    """
    hot = duplicate_passages(docs, n, min_docs).select("passage")
    # NULL text ≡ empty doc (size/cast NULLs must not leak into the output)
    base = docs.select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    occ = base.select(
        "doc_id",
        F.posexplode(_all_shingles(F.col("text"), n)).alias("start", "passage"),
    )
    cov = (
        occ.join(hot, "passage")
        .select("doc_id", "start")
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("starts"))
    )
    joined = base.join(cov, "doc_id", "left")

    empty_int = F.array().cast("array<integer>")
    starts = F.coalesce(F.col("starts"), empty_int)
    covered = F.array_distinct(
        F.flatten(F.transform(starts, lambda s: F.sequence(s, s + F.lit(n - 1))))
    )

    def rebuild(ts):
        all_idx = F.when(
            F.size(ts) >= 1, F.sequence(F.lit(0), F.size(ts) - 1)
        ).otherwise(empty_int)  # sequence(0, -1) would DESCEND — guard it
        kept_idx = F.array_except(all_idx, covered)
        kept = F.transform(kept_idx, lambda i: F.get(ts, i))
        return F.struct(
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size(ts).cast("long").alias("n_tokens"),
            (F.size(ts) - F.size(kept)).cast("long").alias("n_removed"),
        )

    out = joined.select("doc_id", _bind(_tokens(F.col("text")), rebuild).alias("r"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("r.clean_text").alias("clean_text"),
        F.col("r.n_tokens").alias("n_tokens"),
        F.col("r.n_removed").alias("n_removed"),
    )


def similar_to(
    docs: DataFrame,
    query_text: str,
    n: int = 3,
    min_jaccard_bp: int = 1000,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Point near-dup lookup: documents similar to ONE given text —
    (doc_id, jaccard_bp), jaccard over word-n-gram shingles, descending.
    The retrieval twin of the pairwise dedup family: "has this text been
    seen (approximately) before?" — ingest-time dedup probes, provenance
    checks, contamination spot checks.

    Scale path: the query's LSH band keys are computed on the driver (one
    1-row job) and broadcast against the banded signature index — in
    production the MATERIALIZED index relation (use
    :func:`similar_from_index` with a standing signature table; this
    convenience form derives it per call) — so only
    band-colliding candidates are scanned for exact Jaccard; the query's
    shingle set rides along as a literal array (KB-scale for any sane
    query text). Recall is the LSH band recall (a true near-dup missing
    all bands is missed — same contract as minhash_lsh_pairs).
    """
    return similar_from_index(
        banded_signatures(docs, n_hashes, bands),
        docs,
        query_text,
        n=n,
        min_jaccard_bp=min_jaccard_bp,
        n_hashes=n_hashes,
        bands=bands,
    )


def similar_from_index(
    signatures: DataFrame,
    docs: DataFrame,
    query_text: str,
    n: int = 3,
    min_jaccard_bp: int = 1000,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """:func:`similar_to` probing a STANDING banded-signature index — the
    serving shape of the point near-dup lookup (the bm25_from_index /
    ann_from_index discipline carried to the minhash family): the corpus
    signature relation is built once (``banded_signatures``, maintained
    like any index table) and each query pays only its own 1-row band
    computation, a broadcast semi-join probe of the index, and the exact
    Jaccard over the colliding candidates. ``signatures`` must come from
    ``banded_signatures(docs, n_hashes, bands)`` (or its maintained
    equivalent); the merge law — identical rows to the derive-per-call
    form — is pinned by test and IS the DuckDB oracle registration."""
    spark = docs.sparkSession
    qdf = spark.createDataFrame([(0, query_text)], "doc_id long, text string")
    q_sh = qdf.select(_shingle_hash_pairs(F.col("text"), n).alias("sh")).first()["sh"]
    if not q_sh:
        return docs.select(
            "doc_id", F.lit(0).cast("long").alias("jaccard_bp")
        ).limit(0)
    q_bands = banded_signatures(qdf, n_hashes, bands).collect()
    keys = spark.createDataFrame(
        [(int(r["band"]), int(r["bkey"])) for r in q_bands], "band int, bkey bigint"
    )
    cands = (
        signatures
        .join(F.broadcast(keys), ["band", "bkey"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    q_arr = F.array(*[F.lit(int(h)) for h in sorted(q_sh)])
    n_q = len(q_sh)
    scored = (
        docs.join(cands, "doc_id")
        .select("doc_id", _shingle_hash_pairs(F.col("text"), n).alias("sh"))
        .select(
            "doc_id",
            # size() is int32 — widen before the e4 scale-up, or a doc
            # with > 2^31/10^4 ≈ 214k shingles overflows the numerator
            F.size("sh").cast("long").alias("n_doc"),
            F.size(F.array_intersect(F.col("sh"), q_arr)).cast("long").alias("inter"),
        )
        .select(
            "doc_id",
            F.expr(f"(10000 * inter) DIV (n_doc + {n_q} - inter)")
            .cast("long")
            .alias("jaccard_bp"),
        )
    )
    # the docstring promises descending order — the survivor set is tiny
    # (band-colliding candidates above the threshold), so the sort is a
    # single small-partition TakeOrdered-class step, not a corpus shuffle
    return scored.where(F.col("jaccard_bp") >= min_jaccard_bp).orderBy(
        F.col("jaccard_bp").desc(), F.col("doc_id").asc()
    )


def simhash_incremental_pairs(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    max_hamming: int = 8,
    max_bucket: int = MAX_DOCS_PER_BUCKET,
) -> DataFrame:
    """SimHash near-dups of an ingest batch against the seen corpus:
    (doc_new, doc_seen, hamming) for batch docs whose simhash collides
    with a seen doc in ≥1 of the 4 bands AND lies within ``max_hamming``
    bits — the third member of the incremental-index family
    (minhash_incremental_pairs for shingle LSH, embedding_incremental
    for vector LSH; one per modality, same daily-ingest contract).

    Scale design: the seen side reduces to its banded simhash index
    (band, bkey, doc_id, simhash) — in production a materialized table
    appended to per ingest, so the corpus text is never re-read. Hot
    seen buckets (> ``max_bucket`` members) inherit simhash_near_pairs'
    two-tier treatment rather than the plain minhash hub, because a
    15-bit band key saturates long before content is actually similar:
    the bucket's members group by FULL simhash and the index keeps one
    min-doc hub per DISTINCT simhash (a batch doc identical to any group
    still matches at hamming 0 — giant identical-content clusters stay
    lossless); buckets with more than ``max_bucket`` distinct simhashes
    keep only the min group hub (the same documented residual as
    simhash_near_pairs — at that scale the fix is wider bands, not a
    smarter within-bucket algorithm). Per-batch-row join fan-out is
    bounded by ``max_bucket`` per band by construction. The batch side
    is small; AQE broadcasts it into the index join.
    """
    def banded(sim: DataFrame) -> DataFrame:
        return sim.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("bkey"))
                        for i in range(4)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))

    keys = ["band", "bkey"]
    seen_b = banded(simhash(seen_docs))
    hot = (
        seen_b.groupBy(*keys)
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") > max_bucket)
        .select(*keys)
    )
    nonhot = seen_b.join(hot, keys, "left_anti")
    ghubs = (
        seen_b.join(hot, keys)
        .groupBy("band", "bkey", "simhash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    gstats = ghubs.groupBy(*keys).agg(
        F.count("*").alias("n_groups"), F.min("doc_id").alias("bhub")
    )
    ghub_rows = (
        ghubs.join(gstats, keys)
        .where((F.col("n_groups") <= max_bucket) | (F.col("doc_id") == F.col("bhub")))
        .select("band", "bkey", "doc_id", "simhash")
    )
    index = nonhot.select("band", "bkey", "doc_id", "simhash").unionByName(ghub_rows)

    cand = (
        banded(simhash(new_docs)).alias("n")
        .join(index.alias("s"), keys)
        .select(
            F.col("n.doc_id").alias("doc_new"),
            F.col("s.doc_id").alias("doc_seen"),
            F.col("n.simhash").alias("hn"),
            F.col("s.simhash").alias("hs"),
        )
        .dropDuplicates(["doc_new", "doc_seen"])
    )
    hamming = F.bit_count(F.col("hn").bitwiseXOR(F.col("hs")))
    return cand.select("doc_new", "doc_seen", hamming.alias("hamming")).where(
        hamming <= max_hamming
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    min_containment_bp: int = 8000,
    max_docs_per_shingle: int = MAX_DOCS_PER_SHINGLE,
) -> DataFrame:
    """Subset-duplicate pairs by ASYMMETRIC shingle containment.

    Jaccard misses the classic crawl pathology where a short document is
    embedded verbatim inside a longer one (syndicated article + site chrome,
    a quoted post inside a thread page, a README pasted into a bundle):
    |A∩B| / |A∪B| is diluted by the host document's extra content, while
    Broder's *containment* |A∩B| / |A| stays at 1.0. This operator reports
    both directions per candidate pair:

      ``contain_a_bp`` = ⌊10000·n_shared/na⌋  (how much of A is inside B)
      ``contain_b_bp`` = ⌊10000·n_shared/nb⌋

    and keeps pairs where EITHER direction clears ``min_containment_bp``.

    Blocking, hot-shingle cap, and the all-hot identical-set fallback are
    shared verbatim with :func:`ngram_jaccard_pairs` (same scale analysis:
    two shuffles of 8-byte shingle hashes, every aggregation buffer bounded
    by the cap; sizes ride the exploded rows so no post-hoc sizes join).
    As there, n_shared excludes hot shingles while na/nb are full set
    sizes, so reported containment is a conservative under-estimate for
    pairs that additionally share stop-phrases; identical-set all-hot docs
    pair as hub stars at exactly 10000/10000.
    """
    base = docs.select(
        "doc_id", F.explode(_with_sizes(_hashed_shingles(F.col("text"), n))).alias("z")
    ).select("doc_id", F.col("z.shingle").alias("shingle"), F.col("z.n_sh").alias("n_sh"))
    hot = (
        base.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > max_docs_per_shingle)
        .select("shingle")
    )
    surviving = base.join(hot, "shingle", "left_anti")
    grouped = (
        surviving.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = (
        grouped.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    ca = F.floor(F.col("n_shared") * 10000.0 / F.col("na")).cast("long")
    cb = F.floor(F.col("n_shared") * 10000.0 / F.col("nb")).cast("long")
    main = pairs.select(
        "doc_a",
        "doc_b",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        ca.alias("contain_a_bp"),
        cb.alias("contain_b_bp"),
    ).where(F.greatest("contain_a_bp", "contain_b_bp") >= min_containment_bp)

    # all-hot fallback: identical shingle sets pair at 10000/10000 (see
    # ngram_jaccard_pairs — same residual: an all-hot doc whose set merely
    # overlaps another's emits nothing; minhash_lsh_pairs covers that).
    all_hot = (
        base.join(surviving.select("doc_id").distinct(), "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_set("shingle")), lambda x: x.cast("string")
                    ),
                )
            ).alias("sig"),
            F.first("n_sh").alias("n_sh"),
        )
    )
    sig_stats = all_hot.groupBy("sig").agg(
        F.count("*").alias("n_members"), F.min("doc_id").alias("hub")
    )
    star = (
        all_hot.join(sig_stats.where(F.col("n_members") > 1), "sig")
        .where(F.col("doc_id") != F.col("hub"))
        .select(
            F.col("hub").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("n_sh").cast("long").alias("n_shared"),
            F.col("n_sh").cast("long").alias("na"),
            F.col("n_sh").cast("long").alias("nb"),
            F.lit(10000).cast("long").alias("contain_a_bp"),
            F.lit(10000).cast("long").alias("contain_b_bp"),
        )
    )
    if min_containment_bp > 10000:
        return main
    return main.unionByName(star)


_SENT_RE = r"[^.!?]+[.!?]*"
_SPAN_SEP = "\x1f"


def _sentences(col):
    """Trimmed non-empty sentences in document order: maximal runs of
    non-terminator characters plus their trailing ``[.!?]`` run. The
    pattern is in the portable Java∩RE2 subset (no lookbehind), so the
    DuckDB oracle splits identically."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(col, F.lit(_SENT_RE), F.lit(0)), lambda s: F.trim(s)
        ),
        lambda s: s != F.lit(""),
    )


def _sentence_spans(sents, n: int):
    """All consecutive n-sentence span KEYS in position order (index i =
    the span starting at sentence i): lowercased sentences joined on the
    unit separator (unambiguous — a space join could collide when
    sentence boundaries shift). Same shifted-slice zip_with fold as
    ``_all_shingles``."""

    def fold(ls):
        m = F.size(ls) - (n - 1)
        acc = F.zip_with(
            F.slice(ls, 1, m),
            F.slice(ls, 2, m),
            lambda x, y: F.concat(x, F.lit(_SPAN_SEP), y),
        )
        for k in range(2, n):
            acc = F.zip_with(
                acc, F.slice(ls, k + 1, m), lambda x, y: F.concat(x, F.lit(_SPAN_SEP), y)
            )
        return acc

    return _bind(
        F.transform(sents, lambda s: F.lower(s)),
        lambda ls: F.when(F.size(ls) >= n, fold(ls)).otherwise(
            F.array().cast("array<string>")
        ),
    )


def c4_spans(docs: DataFrame, n_sent: int = 3, min_docs: int = 2) -> DataFrame:
    """C4's sub-document duplication signal at its ORIGINAL granularity:
    every ``n_sent``-sentence span (lowercased) occurring in ≥ ``min_docs``
    distinct documents — (span, n_docs, example_doc_id). The word-8-gram
    twin is :func:`duplicate_passages`; sentence spans are what the C4
    paper actually removed ("any three-sentence span occurring more than
    once"), and they respect clause boundaries the fixed-width token
    window cuts through.

    Scale: identical to duplicate_passages — array_distinct before the
    explode makes count(*) the document frequency (plain partial-agg
    count, no collect buffers); one shuffle keyed by the span string (at
    100 TB: hash the key, same note as there)."""
    base = docs.select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    s = base.select(
        "doc_id",
        F.explode(
            F.array_distinct(_sentence_spans(_sentences(F.col("text")), n_sent))
        ).alias("span"),
    )
    return (
        s.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("example_doc_id"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def c4_span_dedup(docs: DataFrame, n_sent: int = 3, min_docs: int = 2) -> DataFrame:
    """C4's span-removal end product: every sentence covered by ANY
    occurrence of a duplicated ``n_sent``-sentence span is dropped, the
    survivors re-joined with single spaces (each keeps its own trailing
    punctuation) — (doc_id, clean_text, n_sentences, n_removed).

    Same three-stage shape as :func:`strip_duplicate_passages`, one level
    up: positioned span explode → hot join → covered sentence-index sets
    per doc (collect_set bounded by the doc's own sentence count) → one
    corpus join + intra-row array_except rebuild. Documents with fewer
    than ``n_sent`` sentences pass through untouched by construction."""
    hot = c4_spans(docs, n_sent, min_docs).select("span")
    base = docs.select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    occ = base.select(
        "doc_id",
        F.posexplode(_sentence_spans(_sentences(F.col("text")), n_sent)).alias(
            "start", "span"
        ),
    )
    cov = (
        occ.join(hot, "span")
        .select("doc_id", "start")
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("starts"))
    )
    joined = base.join(cov, "doc_id", "left")

    empty_int = F.array().cast("array<integer>")
    starts = F.coalesce(F.col("starts"), empty_int)
    covered = F.array_distinct(
        F.flatten(F.transform(starts, lambda s: F.sequence(s, s + F.lit(n_sent - 1))))
    )

    def rebuild(ss):
        all_idx = F.when(
            F.size(ss) >= 1, F.sequence(F.lit(0), F.size(ss) - 1)
        ).otherwise(empty_int)  # sequence(0, -1) would DESCEND — guard it
        kept_idx = F.array_except(all_idx, covered)
        kept = F.transform(kept_idx, lambda i: F.get(ss, i))
        return F.struct(
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size(ss).cast("long").alias("n_sentences"),
            (F.size(ss) - F.size(kept)).cast("long").alias("n_removed"),
        )

    out = joined.select("doc_id", _bind(_sentences(F.col("text")), rebuild).alias("r"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("r.clean_text").alias("clean_text"),
        F.col("r.n_sentences").alias("n_sentences"),
        F.col("r.n_removed").alias("n_removed"),
    )


def _token_windows(col, l: int):
    """All positional ``l``-token window keys in document order (index i =
    the window starting at token i) — tokens joined on the unit separator
    (a space join could collide when token boundaries shift). Same
    shifted-slice ``zip_with`` fold as :func:`_sentence_spans`."""

    def fold(ts):
        m = F.size(ts) - (l - 1)
        acc = F.zip_with(
            F.slice(ts, 1, m),
            F.slice(ts, 2, m),
            lambda x, y: F.concat(x, F.lit(_SPAN_SEP), y),
        )
        for k in range(2, l):
            acc = F.zip_with(
                acc, F.slice(ts, k + 1, m), lambda x, y: F.concat(x, F.lit(_SPAN_SEP), y)
            )
        return acc

    return _bind(
        _tokens(col),
        lambda ts: F.when(F.size(ts) >= l, fold(ts)).otherwise(
            F.array().cast("array<string>")
        ),
    )


def exact_substring_runs(
    docs: DataFrame, l: int = 8, min_count: int = 2
) -> DataFrame:
    """Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") ExactSubstr artifact: the maximal duplicated token runs of the
    corpus. Every ``l``-token window occurring ≥ ``min_count`` times —
    counting TOTAL occurrences, so within-document repetition counts,
    unlike :func:`duplicate_passages`' distinct-document frequency — marks
    its tokens covered; covered indices merge into maximal runs per doc.
    Any duplicated substring of ≥ l tokens has all of its l-windows
    duplicated, so the merged run recovers the full substring (the paper's
    suffix-array output at window granularity). Output: (doc_id,
    run_start, run_end, run_len), 0-based inclusive token indices.

    Scale: one corpus-position-linear explode + a count partial agg keyed
    on the window string (at 100 TB hash the key — the
    :func:`_hashed_shingles` note) + one semi join back. NO pair expansion
    at any fan-in: a window occurring k times contributes k covered rows,
    linear in corpus positions where the pair family is quadratic per
    bucket. The island merge is intra-row, bounded by each doc's own token
    count (collect_set of the doc's own covered window starts — same bound
    argument as :func:`c4_span_dedup`).

    Reference analog: the frame near-dup keep-chain drops repeated OCR text
    (`phase 2/src/cleanup.py`); this is the corpus-level exact-substring
    generalisation the training-data literature applies before training.
    """
    base = docs.select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    occ = base.select(
        "doc_id", F.posexplode(_token_windows(F.col("text"), l)).alias("start", "k")
    )
    hot = (
        occ.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= min_count)
        .select("k")
    )
    cov = occ.join(hot, "k").groupBy("doc_id").agg(F.collect_set("start").alias("starts"))
    covered = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(F.col("starts"), lambda s: F.sequence(s, s + F.lit(l - 1)))
            )
        )
    )
    # gaps-and-islands intra-row: an element opens a run iff its
    # predecessor is absent, closes one iff its successor is absent
    # (out-of-range F.get is NULL; the boundary arm of the OR is then true)
    runs = _bind(
        covered,
        lambda cv: F.zip_with(
            F.filter(cv, lambda x, i: (i == F.lit(0)) | (F.get(cv, i - 1) != x - 1)),
            F.filter(cv, lambda x, i: (i == F.size(cv) - 1) | (F.get(cv, i + 1) != x + 1)),
            lambda s, e: F.struct(s.alias("run_start"), e.alias("run_end")),
        ),
    )
    out = cov.select("doc_id", F.explode(runs).alias("r"))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("r.run_start").cast("long").alias("run_start"),
        F.col("r.run_end").cast("long").alias("run_end"),
        (F.col("r.run_end") - F.col("r.run_start") + 1).cast("long").alias("run_len"),
    )


def _winnow_fps(col, k: int = 3, w: int = 4):
    """Winnowing fingerprint array for one document (Schleimer et al.
    2003, the MOSS local algorithm): POSITIONAL word-k-gram hashes (one
    md5 per token, 32-bit slice, polynomial-combined — the portable
    minhash construction, but kept in order), then the minimum of every
    w-hash window, deduplicated. GUARANTEE: two documents sharing any
    token run of length ≥ w + k − 1 share at least one fingerprint.
    Documents with ≥1 but < w k-grams contribute the min of what they
    have; < k tokens → no fingerprints."""
    th = F.transform(
        _tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )

    def kgrams(arr):
        m = F.size(arr) - (k - 1)
        acc = F.zip_with(
            F.slice(arr, 1, m), F.slice(arr, 2, m),
            lambda x, y: F.pmod(x * F.lit(MH_C) + y, F.lit(MH_P)),
        )
        for j in range(2, k):
            acc = F.zip_with(
                acc, F.slice(arr, j + 1, m),
                lambda x, y: F.pmod(x * F.lit(MH_C) + y, F.lit(MH_P)),
            )
        return acc

    kh = F.when(F.size(th) >= k, _bind(th, kgrams)).otherwise(
        F.array().cast("array<long>")
    )

    def windows(karr):
        return (
            F.when(
                F.size(karr) >= w,
                F.transform(
                    F.sequence(F.lit(1), F.size(karr) - (w - 1)),
                    lambda i: F.array_min(F.slice(karr, i, w)),
                ),
            )
            .when(F.size(karr) >= 1, F.array(F.array_min(karr)))
            .otherwise(F.array().cast("array<long>"))
        )

    return F.array_distinct(_bind(kh, windows))


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """(doc_id, fp) winnowing fingerprints — the substring-match index
    rows. Zero shuffle; one Arrow-batched kernel with a per-batch
    token-md5 MEMO (Zipf: one md5 per distinct token per batch) and an
    O(n) deque window minimum — the classifier_score lesson applied
    preemptively: the Catalyst-expression twin (_winnow_fps, kept for
    the plan-shape docs and pinned equal by test) pays the md5 chain and
    the slice+array_min per position through the interpreted HOF
    evaluator (suite line 4.6 s -> 3.1 s at sf0.1, identical rows; the
    residual wall is winnow_pairs' pair-expansion join, not hashing)."""
    import hashlib
    from collections import deque
    from typing import Iterator

    import re

    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in it:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in java_ws.split((text or "").lower()) if t]
                th = []
                for t in toks:
                    h = memo.get(t)
                    if h is None:
                        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                        memo[t] = h
                    th.append(h)
                if len(th) < k:
                    continue
                kh = []
                for i in range(len(th) - k + 1):
                    acc = th[i]
                    for j in range(1, k):
                        acc = (acc * MH_C + th[i + j]) % MH_P
                    kh.append(acc)
                if len(kh) < w:
                    out = {min(kh)}
                else:
                    out = set()
                    dq: deque = deque()  # (index, value), increasing values
                    for i, v in enumerate(kh):
                        while dq and dq[-1][1] >= v:
                            dq.pop()
                        dq.append((i, v))
                        if dq[0][0] <= i - w:
                            dq.popleft()
                        if i >= w - 1:
                            out.add(dq[0][1])
                for fp in out:
                    ids.append(doc_id)
                    fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fp": pd.Series(fps, dtype="int64")})

    return docs.select("doc_id", "text").mapInPandas(
        _batches, "doc_id long, fp long"
    )


def winnow_fingerprints_expr(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """The pure Catalyst-expression twin of winnow_fingerprints (the
    _winnow_fps HOF chain) — slower (interpreted per-element), kept as
    the cross-implementation pin: tests assert identical rows."""
    return docs.select(
        "doc_id", F.explode(_winnow_fps(F.col("text"), k, w)).alias("fp")
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = MAX_DOCS_PER_SHINGLE,
) -> DataFrame:
    """Near-dup / plagiarism candidate pairs by shared winnowing
    fingerprints (≥ ``min_shared``): the guaranteed-detection variant of
    the shingle blocking — any shared token run of length ≥ w + k − 1
    forces a shared fingerprint, so long verbatim overlaps CANNOT slip
    through the way a sampled minhash band can miss them.

    Blocking mirrors ngram_jaccard_pairs: explode fingerprints, drop hot
    ones (df > ``max_docs_per_fp``) via count + anti-join BEFORE any
    pair expansion, self-join per fingerprint, count shared per pair.
    Output: (doc_a, doc_b, n_shared), doc_a < doc_b."""
    fps = winnow_fingerprints(docs, k, w)
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_docs_per_fp)
        .select("fp")
    )
    cold = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = cold.select("fp", F.col("doc_id").alias("doc_a"))
    b = cold.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def cdc_chunks(docs: DataFrame, mask: int = 31) -> DataFrame:
    """Content-defined chunking at token granularity (the LBFS/gear-hash
    family, Muthitacharoen et al. 2001 — the storage-dedup splitter): a
    token whose 32-bit md5 slice satisfies ``hash % (mask+1) == 0`` ends
    its chunk, so boundaries depend only on LOCAL content. Insertions or
    prefix shifts re-chunk only the neighborhood they touch — every chunk
    outside it keeps its hash (pinned by test) — which is exactly why CDC
    beats fixed-size blocks for dedup of shifted/edited documents.
    Expected chunk length = mask+1 tokens.

    Output: (doc_id, chunk_idx, chunk_hash, n_tokens) — chunk_hash the md5
    of the space-joined chunk tokens.

    Scale: zero shuffle — one md5-per-token transform, starter flags →
    exprs.segments (the O(n) grouping primitive; an appending fold would
    be O(n²)), one slice+md5 per chunk, one posexplode. The Arrow-kernel
    rewrite (classifier_score's memo pattern) is the upgrade path if the
    per-token interpreted HOF cost ever dominates a profile."""
    from ..functions.exprs import segments

    toks = _tokens(F.col("text"))

    def chunked(tk):
        th = F.transform(
            tk, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )

        def build(h):
            segs = segments(
                tk,
                lambda _a, i: F.when(i == 1, F.lit(True)).otherwise(
                    F.element_at(h, (i - 1).cast("int")) % (mask + 1) == 0
                ),
            )
            return F.transform(
                segs,
                lambda s: F.struct(
                    F.md5(
                        F.array_join(
                            F.slice(tk, s["a"], (s["b"] - s["a"]).cast("int")), " "
                        )
                    ).alias("chunk_hash"),
                    (s["b"] - s["a"]).cast("long").alias("n_tokens"),
                ),
            )

        return _bind(th, build)

    base = docs.select("doc_id", toks.alias("tk")).where(F.size("tk") >= 1)
    return base.select(
        "doc_id", F.posexplode(chunked(F.col("tk"))).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.chunk_hash").alias("chunk_hash"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def cdc_dedup_stats(docs: DataFrame, mask: int = 31) -> DataFrame:
    """Cross-corpus CDC chunk dedup profile: per chunk_hash, how many
    (doc, position) occurrences and how many distinct docs carry it —
    the storage-dedup ratio input (Σ(df−1)·n_tokens is the dedupable
    mass). One chunk-hash shuffle, partial-agg combined."""
    ch = cdc_chunks(docs, mask)
    return ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("n_tokens"),
    )


def ngram_novelty(docs: DataFrame) -> DataFrame:
    """Per-document n-gram novelty against everything ingested BEFORE it
    (order = doc_id): what fraction of a document's distinct word
    3-grams appears in no earlier document. The corpus-growth diagnostic
    the pair-expanding dedup family doesn't answer — "how much of each
    new document is new text" — and the curve dataset audits plot to
    decide when a crawl stops paying for itself (marginal novelty → 0
    means further ingestion is re-buying the same text).

    Output: (doc_id, n_ngrams, n_novel, novelty_bp) with novelty_bp =
    (10000·n_novel) DIV n_ngrams; docs with < 3 tokens emit n_ngrams = 0
    and the −1 sentinel (never NULL — the pandas NaN-hash trap). A
    verbatim duplicate of an earlier doc scores 0; the FIRST copy keeps
    its full score (min attribution, like keep-first dedup).

    Scale: shingles shuffle as the 62-bit packed hashes of
    :func:`_shingle_hash_pairs` (never strings — the ngram_jaccard_pairs
    discipline; the DuckDB oracle specs the string form, identical modulo
    hash collisions exactly as there). First-owner is ONE map-side
    partial min per hash — hot n-grams (stop-phrases) cost one bounded
    aggregation row each, never a bucket expansion, so no hot-cap is
    needed. The attribution join keys on the 8-byte hash; the per-doc
    rollup rides partial aggregation."""
    sh = docs.select(
        "doc_id", F.explode(_shingle_hash_pairs(F.col("text"))).alias("hh")
    )
    first = sh.groupBy("hh").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "hh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.coalesce(
                F.expr("(10000 * n_novel) DIV n_ngrams"), F.lit(-1)
            )
            .cast("long")
            .alias("novelty_bp"),
        )
    )
