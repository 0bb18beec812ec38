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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def _bucket_pairs(df, *keys: str):
    """(doc_a, doc_b) pairs sharing a bucket key — via groupBy + within-
    bucket pair expansion instead of a self-join: singleton buckets (the
    vast majority) never enter a shuffle-join, and each bucket's pairs are
    generated locally. One shuffle total (the groupBy)."""
    grouped = (
        df.groupBy(*keys)
        .agg(F.collect_list("doc_id").alias("ds"))
        .where(F.size("ds") > 1)
    )
    return (
        grouped.select(F.explode("ds").alias("doc_a"), F.col("ds"))
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
    )


def _word_shingles(col, n: int = 3):
    """Distinct word n-grams of the lowercased text (empty when fewer than
    n tokens — note F.sequence(1, 0) would DESCEND, so it must be guarded)."""
    toks = _tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))),
    ).otherwise(F.array().cast("array<string>"))


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


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, min_jaccard_bp: int = 6000) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard ≥ threshold (basis points).

    Blocking: explode distinct shingles → self-equi-join on shingle →
    count shared shingles per pair → Jaccard from inclusion-exclusion.
    """
    sh = docs.select(
        "doc_id", F.explode(_word_shingles(F.col("text"), n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = _bucket_pairs(sh, "shingle").groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_shared")
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")).alias("n_union"),
            F.floor(
                F.col("n_shared") * 10000.0
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared"))
            )
            .cast("long")
            .alias("jaccard_bp"),
        )
        .where(F.col("jaccard_bp") >= min_jaccard_bp)
    )
    return out


N_MINHASH = 16
LSH_BANDS = 4  # 4 bands × 4 rows


def _portable_hash(col, seed: int):
    """First 15 hex digits of md5(seed||value) as bigint — identical in
    Spark (conv) and DuckDB ('0x'||… cast), so oracles can recompute."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), col)), 1, 15), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: min over shingles of h_i(shingle)."""
    sh = docs.select("doc_id", F.explode(_word_shingles(F.col("text"))).alias("shingle"))
    aggs = [F.min(_portable_hash(F.col("shingle"), i)).alias(f"mh{i}") for i in range(n_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = N_MINHASH, bands: int = LSH_BANDS) -> DataFrame:
    """Candidate pairs that collide in ≥1 LSH band (band = md5 of its rows'
    signature values), deduped. Verification against true Jaccard is the
    consumer's second stage (see ngram_jaccard_pairs)."""
    sig = minhash_signatures(docs, n_hashes)
    rows_per_band = n_hashes // bands
    band_cols = []
    for bI in range(bands):
        parts = [F.col(f"mh{bI * rows_per_band + j}").cast("string") for j in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(bI).alias("band"), F.md5(F.concat_ws("_", *parts)).alias("bkey"))
        )
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )
    return _bucket_pairs(banded, "band", "bkey").distinct()


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


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs: SimHash band collision candidates filtered by true
    hamming distance ≤ max_hamming."""
    sim = simhash(docs)
    banded = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("bkey")) for i in range(4)])
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    # within-bucket pair expansion (see _bucket_pairs), carrying the hashes
    grouped = (
        banded.groupBy("band", "bkey")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    cand = (
        grouped.select(F.explode("ds").alias("a"), F.col("ds"))
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
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
