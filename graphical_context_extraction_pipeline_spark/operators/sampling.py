"""Deterministic corpus sampling, splitting, and sequence packing — the
batch-preparation operators a training-data pipeline runs after curation.

All assignment decisions derive from the portable md5 bucket hash (first 15
hex digits of md5(salt || key) as bigint, same construction as the dedup
family) so the DuckDB oracle recomputes every bucket bit-for-bit and the
assignment is stable across runs, engines, and partitionings — re-running
the pipeline on a grown corpus never reassigns an existing document's
split/sample (the property per-partition `rand()` cannot give you).

Scale notes:
  - hash_split / stratified_sample are pure narrow projections + filters —
    zero shuffle, fully pushed into the scan stage.
  - pack_sequences shuffles once on the salt bucket; each bucket packs
    independently in an Arrow-batched grouped-map kernel. Bucket count is a
    caller knob: size it so a bucket's docs fit one task (at 100 TB,
    n_buckets ≈ corpus_tokens / (budget · seqs_per_task) keeps groups
    bounded); packing quality is unaffected because bins never span buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _tokens


def hash_bucket(col, salt: str, mod: int):
    """Deterministic bucket in [0, mod): first 15 hex digits of
    md5(salt || value) as bigint, modulo `mod`. Identical in DuckDB as
    cast(('0x' || substr(md5(salt || cast(v AS varchar)), 1, 15)) AS bigint) % mod.
    """
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10
        ).cast("long"),
        F.lit(mod),
    )


def hash_split(docs: DataFrame, train_bp: int = 9600, val_bp: int = 9800) -> DataFrame:
    """Deterministic train/val/test split by content-independent doc_id hash:
    bucket = md5-bucket(doc_id) in [0, 10000); split boundaries in basis
    points (defaults 96% / 2% / 2%). Narrow, zero-shuffle, stable under
    corpus growth."""
    b = hash_bucket(F.col("doc_id"), "split:", 10000)
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < train_bp, F.lit("train"))
        .when(b < val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(
    docs: DataFrame, rates_bp: dict[str, int], default_bp: int = 0
) -> DataFrame:
    """Deterministic per-stratum (language) downsample: keep a doc iff its
    md5 bucket (salt 'sample:') falls below the stratum's rate in basis
    points. Gives exact-in-expectation per-language fractions with zero
    shuffle and reproducible membership."""
    b = hash_bucket(F.col("doc_id"), "sample:", 10000)
    rate = F.lit(default_bp)
    for lang, bp in sorted(rates_bp.items()):
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", b.alias("bucket"), rate.alias("rate_bp"))
        .where(F.col("bucket") < F.col("rate_bp"))
        .select("doc_id", "lang", "bucket")
    )


def pack_sequences(docs: DataFrame, budget: int = 512, n_buckets: int = 8) -> DataFrame:
    """Greedy first-fit-sequential sequence packing: assign docs to fixed
    token-budget training sequences (bins). Docs are dealt to `n_buckets`
    salt buckets by doc_id hash; within a bucket, docs are visited in
    doc_id order and a new bin opens exactly when the incumbent bin's fill
    plus the doc's whitespace-token count would exceed `budget` (an
    oversize doc therefore always occupies a singleton bin). Emits one row
    per doc: (doc_id, bucket, n_tokens, seq_idx, fill) with `fill` the
    bin's running token total after the doc is placed.

    The per-bucket fold is inherently sequential (a reset-on-overflow
    cumulative sum — not window-expressible), so it runs as an
    Arrow-batched grouped-map kernel; everything before it is JVM-side.
    The DuckDB oracle replays the identical fold as a recursive CTE, so
    this stays a fully independently-checked operator despite the kernel.
    """
    base = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "pack:", n_buckets).alias("bucket"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, fills = [], []
        seq, fill = 0, None
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n > budget:
                seq, fill = seq + 1, n
            else:
                fill += n
            seqs.append(seq)
            fills.append(fill)
        pdf["seq_idx"] = pd.Series(seqs, dtype="int64")
        pdf["fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return base.groupBy("bucket").applyInPandas(
        _pack, "doc_id long, bucket long, n_tokens long, seq_idx long, fill long"
    )
