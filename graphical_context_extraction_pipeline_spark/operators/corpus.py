"""Corpus-management operators: snapshot comparison and shape profiling.

A training-data pipeline re-ingests its corpus continuously; these are the
operators that answer "what changed since the last snapshot" and "what does
the length distribution look like" without collecting anything to the
driver. Outputs are integer/string typed for hash-stable oracle comparison.
"""

from __future__ import annotations

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
