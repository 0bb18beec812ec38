"""Streaming embedding-ANN index maintenance: the vector-modality twin of
streaming/index.py (lexical) — an ingest stream of embeddings is
near-dup-gated against the standing multi-table sign-bucket index and the
ADMITTED vectors' banded rows are appended to it, epoch by epoch.

Per foreachBatch epoch:
  1. band the batch (similarity.lsh_bucket_multi — one vectorized scan);
  2. join against the standing index on (table, bucket), exact-cosine
     gate at ``min_cos_e4`` — a batch vector with any qualifying seen
     match is REJECTED (the candidate-level contract of
     dedup.neardup_incremental_survivors: collisions with rejected
     batch-mates don't disqualify);
  3. within the surviving batch, keep one canonical (min vec_id) per
     intra-batch near-dup pair group (same gate, batch × batch);
  4. append the admitted vectors' index rows, write version vN, swap the
     CURRENT.json pointer.

Exactly-once: identical contract to the lexical twin — the pointer
records the epoch id and ``merge_epoch`` refuses a replay of an epoch the
pointer already absorbed (idempotent no-op), so a crash between
``os.replace`` and the checkpoint commit can neither double-append nor
overwrite the version directory being read.

Scale note: each version here rewrites the merged index (mirrors the
lexical twin so the two modules stay one design); a production deployment
appends the admitted rows as a new file in an append-only table and lets
compaction merge — the pointer/epoch protocol is unchanged by that swap.

Batch ≡ stream law (pinned by test): after N epochs the admitted set
equals folding the same batches sequentially through
embedding_incremental_pairs + the intra-batch canonical rule in batch
mode.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import (
    EMB_DUP_PLANES,
    EMB_DUP_SEED,
    EMB_DUP_TABLES,
    EMB_MAX_BUCKET,
    _dot,
    _norm,
    lsh_bucket_multi,
)

# same {version dir, CURRENT.json pointer} protocol as the lexical twin,
# so its version listing / pruning apply verbatim to this store
from .index import list_versions, prune_versions  # noqa: F401

EMB_STREAM_DDL = "vec_id long, embedding array<float>, label int"

_POINTER = "CURRENT.json"


def _read_pointer(index_dir: str) -> dict | None:
    ptr = os.path.join(index_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def read_current_index(spark: SparkSession, index_dir: str):
    """The standing banded index (table, bucket, vec_id, embedding), or
    None before the first epoch commits."""
    meta = _read_pointer(index_dir)
    if meta is None:
        return None
    return spark.read.parquet(os.path.join(index_dir, meta["version"]))


def _cross_hits(new_b: DataFrame, index: DataFrame, min_cos_e4: int) -> DataFrame:
    """vec_ids of banded batch rows with a qualifying match in ``index``
    — hub-capped exactly like embedding_incremental_pairs: hot standing
    buckets are represented by their min-vec_id hub so per-batch-row
    fan-out stays bounded by EMB_MAX_BUCKET per table."""
    stats = index.groupBy("table", "bucket").agg(
        F.count("*").alias("n_members"), F.min("vec_id").alias("hub")
    )
    capped = (
        index.join(stats, ["table", "bucket"])
        .where(
            (F.col("n_members") <= EMB_MAX_BUCKET) | (F.col("vec_id") == F.col("hub"))
        )
        .select("table", "bucket", "vec_id", "embedding")
    )
    cand = (
        new_b.alias("n")
        .join(capped.alias("s"), ["table", "bucket"])
        .where(F.col("n.vec_id") != F.col("s.vec_id"))
        .select(
            F.col("n.vec_id").alias("vec_id"),
            F.col("n.embedding").alias("en"),
            F.col("s.embedding").alias("es"),
        )
    )
    cos = _dot(F.col("en"), F.col("es")) / (_norm(F.col("en")) * _norm(F.col("es")))
    return (
        cand.where(F.floor(cos * 10000).cast("long") >= min_cos_e4)
        .select("vec_id")
        .distinct()
    )


def admit_batch(
    batch: DataFrame,
    index: DataFrame | None,
    dim: int,
    min_cos_e4: int = 9000,
) -> DataFrame:
    """The banded index rows of the batch vectors that survive the gate
    (see module docstring steps 2–3); with no standing index, only the
    intra-batch canonical rule applies."""
    new_b = lsh_bucket_multi(
        batch, EMB_DUP_PLANES, EMB_DUP_TABLES, EMB_DUP_SEED, dim
    )
    if index is not None:
        seen_hits = _cross_hits(new_b, index, min_cos_e4)
        clean = new_b.join(seen_hits, "vec_id", "left_anti")
    else:
        clean = new_b
    # intra-batch: reject any survivor matching a SMALLER surviving id
    # (the min-id canonical of each pair group survives)
    smaller = clean.select(
        "table", "bucket", F.col("vec_id").alias("s_id"), F.col("embedding").alias("es")
    )
    pairs = (
        clean.alias("n")
        .join(smaller.alias("s"), ["table", "bucket"])
        .where(F.col("s.s_id") < F.col("n.vec_id"))
        .select(
            F.col("n.vec_id").alias("vec_id"),
            F.col("n.embedding").alias("en"),
            F.col("s.es").alias("es"),
        )
    )
    cos = _dot(F.col("en"), F.col("es")) / (_norm(F.col("en")) * _norm(F.col("es")))
    intra_hits = (
        pairs.where(F.floor(cos * 10000).cast("long") >= min_cos_e4)
        .select("vec_id")
        .distinct()
    )
    return clean.join(intra_hits, "vec_id", "left_anti").select(
        "table", "bucket", "vec_id", "embedding"
    )


def merge_epoch(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    epoch_id: int,
    dim: int,
    min_cos_e4: int = 9000,
) -> bool:
    """One epoch, module-level for direct replay testing (same contract
    as streaming/index.merge_epoch): returns False (no-op) when the
    pointer already covers this epoch."""
    meta = _read_pointer(index_dir)
    if meta is not None and meta["epoch_id"] >= epoch_id:
        return False
    current = (
        None
        if meta is None
        else spark.read.parquet(os.path.join(index_dir, meta["version"]))
    )
    admitted = admit_batch(batch, current, dim, min_cos_e4)
    merged = admitted if current is None else current.unionByName(admitted)
    version = f"v{epoch_id:010d}"
    merged.write.mode("overwrite").parquet(os.path.join(index_dir, version))
    tmp = os.path.join(index_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(index_dir, _POINTER))
    return True


def stream_embedding_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    dim: int,
    min_cos_e4: int = 9000,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch input_dir for new embedding files; maintain the gated index."""
    os.makedirs(index_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(EMB_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        merge_epoch(spark, index_dir, batch_df, epoch_id, dim, min_cos_e4)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
