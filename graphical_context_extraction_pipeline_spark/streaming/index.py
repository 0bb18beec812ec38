"""Streaming inverted-index maintenance — the incremental twin of
``operators/search.inverted_index`` via the delta-merge law.

Each micro-batch of documents folds into the standing index with
``search.inverted_index_delta`` inside ``foreachBatch``: the index lives as
a parquet relation that is read, merged with the batch's posting deltas
(only TOUCHED tokens shuffle — the standing index joins by token key),
and atomically swapped (write to a new versioned directory, then update
the pointer file — the same new-dir + swap discipline as
``export.compact_parquet``). Because the merge provably equals a full
rebuild over the union corpus (the index_delta merge-law oracle), the
streamed index after N micro-batches is bit-identical to batch-indexing
the whole corpus at once — pinned by test.

Exactly-once: foreachBatch can re-run an epoch on failure; the version
pointer is only advanced AFTER a successful write and records the epoch
id, and ``process_batch`` checks that recorded epoch FIRST — a replay of
an epoch the pointer has already absorbed (crash between ``os.replace``
and the streaming checkpoint commit) is an idempotent no-op, so the batch
can neither double-merge into ``df``/``total_tf`` nor overwrite the very
version directory the merge is lazily reading from.

Ordering contract (from inverted_index_delta): doc_ids ascend across
batches (append-only ingest), so posting concatenation preserves the
ascending order a rebuild would produce.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.search import (
    POSTINGS_CAP,
    inverted_index,
    inverted_index_delta,
    inverted_index_forget,
)

DOCS_STREAM_DDL = "doc_id long, text string"

_POINTER = "CURRENT.json"


def _read_pointer(index_dir: str) -> dict | None:
    """The pointer metadata ({version, epoch_id}), or None before the
    first epoch commits."""
    ptr = os.path.join(index_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def read_current_index(spark: SparkSession, index_dir: str):
    """The standing index the pointer names, or None before the first
    epoch commits."""
    meta = _read_pointer(index_dir)
    if meta is None:
        return None
    return spark.read.parquet(os.path.join(index_dir, meta["version"]))


def merge_epoch(
    spark: SparkSession,
    index_dir: str,
    batch_df,
    epoch_id: int,
    cap: int = POSTINGS_CAP,
    build=None,
    delta=None,
) -> bool:
    """One foreachBatch epoch, module-level so the replay contract is
    directly testable: returns True if the batch was merged, False when
    the pointer shows this epoch (or a later one) already absorbed —
    a replay after a crash between ``os.replace`` and the checkpoint
    commit must be an idempotent no-op, because merging again would
    double df/total_tf AND overwrite the very version directory the
    delta-merge lazily reads.

    ``build``/``delta`` default to the BM25 index pair; pass
    (positional_index, positional_index_delta) to maintain the phrase-
    serving index under the identical epoch/pointer contract."""
    if build is None:
        build = inverted_index
    if delta is None:
        delta = inverted_index_delta
    meta = _read_pointer(index_dir)
    if meta is not None and meta["epoch_id"] >= epoch_id:
        return False
    if meta is None:
        merged = build(batch_df, cap=cap)
    else:
        current = spark.read.parquet(os.path.join(index_dir, meta["version"]))
        merged = delta(current, batch_df, cap=cap)
    version = f"v{epoch_id:010d}"
    merged.write.mode("overwrite").parquet(os.path.join(index_dir, version))
    tmp = os.path.join(index_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(index_dir, _POINTER))
    return True


def stream_index_maintenance(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cap: int = POSTINGS_CAP,
    max_files_per_trigger: int = 1,
    build=None,
    delta=None,
) -> StreamingQuery:
    """Watch input_dir for new document files; maintain the index
    (BM25 pair by default; pass the positional pair for phrase
    serving — same epoch/pointer/replay machinery)."""
    os.makedirs(index_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(DOCS_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        merge_epoch(
            spark, index_dir, batch_df, epoch_id, cap=cap, build=build, delta=delta
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def list_versions(index_dir: str) -> list[str]:
    """All committed version directories (``v``-prefixed, zero-padded so
    lexicographic == numeric order), ascending."""
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        d
        for d in os.listdir(index_dir)
        if d.startswith("v") and os.path.isdir(os.path.join(index_dir, d))
    )


def prune_versions(index_dir: str, keep_last: int = 2) -> list[str]:
    """Bound the versioned store's disk growth: delete old version
    directories, keeping the pointer's CURRENT version, ``keep_last - 1``
    versions immediately before it (rollback / time-travel window), and
    anything NEWER than the pointer (a crash can leave an in-flight
    version directory ahead of the pointer; the next merge overwrites it,
    so pruning must never race that write). Returns the removed names.

    Safe against every replay in the epoch contract: merge_epoch refuses
    a replayed epoch BEFORE reading any version directory, so no reader
    ever dereferences a pruned version — the pointer is the only entry
    point and it always survives.
    """
    import shutil

    meta = _read_pointer(index_dir)
    if meta is None or keep_last < 1:
        return []
    versions = list_versions(index_dir)
    if meta["version"] not in versions:
        return []
    cur = versions.index(meta["version"])
    doomed = versions[: max(0, cur - (keep_last - 1))]
    for v in doomed:
        shutil.rmtree(os.path.join(index_dir, v))
    return doomed


LOG_STREAM_DDL = "op string, doc_id long, text string"


def apply_epoch(
    spark: SparkSession,
    index_dir: str,
    batch_df,
    epoch_id: int,
    cap: int = POSTINGS_CAP,
) -> bool:
    """One epoch of the unified maintenance LOG: the batch carries both
    'add' and 'forget' rows (CDC shape — one ordered request log, one
    writer, so merges and GDPR deletions share a single epoch sequence
    and the pointer's monotonicity check covers both). Within an epoch,
    adds apply before forgets (an add+forget of the same doc in one
    epoch nets to absent — the order a compliance log requires).

    Same replay contract as merge_epoch: pointer-recorded epochs are
    refused before any version read. Forget rows must reference
    previously indexed documents (the request ships the stored rows, as
    in corpus.forget_audit) — inverted_index_forget's contract.
    """
    from pyspark.sql import functions as F

    meta = _read_pointer(index_dir)
    if meta is not None and meta["epoch_id"] >= epoch_id:
        return False
    adds = batch_df.where(F.col("op") == "add").select("doc_id", "text")
    forgets = batch_df.where(F.col("op") == "forget").select("doc_id", "text")
    if meta is None:
        merged = inverted_index(adds, cap=cap)
    else:
        current = spark.read.parquet(os.path.join(index_dir, meta["version"]))
        merged = inverted_index_delta(current, adds, cap=cap)
    if forgets.limit(1).count() > 0:
        merged = inverted_index_forget(merged, forgets)
    version = f"v{epoch_id:010d}"
    merged.write.mode("overwrite").parquet(os.path.join(index_dir, version))
    tmp = os.path.join(index_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(index_dir, _POINTER))
    return True


def stream_index_log(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cap: int = POSTINGS_CAP,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch input_dir for new (op, doc_id, text) log files; maintain the
    index through adds AND forgets in one epoch sequence."""
    os.makedirs(index_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(LOG_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        apply_epoch(spark, index_dir, batch_df, epoch_id, cap=cap)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
