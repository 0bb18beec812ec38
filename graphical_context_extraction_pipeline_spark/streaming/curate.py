"""Streaming training-set curation — the incremental twin of
``operators/curate.training_verdicts`` (the FineWeb-style selection
ladder) with exact cross-batch keep-first dedup.

Each micro-batch computes the two stateless rungs per document (Gopher
rule bundle + hashed-classifier gate — pure projections, identical to
batch by construction) and the uniqueness rung against BOTH the batch
itself (min doc_id per dup_key) and the STANDING seen-keys relation; the
seen-keys set then grows by the batch's keys and atomically swaps via
the versioned-directory + pointer protocol shared with
``streaming/index.py`` (epoch recorded in the pointer, so a foreachBatch
replay after a crash between ``os.replace`` and the checkpoint commit is
an idempotent no-op — otherwise the batch's own keys would mark its
redelivered rows as duplicates).

Merge law (pinned by test): with doc_ids ascending across batches
(append-only ingest, the index twin's ordering contract), the union of
the per-epoch verdict outputs is row-identical to batch
``training_verdicts`` over the union corpus — "first ever by doc_id" and
"first batch, then first in batch" coincide.

State bound: the seen-keys relation holds ONE md5 per distinct document
text ever seen — the exact-dedup state every streaming ingest needs
anyway; it lives in parquet (corpus-scale state never in executor
memory), and the per-batch membership probe is one key-hashed join.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.text_analysis import classifier_score, gopher_rules

DOCS_STREAM_DDL = "doc_id long, text string"

_POINTER = "CURRENT.json"


def _read_pointer(store_dir: str) -> dict | None:
    ptr = os.path.join(store_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def curate_epoch(
    spark: SparkSession,
    store_dir: str,
    batch_df,
    epoch_id: int,
    min_mean_w_e3: int = 110_000,
    stopwords: list[str] | None = None,
) -> bool:
    """One foreachBatch epoch (module-level so the replay contract is
    directly testable): returns False (idempotent no-op) when the pointer
    already records this epoch or a later one.

    Writes the batch's verdict rows to ``store_dir/verdicts/v{epoch}``
    and the grown seen-keys set to ``store_dir/keys/v{epoch}``, then
    swaps the pointer."""
    meta = _read_pointer(store_dir)
    if meta is not None and meta["epoch_id"] >= epoch_id:
        return False

    g = gopher_rules(batch_df, stopwords=stopwords).select(
        "doc_id", F.col("keep").alias("r_gopher")
    )
    c = classifier_score(batch_df).select(
        "doc_id",
        (
            (F.col("n_feats") > 0)
            & (F.col("margin") * 1000 >= F.lit(int(min_mean_w_e3)) * F.col("n_feats"))
        ).alias("r_classifier"),
    )
    d = batch_df.select("doc_id", F.md5(F.lower("text")).alias("dup_key"))
    batch_canon = d.groupBy("dup_key").agg(F.min("doc_id").alias("canon"))
    if meta is None:
        seen = spark.createDataFrame([], "dup_key string")
    else:
        seen = spark.read.parquet(
            os.path.join(store_dir, "keys", meta["version"])
        )
    u = (
        d.join(batch_canon, "dup_key")
        .join(seen.withColumn("_seen", F.lit(True)), "dup_key", "left")
        .select(
            "doc_id",
            "dup_key",
            ((F.col("doc_id") == F.col("canon")) & F.col("_seen").isNull()).alias(
                "r_unique"
            ),
        )
    )
    verdicts = (
        g.join(c, "doc_id")
        .join(u.select("doc_id", "r_unique"), "doc_id")
        .select(
            "doc_id",
            "r_gopher",
            "r_classifier",
            "r_unique",
            (F.col("r_gopher") & F.col("r_classifier") & F.col("r_unique")).alias(
                "keep"
            ),
        )
    )
    version = f"v{epoch_id:010d}"
    verdicts.write.mode("overwrite").parquet(
        os.path.join(store_dir, "verdicts", version)
    )
    grown = seen.unionByName(d.select("dup_key")).distinct()
    grown.write.mode("overwrite").parquet(os.path.join(store_dir, "keys", version))
    tmp = os.path.join(store_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(store_dir, _POINTER))
    return True


def stream_curation(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    min_mean_w_e3: int = 110_000,
    stopwords: list[str] | None = None,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch input_dir for new document files; maintain the verdict log
    and the seen-keys store."""
    os.makedirs(store_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(DOCS_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, eid: curate_epoch(
                spark, store_dir, df, eid, min_mean_w_e3, stopwords
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def prune_key_versions(store_dir: str, keep_last: int = 2) -> list[str]:
    """Bound the seen-keys store's disk growth (each epoch writes a FULL
    key snapshot): delete old ``keys/v*`` directories keeping the
    pointer's current version, ``keep_last - 1`` before it, and anything
    newer than the pointer (in-flight crash writes are never raced) —
    the same contract as streaming/index.prune_versions. The
    ``verdicts/v*`` log is NOT touched: unlike the key snapshots, each
    verdict version holds different rows (it is the accumulated output,
    not a rollback window). curate_epoch refuses replayed epochs before
    reading any version, so no reader dereferences a pruned snapshot."""
    import shutil

    from .index import list_versions

    meta = _read_pointer(store_dir)
    if meta is None or keep_last < 1:
        return []
    keys_dir = os.path.join(store_dir, "keys")
    versions = list_versions(keys_dir)
    if meta["version"] not in versions:
        return []
    cur = versions.index(meta["version"])
    doomed = versions[: max(0, cur - (keep_last - 1))]
    for v in doomed:
        shutil.rmtree(os.path.join(keys_dir, v))
    return doomed
