"""Streaming interleaved-corpus ingest — the incremental twin of
``operators/multimodal.mm_curate`` (MMC4/OBELICS gate + media-asset
near-dup) with first-come-wins cross-batch dedup.

Each micro-batch of interleaved span documents computes the gate keep
decision on the spans row (the SAME ``gate_keep_col`` expression as
batch, identical by construction) and the media-asset duplicate decision
against BOTH the batch itself (smaller doc_id wins) and the STANDING
asset-posting state; the posting store then grows by the batch's
gate-passing docs and atomically swaps via the versioned-directory +
pointer protocol shared with ``streaming/curate.py`` (epoch recorded in
the pointer, so a foreachBatch replay after a crash between
``os.replace`` and the checkpoint commit is an idempotent no-op).

Dup semantics — the standard incremental regime (the same contract as
``dedup.minhash_incremental`` / ``neardup_incr_survivors``): a doc is
``media_dup`` iff it has a DIRECT pair (capped-shingle asset Jaccard ≥
threshold) with an EARLIER gate-passing doc (any seen doc, or an
in-batch doc with smaller doc_id). This coincides with batch
``mm_curate`` whenever every cluster member has a direct edge to an
earlier member (pinned by test); it diverges from the transitive closure
exactly where a doc's only edges point to LATER docs — the chain case no
online first-come rule can know about, documented rather than papered
over. Postings of duplicate docs are RETAINED in the state (matching the
closure's behaviour on chains through duplicates: A~B dup, C~B ⇒ C dup).

State bound: ONE row per (gate-passing doc, distinct frame asset) ever
ingested — the media analogue of the seen-keys text state; it lives in
parquet (corpus-scale state never in executor memory) and the per-batch
probe is one shingle-keyed join with the batch-side occupancy cap
(hot assets — site logos — cost ≤ ``max_docs_per_ref`` probe rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.multimodal import gate_keep_col, media_ref_postings

SPANS_STREAM_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

_POINTER = "CURRENT.json"
_POSTINGS_DDL = "doc_id string, shingle long, n_sh long"


def _read_pointer(store_dir: str) -> dict | None:
    ptr = os.path.join(store_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def _dup_against(
    batch_post: DataFrame,
    earlier_post: DataFrame,
    min_jaccard_bp: int,
    max_docs_per_ref: int,
    require_partner_lt: bool = False,
) -> DataFrame:
    """doc_ids of batch docs with a direct asset pair (Jaccard ≥ threshold
    on capped shingles) against the ``earlier_post`` relation. Shingles
    hotter than ``max_docs_per_ref`` in the earlier side are dropped from
    blocking — the batch side of ``dedup._set_jaccard_pairs``' cap.
    ``require_partner_lt`` restricts partners to smaller doc_ids (the
    within-batch first-come order)."""
    hot = (
        earlier_post.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") > max_docs_per_ref)
        .select("shingle")
    )
    cold = earlier_post.join(hot, "shingle", "left_anti")
    joined = (
        batch_post.alias("b")
        .join(cold.alias("e"), "shingle")
        .where(F.col("b.doc_id") != F.col("e.doc_id"))
    )
    if require_partner_lt:
        joined = joined.where(F.col("e.doc_id") < F.col("b.doc_id"))
    shared = (
        joined.groupBy(
            F.col("b.doc_id").alias("doc_id"),
            F.col("e.doc_id").alias("partner"),
            F.col("b.n_sh").alias("na"),
            F.col("e.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = (F.col("n_shared") * 10000) / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    return (
        shared.where(F.floor(jac).cast("long") >= min_jaccard_bp)
        .select("doc_id")
        .distinct()
    )


def mm_ingest_epoch(
    spark: SparkSession,
    store_dir: str,
    batch_df: DataFrame,
    epoch_id: int,
    min_jaccard_bp: int = 5000,
    max_docs_per_ref: int = 1024,
) -> bool:
    """One foreachBatch epoch (module-level so the replay contract is
    directly testable): returns False (idempotent no-op) when the pointer
    already records this epoch or a later one.

    Writes the batch's status rows to ``store_dir/statuses/v{epoch}`` and
    the grown asset-posting state to ``store_dir/assets/v{epoch}``, then
    swaps the pointer."""
    meta = _read_pointer(store_dir)
    if meta is not None and meta["epoch_id"] >= epoch_id:
        return False

    base = batch_df.where(F.size("spans") > 0).select(
        "doc_id", "spans", gate_keep_col().alias("keep")
    )
    kept_docs = base.where(F.col("keep")).select("doc_id", "spans")
    batch_post = media_ref_postings(kept_docs).localCheckpoint(eager=True)

    if meta is None:
        seen = spark.createDataFrame([], _POSTINGS_DDL)
    else:
        seen = spark.read.parquet(os.path.join(store_dir, "assets", meta["version"]))

    # earlier = any seen doc, or an in-batch doc with smaller doc_id —
    # two probes against the same capped-join shape
    dup_vs_seen = _dup_against(batch_post, seen, min_jaccard_bp, max_docs_per_ref)
    dup_in_batch = _dup_against(
        batch_post,
        batch_post,
        min_jaccard_bp,
        max_docs_per_ref,
        require_partner_lt=True,
    )
    dups = dup_vs_seen.unionByName(dup_in_batch).distinct().withColumn(
        "_dup", F.lit(True)
    )

    statuses = base.join(dups, "doc_id", "left").select(
        "doc_id",
        F.when(~F.col("keep"), F.lit("rejected"))
        .when(F.col("_dup"), F.lit("media_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )

    version = f"v{epoch_id:010d}"
    statuses.write.mode("overwrite").parquet(
        os.path.join(store_dir, "statuses", version)
    )
    grown = seen.unionByName(batch_post.select("doc_id", "shingle", "n_sh"))
    grown.write.mode("overwrite").parquet(os.path.join(store_dir, "assets", version))
    tmp = os.path.join(store_dir, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "epoch_id": epoch_id}, f)
    os.replace(tmp, os.path.join(store_dir, _POINTER))
    return True


def stream_mm_ingest(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    min_jaccard_bp: int = 5000,
    max_docs_per_ref: int = 1024,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Watch input_dir for new interleaved-document files; maintain the
    status log and the asset-posting store."""
    os.makedirs(store_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(SPANS_STREAM_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, eid: mm_ingest_epoch(
                spark, store_dir, df, eid, min_jaccard_bp, max_docs_per_ref
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def prune_asset_versions(store_dir: str, keep_last: int = 2) -> list[str]:
    """Bound the asset-posting store's disk growth (each epoch writes a
    FULL posting snapshot): delete old ``assets/v*`` directories keeping
    the pointer's current version, ``keep_last - 1`` before it, and
    anything newer than the pointer — the contract shared with
    streaming/curate.prune_key_versions. The ``statuses/v*`` log is NOT
    touched (accumulated output, not a rollback window); mm_ingest_epoch
    refuses replayed epochs before reading any version, so no reader
    dereferences a pruned snapshot."""
    import shutil

    from .index import list_versions

    meta = _read_pointer(store_dir)
    if meta is None or keep_last < 1:
        return []
    assets_dir = os.path.join(store_dir, "assets")
    versions = list_versions(assets_dir)
    if meta["version"] not in versions:
        return []
    cur = versions.index(meta["version"])
    doomed = versions[: max(0, cur - (keep_last - 1))]
    for v in doomed:
        shutil.rmtree(os.path.join(assets_dir, v))
    return doomed
