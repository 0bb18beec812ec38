"""Streaming interleaved ingest (streaming/mmingest.py): the union of
per-epoch status outputs equals batch mm_curate over the union corpus on
fixtures where every cluster member has a direct edge to an earlier
member (the regime the module's merge law covers), dup chains work
THROUGH retained duplicate postings, and epoch replay is a no-op."""

import glob
import os
import shutil
import time

from graphical_context_extraction_pipeline_spark.operators import multimodal as MM
from graphical_context_extraction_pipeline_spark.streaming.mmingest import (
    mm_ingest_epoch,
    stream_mm_ingest,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
LONG = "w " * 120  # 120 tokens, 240 chars — clears the text floor


def _doc(doc_id, refs, with_text=True):
    spans = []
    if with_text:
        spans.append({"kind": "asr", "text": LONG.strip(), "media_ref": None, "offset": 0})
    for i, r in enumerate(refs):
        spans.append(
            {"kind": "frame", "text": None, "media_ref": r, "offset": 10 + 20 * i}
        )
        # interleave a text span after each frame so media runs stay short
        spans.append(
            {"kind": "asr", "text": "x", "media_ref": None, "offset": 20 + 20 * i}
        )
    return (doc_id, spans)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def _statuses(df):
    return {(r["doc_id"], r["status"]) for r in df.collect()}


def test_streamed_mm_ingest_equals_batch_curate(spark, tmp_path):
    b1 = spark.createDataFrame(
        [
            _doc("doc_a", ["r1", "r2", "r3"]),
            _doc("doc_b", ["q1", "q2"]),
            # gate-rejected (no text): its assets must never enter the state
            _doc("doc_x", ["r1", "r2", "r3"], with_text=False),
        ],
        SPAN_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            # cross-batch dup of doc_a (2/3 shared → 6666 bp)
            _doc("doc_c", ["r1", "r2"]),
            # within-batch dup pair: doc_d < doc_e, doc_e loses
            _doc("doc_d", ["s1", "s2", "s3"]),
            _doc("doc_e", ["s1", "s2"]),
            # unpaired
            _doc("doc_f", ["t1"]),
        ],
        SPAN_SCHEMA,
    )
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    store = str(tmp_path / "store")
    q = stream_mm_ingest(spark, in_dir, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = _statuses(spark.read.parquet(os.path.join(store, "statuses", "v*")))
    want = _statuses(MM.mm_curate(b1.unionAll(b2)))
    assert got == want  # merge law on direct-edge-to-earlier fixtures
    by_id = dict(got)
    assert by_id["doc_c"] == "media_dup"  # cross-batch
    assert by_id["doc_e"] == "media_dup"  # within-batch, later id loses
    assert by_id["doc_x"] == "rejected"
    assert by_id["doc_a"] == by_id["doc_d"] == by_id["doc_f"] == "kept"
    # two epochs committed
    assert len(glob.glob(os.path.join(store, "assets", "v*"))) == 2


def test_dup_chain_through_retained_postings(spark, tmp_path):
    """b ~ a (dup), c ~ b only: c must still be media_dup because dup
    postings stay in the state (the closure's chain-through-dup case)."""
    store = str(tmp_path / "store2")
    os.makedirs(store)
    b1 = spark.createDataFrame(
        [_doc("doc_a", ["r1", "r2", "r3", "r4"])], SPAN_SCHEMA
    )
    # b shares 3/4 with a (≥ 5000 bp); c shares 2/3 with b but only 2/4
    # with a (3333+1666... r1,r2 of a's 4 → 2/(4+2-2)=5000 — avoid: use
    # refs overlapping b's tail asset that a lacks)
    b2 = spark.createDataFrame(
        [_doc("doc_b", ["r2", "r3", "r4", "r9"])], SPAN_SCHEMA
    )
    b3 = spark.createDataFrame([_doc("doc_c", ["r4", "r9"])], SPAN_SCHEMA)
    assert mm_ingest_epoch(spark, store, b1, 0)
    assert mm_ingest_epoch(spark, store, b2, 1)
    assert mm_ingest_epoch(spark, store, b3, 2)
    got = dict(_statuses(spark.read.parquet(os.path.join(store, "statuses", "v*"))))
    assert got["doc_a"] == "kept"
    assert got["doc_b"] == "media_dup"  # 3 shared / 5 union = 6000 bp vs a
    # c vs b: 2 shared / 4 union = 5000 bp — only reachable because b's
    # postings were retained; c vs a: 1/5 = 2000 bp
    assert got["doc_c"] == "media_dup"


def test_prune_asset_versions(spark, tmp_path):
    from graphical_context_extraction_pipeline_spark.streaming.mmingest import (
        prune_asset_versions,
    )

    store = str(tmp_path / "store4")
    os.makedirs(store)
    for e in range(3):
        b = spark.createDataFrame([_doc(f"doc_{e}", [f"r{e}"])], SPAN_SCHEMA)
        assert mm_ingest_epoch(spark, store, b, e)
    assert prune_asset_versions(store, keep_last=2) == ["v0000000000"]
    left = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(store, "assets", "v*"))
    )
    assert left == ["v0000000001", "v0000000002"]
    # statuses log untouched
    assert len(glob.glob(os.path.join(store, "statuses", "v*"))) == 3


def test_mm_ingest_epoch_replay_noop(spark, tmp_path):
    store = str(tmp_path / "store3")
    os.makedirs(store)
    b = spark.createDataFrame([_doc("doc_a", ["r1", "r2"])], SPAN_SCHEMA)
    assert mm_ingest_epoch(spark, store, b, 0)
    # replay of the same epoch (crash between pointer swap and checkpoint
    # commit) must not re-mark the batch's rows as duplicates
    assert not mm_ingest_epoch(spark, store, b, 0)
    got = _statuses(spark.read.parquet(os.path.join(store, "statuses", "v*")))
    assert got == {("doc_a", "kept")}
