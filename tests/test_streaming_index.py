"""Streaming index maintenance (streaming/index.py): after N micro-batches
the streamed index is bit-identical to batch-indexing the union corpus —
the delta-merge law carried across foreachBatch epochs."""

import glob
import os
import shutil
import time

from graphical_context_extraction_pipeline_spark.operators.search import inverted_index
from graphical_context_extraction_pipeline_spark.streaming.index import (
    read_current_index,
    stream_index_maintenance,
)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_streamed_index_equals_batch_rebuild(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, "grow cold a"), (2, "grow cold"), (3, "grow b")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(101, "grow fresh"), (102, "grow"), (103, "grow c"), (104, "newtok")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    idx_dir = str(tmp_path / "index")
    cap = 4  # 'grow' crosses the hot cap only through the second batch
    q = stream_index_maintenance(
        spark, in_dir, idx_dir, str(tmp_path / "ckpt"), cap=cap
    )
    q.awaitTermination(180)

    got = {
        r.token: (r.df, r.total_tf, r.postings)
        for r in read_current_index(spark, idx_dir).collect()
    }
    want = {
        r.token: (r.df, r.total_tf, r.postings)
        for r in inverted_index(b1.unionAll(b2), cap=cap).collect()
    }
    assert got == want
    assert got["grow"][2] == ""  # went hot via streamed growth
    assert got["cold"][2] == "1\x1f2"
    # two epochs committed, pointer names the latest version
    assert len(glob.glob(os.path.join(idx_dir, "v*"))) == 2


def test_epoch_replay_is_idempotent_noop(spark, tmp_path):
    """Crash between pointer swap and checkpoint commit ⇒ foreachBatch
    re-runs the epoch. The replay must neither double-merge df/total_tf
    nor rewrite the version directory the standing index lives in."""
    from graphical_context_extraction_pipeline_spark.streaming.index import (
        _read_pointer,
        merge_epoch,
    )

    idx_dir = str(tmp_path / "index")
    os.makedirs(idx_dir)
    b1 = spark.createDataFrame([(1, "a b"), (2, "a")], "doc_id long, text string")
    b2 = spark.createDataFrame([(101, "a c")], "doc_id long, text string")

    assert merge_epoch(spark, idx_dir, b1, 0) is True
    assert merge_epoch(spark, idx_dir, b2, 1) is True
    snapshot = {
        r.token: (r.df, r.total_tf, r.postings, r.tfs)
        for r in read_current_index(spark, idx_dir).collect()
    }
    assert snapshot["a"] == (3, 3, "1\x1f2\x1f101", "1\x1f1\x1f1")

    # replay epoch 1 (and a stale epoch 0): both refuse to merge
    assert merge_epoch(spark, idx_dir, b2, 1) is False
    assert merge_epoch(spark, idx_dir, b1, 0) is False
    assert _read_pointer(idx_dir)["epoch_id"] == 1
    after = {
        r.token: (r.df, r.total_tf, r.postings, r.tfs)
        for r in read_current_index(spark, idx_dir).collect()
    }
    assert after == snapshot

    # the NEXT epoch still merges normally
    b3 = spark.createDataFrame([(201, "a")], "doc_id long, text string")
    assert merge_epoch(spark, idx_dir, b3, 2) is True
    final = {r.token: r.df for r in read_current_index(spark, idx_dir).collect()}
    assert final["a"] == 4


def test_prune_versions_keeps_current_and_window(spark, tmp_path):
    """Pruning bounds disk growth: old versions vanish, the pointer's
    version (and the keep_last-1 before it) survive, replay refusal is
    unaffected, and pruning an embindex store works identically (shared
    pointer protocol)."""
    from graphical_context_extraction_pipeline_spark.streaming.index import (
        _read_pointer,
        list_versions,
        merge_epoch,
        prune_versions,
    )

    idx_dir = str(tmp_path / "index")
    os.makedirs(idx_dir)
    docs = lambda i: spark.createDataFrame(  # noqa: E731
        [(i * 10, f"cat dog{i}")], "doc_id long, text string"
    )
    for e in range(4):
        assert merge_epoch(spark, idx_dir, docs(e), e) is True
    assert list_versions(idx_dir) == [f"v{e:010d}" for e in range(4)]

    removed = prune_versions(idx_dir, keep_last=2)
    assert removed == ["v0000000000", "v0000000001"]
    assert list_versions(idx_dir) == ["v0000000002", "v0000000003"]
    # pointer untouched; current still reads; replay still refused
    assert _read_pointer(idx_dir)["version"] == "v0000000003"
    assert read_current_index(spark, idx_dir).count() > 0
    assert merge_epoch(spark, idx_dir, docs(0), 0) is False
    # keep_last=1 leaves only the current version
    assert prune_versions(idx_dir, keep_last=1) == ["v0000000002"]
    assert list_versions(idx_dir) == ["v0000000003"]
    # idempotent / degenerate calls
    assert prune_versions(idx_dir, keep_last=1) == []
    assert prune_versions(str(tmp_path / "nowhere")) == []


def test_prune_never_removes_versions_newer_than_pointer(spark, tmp_path):
    """A crash can leave an in-flight version directory AHEAD of the
    pointer; pruning must not race the write that will overwrite it."""
    from graphical_context_extraction_pipeline_spark.streaming.index import (
        list_versions,
        merge_epoch,
        prune_versions,
    )

    idx_dir = str(tmp_path / "index")
    os.makedirs(idx_dir)
    docs = spark.createDataFrame([(1, "cat")], "doc_id long, text string")
    assert merge_epoch(spark, idx_dir, docs, 0) is True
    # simulate the in-flight write of epoch 1 (version exists, pointer not
    # yet swapped)
    os.makedirs(os.path.join(idx_dir, "v0000000001"))
    assert prune_versions(idx_dir, keep_last=1) == []
    assert list_versions(idx_dir) == ["v0000000000", "v0000000001"]


def test_unified_log_stream_adds_and_forgets(spark, tmp_path):
    """The CDC log shape: epoch 1 adds docs 1-3; epoch 2 adds doc 4 and
    forgets doc 2 — the final index equals the batch construction
    forget(delta(index(d1..3), d4), d2); replays are no-ops; an
    add+forget of the same doc within one epoch nets to absent."""
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators.search import (
        inverted_index as bidx,
        inverted_index_delta as bdelta,
        inverted_index_forget as bforget,
    )
    from graphical_context_extraction_pipeline_spark.streaming.index import (
        LOG_STREAM_DDL,
        apply_epoch,
        stream_index_log,
    )

    rows1 = [("add", i, f"cat tok{i}") for i in (1, 2, 3)]
    rows2 = [("add", 4, "cat fresh"), ("forget", 2, "cat tok2")]
    b1 = spark.createDataFrame(rows1, LOG_STREAM_DDL)
    b2 = spark.createDataFrame(rows2, LOG_STREAM_DDL)

    in_dir = str(tmp_path / "log")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))
    idx_dir = str(tmp_path / "index")
    q = stream_index_log(spark, in_dir, idx_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        r.token: (r.df, r.total_tf, r.postings, r.tfs)
        for r in read_current_index(spark, idx_dir).collect()
    }
    DDL = "doc_id long, text string"
    d13 = spark.createDataFrame([(i, f"cat tok{i}") for i in (1, 2, 3)], DDL)
    d4 = spark.createDataFrame([(4, "cat fresh")], DDL)
    f2 = spark.createDataFrame([(2, "cat tok2")], DDL)
    want = {
        r.token: (r.df, r.total_tf, r.postings, r.tfs)
        for r in bforget(bdelta(bidx(d13), d4), f2).collect()
    }
    assert got == want
    assert "tok2" not in got and got["cat"][0] == 3

    # replay refusal + same-epoch add+forget nets to absent
    idx2 = str(tmp_path / "index2")
    os.makedirs(idx2)
    both = spark.createDataFrame(
        [("add", 1, "solo here"), ("forget", 1, "solo here")], LOG_STREAM_DDL
    )
    assert apply_epoch(spark, idx2, both, 0) is True
    assert apply_epoch(spark, idx2, both, 0) is False
    assert read_current_index(spark, idx2).count() == 0


def test_streamed_positional_index_equals_rebuild(spark, tmp_path):
    """The SAME epoch machinery maintains the phrase-serving index: after
    two micro-batches the streamed positional index equals a batch
    rebuild, and phrase_from_index serves identically from it."""
    from graphical_context_extraction_pipeline_spark.operators.search import (
        phrase_from_index,
        positional_index,
        positional_index_delta,
    )

    b1 = spark.createDataFrame(
        [(1, "grow a vector spark"), (2, "grow vector")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(101, "grow fresh vector spark vector"), (102, "grow")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    idx_dir = str(tmp_path / "pindex")
    q = stream_index_maintenance(
        spark, in_dir, idx_dir, str(tmp_path / "pckpt"), cap=3,
        build=positional_index, delta=positional_index_delta,
    )
    q.awaitTermination(180)
    streamed = read_current_index(spark, idx_dir)
    rebuilt = positional_index(b1.unionAll(b2), cap=3)
    got = {r["token"]: (r["df"], r["postings"], r["poslists"]) for r in streamed.collect()}
    want = {r["token"]: (r["df"], r["postings"], r["poslists"]) for r in rebuilt.collect()}
    assert got == want
    assert got["grow"][1] == ""  # hot via streamed growth
    served = {(r["doc_id"], r["n_hits"])
              for r in phrase_from_index(streamed, "vector spark", k=10).collect()}
    assert served == {(1, 1), (101, 1)}
