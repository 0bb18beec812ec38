"""Streaming curation (streaming/curate.py): the union of per-epoch
verdict outputs equals batch training_verdicts over the union corpus
(ascending doc_ids across batches), and epoch replay is a no-op."""

import glob
import os
import shutil
import time

from graphical_context_extraction_pipeline_spark.operators.curate import (
    training_verdicts,
)
from graphical_context_extraction_pipeline_spark.streaming.curate import (
    curate_epoch,
    stream_curation,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and that sentence have "
    "plenty of honest words with it to clear the gopher gates easily "
) * 3


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def _rows(df):
    return {
        (r["doc_id"], r["r_gopher"], r["r_classifier"], r["r_unique"], r["keep"])
        for r in df.collect()
    }


def test_streamed_curation_equals_batch_ladder(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, GOOD + "alpha"), (2, GOOD + "beta"), (3, "tiny")],
        "doc_id long, text string",
    )
    # 101 duplicates doc 1's text ACROSS batches; 103 duplicates 102 within
    b2 = spark.createDataFrame(
        [(101, GOOD + "alpha"), (102, GOOD + "gamma"), (103, GOOD + "gamma")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    store = str(tmp_path / "store")
    q = stream_curation(spark, in_dir, store, str(tmp_path / "ckpt"), min_mean_w_e3=0)
    q.awaitTermination(180)

    got = _rows(spark.read.parquet(os.path.join(store, "verdicts", "v*")))
    want = _rows(training_verdicts(b1.unionAll(b2), min_mean_w_e3=0))
    assert got == want
    by_id = {t[0]: t for t in got}
    assert not by_id[101][3]  # cross-batch duplicate loses uniqueness
    assert not by_id[103][3]  # within-batch duplicate loses to 102
    assert by_id[1][3] and by_id[102][3]
    # two epochs committed
    assert len(glob.glob(os.path.join(store, "keys", "v*"))) == 2


def test_curate_epoch_replay_noop(spark, tmp_path):
    store = str(tmp_path / "store2")
    os.makedirs(store)
    b = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    assert curate_epoch(spark, store, b, 0, min_mean_w_e3=0)
    # replay of the same epoch (crash between pointer swap and checkpoint
    # commit) must not re-mark the batch's rows as duplicates
    assert not curate_epoch(spark, store, b, 0, min_mean_w_e3=0)
    rows = _rows(spark.read.parquet(os.path.join(store, "verdicts", "v*")))
    assert rows == _rows(training_verdicts(b, min_mean_w_e3=0))
    # single write, and the row is unique (the replay wrote nothing)
    assert len(rows) == 1 and next(iter(rows))[3] is True


def test_prune_key_versions_keeps_current_and_log(spark, tmp_path):
    import glob

    from graphical_context_extraction_pipeline_spark.streaming.curate import (
        prune_key_versions,
    )

    store = str(tmp_path / "store3")
    os.makedirs(store)
    b1 = spark.createDataFrame([(1, GOOD + "one")], "doc_id long, text string")
    b2 = spark.createDataFrame([(2, GOOD + "two")], "doc_id long, text string")
    b3 = spark.createDataFrame([(3, GOOD + "one")], "doc_id long, text string")
    assert curate_epoch(spark, store, b1, 0, min_mean_w_e3=0)
    assert curate_epoch(spark, store, b2, 1, min_mean_w_e3=0)
    removed = prune_key_versions(store, keep_last=1)
    assert removed == ["v0000000000"]
    # current key snapshot and the FULL verdict log survive
    assert glob.glob(os.path.join(store, "keys", "v*")) == [
        os.path.join(store, "keys", "v0000000001")
    ]
    assert len(glob.glob(os.path.join(store, "verdicts", "v*"))) == 2
    # the store keeps working: epoch 2 still sees doc 1's key via the
    # surviving snapshot, so the cross-batch duplicate is caught
    assert curate_epoch(spark, store, b3, 2, min_mean_w_e3=0)
    rows = _rows(spark.read.parquet(os.path.join(store, "verdicts", "v0000000002")))
    assert rows == {(3, True, next(iter(rows))[2], False, False)}
