"""Streaming embedding-index maintenance (streaming/embindex.py): after N
micro-batch epochs the admitted index equals folding the same batches
sequentially in batch mode; replays are no-ops; the gate rejects
near-dups of already-admitted vectors."""

import glob
import os
import shutil

from graphical_context_extraction_pipeline_spark.streaming.embindex import (
    _read_pointer,
    admit_batch,
    merge_epoch,
    read_current_index,
    stream_embedding_index,
)

DIM = 4
DDL = "vec_id long, embedding array<float>, label int"


def _vec(base, eps=0.0):
    return [float(x + eps) for x in base]


A = [1.0, 0.2, 0.1, 0.05]
B = [0.05, 1.0, 0.3, 0.2]
C = [-1.0, 0.5, -0.2, 0.4]


def _b1(spark):
    # 1 and 2 are near-dups of each other; 3 is distinct
    return spark.createDataFrame(
        [(1, _vec(A), 0), (2, _vec(A, 0.01), 0), (3, _vec(B), 0)], DDL
    )


def _b2(spark):
    # 101 duplicates the admitted 1 → rejected; 102 is fresh; 103 dups 102
    return spark.createDataFrame(
        [(101, _vec(A, 0.005), 0), (102, _vec(C), 0), (103, _vec(C, 0.01), 0)], DDL
    )


def _fold_batch_mode(spark, batches):
    idx = None
    for b in batches:
        adm = admit_batch(b, idx, DIM)
        idx = adm if idx is None else idx.unionByName(adm)
    return idx


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_streamed_embindex_equals_batch_fold(spark, tmp_path):
    import time

    in_dir = str(tmp_path / "vecs")
    os.makedirs(in_dir)
    _stage_file(_b1(spark), str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(_b2(spark), str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    idx_dir = str(tmp_path / "index")
    q = stream_embedding_index(spark, in_dir, idx_dir, str(tmp_path / "ckpt"), dim=DIM)
    q.awaitTermination(180)

    got = {
        (r.table, r.bucket, r.vec_id)
        for r in read_current_index(spark, idx_dir).collect()
    }
    want = {
        (r.table, r.bucket, r.vec_id)
        for r in _fold_batch_mode(spark, [_b1(spark), _b2(spark)]).collect()
    }
    assert got == want
    admitted_ids = {v for _, _, v in got}
    assert admitted_ids == {1, 3, 102}  # 2 intra-dup, 101 cross-dup, 103 intra-dup


def test_embindex_epoch_replay_noop(spark, tmp_path):
    idx_dir = str(tmp_path / "index")
    os.makedirs(idx_dir)
    assert merge_epoch(spark, idx_dir, _b1(spark), 0, DIM) is True
    snap = {
        (r.table, r.bucket, r.vec_id)
        for r in read_current_index(spark, idx_dir).collect()
    }
    assert merge_epoch(spark, idx_dir, _b1(spark), 0, DIM) is False
    assert _read_pointer(idx_dir)["epoch_id"] == 0
    after = {
        (r.table, r.bucket, r.vec_id)
        for r in read_current_index(spark, idx_dir).collect()
    }
    assert after == snap
    assert merge_epoch(spark, idx_dir, _b2(spark), 1, DIM) is True
