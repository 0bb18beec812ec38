"""Streaming per-source bottom-k: batch ≡ stream identity and the
redelivery no-op.

Three files arrive as three micro-batches (maxFilesPerTrigger=1, the third
a verbatim redelivery of the first); after the availableNow run the LAST
emission per source must equal batch sample_k over the files' union —
an identity (both sides fold the same md5 priority), and the redelivered
batch must not perturb membership or ranks (order-statistic idempotence)."""

import glob
import os
import shutil

from graphical_context_extraction_pipeline_spark.operators import sampling as SA
from graphical_context_extraction_pipeline_spark.streaming.sampling import (
    DOCS_DDL,
    stream_sample_k,
)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_stream_sample_k_equals_batch(spark, tmp_path):
    batches = [
        [(i, f"src{i % 3}", f"doc {i}") for i in range(0, 20)],
        [(i, f"src{i % 3}", f"doc {i}") for i in range(20, 45)],
        [(i, f"src{i % 3}", f"doc {i}") for i in range(0, 20)],  # redelivery
    ]
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    union_rows = []
    seen = set()
    for n, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DOCS_DDL)
        _stage_file(df, str(tmp_path / f"stage{n}"), os.path.join(in_dir, f"f{n}.parquet"))
        os.utime(os.path.join(in_dir, f"f{n}.parquet"), (1_000_000 + n, 1_000_000 + n))
        for r in rows:
            if r[0] not in seen:
                seen.add(r[0])
                union_rows.append(r)

    q = stream_sample_k(spark, in_dir, str(tmp_path / "ckpt"), k=5, query_name="skq")
    q.awaitTermination(120)

    # update-mode consumer contract: last row per (source, rk) wins
    emitted = spark.sql("SELECT * FROM skq").collect()
    last = {}
    for r in emitted:
        last[(r["source"], r["rk"])] = r["doc_id"]

    union = spark.createDataFrame(union_rows, DOCS_DDL)
    want = {
        (r["source"], r["rk"]): r["doc_id"]
        for r in SA.sample_k(union, k=5).collect()
    }
    assert last == want

    # structural bound: no source ever emits more than k ranks
    per_source = {}
    for (src, rk) in last:
        per_source.setdefault(src, set()).add(rk)
    assert all(len(v) <= 5 for v in per_source.values())
