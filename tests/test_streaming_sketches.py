"""Streaming HLL register maintenance: batch ≡ stream parity and the
structural state bound.

Three files arrive as three micro-batches (maxFilesPerTrigger=1); after the
availableNow run the sink's register table must equal the batch registers
over the files' union, and the shared estimate projection over it must
equal batch hll_distinct — the mergeable-sketch law exercised through the
streaming engine's state store instead of a manual max-merge."""

import glob
import os
import shutil

from graphical_context_extraction_pipeline_spark.operators import corpus as CO
from graphical_context_extraction_pipeline_spark.streaming.sketches import (
    DOCS_DDL,
    stream_hll_registers,
)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_stream_registers_equal_batch(spark, tmp_path):
    batches = [
        [(i, f"src{i % 2}", " ".join(f"w{i}_{j}" for j in range(60))) for i in range(10)],
        [(i, f"src{i % 2}", " ".join(f"w{i}_{j}" for j in range(60))) for i in range(8, 18)],
        # redelivery of batch 0 (idempotence: max cannot grow registers)
        [(i, f"src{i % 2}", " ".join(f"w{i}_{j}" for j in range(60))) for i in range(10)],
    ]
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    all_rows = []
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DOCS_DDL)
        _stage_file(df, str(tmp_path / f"stage{k}"), os.path.join(in_dir, f"f{k}.parquet"))
        os.utime(os.path.join(in_dir, f"f{k}.parquet"), (1_000_000 + k, 1_000_000 + k))
        all_rows.extend(rows)

    q = stream_hll_registers(spark, in_dir, str(tmp_path / "ckpt"), query_name="hllq")
    q.awaitTermination(120)

    got = {
        (r["grp"], r["bucket"]): r["max_rho"]
        for r in spark.sql("SELECT * FROM hllq").collect()
    }
    union = spark.createDataFrame(all_rows, DOCS_DDL)
    want = {
        (r["grp"], r["bucket"]): r["max_rho"] for r in CO.hll_registers(union).collect()
    }
    assert got == want
    # structural state bound: one register per (group, bucket)
    assert len(got) <= 2 * CO.HLL_M

    # the shared estimate projection over the streamed registers equals the
    # batch profile exactly
    est_stream = sorted(
        map(tuple, CO.hll_estimate(spark.sql("SELECT * FROM hllq")).collect())
    )
    est_batch = sorted(map(tuple, CO.hll_distinct(union).collect()))
    assert est_stream == est_batch


def test_stream_cms_matrix_equals_batch(spark, tmp_path):
    """After the availableNow run, the streamed count-min matrix equals the
    batch sketch of the files' union — the sum-merge law through the
    streaming state store — and point queries through it are exact at wide
    w on this vocabulary."""
    from graphical_context_extraction_pipeline_spark.streaming.sketches import (
        stream_cms_counts,
    )

    batches = [
        [(1, "s", "alpha beta alpha"), (2, "s", "gamma")],
        [(3, "s", "alpha delta delta")],
    ]
    in_dir = str(tmp_path / "docs")
    os.makedirs(in_dir)
    all_rows = []
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(rows, DOCS_DDL)
        _stage_file(df, str(tmp_path / f"stage{k}"), os.path.join(in_dir, f"f{k}.parquet"))
        os.utime(os.path.join(in_dir, f"f{k}.parquet"), (1_000_000 + k, 1_000_000 + k))
        all_rows.extend(rows)

    q = stream_cms_counts(spark, in_dir, str(tmp_path / "ckpt_cms"), query_name="cmsq")
    q.awaitTermination(120)

    got = {(r["row"], r["pos"]): r["cnt"] for r in spark.sql("SELECT * FROM cmsq").collect()}
    union = spark.createDataFrame(all_rows, DOCS_DDL)
    want = {(r["row"], r["pos"]): r["cnt"] for r in CO.cms_counts(union).collect()}
    assert got == want

    probes = spark.createDataFrame([("alpha",), ("delta",), ("absent",)], "tok string")
    est = {r["tok"]: r["est_count"] for r in
           CO.cms_estimate(spark.sql("SELECT * FROM cmsq"), probes).collect()}
    assert est == {"alpha": 3, "delta": 2, "absent": 0}
