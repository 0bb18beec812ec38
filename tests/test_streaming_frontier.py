"""Streaming frontier scheduling (streaming/frontier.py): per-domain wave
invariants shared with the batch scheduler, budget truncation, state
continuation across micro-batches."""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import ensure_html
from graphical_context_extraction_pipeline_spark.operators.urls import frontier_schedule
from graphical_context_extraction_pipeline_spark.streaming.frontier import (
    FRONTIER_OUT_DDL,
    _make_scheduler,
    stream_frontier,
)


def _stage_file(df, staging_dir: str, dest_path: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)


def test_stream_frontier_invariants_and_budget(spark, tmp_path):
    pages = spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
    b1 = (
        pages.where(F.col("doc_id") < 25)
        .select("url")
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    )
    # batch 2: tracking-param redeliveries of the first 10 (suppressed) +
    # genuinely new pages (waves must CONTINUE per domain, not restart)
    redeliver = (
        pages.where(F.col("doc_id") < 10)
        .select(F.concat("url", F.lit("?utm_source=refetch")).alias("url"))
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:10")))
    )
    fresh = (
        pages.where((F.col("doc_id") >= 25) & (F.col("doc_id") < 40))
        .select("url")
        .withColumn("fetch_time", F.to_timestamp(F.lit("2026-01-01 00:00:10")))
    )
    b2 = redeliver.unionAll(fresh)

    in_dir = str(tmp_path / "urls")
    os.makedirs(in_dir)
    _stage_file(b1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    time.sleep(1.1)
    _stage_file(b2, str(tmp_path / "s2"), os.path.join(in_dir, "f2.parquet"))

    cap = 3
    q = stream_frontier(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        max_per_domain=cap, watermark="1 hour",
    )
    q.awaitTermination(180)
    got = spark.read.schema(FRONTIER_OUT_DDL).parquet(str(tmp_path / "out")).collect()

    # one wave per canonical, never two rows for one canonical
    canon = [r.canonical_url for r in got]
    assert len(canon) == len(set(canon))
    by_dom = {}
    for r in got:
        by_dom.setdefault(r.domain, []).append(r.wave)
    # shared invariants with the batch scheduler: contiguous 0..n-1 waves,
    # budget-truncated — row COUNTS per domain equal the batch scheduler's
    # on the same surviving URL set
    for dom, waves in by_dom.items():
        assert sorted(waves) == list(range(len(waves))), dom
        assert len(waves) <= cap
    surviving = b1.unionAll(fresh)  # redeliveries are canonical dups
    batch = frontier_schedule(
        surviving.withColumn("doc_id", F.lit(0)), max_per_domain=cap
    )
    want = {r["domain"]: r["n"] for r in
            batch.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert {d: len(w) for d, w in by_dom.items()} == want


class _MockState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = tuple(v), True

    def remove(self):
        self._v, self.exists = None, False


def test_scheduler_kernel_budget_and_continuation():
    import pandas as pd

    fn = _make_scheduler(max_per_domain=3)
    state = _MockState()

    def feed(urls, t0):
        pdf = pd.DataFrame(
            {"canonical_url": urls,
             "fetch_time": pd.to_datetime([t0] * len(urls))}
        )
        return list(fn(("d.example",), iter([pdf]), state))

    out1 = feed(["https://d.example/a", "https://d.example/b"], "2026-01-01")
    assert [tuple(r) for r in out1[0].itertuples(index=False)] == [
        ("d.example", "https://d.example/a", 0),
        ("d.example", "https://d.example/b", 1),
    ]
    # continuation + budget: third URL takes wave 2, the rest drop
    out2 = feed(
        ["https://d.example/c", "https://d.example/d", "https://d.example/e"],
        "2026-01-02",
    )
    rows = [tuple(r) for r in out2[0].itertuples(index=False)]
    assert rows == [("d.example", "https://d.example/c", 2)]
    assert state.get == (3, 2)  # 3 assigned, 2 dropped
