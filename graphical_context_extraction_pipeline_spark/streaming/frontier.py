"""Streaming crawl-frontier scheduling — the incremental twin of
``operators/urls.frontier_schedule``.

URLs arrive continuously; each canonical URL gets a per-domain WAVE
number in first-arrival order (batch assigns md5 order instead — both are
valid politeness priorities; the INVARIANTS are shared and pinned: waves
are contiguous 0..n-1 per domain, one URL per (domain, wave), and the
per-domain budget truncates). Canonical redeliveries within the watermark
horizon are suppressed BEFORE the stateful counter, the same
stream-bounded / batch-exact split as streaming/crawl.py.

State per domain is ONE long (the next wave ordinal) plus one long of
drop accounting — bounded by the domain count structurally, regardless of
URL volume; no timeout is needed because the state cannot grow with
traffic. Determinism contract: within a micro-batch, arrival order is
normalized by (fetch_time, canonical_url); across micro-batches the file
order is the arrival order (append-log ingest).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

FRONTIER_IN_DDL = "url string, fetch_time timestamp"
FRONTIER_OUT_DDL = "domain string, canonical_url string, wave long"
FRONTIER_STATE_DDL = "n_assigned long, n_dropped long"

_OUT_COLS = ["domain", "canonical_url", "wave"]


def _make_scheduler(max_per_domain: int):
    def _schedule(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (domain,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["fetch_time", "canonical_url"], kind="mergesort")
        n, dropped = state.get if state.exists else (0, 0)
        out = []
        for cu in rows["canonical_url"]:
            if n < max_per_domain:
                out.append((domain, cu, n))
                n += 1
            else:
                dropped += 1
        state.update((n, dropped))
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return _schedule


def stream_frontier(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_per_domain: int = 1000,
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 1,
):
    """URL file stream → canonical dedup within watermark → per-domain
    stateful wave assignment → parquet (append)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.urls import _canonical

    stream = (
        spark.readStream.schema(FRONTIER_IN_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    canon = (
        stream.withColumn("canonical_url", _canonical(F.col("url")))
        .withWatermark("fetch_time", watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
        .withColumn(
            "domain", F.regexp_extract(F.col("canonical_url"), r"^https://([^/]+)", 1)
        )
        .select("domain", "canonical_url", "fetch_time")
    )
    waves = canon.groupBy("domain").applyInPandasWithState(
        _make_scheduler(max_per_domain),
        outputStructType=FRONTIER_OUT_DDL,
        stateStructType=FRONTIER_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        waves.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
