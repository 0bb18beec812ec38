"""Streaming uniform sampling: the per-source md5 bottom-k maintained
continuously over a document stream.

The batch draw (operators/sampling.py sample_k) is an ORDER STATISTIC — the
k docs with the smallest md5('topk:'||doc_id) priorities per source. Order
statistics are mergeable (the bottom-k of a union is contained in the union
of bottom-ks) and idempotent (re-folding a doc already in hand is a no-op),
so the streaming twin is a plain state fold:

- state per source: the current bottom-k as two aligned arrays
  (priorities, doc_ids) — bounded at k entries per source STRUCTURALLY,
  independent of stream length; redelivered documents cannot grow it
  (idempotent merge), so at-least-once upstream delivery is safe, unlike
  the CMS twin whose sums double on redelivery.
- per trigger each touched source re-emits its full current bottom-k
  (update semantics): consumers keep the LAST row per (source, rk),
  exactly the sessionize-consumer contract.

Batch ≡ stream law (pinned by test): after an availableNow run over staged
files, the last emission per source equals operators.sampling.sample_k
over the files' union — an identity, not an approximation, because both
sides evaluate the SAME priority expression (sampling.topk_priority).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from ..operators.sampling import topk_priority

DOCS_DDL = "doc_id long, source string, text string"
_OUT_COLS = ["source", "doc_id", "rk"]


def stream_sample_k(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    query_name: str = "sample_k",
    max_files_per_trigger: int = 1,
):
    """File-source documents → streaming per-source bottom-k → in-memory
    table ``query_name`` (update mode; consumers keep last per
    (source, rk)). Returns the StreamingQuery."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    rows = stream.select(
        "source", "doc_id", topk_priority(F.col("doc_id")).alias("priority")
    )

    def _fold(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        items = []
        if state.exists:
            pris, ids = state.get
            items = list(zip(pris, ids))
        for pdf in pdfs:
            items.extend(zip((int(p) for p in pdf["priority"]), (int(i) for i in pdf["doc_id"])))
        # set-dedup makes redelivery a no-op; sort order (priority, doc_id)
        # is the batch total order
        items = sorted(set(items))[:k]
        state.update(([p for p, _ in items], [i for _, i in items]))
        yield pd.DataFrame(
            [(source, i, rk + 1) for rk, (_, i) in enumerate(items)], columns=_OUT_COLS
        )

    out = rows.groupBy("source").applyInPandasWithState(
        _fold,
        "source string, doc_id long, rk long",
        "pris array<long>, ids array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
