"""Streaming cardinality profiling: the HLL register table maintained
continuously over a document stream.

The batch profile (operators/corpus.py hll_registers / hll_distinct) is a
mergeable sketch; this module runs the SAME register expression chain as a
structured-streaming aggregation, so an ingest pipeline keeps a live
distinct-token profile per source without ever re-scanning the corpus.

State boundedness is structural: the streaming aggregation holds exactly
one state entry per (group, bucket) — ≤ |groups|·m rows total, independent
of stream length or document sizes (max is idempotent, so redelivered
documents cannot grow state either). That makes complete output mode safe:
each trigger re-emits the full ≤ |groups|·m-row table, which a production
sink applies as an idempotent overwrite (the parquet-snapshot analog of the
write-audit protocol in pipeline.py); tests use the memory sink.

Batch ≡ stream parity is pinned by test: after an availableNow run over
staged files, the sink's register table equals hll_registers over the
files' union, and hll_estimate over it equals batch hll_distinct.
"""

from __future__ import annotations

from ..operators.corpus import cms_counts, hll_registers

DOCS_DDL = "doc_id long, source string, text string"


def stream_hll_registers(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "hll_regs",
    max_files_per_trigger: int = 1,
):
    """File-source documents → streaming HLL register maintenance →
    in-memory table ``query_name`` (complete mode: the full bounded
    register table per trigger). Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    regs = hll_registers(stream)
    return (
        regs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_counts(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "cms_m",
    w: int = 8192,
    max_files_per_trigger: int = 1,
):
    """The counting twin: the count-min matrix maintained as a streaming
    aggregation — state is exactly the d·w counter cells (the streaming
    engine's incremental count IS the sketch's sum-merge). Complete mode
    re-emits the bounded matrix per trigger; batch ≡ stream pinned by
    test. NOTE unlike the HLL registers, redelivery DOES inflate counts
    (counters are not idempotent) — upstream exactly-once (the streaming
    event dedup in windowed.py) is the dedup boundary, same as any
    counting aggregation."""
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        cms_counts(stream, w)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
