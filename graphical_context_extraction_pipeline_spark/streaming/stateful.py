"""Stateful streaming document assembly (applyInPandasWithState).

The batch engine assumes each input row is a COMPLETE document. Under
continuous ingestion the reality is different: span events for one document
arrive spread over multiple micro-batches (a long video's ASR lands before
its OCR). This operator assembles documents incrementally:

- input: a stream of span EVENTS (doc_id, kind, text, media_ref, offset,
  end_ms, confidence, scene_id, n_words, words) — kind='eof' marks document end
  (at cluster scale the ingest layer emits it when an upstream manifest
  closes a document);
- state per doc_id: the accumulated span events (Arrow-safe packed rows);
- output: on eof, the document's chunks from the SAME kernel the batch
  path uses (operators/extract._doc_chunks) — streaming and batch can
  never drift because there is only one kernel.

State is bounded per document and dropped on emit; at 10^12 docs the
keyspace is large but the live state is only the in-flight documents.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd

from ..operators.extract import _doc_chunks

EVENTS_DDL = (
    "doc_id string, kind string, text string, media_ref string, offset int, "
    "end_ms int, confidence double, bbox array<double>, scene_id int, n_words int, "
    # per-word ASR detail rides the event too: the kernel derives chunk
    # asr_confidence from raw word scores when present (enricher filter),
    # so dropping words here would silently flip streaming assembly onto
    # the confidence×n_words fallback while batch uses word scores
    "words array<struct<word:string,start_ms:int,end_ms:int,score:double>>"
)

# state: accumulated events as one JSON blob (applyInPandasWithState state
# columns must be Arrow-encodable scalars; JSON keeps this dependency-free
# and deterministic)
STATE_DDL = "events string"

CHUNKS_OUT_DDL = (
    "chunk_id string, doc_id string, t_start_ms int, t_end_ms int, "
    "chapter_index int, scene_id int, asr_text string, ocr_text string, "
    "merged_text string, asr_confidence double, n_out_spans int, complete boolean"
)


def _emit_chunks(doc_id: str, events: list[list], complete: bool) -> pd.DataFrame:
    spans = [
        {"kind": e[0], "text": e[1], "media_ref": e[2], "offset": e[3]} for e in events
    ]
    attrs = [
        {
            "end_ms": e[4],
            "confidence": e[5],
            "bbox": e[6],
            "scene_id": e[7],
            "n_words": e[8],
            "words": None
            if e[9] is None
            else [
                {"word": w[0], "start_ms": w[1], "end_ms": w[2], "score": w[3]}
                for w in e[9]
            ],
        }
        for e in events
    ]
    rows = _doc_chunks(doc_id, spans, attrs, None)
    # project by CHUNK_COLUMNS name, not position — immune to schema growth
    from ..operators.extract import CHUNK_COLUMNS

    idx = {name: i for i, name in enumerate(CHUNK_COLUMNS)}
    pick = [
        "chunk_id", "doc_id", "t_start_ms", "t_end_ms", "chapter_index",
        "scene_id", "asr_text", "ocr_text", "merged_text", "asr_confidence",
    ]
    out = [
        tuple(r[idx[name]] for name in pick) + (len(r[idx["out_spans"]]), complete)
        for r in rows
    ]
    return pd.DataFrame(
        out,
        columns=[
            "chunk_id", "doc_id", "t_start_ms", "t_end_ms", "chapter_index",
            "scene_id", "asr_text", "ocr_text", "merged_text", "asr_confidence",
            "n_out_spans", "complete",
        ],
    )


_TOMBSTONE = json.dumps({"flushed": 1})


def _make_assemble(flush_timeout_ms: int | None):
    """Build the stateful assembly function. With ``flush_timeout_ms`` set,
    a document whose eof never arrives is flushed (complete=False) once no
    new events have arrived for that long — bounding state for abandoned /
    truncated upstream documents; without it, state waits for eof forever
    (NoTimeout).

    Tombstone after a timeout flush: the flush REPLACES the doc's state
    with a flushed marker (no events) holding its own ``flush_timeout_ms``
    TTL, so stragglers or a late eof arriving after the flush are
    SUPPRESSED instead of re-accumulating and re-emitting the same
    chunk_ids with conflicting ``complete`` flags — the append sink holds
    each chunk_id at most once while the tombstone lives. Every straggler
    extends the tombstone TTL. A straggler arriving after the tombstone
    itself expires recreates state (unavoidable with bounded state; at
    that point 2×timeout has passed with no traffic) — consumers that
    must tolerate arbitrarily-late redelivery keep the last /
    complete=True row per chunk_id."""

    def _assemble(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (doc_id,) = key
        if getattr(state, "hasTimedOut", False):
            stored = json.loads(state.get[0]) if state.exists else []
            if isinstance(stored, dict) or not stored:
                # tombstone TTL expired (or empty state) — drop it
                state.remove()
                return
            # flush, then tombstone the doc for one more timeout period
            state.update((_TOMBSTONE,))
            state.setTimeoutDuration(flush_timeout_ms)
            yield _emit_chunks(doc_id, stored, complete=False)
            return
        stored = json.loads(state.get[0]) if state.exists else []
        if isinstance(stored, dict):
            # doc already timeout-flushed: suppress stragglers/late eof and
            # extend the suppression window
            state.update((_TOMBSTONE,))
            if flush_timeout_ms is not None:
                state.setTimeoutDuration(flush_timeout_ms)
            return
        events: list[list] = stored
        saw_eof = False
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                if row.kind == "eof":
                    saw_eof = True
                else:
                    events.append(
                        [
                            row.kind,
                            row.text,
                            row.media_ref,
                            None if pd.isna(row.offset) else int(row.offset),
                            None if pd.isna(row.end_ms) else int(row.end_ms),
                            None if pd.isna(row.confidence) else float(row.confidence),
                            None if row.bbox is None else [float(x) for x in row.bbox],
                            None if pd.isna(row.scene_id) else int(row.scene_id),
                            None if pd.isna(row.n_words) else int(row.n_words),
                            # words arrive as dicts (Arrow struct → pandas);
                            # packed as JSON-safe lists, scoreless stays None
                            None
                            if row.words is None
                            else [
                                [
                                    w["word"],
                                    None if w["start_ms"] is None else int(w["start_ms"]),
                                    None if w["end_ms"] is None else int(w["end_ms"]),
                                    None if w["score"] is None else float(w["score"]),
                                ]
                                for w in row.words
                            ],
                        ]
                    )
        if not saw_eof:
            state.update((json.dumps(events),))
            if flush_timeout_ms is not None:
                state.setTimeoutDuration(flush_timeout_ms)
            return  # nothing to emit yet — document still in flight

        state.remove()
        yield _emit_chunks(doc_id, events, complete=True)

    return _assemble


def stream_assemble_documents(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    flush_timeout_ms: int | None = None,
):
    """Span-event stream → stateful per-doc assembly → chunks parquet.

    ``flush_timeout_ms``: processing-time timeout after which an in-flight
    document (no eof yet) is emitted with complete=False and its state
    dropped — the state-boundedness lever for 10^12-doc streams where some
    upstream manifests never close. Timeout firing requires a subsequent
    micro-batch, including one after a checkpoint restart (state and
    timeout timestamps are recovered from the checkpoint)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    assembled = stream.groupBy("doc_id").applyInPandasWithState(
        _make_assemble(flush_timeout_ms),
        outputStructType=CHUNKS_OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        assembled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def spans_to_events(docs_df, with_eof: bool = True):
    """Batch helper: explode a spans-table DataFrame into the event-stream
    shape (used by tests to stage streaming input files)."""
    from pyspark.sql import functions as F

    from ..functions.exprs import zip_spans

    words_t = "array<struct<word:string,start_ms:int,end_ms:int,score:double>>"
    z = zip_spans(("end_ms", "confidence", "bbox", "scene_id", "n_words", "words"))
    ev = docs_df.select("doc_id", F.explode(z).alias("z")).select(
        "doc_id",
        F.col("z.s.kind").alias("kind"),
        F.col("z.s.text").alias("text"),
        F.col("z.s.media_ref").alias("media_ref"),
        F.col("z.s.offset").alias("offset"),
        F.col("z.end_ms").alias("end_ms"),
        F.col("z.confidence").alias("confidence"),
        F.col("z.bbox").alias("bbox"),
        F.col("z.scene_id").alias("scene_id"),
        F.col("z.n_words").alias("n_words"),
        F.col("z.words").alias("words"),
    )
    if not with_eof:
        return ev
    eof = docs_df.select(
        "doc_id",
        F.lit("eof").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(None).cast("int").alias("offset"),
        F.lit(None).cast("int").alias("end_ms"),
        F.lit(None).cast("double").alias("confidence"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("int").alias("scene_id"),
        F.lit(None).cast("int").alias("n_words"),
        F.lit(None).cast(words_t).alias("words"),
    )
    return ev.unionByName(eof)
