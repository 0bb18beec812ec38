"""Stateful streaming document assembly ≡ batch extraction.

Span events for each document are split across TWO input files (first half
without eof, second half + eof markers), forcing the applyInPandasWithState
operator to carry per-doc state across micro-batches before emitting."""

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.streaming.stateful import (
    spans_to_events,
    stream_assemble_documents,
)

N_DOCS = 6


def _stage_file(df, staging_dir: str, dest_path: str, mtime: float | None = None) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging_dir)
    part = glob.glob(os.path.join(staging_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest_path)
    if mtime is not None:
        # the file source orders micro-batches by mtime; set it EXPLICITLY
        # so ordering never depends on filesystem timestamp granularity
        os.utime(dest_path, (mtime, mtime))


def test_streaming_assembly_matches_batch(spark, docs_path, tmp_path):
    docs = spark.read.parquet(docs_path).where(
        F.col("doc_id").isin([f"doc_{i:08d}" for i in range(N_DOCS)])
    )

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    ev = spans_to_events(docs, with_eof=False)
    split = F.crc32(
        F.concat_ws("|", "doc_id", "kind", F.coalesce(F.col("offset").cast("string"), F.lit("")))
    ) % 2
    half1 = ev.where(split == 0)
    half2 = ev.where(split == 1)
    eof_rows = spans_to_events(docs).where(F.col("kind") == "eof")

    t0 = time.time()
    _stage_file(half1, str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"), mtime=t0)
    _stage_file(
        half2.unionByName(eof_rows), str(tmp_path / "s2"),
        os.path.join(in_dir, "f2.parquet"), mtime=t0 + 10,
    )

    q = stream_assemble_documents(spark, in_dir, out_dir, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)

    from graphical_context_extraction_pipeline_spark.streaming.stateful import CHUNKS_OUT_DDL

    got = spark.read.schema(CHUNKS_OUT_DDL).parquet(out_dir).collect()
    want = extract_documents(docs).collect()

    got_m = {r["chunk_id"]: r for r in got}
    want_m = {r["chunk_id"]: r for r in want}
    assert set(got_m) == set(want_m)
    assert all(r["complete"] for r in got)
    for cid, w in want_m.items():
        g = got_m[cid]
        assert g["asr_text"] == w["asr_text"], cid
        assert g["ocr_text"] == w["ocr_text"], cid
        assert g["merged_text"] == w["merged_text"], cid
        assert g["t_start_ms"] == w["t_start_ms"] and g["t_end_ms"] == w["t_end_ms"]
        assert g["n_out_spans"] == len(w["out_spans"]), cid
        # exact float equality is the point: the per-word `words` structs
        # ride the event schema, so streaming assembly derives chunk
        # confidence from the SAME raw word scores the batch kernel uses
        # (dropping words would silently fall back to confidence×n_words)
        assert g["asr_confidence"] == w["asr_confidence"], cid


def test_timeout_flushes_docs_without_eof(spark, docs_path, tmp_path):
    """A document whose eof never arrives is flushed complete=False by the
    processing-time timeout (availableNow runs a trailing timer batch after
    the data batches, so the short timeout fires within the query); docs
    with eof emit complete=True as usual."""
    from graphical_context_extraction_pipeline_spark.streaming.stateful import CHUNKS_OUT_DDL

    docs = spark.read.parquet(docs_path).where(
        F.col("doc_id").isin([f"doc_{i:08d}" for i in range(5, 8)])
    )
    orphan = "doc_00000005"  # never gets an eof marker

    in_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    ev = spans_to_events(docs, with_eof=False)
    eof_rows = spans_to_events(docs).where(
        (F.col("kind") == "eof") & (F.col("doc_id") != orphan)
    )

    _stage_file(ev.unionByName(eof_rows), str(tmp_path / "s1"), os.path.join(in_dir, "f1.parquet"))
    q = stream_assemble_documents(spark, in_dir, out_dir, ckpt, flush_timeout_ms=500)
    q.awaitTermination(180)

    got = spark.read.schema(CHUNKS_OUT_DDL).parquet(out_dir).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {f"doc_{i:08d}" for i in (5, 6, 7)}
    assert all(r["complete"] for d in (6, 7) for r in by_doc[f"doc_{d:08d}"])
    flushed = by_doc[orphan]
    assert all(not r["complete"] for r in flushed)
    # flushed content equals batch extraction of the same (complete) spans —
    # every span event did arrive, only the eof didn't
    want = {r["chunk_id"] for r in extract_documents(docs).collect() if r["doc_id"] == orphan}
    assert {r["chunk_id"] for r in flushed} == want


class _MockState:
    """Minimal stand-in for GroupState — drives _make_assemble directly so
    the tombstone state machine is tested deterministically (the
    availableNow trailing-batch scheduling of real timeouts is timing-
    dependent)."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _pdf_events(rows):
    import pandas as pd

    return iter(
        [
            pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "text", "media_ref", "offset", "end_ms",
                    "confidence", "bbox", "scene_id", "n_words", "words",
                ],
            )
        ]
    )


def test_timeout_tombstone_suppresses_stragglers():
    """After a timeout flush the doc's state becomes a tombstone: stragglers
    and a late eof are suppressed (no duplicate chunk_ids with conflicting
    complete flags), each arrival extends the tombstone TTL, and the
    tombstone's own expiry removes state without emitting."""
    from graphical_context_extraction_pipeline_spark.streaming.stateful import _make_assemble

    fn = _make_assemble(500)
    st = _MockState()
    scene = ("d1", "scene", "0:10000", None, 0, 10000, None, None, 0, None, None)
    ev = (
        "d1", "asr", "hello world", None, 1000, 2000, 0.9, None, None, 2,
        [{"word": "hello", "start_ms": 1000, "end_ms": 1500, "score": 0.91},
         {"word": "world", "start_ms": 1500, "end_ms": 2000, "score": None}],
    )

    # 1. events arrive, no eof → accumulate, arm timeout, emit nothing
    assert list(fn(("d1",), _pdf_events([scene, ev]), st)) == []
    assert st.exists and st.timeout_set == 500

    # 2. timeout fires → flush complete=False, state becomes tombstone
    st.hasTimedOut = True
    out = list(fn(("d1",), iter([]), st))
    assert len(out) == 1 and len(out[0]) > 0 and (~out[0]["complete"]).all()
    assert st.exists, "tombstone must be kept after the flush"
    flushed_ids = set(out[0]["chunk_id"])

    # 3. straggler arrives while tombstoned → suppressed, TTL extended
    st.hasTimedOut = False
    st.timeout_set = None
    assert list(fn(("d1",), _pdf_events([scene, ev]), st)) == []
    assert st.exists and st.timeout_set == 500

    # 4. late eof while tombstoned → suppressed (no complete=True re-emit)
    eof = ("d1", "eof", None, None, None, None, None, None, None, None, None)
    assert list(fn(("d1",), _pdf_events([eof]), st)) == []
    assert st.exists

    # 5. tombstone TTL expires with no traffic → state removed, no emit
    st.hasTimedOut = True
    assert list(fn(("d1",), iter([]), st)) == []
    assert not st.exists
    assert flushed_ids  # the one flush is the only emission in the episode
