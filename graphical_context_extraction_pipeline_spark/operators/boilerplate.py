"""Cross-document boilerplate-line stripping — the per-partition frequency
heuristic the north star mandates, generalized from the reference's
per-document chrome-token filter (phase 2/src/ocr_cleanup.py:36-61).

The reference can only see one video at a time, so its boilerplate model is
per-document. At 10^12 documents the recurring noise (player UI text,
watermarks, channel banners) is CROSS-document: the same OCR block text
shows up in a large fraction of all docs. Two formulations:

- ``boilerplate_lines`` / ``strip_boilerplate`` — exact global frequency:
  distinct (doc, line) → count docs per line → threshold. Two shuffles,
  both with map-side partial aggregation; the resulting boilerplate
  dimension is tiny by construction (only lines above a doc-fraction
  threshold survive) so the strip join is a broadcast.
- ``boilerplate_lines_partition_local`` — the zero-shuffle scale path: each
  partition computes frequencies over its own documents only
  (``mapInPandas``, no shuffle at all). With hash-partitioned doc_ids every
  partition is an unbiased sample, so partition-local frequency ≈ global
  frequency for exactly the high-frequency lines the threshold keeps; at
  1000 executors this turns a 100 TB global groupBy into a per-partition
  hash map. Emits per-partition lineage (part_id, n_docs seen).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_DOC_BP = 2000  # line is boilerplate if in ≥ 20% of docs


_WS_CLASS = "[\\s ​‌‍﻿]+"  # ASCII ws + NBSP + zero-width


def _norm_line(col):
    """Normalized comparison key for an OCR block text: lowercased, unicode
    whitespace (incl. NBSP / zero-width OCR noise) collapsed and trimmed —
    the class is explicit so Spark (Java regex) and the DuckDB oracle (RE2)
    agree character-for-character."""
    collapsed = F.regexp_replace(F.lower(col), _WS_CLASS, " ")
    return F.trim(collapsed)


def _ocr_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, norm) pairs — one row per distinct OCR block text per doc.

    Per-doc distinctness is computed INSIDE the row (``array_distinct``
    over the normalized OCR texts) — a relational ``.distinct()`` after
    explode would be a second full shuffle of the line stream just to
    dedup within documents."""
    norms = F.array_distinct(
        F.filter(
            F.transform(
                F.filter(F.col("spans"), lambda s: (s["kind"] == "ocr") & s["text"].isNotNull()),
                lambda s: _norm_line(s["text"]),
            ),
            lambda n: n != "",
        )
    )
    return docs.select("doc_id", F.explode(norms).alias("norm"))


def boilerplate_lines(docs: DataFrame, min_doc_bp: int = DEFAULT_MIN_DOC_BP) -> DataFrame:
    """OCR block texts that appear in ≥ min_doc_bp/10000 of all documents.

    Output: (norm, n_docs, total_docs) — the global boilerplate dimension.
    """
    total = docs.select(F.countDistinct("doc_id").alias("total_docs"))
    counts = _ocr_lines(docs).groupBy("norm").agg(F.count("*").cast("long").alias("n_docs"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_docs") * 10000 >= F.col("total_docs") * min_doc_bp)
        .select("norm", "n_docs", F.col("total_docs").cast("long").alias("total_docs"))
    )


def strip_boilerplate(docs: DataFrame, min_doc_bp: int = DEFAULT_MIN_DOC_BP) -> DataFrame:
    """Span stream with cross-doc boilerplate OCR blocks removed.

    Output: surviving spans exploded as ordered rows
    (doc_id, kind, text, media_ref, offset, seq) — seq re-numbered over the
    kept spans with the W7 stable kind-priority order, media_ref anchors
    preserved in offset order.

    Plan shape: the boilerplate dimension (tiny) is aggregated into ONE row
    (collect_set) and broadcast-joined; membership is an array_contains
    against that set, the per-doc re-ordering is an intra-row ``array_sort``
    and seq comes from ``posexplode`` — the (huge) span stream is never
    shuffled at all.
    """
    from .relational import sorted_span_rows

    bl = boilerplate_lines(docs, min_doc_bp).agg(
        F.collect_set("norm").alias("bl_set")
    )
    kept = F.filter(
        F.col("spans"),
        lambda s: (s["kind"] != "ocr")
        | s["text"].isNull()
        | ~F.coalesce(F.array_contains(F.col("bl_set"), _norm_line(s["text"])), F.lit(False)),
    )
    return (
        docs.crossJoin(F.broadcast(bl))
        .select("doc_id", F.posexplode(sorted_span_rows(kept)).alias("pos", "s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
            (F.col("pos") + 1).cast("long").alias("seq"),
        )
    )


_PL_SCHEMA = "part_id int, norm string, n_docs long, part_total_docs long"


def _partition_line_freqs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    part_id = ctx.partitionId() if ctx is not None else -1
    import re

    ws = re.compile(_WS_CLASS)
    counts: dict[str, int] = {}
    n_docs = 0
    for pdf in it:
        for spans in pdf["spans"]:
            if spans is None:
                continue
            n_docs += 1
            seen = set()
            for sp in spans:
                if sp["kind"] == "ocr" and sp["text"]:
                    norm = ws.sub(" ", sp["text"].lower()).strip()
                    if norm:
                        seen.add(norm)
            for norm in seen:
                counts[norm] = counts.get(norm, 0) + 1
    yield pd.DataFrame(
        [(part_id, k, v, n_docs) for k, v in counts.items()],
        columns=["part_id", "norm", "n_docs", "part_total_docs"],
    )


def boilerplate_lines_partition_local(
    docs: DataFrame, min_doc_bp: int = DEFAULT_MIN_DOC_BP
) -> DataFrame:
    """Partition-local frequency model: each task builds a line-frequency
    map over only its own documents — ZERO shuffle, unbounded scale-out.
    Rows double as per-partition lineage (part_id, part_total_docs)."""
    freqs = docs.select("doc_id", "spans").mapInPandas(_partition_line_freqs, _PL_SCHEMA)
    return freqs.where(
        (F.col("part_total_docs") > 0)
        & (F.col("n_docs") * 10000 >= F.col("part_total_docs") * min_doc_bp)
    )
