"""Sliding-window chunks vs an INDEPENDENT brute-force reference.

The Spark operator and its DuckDB oracle share the arithmetic
span→window fan-out formula (k ∈ [⌈(o−W+1)/S⌉, ⌊o/S⌋]); a bug in that
algebra would pass parity. This reference enumerates windows and scans
spans directly — no shared formula."""

import math

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.relational import (
    sliding_window_chunks,
)

W, S = 30000, 15000
PRI = {"chapter": 0, "scene": 1, "asr": 2, "frame": 3, "ocr": 4}


def _brute(doc_rows):
    out = {}
    for r in doc_rows:
        dur = r["meta"]["duration_ms"]
        if not dur or dur <= 0 or r["spans"] is None:
            continue
        k_max = max(0, math.ceil((dur - W) / S))
        for k in range(k_max + 1):
            w0, w1 = k * S, k * S + W
            inside = [s for s in r["spans"] if w0 <= s["offset"] < w1]
            if not inside:
                continue
            inside.sort(
                key=lambda s: (s["offset"], PRI[s["kind"]], s["text"] or "", s["media_ref"] or "")
            )
            text = " ".join(
                s["text"] for s in inside if s["kind"] in ("asr", "ocr") and s["text"]
            )
            media = "|".join(s["media_ref"] for s in inside if s["media_ref"])
            out[(r["doc_id"], k)] = (
                w0,
                w1,
                len(inside),
                sum(1 for s in inside if s["kind"] in ("asr", "ocr")),
                text,
                media,
            )
    return out


def test_sliding_windows_match_brute_force(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    want = _brute(docs.collect())

    got = {}
    for r in sliding_window_chunks(docs, W, S).collect():
        got[(r["doc_id"], r["win_seq"])] = (
            r["w_start_ms"],
            r["w_end_ms"],
            r["n_spans"],
            r["n_text_spans"],
            r["text"],
            r["media_refs"],
        )

    assert set(got) == set(want)
    mismatches = [k for k in want if got[k] != want[k]]
    assert not mismatches, (mismatches[:3], [want[k] for k in mismatches[:1]], [got[k] for k in mismatches[:1]])
    assert len(want) > 400  # meaningful coverage
