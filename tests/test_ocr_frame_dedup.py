"""Relational W2 (near-dup frame keep-chain as an `aggregate` fold) vs a
pure-Python fold reference.

This op deliberately has no DuckDB oracle: DuckDB 1.0.0's list_reduce
returns wrong results for folds over a few hundred elements (its kept-count
SHRINKS as the input grows — impossible for this fold, verified with a size
sweep), so the independent check lives here instead. Tokenization in the
reference mirrors Java's \\s (ASCII whitespace), matching Spark's split."""

import re

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.relational import (
    NEAR_DUP_BP,
    OCR_CONF_MIN,
    ocr_frame_dedup,
)

ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s


def _python_reference(doc_rows):
    out = {}
    for row in doc_rows:
        if row["spans"] is None:
            continue
        per_path: dict[str, list] = {}
        for s, a in zip(row["spans"], row["span_attrs"]):
            if s["kind"] != "ocr" or s["text"] is None:
                continue
            if a["confidence"] is None or a["confidence"] < OCR_CONF_MIN:
                continue
            bb = a["bbox"]
            y = bb[1] if bb is not None and len(bb) > 1 else 0.0
            x = bb[0] if bb is not None and len(bb) > 0 else 0.0
            ce4 = round(a["confidence"] * 10000)
            per_path.setdefault(s["media_ref"], []).append((y, x, s["text"], -ce4, s["offset"], ce4))
        frames = []
        for path, blocks in per_path.items():
            blocks.sort(key=lambda b: (b[0], b[1], b[2], b[3]))
            text = " ".join(b[2] for b in blocks)
            if text == "":
                continue
            conf_e4 = sum(b[5] for b in blocks) // len(blocks)
            ts = min(b[4] for b in blocks)
            frames.append((ts, path, text, conf_e4))
        frames.sort()
        kept = []
        for f in frames:
            cur = set(t for t in ASCII_WS.split(f[2].lower()) if t)
            if kept:
                last = set(t for t in ASCII_WS.split(kept[-1][2].lower()) if t)
                den = max(len(cur), len(last))
                if den > 0 and len(cur & last) * 10000 >= den * NEAR_DUP_BP:
                    if f[3] > kept[-1][3]:
                        kept[-1] = f
                    continue
            kept.append(f)
        for i, f in enumerate(kept):
            out[(row["doc_id"], i + 1)] = f
    return out


def test_relational_w2_matches_python_fold(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    want = _python_reference(docs.collect())
    got = {
        (r["doc_id"], r["rank"]): (r["ts"], r["path"], r["full_text"], r["conf_e4"])
        for r in ocr_frame_dedup(docs).collect()
    }
    assert set(got) == set(want)
    mism = [k for k in want if got[k] != want[k]]
    assert not mism, (mism[:3],)
    assert len(want) > 300  # meaningful corpus

    # replace-in-place actually fires somewhere in the corpus: at least one
    # kept frame must NOT be the first frame of its near-dup run — proxy:
    # kept count < total frames-with-text
    n_frames = (
        docs.select(F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "ocr"))
        .select("s.media_ref")
        .distinct()
        .count()
    )
    assert len(want) < n_frames
