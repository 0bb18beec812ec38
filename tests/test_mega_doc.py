"""Pathological skew: one document with ~100k spans (≈70× the corpus's
media-heavy skew docs) must flow through the whole extraction pipeline —
this is the row the Arrow batch-size cap and the cost-balanced
partitioning exist for."""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents


def _mega_doc(n_scenes=2000, frames_per_scene=5, blocks_per_frame=8):
    spans, attrs = [], []
    t = 0
    fid = 0
    for sid in range(n_scenes):
        dur = 6000
        spans.append(("scene", f"{sid}:{t + dur}", None, t))
        attrs.append((t + dur, None, None, None, None, None))
        spans.append(("asr", f"speech {sid} tokens here", None, t + 10))
        attrs.append((t + 3000, 0.9, None, None, 4, None))
        for k in range(frames_per_scene):
            path = f"frames/mega/frame_{fid:06d}.jpg"
            ts = t + 100 + k * 1000
            spans.append(("frame", None, path, ts))
            attrs.append((None, None, None, sid, None, None))
            for b in range(blocks_per_frame):
                spans.append(("ocr", f"block {sid} {k} {b}", path, ts + b))
                attrs.append((None, 0.8, [0.0, float(b), 10.0, float(b) + 1], None, None, None))
            fid += 1
        t += dur
    meta = ("mega", "ch", "d", ["t"], "20250101", t)
    return ("doc_mega", spans, attrs, meta)


def test_mega_doc_extracts(spark):
    row = _mega_doc()
    n_spans = len(row[1])
    assert n_spans > 90_000
    df = spark.createDataFrame([row], SPANS_DDL)
    chunks = extract_documents(df)
    kind_counts = dict(
        chunks.select(F.explode("out_spans").alias("s"))
        .groupBy(F.col("s.kind"))
        .count()
        .collect()
    )
    n_chunks = chunks.count()
    assert n_chunks == 2000  # every 6 s scene is its own chunk
    # every asr segment and frame survives exactly once; OCR is thinned by
    # the W2 near-dup chain (this doc's frames are >90% token-identical
    # within a scene, so ~1 of 5 survives per chunk) and the per-doc chrome
    # heuristic — the dedup machinery working as designed on a slide-heavy
    # pathological doc
    assert kind_counts["asr"] == 2000
    assert kind_counts["frame"] == 10_000
    assert 2000 * 6 <= kind_counts["ocr"] <= 2000 * 10, kind_counts
