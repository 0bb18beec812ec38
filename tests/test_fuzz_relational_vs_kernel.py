"""Cross-implementation consistency on ADVERSARIAL inputs: the relational
(Catalyst) operators and the pandas kernel are independent implementations —
run both over one batch of hypothesis-generated documents (overlapping
scenes, tied offsets, unicode noise...) and compare.

One Spark job for the whole batch (not per-example) keeps this fast."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators import relational as R
from graphical_context_extraction_pipeline_spark.operators.extract import (
    CHUNK_COLUMNS,
    _doc_chunks,
)
from tests.test_fuzz_kernel_vs_oracle import doc_st


def _to_rows(docs):
    rows = []
    for i, d in enumerate(docs):
        rows.append(
            (
                f"doc_{i:04d}",
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
                [
                    (a["end_ms"], a["confidence"], a["bbox"], a["scene_id"], a["n_words"], a.get("words"))
                    for a in d["span_attrs"]
                ],
                (
                    d["meta"]["title"], d["meta"]["channel"], d["meta"]["description"],
                    d["meta"]["tags"], d["meta"]["upload_date"], d["meta"]["duration_ms"],
                ),
            )
        )
    return rows


@settings(
    max_examples=3,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(doc_st(), min_size=20, max_size=30))
def test_relational_segmentation_matches_kernel(spark, docs):
    df = spark.createDataFrame(_to_rows(docs), SPANS_DDL)

    rel = {}
    for r in R.chunk_segmentation(df).collect():
        rel.setdefault(r["doc_id"], []).append(
            (r["t_start_ms"], r["t_end_ms"], r["primary_scene"], r["n_merged"])
        )
    for v in rel.values():
        v.sort()

    for i, d in enumerate(docs):
        doc_id = f"doc_{i:04d}"
        chunks = [
            dict(zip(CHUNK_COLUMNS, r))
            for r in _doc_chunks(doc_id, d["spans"], d["span_attrs"], d["meta"])
        ]
        want = sorted(
            (c["t_start_ms"], c["t_end_ms"], c["scene_id"], len(c["merged_scene_ids"]))
            for c in chunks
        )
        got = rel.get(doc_id, [])
        assert got == want, doc_id
