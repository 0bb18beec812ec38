"""Hard-negative mining: positives excluded, ranks re-contiguous, and the
candidate set is exactly bm25_serve_batch at the same depth."""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import search as SE

DOCS_DDL = "doc_id long, text string"


def _corpus(spark):
    rows = [
        (1, "spark shuffle join spark"),
        (2, "spark shuffle"),
        (3, "shuffle join"),
        (4, "spark join vector"),
        (5, "vector vector vector"),
        (6, "spark"),
    ]
    return spark.createDataFrame(rows, DOCS_DDL)


def test_and_matches_conjunctive(spark):
    docs = _corpus(spark)
    qs = spark.createDataFrame(
        [(1, "spark shuffle"), (2, "vector"), (3, "spark missingterm")],
        "query_id long, query string",
    )
    got = {(r["query_id"], r["doc_id"]) for r in SE.and_matches(docs, qs).collect()}
    assert got == {(1, 1), (1, 2), (2, 4), (2, 5)}


def test_hard_negatives_excludes_positives_and_reranks(spark):
    docs = _corpus(spark)
    idx = SE.inverted_index(docs)
    norms = SE.doc_norms(docs)
    qs = spark.createDataFrame([(1, "spark shuffle")], "query_id long, query string")
    pos = SE.and_matches(docs, qs)

    full = SE.bm25_serve_batch(idx, norms, qs, k=10).collect()
    pos_ids = {r["doc_id"] for r in pos.collect()}
    expect = [r for r in sorted(full, key=lambda r: (-r["score_e6"], r["doc_id"]))
              if r["doc_id"] not in pos_ids]

    got = sorted(
        SE.hard_negatives(idx, norms, qs, pos, k=5, depth=10).collect(),
        key=lambda r: r["neg_rank"],
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect][:5]
    assert [r["neg_rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(r["doc_id"] not in pos_ids for r in got)
    # scores are untouched by the exclusion
    by_doc = {r["doc_id"]: r["score_e6"] for r in full}
    assert all(r["score_e6"] == by_doc[r["doc_id"]] for r in got)


def test_hard_negatives_empty_positives_is_identity_prefix(spark):
    docs = _corpus(spark)
    idx = SE.inverted_index(docs)
    norms = SE.doc_norms(docs)
    qs = spark.createDataFrame([(7, "vector join")], "query_id long, query string")
    empty_pos = spark.createDataFrame([], "query_id long, doc_id long")
    got = SE.hard_negatives(idx, norms, qs, empty_pos, k=3, depth=10)
    base = SE.bm25_serve_batch(idx, norms, qs, k=3)
    g = {(r["query_id"], r["doc_id"], r["score_e6"], r["neg_rank"]) for r in got.collect()}
    b = {(r["query_id"], r["doc_id"], r["score_e6"], r["rank"]) for r in base.collect()}
    assert g == b
