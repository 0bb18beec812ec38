"""End-to-end corpus curation verdicts: quality gate → exact dedup →
near-dup transitive closure, one stage-labelled row per input doc."""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.curate import (
    curate_corpus,
    curation_metrics,
)

GOOD_A = (
    "the quick brown fox jumps over the lazy dog while a calm river flows "
    "past the quiet village and children play near the old wooden bridge"
)
GOOD_B = (
    "spark executes declarative plans and the catalyst optimizer prunes "
    "columns pushes filters and is able to reorder joins for the engine"
)


@pytest.fixture(scope="module")
def verdicts(spark):
    rows = [
        (1, GOOD_A),
        (2, GOOD_A),                       # exact duplicate of 1
        (3, GOOD_A + " with extra tail"),  # near duplicate of 1
        (4, GOOD_B),                       # distinct, kept
        (5, "too short"),                  # fails quality gate
        (6, GOOD_A),                       # second exact duplicate of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in curate_corpus(docs).collect()}


def test_one_verdict_per_doc(verdicts):
    assert set(verdicts) == {1, 2, 3, 4, 5, 6}


def test_stage_verdicts(verdicts):
    assert verdicts[5]["status"] == "rejected_quality"
    assert verdicts[5]["canonical_doc_id"] == -1
    assert verdicts[2]["status"] == "exact_duplicate"
    assert verdicts[2]["canonical_doc_id"] == 1
    assert verdicts[6]["status"] == "exact_duplicate"
    assert verdicts[6]["canonical_doc_id"] == 1
    assert verdicts[3]["status"] == "near_duplicate"
    assert verdicts[3]["canonical_doc_id"] == 1
    assert verdicts[1]["status"] == "kept"
    assert verdicts[1]["canonical_doc_id"] == 1
    assert verdicts[4]["status"] == "kept"
    assert verdicts[4]["canonical_doc_id"] == 4


def test_metrics_rollup(spark, verdicts):
    vdf = spark.createDataFrame(
        [(v["doc_id"], v["status"], v["canonical_doc_id"]) for v in verdicts.values()],
        "doc_id long, status string, canonical_doc_id long",
    )
    m = {r["status"]: r["n_docs"] for r in curation_metrics(vdf).collect()}
    assert m == {
        "rejected_quality": 1,
        "exact_duplicate": 2,
        "near_duplicate": 1,
        "kept": 2,
    }


def test_training_verdicts_rungs(spark):
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators import curate as CU
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # plant one exact copy
    planted = docs.unionAll(
        docs.where(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 900000).alias("doc_id"), "text"
        )
    )
    out = {r["doc_id"]: r for r in CU.training_verdicts(planted, min_mean_w_e3=0).collect()}
    assert len(out) == planted.count()
    # the copy fails uniqueness, the original keeps it
    assert out[3]["r_unique"] and not out[900003]["r_unique"]
    # copy and original agree on the content rungs
    for rung in ("r_gopher", "r_classifier"):
        assert out[3][rung] == out[900003][rung]
    # keep is the conjunction
    for r in out.values():
        assert r["keep"] == (r["r_gopher"] and r["r_classifier"] and r["r_unique"])
    # rungs match their standalone operators
    gop = {r["doc_id"]: r["keep"] for r in TA.gopher_rules(planted).collect()}
    assert all(out[i]["r_gopher"] == gop[i] for i in out)


def test_curated_mixture_composition(spark):
    from graphical_context_extraction_pipeline_spark.operators import curate as CU
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    import __spark_entry__ as entry

    stops = entry._GOPHER_GATE_STOPS  # corpus-localized list (default
    # Gopher stop words never appear in the synthetic vocabulary)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k = 20
    got = CU.curated_mixture(docs, k=k, min_mean_w_e3=0, stopwords=stops).collect()
    # exactly-k total picks over the survivor set
    assert sum(r["n_picks"] for r in got) == k
    # equals quota_mixture over the independently computed keep set
    keeps = {
        r["doc_id"]
        for r in CU.training_verdicts(docs, min_mean_w_e3=0, stopwords=stops).collect()
        if r["keep"]
    }
    from pyspark.sql import functions as F

    kept = docs.where(F.col("doc_id").isin(list(keeps)))
    want = {(r["source"], r["doc_id"], r["weight"], r["n_picks"])
            for r in SA.quota_mixture(kept, k=k).collect()}
    assert {(r["source"], r["doc_id"], r["weight"], r["n_picks"]) for r in got} == want
    # every drawn doc survived the ladder
    assert {r["doc_id"] for r in got} <= keeps
