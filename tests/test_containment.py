"""containment_pairs: asymmetric subset-duplicate detection.

The regime this operator exists for — a short document embedded verbatim
inside a longer host page — is exactly where symmetric Jaccard fails: the
host's extra content inflates the union denominator below the near-dup
threshold while |A∩B|/|A| stays at 1.0. The first test pins that split
(containment fires, ngram_jaccard_pairs at the default threshold does not);
the rest pin arithmetic and plan shape.
"""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import dedup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_embedded_doc_found_by_containment_not_jaccard(spark):
    inner = "alpha beta gamma delta epsilon zeta"
    host = inner + " host filler words many more tokens padding the union denominator"
    rows = [(1, inner), (2, host), (3, "totally unrelated third document body")]
    docs = _corpus(spark, rows)

    got = {
        (r.doc_a, r.doc_b): r
        for r in dedup.containment_pairs(docs, min_containment_bp=8000).collect()
    }
    assert (1, 2) in got, got
    r = got[(1, 2)]
    # inner has 6 tokens → 4 distinct 3-gram shingles, all inside the host
    assert r.na == 4 and r.n_shared == 4
    assert r.contain_a_bp == 10000
    assert r.contain_b_bp < 10000
    assert (1, 3) not in got and (2, 3) not in got

    # the same pair is invisible to symmetric Jaccard at its default 6000bp
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    assert (1, 2) not in jac, jac


def test_identical_sets_are_bidirectional_10000(spark):
    t = "one two three four five six seven"
    docs = _corpus(spark, [(1, t), (2, t)])
    [r] = dedup.containment_pairs(docs).collect()
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.contain_a_bp == 10000 and r.contain_b_bp == 10000
    assert r.na == r.nb == r.n_shared == 5


def test_all_hot_identical_sets_pair_via_hub_star(spark):
    # cap=1 makes every shared shingle hot → the blocking keeps nothing and
    # the identical-set signature fallback must still pair the copies
    t = "aa bb cc dd ee"
    docs = _corpus(spark, [(10, t), (11, t), (12, t)])
    rows = dedup.containment_pairs(docs, max_docs_per_shingle=1).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == {(10, 11), (10, 12)}  # hub star on min doc_id
    assert all(r.contain_a_bp == 10000 and r.contain_b_bp == 10000 for r in rows)


def test_planted_gate_corpus_emits_subset_pairs(spark):
    from __spark_entry__ import _flat_docs, _planted_contained

    docs = _planted_contained(_flat_docs(spark, "/root/testdata/sf0.001"))
    pairs = dedup.containment_pairs(docs)
    planted = pairs.where(
        (F.col("doc_b") == F.col("doc_a") + 500000) & (F.col("contain_a_bp") >= 8000)
    )
    assert planted.count() > 0


def test_plan_has_no_single_partition(spark):
    from graphical_context_extraction_pipeline_spark.plans.explain import physical_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = physical_plan(dedup.containment_pairs(docs))
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
