"""Ingest-order n-gram novelty: first-copy attribution, duplicate → 0,
partial overlap, and the short-doc sentinel."""

from graphical_context_extraction_pipeline_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_duplicate_scores_zero_first_keeps_full(spark):
    text = "alpha beta gamma delta epsilon zeta"
    out = _by_id(dedup.ngram_novelty(_docs(spark, [(1, text), (2, text)])))
    assert out[1]["novelty_bp"] == 10000 and out[1]["n_novel"] == 4
    assert out[2]["novelty_bp"] == 0 and out[2]["n_novel"] == 0
    assert out[1]["n_ngrams"] == out[2]["n_ngrams"] == 4


def test_partial_overlap_is_proportional(spark):
    # doc 2 shares exactly its first 3-gram with doc 1; its other 3 are new
    out = _by_id(
        dedup.ngram_novelty(
            _docs(
                spark,
                [
                    (1, "a b c"),
                    (2, "a b c x y z"),  # 4 ngrams: abc(seen) bcx cxy xyz
                ],
            )
        )
    )
    assert out[2]["n_ngrams"] == 4 and out[2]["n_novel"] == 3
    assert out[2]["novelty_bp"] == 7500


def test_attribution_is_by_doc_id_not_input_order(spark):
    # same rows presented in reverse input order: owner is still min doc_id
    out = _by_id(
        dedup.ngram_novelty(_docs(spark, [(9, "p q r"), (3, "p q r")]))
    )
    assert out[3]["novelty_bp"] == 10000
    assert out[9]["novelty_bp"] == 0


def test_short_doc_sentinel(spark):
    out = _by_id(dedup.ngram_novelty(_docs(spark, [(1, "just two"), (2, "")])))
    assert out[1] == {"doc_id": 1, "n_ngrams": 0, "n_novel": 0, "novelty_bp": -1}
    assert out[2]["novelty_bp"] == -1


def test_within_doc_repeats_count_once(spark):
    # the same 3-gram repeated inside one doc is one DISTINCT shingle
    out = _by_id(dedup.ngram_novelty(_docs(spark, [(1, "a b c a b c")])))
    # shingles: abc bca cab abc(dup) → 3 distinct + abc again = 4 distinct?
    # tokens: a b c a b c → 3-grams: abc bca cab abc → distinct = 3
    assert out[1]["n_ngrams"] == 3
    assert out[1]["novelty_bp"] == 10000
