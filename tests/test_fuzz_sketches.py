"""Property-based gates for the sketch family — the laws that must hold on
ANY corpus, checked on randomized small corpora (derandomized for CI
stability, same convention as the other fuzz suites):

- count-min never undercounts, at any width (collisions only inflate);
- HLL registers merge by bucket-wise max across any split of the corpus;
- sample_k membership is invariant to partitioning and k-prefix-consistent.

Each example builds tiny local DataFrames; example counts are kept low
because every example runs Spark jobs.
"""

from collections import Counter

from hypothesis import given, settings, strategies as st

from graphical_context_extraction_pipeline_spark.operators import corpus as CO
from graphical_context_extraction_pipeline_spark.operators import sampling as SA

_tok = st.sampled_from([f"t{i}" for i in range(12)])
_text = st.lists(_tok, min_size=0, max_size=15).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None, derandomize=True)
@given(_corpus, st.sampled_from([8, 64, 4096]))
def test_cms_never_undercounts_fuzz(spark, texts, w):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    exact = Counter(tok for t in texts for tok in t.lower().split())
    if not exact:
        assert CO.cms_counts(docs, w=w).count() == 0
        return
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {
        r["tok"]: r["est_count"]
        for r in CO.cms_estimate(CO.cms_counts(docs, w=w), probes, w=w).collect()
    }
    assert all(est[t] >= c for t, c in exact.items()), (w, est, dict(exact))


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_corpus, st.integers(min_value=1, max_value=7))
def test_hll_merge_law_fuzz(spark, texts, split_mod):
    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    from pyspark.sql import functions as F

    whole = {
        (r["grp"], r["bucket"]): r["max_rho"] for r in CO.hll_registers(docs).collect()
    }
    merged = {}
    for part in (
        docs.where(F.col("doc_id") % split_mod == 0),
        docs.where(F.col("doc_id") % split_mod != 0),
    ):
        for r in CO.hll_registers(part).collect():
            k = (r["grp"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["max_rho"])
    assert whole == merged


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.integers(min_value=1, max_value=9), st.integers(min_value=2, max_value=30))
def test_sample_k_invariance_fuzz(spark, k, n_docs):
    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"text {i}") for i in range(n_docs)],
        "doc_id long, source string, text string",
    )
    a = sorted(map(tuple, SA.sample_k(docs, k).collect()))
    b = sorted(map(tuple, SA.sample_k(docs.repartition(5), k).collect()))
    assert a == b
    if k > 1:
        smaller = sorted(map(tuple, SA.sample_k(docs, k - 1).collect()))
        assert set(smaller) <= set(a)
