"""Hand-value tests for the corpus-management operators: passage-level
duplicate scan, snapshot diff, and the log2 length histogram."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphical_context_extraction_pipeline_spark.operators import corpus as CO
from graphical_context_extraction_pipeline_spark.operators import dedup


def test_duplicate_passages_hand_values(spark):
    shared = "alpha beta gamma delta"  # the 4-gram shared by docs 1..3
    rows = [
        (1, f"intro {shared} one tail"),
        (2, f"other lead {shared} two"),
        (3, f"{shared} opener here now"),
        (4, "completely different text with nothing shared"),
        # repeats of the passage WITHIN one doc count once (array_distinct)
        (5, f"{shared} and again {shared}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["passage"]: r.asDict() for r in
           dedup.duplicate_passages(docs, n=4, min_docs=2).collect()}
    assert shared in out
    assert out[shared]["n_docs"] == 4  # docs 1,2,3,5 — doc 5 once
    assert out[shared]["example_doc_id"] == 1
    # no passage from doc 4 survives, and sub-passages shared by only the
    # same 4 docs are also reported (e.g. "beta gamma delta" extensions) —
    # but nothing with n_docs < 2
    assert all(r["n_docs"] >= 2 for r in out.values())


def test_duplicate_passages_short_docs(spark):
    # docs shorter than n contribute nothing and do not crash the fold
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "")], "doc_id long, text string"
    )
    assert dedup.duplicate_passages(docs, n=4).count() == 0
    # at n=2 the shared bigram is found
    out = dedup.duplicate_passages(docs, n=2).collect()
    assert [(r["passage"], r["n_docs"]) for r in out] == [("one two", 2)]


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in CO.corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # doc 1 filtered


def test_length_histogram_buckets(spark):
    # n_tokens 0 -> bucket 1; 1 -> 2; 2,3 -> 2..? bit_length(n+1):
    # 0->1, 1->2, 3->3, 7->3? bin(8)=1000 len 4. Check concrete values.
    rows = [(1, "", "a"), (2, "t", "a"), (3, "t t t", "a"), (4, "t t t t t t t", "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["bucket"]: r.asDict() for r in CO.length_histogram(docs).collect()}
    # doc1: n=0 -> bin(1)='1' -> bucket 1; doc2: n=1 -> bin(2)='10' -> 2
    # doc3: n=3 -> bin(4)='100' -> 3; doc4: n=7 -> bin(8)='1000' -> 4
    assert set(got) == {1, 2, 3, 4}
    assert got[3]["n_docs"] == 1 and got[3]["total_tokens"] == 3
    assert got[4]["total_tokens"] == 7


def test_hll_registers_merge(spark):
    """The register table is a mergeable sketch: registers of a union
    corpus equal the bucket-wise max of the parts' registers — the property
    that lets each 100 TB ingest increment maintain its own ≤m-row table."""
    from pyspark.sql import functions as F

    rows = [(i, "s", " ".join(f"tok{j}" for j in range(i, i + 40))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = docs.where(F.col("doc_id") < 15)
    b = docs.where(F.col("doc_id") >= 15)
    whole = {(r["grp"], r["bucket"]): r["max_rho"] for r in CO.hll_registers(docs).collect()}
    merged = {}
    for part in (a, b):
        for r in CO.hll_registers(part).collect():
            k = (r["grp"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["max_rho"])
    assert whole == merged


def test_hll_distinct_accuracy_both_ranges(spark):
    """Linear-counting range (small vocab) and raw-estimator range (5k
    distinct tokens) both land within tolerance of the exact count."""
    small = spark.createDataFrame(
        [(1, "small", " ".join(f"w{j}" for j in range(120)))],
        "doc_id long, source string, text string",
    )
    big = spark.createDataFrame(
        [(i, "big", " ".join(f"u{i}_{j}" for j in range(500))) for i in range(10)],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r["est_distinct"] for r in
           CO.hll_distinct(small.unionByName(big)).collect()}
    assert abs(out["small"] - 120) / 120 <= 0.15
    assert abs(out["big"] - 5000) / 5000 <= 0.20  # 3sigma at m=256 is ~20%


def test_hll_distinct_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "s", f"alpha beta tok{i}") for i in range(50)],
        "doc_id long, source string, text string",
    )
    r1 = sorted(map(tuple, CO.hll_distinct(docs).collect()))
    r2 = sorted(map(tuple, CO.hll_distinct(docs.repartition(7)).collect()))
    assert r1 == r2


def test_cms_never_undercounts_and_merges_by_sum(spark):
    """At w=8 collisions are forced: estimates may exceed but can never
    fall below the true count; and the sketch of a union corpus equals the
    cell-wise SUM of the parts' sketches (the mergeable-counter law)."""
    from pyspark.sql import functions as F

    rows_a = [(1, "alpha alpha beta gamma"), (2, "alpha delta")]
    rows_b = [(3, "beta beta epsilon zeta eta theta iota kappa")]
    a = spark.createDataFrame(rows_a, "doc_id long, text string")
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    both = a.unionByName(b)

    exact = {"alpha": 3, "beta": 3, "gamma": 1, "delta": 1, "epsilon": 1,
             "zeta": 1, "eta": 1, "theta": 1, "iota": 1, "kappa": 1}
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {r["tok"]: r["est_count"] for r in
           CO.cms_estimate(CO.cms_counts(both, w=8), probes, w=8).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= c for t, c in exact.items())
    assert sum(est.values()) > sum(exact.values())  # w=8 forces collisions

    whole = {(r["row"], r["pos"]): r["cnt"] for r in CO.cms_counts(both, w=8).collect()}
    merged = {}
    for part in (a, b):
        for r in CO.cms_counts(part, w=8).collect():
            k = (r["row"], r["pos"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert whole == merged


def test_cms_exact_when_wide(spark):
    """With w far above the vocabulary, every estimate is exact."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i} shared") for i in range(20)], "doc_id long, text string"
    )
    est = {r["tok"]: r["est_count"] for r in CO.cms_token_estimates(docs, w=8192).collect()}
    assert est["shared"] == 20
    assert all(est[f"w{i}"] == 2 for i in range(20))


def test_forget_docs_and_audit(spark):
    """Deletion removes exactly the requested present ids; the certificate
    reports found=md5 for removed docs, 'absent' for unknown ids; re-running
    after deletion is idempotent (everything reports absent)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    forget = spark.createDataFrame([(3,), (7,), (99,)], "doc_id long")
    kept = CO.forget_docs(docs, forget)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [
        0, 1, 2, 4, 5, 6, 8, 9,
    ]
    audit = {r.doc_id: (r.found, r.text_md5) for r in CO.forget_audit(docs, forget).collect()}
    assert set(audit) == {3, 7, 99}
    assert audit[3][0] and audit[7][0] and audit[3][1] != "absent"
    assert audit[99] == (False, "absent")
    # idempotent re-request against the already-deleted corpus
    audit2 = {r.doc_id: r.found for r in CO.forget_audit(kept, forget).collect()}
    assert audit2 == {3: False, 7: False, 99: False}


def test_length_quantiles_order_statistics(spark):
    """Q(p) is the ⌈np/100⌉-th order statistic: token counts 1..10 give
    p25→3, p50→5, p75→8, p90→9, p99→10."""
    rows = [(i, " ".join(["tok"] * i), "a") for i in range(1, 11)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.p: (r.value, r.n_docs) for r in CO.length_quantiles(docs).collect()}
    assert got == {25: (3, 10), 50: (5, 10), 75: (8, 10), 90: (9, 10), 99: (10, 10)}


def test_length_quantiles_ties_and_groups(spark):
    # all-equal values: every quantile is that value; groups independent
    rows = [(i, "x y z", "a") for i in range(4)] + [(10, "x", "b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r.source, r.p): r.value for r in CO.length_quantiles(docs).collect()}
    assert all(v == 3 for (s, _), v in got.items() if s == "a")
    assert all(v == 1 for (s, _), v in got.items() if s == "b")
    # empty corpus: no rows, no crash
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert CO.length_quantiles(empty).count() == 0


def test_corpus_health_rates(spark):
    long_ok = "the " * 30  # passes: >=64 chars, >=12 tokens, stopwords, low punct
    rows = [
        (1, long_ok, "a"),
        (2, long_ok, "a"),          # exact dup of 1
        (3, "short", "a"),          # fails quality
        (4, long_ok + "x", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in CO.corpus_health(docs).collect()}
    a = got["a"]
    assert (a.n_docs, a.n_unique, a.n_quality) == (3, 2, 2)
    assert a.dup_rate_bp == 3333 and a.quality_rate_bp == 6666
    b = got["b"]
    assert b.dup_rate_bp == 0 and b.quality_rate_bp == 10000


def test_source_overlap_matrix(spark):
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    rows = [
        (1, "alpha beta gamma delta epsilon", "s1"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s2"),
        (3, "totally disjoint third corpus body here", "s3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {(r.source_a, r.source_b): r for r in CO.source_overlap(docs).collect()}
    # s1 (3 shingles) fully contained in s2 (8 shingles); s3 disjoint → absent
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    assert (r.na, r.nb, r.n_shared) == (3, 8, 3)
    assert r.contain_a_bp == 10000
    assert r.contain_b_bp == 3750
    assert r.jaccard_bp == 3750


def test_source_overlap_plan_broadcasts_sizes(spark):
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO
    from graphical_context_extraction_pipeline_spark.plans.explain import physical_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = physical_plan(CO.source_overlap(docs))
    assert "SinglePartition" not in plan, plan
    # the two sizes joins ride broadcast exchanges, not shuffles
    assert plan.count("BroadcastHashJoin") >= 2, plan
