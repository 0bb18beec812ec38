"""Hot-shingle (stop-phrase) cap for ngram_jaccard_pairs: a shingle shared
by more than MAX_DOCS_PER_SHINGLE documents must not drive quadratic bucket
expansion — it is excluded from blocking BEFORE any bucket is collected."""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.dedup import (
    MAX_DOCS_PER_SHINGLE,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """1000 docs all sharing one hot stop-phrase ("subscribe like and" ...)
    plus unique content; docs 0/1 are true near-duplicates of each other."""
    stop = "please remember to subscribe and like this video"
    rows = []
    for i in range(1000):
        uniq = " ".join(f"tok{i}x{j}" for j in range(30))
        rows.append((i, f"{stop} {uniq}"))
    # a true near-dup pair: same long unique body, tiny tail difference
    body = " ".join(f"shared{j}" for j in range(60))
    rows.append((2001, f"{stop} {body}"))
    rows.append((2002, f"{stop} {body} extra"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_pairs_bounded(hot_corpus):
    got = ngram_jaccard_pairs(hot_corpus, min_jaccard_bp=5000).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    # the planted near-dup pair survives (its signal is in non-hot shingles)
    assert (2001, 2002) in pairs
    # no pair exists purely because of the stop-phrase: any such pair would
    # have jaccard ≈ 6/66 ≈ 900bp anyway, but more importantly the blocking
    # never expanded the 1002-doc bucket at all
    assert all(a == 2001 for a, _ in pairs), sorted(pairs)[:5]


def test_hot_shingle_removed_before_collect(hot_corpus):
    """Plan property: the hot-shingle exclusion is an anti-join upstream of
    the bucket collect_list — the cap is structural, not post-hoc."""
    plan = (
        ngram_jaccard_pairs(hot_corpus)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, plan


def test_cap_is_mirrored_in_threshold():
    # documents appearing in ≤ K docs are unaffected: with 3 docs sharing a
    # shingle and K=64 nothing is dropped (sanity of the default)
    assert MAX_DOCS_PER_SHINGLE >= 8


@pytest.fixture(scope="module")
def all_hot_corpus(spark):
    """Two clusters of 70 IDENTICAL docs each: with K=64 every shingle of
    both texts is hot, so before the all-hot fallback these docs emitted
    zero pairs — the exact recall hole for boilerplate-dominated corpora."""
    text_a = "please like share and subscribe to this fantastic channel today"
    text_b = "click the bell icon to never miss another upload from us folks"
    rows = [(i, text_a) for i in range(70)] + [(100 + i, text_b) for i in range(70)]
    # one pair of sub-cap near-dups as a control for the main path
    body = " ".join(f"w{j}" for j in range(40))
    rows += [(900, body), (901, body + " tail")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_hot_docs_pair_via_signature_star(all_hot_corpus):
    got = ngram_jaccard_pairs(all_hot_corpus).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    jac = {(r.doc_a, r.doc_b): r.jaccard_bp for r in got}
    # each identical cluster forms a hub star anchored at its min doc_id,
    # with exact jaccard 10000
    star_a = {(0, i) for i in range(1, 70)}
    star_b = {(100, 100 + i) for i in range(1, 70)}
    assert star_a <= pairs and star_b <= pairs
    assert all(jac[p] == 10000 for p in star_a | star_b)
    # no cross-cluster pairs (different shingle sets stay unpaired)
    assert not any(a < 100 <= b for a, b in pairs if b < 900)
    # the sub-cap control pair still flows through the main path
    assert (900, 901) in pairs
    # star pairs carry n_shared == n_union == the doc's shingle-set size
    row = next(r for r in got if (r.doc_a, r.doc_b) == (0, 1))
    assert row.n_shared == row.n_union > 0


def test_winnowing_guarantee_and_replica(spark):
    """Any shared token run of length >= w + k - 1 = 6 forces a shared
    fingerprint (the MOSS guarantee); full python replica."""
    import hashlib

    from graphical_context_extraction_pipeline_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine ten eleven"),
            (3, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    k, w = 3, 4
    P, C = 2147483647, 1000003

    def fps(text):
        toks = text.lower().split()
        th = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        kh = []
        for i in range(len(th) - k + 1):
            acc = th[i]
            for j in range(1, k):
                acc = (acc * C + th[i + j]) % P
            kh.append(acc)
        if not kh:
            return set()
        if len(kh) < w:
            return {min(kh)}
        return {min(kh[i:i + w]) for i in range(len(kh) - w + 1)}

    got = {}
    for r in dedup.winnow_fingerprints(docs, k, w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    texts = {1: f"one two {shared} three", 2: f"{shared} nine ten eleven",
             3: "totally different words here entirely now"}
    assert got == {i: fps(t) for i, t in texts.items() if fps(t)}
    # the guarantee: docs 1 and 2 share a fingerprint; doc 3 shares none
    assert got[1] & got[2]
    assert not (got[1] & got[3]) and not (got[2] & got[3])
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in dedup.winnow_pairs(docs, k, w, min_shared=1).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == len(got[1] & got[2])


def test_cdc_chunks_replica_and_shift_resistance(spark):
    import hashlib

    from graphical_context_extraction_pipeline_spark.operators import dedup

    def py_chunks(text, mask=31):
        toks = text.lower().split()
        if not toks:
            return []
        th = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        chunks, cur = [], []
        for t, h in zip(toks, th):
            cur.append(t)
            if h % (mask + 1) == 0:
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        return [
            (i, hashlib.md5(" ".join(c).encode()).hexdigest(), len(c))
            for i, c in enumerate(chunks)
        ]

    import random
    rng = random.Random(7)
    vocab = [f"tok{j}" for j in range(50)]
    body = " ".join(rng.choice(vocab) for _ in range(400))
    shifted = "prefix inserted tokens " + body
    docs = spark.createDataFrame(
        [(1, body), (2, shifted), (3, ""), (4, "single")],
        "doc_id long, text string",
    )
    got = {}
    for r in dedup.cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_hash"], r["n_tokens"])
        )
    for d in got:
        got[d].sort()
    assert got.get(3) is None  # empty doc yields no chunks
    assert got[4] == py_chunks("single")
    assert got[1] == py_chunks(body)
    assert got[2] == py_chunks(shifted)
    # shift resistance: the prefix perturbs only the first chunk region —
    # the vast majority of chunk hashes survive verbatim
    h1 = {h for _, h, _ in got[1]}
    h2 = {h for _, h, _ in got[2]}
    assert len(h1 & h2) >= len(h1) - 1
    # boundary split only where md5_32(token) % 32 == 0 (replica already
    # asserts exact equality; this pins the expected chunk-size regime)
    assert 4 <= len(got[1]) <= 40


def test_winnow_kernel_equals_expression_twin(spark):
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fast = {(r["doc_id"], r["fp"]) for r in dedup.winnow_fingerprints(docs).collect()}
    slow = {
        (r["doc_id"], r["fp"])
        for r in dedup.winnow_fingerprints_expr(docs).collect()
    }
    assert fast == slow and fast
    plan = dedup.winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
