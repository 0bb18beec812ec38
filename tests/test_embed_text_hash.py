"""Hashing-trick text vectorizer (similarity.hashed_features /
embed_text_hash): the documents→vectors bridge that lets the similarity
family (cosine_topk / semdedup / d4 / ANN) run end-to-end over raw text
with no GPU and no precomputed embeddings table.

Pins:
- dense kernel ≡ sparse JVM path (nonzero entries), so the zero-shuffle
  Arrow kernel and the codegen'd explode+groupBy twin provably hash the
  same (bucket, sign) pairs;
- the hash itself against a hand-computed md5 witness;
- empty / whitespace-only docs → all-zero vector (kept, not dropped:
  vectorization is total);
- sign-cancellation buckets appear in the sparse output with w = 0
  (matching the oracle's GROUP BY semantics);
- semdedup over hashed vectors: planted exact-duplicate text is dropped
  (kept=False for the higher id) — the end-to-end text-semantic-dedup
  property the family exists for.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.similarity import (
    cosine_topk,
    embed_text_hash,
    hashed_features,
    semdedup,
)


def _expected(token: str, dim: int = 64, salt: str = "emb"):
    h = int(hashlib.md5(f"{salt}:{token}".encode()).hexdigest()[:15], 16)
    return h % dim, 1 if (h // dim) % 2 == 0 else -1


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "Alpha beta  beta\tgamma"),
        (1, "alpha BETA beta gamma"),  # same bag as 0 after lower/split
        (2, ""),  # empty text -> zero vector
        (3, "   \t\n "),  # whitespace-only -> zero vector
        (4, "delta epsilon zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_hash_witness(spark, docs):
    emb = {r["vec_id"]: r["embedding"] for r in embed_text_hash(docs, 64).collect()}
    v = emb[0]
    expect = {}
    for t, n in (("alpha", 1), ("beta", 2), ("gamma", 1)):
        b, s = _expected(t)
        expect[b] = expect.get(b, 0) + s * n
    for b in range(64):
        assert v[b] == float(expect.get(b, 0))


def test_dense_equals_sparse_nonzero(spark, docs):
    dense = (
        embed_text_hash(docs, 64)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.posexplode("embedding").alias("bucket", "v"),
        )
        .where(F.col("v") != 0.0)
        .select("doc_id", F.col("bucket").cast("long").alias("bucket"),
                F.col("v").cast("long").alias("w"))
    )
    sparse = hashed_features(docs, 64).where(F.col("w") != 0)
    assert {tuple(r) for r in dense.collect()} == {
        tuple(r) for r in sparse.collect()
    }


def test_identical_bags_identical_vectors(spark, docs):
    emb = {r["vec_id"]: list(r["embedding"]) for r in embed_text_hash(docs).collect()}
    assert emb[0] == emb[1]
    assert emb[0] != emb[4]


def test_empty_docs_zero_vector_and_total(spark, docs):
    emb = {r["vec_id"]: list(r["embedding"]) for r in embed_text_hash(docs).collect()}
    assert set(emb) == {0, 1, 2, 3, 4}  # total: nothing dropped
    assert emb[2] == [0.0] * 64
    assert emb[3] == [0.0] * 64
    # sparse path emits NO row for token-free docs (nothing touched)
    sp = hashed_features(docs, 64)
    assert sp.where(F.col("doc_id").isin([2, 3])).count() == 0


def test_cancellation_bucket_kept_as_zero(spark):
    # find two tokens hashing to the SAME bucket with OPPOSITE signs
    i = 0
    pair = None
    seen = {}
    while pair is None:
        t = f"tok{i}"
        b, s = _expected(t)
        if (b, -s) in seen:
            pair = (seen[(b, -s)], t)
        else:
            seen.setdefault((b, s), t)
        i += 1
    d = spark.createDataFrame([(9, f"{pair[0]} {pair[1]}")], "doc_id long, text string")
    rows = hashed_features(d, 64).collect()
    assert len(rows) == 1 and rows[0]["w"] == 0  # touched, cancelled, present


def test_semdedup_over_hashed_drops_exact_dup(spark):
    base = [(i, f"unique tokens row{i} value{i} key{i} part{i}") for i in range(20)]
    rows = base + [(100, base[3][1])]  # doc 100 is an exact text dup of doc 3
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sd = semdedup(embed_text_hash(d, 64), n_centroids=4, tau_e4=9999)
    verdicts = {r["vec_id"]: r["kept"] for r in sd.collect()}
    assert verdicts[3] is True  # keep-first
    assert verdicts[100] is False  # the later exact dup drops
    assert sum(1 for k in verdicts.values() if not k) == 1


def test_cosine_topk_over_hashed_selfsim(spark):
    d = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "x y z w q")],
        "doc_id long, text string",
    )
    top = cosine_topk(embed_text_hash(d, 64), [0], k=2).collect()
    by_rank = {r["rank"]: r for r in top}
    assert by_rank[1]["vec_id"] == 1 and by_rank[1]["cos_e4"] == 10000
