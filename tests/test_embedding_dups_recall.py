"""embedding_cosine_dups: the multi-table banded blocking must find every
planted near-duplicate pair that a brute-force O(n²) cosine pass finds —
recall 1.0 on the driver corpus, verified blocking-independently."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from graphical_context_extraction_pipeline_spark.operators.similarity import (
    _dot,
    _norm,
    embedding_cosine_dups,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def planted(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return entrymod._planted_emb(emb).cache()


def _brute_pairs(planted, min_cos_e4=9000):
    a = planted.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = planted.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cand = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.select("vec_a", "vec_b", F.floor(cos * 10000).cast("long").alias("cos_e4"))
        .where(F.col("cos_e4") >= min_cos_e4)
    )


def test_planted_pairs_found_with_full_recall(planted):
    exact = {(r.vec_a, r.vec_b, r.cos_e4) for r in _brute_pairs(planted).collect()}
    banded = {(r.vec_a, r.vec_b, r.cos_e4) for r in embedding_cosine_dups(planted).collect()}
    assert len(exact) > 0, "corpus must contain planted near-dups"
    assert banded == exact, (
        f"recall {len(banded & exact)}/{len(exact)}, spurious {len(banded - exact)}"
    )


def test_plants_are_the_only_pairs(planted):
    """The natural corpus has no pair above the threshold (max natural
    cosine ≈ 0.51), so every reported pair involves a planted copy."""
    for r in embedding_cosine_dups(planted).collect():
        assert r.vec_b >= 600000, r
