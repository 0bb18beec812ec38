"""Soft dedup (down-weight near-dup cluster members) and the
temperature-flattened mixture constructor."""

import math

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.cluster import soft_dedup
from graphical_context_extraction_pipeline_spark.operators.sampling import (
    _temper,
    quota_mixture,
    temperature_mixture,
)


@pytest.fixture(scope="module")
def graph(spark):
    # chain {1..5}, triangle {10,11,12}, pair {20,21}; docs 1..30
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)]
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i,) for i in range(1, 31)], "doc_id long")


def test_soft_dedup_weights(docs, graph):
    got = {r["doc_id"]: (r["n_members"], r["weight_e6"]) for r in soft_dedup(docs, graph).collect()}
    assert len(got) == 30  # every corpus doc present, none dropped
    for d in (1, 2, 3, 4, 5):
        assert got[d] == (5, 200000)
    for d in (10, 11, 12):
        assert got[d] == (3, 333333)
    for d in (20, 21):
        assert got[d] == (2, 500000)
    # singletons keep full weight
    assert got[7] == (1, 1000000)
    # a cluster's total mass never exceeds one document (floor per member)
    assert sum(got[d][1] for d in (10, 11, 12)) <= 1000000


def test_temper_matches_real_pow():
    # q in {1,2,4}: exactly floor(w^(q/4)) (within 1 for the composed q=1);
    # q=3: the composed floor loses up to ~sqrt(w)/2 absolute, but stays
    # within 1e-4 RELATIVE of w^0.75 — a tempering curve, not a quantile
    for w in [1, 2, 7, 100, 12345, 10**9, 2**40]:
        for q in (1, 2, 4):
            exact = w ** (q / 4)
            assert abs(_temper(w, q) - math.floor(exact)) <= 1, (w, q)
        exact3 = w**0.75
        assert _temper(w, 3) <= exact3 + 1
        # proven lower bound: inner floor loses <1, so the composed value
        # sits within w^(1/4)+1 below w^(3/4)
        assert _temper(w, 3) >= exact3 - w**0.25 - 1, w
    # monotone in w for each q
    for q in (1, 2, 3):
        vals = [_temper(w, q) for w in range(1, 2000, 13)]
        assert vals == sorted(vals)


@pytest.fixture(scope="module")
def skewed(spark):
    # one dominant source (90% of mass) + nine small tails
    rows = []
    for i in range(90):
        rows.append((i, "head", 1000))
    for s in range(9):
        for i in range(2):
            rows.append((1000 + s * 10 + i, f"tail{s}", 500))
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_alpha4_degrades_to_quota(skewed):
    a = sorted(map(tuple, temperature_mixture(skewed, k=50, alpha_q=4).collect()))
    b = sorted(map(tuple, quota_mixture(skewed, k=50).collect()))
    assert a == b


def test_temperature_flattens(skewed):
    def head_share(df):
        rows = df.collect()
        tot = sum(r["n_picks"] for r in rows)
        head = sum(r["n_picks"] for r in rows if r["source"] == "head")
        return head, tot

    h4, t4 = head_share(temperature_mixture(skewed, k=50, alpha_q=4))
    h2, t2 = head_share(temperature_mixture(skewed, k=50, alpha_q=2))
    assert t4 == 50 and t2 == 50  # Hamilton exactness survives tempering
    assert h2 < h4  # flattening: the head source loses picks at alpha=0.5


def test_temperature_exact_k_many(skewed):
    for k in (1, 7, 33):
        for q in (1, 2, 3):
            got = temperature_mixture(skewed, k=k, alpha_q=q).agg(
                F.sum("n_picks")
            ).collect()[0][0]
            assert got == k, (k, q)
