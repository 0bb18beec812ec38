"""Near-dup cluster resolution: connected components over pair edges,
canonical selection, surviving-corpus materialization."""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.cluster import (
    connected_components,
    neardup_clusters,
    neardup_survivors,
)


@pytest.fixture(scope="module")
def graph(spark):
    # chain 1-2-3-4-5 (diameter 4 → forces several propagation rounds),
    # clique {10,11,12}, isolated pair {20,21}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12), (20, 21)]
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i,) for i in range(1, 31)], "doc_id long")


def test_connected_components(graph):
    got = {r["doc_id"]: r["component"] for r in connected_components(graph).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_orientation_invariant(spark, graph):
    """Edge direction must not matter: reversing every pair yields the
    same components."""
    rev = graph.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    a = {(r["doc_id"], r["component"]) for r in connected_components(graph).collect()}
    b = {(r["doc_id"], r["component"]) for r in connected_components(rev).collect()}
    assert a == b


def test_cluster_sizes(graph):
    got = {r["doc_id"]: (r["component"], r["n_members"]) for r in neardup_clusters(graph).collect()}
    assert got[3] == (1, 5)
    assert got[12] == (10, 3)
    assert got[21] == (20, 2)


def test_survivors(docs, graph):
    got = {r["doc_id"]: r["n_merged"] for r in neardup_survivors(docs, graph).collect()}
    # canonical member per cluster survives, carrying the cluster size
    assert got[1] == 5 and got[10] == 3 and got[20] == 2
    # non-canonical members are gone
    assert all(i not in got for i in (2, 3, 4, 5, 11, 12, 21))
    # unclustered docs survive with n_merged=1
    assert all(got[i] == 1 for i in list(range(6, 10)) + list(range(13, 20)) + list(range(22, 31)))
    # conservation: every corpus doc is represented exactly once
    assert sum(got.values()) == 30


def test_empty_pairs(spark, docs):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0
    surv = neardup_survivors(docs, empty)
    assert surv.count() == 30
    assert surv.agg(F.sum("n_merged")).first()[0] == 30


def test_nonconvergence_raises(spark):
    """A chain whose diameter exceeds max_iters must RAISE, not silently
    return partial (wrong) components."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    # and with enough rounds the same chain resolves to one component
    got = {r["component"] for r in connected_components(chain, max_iters=15).collect()}
    assert got == {1}
