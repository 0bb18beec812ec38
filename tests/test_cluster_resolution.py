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


def test_star_rewriting_equals_propagation(spark, graph):
    """Large-star/small-star produces exactly the propagation algorithm's
    components on the mixed chain/clique/pair graph."""
    from graphical_context_extraction_pipeline_spark.operators.cluster import (
        connected_components_star,
    )

    want = {r["doc_id"]: r["component"] for r in connected_components(graph).collect()}
    got = {r["doc_id"]: r["component"] for r in connected_components_star(graph).collect()}
    assert got == want


def test_star_rewriting_handles_long_chain_in_log_rounds(spark):
    """The pathological case the propagation loop documents: a 60-hop chain
    exceeds its default 25-round cap, but star rewriting closes it (O(log n)
    rounds) inside a much smaller cap."""
    from graphical_context_extraction_pipeline_spark.operators.cluster import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 61)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain)  # default max_iters=25 < diameter
    got = {r["doc_id"]: r["component"]
           for r in connected_components_star(chain, max_rounds=12).collect()}
    assert got == {i: 1 for i in range(1, 62)}


def test_star_rewriting_random_graphs_fuzz(spark):
    """Randomized structural fuzz (fixed seeds): components from star
    rewriting equal a Python union-find ground truth."""
    import random

    from graphical_context_extraction_pipeline_spark.operators.cluster import (
        connected_components_star,
    )

    for seed in (7, 13, 99):
        rng = random.Random(seed)
        pairs = [(rng.randint(1, 40), rng.randint(1, 40)) for _ in range(50)]
        pairs = [(a, b) for a, b in pairs if a != b]
        parent = {n: n for ab in pairs for n in ab}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        # canonical = min member per root
        groups = {}
        for n in parent:
            groups.setdefault(find(n), []).append(n)
        want = {n: min(members) for members in groups.values() for n in members}
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {r["doc_id"]: r["component"]
               for r in connected_components_star(df).collect()}
        assert got == want, seed


def test_cluster_centroids_exact_means(spark):
    """Centroid = floor of the per-dim mean of floor(1e6·v) — verified
    against a hand computation including negative dimensions (the
    DIV-vs-floor-division trap zone)."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [
            (1, [0.5, -0.25]),
            (2, [0.7, -0.35]),
            (3, [9.9, 9.9]),  # not a member — must not pollute
        ],
        "vec_id long, embedding array<float>",
    )
    members = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2)], "doc_id long, component long, n_members long"
    )
    got = {(r.component, r.dim): (r.centroid_e6, r.n_members)
           for r in SIM.cluster_centroids(emb, members).collect()}
    # dim0: floor((500000 + 700000)/2) = 600000 (0.7 float32 -> 0.699999...)
    v07 = int(__import__("math").floor(float(__import__("numpy").float32(0.7)) * 1e6))
    v035 = int(__import__("math").floor(float(__import__("numpy").float32(-0.35)) * 1e6))
    import math
    assert got[(1, 0)] == (math.floor((500000 + v07) / 2), 2)
    # dim1: negative mean — floor semantics, not truncation
    assert got[(1, 1)] == (math.floor((-250000 + v035) / 2), 2)
    assert set(got) == {(1, 0), (1, 1)}
