"""Hot-bucket cap in the LSH pair expansions (minhash_lsh_pairs /
simhash_near_pairs): a band bucket with more than ``max_bucket`` members —
one giant near-dup cluster sharing every band key — switches from the
quadratic all-pairs expansion to a linear hub star. The star must cover
EVERY cluster member (connectivity for downstream connected-component
closure is preserved), and small buckets must keep the exact expansion.
"""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import dedup

CLUSTER = 30  # one near-identical cluster far above the test cap
CAP = 8


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # giant exact-duplicate cluster: identical signatures in every band
        *[
            (f"dup_{i:04d}", "the quick brown fox jumps over the lazy dog again and again")
            for i in range(CLUSTER)
        ],
        # a small (sub-cap) near-dup pair
        ("pair_a", "completely different text about spark and parquet tables"),
        ("pair_b", "completely different text about spark and parquet tables"),
        # singletons
        ("solo_1", "unrelated document describing minhash banding internals x"),
        ("solo_2", "another standalone text with its own vocabulary entirely y"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _components(pairs):
    """Union-find over collected pairs (test-side only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), set()).add(n)
    return comps


def test_minhash_hot_bucket_star_covers_cluster(docs):
    got = dedup.minhash_lsh_pairs(docs, max_bucket=CAP).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    dups = {f"dup_{i:04d}" for i in range(CLUSTER)}
    hub = min(dups)
    # the hot cluster expands as a hub star: exactly hub↔member pairs, no
    # quadratic member↔member pairs
    cluster_pairs = {p for p in pairs if p[0] in dups and p[1] in dups}
    assert cluster_pairs == {(hub, d) for d in dups if d != hub}
    # connectivity: the whole cluster is one component
    comps = _components(pairs)
    assert dups <= comps[hub]
    # sub-cap buckets keep the exact expansion
    assert ("pair_a", "pair_b") in pairs


def test_minhash_uncapped_equals_capped_closure(docs):
    """At a cap larger than any bucket the output is the classic all-pairs
    expansion; the capped variant must induce the same connected
    components (the information dedup consumers use)."""
    uncapped = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(docs).collect()}
    capped = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_pairs(docs, max_bucket=CAP).collect()}
    assert _components(uncapped) == _components(capped)
    assert len(capped) < len(uncapped)  # the star is strictly smaller


def test_simhash_hot_bucket_star(docs):
    got = dedup.simhash_near_pairs(docs, max_bucket=CAP).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    hammings = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in got}
    dups = {f"dup_{i:04d}" for i in range(CLUSTER)}
    hub = min(dups)
    cluster_pairs = {p for p in pairs if p[0] in dups and p[1] in dups}
    assert cluster_pairs == {(hub, d) for d in dups if d != hub}
    assert all(hammings[p] == 0 for p in cluster_pairs)  # identical texts
    comps = _components(pairs)
    assert dups <= comps[hub]
    assert ("pair_a", "pair_b") in pairs


def test_simhash_payload_survives_star_path(docs):
    """The star path must carry the hub's simhash for the hamming filter:
    with identical texts the hub-member hamming is 0, so no star pair may
    be dropped by the ≤ max_hamming filter."""
    got = dedup.simhash_near_pairs(docs, max_hamming=0, max_bucket=CAP).collect()
    dups = {f"dup_{i:04d}" for i in range(CLUSTER)}
    cluster_pairs = {(r["doc_a"], r["doc_b"]) for r in got if r["doc_a"] in dups}
    assert len(cluster_pairs) == CLUSTER - 1
