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


def test_simhash_hot_bucket_mixed_content_two_tier(spark):
    """A hot bucket holding TWO content groups (a giant identical cluster +
    one near-variant that shares a band): tier 1 keeps every identical
    pair lossless at hamming 0 around the GROUP hub, and tier 2 pairs the
    distinct group hubs, so the near-variant is still found. This is the
    bucket composition where a single arbitrary-hub star goes blind —
    simhash band keys are 15 bits, so beyond ~cap·2^15 docs hot buckets
    hold mutually dissimilar content."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    cands = [f"{base} variant {i}" for i in range(40)]
    sims = {
        r["doc_id"]: (r["simhash"], [r[f"band{j}"] for j in range(4)])
        for r in dedup.simhash(
            spark.createDataFrame(
                [("base", base)] + [(f"c{i}", t) for i, t in enumerate(cands)],
                "doc_id string, text string",
            )
        ).collect()
    }
    hb, bands_b = sims["base"]
    pick = None
    for i in range(40):
        h, bands = sims[f"c{i}"]
        hd = bin(hb ^ h).count("1")
        if 0 < hd <= 8 and any(x == y for x, y in zip(bands, bands_b)):
            pick = cands[i]
            break
    assert pick is not None, "no candidate shares a band with the base text"

    rows = [(f"dup_{i:02d}", base) for i in range(20)] + [("variant", pick)]
    got = dedup.simhash_near_pairs(
        spark.createDataFrame(rows, "doc_id string, text string"), max_bucket=10
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in got}
    dups = {f"dup_{i:02d}" for i in range(20)}
    hub = min(dups)
    # tier 1: every identical member pairs with its group hub at hamming 0
    assert {(hub, d) for d in dups - {hub}} <= set(pairs)
    assert all(pairs[(hub, d)] == 0 for d in dups - {hub})
    # tier 2: the two group hubs pair, at the true (nonzero) hamming
    assert (hub, "variant") in pairs and pairs[(hub, "variant")] > 0
