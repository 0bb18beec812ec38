"""Incremental near-dup dedup (batch vs seen-corpus LSH index):
construction-level guarantees that hold deterministically —

- an EXACT copy of a seen doc has an identical minhash signature, so it
  collides in every band and is always rejected;
- a batch doc with a token set fully disjoint from every seen doc shares
  no shingle hash, so (modulo an astronomically unlikely 31-bit band-key
  accident, fixed by construction here) it never collides and survives;
- in-batch exact duplicates resolve to one canonical (min doc_id)
  survivor carrying the group size in n_merged;
- a hot seen bucket (a >MAX_DOCS_PER_BUCKET identical-doc cluster) is
  represented in the index by its min-doc hub ONLY: a colliding batch doc
  gains exactly one candidate pair, not one per cluster member.
"""

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vocab_text(i: int) -> str:
    return " ".join(f"w{i}{c}" for c in "abcdefgh")


@pytest.fixture(scope="module")
def seen(spark):
    return _docs(spark, [(i, _vocab_text(i)) for i in range(10)])


def test_incremental_pairs_and_survivors(spark, seen):
    batch = _docs(
        spark,
        [
            (1000, _vocab_text(0)),   # exact copy of seen doc 0 → rejected
            (1001, "f1a f1b f1c f1d f1e"),  # fresh → survives (canonical)
            (1002, "f1a f1b f1c f1d f1e"),  # in-batch dup of 1001 → folded
            (1003, "f3a f3b f3c f3d f3e"),  # fresh, distinct → survives
        ],
    )
    pairs = dedup.minhash_incremental_pairs(batch, seen).collect()
    assert (1000, 0) in {(r.doc_new, r.doc_seen) for r in pairs}
    assert {r.doc_new for r in pairs} == {1000}  # fresh docs never collide

    surv = {r.doc_id: r.n_merged for r in dedup.neardup_incremental_survivors(batch, seen).collect()}
    assert surv == {1001: 2, 1003: 1}


def test_hot_seen_bucket_represented_by_hub(spark):
    """1500 identical seen docs > MAX_DOCS_PER_BUCKET=1024: every band
    bucket is hot, the index keeps one hub row per band, and a colliding
    batch doc emits exactly the (batch, hub) pair."""
    hot_text = "hot cluster template page body text here"
    seen = _docs(spark, [(i, hot_text) for i in range(1500)] + [(5000, _vocab_text(7))])
    batch = _docs(spark, [(9000, hot_text), (9001, "q1a q1b q1c q1d q1e")])

    pairs = [
        (r.doc_new, r.doc_seen)
        for r in dedup.minhash_incremental_pairs(batch, seen).collect()
    ]
    assert pairs == [(9000, 0)]  # hub only — never 1500 pairs

    surv = {r.doc_id: r.n_merged for r in dedup.neardup_incremental_survivors(batch, seen).collect()}
    assert surv == {9001: 1}


def test_index_composes_from_banded_signatures(spark, seen):
    """banded_signatures is the materialized-index relation: bands × docs
    rows, 4 band keys per doc."""
    idx = dedup.banded_signatures(seen)
    counts = idx.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 4 for r in counts) and len(counts) == 10


# --- bloom-prefiltered exact incremental dedup -----------------------------


def test_bloom_incremental_equals_plain_even_at_extreme_fp_rate(spark):
    """Bloom filters have no false negatives, so the bloom-prefiltered
    operator must return EXACTLY dedup_incremental's answer at any m_bits —
    pinned at m=16 where nearly every doc is a false positive (everything
    funnels through the exact anti-join) and at a comfortable m."""
    seen = _docs(spark, [(i, _vocab_text(i)) for i in range(40)])
    batch = _docs(
        spark,
        [(100, _vocab_text(3)), (101, _vocab_text(7))]  # true dups of seen
        + [(110 + i, f"fresh doc {i} xyz") for i in range(6)]  # new
        + [(120, "fresh doc 0 xyz")],  # in-batch dup of 110
    )
    want = sorted(map(tuple, dedup.dedup_incremental(batch, seen).collect()))
    for m_bits in (16, 4096):
        got = sorted(
            map(tuple, dedup.dedup_incremental_bloom(batch, seen, m_bits=m_bits).collect())
        )
        assert got == want, m_bits
    # sanity on the construction itself: the two true dups were rejected,
    # the in-batch pair resolved to one survivor with n_batch_dups=2
    by_id = {t[0]: t for t in want}
    assert 100 not in by_id and 101 not in by_id
    assert by_id[110][2] == 2


def test_bloom_index_bounded_and_monotone(spark):
    """The bit set is bounded by m_bits and growing the corpus only ADDS
    positions (monotone) — the property that makes the index maintainable
    by union+distinct on ingest."""
    a = _docs(spark, [(i, _vocab_text(i)) for i in range(10)])
    b = _docs(spark, [(i, _vocab_text(i)) for i in range(25)])
    bits_a = {r["bit_pos"] for r in dedup.bloom_index(a, m_bits=512).collect()}
    bits_b = {r["bit_pos"] for r in dedup.bloom_index(b, m_bits=512).collect()}
    assert bits_a <= bits_b
    assert all(0 <= p < 512 for p in bits_b)
    assert len(bits_b) <= 512


def test_similar_to_point_lookup(spark):
    """The retrieval twin of the pair family: an exact copy scores 10000,
    a suffix-mutated copy scores high, unrelated text scores nothing, a
    too-short query yields an empty (schema-stable) result."""
    from graphical_context_extraction_pipeline_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda mu"),
            (3, "completely different words nothing shared here at all today"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.jaccard_bp for r in dedup.similar_to(docs, base).collect()}
    assert got[1] == 10000
    assert 2 in got and 6000 <= got[2] < 10000
    assert 3 not in got
    # short query (< n tokens): empty result, schema intact
    out = dedup.similar_to(docs, "one two")
    assert out.count() == 0 and out.columns == ["doc_id", "jaccard_bp"]


def test_simhash_incremental_matches_full_rebuild_cross_pairs(spark):
    """No hot bucket ⇒ simhash_incremental_pairs(new, seen) ≡ the
    (seen, new) cross-pairs of simhash_near_pairs(seen ∪ new) — the
    incremental index join IS the full rebuild restricted to cross edges
    (batch ids are all above the seen range, and near_pairs orders
    doc_a < doc_b, so cross pairs are exactly doc_a<100000<=doc_b)."""
    seen = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i} epsilon zeta eta theta") for i in range(30)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100000 + i, f"alpha beta gamma delta doc{i} epsilon zeta eta iota")
         for i in range(0, 30, 3)],
        "doc_id long, text string",
    )
    incr = {
        (r.doc_seen, r.doc_new, r.hamming)
        for r in dedup.simhash_incremental_pairs(batch, seen, max_bucket=10_000).collect()
    }
    rebuild = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_pairs(
            seen.unionAll(batch), max_bucket=10_000
        ).collect()
        if r.doc_a < 100000 <= r.doc_b
    }
    assert incr == rebuild and len(incr) > 0


def test_simhash_incremental_hot_bucket_identical_group_lossless(spark):
    """Two-tier hot handling: a hot seen bucket made of IDENTICAL text
    collapses to one group hub, and an identical batch doc still matches
    it at hamming 0 (lossless for the clusters that actually create hot
    buckets); fan-out is one candidate, not one per member."""
    seen = spark.createDataFrame(
        [(i, "same boilerplate text everywhere always") for i in range(12)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100001, "same boilerplate text everywhere always")],
        "doc_id long, text string",
    )
    got = dedup.simhash_incremental_pairs(batch, seen, max_bucket=5).collect()
    assert [(r.doc_new, r.doc_seen, r.hamming) for r in got] == [(100001, 0, 0)]


def test_similar_from_index_merge_law(spark):
    """Serving twin: probing a standing banded-signature index returns
    EXACTLY the derive-per-call rows (the bm25/ann/phrase from_index
    discipline carried to the minhash family) — including when the
    signatures come back from parquet, the maintained-index shape."""
    import os
    import tempfile

    from graphical_context_extraction_pipeline_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda mu"),
            (3, "completely different words nothing shared here at all today"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        (r.doc_id, r.jaccard_bp) for r in dedup.similar_to(docs, base).collect()
    )
    sigs = dedup.banded_signatures(docs, dedup.N_MINHASH, dedup.LSH_BANDS)
    got = sorted(
        (r.doc_id, r.jaccard_bp)
        for r in dedup.similar_from_index(sigs, docs, base).collect()
    )
    assert got == want and len(want) == 2
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "sigs")
        sigs.write.parquet(path)
        standing = spark.read.parquet(path)
        got2 = sorted(
            (r.doc_id, r.jaccard_bp)
            for r in dedup.similar_from_index(standing, docs, base).collect()
        )
        assert got2 == want
