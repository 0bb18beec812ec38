"""exact_substring_runs (Lee et al. 2022 ExactSubstr) + media_ref_pairs.

The run extractor's two distinguishing semantics vs the rest of the dedup
family are pinned here: TOTAL-occurrence counting (a phrase repeated twice
inside ONE document is a duplicate — duplicate_passages' distinct-document
frequency is blind to that) and maximal-run merging (a duplicated substring
longer than the window comes back as ONE run of its full length, not a
stack of overlapping windows). A seeded fuzz pins the whole pipeline
against a pure-python replica. media_ref_pairs pins the media-axis Jaccard
arithmetic, the hot-asset cap, and the all-hot identical-set hub star it
inherits from dedup._set_jaccard_pairs.
"""

import collections
import random
import re

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import dedup
from graphical_context_extraction_pipeline_spark.operators.multimodal import media_ref_pairs


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _runs(docs, l=8, min_count=2):
    return {
        (r.doc_id, r.run_start, r.run_end, r.run_len)
        for r in dedup.exact_substring_runs(docs, l, min_count).collect()
    }


PHRASE = "one two three four five six seven eight"  # exactly 8 tokens


def test_within_doc_repetition_counts(spark):
    # the duplicated 8-token phrase occurs twice in ONE doc and nowhere else
    docs = _corpus(
        spark,
        [
            (1, PHRASE + " interlude body text " + PHRASE),
            (2, "completely unrelated second document body with enough tokens here"),
        ],
    )
    got = _runs(docs)
    assert got == {(1, 0, 7, 8), (1, 11, 18, 8)}, got

    # distinct-document frequency (duplicate_passages) is blind to this doc
    assert dedup.duplicate_passages(docs, n=8, min_docs=2).count() == 0


def test_maximal_run_merging(spark):
    # a 10-token substring shared by two docs → ONE maximal run of length 10
    # in each doc (not three overlapping 8-windows)
    shared = PHRASE + " nine ten"
    docs = _corpus(
        spark,
        [(1, shared + " tail alpha beta"), (2, "lead words " + shared)],
    )
    got = _runs(docs)
    assert got == {(1, 0, 9, 10), (2, 2, 11, 10)}, got


def test_below_window_duplicates_ignored(spark):
    seven = "one two three four five six seven"
    docs = _corpus(
        spark,
        [(1, seven + " endnote"), (2, seven + " different"), (3, "other text")],
    )
    assert _runs(docs) == set()


def test_fuzz_vs_python_replica(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → dense collisions
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for d in range(60)
    ]
    l = 5
    docs = _corpus(spark, rows)
    got = _runs(docs, l=l, min_count=2)

    cnt, wins = collections.Counter(), {}
    for d, text in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        ws = [tuple(toks[i : i + l]) for i in range(len(toks) - l + 1)]
        wins[d] = ws
        cnt.update(ws)
    exp = set()
    for d, ws in wins.items():
        covered = sorted(
            {i + j for i, w in enumerate(ws) if cnt[w] >= 2 for j in range(l)}
        )
        if not covered:
            continue
        s = prev = covered[0]
        for x in covered[1:]:
            if x != prev + 1:
                exp.add((d, s, prev, prev - s + 1))
                s = x
            prev = x
        exp.add((d, s, prev, prev - s + 1))
    assert got == exp


# ---------------------------------------------------------------------------
# media_ref_pairs
# ---------------------------------------------------------------------------

SPAN_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span_doc(doc_id, refs):
    return (doc_id, [("frame", None, r, i * 1000) for i, r in enumerate(refs)])


def test_media_ref_jaccard_arithmetic(spark):
    # A={f1..f4}, B={f1..f3} → J = 3/4 = 7500bp; C disjoint
    docs = spark.createDataFrame(
        [
            _span_doc("a", ["f1", "f2", "f3", "f4"]),
            _span_doc("b", ["f1", "f2", "f3"]),
            _span_doc("c", ["g1", "g2"]),
        ],
        SPAN_DDL,
    )
    got = {(r.doc_a, r.doc_b): r for r in media_ref_pairs(docs, 5000).collect()}
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r.n_shared, r.n_union, r.jaccard_bp) == (3, 4, 7500)


def test_media_hot_asset_capped(spark):
    # a logo shared by every doc is dropped from blocking at the cap, so
    # docs sharing ONLY the logo emit no pair...
    docs = spark.createDataFrame(
        [_span_doc(f"d{i:02d}", ["logo", f"own{i}"]) for i in range(8)],
        SPAN_DDL,
    )
    assert media_ref_pairs(docs, 1, max_docs_per_ref=4).count() == 0

    # ...while docs with identical all-hot ref sets still pair via the
    # hub-star fallback at exact Jaccard 10000
    docs2 = spark.createDataFrame(
        [_span_doc(f"d{i:02d}", ["logo", "banner"]) for i in range(6)],
        SPAN_DDL,
    )
    rows = media_ref_pairs(docs2, 5000, max_docs_per_ref=4).collect()
    assert len(rows) == 5  # hub star: min-id hub pairs with the other 5
    assert all(r.doc_a == "d00" and r.jaccard_bp == 10000 for r in rows)


def test_media_duplicate_spans_deduped_intra_row(spark):
    # the same ref repeated within one doc counts once (distinct ref set)
    docs = spark.createDataFrame(
        [
            _span_doc("a", ["f1", "f1", "f2"]),
            _span_doc("b", ["f1", "f2"]),
        ],
        SPAN_DDL,
    )
    r = media_ref_pairs(docs, 5000).collect()
    assert len(r) == 1 and r[0].jaccard_bp == 10000 and r[0].n_union == 2
