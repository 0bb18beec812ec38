"""Kneser-Ney cross-domain doc scoring + Moore-Lewis (2010) selection.

Pins the three backoff regimes (observed bigram / seen prefix / unseen
prefix), the KN continuation signature surviving into DOC scores, the
contrastive selection direction, and the sentinel/edge behaviour.
"""

from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_observed_bigram_matches_kn_model(spark):
    """A doc scored under an LM containing all its bigrams reproduces the
    kneser_ney_bigrams probabilities: s = 30 - bit_length(p_kn_e9)."""
    lm = _docs(spark, [(0, "a b a b a c")])  # bigrams: ab ba ab ba ac
    doc = _docs(spark, [(1, "a b"), (2, "a c")])
    model = {
        (r["w1"], r["w2"]): r["p_kn_e9"]
        for r in TA.kneser_ney_bigrams(lm).collect()
    }
    out = _by_id(TA.kn_doc_surprisal(doc, lm))
    for doc_id, pair in [(1, ("a", "b")), (2, ("a", "c"))]:
        expected = 100 * (30 - max(model[pair], 1).bit_length())
        assert out[doc_id]["n_bigrams"] == 1
        assert out[doc_id]["kn_surprisal_e2"] == expected


def test_backoff_regimes_ordered(spark):
    """Unseen bigram with a seen prefix scores between the observed
    bigram and the unseen-everything floor; unseen-suffix hits s=29."""
    lm = _docs(spark, [(0, "x y " * 20 + "x z")])  # x→y dominant, z rare
    probe = _docs(
        spark,
        [
            (1, "x y"),  # observed, high p
            (2, "z y"),  # unseen bigram, seen prefix z → λ(z)·pcont(y)
            (3, "q q"),  # unseen prefix AND unseen continuation → floor
        ],
    )
    out = _by_id(TA.kn_doc_surprisal(probe, lm))
    assert out[1]["kn_surprisal_e2"] < out[2]["kn_surprisal_e2"]
    assert out[2]["kn_surprisal_e2"] < out[3]["kn_surprisal_e2"]
    assert out[3]["kn_surprisal_e2"] == 2900  # greatest(p,1) → s = 29


def test_continuation_signature_in_doc_scores(spark):
    """KN's signature at the DOC level: after an unseen prefix, a
    many-context continuation ('city') outscores an equal-count
    single-context one ('francisco')."""
    lm = _docs(
        spark,
        [
            (0, "san francisco " * 3),  # 'francisco' only ever after 'san'
            (1, "new city old city big city"),  # 'city' after 3 contexts
        ],
    )
    probe = _docs(spark, [(10, "quebec francisco"), (11, "quebec city")])
    out = _by_id(TA.kn_doc_surprisal(probe, lm))
    assert out[11]["kn_surprisal_e2"] < out[10]["kn_surprisal_e2"]


def test_short_doc_sentinel(spark):
    lm = _docs(spark, [(0, "a b c")])
    out = _by_id(TA.kn_doc_surprisal(_docs(spark, [(1, "solo"), (2, "")]), lm))
    assert out[1] == {"doc_id": 1, "n_bigrams": 0, "kn_surprisal_e2": -1}
    assert out[2] == {"doc_id": 2, "n_bigrams": 0, "kn_surprisal_e2": -1}


def test_moore_lewis_selects_target_like_docs(spark):
    """The contrastive signal: pool = 1 target-like doc + generic chatter;
    only docs reading like the target domain survive diff ≤ 0."""
    target_text = "spark shuffle partition spark shuffle partition"
    pool = _docs(
        spark,
        [
            (1, target_text),  # in-domain verbatim style
            (2, "spark shuffle partition again"),  # in-domain-ish
            (3, "weather report sunny tomorrow maybe rain"),  # off-domain
            (4, "weather report sunny tomorrow maybe rain"),
            (5, "banana orange apple pear melon grape"),  # off-domain
            (6, "hm"),  # unscoreable → excluded, never a -1 row
        ],
    )
    target = _docs(spark, [(100, target_text), (101, "spark shuffle spark")])
    kept = _by_id(TA.moore_lewis_select(pool, target, max_diff_e2=0))
    assert 1 in kept
    assert not {3, 4, 5, 6} & set(kept)
    for r in kept.values():
        assert r["diff_e2"] == r["in_e2"] - r["out_e2"]
        assert r["diff_e2"] <= 0
    # the contrastive ordering holds even where the hard gate is tight:
    # the in-domain-ish doc 2 sits strictly below the off-domain docs
    loose = _by_id(TA.moore_lewis_select(pool, target, max_diff_e2=10_000))
    assert loose[2]["diff_e2"] < loose[3]["diff_e2"]
    assert loose[2]["diff_e2"] < loose[5]["diff_e2"]


def test_moore_lewis_threshold_monotone(spark):
    """Loosening max_diff_e2 only adds docs (selection is a filter on a
    fixed per-doc score, not a re-ranking)."""
    pool = _docs(
        spark,
        [(i, f"tok{i % 3} tok{(i + 1) % 3} tok{i % 5} tok{(i + 2) % 5}") for i in range(20)],
    )
    target = _docs(spark, [(100, "tok0 tok1 tok2 tok0 tok1")])
    tight = set(_by_id(TA.moore_lewis_select(pool, target, max_diff_e2=0)))
    loose = set(_by_id(TA.moore_lewis_select(pool, target, max_diff_e2=500)))
    assert tight <= loose
    assert len(loose) > len(tight)
