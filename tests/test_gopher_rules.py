"""Hand-built edge cases for the Gopher rule bundle (Rae et al. 2021,
Table A1): each rule is violated by exactly one crafted document so the
per-rule booleans — not just the composite keep — are pinned."""

import pytest

from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

STOPS = "the be to of and that have with"  # all 8 Gopher stop words


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return {r["doc_id"]: r.asDict() for r in df.collect()}[doc_id]


def test_gopher_rules_per_rule_edges(spark):
    good_body = " ".join(["alpha beta gamma delta"] * 15)  # 60 words, len 5ish
    rows = [
        # 0: passes everything (60 body words + 8 stop words = 68 words)
        (0, STOPS + " " + good_body),
        # 1: too few words (10)
        (1, STOPS + " aa bb"),
        # 2: mean word length too long (every word 12 chars)
        (2, STOPS + " " + " ".join(["abcdefghijkl"] * 50)),
        # 3: symbol-heavy: 10 hashes + ellipses against 68 words
        (3, STOPS + " " + good_body + " ####### ### ... ..."),
        # 4: bullet-heavy: 10 lines, 9 bullets (90% is NOT < 90%)
        (4, "\n".join(["- item " + STOPS] * 9 + [good_body])),
        # 5: ellipsis line endings: 10 lines, 3 end with ... (30% not < 30%)
        (5, "\n".join(["cut short ..."] * 3 + [STOPS + " " + good_body] * 7)),
        # 6: alpha-poor: 40 numeric words vs 8 stops + 12 words
        (6, STOPS + " " + " ".join(["123456"] * 40) + " " + " ".join(["word"] * 12)),
        # 7: only 1 distinct stop word
        (7, "the " + " ".join(["alpha beta gamma delta"] * 15)),
    ]
    out = {r["doc_id"]: r.asDict() for r in TA.gopher_rules(_mk(spark, rows)).collect()}

    assert out[0]["keep"] is True and all(
        out[0][k] for k in ["r_wordcount", "r_meanlen", "r_symbol", "r_bullet",
                            "r_ellipsis", "r_alpha", "r_stop"]
    )
    failures = {1: "r_wordcount", 2: "r_meanlen", 3: "r_symbol", 4: "r_bullet",
                5: "r_ellipsis", 6: "r_alpha", 7: "r_stop"}
    for doc_id, rule in failures.items():
        assert out[doc_id][rule] is False, f"doc {doc_id} should fail {rule}"
        assert out[doc_id]["keep"] is False

    # counting signals on doc 3: 10 '#' chars, 2 '...' runs
    assert out[3]["n_words"] == 72
    # doc 4: 10 non-blank lines, 9 bullet-prefixed
    assert out[4]["n_lines"] == 10


def test_gopher_rules_degenerate_docs(spark):
    rows = [
        (0, ""),                       # empty: 0 words, 0 lines
        (1, "   \n\n   "),             # space-only lines all drop
        (2, "• bullet " + STOPS), # unicode bullet counts as bullet line
        (3, "  \t "),                  # trim is SPACE-only: '\t' survives
    ]
    out = {r["doc_id"]: r.asDict() for r in TA.gopher_rules(_mk(spark, rows)).collect()}
    for d in (0, 1):
        assert out[d]["n_words"] == 0
        assert out[d]["n_lines"] == 0
        assert out[d]["r_wordcount"] is False
        # vacuous line rules hold, symbol rule fails (0 < 0 is false)
        assert out[d]["r_bullet"] is True and out[d]["r_ellipsis"] is True
        assert out[d]["r_symbol"] is False
        assert out[d]["keep"] is False
    assert out[2]["n_lines"] == 1
    assert out[2]["r_bullet"] is False  # 1/1 bullet lines >= 90%
    # Spark/DuckDB trim() strip 0x20 only — a tab-bearing line is non-blank
    # under the shared line convention (same as repetition_stats)
    assert out[3]["n_lines"] == 1 and out[3]["n_words"] == 0


def test_gopher_rules_boundary_thresholds(spark):
    # exactly 50 words of exactly mean length 3..10 boundaries
    w50_len3 = " ".join(["abc"] * 42) + " " + STOPS  # 50 words, stops are 2-4 chars
    rows = [(0, w50_len3)]
    out = _row(TA.gopher_rules(_mk(spark, rows)), 0)
    assert out["n_words"] == 50
    assert out["r_wordcount"] is True  # >= 50 inclusive
    # word_chars = 42*3 + (3+2+2+2+3+4+4+4) = 126 + 24 = 150 = 3*50 exactly
    assert out["word_chars"] == 150
    assert out["r_meanlen"] is True  # inclusive lower bound
