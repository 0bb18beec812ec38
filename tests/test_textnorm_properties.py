"""Property-based tests (hypothesis) for the spec-level scalar primitives —
these functions are the shared semantics between the Spark pipeline and the
pure-Python oracle, so algebraic properties must hold on arbitrary input,
not just the synthetic corpus."""

from hypothesis import given, settings
from hypothesis import strategies as st

from graphical_context_extraction_pipeline_spark.functions.textnorm import (
    normalize_text,
    tfidf_cosine,
    tokens,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=200,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(text_st)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=300, deadline=None, derandomize=True)
@given(text_st)
def test_normalize_no_edge_or_double_spaces(s):
    n = normalize_text(s)
    assert n is not None
    assert n == n.strip(" ")
    assert "  " not in n
    assert "\t" not in n and "\n" not in n


@settings(max_examples=200, deadline=None, derandomize=True)
@given(text_st)
def test_tokens_match_python_split(s):
    assert tokens(normalize_text(s)) == normalize_text(s).lower().split()


@settings(max_examples=200, deadline=None, derandomize=True)
@given(text_st, text_st)
def test_tfidf_cosine_symmetric_and_bounded(a, b):
    c = tfidf_cosine(a, b)
    assert 0.0 <= c <= 1.0 + 1e-12
    assert abs(c - tfidf_cosine(b, a)) < 1e-12


@settings(max_examples=200, deadline=None, derandomize=True)
@given(text_st)
def test_tfidf_cosine_self_is_one_when_tokenizable(a):
    c = tfidf_cosine(a, a)
    # sklearn token_pattern \b\w\w+\b: strings without a 2+ char word token
    # vectorize to nothing → cosine defined as 0
    has_token = bool(tfidf_cosine(a + " aa", a + " aa"))
    if c != 0.0:
        assert abs(c - 1.0) < 1e-12
    elif has_token is False:
        assert c == 0.0


def test_tfidf_matches_reference_value():
    """Worked example pinned against sklearn's formula (smooth idf, l2):
    two docs sharing one token of two."""
    import math

    # a = "alpha beta", b = "alpha gamma"
    # shared token idf = ln(3/3)+1 = 1; unique token idf = ln(3/2)+1
    u = math.log(3.0 / 2.0) + 1.0
    expected = 1.0 / (math.sqrt(1 + u * u) * math.sqrt(1 + u * u))
    assert abs(tfidf_cosine("alpha beta", "alpha gamma") - expected) < 1e-12
