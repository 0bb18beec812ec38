"""Differential fuzz for the search family: a pure-Python replica of each
operator's exact integer spec, checked against the Spark plans on
randomized tiny corpora (derandomized for CI stability, same convention as
the other fuzz suites). Example counts stay low — every example runs Spark
jobs."""

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from graphical_context_extraction_pipeline_spark.operators import search as SE

_tok = st.sampled_from(["cat", "dog", "fish", "a", "b", "xyz"])
_text = st.lists(_tok, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=7)
_query = st.lists(_tok, min_size=1, max_size=3).map(" ".join)


def _py_bm25(texts, query, k=10):
    terms = sorted(set(query.lower().split()))
    toks = [t.lower().split() for t in texts]
    nd, tt = len(toks), sum(len(x) for x in toks)
    if nd == 0 or tt == 0:
        return []
    avg10 = (10 * tt) // nd
    dfs = {w: sum(1 for x in toks if w in x) for w in terms}
    idfs = {
        w: math.floor(1_000_000 * math.log((2 * nd + 2) / (2 * dfs[w] + 1)))
        for w in terms
    }
    out = []
    for i, x in enumerate(toks):
        dl, score = len(x), 0
        for w in terms:
            tf = x.count(w)
            if tf:
                score += (idfs[w] * tf * 22 * avg10) // (
                    10 * avg10 * tf + 3 * avg10 + 90 * dl
                )
        out.append((i, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [r for r in out[:k] if r[1] > 0]


def _py_phrase(texts, phrase, k=20):
    words = phrase.lower().split()
    m = len(words)
    out = []
    for i, t in enumerate(texts):
        x = t.lower().split()
        hits = sum(1 for s in range(len(x) - m + 1) if x[s : s + m] == words)
        out.append((i, hits))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [r for r in out[:k] if r[1] > 0]


def _py_snippets(texts, query, k=10, window=4, cap=SE.SNIPPET_CAND_CAP):
    terms = set(query.lower().split())
    out = []
    for i, t in enumerate(texts):
        x = t.lower().split()
        pos = [j + 1 for j, w in enumerate(x) if w in terms]
        if not pos:
            continue
        best = min(
            (-sum(1 for q in pos if s <= q < s + window), s) for s in pos[:cap]
        )
        out.append(
            (i, len(pos), -best[0], " ".join(x[best[1] - 1 : best[1] - 1 + window]))
        )
    out.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return out[:k]


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_corpus, _query)
def test_bm25_matches_python_spec(spark, texts, query):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.doc_id, r.score_e6) for r in SE.bm25(docs, query).collect()]
    assert got == _py_bm25(texts, query), (texts, query)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_corpus, st.lists(_tok, min_size=1, max_size=2).map(" ".join))
def test_phrase_matches_python_spec(spark, texts, phrase):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.doc_id, r.n_hits) for r in SE.phrase_search(docs, phrase).collect()]
    assert got == _py_phrase(texts, phrase), (texts, phrase)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_corpus, _query)
def test_snippets_match_python_spec(spark, texts, query):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.n_matches, r.window_hits, r.snippet)
        for r in SE.snippets(docs, query, window=4).collect()
    ]
    assert got == _py_snippets(texts, query), (texts, query)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(_corpus, st.sampled_from([1, 3, 64]))
def test_inverted_index_matches_counter(spark, texts, cap):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df_exact = Counter()
    tf_exact = Counter()
    postings = {}
    for i, t in enumerate(texts):
        x = t.lower().split()
        for w in set(x):
            df_exact[w] += 1
            postings.setdefault(w, []).append(i)
        tf_exact.update(x)
    got = {r.token: (r.df, r.total_tf, r.postings) for r in SE.inverted_index(docs, cap=cap).collect()}
    want = {
        w: (
            df_exact[w],
            tf_exact[w],
            "" if df_exact[w] > cap else "\x1f".join(str(d) for d in sorted(postings[w])),
        )
        for w in df_exact
    }
    assert got == want, (texts, cap)


@given(_corpus, st.lists(_query, min_size=1, max_size=3), st.integers(2, 6))
@settings(max_examples=6, deadline=None, derandomize=True)
def test_serve_batch_matches_per_query_serving(spark, texts, queries, cap):
    """bm25_serve_batch ≡ bm25_from_index per query on randomized tiny
    corpora and caps (hot-term regimes drift with cap) — the merge law
    swept, not just the hand-built case."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx, norms = SE.inverted_index(docs, cap=cap), SE.doc_norms(docs)
    qdf = spark.createDataFrame(
        list(enumerate(queries)), "query_id long, query string"
    )
    got = {}
    for r in SE.bm25_serve_batch(idx, norms, qdf, k=10).collect():
        got.setdefault(r.query_id, {})[r.doc_id] = r.score_e6
    for qid, qtext in enumerate(queries):
        want = {
            r.doc_id: r.score_e6
            for r in SE.bm25_from_index(idx, norms, qtext, k=10).collect()
        }
        assert got.get(qid, {}) == want, (qid, qtext, cap)


def test_fuzz_phrase_from_index_vs_replica(spark):
    """Random corpora + random phrases: the index-served phrase counts
    equal a naive python scan (overlapping occurrences included)."""
    import random

    from graphical_context_extraction_pipeline_spark.operators import search as SE

    for seed in (3, 11):
        rng = random.Random(seed)
        vocab = [f"w{j}" for j in range(rng.randint(2, 8))]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for i in range(25)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = SE.positional_index(docs, cap=1024)
        for _ in range(4):
            m = rng.randint(1, 3)
            phrase = " ".join(rng.choice(vocab) for _ in range(m))
            words = phrase.split()

            def hits(text):
                toks = text.split()
                return sum(
                    1
                    for i in range(len(toks) - m + 1)
                    if toks[i : i + m] == words
                )

            want = sorted(
                ((i, hits(t)) for i, t in rows if hits(t) > 0),
                key=lambda x: (-x[1], x[0]),
            )[:20]
            got = {(r["doc_id"], r["n_hits"])
                   for r in SE.phrase_from_index(idx, phrase, k=20).collect()}
            assert got == set(want), (seed, phrase)
