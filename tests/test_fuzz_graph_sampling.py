"""Property-based gates for kcore and weighted_sample — checked on random
small inputs against an INDEPENDENT reference (pure-Python peeling for
kcore; the DuckDB window replay for weighted_sample), derandomized for CI
stability like the other fuzz suites. The gate corpus' domain graph never
actually peels, so this is where the peel path earns its keep on
adversarial shapes (stars, paths, reciprocal edges, multi-round cascades).
"""

from collections import defaultdict

import duckdb
from hypothesis import given, settings, strategies as st

from graphical_context_extraction_pipeline_spark.operators import linkgraph as LG
from graphical_context_extraction_pipeline_spark.operators import sampling as SA

_node = st.sampled_from([f"n{i}" for i in range(8)])
_edges = st.lists(st.tuples(_node, _node), min_size=1, max_size=16)


def _py_kcore(pairs, k):
    """Reference peeling: adjacency sets, remove-any-under-degree until
    stable (order-independent fixpoint)."""
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_edges, st.sampled_from([1, 2, 3]))
def test_kcore_matches_python_peel_fuzz(spark, pairs, k):
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_domain string, dst_domain string, n_links bigint",
    )
    got = {r.domain: r.core_degree for r in LG.kcore(df, k=k).collect()}
    assert got == _py_kcore(pairs, k), (pairs, k)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(_edges)
def test_kcore_oracle_template_fuzz(spark, pairs):
    """The registered DuckDB recursive replay (template with the edge
    source swapped for VALUES) agrees with Spark on random graphs at k=2 —
    including graphs that peel multiple rounds or annihilate entirely."""
    import __spark_entry__ as entrymod

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    sql = entrymod.oracle_sql()["kcore"]
    tail = sql[sql.index("ed AS (SELECT DISTINCT"):]
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    duck_sql = f"WITH RECURSIVE edges(src_domain, dst_domain) AS (VALUES {vals}),\n{tail}"
    d_rows = {tuple(r) for r in duckdb.sql(duck_sql).fetchall()}
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_domain string, dst_domain string, n_links bigint",
    )
    s_rows = {(r.domain, r.core_degree) for r in LG.kcore(df, k=2).collect()}
    assert s_rows == d_rows, (pairs, sorted(s_rows), sorted(d_rows))


_weights = st.lists(st.integers(min_value=-3, max_value=50), min_size=1, max_size=12)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_weights, st.sampled_from([1, 2, 5, 9]))
def test_weighted_sample_matches_window_replay_fuzz(spark, ws, k):
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(ws)], "doc_id bigint, n_chars bigint"
    )
    got = sorted(tuple(r) for r in SA.weighted_sample(docs, k=k).collect())
    pos = [(i, w) for i, w in enumerate(ws) if w > 0]
    if not pos:
        assert got == []
        return
    vals = ", ".join(f"({i}, {w})" for i, w in pos)
    ref = duckdb.sql(f"""
WITH base(doc_id, weight) AS (VALUES {vals}),
c AS (SELECT doc_id, weight,
             sum(weight) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM base),
t AS (SELECT sum(weight) AS W FROM base),
m AS (SELECT doc_id, weight,
             (2*{k}*cum + W - 1) // (2*W)
             - (2*{k}*(cum - weight) + W - 1) // (2*W) AS n_picks
      FROM c, t)
SELECT doc_id, weight, n_picks FROM m WHERE n_picks >= 1
""").fetchall()
    assert got == sorted(tuple(map(int, r)) for r in ref), (ws, k, got)
    assert sum(r[2] for r in got) == k  # exactly-k invariant


_texts = st.lists(
    st.lists(st.sampled_from([f"w{i}" for i in range(10)]), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _brute_containment(texts, min_bp=8000):
    """Reference: exact per-pair shingle containment with NO blocking (the
    cap never binds at ≤6 docs) — what containment_pairs must equal when
    every shingle is cold."""
    def sh(t):
        toks = [x for x in t.lower().split() if x]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                n = len(sets[a] & sets[b])
                ca = n * 10000 // len(sets[a])
                cb = n * 10000 // len(sets[b])
                if n and max(ca, cb) >= min_bp:
                    out.add((a, b, n, len(sets[a]), len(sets[b]), ca, cb))
    return out


@settings(max_examples=10, deadline=None, derandomize=True)
@given(_texts)
def test_containment_matches_bruteforce_fuzz(spark, texts):
    from graphical_context_extraction_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.n_shared, r.na, r.nb, r.contain_a_bp, r.contain_b_bp)
        for r in dedup.containment_pairs(docs).collect()
    }
    assert got == _brute_containment(texts), texts
