"""Corpus search primitives: inverted index construction (and the scoring
ops that consume it — see bm25 below when present).

The reference pipeline ships its chunks to a vector store for retrieval
(phase 3's Qdrant sink); the north rule replaces service writes with
deterministic DataFrame-native equivalents, and the classic lexical twin
of that capability is an inverted index + ranked keyword retrieval over
the extracted corpus.

Scale contract (the stopword problem): posting lists are power-law —
a handful of tokens appear in nearly every document, and an uncapped
``collect_list`` per token buffers an entire stopword's corpus in one
aggregation buffer. Same failure mode as the hot-shingle problem in
``dedup.ngram_jaccard_pairs``, same fix: count document frequencies FIRST
(pure partial-aggregation, no buffers), broadcast the tiny hot-token set,
and keep hot tokens OUT of the collect shuffle entirely — they stay in
the index as df/tf statistics with an empty posting list (search engines
treat stopwords the same way: too common to be selective, so not worth a
posting traversal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _tokens

SEP = "\x1f"

POSTINGS_CAP = 64


def inverted_index(docs: DataFrame, cap: int = POSTINGS_CAP) -> DataFrame:
    """Token → posting-list index: (token, df, total_tf, postings) where
    df counts distinct documents, total_tf total occurrences, and postings
    is the ascending ``\\x1f``-joined doc_id list — empty for hot tokens
    (df > cap), which contribute statistics but no traversable list.

    Three shuffles, all bounded: (token, doc_id) term counts (high-
    cardinality keys, partial agg), the df rollup (partial agg), and the
    posting collect whose buffers the broadcast hot-set filter caps at
    ``cap`` entries by construction.
    """
    td = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfc = td.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    hot = dfc.where(F.col("df") > cap).select("token")
    postings = (
        td.join(F.broadcast(hot), "token", "left_anti")
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                SEP,
            ).alias("postings")
        )
    )
    return dfc.join(postings, "token", "left").select(
        "token",
        "df",
        "total_tf",
        F.coalesce("postings", F.lit("")).alias("postings"),
    )


def bm25(docs: DataFrame, query: str, k: int = 10) -> DataFrame:
    """Ranked keyword retrieval: top-k documents by BM25 (k1=1.2, b=0.75)
    in integer e6 fixed point — (doc_id, score_e6), ordered by
    (score desc, doc_id asc).

    The arithmetic is specified so both engines compute IDENTICAL bigints:

        avg10      = (10 · Σdl) DIV n_docs          (avgdl in deci-tokens)
        idf_e6     = floor(1e6 · ln((2N + 2) / (2·df + 1)))
                     (the always-positive ATIRE/Lucene idf ln(1 + (N-df+.5)/(df+.5)))
        term score = (idf_e6 · tf · 22 · avg10)
                     DIV (10·avg10·tf + 3·avg10 + 90·dl)

    which is exactly idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    avgdl quantized to 0.1 tokens and a per-term floor. The only float is
    the driver-side ln over exact integer ratios — measured bit-identical
    across Python/Spark/DuckDB libm on 100k integer inputs, and the e6
    floor gives ~1e-10 relative slack before a boundary could flip.
    Overflow budget: idf_e6·tf·22·avg10 stays under int64 through
    tf ~ 1e4, avgdl ~ 1e4.

    Scale: TWO corpus scans and zero shuffles — pass 1 is a partial-agg
    rollup collecting (N, Σdl, df per term) scalars to the driver, pass 2
    scores each doc against literal constants and takes a global top-k
    (TakeOrderedAndProject, no sort shuffle). Query terms are tokenized
    with the corpus tokenizer (lowercase whitespace split, deduped).
    """
    import math

    from ..functions.exprs import bind

    terms = sorted(set((query or "").lower().split()))
    if not terms:
        return docs.select("doc_id", F.lit(0).cast("long").alias("score_e6")).limit(0)

    def _eq(w):
        # NOT `lambda x, w=w: ...` — a 2-arg lambda makes F.filter pass the
        # element INDEX as the second argument, silently shadowing w
        return lambda x: x == F.lit(w)

    def per_doc(t):
        return F.struct(
            F.size(t).cast("long").alias("dl"),
            *[
                F.size(F.filter(t, _eq(w))).cast("long").alias(f"tf{i}")
                for i, w in enumerate(terms)
            ],
        )

    feat = docs.select(
        "doc_id", bind(_tokens(F.col("text")), per_doc).alias("f")
    ).select("doc_id", "f.*")

    stats = feat.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("tt"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).first()
    nd, tt = int(stats["nd"] or 0), int(stats["tt"] or 0)
    if nd == 0 or tt == 0:
        return docs.select("doc_id", F.lit(0).cast("long").alias("score_e6")).limit(0)
    avg10 = (10 * tt) // nd
    idfs = [
        math.floor(1_000_000 * math.log((2 * nd + 2) / (2 * int(stats[f"df{i}"]) + 1)))
        for i in range(len(terms))
    ]

    term_scores = [
        F.when(
            F.col(f"tf{i}") > 0,
            F.expr(
                f"(cast({idfs[i]} as bigint) * tf{i} * 22 * {avg10}) DIV "
                f"(10 * {avg10} * tf{i} + 3 * {avg10} + 90 * dl)"
            ),
        ).otherwise(F.lit(0))
        for i in range(len(terms))
    ]
    total = term_scores[0]
    for ts in term_scores[1:]:
        total = total + ts
    # the >0 filter sits ABOVE the limit: equivalent (zero-score docs sort
    # below every positive one) and Catalyst can't push a predicate through
    # Limit — a pre-limit where() gets substituted under the projection and
    # re-inlines the whole tokenize expression ~3× per term in the filter
    return (
        feat.select("doc_id", total.cast("long").alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
        .limit(k)
        .where(F.col("score_e6") > 0)
    )


def phrase_search(docs: DataFrame, phrase: str, k: int = 20) -> DataFrame:
    """Exact consecutive-phrase retrieval: documents whose token stream
    contains the phrase's tokens adjacently, with the occurrence count —
    (doc_id, n_hits), ordered by (n_hits desc, doc_id asc), top k.

    Pure intra-row positional matching: for each candidate start position
    i the m phrase tokens are compared in place, so the whole operator is
    scan → project → TakeOrderedAndProject — ZERO shuffles at any corpus
    size, and the phrase never needs a positional index shipped around.

    Guarded for the F.sequence trap: sequence(1, n) with n < 1 yields a
    DESCENDING range, so documents shorter than the phrase take the
    empty-array branch explicitly.
    """
    from ..functions.exprs import bind

    words = (phrase or "").lower().split()
    if not words:
        return docs.select(
            "doc_id", F.lit(0).cast("long").alias("n_hits")
        ).limit(0)
    m = len(words)

    def hits(t):
        starts = F.sequence(F.lit(1), F.size(t) - (m - 1))
        match_at = lambda i: F.forall(  # noqa: E731
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(t, (i + j).cast("int"))
            == F.element_at(F.array(*[F.lit(w) for w in words]), (j + 1).cast("int")),
        )
        return (
            F.when(
                F.size(t) >= m,
                F.size(F.filter(starts, match_at)),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    return (
        docs.select("doc_id", bind(_tokens(F.col("text")), hits).alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), F.col("doc_id").asc())
        .limit(k)
        .where(F.col("n_hits") > 0)
    )


SNIPPET_WINDOW = 16
SNIPPET_CAND_CAP = 1024


def snippets(docs: DataFrame, query: str, k: int = 10, window: int = SNIPPET_WINDOW) -> DataFrame:
    """KWIC snippet extraction: for the top-k matching documents, the
    ``window``-token span covering the densest cluster of query-term
    occurrences — (doc_id, n_matches, window_hits, snippet), ranked by
    (window_hits desc, n_matches desc, doc_id asc).

    Window selection is exact and deterministic: every match position is
    a candidate window start; the winner maximizes matches inside
    [s, s+window) with ties to the earliest position — computed as the
    struct-ordered min of (−count, s), which both engines order
    identically (lexicographic struct comparison).

    Intra-row throughout (positions → candidate fold → slice), so the
    operator is scan → project → TakeOrderedAndProject: zero shuffles.
    Candidate scoring is O(|candidates|·|matches|) per doc; candidate
    STARTS are capped at the first ``SNIPPET_CAND_CAP`` match positions
    (windows still count every match inside them), so a stopword-dense
    document costs O(cap·m), linear in m, instead of O(m²) — for a doc
    with more matches than the cap, a best window starting beyond the
    cap-th match is not considered (documented approximation; the oracle
    applies the same cap).
    """
    from ..functions.exprs import bind

    terms = sorted(set((query or "").lower().split()))
    if not terms:
        return docs.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_matches"),
            F.lit(0).cast("long").alias("window_hits"),
            F.lit("").alias("snippet"),
        ).limit(0)
    terms_arr = F.array(*[F.lit(w) for w in terms])

    def feat(t):
        pos = F.when(
            F.size(t) >= 1,
            F.filter(
                F.sequence(F.lit(1).cast("long"), F.size(t).cast("long")),
                lambda i: F.array_contains(terms_arr, F.element_at(t, i.cast("int"))),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

        def pick(p):
            best = F.array_min(
                F.transform(
                    F.slice(p, 1, SNIPPET_CAND_CAP),
                    lambda s: F.struct(
                        (-F.size(F.filter(p, lambda x: (x >= s) & (x < s + window))))
                        .cast("long")
                        .alias("negcnt"),
                        s.cast("long").alias("pos"),
                    ),
                )
            )
            return F.struct(
                F.size(p).cast("long").alias("n_matches"),
                F.coalesce(-best["negcnt"], F.lit(0)).cast("long").alias("window_hits"),
                F.coalesce(
                    F.array_join(
                        F.slice(t, best["pos"].cast("int"), window), " "
                    ),
                    F.lit(""),
                ).alias("snippet"),
            )

        return bind(pos, pick)

    return (
        docs.select("doc_id", bind(_tokens(F.col("text")), feat).alias("f"))
        .select("doc_id", "f.*")
        .orderBy(
            F.col("window_hits").desc(), F.col("n_matches").desc(), F.col("doc_id").asc()
        )
        .limit(k)
        .where(F.col("n_matches") > 0)
    )


def inverted_index_delta(
    index: DataFrame, new_docs: DataFrame, cap: int = POSTINGS_CAP
) -> DataFrame:
    """Incremental index maintenance: fold a new document batch into an
    existing index relation WITHOUT rescanning the indexed corpus — the
    daily-ingest shape (same contract as dedup_incremental). Only tokens
    touched by the batch shuffle; the standing index joins by token key.

    Merge semantics per token: df/total_tf add; postings concatenate in
    ascending-doc_id order (batch ids are assumed > indexed ids, the
    append-only corpus contract) and DROP to '' the moment the merged df
    crosses ``cap`` — a token can become hot through growth, and an index
    that keeps appending to hot posting strings would grow one unbounded
    cell per stopword. Emits the full updated index.
    """
    batch = inverted_index(new_docs, cap=cap)
    old = index.select(
        "token",
        F.col("df").alias("df_old"),
        F.col("total_tf").alias("tf_old"),
        F.col("postings").alias("p_old"),
    )
    new = batch.select(
        "token",
        F.col("df").alias("df_new"),
        F.col("total_tf").alias("tf_new"),
        F.col("postings").alias("p_new"),
    )
    z = F.lit(0).cast("long")
    j = old.join(new, "token", "full_outer")
    df_m = F.coalesce("df_old", z) + F.coalesce("df_new", z)
    # nullif turns absent-or-hot ('') sides into NULL so concat_ws skips
    # them; a side that was hot already forces df_m > cap anyway
    merged_p = F.concat_ws(
        SEP,
        *[
            F.nullif(F.coalesce(c, F.lit("")), F.lit(""))
            for c in (F.col("p_old"), F.col("p_new"))
        ],
    )
    return j.select(
        "token",
        df_m.alias("df"),
        (F.coalesce("tf_old", z) + F.coalesce("tf_new", z)).alias("total_tf"),
        F.when(df_m > cap, F.lit("")).otherwise(merged_p).alias("postings"),
    )
