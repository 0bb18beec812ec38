"""Text-analysis operators for large-scale training-data pipelines, over the
flat `documents` table (doc_id, text, lang, source, n_chars).

All implementations are pure Spark SQL expressions (JVM-side, whole-stage
codegen — no Python in the hot path). Compared outputs are integers/strings
only: ratios are emitted as basis points via floor() so the DuckDB oracle
hash-matches bit-for-bit (float formatting never enters the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# occurrence-based stopword profiles for the language-ID heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "los", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
}
LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break priority


def _tokens(col):
    # Python str.split semantics: split on whitespace runs, drop empties
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-token estimate
    (alnum runs + each non-alnum-non-space char counts as one piece —
    formulated without regex lookarounds so the RE2-based oracle matches)."""
    toks = _tokens(F.col("text"))
    alnum_runs = F.size(F.filter(F.split(F.col("text"), r"[^A-Za-z0-9]+"), lambda t: t != ""))
    punct_chars = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", ""))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (alnum_runs + punct_chars).cast("long").alias("n_pieces"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-occurrence heuristic language ID: argmax over profiles with
    fixed priority (en > es > fr > de) on ties — a first-match CASE chain so
    the SQL oracle is a literal transliteration."""
    toks = _tokens(F.col("text"))
    # membership as chained == (isin/array_contains don't accept HOF lambda
    # vars; and the lambda must be unary — a second default arg would make
    # Spark pass the array index into it)
    def _member_fn(sw):
        def member(t):
            cond = t == F.lit(sw[0])
            for w in sw[1:]:
                cond = cond | (t == F.lit(w))
            return cond

        return member

    h = {
        lang: F.size(F.filter(toks, _member_fn(sw))).cast("long")
        for lang, sw in LANG_STOPWORDS.items()
    }
    he, hs, hf, hd = h["en"], h["es"], h["fr"], h["de"]
    guess = (
        F.when(he + hs + hf + hd == 0, F.lit("unknown"))
        .when((he >= hs) & (he >= hf) & (he >= hd), F.lit("en"))
        .when((hs >= hf) & (hs >= hd), F.lit("es"))
        .when(hf >= hd, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return docs.select(
        "doc_id",
        he.alias("hits_en"),
        hs.alias("hits_es"),
        hf.alias("hits_fr"),
        hd.alias("hits_de"),
        guess.alias("lang_guess"),
    )


def passes_quality_expr(text_col="text"):
    """The quality-gate boolean as a standalone Column over ``text`` —
    shared by quality_score and the curation pipeline so the gate can be
    applied inline (no self-join of the corpus against its own scores)."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"\p{Punct}", ""))
    punct_bp = F.floor(n_punct * 10000.0 / F.greatest(n_chars, F.lit(1)))
    en = LANG_STOPWORDS["en"]

    def _member(t):
        cond = t == F.lit(en[0])
        for w in en[1:]:
            cond = cond | (t == F.lit(w))
        return cond

    n_stop = F.size(F.filter(toks, _member))
    stop_bp = F.floor(n_stop * 10000.0 / F.greatest(n_tokens, F.lit(1)))
    return (n_chars >= 64) & (n_tokens >= 12) & (punct_bp < 1500) & (stop_bp > 0)


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality signals: length, punctuation ratio, stopword ratio, mean token
    length — integerized (basis points) for oracle stability."""
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"\p{Punct}", ""))
    en = LANG_STOPWORDS["en"]

    def _member(t):
        cond = t == F.lit(en[0])
        for w in en[1:]:
            cond = cond | (t == F.lit(w))
        return cond

    n_stop = F.size(F.filter(toks, _member))
    punct_bp = F.floor(n_punct * 10000.0 / F.greatest(n_chars, F.lit(1))).cast("long")
    stop_bp = F.floor(n_stop * 10000.0 / F.greatest(n_tokens, F.lit(1))).cast("long")
    # mean token length = non-whitespace chars / tokens (no HOF fold needed)
    non_ws = F.length(F.regexp_replace("text", r"\s", ""))
    mean_tok_len_e2 = F.floor(non_ws * 100.0 / F.greatest(n_tokens, F.lit(1))).cast("long")
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        punct_bp.alias("punct_bp"),
        stop_bp.alias("stopword_bp"),
        mean_tok_len_e2.alias("mean_token_len_e2"),
        passes_quality_expr().alias("passes_quality"),
    )


FP_P = 2147483647  # rolling-hash modulus (2^31 − 1)
FP_C = 1000003  # rolling-hash multiplier


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: full-text md5, prefix fingerprint over the
    first 16 whitespace tokens (cheap near-head dedup key), and a
    token-level ROLLING hash — h ← (h·C + md5₃₂(tok)) mod P folded over the
    whole token stream (order-sensitive, unlike a bag-of-tokens hash; the
    DuckDB oracle replays the same fold)."""
    toks = _tokens(F.col("text"))
    rolling = F.aggregate(
        F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(FP_C) + h, F.lit(FP_P)),
    )
    return docs.select(
        "doc_id",
        F.md5(F.lower("text")).alias("md5_full"),
        F.md5(F.array_join(F.slice(toks, 1, 16), " ")).alias("md5_head16"),
        rolling.alias("rolling_fp"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1): duplicate-line fraction,
    duplicate-line CHARACTER fraction, and top word-2-gram fraction — the
    standard repetition filters a training-data pipeline runs before dedup.

    Definitions (mirrored exactly by the DuckDB oracle):
      - lines = text split on '\\n', dropping lines that are empty after
        trim (the kept line itself stays untrimmed; char counts use its
        raw length);
      - dup_line_frac = (n_lines - n_distinct_lines) / n_lines — every
        occurrence beyond a line's first counts as a duplicate;
      - dup_line_char_frac = sum((cnt-1)*len(line)) / sum(cnt*len(line));
      - top2gram_frac = count of the modal word-2-gram / total 2-grams
        (tokens lowercased, whitespace-split — same _tokens as token_stats).
    Ratios are emitted as floor()ed basis points (bigint) for hash-stable
    comparison; docs with no lines / fewer than two tokens emit 0.

    Scale: everything is INTRA-ROW — both duplicate-line counting and the
    modal 2-gram reduce to sorted-run detection over per-doc arrays
    (array_sort + an aggregate() fold over adjacent-equal runs, the same
    shape that took chrome_tokens from a groupBy to zero shuffle). One
    corpus scan, zero exchanges, whole-stage codegen end to end; per-row
    memory is O(doc length), the same bound the text column already
    imposes. A naive explode → groupBy(doc_id, line/gram) formulation
    costs 3 scans + 4 shuffles for identical output.
    """
    lines = F.filter(F.split(F.col("text"), "\n"), lambda l: F.trim(l) != "")
    base = docs.select(
        "doc_id",
        F.array_sort(lines).alias("sl"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_distinct_lines"),
        _tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "n_lines",
        "n_distinct_lines",
        # every element equal to its sorted predecessor is one surplus copy
        F.when(
            F.col("n_lines") >= 2,
            F.expr(
                "aggregate(sequence(2, size(sl)), 0L, (acc, i) ->"
                " acc + IF(element_at(sl, i) = element_at(sl, i-1),"
                " cast(length(element_at(sl, i)) AS long), 0L))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_chars"),
        F.expr("aggregate(sl, 0L, (acc, l) -> acc + length(l))")
        .cast("long")
        .alias("line_chars"),
        F.expr(
            "sort_array(CASE WHEN size(toks) >= 2 THEN"
            " transform(sequence(1, size(toks)-1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"
            " ELSE array() END)"
        ).alias("sg"),
    )

    # longest adjacent-equal run in the sorted 2-gram array = modal count
    top_run = (
        F.when(
            F.size("sg") >= 2,
            F.expr(
                "aggregate(sequence(2, size(sg)),"
                " named_struct('best', 1L, 'cur', 1L),"
                " (s, i) -> IF(element_at(sg, i) = element_at(sg, i-1),"
                " named_struct('best', greatest(s.best, s.cur + 1L), 'cur', s.cur + 1L),"
                " named_struct('best', s.best, 'cur', 1L)),"
                " s -> s.best)"
            ),
        )
        .otherwise(F.size("sg").cast("long"))
        .cast("long")
    )

    def _bp(num, den):
        return F.floor(num * 10000.0 / F.greatest(den, F.lit(1))).cast("long")

    return base.select(
        "doc_id",
        "n_lines",
        "n_distinct_lines",
        _bp(F.col("n_lines") - F.col("n_distinct_lines"), F.col("n_lines")).alias(
            "dup_line_frac_bp"
        ),
        _bp(F.col("dup_chars"), F.col("line_chars")).alias("dup_line_char_frac_bp"),
        top_run.alias("top2gram_cnt"),
        _bp(top_run, F.size("sg").cast("long")).alias("top2gram_frac_bp"),
    )


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Global token-frequency top-k (corpus vocabulary head): explode the
    lowercased whitespace tokens, count per token, keep the k most frequent
    with deterministic total order (count desc, token asc).

    Scale: partial aggregation combines per-partition before the single
    count shuffle; the top-k itself is TakeOrderedAndProject (per-partition
    heaps merged on the driver — never a full global sort). The rank
    window runs on k rows only.
    """
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.select("token", "cnt", F.row_number().over(w).cast("long").alias("rank"))


# PII patterns written in the portable subset shared by Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repetition, \b — no
# lookarounds, no backreferences, so both engines match identical spans.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + redaction: count and mask emails, phone numbers, and
    IPv4 literals, emitting per-doc counts and the scrubbed text — the
    privacy pass a training-data pipeline runs before packaging.

    Replacement order is part of the spec (emails first — their domains
    would otherwise be visible to the looser patterns; then phones; then
    IPs over the email-free text). Patterns use the Java-regex ∩ RE2
    portable subset so the DuckDB oracle reproduces every span; masks are
    literal tokens (<EMAIL>/<PHONE>/<IP>) with no regex metacharacters.

    Scale: one narrow projection — regexp_count/replace are JVM codegen'd,
    zero shuffle, and the scan only reads (doc_id, text)."""
    after_email = F.regexp_replace("text", PII_EMAIL, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, F.lit(PII_PHONE), F.lit("<PHONE>"))
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(after_phone, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_replace(after_phone, F.lit(PII_IPV4), F.lit("<IP>")).alias("clean_text"),
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus profile: doc count, total token mass, and EXACT
    discrete token-count percentiles (p50/p90/p99 = the value at sorted
    index floor(q·(n−1)), percentile_disc semantics with (n_tokens, doc_id)
    total order so ties break deterministically).

    Scale: one shuffle on `source` feeding both the window rank and the
    grouped rollup; the within-source sort is Spark's external
    (spill-capable) sort, so a dominant source degrades to disk, not OOM.
    At 100 TB the cheap alternative is approx_percentile (t-digest sketch,
    map-side mergeable, no sort) — this operator keeps the exact form
    because sketches are not bit-reproducible across engines; swap in
    approx_percentile when profiling, not gating.
    """
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id", "source", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ws = Window.partitionBy("source")
    r = tok.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("cnt"),
    )

    def _pick(q_bp: int):
        # integer arithmetic only: floor(q·(n−1)) as (q_bp·(n−1)) div 10000
        # — double 0.99·(n−1) floors one low when the product is an exact
        # integer, and the DuckDB oracle's DECIMAL literal would not
        idx = F.expr(f"({q_bp} * (cnt - 1)) div 10000") + 1
        return F.max(F.when(F.col("rn") == idx, F.col("n_tokens"))).cast("long")

    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        _pick(5000).alias("p50_tokens"),
        _pick(9000).alias("p90_tokens"),
        _pick(9900).alias("p99_tokens"),
    )


def top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document salient-term extraction (TF-IDF top-k) — the keyword
    tagging pass training pipelines use for topic metadata and mixture
    construction.

    Scoring is integer-exact so the DuckDB oracle replays it: for term t in
    doc d, ``score_e6 = tf(t,d) · (N·10⁶ DIV df(t))`` — the idf factor is
    the rational N/df in e6 fixed point rather than its logarithm (rank-
    monotone in df for fixed tf, zero float arithmetic). Top-k per doc by
    (score_e6 DESC, term ASC), rank 1-based.

    Plan: one shuffle builds the document-frequency relation (distinct
    term per doc → count), one shuffle re-groups (doc, term, tf) rows with
    their df to take the per-doc top-k via a bounded collect + intra-row
    sort (the per-doc buffer is capped by the doc's distinct-term count —
    doc-length bounded, no global sort, no window over the full corpus).

    Output: (doc_id, term, tf, df, score_e6, rank).
    """
    from ..functions.exprs import bind, segments

    toks = _tokens(F.col("text"))
    # (doc_id, term, tf) without a groupBy: equal-run segments of the
    # per-doc sorted token array (O(n) — NOT an append-fold, which copies
    # its accumulator every step)
    def runs(arr):
        def is_start(a, i):
            return F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(a, i) != F.element_at(a, i - 1)
            )

        return F.transform(
            segments(arr, is_start),
            lambda seg: F.struct(
                F.element_at(arr, seg["a"]).alias("term"),
                (seg["b"] - seg["a"]).cast("long").alias("tf"),
            ),
        )

    counted = bind(
        F.array_sort(toks),
        lambda arr: F.when(F.size(arr) > 0, runs(arr)).otherwise(
            F.array().cast("array<struct<term:string,tf:bigint>>")
        ),
    )
    pairs = docs.select("doc_id", F.explode(counted).alias("p")).select(
        "doc_id", "p.term", "p.tf"
    )
    n_docs = docs.where(F.col("text").isNotNull()).count()
    df_rel = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = pairs.join(df_rel, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        # the N·10⁶ product is computed in PYTHON so it lands in the SQL as
        # one bigint literal — "{N} * 1000000" folds in int32 under ANSI
        # and overflows past ~2100 documents (caught by the sf0.1 registry
        # sweep; the sf0.01 gate scale never trips it)
        F.expr(f"tf * ({n_docs * 1_000_000} DIV df)").alias("score_e6"),
    )
    topk = (
        scored.groupBy("doc_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score_e6")).alias("neg_score"),
                            F.col("term").alias("term"),
                            F.col("tf").alias("tf"),
                            F.col("df").alias("df"),
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("doc_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.tf").alias("tf"),
            F.col("t.df").alias("df"),
            (-F.col("t.neg_score")).cast("long").alias("score_e6"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
    )
    return topk


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """CCNet-style LM quality signal with integer-only arithmetic: per doc
    the mean unigram surprisal against the corpus's own unigram model —
    (doc_id, n_tokens, surprisal_e2). surprisal(tok) = bit_length(N) −
    bit_length(count(tok)), an integer log2 of N/count via length(bin(·))
    (identical in DuckDB; never a float log in either engine), and
    surprisal_e2 = (100 · Σ surprisal) DIV n_tokens. Coarse (1-bit
    granularity) but monotone in token rarity — exactly what the
    perplexity-bucket filter needs: low scores ≈ common-vocabulary text,
    high scores ≈ rare-token/noise-heavy text. Empty docs emit the −1
    sentinel (never NULL: NaN ≠ NaN under pandas hash comparison).

    Scale: the unigram model is one partial-aggregated token groupBy; the
    scoring join is token-hash co-partitioned (AQE broadcasts the model
    when the vocabulary is small) and the per-doc rollup rides partial
    aggregation. Text never enters a shuffle — only (doc_id, token) pairs
    and the (token, count) model."""
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    model = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    n_total = model.agg(F.sum("cnt").cast("long").alias("n_corpus"))
    scored = (
        toks.join(model, "tok")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            (F.length(F.bin(F.col("n_corpus"))) - F.length(F.bin(F.col("cnt"))))
            .cast("long")
            .alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.expr("(100 * sum(s)) DIV count(1)").cast("long").alias("surprisal_e2"),
        )
    )
    return (
        docs.select("doc_id").join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("surprisal_e2", F.lit(-1)).cast("long").alias("surprisal_e2"),
        )
    )


PMI_DOC_CAP = 64


def collocation_lift(
    docs: DataFrame, min_pair: int = 2, doc_cap: int = PMI_DOC_CAP
) -> DataFrame:
    """Document-level collocation mining: for token pairs co-occurring in
    ≥ ``min_pair`` documents, the PMI-style lift
    P(x,y)/(P(x)·P(y)) = n_pair·N/(n_a·n_b) in e4 fixed point —
    (tok_a, tok_b, n_pair, n_a, n_b, lift_e4), tok_a < tok_b.

    Integer discipline: lift_e4 = ((n_pair·10000) DIV n_a · N) DIV n_b —
    the TWO-STEP floor is the spec (replayed identically by the oracle)
    and keeps every intermediate ≤ 1e4·N, inside int64 through 10^12
    documents, where the single-expression n_pair·N·10000 would overflow.

    Scale: each document contributes pairs from its first ``doc_cap``
    distinct tokens (sorted — deterministic), bounding the pair fan-out
    at C(cap,2) per doc regardless of document length; pair counts and
    token document-frequencies are partial-agg rollups; the two
    frequency joins key on tokens of pairs that already passed
    ``min_pair``.
    """
    toks = F.slice(
        F.array_sort(F.array_distinct(_tokens(F.col("text")))), 1, doc_cap
    )

    def pairs(t):
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size(t)),
                    lambda j: F.struct(
                        F.element_at(t, i.cast("int")).alias("tok_a"),
                        F.element_at(t, j.cast("int")).alias("tok_b"),
                    ),
                ),
            )
        )

    from ..functions.exprs import bind

    n_docs = docs.count()
    if n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [], "tok_a string, tok_b string, n_pair long, n_a long, n_b long, lift_e4 long"
        )
    base = docs.select(
        bind(toks, lambda t: F.when(F.size(t) >= 2, pairs(t))).alias("ps"),
        bind(toks, lambda t: t).alias("ts"),
    )
    pair_counts = (
        base.where(F.col("ps").isNotNull())
        .select(F.explode("ps").alias("p"))
        .groupBy("p.tok_a", "p.tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair)
    )
    dfreq = (
        base.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    )
    j = (
        pair_counts.join(dfreq.withColumnRenamed("tok", "tok_a"), "tok_a")
        .withColumnRenamed("n_tok", "n_a")
        .join(dfreq.withColumnRenamed("tok", "tok_b"), "tok_b")
        .withColumnRenamed("n_tok", "n_b")
    )
    return j.select(
        "tok_a",
        "tok_b",
        "n_pair",
        "n_a",
        "n_b",
        F.expr(f"(((n_pair * 10000) DIV n_a) * {n_docs}) DIV n_b")
        .cast("long")
        .alias("lift_e4"),
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Conditional (bigram) LM quality signal — the 2-gram step of the
    CCNet perplexity-bucket ladder, one order above
    :func:`unigram_surprisal`, still integer-only: per doc the mean of
    surprisal(w1→w2) = bit_length(C1(w1)) − bit_length(C2(w1, w2)),
    where C2 counts the corpus bigram and C1 counts w1 as a bigram
    PREFIX (Σ_w C2(w1, w)), i.e. an integer log2 of 1/p(w2|w1).
    (doc_id, n_bigrams, surprisal_e2) with surprisal_e2 =
    (100·Σs) DIV n_bigrams; docs with < 2 tokens emit −1 (never NULL —
    the pandas NaN-hash trap). Shuffled text at the same vocabulary
    scores HIGHER than natural order — exactly the word-salad signal a
    unigram model can't see (pinned by test).

    Scale: bigrams form intra-row (one bound tokenize, two slices, one
    zip_with — no positional self-join); the model is one partial-agg
    (w1, w2) groupBy; scoring joins are key-hashed; text never shuffles.
    """
    from ..functions.exprs import bind

    def pairs(t):
        return F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, F.lit(1), F.size(t) - 1),
                F.slice(t, F.lit(2), F.size(t) - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    bg = docs.select(
        "doc_id", F.explode(bind(_tokens(F.col("text")), pairs)).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    m2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    m1 = m2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    scored = (
        bg.join(m2, ["w1", "w2"]).join(m1, "w1")
        .select(
            "doc_id",
            (F.length(F.bin(F.col("c1"))) - F.length(F.bin(F.col("c2"))))
            .cast("long")
            .alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(100 * sum(s)) DIV count(1)").cast("long").alias("surprisal_e2"),
        )
    )
    return (
        docs.select("doc_id").join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("surprisal_e2", F.lit(-1)).cast("long").alias("surprisal_e2"),
        )
    )


def ccnet_buckets(docs: DataFrame, pcts: tuple[int, int] = (33, 66)) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing, per source: score
    every document with :func:`bigram_surprisal`, cut each source's
    score distribution at the exact ``pcts`` order statistics (Q(p) =
    smallest v with 100·cum ≥ p·n — corpus.length_quantiles' integer
    rule over a (source, value) HISTOGRAM, never an all-values buffer),
    and label v ≤ Q(p1) → 'head' (most fluent third), v ≤ Q(p2) →
    'middle', else 'tail'. Documents too short to score (< 2 tokens) get
    'short'. Output (doc_id, source, surprisal_e2, bucket).

    This is the standard pretraining-mixture move (CCNet, Wenzek et al.
    2020): train/keep 'head' wholesale, sample 'middle', drop or
    down-weight 'tail' — value-threshold bucketing, so ties land in the
    better bucket together and no per-doc rank window ever runs (the
    only windows are over the tiny distinct-score relation per source).
    """
    from pyspark.sql import Window

    s = bigram_surprisal(docs)
    base = docs.select("doc_id", "source").join(s, "doc_id")
    scored = base.where(F.col("n_bigrams") > 0)
    hist = scored.groupBy("source", "surprisal_e2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("surprisal_e2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "surprisal_e2",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    p1, p2 = int(pcts[0]), int(pcts[1])
    cuts = (
        cum.groupBy("source")
        .agg(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(p1) * F.col("n"),
                    F.col("surprisal_e2"),
                )
            ).alias("c1"),
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(p2) * F.col("n"),
                    F.col("surprisal_e2"),
                )
            ).alias("c2"),
        )
    )
    bucket = (
        F.when(F.col("n_bigrams") == 0, F.lit("short"))
        .when(F.col("surprisal_e2") <= F.col("c1"), F.lit("head"))
        .when(F.col("surprisal_e2") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return base.join(F.broadcast(cuts), "source", "left").select(
        "doc_id", "source", "surprisal_e2", bucket.alias("bucket")
    )


CCNET_RATES_BP = {"head": 10000, "middle": 5000, "tail": 1000, "short": 0}


def ccnet_mixture(
    docs: DataFrame, rates_bp: dict[str, int] | None = None
) -> DataFrame:
    """The CCNet mixture composed end-to-end: bucket every document with
    :func:`ccnet_buckets`, then keep it iff its deterministic md5 bucket
    (sampling.hash_bucket, salt 'ccnet:') falls below the bucket's rate
    in basis points — default keep head wholesale, half of middle, 10%
    of tail, drop unscoreable docs. Output the kept (doc_id, source,
    bucket, hash_bp). Membership is reproducible, content-independent,
    and stable under corpus growth — re-running tomorrow's ingest keeps
    yesterday's decisions (the property random sampling can't give a
    resumable pipeline). Zero extra shuffles beyond the bucketing: the
    rate lookup is a literal CASE, the gate a filter.
    """
    from .sampling import hash_bucket

    rates = dict(CCNET_RATES_BP if rates_bp is None else rates_bp)
    b = ccnet_buckets(docs)
    h = hash_bucket(F.col("doc_id"), "ccnet:", 10000)
    rate = F.lit(0)
    for name, bp in sorted(rates.items()):
        rate = F.when(F.col("bucket") == name, F.lit(int(bp))).otherwise(rate)
    return (
        b.select("doc_id", "source", "bucket", h.alias("hash_bp"), rate.alias("r"))
        .where(F.col("hash_bp") < F.col("r"))
        .select("doc_id", "source", "bucket", "hash_bp")
    )


def vocab_growth(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source vocabulary-shape diagnostics: (source, n_tokens, n_types,
    n_hapax, n_dis, ttr_bp, hapax_share_bp) — token count, distinct-type
    count, hapax/dis legomena (frequency 1 and 2), type-token ratio and
    hapax share in basis points.

    Natural language keeps minting new words as a corpus grows (hapax
    share ~40-60% under Zipf); templated or spun content saturates its
    vocabulary almost immediately. A source whose TTR and hapax share sit
    far below its siblings is boilerplate/spam mass; far above (at
    comparable size) suggests encoding noise or language mixing. The
    length-matched comparison matters — TTR falls with corpus size even
    for clean text, so compare sources at similar n_tokens, or track one
    source across snapshot deltas.

    Scale: one (source, token) count shuffle with map-side partials —
    the per-source frequency relation is vocabulary-bounded — then a tiny
    per-source rollup. Divisions are non-negative DIV (cross-engine
    safe); sources with zero tokens don't appear (explode drops them).
    """
    freq = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(_tokens(F.col("text"))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    one = F.lit(1).cast("long")
    agg = freq.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, one).otherwise(F.lit(0))).cast("long").alias("n_hapax"),
        F.sum(F.when(F.col("cnt") == 2, one).otherwise(F.lit(0))).cast("long").alias("n_dis"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        "n_dis",
        F.expr("(10000 * n_types) DIV n_tokens").alias("ttr_bp"),
        F.expr("(10000 * n_hapax) DIV n_types").alias("hapax_share_bp"),
    )


# Gopher document-filter stop-word list (Rae et al. 2021, Table A1): a doc
# must contain at least 2 of these to survive the rule bundle
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The Gopher quality-rule bundle (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", Table A1) —
    the standard pre-dedup document filter of web-scale training pipelines,
    emitted as one per-rule boolean column each plus the composite keep
    verdict:

      - r_wordcount: min_words <= n_words <= max_words;
      - r_meanlen:   mean word length in [min_mean_len, max_mean_len],
        tested WITHOUT division (min*n <= chars <= max*n — integer exact);
      - r_symbol:    (# chars + '...' occurrences) / words < 0.1, i.e.
        10*(n_hash + n_ellipsis) < n_words (docs with 0 words fail
        r_wordcount anyway, so the degenerate 0<0 here is moot);
      - r_bullet:    < 90% of (non-blank) lines start with a bullet
        ('-', '*', or U+2022); vacuously true with no lines;
      - r_ellipsis:  < 30% of lines end with '...'; vacuously true with no
        lines;
      - r_alpha:     >= 80% of words contain an ASCII letter
        (5*n_alpha >= 4*n_words);
      - r_stop:      >= 2 DISTINCT Gopher stop words present.

    Every ratio is compared by integer cross-multiplication, so the DuckDB
    oracle hash-matches bit-for-bit — no float thresholds in the contract.
    Line convention matches repetition_stats: split on '\\n', drop
    blank-after-trim lines; bullet/ellipsis tests look at the trimmed line.

    Scale: a ZERO-shuffle projection — every signal is an intra-row HOF or
    string expression, whole-stage codegen end to end; one corpus scan.

    ``stopwords`` overrides the Gopher list (the rule's SHAPE is the
    contract; deployments routinely localize the list per language).
    """
    if stopwords is None:
        stopwords = GOPHER_STOPWORDS
    toks = _tokens(F.col("text"))
    lines = F.filter(F.split(F.col("text"), "\n"), lambda l: F.trim(l) != "")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.expr(
            "aggregate(filter(split(lower(text), '\\\\s+'), t -> t <> ''),"
            " 0L, (acc, t) -> acc + length(t))"
        ).alias("word_chars"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        ).cast("long").alias("n_hash"),
        (
            (F.length("text") - F.length(F.expr("replace(text, '...', '')"))) / 3
        ).cast("long").alias("n_ellipsis"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.trim(l), 1, 1).isin("-", "*", "•"),
            )
        ).cast("long").alias("n_bullet_lines"),
        F.size(
            F.filter(lines, lambda l: F.trim(l).endswith("..."))
        ).cast("long").alias("n_ellipsis_lines"),
        F.expr("size(filter(filter(split(lower(text), '\\\\s+'), t -> t <> ''),"
               " t -> t rlike '[a-z]'))").cast("long").alias("n_alpha_words"),
        sum(
            (
                F.array_contains(toks, w).cast("long")
                for w in stopwords
            ),
            F.lit(0).cast("long"),
        ).alias("n_stop_distinct"),
    )
    r_wordcount = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    r_meanlen = (F.col("word_chars") >= min_mean_len * F.col("n_words")) & (
        F.col("word_chars") <= max_mean_len * F.col("n_words")
    )
    r_symbol = 10 * (F.col("n_hash") + F.col("n_ellipsis")) < F.col("n_words")
    r_bullet = (F.col("n_lines") == 0) | (
        10 * F.col("n_bullet_lines") < 9 * F.col("n_lines")
    )
    r_ellipsis = (F.col("n_lines") == 0) | (
        10 * F.col("n_ellipsis_lines") < 3 * F.col("n_lines")
    )
    r_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    r_stop = F.col("n_stop_distinct") >= 2
    return base.select(
        "doc_id",
        "n_words",
        "word_chars",
        "n_lines",
        "n_stop_distinct",
        r_wordcount.alias("r_wordcount"),
        r_meanlen.alias("r_meanlen"),
        r_symbol.alias("r_symbol"),
        r_bullet.alias("r_bullet"),
        r_ellipsis.alias("r_ellipsis"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        (
            r_wordcount & r_meanlen & r_symbol & r_bullet & r_ellipsis & r_alpha & r_stop
        ).alias("keep"),
    )


# hashed-linear classifier: weight-table size (weights live IN the hash —
# w(feature) = md5-bucket(feature) - (mod-1)/2, uniform over ±(mod-1)/2)
CLS_WEIGHT_MOD = 2001
CLS_SALT = "clsw:"


def _cls_weight(feat_col):
    """Deterministic integer weight in [-1000, 1000] for one feature string:
    the portable md5 bucket hash (same construction as sampling.hash_bucket)
    shifted to be zero-mean. Stands in for a trained fastText/FineWeb-Edu
    weight table: inference-side the lookup is exactly this shape — a pure
    per-feature expression (a real deployment swaps the hash for a broadcast
    map over the same feature ids)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(CLS_SALT), feat_col)), 1, 15), 16, 10
        ).cast("long")
        % CLS_WEIGHT_MOD
        - (CLS_WEIGHT_MOD - 1) // 2
    )


def classifier_score(docs: DataFrame) -> DataFrame:
    """FastText-style hashed linear classifier INFERENCE (Joulin et al.
    2016; the quality-classifier stage of FineWeb-Edu / LLaMA-style
    curation): features are the lowercased whitespace tokens plus their
    adjacent bigrams, each hashed straight to an integer weight
    (_cls_weight); the document score is the feature-weight sum.

    Output: (doc_id, n_feats, margin) — margin is the UN-normalized sum;
    consumers threshold by integer cross-multiplication (classifier_select)
    so no division ever enters the contract. |w| ≤ 1000 and n_feats ≤ 2·words
    keep margin ≤ 2000·words — int64-safe at any realistic document.

    Scale: ZERO shuffle — one Arrow-batched kernel over (doc_id, text)
    with a per-batch FEATURE-WEIGHT MEMO (Zipf: distinct features ≪
    occurrences, so the md5 runs ~once per distinct feature per batch —
    the bpe_encode pattern). Classifier inference at 100 TB is
    embarrassingly parallel and this plan keeps it that way. A pure
    Catalyst-expression twin (transform + aggregate HOFs over the
    _cls_weight chain) produced identical rows but ran the md5/conv
    chain through the INTERPRETED per-element HOF evaluator — 9.6 s vs
    0.4 s at sf0.1 for the same output; the lsh_bucket_multi lesson
    repeats.

    Tokenization matches _tokens' Java-regex semantics exactly
    (ASCII-\\s split, drop empties, ASCII lower — same pin as
    bpe_encode); the memoized weight is bit-identical to _cls_weight.
    """
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    half = (CLS_WEIGHT_MOD - 1) // 2
    salt = CLS_SALT

    def _w(feat: str, memo: dict) -> int:
        got = memo.get(feat)
        if got is None:
            got = (
                int(hashlib.md5((salt + feat).encode()).hexdigest()[:15], 16)
                % CLS_WEIGHT_MOD
                - half
            )
            memo[feat] = got
        return got

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in it:
            n_out, m_out = [], []
            for text in pdf["text"]:
                toks = [t for t in java_ws.split((text or "").lower()) if t]
                m = 0
                for t in toks:
                    m += _w(t, memo)
                prev = None
                for t in toks:
                    if prev is not None:
                        m += _w(prev + " " + t, memo)
                    prev = t
                n_out.append(len(toks) + max(len(toks) - 1, 0))
                m_out.append(m)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_feats": n_out, "margin": m_out}
            )

    return docs.select("doc_id", "text").mapInPandas(
        _batches, "doc_id long, n_feats long, margin long"
    )


def classifier_select(docs: DataFrame, min_mean_w_e3: int = 25_000) -> DataFrame:
    """Documents the hashed classifier keeps: mean feature weight ≥
    min_mean_w_e3/1000, tested WITHOUT division as
    margin·1000 ≥ min_mean_w_e3·n_feats (both sides int64; margin ≤
    2000·words so the ×1000 stays 4 orders under the budget). Featureless
    (empty-text) documents are dropped — an empty doc has no evidence of
    quality. Same zero-shuffle scan as classifier_score plus one filter."""
    scored = classifier_score(docs)
    return scored.where(
        (F.col("n_feats") > 0)
        & (F.col("margin") * 1000 >= F.lit(int(min_mean_w_e3)) * F.col("n_feats"))
    )


def cooccurrence_counts(docs: DataFrame, window: int = 3) -> DataFrame:
    """GloVe-style co-occurrence matrix construction (Pennington et al.
    2014): forward-window token pairs with the paper's 1/dist distance
    weighting, rolled up per (w_a, w_b) — the X_ij statistic a GloVe /
    SGNS-with-counts trainer consumes (symmetrize downstream if needed;
    the forward-window convention keeps each pair counted once).

    Output: (w_a, w_b, n_pairs, weight_12) where weight_12 accumulates
    12 DIV dist per pair — exact integers for window ≤ 4 (12 = lcm(1..4):
    dist 1→12, 2→6, 3→4, 4→3), so no float harmonic weights enter the
    contract.

    Scale: pair construction is intra-row (nested sequence HOFs guarded
    against Spark's DESCENDING sequence(1,0) trap for <2-token docs), one
    explode, then ONE groupBy bounded by the realized vocabulary² — the
    standard co-occurrence shuffle. No corpus self-join on doc_id ever
    appears."""
    if not 1 <= window <= 4:
        raise ValueError("window must be in [1, 4] (weight_12 exactness)")
    toks = _tokens(F.col("text"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1), F.least(F.lit(window), F.size("toks") - i)
                    ),
                    lambda d: F.struct(
                        F.element_at(F.col("toks"), i).alias("w_a"),
                        F.element_at(F.col("toks"), (i + d).cast("int")).alias("w_b"),
                        d.cast("long").alias("dist"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<w_a:string,w_b:string,dist:long>>"))
    exploded = (
        docs.select("doc_id", toks.alias("toks"))
        .select(F.explode(pairs).alias("p"))
        .select("p.w_a", "p.w_b", "p.dist")
    )
    return exploded.groupBy("w_a", "w_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("12 DIV dist")).cast("long").alias("weight_12"),
    )


def kneser_ney_bigrams(docs: DataFrame) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities (Kneser & Ney 1995; the
    classic n-gram LM smoothing — interpolated form, absolute discount
    d = 0.75) for every OBSERVED corpus bigram, in an exact two-stage
    integer e9 fixed point so the oracle replays it bit-for-bit:

        pcont_e9 = (1e9 · N1+(·,w2))  DIV N1+(··)
        lam_e9   = (75e7 · N1+(w1,·)) DIV c(w1)
        p_kn_e9  = (1e9 · (4·c(w1,w2) − 3)) DIV (4·c(w1))
                   + (lam_e9 · pcont_e9) DIV 1e9

    (the two-stage form IS the contract — each DIV is floor-exact; the
    single-expression rational would overflow int64 at corpus-scale
    continuation counts). Every numerator is non-negative (c ≥ 1 ⇒
    4c − 3 ≥ 1), so Spark DIV ≡ DuckDB //. The continuation
    distribution N1+(·,w2)/N1+(··) is KN's signature: 'francisco'
    is frequent but follows only 'san', so its unigram backoff weight
    collapses — pinned by test.

    Output: (w1, w2, c12, c1, p_kn_e9) for observed bigrams (unseen
    pairs' mass is λ(w1)·pcont(w2), not enumerated).

    int64 budget: 1e9·4·c12 needs c12 < 2.3e9 — pre-scale counts
    (c DIV 2^s, all four statistics together) beyond that, the
    fixed-point estimators' standard remedy.

    Scale: one intra-row bigram explode (no positional self-join), then
    three partial-agg groupBys (pair, prefix, suffix) and one scalar
    distinct-type count; joins are key-hashed, text never shuffles.
    """
    from ..functions.exprs import bind

    def pairs(t):
        return F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, F.lit(1), F.size(t) - 1),
                F.slice(t, F.lit(2), F.size(t) - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    bg = docs.select(F.explode(bind(_tokens(F.col("text")), pairs)).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    m2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    m1 = m2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    mc = m2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_rev"))
    ntot = m2.agg(F.count(F.lit(1)).cast("long").alias("ntot"))
    return (
        m2.join(m1, "w1")
        .join(mc, "w2")
        .crossJoin(F.broadcast(ntot))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            F.expr(
                "(1000000000 * (4 * c12 - 3)) DIV (4 * c1)"
                " + ((750000000 * n1p_fwd) DIV c1)"
                "   * ((1000000000 * n1p_rev) DIV ntot) DIV 1000000000"
            )
            .cast("long")
            .alias("p_kn_e9"),
        )
    )


def kn_doc_surprisal(docs: DataFrame, lm_docs: DataFrame) -> DataFrame:
    """Cross-domain document scoring under a SMOOTHED LM — the step
    :func:`bigram_surprisal` cannot take: estimate the interpolated
    Kneser-Ney bigram model of :func:`kneser_ney_bigrams` from
    ``lm_docs`` (the in-domain/target corpus), then score EVERY document
    in ``docs`` as the mean integer surprisal of its bigrams under that
    model. Smoothing is the whole point: a foreign-domain document's
    bigrams are mostly unseen in the LM corpus, and only the backoff
    mass lets them be scored at all —

        p_e9(w1, w2) = p_kn_e9                        (observed bigram)
                     = (λ_e9(w1) · pcont_e9(w2)) DIV 1e9   (seen prefix)
                     = pcont_e9(w2)                       (unseen prefix)

    floored at 1, with the exact two-stage integer pieces of
    kneser_ney_bigrams (every DIV floor-exact, non-negative operands, so
    the DuckDB oracle replays bit-for-bit; p_e9 ≤ 1e9 because KN's
    discount d = 0.75 caps each term — c12 + 0.75·(n1p_fwd − 1) ≤ c1).
    Per-bigram surprisal s = 30 − bit_length(p_e9) (30 = bit_length(1e9);
    the integer −log2 p of the unigram_surprisal idiom, s ∈ [0, 29]),
    and per doc kn_surprisal_e2 = (100·Σs) DIV n_bigrams; docs with < 2
    tokens emit the −1 sentinel (never NULL — the pandas NaN-hash trap).
    Output: (doc_id, n_bigrams, kn_surprisal_e2). ``lm_docs`` must
    contain at least one bigram (an empty model divides by ntot = 0).

    This is the scoring half of intelligent data selection (Moore &
    Lewis 2010): low kn_surprisal_e2 against a target-domain LM = reads
    like the target domain. :func:`moore_lewis_select` composes the
    contrastive difference.

    Scale: the model is three partial-agg groupBys over the LM corpus's
    bigrams (pair/prefix/suffix) + one scalar — AQE broadcasts it when
    the target corpus is small (the Moore-Lewis regime: tiny in-domain
    seed, huge general pool); scoring joins key on (w1, w2)/w1/w2 hashes,
    text never shuffles; the per-doc rollup rides partial aggregation.
    int64 budget: identical to kneser_ney_bigrams (1e9·4·c12)."""
    from ..functions.exprs import bind

    def pairs(t):
        return F.when(
            F.size(t) >= 2,
            F.zip_with(
                F.slice(t, F.lit(1), F.size(t) - 1),
                F.slice(t, F.lit(2), F.size(t) - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    lm_bg = lm_docs.select(
        F.explode(bind(_tokens(F.col("text")), pairs)).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    m2 = lm_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    m1 = m2.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    mc = m2.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_rev"))
    ntot = m2.agg(F.count(F.lit(1)).cast("long").alias("ntot"))

    bg = docs.select(
        "doc_id", F.explode(bind(_tokens(F.col("text")), pairs)).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    scored = (
        bg.join(m2, ["w1", "w2"], "left")
        .join(m1, "w1", "left")
        .join(mc, "w2", "left")
        .crossJoin(F.broadcast(ntot))
        .select(
            "doc_id",
            F.expr(
                "30 - length(bin(greatest(CASE"
                " WHEN c12 IS NOT NULL THEN"
                "  (1000000000 * (4 * c12 - 3)) DIV (4 * c1)"
                "  + ((750000000 * n1p_fwd) DIV c1)"
                "    * ((1000000000 * coalesce(n1p_rev, 0)) DIV ntot) DIV 1000000000"
                " WHEN c1 IS NOT NULL THEN"
                "  ((750000000 * n1p_fwd) DIV c1)"
                "    * ((1000000000 * coalesce(n1p_rev, 0)) DIV ntot) DIV 1000000000"
                " ELSE (1000000000 * coalesce(n1p_rev, 0)) DIV ntot"
                " END, 1)))"
            )
            .cast("long")
            .alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(100 * sum(s)) DIV count(1)")
            .cast("long")
            .alias("kn_surprisal_e2"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("kn_surprisal_e2", F.lit(-1))
            .cast("long")
            .alias("kn_surprisal_e2"),
        )
    )


def moore_lewis_select(
    docs: DataFrame, target_docs: DataFrame, max_diff_e2: int = 0
) -> DataFrame:
    """Intelligent data selection by cross-entropy difference (Moore &
    Lewis 2010, "Intelligent Selection of Language Model Training
    Data"): score every document under TWO Kneser-Ney bigram LMs — the
    in-domain model estimated from ``target_docs`` and the general model
    estimated from the scored pool itself — and keep documents whose
    difference diff_e2 = in_e2 − out_e2 is ≤ ``max_diff_e2``. The
    difference cancels generic fluency: a document scores low on BOTH
    models if it is merely common text, but low-in/high-out only if it
    specifically resembles the target domain — the contrastive signal a
    single-model threshold (ccnet_buckets) cannot express. Default
    threshold 0 = "at least as in-domain-likely as general", the natural
    centre of Moore & Lewis's tuning axis.

    Output: (doc_id, in_e2, out_e2, diff_e2), scoreable docs only
    (n_bigrams > 0 — the −1 sentinels never enter the difference).
    Purely integer end-to-end, so the DuckDB oracle replays the two
    model chains and the difference bit-for-bit.

    Scale: two :func:`kn_doc_surprisal` passes over the same doc-bigram
    relation; the in-domain model is the tiny side (broadcast), the
    general model's partial-agg rollups are the same shape as
    kneser_ney_bigrams; the final join keys on doc_id only."""
    ind = kn_doc_surprisal(docs, target_docs)
    outd = kn_doc_surprisal(docs, docs).select(
        "doc_id", F.col("kn_surprisal_e2").alias("out_e2")
    )
    return (
        ind.where(F.col("n_bigrams") > 0)
        .select("doc_id", F.col("kn_surprisal_e2").alias("in_e2"))
        .join(outd, "doc_id")
        .select(
            "doc_id",
            "in_e2",
            "out_e2",
            (F.col("in_e2") - F.col("out_e2")).cast("long").alias("diff_e2"),
        )
        .where(F.col("diff_e2") <= int(max_diff_e2))
    )


def ppmi_matrix(docs: DataFrame, window: int = 3) -> DataFrame:
    """Positive pointwise mutual information over the co-occurrence
    matrix (Church & Hanks 1990; the classic count-based word-vector
    weighting, Levy & Goldberg 2014's SGNS equivalence): per observed
    pair, PMI ≈ log2(c_ab·N / (row_a·col_b)) in the repo's integer
    bit-length form — bits = bitlen(c_ab·N) − bitlen(row_a·col_b),
    ppmi_bits = max(bits, 0) — exact to within one bit, zero floats in
    either engine (the unigram_surprisal idiom).

    Output: (w_a, w_b, n_pairs, ppmi_bits). int64 budget: c_ab·N < 2^63
    — pre-scale the counts (all four together) past ~3e9 total pairs,
    the fixed-point estimators' standard remedy.

    Scale: rides cooccurrence_counts (intra-row pair build, vocab²
    rollup); marginals are two more partial-agg groupBys over the
    already-aggregated matrix, joined back by key."""
    co = cooccurrence_counts(docs, window=window).select("w_a", "w_b", "n_pairs")
    row = co.groupBy("w_a").agg(F.sum("n_pairs").cast("long").alias("row_a"))
    col = co.groupBy("w_b").agg(F.sum("n_pairs").cast("long").alias("col_b"))
    tot = co.agg(F.sum("n_pairs").cast("long").alias("n_total"))
    return (
        co.join(row, "w_a")
        .join(col, "w_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "w_a",
            "w_b",
            "n_pairs",
            F.greatest(
                F.length(F.bin(F.col("n_pairs") * F.col("n_total")))
                - F.length(F.bin(F.col("row_a") * F.col("col_b"))),
                F.lit(0),
            )
            .cast("long")
            .alias("ppmi_bits"),
        )
    )
