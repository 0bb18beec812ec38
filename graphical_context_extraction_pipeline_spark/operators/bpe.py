"""Distributed BPE tokenizer-training support.

A 100 TB training-data pipeline doesn't just filter and dedup text — it
also trains the tokenizer that will consume it. The expensive stage of BPE
training (Sennrich et al. 2016) is corpus-scale word counting; the merge
loop itself runs over the aggregated word-frequency table, which is
vocabulary-bounded and (after heavy-hitter truncation, which every real
tokenizer trainer applies) driver-bounded. The operators here split the
work accordingly:

- :func:`word_freqs` — the corpus-scale pass: one map-side-combined
  shuffle producing the (word, freq) relation.
- :func:`bpe_pair_counts` — distributed adjacent-pair statistics over the
  FULL (untruncated) vocabulary: the first-round pair histogram as pure
  DataFrame ops, SQL-oracled.
- :func:`bpe_learn` — the full merge loop: distributed count + distributed
  top-V heavy-hitter truncation (TakeOrderedAndProject, no global sort),
  then the bounded merge recurrence on the driver. Running the loop as V
  distributed jobs would be the LESS scalable design: real corpora have
  ~10⁸ word types but trainers cap to ~10⁵ heavy hitters precisely so the
  loop is memory-local; the distributed part is the counting.
- :func:`bpe_encode` — apply a learned merge list to every document
  (Arrow-batched mapInPandas, merge table broadcast, per-batch word memo).

Contract details (pinned by tests + the pure-Python oracle replica in
oracle_artifacts.py): words are the whitespace/lowercase tokens of
text_analysis._tokens; symbols start as single characters (no end-of-word
marker); a merge step picks the max-count pair with (count desc, left asc,
right asc) tie-break; applying a merge rewrites each word left-to-right
non-overlapping ("aaaa" + (a,a) → [aa, aa]); encoding applies the learned
merges sequentially in learned order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _tokens


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale pass of BPE
    training. Map-side partial aggregation; output is vocabulary-bounded."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _sym_pairs(word_col):
    """Adjacent character pairs of a word, with multiplicity (overlapping
    positions each count — Sennrich's get_stats semantics).

    TRAP: Spark's sequence(1, n-1) is DESCENDING [1, 0] when n = 1 (it
    never returns empty for start > stop), which would fabricate
    ('c', '') and substr(0,..)-aliased pairs for 1-char words — guard to
    an empty array below length 2."""
    n = F.length(word_col)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            word_col.substr(i, F.lit(1)).alias("left"),
            word_col.substr(i + 1, F.lit(1)).alias("right"),
        ),
    )
    empty = F.array().cast("array<struct<left:string,right:string>>")
    return F.when(n >= 2, pairs).otherwise(empty)


def bpe_pair_counts(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """First-round BPE pair statistics: the top-k adjacent CHARACTER pairs
    by frequency-weighted count over the full vocabulary, (cnt desc, left
    asc, right asc) ordered. Pure DataFrame ops end to end: the corpus pass
    is word_freqs; the pair explode runs over the vocabulary-bounded word
    relation, so the second shuffle is alphabet²-bounded. orderBy+limit
    compiles to TakeOrderedAndProject (no global sort)."""
    wf = word_freqs(docs, text_col=text_col)
    pairs = wf.select(
        "freq", F.explode(_sym_pairs(F.col("word"))).alias("p")
    ).select(
        F.col("p.left").alias("left"), F.col("p.right").alias("right"), "freq"
    )
    cnt = pairs.groupBy("left", "right").agg(F.sum("freq").alias("cnt"))
    return (
        cnt.orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
        .limit(k)
        .select("left", "right", F.col("cnt").cast("long").alias("cnt"))
    )


def _apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping rewrite of one merge over a symbol
    sequence."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_merges_local(
    word_freq_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The bounded merge recurrence over an in-memory (word, freq) table:
    returns (step, left, right, pair_count) rows. Deterministic: max count,
    then lexicographically smallest (left, right)."""
    vocab: list[tuple[list[str], int]] = [
        (list(word), freq) for word, freq in word_freq_rows if word
    ]
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, cnt))
        vocab = [
            (_apply_merge(syms, left, right) if left in syms else syms, freq)
            for syms, freq in vocab
        ]
    return merges


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 50,
    max_vocab_words: int = 65536,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table: (step, left, right, pair_count).

    Distributed: the corpus-scale word count (one shuffle) and the heavy-
    hitter truncation to the top ``max_vocab_words`` words by (freq desc,
    word asc) — TakeOrderedAndProject, per-partition top-V then a V-row
    driver merge. Bounded: the merge loop itself, O(V·L·n_merges) over the
    collected table — the same split every production tokenizer trainer
    makes, because vocabulary types (~10⁸ on web scale) dwarf the trainer's
    working set only until truncation, and rare tails don't move merges.

    Driver memory bound: max_vocab_words rows of (word, freq). The oracle
    is an independently written pure-Python replica over the same truncated
    table (oracle_artifacts.py), DuckDB as transport.
    """
    top = (
        word_freqs(docs, text_col=text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )
    merges = learn_merges_local([(r["word"], r["freq"]) for r in top], n_merges)
    spark = docs.sparkSession
    schema = "step long, left string, right string, pair_count long"
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(merges, schema)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with a learned merge list, applying merges
    sequentially in learned order per word. Returns (doc_id, n_words,
    n_pieces, pieces_sig) where pieces_sig is the md5 of the '\\x1f'-joined
    piece stream — a compact equality witness for the full tokenization.

    Scale: zero shuffle — one Arrow-batched map over doc rows; the merge
    list is closure-captured (broadcast with the task binary; ~100k merges
    ≈ a few MB). Per-batch word→pieces memo: Zipf makes the hit rate high,
    so the merge loop runs roughly once per distinct word per batch, not
    once per occurrence.
    """
    import hashlib
    import re

    # Java-regex \s (ASCII-only), matching _tokens' split(text, '\s+') —
    # Python str.split() is Unicode-aware and would also split on NBSP
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    merge_list = [(l, r) for l, r in merges]

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        for l, r in merge_list:
            if len(syms) < 2:
                break
            syms = _apply_merge(syms, l, r)
        memo[word] = syms
        return syms

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in it:
            out = {"doc_id": [], "n_words": [], "n_pieces": [], "pieces_sig": []}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                words = [w for w in java_ws.split((text or "").lower()) if w]
                pieces: list[str] = []
                for w in words:
                    pieces.extend(_encode_word(w, memo))
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_pieces"].append(len(pieces))
                out["pieces_sig"].append(
                    hashlib.md5("\x1f".join(pieces).encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(
        _batches, schema="doc_id long, n_words long, n_pieces long, pieces_sig string"
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    source_col: str = "source",
) -> DataFrame:
    """Per-source tokenizer fertility: BPE pieces per whitespace word,
    in basis points — the metric that converts a document-count mixture
    into a TOKEN budget (verbose-tokenizing sources eat more of a fixed
    token budget than their doc share suggests; fertility is also the
    standard tokenizer-quality probe per domain/language).

    Output: (source, n_words, n_pieces, fertility_bp) with
    fertility_bp = (10000·Σpieces) DIV Σwords (non-negative integers, so
    DIV ≡ floor cross-engine); an all-empty source reports 0.

    Scale: rides bpe_encode's zero-shuffle Arrow map; the rollup is one
    partial-agg groupBy on the source key (sources are few), plus the
    doc_id join to fetch the source column — co-located when both sides
    are bucketed by doc_id."""
    enc = bpe_encode(docs, merges)
    j = enc.join(docs.select("doc_id", source_col), "doc_id")
    agg = j.groupBy(source_col).agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_pieces").cast("long").alias("n_pieces"),
    )
    return agg.select(
        source_col,
        "n_words",
        "n_pieces",
        F.when(
            F.col("n_words") > 0,
            F.expr("(10000 * n_pieces) DIV n_words"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fertility_bp"),
    )
