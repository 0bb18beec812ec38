"""End-to-end corpus curation: the composition a training-data user
actually runs — quality gate → exact dedup → near-dup transitive closure —
emitting one verdict row per input document.

Stages (each reusing the already-oracled operator underneath):
1. quality gate      text_analysis.quality_score.passes_quality
2. exact dedup       md5(lower(text)) keep-first (dedup.dedup_keep_first's
                     aggregation shape)
3. near-dup closure  dedup.ngram_jaccard_pairs over the exact survivors →
                     cluster.connected_components → canonical per cluster

Output: (doc_id, status, canonical_doc_id) where status ∈
  'rejected_quality' — failed the quality gate (canonical −1: folded
                       into nothing — the sentinel keeps the column
                       non-null for hash-stable engine comparison)
  'exact_duplicate'  — same normalized text as a smaller-id doc
                       (canonical = that doc)
  'near_duplicate'   — in a near-dup cluster, not its minimum
                       (canonical = cluster minimum)
  'kept'             — survives curation (canonical = itself)
Canonicals are STAGE-LOCAL: an exact duplicate points at its exact
canonical even if that canonical is later folded as a near-duplicate —
consumers wanting full resolution follow the (tiny) canonical chain.

Scale design: TWO corpus scans total — one for the rejected branch (scan +
inline gate, zero shuffle) and one materialized into the keyed relation
(gate + md5 aggregation + co-keyed join, localCheckpoint'd) that every
other branch AND the ngram/closure machinery read, so the dedup shuffle
runs once, not once per branch. Without the checkpoint each of the four
union branches would lazily re-evaluate the scan/gate/dedup chain. The
final verdict table is a union of disjoint row sets — every doc appears in
exactly one branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import neardup_clusters
from .dedup import ngram_jaccard_pairs
from .text_analysis import passes_quality_expr


def curate_corpus(docs: DataFrame, min_jaccard_bp: int = 6000) -> DataFrame:
    """One verdict row per input doc (see module docstring)."""
    # the gate is applied INLINE on the scan (passes_quality_expr), never
    # via a join of the corpus against its own score table
    base = docs.select("doc_id", "text", passes_quality_expr().alias("passes_quality"))

    id_type = docs.schema["doc_id"].dataType  # verdicts keep the corpus' id type
    rejected = base.where(~F.col("passes_quality")).select(
        "doc_id",
        F.lit("rejected_quality").alias("status"),
        F.lit(-1).cast(id_type).alias("canonical_doc_id"),
    )

    passing = base.where(F.col("passes_quality")).select(
        "doc_id", "text", F.md5(F.lower("text")).alias("dup_key")
    )
    exact_canon = passing.groupBy("dup_key").agg(F.min("doc_id").alias("exact_canon"))
    # materialize once (lazily, on first action): exact_dups, survivors,
    # kept, and the near-dup machinery all branch off this relation
    keyed = passing.join(exact_canon, "dup_key").localCheckpoint(eager=False)
    exact_dups = keyed.where(F.col("doc_id") != F.col("exact_canon")).select(
        "doc_id",
        F.lit("exact_duplicate").alias("status"),
        F.col("exact_canon").alias("canonical_doc_id"),
    )
    exact_survivors = keyed.where(F.col("doc_id") == F.col("exact_canon")).select(
        "doc_id", "text"
    )

    pairs = ngram_jaccard_pairs(exact_survivors, min_jaccard_bp=min_jaccard_bp)
    members = neardup_clusters(pairs).select("doc_id", "component")
    near_dups = members.where(F.col("doc_id") != F.col("component")).select(
        "doc_id",
        F.lit("near_duplicate").alias("status"),
        F.col("component").alias("canonical_doc_id"),
    )
    kept = exact_survivors.join(
        near_dups.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.lit("kept").alias("status"),
        F.col("doc_id").alias("canonical_doc_id"),
    )
    return rejected.unionByName(exact_dups).unionByName(near_dups).unionByName(kept)


def curation_metrics(verdicts: DataFrame) -> DataFrame:
    """Per-stage counts from the verdict table — the run-report rollup
    (one tiny groupBy on the 4-value status column)."""
    return verdicts.groupBy("status").agg(F.count("*").cast("long").alias("n_docs"))


def training_verdicts(
    docs: DataFrame,
    min_mean_w_e3: int = 110_000,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The modern data-selection ladder as ONE verdict table (the
    FineWeb-style composition: heuristic rules → learned classifier →
    dedup): per document, r_gopher (the Gopher rule bundle's composite
    keep), r_classifier (hashed-classifier margin gate, integer
    cross-multiplied), r_unique (exact keep-first on md5(lower(text)) —
    curate_corpus's dup key), and keep = all three.

    Complements curate_corpus (the heuristic-gate + near-dup-closure
    pipeline): this is the selection LADDER's verdict surface, each rung
    independently inspectable for funnel analysis (how many docs each
    stage removes — corpus_health's natural companion).

    Scale: the two rule rungs are zero-shuffle scans (gopher is pure
    expressions, the classifier is the memoized Arrow kernel); uniqueness
    is one dup-key groupBy; the rungs join on doc_id (co-located when the
    table is bucketed by doc_id)."""
    from .text_analysis import classifier_score, gopher_rules

    g = gopher_rules(docs, stopwords=stopwords).select(
        "doc_id", F.col("keep").alias("r_gopher")
    )
    c = classifier_score(docs).select(
        "doc_id",
        (
            (F.col("n_feats") > 0)
            & (F.col("margin") * 1000 >= F.lit(int(min_mean_w_e3)) * F.col("n_feats"))
        ).alias("r_classifier"),
    )
    d = docs.select("doc_id", F.md5(F.lower("text")).alias("dup_key"))
    canon = d.groupBy("dup_key").agg(F.min("doc_id").alias("canon"))
    u = d.join(canon, "dup_key").select(
        "doc_id", (F.col("doc_id") == F.col("canon")).alias("r_unique")
    )
    return (
        g.join(c, "doc_id")
        .join(u, "doc_id")
        .select(
            "doc_id",
            "r_gopher",
            "r_classifier",
            "r_unique",
            (F.col("r_gopher") & F.col("r_classifier") & F.col("r_unique")).alias(
                "keep"
            ),
        )
    )


def verdict_funnel(verdicts: DataFrame) -> DataFrame:
    """Stage-by-stage funnel rollup of a training_verdicts relation: one
    row with the corpus count and each rung's survivor count (rungs are
    independent booleans, so the numbers read as per-stage losses under
    any gating order) plus the final keep count. One partial-agg scalar
    aggregation — the training-set datasheet line."""
    return verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("r_gopher").cast("long")).cast("long").alias("n_gopher"),
        F.sum(F.col("r_classifier").cast("long")).cast("long").alias("n_classifier"),
        F.sum(F.col("r_unique").cast("long")).cast("long").alias("n_unique"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
    )


def curated_mixture(
    docs: DataFrame,
    k: int = 100,
    min_mean_w_e3: int = 110_000,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """The pipeline end-to-end: run the selection ladder
    (:func:`training_verdicts`), keep the survivors, and draw the exactly-k
    Hamilton + per-source PPS mixture over them
    (:func:`sampling.quota_mixture`) — "curate, then mix" as one plan,
    the final training-set constructor.

    Scale: the ladder's rungs are zero-shuffle scans + one dup-key
    groupBy; the keep set semi-joins the corpus once (doc_id key); the
    mixture adds its one global cumsum. Nothing corpus-sized reaches the
    driver."""
    from .sampling import quota_mixture

    v = training_verdicts(
        docs, min_mean_w_e3=min_mean_w_e3, stopwords=stopwords
    )
    kept = docs.join(v.where(F.col("keep")).select("doc_id"), "doc_id")
    return quota_mixture(kept, k=k)
