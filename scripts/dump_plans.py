#!/usr/bin/env python
"""Capture formatted physical plans of the headline queries into
BENCH/PLANS.md — the reviewable evidence for the plan-shape claims
(zero-shuffle hot path, broadcast dimensions, pushdown/pruning) that
tests/test_plan_properties.py asserts mechanically."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from graphical_context_extraction_pipeline_spark.datagen import ensure_documents  # noqa: E402
from graphical_context_extraction_pipeline_spark.operators import (  # noqa: E402
    boilerplate as BP,
    dedup,
    relational as R,
    validate as V,
)
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents  # noqa: E402
from graphical_context_extraction_pipeline_spark.plans.explain import (  # noqa: E402
    count_exchanges,
    formatted_plan,
)
from graphical_context_extraction_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("plans", cpus=8)
    docs = spark.read.parquet(ensure_documents(spark, "sf0.01"))
    flat = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    entries = [
        (
            "extract (hot path)",
            extract_documents(docs),
            "one mapInPandas over document rows — ZERO Exchange nodes; scales "
            "linearly with executors because no stage boundary exists.",
        ),
        (
            "timeline_interleave",
            R.timeline_interleave(docs),
            "per-doc ordering + seq numbering INSIDE the row (array_sort + "
            "posexplode) — zero Exchange; the span stream is never shuffled "
            "just to be numbered.",
        ),
        (
            "coverage (validator)",
            V.coverage(docs),
            "tumbling windows + exists() as intra-row HOFs — zero Exchange.",
        ),
        (
            "keyframe_gaps",
            V.keyframe_gaps(docs),
            "lead()-equivalent via intra-row consecutive pairs — zero Exchange.",
        ),
        (
            "chrome_tokens",
            R.chrome_tokens(docs),
            "ZERO Exchange: per-token occurrence counts via intra-row "
            "sorted-run detection (array_sort + run boundaries), threshold "
            "applied inside the row before the explode — per-token state "
            "never leaves the row; ReadSchema shows the scan prunes to the "
            "touched fields only.",
        ),
        (
            "chunk_chapter_assign",
            R.chunk_chapter_assign(docs),
            "chapter dimension broadcast (BroadcastExchange / BroadcastHashJoin) "
            "— the fact side never moves for the dimension joins.",
        ),
        (
            "strip_boilerplate",
            BP.strip_boilerplate(docs),
            "boilerplate set aggregated to ONE row and broadcast; the span "
            "stream reaches the output through intra-row filter + sort only.",
        ),
        (
            "ocr_frame_dedup (W2 as relational fold)",
            R.ocr_frame_dedup(docs),
            "the reference's hardest stateful operator (near-dup keep-chain) as "
            "an aggregate fold INSIDE the row — zero Exchange.",
        ),
        (
            "ngram_jaccard_pairs",
            dedup.ngram_jaccard_pairs(flat),
            "shingles shuffled as 64-bit hashes; doc set-sizes ride through the "
            "bucket expansion so no post-hoc sizes join appears.",
        ),
        (
            "embedding_cosine_dups (banded blocking)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).embedding_cosine_dups(
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
            ),
            "multi-table banded LSH: candidates only from (table, bucket) "
            "equi-joins — never an all-pairs cross join; the exact cosine "
            "runs on the deduped candidate set.",
        ),
        (
            "validation_report",
            V.validation_report(docs, extract_documents(docs)),
            "spans-side ingredients (coverage, gap counts, totals) intra-row "
            "with zero Exchange; only the chunk rollup aggregates and joins "
            "on doc_id (map-side combined).",
        ),
        (
            "neardup_survivors (post-closure corpus)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.cluster",
                fromlist=["cluster"],
            ).neardup_survivors(flat, dedup.ngram_jaccard_pairs(flat)),
            "the corpus is scanned ONCE and left-joined against the small "
            "cluster-membership table (components computed iteratively "
            "beforehand, lineage truncated per round via localCheckpoint — "
            "the checkpoint scan below is that truncation).",
        ),
        (
            "word_spans (per-word re-emission)",
            R.word_spans(docs),
            "two colocated lateral explodes (segments, then words) — zero "
            "Exchange; the word stream inherits the document partitioning.",
        ),
        (
            "minhash_incremental (batch vs seen LSH index)",
            dedup.minhash_incremental_pairs(
                flat.where(F.col("doc_id") % 7 == 0), flat
            ),
            "the seen side reduces to its banded signature index with hot "
            "buckets hub-represented (in production a materialized table); "
            "the (small) batch band-key relation joins against it — the "
            "seen corpus text is hashed once, never self-joined.",
        ),
        (
            "pushdown probe: flat filter",
            flat.where(F.col("lang") == "en").select("doc_id"),
            "PushedFilters shows the lang predicate reaching the parquet scan; "
            "ReadSchema shows doc_id-only projection.",
        ),
        (
            "containment_pairs (subset-dup blocking)",
            dedup.containment_pairs(flat),
            "identical blocking skeleton to ngram_jaccard_pairs — 64-bit "
            "shingle-hash shuffles, full set sizes riding the exploded rows "
            "(no post-hoc sizes join), hot-shingle anti-join ahead of any "
            "bucket materialization.",
        ),
        (
            "source_overlap (cross-source matrix)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.corpus",
                fromlist=["corpus"],
            ).source_overlap(flat),
            "one distinct (source, shingle-hash) shuffle; the self-join's "
            "bucket expansion is bounded by the SOURCE count per shingle; "
            "both sizes joins are BroadcastHashJoins.",
        ),
        (
            "weighted_sample (systematic PPS)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.sampling",
                fromlist=["sampling"],
            ).weighted_sample(flat, k=100),
            "the cumulative axis comes from the range-partitioned sort + "
            "broadcast per-partition offsets (global_cumsum) — NO "
            "SinglePartition window anywhere; the grid-point count is one "
            "integer expression per row.",
        ),
        (
            "quota_mixture (Hamilton + per-source PPS)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.sampling",
                fromlist=["sampling"],
            ).quota_mixture(flat, k=100),
            "one global (source, doc_id) cumsum serves every source "
            "(contiguous runs); the per-source meta (total/slots/base) is a "
            "broadcast relation folded on the driver — no per-source window "
            "funnel under a dominant source.",
        ),
        (
            "c4_span_dedup (sentence-span removal)",
            dedup.c4_span_dedup(flat),
            "positioned span explode shuffles span keys once; covered "
            "sentence-index sets aggregate per doc (bounded by the doc's own "
            "sentence count); the corpus payload joins back exactly once and "
            "the rebuild is one intra-row array_except.",
        ),
        (
            "classifier_score (hashed linear inference)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.text_analysis",
                fromlist=["text_analysis"],
            ).classifier_score(flat),
            "one Arrow-batched kernel over a (doc_id, text)-pruned scan — "
            "zero Exchange; the feature-weight memo keeps the md5 at "
            "once-per-distinct-feature (the expression-HOF twin was 15× "
            "slower for identical rows).",
        ),
        (
            "semdedup (cluster-scoped keep-first)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).semdedup(
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
                n_centroids=16,
            ),
            "centroid assignment is a pure projection (codebook literals — "
            "no centroid-side Exchange); the pairwise stage keys on cid "
            "alone, so Σ|cluster|² is the explicit n_centroids knob.",
        ),
        (
            "d4_prune (prototypicality)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).prototypicality_prune(
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
                n_centroids=16,
            ),
            "one assignment scan + one window partitioned by cid — per-task "
            "state is a single cluster; no corpus-wide window.",
        ),
        (
            "text_embed_hash (hashing-trick vectorizer)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).embed_text_hash(flat, 64),
            "ZERO Exchange: one Arrow-batched kernel over a (doc_id, text)-"
            "pruned scan with a per-batch token→(bucket, sign) memo (one md5 "
            "per distinct token per batch); output co-partitions with the "
            "input, so a following semdedup/ANN build starts from the same "
            "layout. The sparse JVM twin (hashed_features) trades the zero-"
            "shuffle for a (doc_id, bucket) partial-agg when a sparse matrix "
            "is the wanted shape.",
        ),
        (
            "text_semdedup (text→vector→semantic dedup, end-to-end)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).semdedup(
                __import__(
                    "graphical_context_extraction_pipeline_spark.operators.similarity",
                    fromlist=["similarity"],
                ).embed_text_hash(flat, 64),
                n_centroids=16,
                tau_e4=9500,
            ),
            "the vectorizer fuses into semdedup's assignment scan (no "
            "barrier between embed and assign); everything downstream is "
            "the pinned semdedup shape — cid is the only shuffle key.",
        ),
        (
            "cooccurrence_counts (GloVe matrix)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.text_analysis",
                fromlist=["text_analysis"],
            ).cooccurrence_counts(flat),
            "pair construction is intra-row (nested sequence HOFs); ONE "
            "explode feeds ONE vocabulary²-bounded partial-agg groupBy — "
            "no corpus self-join on doc_id anywhere.",
        ),
        (
            "winnow_pairs (MOSS fingerprints)",
            dedup.winnow_pairs(flat),
            "fingerprints are intra-row window minima (zero shuffle before "
            "the explode); the hot-fingerprint count + anti-join runs "
            "BEFORE any pair expansion, same discipline as the shingle "
            "blocking.",
        ),
        (
            "cdc_dedup_stats (content-defined chunks)",
            dedup.cdc_dedup_stats(flat),
            "chunking is one md5-per-token transform + the O(n) segments "
            "primitive, all intra-row; the only shuffle is the chunk-hash "
            "rollup (partial-agg combined).",
        ),
        (
            "training_verdicts (selection ladder)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.curate",
                fromlist=["curate"],
            ).training_verdicts(flat),
            "the two rule rungs are zero-shuffle scans (gopher pure "
            "expressions; classifier the memoized Arrow kernel); "
            "uniqueness is one dup-key groupBy; rungs join on doc_id.",
        ),
        (
            "negative_sampling (tempered PPS)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.sampling",
                fromlist=["sampling"],
            ).negative_sampling(flat, k=100),
            "one vocabulary-bounded count shuffle; tempering is a per-row "
            "expression and the draw is the distributed prefix-sum grid — "
            "no SinglePartition stage.",
        ),
        (
            "bitext_mine (margin-based mining)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).bitext_mine(
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").where(
                    F.col("vec_id") % 2 == 0
                ),
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").where(
                    F.col("vec_id") % 2 == 1
                ),
            ),
            "candidates only from (table, bucket) equi-joins across the two "
            "banded sides; every window partitions by a vector id; margins "
            "are int64 expressions over broadcast-joined neighborhood sums.",
        ),
    ]

    # index-backed BM25 serving: materialize the index + norms to parquet
    # first (as production would) so the plan shows the true serving shape
    import tempfile

    from graphical_context_extraction_pipeline_spark.operators import search as SE

    idx_dir = tempfile.mkdtemp(prefix="plans_idx_")
    SE.inverted_index(flat).write.mode("overwrite").parquet(f"{idx_dir}/postings")
    SE.doc_norms(flat).write.mode("overwrite").parquet(f"{idx_dir}/norms")
    entries += [
        (
            "bm25_from_index (serving path)",
            SE.bm25_from_index(
                spark.read.parquet(f"{idx_dir}/postings"),
                spark.read.parquet(f"{idx_dir}/norms"),
                "dup graft",
            ),
            "the scoring tail: parsed candidate rows broadcast-join the "
            "norms table; the only aggregation is over candidates "
            "(≤ cap·|terms| rows by index construction). The candidate "
            "fetch itself runs as a separate point-lookup job — see the "
            "next probe for its pushed filter.",
        ),
        (
            "bm25_from_index candidate fetch (pushdown probe)",
            spark.read.parquet(f"{idx_dir}/postings")
            .where(F.col("token").isin(["dup", "graft"]))
            .select("df", "postings", "tfs"),
            "PushedFilters shows In(token, [dup,graft]) reaching the index "
            "parquet scan — the lookup reads matching row groups only, "
            "never the corpus.",
        ),
        (
            "embedding_incremental (batch vs seen ANN index)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.similarity",
                fromlist=["similarity"],
            ).embedding_incremental_pairs(
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
                .where(F.col("vec_id") % 40 == 1)
                .withColumn("vec_id", F.col("vec_id") + 600000),
                spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
            ),
            "each side is banded by ONE vectorized ArrowEvalPython node "
            "(all 10 hyperplane tables in a single numpy matmul — no "
            "per-table rescan, no interpreted HOF folds); candidates come "
            "from the (table, bucket) equi-join against the hub-capped "
            "seen index only.",
        ),
    ]

    # round-4 session-2 serving family: batched lexical serving, vector
    # point serving, batched vector serving — all against materialized
    # index tables, never the corpus
    sim = __import__(
        "graphical_context_extraction_pipeline_spark.operators.similarity",
        fromlist=["similarity"],
    )
    emb_t = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim = sim._embedding_dim(emb_t)
    sim.lsh_bucket_multi(
        emb_t, sim.EMB_DUP_PLANES, sim.EMB_DUP_TABLES, sim.EMB_DUP_SEED, dim
    ).write.mode("overwrite").parquet(f"{idx_dir}/embindex")
    embindex = spark.read.parquet(f"{idx_dir}/embindex")
    qv = list(emb_t.where(F.col("vec_id") == 3).first()["embedding"])
    entries += [
        (
            "bm25_serve_batch (batched lexical serving)",
            SE.bm25_serve_batch(
                spark.read.parquet(f"{idx_dir}/postings"),
                spark.read.parquet(f"{idx_dir}/norms"),
                spark.createDataFrame(
                    [(1, "dup graft"), (2, "vector spark")],
                    "query_id long, query string",
                ),
            ),
            "query terms broadcast into the index join; postings explode "
            "executor-side (Generate over the index scan — never a driver "
            "collect); the top-k window partitions by query_id, never "
            "SinglePartition; document text appears nowhere.",
        ),
        (
            "phrase_from_index (positional serving)",
            SE.phrase_from_index(
                SE.positional_index(flat, cap=1024), "dup vector", k=20
            ),
            "phrase hits counted from executor-side exploded "
            "token-position maps — corpus text appears nowhere; the "
            "token fetch is a point lookup (pushed when the index is "
            "parquet, as the bm25 probe above shows).",
        ),
        (
            "hard_negatives (mining from the serving index)",
            SE.hard_negatives(
                spark.read.parquet(f"{idx_dir}/postings"),
                spark.read.parquet(f"{idx_dir}/norms"),
                spark.createDataFrame(
                    [(1, "dup graft"), (2, "vector spark")],
                    "query_id long, query string",
                ),
                SE.and_matches(
                    flat,
                    spark.createDataFrame(
                        [(1, "dup graft"), (2, "vector spark")],
                        "query_id long, query string",
                    ),
                ),
            ),
            "rides the bm25_serve_batch plan; the positives side is a "
            "zero-shuffle corpus scan with the query batch broadcast "
            "(intra-row containment), anti-joined against the depth-"
            "bounded candidate relation.",
        ),
        (
            "ann_from_index (vector point serving)",
            sim.ann_from_index(embindex, qv, exclude_ids=(3,)),
            "the query's 10 (table, bucket) probe keys are a pushed "
            "OR-of-conjunctions filter on the index parquet scan; zero "
            "ArrowEvalPython (no banding at query time), zero corpus "
            "touch; the only 'shuffle' is the ≤k-row ordered take.",
        ),
        (
            "ann_serve_batch (batched vector serving)",
            sim.ann_serve_batch(
                embindex,
                emb_t.where(F.col("vec_id").isin([0, 1])).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                dim=dim,
            ),
            "exactly ONE ArrowEvalPython node (the query batch's banding); "
            "the banded queries broadcast into the bucket join so the "
            "index side never shuffles; per-query top-k window.",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.datagen import ensure_html
    from graphical_context_extraction_pipeline_spark.operators import (
        html_extract as HT,
        layout as LY,
        linkgraph as LG,
        multimodal as MM,
        text_analysis as TA,
        urls as UR,
    )

    pages = spark.read.parquet(ensure_html("/root/testdata/sf0.01"))
    entries += [
        (
            "html main_content (DOM heuristics)",
            HT.main_content(pages),
            "block segmentation + classification as regex/HOF expressions — "
            "scan → project, zero Exchange, zero Python nodes.",
        ),
        (
            "url_dedup (canonical collapse)",
            UR.url_dedup(pages),
            "only the narrow (canonical_url, doc_id) projection shuffles; the "
            "page html never enters the exchange (ReadSchema excludes it).",
        ),
        (
            "link_edges (domain graph extraction)",
            LG.extract_links(pages),
            "hrefs exploded and resolved pre-shuffle; ONE exchange carries "
            "(src, dst) pairs into the edge rollup.",
        ),
        (
            "layout reading_order (positional segments)",
            LY.reading_order(docs),
            "intra-row sort + O(n) positional frame segmentation — zero "
            "Exchange; scan prunes to spans + span_attrs.bbox only.",
        ),
        (
            "mm_sequence (interleaved training sequence)",
            MM.mm_sequence(docs),
            "W7 stable order + placeholder substitution + counters, all "
            "intra-row — zero Exchange, spans-only ReadSchema.",
        ),
        (
            "top_terms (integer TF-IDF top-k)",
            TA.top_terms(flat),
            "per-doc (term, tf) from intra-row run segments (no first "
            "groupBy); document frequency + bounded per-doc top-k are the "
            "only exchanges — no window over the corpus.",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.operators import (
        corpus as CO,
        sampling as SA,
    )

    entries += [
        (
            "hll_distinct (mergeable cardinality sketch)",
            CO.hll_distinct(flat),
            "two partial-aggregated groupBys: registers collapse map-side "
            "(max is idempotent — the exchange carries ≤ groups·m rows per "
            "map partition), then the per-group estimate over ≤ m rows; "
            "ReadSchema prunes to (source, text).",
        ),
        (
            "cms_counts (count-min matrix)",
            CO.cms_counts(flat),
            "one partial-aggregated groupBy of (row, pos) int pairs — the "
            "exchange is bounded by d·w per map partition regardless of "
            "token volume.",
        ),
        (
            "dedup_incremental_bloom (broadcast-gated anti-join)",
            dedup.dedup_incremental_bloom(
                flat.where(F.col("doc_id") % 7 == 0), flat, m_bits=4096
            ),
            "the bloom bit set is an explicit BroadcastExchange; the batch "
            "side classifies locally and only the maybe-seen fraction "
            "reaches the exact anti-join against the seen key index.",
        ),
        (
            "sample_k (two-phase distributed bottom-k)",
            SA.sample_k(flat, k=5),
            "partition-local bottom-k first (window keyed by "
            "(source, partition) — parallel, no per-source funnel), global "
            "rank over the ≤ k·n_parts survivors; only (doc_id, priority) "
            "ever shuffles.",
        ),
        (
            "unigram_surprisal (integer-log2 LM score)",
            TA.unigram_surprisal(flat),
            "token model + scoring join + per-doc rollup — exchanges carry "
            "(doc_id, token) pairs and the (token, count) model; raw text "
            "never shuffles; corpus total rides a 1-row broadcast.",
        ),
        (
            "anchor_texts (incoming anchor profile)",
            LG.anchor_texts(pages),
            "anchor extraction is scan → project → explode (no exchange); "
            "the rollup and the per-domain top-k window both run over "
            "aggregated short strings.",
        ),
        (
            "domain_quality (composed verdict table)",
            LG.domain_quality(pages),
            "every join input is a domain-granular rollup orders of "
            "magnitude below page count; PageRank's lineage is truncated "
            "per round (checkpoint scans below).",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.operators import search as SE

    entries += [
        (
            "bm25 (integer keyword retrieval)",
            SE.bm25(flat, "dup vector spark"),
            "the scoring pass: scan → single-evaluation token projection → "
            "TakeOrderedAndProject — ZERO Exchange, no global sort; corpus "
            "statistics were collected as scalars in a separate "
            "partial-agg pass and appear here as literal constants.",
        ),
        (
            "inverted_index (hot-capped posting lists)",
            SE.inverted_index(flat),
            "document frequencies first (pure partial agg), then the hot "
            "token set — a few rows — broadcast into a left-anti gate so "
            "no collect_list buffer can exceed the cap; stopwords keep "
            "stats but never enter the posting shuffle.",
        ),
        (
            "robots_filter (broadcast rule arrays)",
            UR.robots_filter(pages),
            "per-host rule arrays broadcast; the page stream resolves REP "
            "longest-prefix precedence intra-row — scan → broadcast-join → "
            "project, zero page-side Exchange.",
        ),
        (
            "recrawl_priority (snapshot change rates)",
            UR.recrawl_priority(pages, pages),
            "html reduces to md5 signatures inside each snapshot scan; the "
            "full-outer join and domain rollup shuffle only "
            "(canonical_url, 32-byte sig) pairs.",
        ),
        (
            "crawl_budget (largest-remainder apportionment)",
            UR.crawl_budget(
                UR.domain_stats(pages).select("domain", F.col("n_pages").alias("weight")),
                budget=1000,
            ),
            "global remainder ranks via partitioning.global_rank: "
            "range-partitioned sort + parallel per-partition row numbers + "
            "broadcast offsets — NO single-partition window anywhere.",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.operators import (
        curate as CU,
        linkgraph as LG,
        similarity as SIM,
        text_analysis as TA,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    edges = LG.extract_links(pages)
    entries += [
        (
            "ann_topk_quantized (int8 Arrow kernel)",
            SIM.ann_topk_quantized(emb, list(range(10))),
            "round-5 fix of the interpreted-HOF trap: ONE MapInPandas scan "
            "quantizes each batch and scores every query via a single int64 "
            "matmul (queries ride the closure — no join, no broadcast "
            "exchange); the batch pre-reduces to ≤ k·|Q| rows under the "
            "final (dot_q desc, vec_id asc) order, so the top-k window's "
            "exchange is corpus-size-independent.",
        ),
        (
            "semantic_packing (cluster-aware first-fit)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.sampling",
                fromlist=["sampling"],
            ).semantic_packing(flat, emb, budget=512, n_centroids=16),
            "codebook rides as literals into the assignment scan; one "
            "doc_id equi-join attaches cids, then the first-fit fold is a "
            "grouped map keyed on cid — group count = n_centroids ∝ √N, "
            "never corpus-sized.",
        ),
        (
            "curated_mixture (ladder → exactly-k mixture)",
            CU.curated_mixture(flat, k=100, stopwords=["the", "be", "join", "hash"]),
            "zero-shuffle gopher/classifier rungs + ONE dup-key groupBy + "
            "one semi-join feed the Hamilton/PPS mixture; quota math runs "
            "over per-source totals (a handful of rows), never a global "
            "sort of the corpus.",
        ),
        (
            "spam_mass (TrustRank residual)",
            LG.spam_mass(edges, ("example.com", "wiki.example.net")),
            "two e9 fixed-point PageRank recurrences over the domain-graph "
            "rollup (domains ≪ pages); per-round lineage truncated via "
            "localCheckpoint, trust seeds as a broadcast literal set.",
        ),
        (
            "kcore (iterative degeneracy peel)",
            LG.kcore(edges, k=2),
            "each peel round aggregates degrees on the domain rollup and "
            "anti-joins the removed set — all exchanges carry (domain, "
            "degree) pairs; rounds bounded by the k-core peel depth, "
            "lineage checkpoint-truncated.",
        ),
        (
            "vocab_growth (Heaps-law curve)",
            TA.vocab_growth(flat),
            "tokens carry their first-occurrence doc bucket through ONE "
            "min-aggregate, then the cumulative curve runs over ≤ n_buckets "
            "rows — the heavy exchange is (token, min_bucket), text never "
            "shuffles.",
        ),
        (
            "random_walks (md5-bucket DeepWalk)",
            LG.random_walks(edges, length=4),
            "RNG-free next-hop: md5 bucket over sorted neighbor arrays "
            "broadcast per step; `length` self-joins on the frontier, each "
            "carrying (start, cur) pairs only — retry/engine-stable, no "
            "per-row Python.",
        ),
        (
            "kneser_ney_bigrams (two-stage e9 chain)",
            TA.kneser_ney_bigrams(flat),
            "bigram + continuation counts are partial-aggregated groupBys "
            "over (w1, w2) pairs; the interpolated KN score composes as a "
            "TWO-STAGE integer e9 chain (single rational would overflow "
            "int64 at corpus-scale continuation counts).",
        ),
        (
            "span_corruption (T5 masking kernel)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.sampling",
                fromlist=["sampling"],
            ).span_corruption(flat),
            "ONE mapInPandas pass (the expression build needs an O(n²) "
            "interpreted prefix rank — the fold trap); zero Exchange: "
            "masking is per-document, so the plan is scan → kernel → "
            "project.",
        ),
        (
            "ppmi_matrix (bit-length log2 PMI)",
            TA.ppmi_matrix(flat, window=3),
            "co-occurrence rollup (vocabulary²-bounded) + two marginal "
            "rollups + a 1-row total broadcast; PMI is integer bit-length "
            "arithmetic — no libm, no floats, exchanges all "
            "vocabulary-bounded.",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.operators import (
        dedup as DD,
        multimodal as MMOD,
    )

    spans_full = spark.read.parquet(
        os.path.join(REPO, "data", "sf0.01", "documents_spans.parquet")
    )
    spans_small = spans_full.select("doc_id", "spans")
    entries += [
        (
            "exact_substring_runs (Lee et al. ExactSubstr)",
            DD.exact_substring_runs(flat),
            "corpus-linear: positional window explode → total-occurrence "
            "count (map-side partial) → one semi-join back → intra-row "
            "gaps-and-islands merge. NO pair expansion at any fan-in — a "
            "window occurring k times contributes k covered rows where the "
            "pair family is quadratic per bucket.",
        ),
        (
            "media_ref_pairs (media-axis ref-set Jaccard)",
            MMOD.media_ref_pairs(spans_small),
            "each doc's distinct frame-ref set is built intra-row (zero "
            "shuffle) and hashed to 64-bit keys; the shared "
            "_set_jaccard_pairs blocking caps hot assets (site logos) and "
            "routes identical all-hot sets to a hub star — every "
            "aggregation buffer bounded, shuffles carry 8-byte keys.",
        ),
        (
            "moore_lewis_select (cross-entropy-difference selection)",
            TA.moore_lewis_select(
                flat,
                flat.where(F.col("source").isin("src0", "src1")),
                max_diff_e2=0,
            ),
            "two kn_doc_surprisal passes: each model is three partial-agg "
            "groupBys over LM bigrams (AQE broadcasts the tiny in-domain "
            "model — the Moore-Lewis regime); scoring joins key on "
            "w1/w2 hashes, the backoff CASE is branch-free integer "
            "arithmetic in codegen, and the final contrast joins on "
            "doc_id only. Text never enters a shuffle.",
        ),
        (
            "ngram_novelty (ingest-order novelty share)",
            DD.ngram_novelty(flat),
            "shingles shuffle as 62-bit packed hashes; first-owner is one "
            "map-side partial min per hash (hot n-grams cost one bounded "
            "row each — no bucket expansion, so no hot-cap needed); the "
            "attribution join keys on the 8-byte hash and the per-doc "
            "rollup rides partial aggregation.",
        ),
    ]

    from graphical_context_extraction_pipeline_spark.operators import sampling as SAM

    entries += [
        (
            "unimax_budgets (epoch-capped water-filling)",
            SAM.unimax_budgets(flat),
            "the returned relation is a LocalTableScan (0 exchanges) because "
            "the per-source totals are reduced by ONE eager partial-agg "
            "groupBy (mixture-scale, the same bounded collect as "
            "quota_mixture's Hamilton fold) and the water-filling loop is "
            "O(n_sources) driver arithmetic — document rows never leave the "
            "executors and text never keys a shuffle.",
        ),
        (
            "interleave_stats (per-doc text|media profile)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.multimodal",
                fromlist=["multimodal"],
            ).interleave_stats(spans_small),
            "scan → project, ZERO exchanges: the (offset, kind) sort, class "
            "sequence, run detection (segments primitive — no accumulating "
            "fold) and every statistic are intra-row expressions over each "
            "doc's own spans; the MMC4/OBELICS gate and funnel compose on "
            "top without adding a shuffle.",
        ),
        (
            "kind_transitions (corpus transition matrix)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.multimodal",
                fromlist=["multimodal"],
            ).kind_transitions(spans_small),
            "pair construction is intra-row (consecutive_pairs — zero "
            "shuffle before the explode); ONE explode feeds ONE "
            "kinds²-bounded (≤25-group) partial-agg groupBy.",
        ),
        (
            "mm_curate (gate → media-asset closure → statuses)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.multimodal",
                fromlist=["multimodal"],
            ).mm_curate(spans_small),
            "the gate keep decision is computed ON the spans row (shared "
            "_profile_expr, CASE-guarded against filter-merge — no stats "
            "self-join); pairs ride media_ref_pairs' hot-capped blocking, "
            "the closure is the O(log n) star default, and the only "
            "doc_id-keyed join is the final left join against the "
            "clustered-docs-only membership relation.",
        ),
        (
            "mm_pack (interleaved first-fit packing)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.multimodal",
                fromlist=["multimodal"],
            ).mm_pack(spans_small),
            "mm_sequence's shuffle-free scan computes the text+64/image "
            "cost; ONE bucket-keyed exchange feeds the shared Arrow "
            "grouped-map first-fit fold (inherently sequential "
            "reset-on-overflow cumsum) — text never enters the shuffle, "
            "only (doc_id, bucket, cost).",
        ),
        (
            "caption_ocr_agreement (CLIP-filter stand-in)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.multimodal",
                fromlist=["multimodal"],
            ).caption_ocr_agreement(spans_small),
            "scan → project → Generate, ZERO exchanges: caption mining and "
            "the per-frame OCR token set are intra-row expressions over "
            "each doc's own spans; the Jaccard is pure integer arithmetic "
            "on distinct token arrays.",
        ),
        (
            "asr_quality (speech-rate + word-confidence gate)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.relational",
                fromlist=["relational"],
            ).asr_quality(spans_full),
            "per-segment stats are intra-row list expressions on the "
            "zipped scan (span_attrs pruned to end_ms/words); ONE "
            "doc_id-keyed partial-agg groupBy builds the rollup — no "
            "window, no second shuffle.",
        ),
        (
            "media_admit (LAION-shape metadata admit gate)",
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.media",
                fromlist=["media"],
            ).media_admit(
                __import__(
                    "graphical_context_extraction_pipeline_spark.operators.media",
                    fromlist=["media"],
                ).extract_media_features(
                    __import__(
                        "graphical_context_extraction_pipeline_spark.operators.media",
                        fromlist=["media"],
                    ).synthesize_media(spans_full)
                )
            ),
            "zero-shuffle projection over the feature stage: every rule is "
            "integer arithmetic on the row (aspect by cross-multiplication); "
            "the one exchange is extract_media_features' explicit row-count "
            "repartition feeding the decode kernel.",
        ),
        (
            "text_cosine_topk (hash-embed → exact top-k)",
            SIM.cosine_topk(SIM.embed_text_hash(flat, 64), [0, 101, 202, 303, 404]),
            "the hashing-trick vectorizer fuses into each side's scan (one "
            "MapInPandas per side — the query side is |Q| rows under a "
            "broadcast, the corpus side is scanned exactly once, no "
            "barrier between embed and score); WindowGroupLimit(Partial) "
            "prunes to ≤ k rows per partition per query BEFORE the single "
            "exchange feeding the top-k window.",
        ),
    ]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write(
            "# Physical plans of the headline queries (sf0.01, local[8])\n\n"
            "Generated by `python scripts/dump_plans.py`. The claims annotated\n"
            "here are asserted mechanically by `tests/test_plan_properties.py`.\n"
        )
        for name, df, note in entries:
            n_ex = count_exchanges(df)
            f.write(f"\n## {name}\n\n{note}\n\nShuffle Exchanges: **{n_ex}**\n\n")
            plan = formatted_plan(df)
            # keep the readable operator tree + scan details, not codegen ids
            f.write("```\n" + plan.strip()[:6000] + "\n```\n")
    print("wrote BENCH/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
