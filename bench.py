#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline query suite on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

--scaling: additionally runs the extraction job at two parallelism levels
(core-pinned local[1] vs local[4] — the sandbox stand-in for N vs 4N
executors), reports throughput at both plus scaling efficiency
= (thr_4N / thr_N) / 4, and writes BENCH/BASELINE.md.

--cpus N --extract-only: subprocess mode used by --scaling (fresh JVM per
parallelism level so executor-thread counts are honest).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _setup(cpus: int, sf_dir: str):
    from graphical_context_extraction_pipeline_spark.datagen import (
        ensure_documents,
        sf_tag_from_dir,
    )
    from graphical_context_extraction_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"bench-local{cpus}", cpus=cpus)
    tag = sf_tag_from_dir(sf_dir)
    spans_path = ensure_documents(spark, tag, base_dir=os.path.join(REPO, "data"))
    docs = spark.read.parquet(spans_path)
    return spark, docs, tag


def _parts(cpus: int, n_docs: int) -> int:
    """Partition count for the bench corpus: bounded docs-per-partition,
    clamped to [cpus, cpus*4]. One wave (parts = cpus) is right when tasks
    are chunky (32 cores / 2000 docs: 872 -> 1223 docs/sec vs cpus*4), but
    at LOW core counts one wave gives the scheduler zero slack — any
    cost-model imbalance sets the wall directly (measured at pinned 4
    cores: 4 parts 159 docs/s, 8 parts 278, 16 parts 345). ~125 docs per
    partition keeps tasks chunky AND leaves rebalancing room. A single
    core has no imbalance to rebalance — extra partitions are pure task
    overhead there, so parts = 1 stays 1."""
    if cpus == 1:
        return 1
    return min(cpus * 4, max(cpus, n_docs // 125))


def run_extract(cpus: int, sf_dir: str, iters: int = 5, replicate: int = 1) -> dict:
    """Extraction throughput at one parallelism level (docs/sec, best-of-N —
    min wall filters external tenant noise, which only ever slows a run).

    replicate > 1 unions R id-suffixed copies of the corpus so the measured
    job is R× larger: per-job fixed costs (planning, scheduling rounds,
    result collection) stop dominating the parallel levels, which is the
    regime the north rule's cluster-size criterion describes — a 100 TB job
    is all steady state, not job setup."""
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents

    spark, docs, _tag = _setup(cpus, sf_dir)
    if replicate > 1:
        copies = [
            docs.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit(f"#r{i}")))
            for i in range(replicate)
        ]
        base = copies[0]
        for c in copies[1:]:
            base = base.unionAll(c)
        docs = base
        iters = min(iters, 3)
    # cost-balanced partitioning (operators/partitioning.py): the local test
    # corpus is a couple dozen MB so file splits alone give too few
    # partitions, and 10x media-heavy skew docs would straggle a plain
    # round-robin split
    from graphical_context_extraction_pipeline_spark.operators.partitioning import balance_by_cost

    n_docs = docs.count()
    docs = balance_by_cost(docs, _parts(cpus, n_docs)).cache()
    n_docs = docs.count()
    extract_documents(docs.limit(256)).count()  # JIT/codegen + worker warmup
    extract_documents(docs.limit(256)).count()
    best = None
    n_chunks = 0
    for _ in range(iters):
        t0 = time.time()
        n_chunks = extract_documents(docs).count()
        w = time.time() - t0
        best = w if best is None or w < best else best
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "wall_s": round(best, 3),
        "docs_per_sec": round(n_docs / best, 2),
    }


def run_suite(cpus: int, sf_dir: str) -> dict:
    from graphical_context_extraction_pipeline_spark.operators import (
        boilerplate as BP,
        cluster as CL,
        corpus as CO,
        dedup,
        curate as CU2,
        html_extract as HT,
        layout as LY,
        linkgraph as LG,
        multimodal as MM,
        relational as R,
        sampling as SA,
        search as SE,
        similarity,
        text_analysis as TA,
        urls as UR,
        validate as V,
    )
    from graphical_context_extraction_pipeline_spark.datagen import ensure_html
    from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents

    spark, docs, tag = _setup(cpus, sf_dir)
    from graphical_context_extraction_pipeline_spark.operators.partitioning import balance_by_cost

    n_docs = docs.count()
    docs = balance_by_cost(docs, _parts(cpus, n_docs)).cache()
    n_docs = docs.count()
    flat = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pages = spark.read.parquet(ensure_html(sf_dir))

    extract_documents(docs.limit(64)).count()  # warmup

    # standing serving structures for the index-backed lines: built once
    # (build cost is its own line, "inverted_index"), read back from
    # parquet so the timed call is the true serving shape — pushed-filter
    # point lookups, never a corpus text scan
    from pyspark.sql import functions as _F

    idx_root = os.path.join(REPO, "data", tag, "bench_index")
    SE.inverted_index(flat, cap=1024).write.mode("overwrite").parquet(
        os.path.join(idx_root, "postings")
    )
    SE.doc_norms(flat).write.mode("overwrite").parquet(os.path.join(idx_root, "norms"))
    idx_df = spark.read.parquet(os.path.join(idx_root, "postings"))
    norms_df = spark.read.parquet(os.path.join(idx_root, "norms"))
    # corpus stats cached at index-build time — the deployed serving form
    # (SERVING_CURVE.md); computing them per query would re-touch norms
    _sr = norms_df.agg(
        _F.count(_F.lit(1)).alias("nd"), _F.sum("dl").alias("tt")
    ).first()
    norms_stats = (int(_sr["nd"]), int(_sr["tt"]))
    similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        similarity._embedding_dim(emb),
    ).write.mode("overwrite").parquet(os.path.join(idx_root, "embindex"))
    embindex_df = spark.read.parquet(os.path.join(idx_root, "embindex"))
    bench_qv = list(emb.where(_F.col("vec_id") == 3).first()["embedding"])
    emb_batch = emb.where(_F.col("vec_id") % 40 == 1).select(
        (_F.col("vec_id") + 600000).alias("vec_id"),
        _F.transform("embedding", lambda x: x + _F.lit(0.02).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    hn_queries = spark.createDataFrame(
        [(1, "dup vector spark"), (2, "dup graft"), (3, "vector pipeline")],
        "query_id long, query string",
    )

    suite = {
        "extract": lambda: extract_documents(docs).count(),
        "chrome_tokens": lambda: R.chrome_tokens(docs).count(),
        "timeline_interleave": lambda: R.timeline_interleave(docs).count(),
        "chunk_segmentation": lambda: R.chunk_segmentation(docs).count(),
        "coverage_windows": lambda: V.coverage(docs).count(),
        "keyframe_gaps": lambda: V.keyframe_gaps(docs).count(),
        "sliding_windows": lambda: R.sliding_window_chunks(docs).count(),
        "boilerplate_strip": lambda: BP.strip_boilerplate(docs).count(),
        "dedup_exact": lambda: dedup.exact_duplicates(flat).count(),
        "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(flat).count(),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(flat).count(),
        "simhash": lambda: dedup.simhash(flat).count(),
        "token_stats": lambda: TA.token_stats(flat).count(),
        "lang_id": lambda: TA.lang_id(flat).count(),
        "cosine_topk": lambda: similarity.cosine_topk(emb, list(range(10))).count(),
        # round 3 additions: transitive near-dup closure over the ngram
        # pair edges (iterative components + one corpus join) and the
        # per-doc ValidationReport rollup (spans intra-row + chunk join)
        "neardup_survivors": lambda: CL.neardup_survivors(
            flat, dedup.ngram_jaccard_pairs(flat)
        ).count(),
        "validation_report": lambda: V.validation_report(docs, extract_documents(docs)).count(),
        # round 3: word-level span re-emission (zero-shuffle double explode)
        "word_spans": lambda: R.word_spans(docs).count(),
        # round 3: batch-prep family — intra-row repetition signals
        # (zero shuffle) and first-fit sequence packing (one bucket shuffle
        # + grouped-map fold)
        "repetition_stats": lambda: TA.repetition_stats(flat).count(),
        "pack_sequences": lambda: SA.pack_sequences(flat, budget=512, n_buckets=cpus * 2).count(),
        # round 3: north-rule DOM heuristics (regex block classification over
        # the HTML twin corpus) and PDF/layout paragraph grouping (intra-row
        # geometry folds) — 2 more lines, suite total grows by construction
        "html_main_content": lambda: HT.main_content(pages).count(),
        "layout_paragraphs": lambda: LY.paragraphs(docs).count(),
        "url_dedup": lambda: UR.url_dedup(pages).count(),
        "link_edges": lambda: LG.extract_links(pages).count(),
        "mm_sequence": lambda: MM.mm_sequence(docs).count(),
        # round 3 session 5: mergeable cardinality sketch (two partial
        # aggs) and incoming anchor-text profiles — suite grows by
        # construction again
        "hll_distinct": lambda: CO.hll_distinct(flat).count(),
        "anchor_texts": lambda: LG.anchor_texts(pages).count(),
        # round 3 session 6: lexical retrieval (two scans, zero shuffles)
        # and the hot-capped posting index — suite grows by construction
        "bm25_search": lambda: SE.bm25(flat, "dup vector spark").count(),
        "inverted_index": lambda: SE.inverted_index(flat).count(),
        # round 4: index-backed serving (point lookups into the standing
        # parquet index + norms — no corpus text scan; cap 1024 keeps
        # 'dup' selective at sf0.1 while true stopwords stay excluded)
        # and incremental embedding-index maintenance
        "bm25_from_index": lambda: SE.bm25_from_index(
            idx_df, norms_df, "dup vector spark", stats=norms_stats
        ).count(),
        "embedding_incremental": lambda: similarity.embedding_incremental_pairs(
            emb_batch, emb
        ).count(),
        # round 4: batched serving — 8 queries in ONE distributed job
        # from the same standing index (postings never visit the driver)
        "bm25_serve_batch": lambda: SE.bm25_serve_batch(
            idx_df,
            norms_df,
            spark.createDataFrame(
                [
                    (1, "dup vector spark"),
                    (2, "dup graft"),
                    (3, "vector pipeline"),
                    (4, "spark shuffle"),
                    (5, "dup spark"),
                    (6, "graft vector"),
                    (7, "pipeline dup"),
                    (8, "shuffle vector spark"),
                ],
                "query_id long, query string",
            ),
            stats=norms_stats,
        ).count(),
        # round 4: the CCNet quality pipeline end-to-end (bigram model →
        # per-source histogram cuts → md5-gated mixture)
        "ccnet_mixture": lambda: TA.ccnet_mixture(flat).count(),
        # round 4: vector serving from the standing banded index — 10
        # pushed (table, bucket) probes, exact-cosine re-rank, no corpus
        # scan and no banding job at query time
        "ann_from_index": lambda: similarity.ann_from_index(
            embindex_df, bench_qv, exclude_ids=(3,)
        ).count(),
        # round 4 session 3: subset-dup containment (ngram blocking reuse),
        # cross-source overlap matrix, domain-graph 2-core peel, exact-k
        # systematic PPS draw (distributed prefix sum, no global window)
        "containment_pairs": lambda: dedup.containment_pairs(flat).count(),
        "source_overlap": lambda: CO.source_overlap(flat).count(),
        "kcore": lambda: LG.kcore(LG.extract_links(pages), k=2).count(),
        "weighted_sample": lambda: SA.weighted_sample(flat, k=100).count(),
        # round 4 session 3 (continued): C4 sentence-span removal end
        # product, the composed mixture constructor, vocabulary shape
        "c4_span_dedup": lambda: dedup.c4_span_dedup(flat).count(),
        "quota_mixture": lambda: SA.quota_mixture(flat, k=100).count(),
        "vocab_growth": lambda: TA.vocab_growth(flat).count(),
        "ann_topk_quantized": lambda: similarity.ann_topk_quantized(
            emb, list(range(10))
        ).count(),
        "spam_mass": lambda: LG.spam_mass(
            LG.extract_links(pages), ("example.com", "wiki.example.net")
        ).count(),
        # round 4 session 5: hard-negative mining (serve-batch chain at
        # depth 20 + conjunctive-positive anti-join)
        "hard_negatives": lambda: SE.hard_negatives(
            idx_df,
            norms_df,
            hn_queries,
            SE.and_matches(flat, hn_queries),
            k=5,
            depth=20,
            stats=norms_stats,
        ).count(),
        # round 4 session 5: SemDeDup cluster-scoped keep-first (cid-keyed
        # self-join), D4 prototypicality prune (one window over cid), and
        # zero-shuffle hashed-classifier selection
        "semdedup": lambda: similarity.semdedup(emb, n_centroids=16).count(),
        "d4_prune": lambda: similarity.prototypicality_prune(emb, n_centroids=16).count(),
        # round 5: hashing-trick text vectorizer (zero-shuffle Arrow kernel)
        # and the end-to-end text semantic dedup it enables
        "text_embed_hash": lambda: similarity.embed_text_hash(flat, 64).count(),
        "text_semdedup": lambda: similarity.semdedup(
            similarity.embed_text_hash(flat, 64), n_centroids=16, tau_e4=9500
        ).count(),
        "classifier_select": lambda: TA.classifier_select(flat, 110_000).count(),
        # round 4 session 5: embedding-training prep trio — GloVe
        # co-occurrence rollup (pair explode + vocab² groupBy), tempered
        # negative-sampling PPS, deterministic DeepWalk corpus
        "cooccurrence_counts": lambda: TA.cooccurrence_counts(flat, window=3).count(),
        "negative_sampling": lambda: SA.negative_sampling(flat, k=500).count(),
        "random_walks": lambda: LG.random_walks(LG.extract_links(pages), length=4).count(),
        # round 4 session 5: margin-based bitext mining across the vec_id
        # parity split (banded candidates, integer ratio margins)
        # round 4 session 5: phrase serving from the positional index
        # (build + serve in one line)
        "phrase_from_index": lambda: SE.phrase_from_index(
            SE.positional_index(flat, cap=1024), "dup vector", k=20
        ).count(),
        "phrase_serve_batch": lambda: SE.phrase_serve_batch(
            SE.positional_index(flat, cap=1024),
            spark.createDataFrame(
                [(1, "dup vector"), (2, "vector spark"), (3, "graft dup")],
                "query_id long, phrase string",
            ),
            k=20,
        ).count(),
        # round 4 session 5: KN-smoothed bigram LM, T5 span corruption,
        # PPMI weighting
        "kneser_ney_bigrams": lambda: TA.kneser_ney_bigrams(flat).count(),
        "span_corruption": lambda: SA.span_corruption(flat).count(),
        "ppmi_matrix": lambda: TA.ppmi_matrix(flat).count(),
        # round 4 session 5: guaranteed-detection winnowing pairs and
        # content-defined chunk dedup profile
        "winnow_pairs": lambda: dedup.winnow_pairs(flat).count(),
        "cdc_dedup_stats": lambda: dedup.cdc_dedup_stats(flat).count(),
        # round 4 session 5: curate-then-mix end to end (the flagship
        # training-set constructor)
        "curated_mixture": lambda: CU2.curated_mixture(
            flat, k=100, stopwords=__import__("__spark_entry__")._GOPHER_GATE_STOPS
        ).count(),
        # round 4 session 5: the selection-ladder verdict table and
        # cluster-then-pack sequence construction
        "training_verdicts": lambda: CU2.training_verdicts(flat).count(),
        "semantic_packing": lambda: SA.semantic_packing(flat, emb, budget=512).count(),
        "bitext_mine": lambda: similarity.bitext_mine(
            emb.where(_F.col("vec_id") % 2 == 0),
            emb.where(_F.col("vec_id") % 2 == 1),
            k=4,
            min_margin_e6=1_300_000,
        ).count(),
        # round 5: ExactSubstr duplicated-run extraction (positional window
        # chain, corpus-linear, no pair expansion) and the media-axis
        # ref-set near-dup blocking over the interleaved spans corpus
        "exact_substring_runs": lambda: dedup.exact_substring_runs(flat).count(),
        "media_ref_pairs": lambda: MM.media_ref_pairs(docs).count(),
        # round 5: Moore-Lewis cross-entropy-difference selection — two
        # KN-LM scoring passes (target + general) and the contrastive gate
        "moore_lewis_select": lambda: TA.moore_lewis_select(
            flat, flat.where(_F.col("source").isin("src0", "src1")), max_diff_e2=0
        ).count(),
        # round 5: ingest-order n-gram novelty (one hash-min rollup + one
        # hash-keyed attribution join — hot-cap-free by construction)
        "ngram_novelty": lambda: dedup.ngram_novelty(flat).count(),
        # round 5: UniMax epoch-capped water-filling (one partial-agg
        # shuffle + O(n_sources) driver arithmetic)
        "unimax_budgets": lambda: SA.unimax_budgets(flat).count(),
        # round 5: MMC4/OBELICS interleave curation — shuffle-free per-doc
        # profile + gate, and the kinds²-bounded transition matrix
        "interleave_gate": lambda: MM.interleave_gate(docs).count(),
        "kind_transitions": lambda: MM.kind_transitions(docs).count(),
        # gate → media-asset near-dup closure → statuses, end to end
        "mm_curate": lambda: MM.mm_curate(docs).count(),
        # interleaved packing under the text+64/image cost model
        "mm_pack": lambda: MM.mm_pack(docs).count(),
        # CLIP-filter stand-in: caption↔OCR token agreement per frame
        "caption_ocr_agreement": lambda: MM.caption_ocr_agreement(docs).count(),
        # speech-rate + word-confidence ASR admit gate
        "asr_quality": lambda: R.asr_quality(docs).count(),
        # media decode throughput (row-count-repartitioned kernel) + the
        # LAION-shape metadata admit gate over the feature table
        "media_admit": lambda: __import__(
            "graphical_context_extraction_pipeline_spark.operators.media", fromlist=["media"]
        ).media_admit(
            __import__(
                "graphical_context_extraction_pipeline_spark.operators.media",
                fromlist=["media"],
            ).extract_media_features(
                __import__(
                    "graphical_context_extraction_pipeline_spark.operators.media",
                    fromlist=["media"],
                ).synthesize_media(docs)
            )
        ).count(),
    }
    timings: dict[str, float] = {}
    extract_wall = None
    for name, fn in suite.items():
        # best-of-3: this box is multi-tenant and external load only ever
        # slows a run; min is the faithful engine cost
        best = None
        for _ in range(3):
            t0 = time.time()
            fn()
            w = time.time() - t0
            best = w if best is None or w < best else best
        timings[name] = round(best, 3)
        if name == "extract":
            extract_wall = timings[name]
    spark.stop()
    return {
        "sf": tag,
        "cpus": cpus,
        "n_docs": n_docs,
        "queries": timings,
        "total_s": round(sum(timings.values()), 3),
        "docs_per_sec": round(n_docs / extract_wall, 2) if extract_wall else None,
    }


def write_baseline_md(lo: dict, hi: dict, efficiency: float, extra: list[dict]) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH baseline — extraction throughput & N→4N scaling efficiency\n\n"
            "Sandbox stand-in for cluster sizes N vs 4N (no real cluster here):\n"
            "the same extraction job on the same sf0.1 input at local[1] vs\n"
            "local[4], core-pinned via taskset so each level owns exactly its\n"
            "cores (like executor nodes do), interleaved rounds, best-of-runs\n"
            "walls (min filters multi-tenant host noise, which only slows).\n"
            "Levels are kept small because this box is shared: at local[16+]\n"
            "the measurement mixes in turbo-frequency asymmetry and external\n"
            "tenant load — supplementary points below show raw behaviour there.\n"
            "The job is shuffle-free (one mapInArrow over doc rows), so adding\n"
            "executors adds no coordination stage this emulation would miss.\n"
            "The pinned levels run a 5x id-suffix-replicated corpus so per-job\n"
            "fixed costs (planning, scheduling rounds) don't dominate the\n"
            "parallel level — the 100 TB regime the criterion describes is all\n"
            "steady state; supplementary points stay unreplicated.\n\n"
            "| level | cores | docs | chunks | best wall (s) | docs/sec |\n|---|---|---|---|---|---|\n"
            f"| N | {lo['cpus']} | {lo['n_docs']} | {lo['n_chunks']} | {lo['wall_s']} | {lo['docs_per_sec']} |\n"
            f"| 4N | {hi['cpus']} | {hi['n_docs']} | {hi['n_chunks']} | {hi['wall_s']} | {hi['docs_per_sec']} |\n\n"
            f"**Scaling efficiency (N→4N)** = ({hi['docs_per_sec']} / {lo['docs_per_sec']}) / 4 "
            f"= **{efficiency:.3f}** (target ≥ 0.8)\n\n"
            "Supplementary unpinned throughput points (shared-host caveats apply):\n\n"
            "| cores | docs/sec |\n|---|---|\n"
        )
        for lv in extra:
            f.write(f"| {lv['cpus']} | {lv['docs_per_sec']} |\n")
        f.write(
            "\nCompanion measurement: `BENCH/SCALING_MULTI_JVM.md` "
            "(scripts/scaling_run.py) emulates the two cluster sizes as separate\n"
            "pinned executor JVMs — 1×local[2] vs 4×local[2] on disjoint core sets\n"
            "processing crc32 shards of the same corpus concurrently.\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    # scaling WITHOUT the in-process suite first: running the 32-core suite
    # immediately before the pinned levels leaves the package power-throttled
    # (and the parent JVM holding its heap), deflating every child level —
    # measured 252 vs 920 docs/sec for the IDENTICAL 32-core subprocess in
    # suite-first vs fresh-box context
    ap.add_argument("--scaling-only", action="store_true")
    ap.add_argument("--replicate", type=int, default=1)
    args = ap.parse_args()

    if args.extract_only:
        print(json.dumps(run_extract(args.cpus, args.sf_dir, replicate=args.replicate)))
        return

    if args.scaling_only:
        out = {"metric": "scaling-only run", "value": None, "unit": "sec"}
    else:
        result = run_suite(args.cpus, args.sf_dir)
        out = {
            "metric": "headline suite wall seconds (extraction + dedup + similarity + analytics)",
            "value": result["total_s"],
            "unit": "sec",
            "queries": result["queries"],
            "sf": result["sf"],
            "cpus": result["cpus"],
            "docs_per_sec_extract": result["docs_per_sec"],
        }

    if args.scaling or args.scaling_only:
        def spawn(cpus: int, pin: str | None, replicate: int = 1):
            cmd = [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
                   "--sf-dir", args.sf_dir, "--extract-only",
                   "--replicate", str(replicate)]
            if pin:
                cmd = ["taskset", "-c", pin, *cmd]
            p = subprocess.run(cmd, capture_output=True, text=True, check=True)
            return json.loads(p.stdout.strip().splitlines()[-1])

        # primary: N=1 vs 4N=4 cores, pinned, interleaved rounds, best-of;
        # short cooldown between levels so one level's package heat doesn't
        # clock-throttle the next
        best: dict[int, dict] = {}
        for _round in range(3):
            for cpus, pin in ((1, "0"), (4, "0-3")):
                r = spawn(cpus, pin, replicate=5)
                if cpus not in best or r["wall_s"] < best[cpus]["wall_s"]:
                    best[cpus] = r
                time.sleep(10)
        eff = (best[4]["docs_per_sec"] / best[1]["docs_per_sec"]) / 4.0
        # supplementary unpinned points
        extra = [spawn(8, None), spawn(32, None)]
        out["scaling"] = {
            "n_level": best[1],
            "four_n_level": best[4],
            "efficiency_n_to_4n": round(eff, 3),
            "supplementary": extra,
        }
        write_baseline_md(best[1], best[4], eff, extra)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
