#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline query suite on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

--scaling: additionally runs the extraction job at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors), reports
throughput at both plus scaling efficiency = (T_N / T_4N) / 4, and writes
BENCH/BASELINE.md.

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


def run_extract(cpus: int, sf_dir: str) -> dict:
    """Extraction throughput at one parallelism level (docs/sec)."""
    from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents

    spark, docs, _tag = _setup(cpus, sf_dir)
    # round-robin repartition: the local test corpus is a couple dozen MB, so
    # file splits alone give too few partitions; on a real cluster the input
    # files/manifests provide this parallelism natively
    docs = docs.repartition(cpus * 4).cache()
    n_docs = docs.count()
    extract_documents(docs.limit(64)).count()  # JIT/codegen + worker warmup
    t0 = time.time()
    n_chunks = extract_documents(docs).count()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
    }


def run_suite(cpus: int, sf_dir: str) -> dict:
    from graphical_context_extraction_pipeline_spark.operators import (
        dedup,
        relational as R,
        similarity,
        text_analysis as TA,
        validate as V,
    )
    from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents

    spark, docs, tag = _setup(cpus, sf_dir)
    docs = docs.repartition(cpus * 4).cache()
    n_docs = docs.count()
    flat = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    extract_documents(docs.limit(64)).count()  # warmup

    suite = {
        "extract": lambda: extract_documents(docs).count(),
        "chrome_tokens": lambda: R.chrome_tokens(docs).count(),
        "timeline_interleave": lambda: R.timeline_interleave(docs).count(),
        "chunk_segmentation": lambda: R.chunk_segmentation(docs).count(),
        "coverage_windows": lambda: V.coverage(docs).count(),
        "keyframe_gaps": lambda: V.keyframe_gaps(docs).count(),
        "dedup_exact": lambda: dedup.exact_duplicates(flat).count(),
        "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(flat).count(),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(flat).count(),
        "simhash": lambda: dedup.simhash(flat).count(),
        "token_stats": lambda: TA.token_stats(flat).count(),
        "lang_id": lambda: TA.lang_id(flat).count(),
        "cosine_topk": lambda: similarity.cosine_topk(emb, list(range(10))).count(),
    }
    timings: dict[str, float] = {}
    extract_wall = None
    for name, fn in suite.items():
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
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


def write_baseline_md(levels: list[dict], efficiency: float) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lo, hi = levels[0], levels[1]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH baseline — extraction throughput & scaling efficiency\n\n"
            "Two-parallelism-level run (sandbox stand-in for N vs 4N executors;\n"
            "same input, fresh JVM per level, extraction job timed after warmup).\n\n"
            "| level | cpus | docs | chunks | wall (s) | docs/sec |\n|---|---|---|---|---|---|\n"
        )
        for lv in levels:
            f.write(
                f"| local[{lv['cpus']}] | {lv['cpus']} | {lv['n_docs']} | "
                f"{lv['n_chunks']} | {lv['wall_s']} | {lv['docs_per_sec']} |\n"
            )
        f.write(
            f"\n**Scaling efficiency (N→4N)** = (throughput_4N / throughput_N) / 4 = "
            f"(({hi['docs_per_sec']}) / ({lo['docs_per_sec']})) / 4 = **{efficiency:.3f}**"
            f" (target ≥ 0.8)\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.extract_only:
        print(json.dumps(run_extract(args.cpus, args.sf_dir)))
        return

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

    if args.scaling:
        levels = []
        for cpus in (8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
                 "--sf-dir", args.sf_dir, "--extract-only"],
                capture_output=True,
                text=True,
                check=True,
            )
            levels.append(json.loads(p.stdout.strip().splitlines()[-1]))
        eff = (levels[1]["docs_per_sec"] / levels[0]["docs_per_sec"]) / 4.0
        out["scaling"] = {
            "levels": levels,
            "efficiency_n_to_4n": round(eff, 3),
        }
        write_baseline_md(levels, eff)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
