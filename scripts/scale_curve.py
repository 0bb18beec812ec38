"""Scale-curve evidence for the shuffle-heavy dedup/curation family
(round-3 judge ask #4): run the exact registered queries at 500 docs
(sf0.01), 5000 docs (sf0.1) and a deterministic 50000-doc 10× synthesis
of sf0.1, and report the wall-clock growth exponent per decade.

The 10× tier is sf0.1 replicated 10× with disjoint doc_id ranges and a
per-copy tail token (the _tailed_docs pattern) so copies are neither
exact nor near duplicates of each other — the same text distribution at
10× the row count, no external data. A near-linear curve here is the
demonstrated version of the "would this survive 100×?" argument the
plan reads alone can't make: these are exactly the queries whose joins
and closures shuffle.

Usage: python scripts/scale_curve.py [--repeats 2]
Writes BENCH/SCALE_CURVE.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "neardup_survivors",
    "web_curate",
    # round-4 session-5 shuffle-heavy additions: pair-stream explode +
    # vocab² rollup, fingerprint blocking, chunk-hash rollup
    "cooccurrence_counts",
    "winnow_pairs",
    "cdc_dedup_stats",
]
SCALE_DIR = "/root/repo/data/scale10x"


def ensure_scale10x(spark) -> str:
    """50000-doc tier: 10 tail-tagged copies of sf0.1, ids offset by
    1e6 per copy (deterministic, idempotent)."""
    from pyspark.sql import functions as F

    out = os.path.join(SCALE_DIR, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return SCALE_DIR
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    copies = None
    for k in range(10):
        c = base.select(
            (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{k}")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + len(f" copytag{k}")).alias("n_chars"),
        )
        copies = c if copies is None else copies.unionByName(c)
    copies.repartition(32).write.mode("overwrite").parquet(out)
    return SCALE_DIR


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from graphical_context_extraction_pipeline_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    tiers = [
        ("sf0.01", "/root/testdata/sf0.01", 500),
        ("sf0.1", "/root/testdata/sf0.1", 5000),
        ("scale10x", ensure_scale10x(spark), 50000),
    ]
    qs = entry.queries()
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for tag, d, _n in tiers:
        for q in QUERIES:
            best = math.inf
            for _ in range(args.repeats):
                t0 = time.time()
                qs[q](spark, d).count()
                best = min(best, time.time() - t0)
            results[q][tag] = best
            print(f"{tag:9s} {q:22s} {best:7.2f} s", flush=True)

    lines = [
        "# Scale curve: shuffle-heavy dedup/curation family",
        "",
        "Same registered queries, three corpus tiers (500 / 5000 / 50000 docs —",
        "sf0.01, sf0.1, and a deterministic 10× replication of sf0.1, see",
        "scripts/scale_curve.py). Exponent = log10(wall ratio) per decade of",
        "data; 1.0 = linear scaling, <1 amortized fixed cost.",
        "",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], best of {args.repeats} runs per cell.",
        "",
        "| query | 500 (s) | 5000 (s) | 50000 (s) | exp 500→5k | exp 5k→50k |",
        "|---|---|---|---|---|---|",
    ]
    for q in QUERIES:
        r = results[q]
        e1 = math.log10(r["sf0.1"] / r["sf0.01"])
        e2 = math.log10(r["scale10x"] / r["sf0.1"])
        lines.append(
            f"| {q} | {r['sf0.01']:.2f} | {r['sf0.1']:.2f} | {r['scale10x']:.2f} "
            f"| {e1:.2f} | {e2:.2f} |"
        )
    lines.append("")
    with open("/root/repo/BENCH/SCALE_CURVE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/SCALE_CURVE.md")


if __name__ == "__main__":
    main()
