#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline.

    spark-submit --master local[8] \\
        --py-files gcep_spark_pkg.zip \\
        scripts/submit_extract.py <input_parquet> <output_dir>

The package zip is built by scripts/build_pyfiles.py; on a real cluster the
same command line with --master yarn/k8s and N or 4N executors is the
deployment story the north rule requires. This script deliberately does NOT
import anything before SparkSession is up, and resolves the package from
the --py-files distribution (not a repo checkout)."""

import sys

from pyspark.sql import SparkSession


def main() -> None:
    input_path, output_dir = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.appName("gcep-extract-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .getOrCreate()
    )
    # package arrives via --py-files; import AFTER session start
    from graphical_context_extraction_pipeline_spark.pipeline import ExtractionPipeline

    docs = spark.read.parquet(input_path)
    pipe = ExtractionPipeline(spark, output_dir)
    chunks = pipe.run(docs)
    n = 0 if chunks is None else chunks.count()
    print(f"SUBMIT_OK chunks={n} runs={len(pipe.committed_runs())}")
    spark.stop()


if __name__ == "__main__":
    main()
