"""Bucketed table layout: Iceberg-style hidden partitioning over parquet.

The north rule targets Iceberg tables of interleaved documents with
"partitioning handled explicitly". The Iceberg jars are not in this image
(pipeline.py's write-audit already stands in for snapshot commits), so
this module implements the LAYOUT half of the contract directly on the
parquet source Spark ships with:

- :func:`write_bucketed` — documents land in ``bucket=<k>/`` directory
  partitions, where k = a *portable* hash of doc_id mod n_buckets (crc32,
  computable in any engine/language — the moral equivalent of Iceberg's
  ``bucket(N, doc_id)`` hidden-partition transform). The bucket column is
  DERIVED, never stored in the data files: readers that don't filter see
  the plain document schema.
- :func:`read_bucket` / :func:`scan_for_doc` — point and batch lookups
  that push the bucket predicate into PARTITION PRUNING: Spark's scan
  lists only the matching ``bucket=`` directories (`PartitionFilters` in
  the plan; asserted by tests/test_plan_properties.py). At 10^12 docs a
  doc_id-keyed lookup touches 1/n_buckets of the corpus — file-level
  pruning with zero index infrastructure.

Co-location: two tables written with the same n_buckets join bucket-wise —
joining per-bucket inputs avoids the all-to-all shuffle (demonstrated by
test_tables_layout.py joining a bucket to itself). That is the parquet
stand-in for Iceberg's storage-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def bucket_expr(doc_id_col, n_buckets: int = DEFAULT_BUCKETS):
    """Portable bucket id: crc32(doc_id as string) % n_buckets — stable
    across engines, languages and Spark versions (unlike hash(), whose
    seed/algorithm is an implementation detail)."""
    return F.crc32(doc_id_col.cast("string").cast("binary")) % n_buckets


def write_bucketed(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    doc_id_col: str = "doc_id",
) -> None:
    """Write ``docs`` under ``path`` with bucket=<k> directory partitions.
    One file per bucket-partition task; the derived bucket column lives
    only in directory names (partitionBy drops it from the data files)."""
    (
        docs.withColumn("bucket", bucket_expr(F.col(doc_id_col), n_buckets))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_bucket(spark: SparkSession, path: str, bucket: int) -> DataFrame:
    """All rows of one bucket — the filter is a partition predicate, so the
    scan lists exactly one ``bucket=`` directory."""
    return spark.read.parquet(path).where(F.col("bucket") == bucket).drop("bucket")


def scan_for_doc(
    spark: SparkSession,
    path: str,
    doc_id,
    n_buckets: int = DEFAULT_BUCKETS,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Point lookup: recompute the doc's bucket DRIVER-SIDE (same portable
    hash), prune to that directory, then filter rows. Reads 1/n_buckets of
    the table instead of all of it."""
    import zlib

    b = zlib.crc32(str(doc_id).encode()) % n_buckets
    return (
        spark.read.parquet(path)
        .where((F.col("bucket") == b) & (F.col(doc_id_col) == doc_id))
        .drop("bucket")
    )
