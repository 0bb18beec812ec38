"""Bucketed table layout (sources/tables.py): portable bucket hash,
round-trip completeness, partition pruning reaching the scan."""

import os
import zlib

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.sources import tables as T


def _bucketed(spark, docs_path, tmp):
    docs = spark.read.parquet(docs_path)
    path = os.path.join(tmp, "bucketed")
    T.write_bucketed(docs, path, n_buckets=8)
    return docs, path


def test_roundtrip_and_directory_layout(spark, docs_path, tmp_path):
    docs, path = _bucketed(spark, docs_path, str(tmp_path))
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bucket="))
    assert 1 < len(dirs) <= 8
    # union of all buckets == the table, schema unchanged (no bucket col)
    back = spark.read.parquet(path).drop("bucket")
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_bucket_assignment_portable(spark, docs_path, tmp_path):
    docs, path = _bucketed(spark, docs_path, str(tmp_path))
    for b in (0, 3):
        got = {r.doc_id for r in T.read_bucket(spark, path, b).select("doc_id").collect()}
        want = {
            r.doc_id
            for r in docs.select("doc_id").collect()
            if zlib.crc32(str(r.doc_id).encode()) % 8 == b
        }
        assert got == want


def test_point_lookup_prunes_partitions(spark, docs_path, tmp_path):
    docs, path = _bucketed(spark, docs_path, str(tmp_path))
    some_id = docs.select("doc_id").orderBy("doc_id").collect()[5].doc_id
    out = T.scan_for_doc(spark, path, some_id, n_buckets=8)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [some_id]
    # the bucket predicate must be a PARTITION filter (directory pruning),
    # not a data filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200], plan


def test_colocated_bucket_join_no_full_shuffle(spark, docs_path, tmp_path):
    # two tables bucketed identically join bucket-by-bucket: per-bucket
    # inputs are tiny slices of each side (the storage-partitioned-join
    # pattern); verify the per-bucket join result equals the global join
    docs, path = _bucketed(spark, docs_path, str(tmp_path))
    per_bucket = 0
    for b in range(8):
        left = T.read_bucket(spark, path, b).select("doc_id")
        right = T.read_bucket(spark, path, b).select("doc_id", F.lit(1).alias("x"))
        per_bucket += left.join(right, "doc_id").count()
    assert per_bucket == docs.count()
