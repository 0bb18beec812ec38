"""Similarity search over the `embeddings` table (vec_id, embedding
array<float>, label).

- brute-force cosine top-k: exact baseline. Dot products via zip_with +
  aggregate HOFs (JVM-side, codegen) — no Python in the loop. The query
  side is broadcast (tiny), so the scan is a single pass over the corpus:
  this is the shape that survives 100 TB (one map stage + per-query top-k).
- LSH-bucketed ANN (random hyperplanes): the scale path — candidates only
  from matching sign-buckets, then exact re-rank. Hyperplanes are derived
  deterministically from a seed so results are reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # double-precision left-to-right fold — bit-identical to the DuckDB
    # oracle's double accumulation (float32 accumulation would drift)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector (excluding self).

    Output integerized (cos_e4 = floor(1e4·cos)) for oracle stability.
    """
    queries = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.floor(cos * 10000).cast("long").alias("cos_e4"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_e4", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(float)


def lsh_bucket(emb: DataFrame, n_planes: int = 12, seed: int = 42, dim: int | None = None) -> DataFrame:
    """Sign-bucket id per vector: bit i = sign(v · plane_i).

    ``dim`` is sniffed from the first row when not given (one tiny driver
    action); an empty table degrades to dim=1 (bucketing an empty set is
    vacuous but must not crash)."""
    if dim is None:
        head = emb.select("embedding").head()
        dim = len(head[0]) if head is not None and head[0] is not None else 1
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = sum(
        (
            F.when(_dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in planes[i]])) > 0, F.lit(1)).otherwise(F.lit(0))
            * F.lit(2**i)
        ).cast("long")
        for i in range(n_planes)
    )
    return emb.select("vec_id", "embedding", "label", bucket.alias("bucket"))


def ann_topk_lsh(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Approximate top-k: exact re-rank within the query's LSH bucket.

    Recall vs cosine_topk is measured in tests; at 100 TB this replaces the
    full-scan join with a bucket-pruned one (bucket is a partition key).
    """
    bucketed = lsh_bucket(emb, n_planes, seed)
    queries = bucketed.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    joined = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = joined.select(
        "query_id", "vec_id", F.floor(cos * 10000).cast("long").alias("cos_e4")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_e4", "rank")
    )


def embedding_cosine_dups(emb: DataFrame, min_cos_e4: int = 9000, n_planes: int = 6, seed: int = 7) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket blocking + exact cosine filter."""
    bucketed = lsh_bucket(emb, n_planes, seed)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))
    )
    return (
        cand.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.floor(cos * 10000).cast("long").alias("cos_e4"),
        )
        .where(F.col("cos_e4") >= min_cos_e4)
    )
