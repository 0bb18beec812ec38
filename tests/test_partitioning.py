"""Cost-balanced partitioning keeps partition costs tight despite 10×
media-heavy skew docs (the straggler defense for the zero-shuffle map)."""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.datagen import ensure_documents
from graphical_context_extraction_pipeline_spark.operators.partitioning import (
    balance_by_cost,
    partition_cost_stats,
)

N_PARTS = 8


def _docs(spark):
    # sf0.01: 200 docs incl. two 10× skew docs — enough rows per partition
    # for balance to be meaningful
    return spark.read.parquet(ensure_documents(spark, "sf0.01"))


def _imbalance(stats):
    costs = [r["total_cost"] for r in stats]
    return max(costs) / (sum(costs) / len(costs))


def test_balance_by_cost_hits_ideal_bound(spark):
    docs = _docs(spark)

    balanced = partition_cost_stats(balance_by_cost(docs, N_PARTS)).collect()
    naive = partition_cost_stats(docs.repartition(N_PARTS, "doc_id")).collect()

    # exact placement: every partition populated, row counts dealt evenly
    assert len(balanced) == N_PARTS
    rows = sorted(r["n_rows"] for r in balanced)
    assert rows[-1] - rows[0] <= 1

    # a single mega-doc bounds achievable balance from below: the best any
    # partitioner can do is max(heaviest_doc, mean) per partition
    total = sum(r["total_cost"] for r in balanced)
    mean = total / N_PARTS
    heaviest = docs.select(F.max(F.size("spans"))).first()[0]
    ideal = max(heaviest, mean) / mean

    bal = _imbalance(balanced)
    assert bal <= ideal * 1.30, (bal, ideal)
    # and never worse than naive hash partitioning
    assert bal <= _imbalance(naive) + 1e-9


def test_balance_preserves_rows(spark):
    docs = _docs(spark)
    out = balance_by_cost(docs, N_PARTS)
    assert out.count() == docs.count()
    assert sorted(out.columns) == sorted(docs.columns)
    assert out.rdd.getNumPartitions() == N_PARTS
