"""Cost-balanced partitioning — the engine's straggler defense.

The corpus has media-heavy skew documents with 10× the spans (datagen
plants them; the reference's real-world analog is hour-long screencasts
among 3-minute clips). Round-robin or hash partitioning puts a random
number of heavy docs in each partition; the slowest partition sets the
stage wall-clock (stragglers).

``balance_by_cost`` ranks documents by a per-row cost expression and deals
them round-robin across partitions — every partition receives an equal mix
of heavy and light docs, so partition costs equalize regardless of the
skew distribution.

Scale notes: the global rank is a sort-shuffle of (cost, id) PAIRS — tiny
next to the payload — and the deal is the same exchange that a plain
``repartition`` would do anyway; net extra cost ≈ one lightweight sort. At
10^12 docs replace the exact rank with bucketed costs (size-class salt):
``F.ntile`` over coarse size classes gives the same balance without a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balance_by_cost(df: DataFrame, n_partitions: int, cost=None) -> DataFrame:
    """Deal rows round-robin across ``n_partitions`` in descending-cost
    order. Default cost: ``size(spans)`` (span-count ≈ extraction work)."""
    cost = cost if cost is not None else F.size("spans")
    w = Window.orderBy(F.desc(cost), "doc_id")
    rn = F.row_number().over(w) - 1
    # snake (boustrophedon) deal: 0..n-1 then n-1..0 — the partition that
    # received a block's heaviest row receives the next block's lightest
    # (the relational approximation of greedy LPT assignment)
    pos = rn % n_partitions
    block = F.floor(rn / n_partitions)
    dealt = df.withColumn(
        "_deal",
        F.when(block % 2 == 0, pos).otherwise(F.lit(n_partitions - 1) - pos),
    )
    # repartitionByRange, not repartition(col): hash placement would collide
    # several deal groups into one partition and leave others empty; range
    # placement maps the n dense deal values 1:1 onto the n partitions
    return dealt.repartitionByRange(n_partitions, "_deal").drop("_deal")


def balance_by_cost_scalable(
    df: DataFrame,
    n_partitions: int,
    cost=None,
    heavy_fraction: float = 0.01,
) -> DataFrame:
    """The 100 TB variant of balance_by_cost: NO global sort.

    balance_by_cost's exact global rank funnels every row through one
    partition for the row_number window — correct and cheap at test scale,
    a single-partition bottleneck at 10^12 docs. This variant splits the
    corpus at the (1 − heavy_fraction) cost quantile (one approxQuantile
    pass — an aggregate, returns a scalar):

    - LIGHT rows (≈99 %): placed by doc_id hash. With millions of light
      docs per partition their cost sums concentrate tightly around the
      mean (law of large numbers) — no coordination needed.
    - HEAVY tail (≈1 %): the docs that actually cause stragglers are
      snake-dealt in descending-cost order. The rank window runs over only
      the tail, so its sort partition holds heavy_fraction of the rows.

    Both halves land in the same ``repartitionByRange`` on the dense deal
    value, so the exchange count equals a plain repartition's. A uniform
    corpus degrades gracefully: the strict > threshold test makes the
    heavy set empty and everything places by hash."""
    cost = cost if cost is not None else F.size("spans")
    # NULL costs (a NULL spans column makes size() NULL) coalesce to 0 so
    # every row satisfies exactly one of the light/heavy predicates — a
    # raw NULL would fail both and silently vanish from the output
    with_cost = df.withColumn("_cost", F.coalesce(cost.cast("long"), F.lit(0).cast("long")))
    quantiles = with_cost.stat.approxQuantile("_cost", [1.0 - heavy_fraction], 0.001)
    if not quantiles:  # empty corpus — nothing to balance
        return df.repartition(n_partitions)
    thresh = quantiles[0]
    light = with_cost.where(F.col("_cost") <= thresh).withColumn(
        "_deal", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions))
    )
    heavy = with_cost.where(F.col("_cost") > thresh)
    w = Window.orderBy(F.desc("_cost"), "doc_id")
    rn = F.row_number().over(w) - 1
    pos = rn % n_partitions
    block = F.floor(rn / n_partitions)
    heavy = heavy.withColumn(
        "_deal",
        F.when(block % 2 == 0, pos).otherwise(F.lit(n_partitions - 1) - pos).cast("bigint"),
    )
    return (
        light.unionByName(heavy)
        .repartitionByRange(n_partitions, "_deal")
        .drop("_deal", "_cost")
    )


def partition_cost_stats(df: DataFrame, cost=None) -> DataFrame:
    """Per-partition cost totals (observability for the balance claim)."""
    cost = cost if cost is not None else F.size("spans")
    return (
        df.withColumn("_cost", cost)
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("_cost").cast("long").alias("total_cost"),
        )
        .select(F.col("_pid").alias("part_id"), "n_rows", "total_cost")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: a hot join key (one user/domain/doc dominating
    the fact side) lands every matching fact row on ONE reducer in a plain
    shuffle join. Salting splits it: the fact side gets a deterministic
    salt derived from a per-row unique column (crc32 % n_salts — no
    nondeterministic rand(), so retries/speculative tasks agree), the dim
    side is replicated once per salt value, and the join runs on
    (key, salt) — each hot key now spreads across n_salts reducers at the
    cost of an n_salts× dim replication (use for large-dim joins where
    broadcast is impossible and AQE's skew split can't help, e.g. bucketed
    sort-merge inputs).

    Complementary to AQE skew handling: AQE splits oversized PARTITIONS
    after the shuffle files exist; salting prevents the oversized shuffle
    block from being written in the first place — the difference matters
    when one key alone exceeds executor memory.
    """
    fact_s = fact.withColumn(
        "_salt",
        (F.crc32(F.col(fact_unique_col).cast("string").cast("binary")) % n_salts).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")


def global_rank(df: DataFrame, order_cols: list, rank_col: str = "rank") -> DataFrame:
    """Exact 1-based global rank under a total order WITHOUT the
    single-partition funnel of an unpartitioned Window: a range-
    partitioned orderBy sorts the relation across partitions, per-
    partition row_numbers run in parallel, and the tiny per-partition
    count map (numPartitions rows, collected once) turns them into global
    ranks via broadcast offsets.

    ``order_cols`` must be a deterministic total order (include a unique
    tiebreak column); ties across a partition boundary would otherwise
    make the range partitioner's placement — and so the rank — unstable.
    """
    from pyspark.sql import Window

    s = df.orderBy(*order_cols).withColumn("_pid", F.spark_partition_id())
    s = s.localCheckpoint(eager=True)  # pin the sort's partition placement
    counts = {r["_pid"]: r["n"] for r in s.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # offsets as a broadcast-joined relation, NOT a create_map literal — a
    # literal map embeds numPartitions entries into the plan text, which
    # breaks down at 10^5 sort partitions
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        s.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            rank_col,
            (F.row_number().over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast("long"),
        )
        .drop("_pid", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    total_col: str | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` under a total order,
    without the single-partition funnel — :func:`global_rank`'s pattern
    with per-partition SUMS instead of counts: range-partitioned orderBy,
    eager localCheckpoint to pin placement, the tiny (pid, prefix-sum)
    offset relation collected once and broadcast back, then a per-
    partition running-sum window. This is the distributed CDF/ogive
    primitive — weighted sampling, quota cuts, and token-budget prefixes
    all reduce to it.

    ``order_cols`` must be a deterministic total order (unique tiebreak),
    same contract as global_rank. Values are cast to long; the running
    sum must stay within int64 — at 10^12 docs that bounds per-doc
    weights to ~10^6, pre-scale coarser weights before calling.

    ``total_col``: the driver already holds the grand total after folding
    the per-partition sums — when set, it is attached as a LITERAL column
    of that name, sparing consumers a scalar re-aggregation (and its
    SinglePartition exchange) over the checkpointed relation.
    """
    from pyspark.sql import Window

    s = df.orderBy(*order_cols).withColumn("_pid", F.spark_partition_id())
    s = s.localCheckpoint(eager=True)  # pin the sort's partition placement
    sums = {
        r["_pid"]: r["s"]
        for r in s.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid] or 0)
    off_df = df.sparkSession.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        s.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            out_col,
            (
                F.sum(F.col(value_col).cast("long")).over(w)
                + F.coalesce(F.col("_off"), F.lit(0))
            ).cast("long"),
        )
        .drop("_pid", "_off")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def zorder_key(a_col, b_col, bits: int = 16):
    """Morton/Z-order interleaving of two non-negative integer columns
    (``bits`` low bits each → one 2·bits-bit key): the multi-dimensional
    clustering key behind Iceberg/Delta Z-ORDER table layout. Sorting by
    the key keeps rows close in BOTH dimensions physically adjacent, so
    parquet row-group min/max stats prune scans filtered on EITHER
    column — the data-skipping property a single-column sort can't give.

    Pure integer bit expression (unrolled shifts — no UDF, no loop at
    runtime); values must be pre-scaled into [0, 2^bits) by the caller
    (clamped here via the low-bit mask so outliers wrap rather than
    corrupt neighbors' bits)."""
    a = a_col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b_col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(a.bitwiseAND(F.lit(1 << i)) * F.lit(1 << i))
            .bitwiseOR(b.bitwiseAND(F.lit(1 << i)) * F.lit(1 << (i + 1)))
        )
    return z


def cluster_by_zorder(
    df: DataFrame,
    a_col: str,
    b_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> DataFrame:
    """Rewrite a relation into Z-order-clustered layout: range-partition by
    the Morton key, sort within partitions, ready for a parquet write
    whose per-file min/max stats are tight in BOTH ``a_col`` and
    ``b_col``. This is the table-maintenance OPTIMIZE/Z-ORDER action —
    compose with export.compact_parquet's audit-swap protocol for the
    atomic rewrite."""
    keyed = df.withColumn("_z", zorder_key(F.col(a_col), F.col(b_col), bits))
    return (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
