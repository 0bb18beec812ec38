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


def _embedding_dim(emb: DataFrame) -> int:
    """Sniff the embedding dimensionality from the first row (one tiny
    driver action); an empty table degrades to dim=1 (bucketing an empty
    set is vacuous but must not crash). Multi-table callers MUST call this
    once and pass ``dim`` through — sniffing inside each lsh_bucket would
    fire one driver job per table just to learn one constant."""
    head = emb.select("embedding").head()
    return len(head[0]) if head is not None and head[0] is not None else 1


def lsh_bucket(emb: DataFrame, n_planes: int = 12, seed: int = 42, dim: int | None = None) -> DataFrame:
    """Sign-bucket id per vector: bit i = sign(v · plane_i).

    ``dim`` is sniffed from the first row when not given (see
    _embedding_dim)."""
    if dim is None:
        dim = _embedding_dim(emb)
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
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact re-rank within the query's LSH buckets.

    Multi-table LSH (the standard recall lever): ``n_tables`` independent
    hyperplane sets; a vector is a candidate if it shares a bucket with the
    query in ANY table. Recall vs cosine_topk is measured in tests; at
    100 TB this replaces the full-scan join with bucket-pruned ones
    (table+bucket is a partition key), scanning ≈1-(1-2^-n_planes)^n_tables
    of the corpus per query. Measured on the sf0.01 corpus: planes=4 →
    recall 0.55 @ 6 tables, 0.73 @ 10; planes=3/tables=8 → 0.84 (but ~66%
    scanned). Defaults trade ~40% scanned for ~0.65 recall; IVF (below) is
    the sharper instrument when a codebook is affordable.
    """
    dim = _embedding_dim(emb)  # sniffed ONCE for all tables
    bucketed = lsh_bucket_multi(emb, n_planes, n_tables, seed, dim)  # one scan
    queries = bucketed.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("table").alias("qtable"),
    )
    joined = bucketed.join(
        F.broadcast(queries),
        (F.col("table") == F.col("qtable"))
        & (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    ).dropDuplicates(["query_id", "vec_id"])
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


def ivf_seed_priority(vec_id_col, salt: str = "ivf"):
    """Deterministic uniform sampling priority: first 15 hex digits of
    md5(salt:vec_id) as bigint. Taking the n smallest priorities is an
    order-statistics reservoir sample — uniform over the corpus regardless
    of vec_id distribution (replaces the earlier vec_id-strided init, which
    was biased under non-uniform id spacing), computable identically in any
    engine (the DuckDB oracle replays it), and fully distributed: the sort
    is a top-n over an 8-byte key."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), vec_id_col.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def ivf_centroids(emb: DataFrame, n_centroids: int = 16, n_iters: int = 2) -> list[list[float]]:
    """IVF coarse quantizer: deterministic seeded-reservoir init (hash-
    priority order statistics, see ivf_seed_priority) refined by ``n_iters``
    Lloyd steps computed distributedly.

    Each step is one small job: assign → posexplode → groupBy(cid, dim pos)
    mean → collect (n_centroids × dim floats to the driver — KB-scale at any
    corpus size; this is the standard IVF training shape where only the
    codebook ever leaves the cluster)."""
    init = (
        emb.select("vec_id", "embedding", ivf_seed_priority(F.col("vec_id")).alias("pri"))
        .orderBy("pri", "vec_id")
        .limit(n_centroids)
        .collect()
    )
    if not init:
        return []
    cents = [[float(x) for x in r["embedding"]] for r in init]
    for _ in range(n_iters):
        assigned = ivf_assign(emb, cents)
        new = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in new:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cid[c][p] for p in range(len(cents[0]))] if c in by_cid else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ivf_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid id per vector (max dot product; centroids ride into
    the plan as literals — the broadcast-side of IVF)."""
    scored = F.array(
        *[
            F.struct(
                _dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c])).alias("dot"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return emb.withColumn("cid", F.array_max(scored)["cid"])


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: probe the query's ``n_probe`` nearest inverted
    lists, exact cosine re-rank inside them.

    At 100 TB the assignment is a write-time partition key (one list = one
    partition family); a query then scans n_probe/n_centroids of the corpus
    instead of all of it. Here the same plan shape appears as a broadcast
    join of (query, probed-cid) pairs against the assigned corpus.

    ``n_iters=0`` skips Lloyd refinement: centroids are then exactly the
    seeded-reservoir corpus vectors, making every number in the plan an
    engine-independent function of the stored table — that variant is
    oracled exactly by the driver's DuckDB SQL. The refined variant's
    quality is pinned by recall/probe-monotonicity tests instead (a
    distributed float mean is summation-order-dependent, so its centroids
    are not bit-reproducible across engines)."""
    cents = ivf_centroids(emb, n_centroids, n_iters)
    if not cents:  # empty corpus degrades to an empty (schema-stable) result
        return emb.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cos_e4 long, rank int"
        )
    assigned = ivf_assign(emb, cents)

    probe_scored = F.array(
        *[
            F.struct(
                _dot(F.col("qv"), F.array(*[F.lit(float(x)) for x in c])).alias("dot"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(cents)
        ]
    )
    probes = (
        emb.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
        .withColumn(
            "probe_cid",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(probe_scored)), 1, n_probe),
                    lambda s: s["cid"],
                )
            ),
        )
    )
    joined = assigned.join(
        F.broadcast(probes),
        (F.col("cid") == F.col("probe_cid")) & (F.col("vec_id") != F.col("query_id")),
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


# 8 planes × 10 tables: measured on the sf0.01 planted corpus this blocks
# to ~4.6% of all pairs while covering 25/25 true ≥0.90-cosine pairs
# (6 tables missed one 0.92-cosine pair — see tests/test_embedding_dups_recall)
EMB_DUP_PLANES = 8
EMB_DUP_TABLES = 10
EMB_DUP_SEED = 7


def suggest_planes(n_vecs: int, target_bucket: int = 8) -> int:
    """Production LSH geometry: the plane count that keeps EXPECTED
    sign-bucket occupancy ~``target_bucket`` as the corpus grows —
    ``planes ≈ log2(n / target_bucket)``, floored at the default
    :data:`EMB_DUP_PLANES` so small corpora keep the measured-recall
    geometry.

    Why this is the scaling rule: a probe against the banded index
    touches ~``n_tables · n / 2^planes`` candidate rows, so at FIXED
    planes the serving wall grows linearly with corpus size; sizing
    planes with log2(n) pins the per-probe candidate count instead.
    Measured on the 100× content-diverse span (BENCH/SERVING_CURVE.md):
    fixed 8 planes grew the 200k-vector probe 2.10× over the 2k-vector
    probe, while this sizing (15 planes at 200k) held it at the brute
    wall's own fixed-cost growth (1.48×) and cut the absolute probe
    0.598 → 0.395 s. Recall lost to longer signatures is recovered by
    ``n_tables`` — the standard banding trade (same lever as
    :func:`embedding_cosine_dups`' geometry note).
    """
    import math as _math

    if n_vecs <= 0:
        return EMB_DUP_PLANES
    return max(EMB_DUP_PLANES, int(round(_math.log2(max(n_vecs, 1) / target_bucket))))


def lsh_bucket_multi(
    emb: DataFrame, n_planes: int, n_tables: int, seed: int, dim: int
) -> DataFrame:
    """All ``n_tables`` hyperplane tables' sign-buckets in ONE corpus scan:
    (vec_id, embedding, table, bucket). The per-table union
    (n_tables separate lsh_bucket scans) re-read the vectors once per
    table — a 10-table banding cost 10 scans and 10 codegen branches;
    posexploding an array of the 10 bucket expressions computes the same
    relation in a single projection (table = posexplode position, which
    matches the union's lit(t) numbering exactly).

    The bucket bits come from ONE Arrow-batched numpy matmul
    (batch × (n_tables·n_planes) plane matrix → signs) instead of
    n_tables·n_planes catalyst ``aggregate`` folds: higher-order
    functions run interpreted per element, so 80 folds × 64 dims per row
    dominated the whole operator (~11 s at 5 k vectors); the vectorized
    kernel is the north rule's sanctioned fast path (pandas/Arrow UDFs,
    no per-row Python). Sign parity: numpy's pairwise summation and a
    sequential fold can differ by ~1e-16 on O(1)-magnitude dots — the
    same accepted margin as the DuckDB list_dot_product oracle twin
    (a plane dot landing within 1e-13 of zero would be the first
    boundary case; none exists in any test corpus)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    planes = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )  # (n_tables·n_planes, dim), float64
    weights = (1 << np.arange(n_planes, dtype=np.int64))  # bit i → 2^i

    def _buckets_kernel(col):
        if len(col) == 0:
            return pd.Series([], dtype=object)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        bits = (E @ planes.T) > 0  # (n, n_tables·n_planes)
        b = bits.reshape(len(E), n_tables, n_planes) @ weights  # (n, n_tables)
        return pd.Series(list(b))

    # no type hints: local `pd` makes string annotations unresolvable for
    # the hint-based eval-type inference; the explicit form is SCALAR
    _buckets = F.pandas_udf(_buckets_kernel, ArrayType(LongType()))

    return emb.select(
        "vec_id",
        "embedding",
        F.posexplode(_buckets(F.col("embedding"))).alias("table", "bucket"),
    )


def embedding_cosine_dups(
    emb: DataFrame,
    min_cos_e4: int = 9000,
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
) -> DataFrame:
    """Embedding near-dup pairs: multi-table banded LSH blocking + exact
    cosine filter (≥ min_cos_e4 basis points).

    Scale design: a pair is a candidate iff it shares a sign-bucket in ANY
    of ``n_tables`` independent hyperplane tables (same recall lever as
    ann_topk_lsh) — 2^n_planes buckets per table bounds the within-bucket
    self-join (n_planes rises with corpus size, ~log2(n / target bucket
    size)), replacing the earlier single-table 64-bucket variant whose
    per-bucket expansion went quadratic at scale. Candidates are deduped
    across tables BEFORE the exact cosine re-check; recall on planted
    near-dup pairs is pinned against a brute-force O(n²) pass in tests."""
    dim = _embedding_dim(emb)  # sniffed ONCE for all tables
    banded = lsh_bucket_multi(emb, n_planes, n_tables, seed, dim)  # one scan
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.select(
            "vec_a",
            "vec_b",
            F.floor(cos * 10000).cast("long").alias("cos_e4"),
        )
        .where(F.col("cos_e4") >= min_cos_e4)
    )


CENT_OFFSET = 1 << 30


def cluster_centroids(emb: DataFrame, members: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster embedding centroid in e6 fixed point — the dedup-QA
    table (how tight is each near-dup cluster? what does it look like?):
    (component, dim, centroid_e6, n_members) with
    centroid_e6 = floor(mean of floor(1e6·v)) per dimension.

    Integer-exact cross-engine: each value quantizes to floor(1e6·v)
    (identical doubles both engines), sums are bigints, and the mean
    divides POSITIVE numbers only — values are offset by +2^30 before the
    division because Spark's DIV truncates toward zero while DuckDB's //
    floors, and they disagree exactly on negative numerators.

    ``members`` is cluster.neardup_clusters output (doc_id, component,
    n_members). One membership join (broadcast when the dup graph is
    small) + one (component, dim) aggregation — partial-agg combinable,
    no per-cluster buffers.
    """
    j = emb.join(
        members.withColumnRenamed("doc_id", id_col).select(id_col, "component", "n_members"),
        id_col,
    )
    d = j.select(
        "component",
        "n_members",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "component",
        "n_members",
        F.col("dim").cast("long").alias("dim"),
        (F.floor(F.col("v").cast("double") * 1e6).cast("long") + F.lit(CENT_OFFSET)).alias("w"),
    )
    return (
        d.groupBy("component", "dim")
        .agg(
            F.sum("w").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("n_members").cast("long").alias("n_members"),
        )
        .select(
            "component",
            "dim",
            (F.expr("s DIV n") - F.lit(CENT_OFFSET)).cast("long").alias("centroid_e6"),
            "n_members",
        )
    )


EMB_MAX_BUCKET = 64


def embedding_incremental_pairs(
    new_emb: DataFrame,
    seen_emb: DataFrame,
    min_cos_e4: int = 9000,
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
    max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """Embedding near-dups of an ingest batch against the already-seen
    corpus: (vec_new, vec_seen, cos_e4) for batch vectors sharing a
    sign-bucket with a seen vector in ANY hyperplane table AND passing
    the exact cosine gate — ``minhash_incremental_pairs``' daily-ingest
    shape (dedup.py) lifted to the embedding modality, and the
    incremental twin of :func:`embedding_cosine_dups`.

    Scale design: the seen side reduces to its multi-table banded index
    (table, bucket, vec_id, embedding) — in production a MATERIALIZED
    ANN index appended to per ingest (vectors ride along exactly as IVF
    lists store them), so the 100 TB embedding corpus is never re-read.
    Seen buckets larger than ``max_bucket`` (a giant boilerplate cluster
    collapses to one sign pattern in every table) are represented by
    their min-vec_id hub alone — a batch vector hitting such a bucket
    gains exactly one candidate, all an accept/reject decision needs,
    and per-batch-row join fan-out stays bounded by ``max_bucket`` per
    table. The batch side is a day's ingest (small); AQE broadcasts it
    into the index join. Both hyperplane families derive from one
    ``dim`` sniff (one driver action total).

    Merge law (pinned by test): with no hot bucket this equals the
    (seen, new) cross-pairs of ``embedding_cosine_dups(seen ∪ new)`` —
    the index join IS the full rebuild restricted to cross edges.
    """
    dim = _embedding_dim(seen_emb)
    seen_b = lsh_bucket_multi(seen_emb, n_planes, n_tables, seed, dim)
    new_b = lsh_bucket_multi(new_emb, n_planes, n_tables, seed, dim)
    stats = seen_b.groupBy("table", "bucket").agg(
        F.count("*").alias("n_members"), F.min("vec_id").alias("hub")
    )
    index = (
        seen_b.join(stats, ["table", "bucket"])
        .where((F.col("n_members") <= max_bucket) | (F.col("vec_id") == F.col("hub")))
        .select("table", "bucket", "vec_id", "embedding")
    )
    cand = (
        new_b.alias("n")
        .join(index.alias("s"), ["table", "bucket"])
        .select(
            F.col("n.vec_id").alias("vec_new"),
            F.col("s.vec_id").alias("vec_seen"),
            F.col("n.embedding").alias("en"),
            F.col("s.embedding").alias("es"),
        )
        .dropDuplicates(["vec_new", "vec_seen"])
    )
    cos = _dot(F.col("en"), F.col("es")) / (_norm(F.col("en")) * _norm(F.col("es")))
    return cand.select(
        "vec_new",
        "vec_seen",
        F.floor(cos * 10000).cast("long").alias("cos_e4"),
    ).where(F.col("cos_e4") >= min_cos_e4)


def query_buckets(
    query_vec: list[float],
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
) -> list[tuple[int, int]]:
    """The (table, bucket) probe keys of one query vector — the
    driver-side half of index serving (microseconds of numpy on a single
    vector; no cluster work). Bit i of a table's bucket =
    sign(v · plane_i), identical to lsh_bucket_multi's kernel."""
    v = np.asarray(query_vec, dtype=np.float64)
    out = []
    for t in range(n_tables):
        planes = _hyperplanes(len(v), n_planes, seed + 1000 * t)
        bits = (planes @ v) > 0
        out.append((t, int((bits * (1 << np.arange(n_planes, dtype=np.int64))).sum())))
    return out


def ann_from_index(
    index: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Index-backed ANN serving: top-k cosine neighbours of a LITERAL
    query vector, computed from the standing multi-table banded index
    (table, bucket, vec_id, embedding) — the relation
    embedding_incremental_pairs / streaming/embindex.py maintain — with
    NO corpus scan and NO per-query banding job. The vector twin of
    search.bm25_from_index (and the serving shape of the replaced
    Qdrant path, reference `phase 2/src/store.py:36-129`: store once,
    probe per query).

    Plan shape: the query's n_tables (table, bucket) keys are computed
    driver-side (:func:`query_buckets`, one tiny numpy matmul) and
    become an OR-of-conjunctions filter on the index — pushed into the
    parquet scan when the index is materialized, so a query touches
    ~n_tables buckets (≈ n_tables·|corpus|/2^n_planes rows), not the
    corpus. Candidates dedup across tables, then one exact-cosine
    projection against the query literal and a TakeOrderedAndProject
    top-k. No shuffle anywhere: filter → dedup-by-key → project →
    ordered take. Probe cost is bounded by bucket sizes, which the
    index-maintenance gate keeps honest (admitted vectors are pairwise
    below the near-dup threshold, so buckets can't fill with clones).

    Output (vec_id, cos_e4, rank) with the family's (cos desc, vec_id
    asc) tiebreak. Merge law (pinned by test): for a query vector taken
    FROM the corpus with its own id excluded,
    ann_from_index(lsh_bucket_multi(emb), emb[q]) ≡ ann_topk_lsh(emb,
    [q]) at the same (planes, tables, seed).
    """
    keys = query_buckets(query_vec, n_planes, n_tables, seed)
    probe = None
    for t, b in keys:
        arm = (F.col("table") == F.lit(t)) & (F.col("bucket") == F.lit(b))
        probe = arm if probe is None else (probe | arm)
    cand = index.where(probe).dropDuplicates(["vec_id"])
    if exclude_ids:
        cand = cand.where(~F.col("vec_id").isin(list(exclude_ids)))
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col("embedding"), qv) / (_norm(F.col("embedding")) * _norm(qv))
    topk = (
        cand.select("vec_id", F.floor(cos * 10000).cast("long").alias("cos_e4"))
        .orderBy(F.desc("cos_e4"), F.asc("vec_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cos_e4"), F.asc("vec_id"))  # ≤k rows: tiny
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def ann_serve_batch(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
    dim: int | None = None,
) -> DataFrame:
    """Batched index-backed ANN: top-k cosine neighbours for MANY query
    vectors in one distributed job against the standing banded index —
    the offline twin of :func:`ann_from_index` (which serves one literal
    vector via pushed point probes) and the vector sibling of
    search.bm25_serve_batch. ``queries`` is (query_id long, embedding
    array<float>).

    Plan shape: the query batch is banded with ONE vectorized kernel
    (lsh_bucket_multi — same single ArrowEvalPython node as the index
    build) and BROADCAST into the (table, bucket) join against the
    index, so the index side never shuffles; candidates dedup per
    (query_id, vec_id) across tables, one exact-cosine projection, and
    the top-k window partitions BY QUERY. Self-matches (a stored query
    probing the index that contains it) keep the family's exclusion
    rule: vec_id == query_id rows are dropped, so for stored queries
    this ≡ ann_topk_lsh at the same (planes, tables, seed) — the merge
    law pinned by test.
    """
    if dim is None:
        dim = _embedding_dim(queries)
    q_b = lsh_bucket_multi(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        n_planes,
        n_tables,
        seed,
        dim,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "table",
        "bucket",
    )
    cand = (
        index.alias("s")
        .join(F.broadcast(q_b).alias("q"), ["table", "bucket"])
        .where(F.col("s.vec_id") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("s.vec_id").alias("vec_id"),
            F.col("q.qv").alias("qv"),
            F.col("s.embedding").alias("embedding"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    scored = cand.select(
        "query_id", "vec_id", F.floor(cos * 10000).cast("long").alias("cos_e4")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_e4", "rank")
    )


def ivf_probe_cids(
    centroids: list[list[float]], query_vec: list[float], n_probe: int = 4
) -> list[int]:
    """The query's ``n_probe`` inverted-list ids — driver-side argmax over
    the KB-scale codebook with EXACTLY ivf_topk's tiebreak (dot desc, cid
    desc: Spark's array_max over struct(dot, cid) is lexicographic). The
    Python left-to-right sum matches Spark's sequential fold bit-for-bit
    on identical double literals."""
    dots = [
        (sum(float(a) * float(b) for a, b in zip(query_vec, c)), i)
        for i, c in enumerate(centroids)
    ]
    return [i for _, i in sorted(dots, key=lambda t: (-t[0], -t[1]))[:n_probe]]


def ivf_from_index(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """IVF serving from a MATERIALIZED assignment table — the third
    serving symmetry (lexical: bm25_from_index; banded ANN:
    ann_from_index; coarse-quantized ANN: this). ``assigned`` is
    ivf_assign output (vec_id, embedding, cid) persisted at index-build
    time — in production partitioned BY cid, so the probe below is
    partition pruning, not just row-group pruning; ``centroids`` is the
    KB-scale codebook stored beside it.

    Plan shape: probe cids computed driver-side (:func:`ivf_probe_cids`,
    a codebook argmax), pushed as an In(cid) filter into the assignment
    scan — a query reads ~n_probe/n_centroids of the table; exact cosine
    vs the query literal, ordered take, rank over the ≤k rows. Merge law
    (pinned): for a stored query vector with its own id excluded this
    ≡ ivf_topk at the same codebook (n_iters=0 makes the codebook an
    engine-independent function of the stored table, hence oracle-able).
    """
    probes = ivf_probe_cids(centroids, query_vec, n_probe)
    cand = assigned.where(F.col("cid").isin(probes))
    if exclude_ids:
        cand = cand.where(~F.col("vec_id").isin(list(exclude_ids)))
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(F.col("embedding"), qv) / (_norm(F.col("embedding")) * _norm(qv))
    topk = (
        cand.select("vec_id", F.floor(cos * 10000).cast("long").alias("cos_e4"))
        .orderBy(F.desc("cos_e4"), F.asc("vec_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cos_e4"), F.asc("vec_id"))  # ≤k rows
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Int8 scalar quantization of L2-NORMALIZED embeddings — the standard
    4× memory cut for billion-vector ANN fleets: (vec_id, qvec) with
    qvec_i = ⌊v_i/‖v‖ · 127 + 0.5⌋ ∈ [−127, 127] (round-half-up spelled as
    floor(+0.5) — F.round's half-even would be a cross-engine coin flip).

    Cross-engine exactness: /, ·, sqrt are all IEEE-754 correctly-rounded,
    so Spark and DuckDB produce bit-identical doubles from the same
    float32 parquet values — unlike ln/exp (the intmath lesson), sqrt is
    oracle-safe. Normalizing BEFORE quantizing makes the integer dot
    product a cosine estimate with no per-pair scale bookkeeping.

    Zero vectors quantize to all-zero (a 0/0 NaN would poison every dot
    it touches). One projection, zero shuffle."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = _norm(F.col("embedding"))
    qv = F.when(nrm == 0.0, F.transform(v, lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(v, lambda x: F.floor(x / nrm * 127.0 + 0.5).cast("long"))
    )
    return emb.select("vec_id", qv.alias("qvec"))


def _quantize_np(mat: "np.ndarray") -> "np.ndarray":
    """Numpy replica of :func:`quantize_embeddings`'s expression, exact to
    the last bit: the norm accumulates LEFT-TO-RIGHT over dims (Spark's
    ``aggregate`` fold order, DuckDB's list_dot_product order — numpy's
    default pairwise summation rounds differently on adversarial inputs),
    then per element ``floor(x / nrm * 127.0 + 0.5)``; /, ·, sqrt, floor
    are IEEE-754 correctly-rounded elementwise, so numpy ≡ Spark ≡ DuckDB
    double-for-double. Zero vectors quantize to all-zero."""
    v = mat.astype(np.float64)
    acc = np.zeros(v.shape[0], dtype=np.float64)
    for j in range(v.shape[1]):  # sequential over dims = the fold order
        acc = acc + v[:, j] * v[:, j]
    nrm = np.sqrt(acc)
    q = np.zeros_like(v)
    nz = nrm != 0.0
    q[nz] = np.floor(v[nz] / nrm[nz, None] * 127.0 + 0.5)
    return q.astype(np.int64)


def ann_topk_quantized(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Top-k neighbours under the int8 quantized dot product (self
    excluded): (query_id, vec_id, dot_q, rank), rank by (dot_q desc,
    vec_id asc). dot_q/127² approximates cosine; the arithmetic after
    quantization is PURE int64 (≤127²·dim per pair — 4 orders inside the
    budget at dim 4096), so the oracle replays it exactly and the ranking
    has no float tie ambiguity at all.

    Execution is an Arrow kernel, NOT the expression chain: the
    expression form (kept as :func:`ann_topk_quantized_expr`, row-pinned
    equal) ran the quantize + per-pair zip_with/aggregate dot through
    Catalyst's INTERPRETED per-element HOF evaluator — the repo's
    documented trap (classifier_score 9.6 s → 0.61 s, lsh_bucket_multi) —
    at ~13× cosine_topk's wall for the same plan shape. Here the ≤|Q|
    query vectors are collected + quantized driver-side (KB-bounded, the
    codebook rule), shipped in the closure, and one ``mapInPandas`` pass
    quantizes each corpus batch once and scores ALL queries with a single
    int64 matmul. Each batch pre-reduces to its local top-k per query
    under the FINAL order (dot_q desc, vec_id asc) — safe truncation, so
    the shuffle into the global top-k window carries ≤ k·|Q| rows per
    batch instead of n·|Q|: at fleet scale the window input is
    O(k·|Q|·n_partitions), corpus-size-independent. Quantization and
    lsh_bucket_multi banding still compose — they don't compete.

    Replaces the reference's Qdrant-served embedding retrieval
    (phase 2/src/store.py:36-129) per the north rule."""
    qrows = (
        emb.where(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    out_schema = "query_id long, vec_id long, dot_q long"
    if not qrows:
        return emb.sparkSession.createDataFrame([], out_schema).withColumn(
            "rank", F.lit(1).cast("long")
        )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qmat = _quantize_np(
        np.stack([np.asarray(r.embedding, dtype=np.float32) for r in qrows])
    )

    def _score_batches(batches):
        import pandas as pd

        q_t = qmat.T  # (dim, |Q|)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vid = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = _quantize_np(
                np.stack(
                    [np.asarray(e, dtype=np.float32) for e in pdf["embedding"]]
                )
            )
            dots = cmat @ q_t  # exact int64, all queries in one matmul
            frames = []
            for j in range(len(qids)):
                keep = vid != qids[j]  # self excluded
                d_j, v_j = dots[keep, j], vid[keep]
                if len(d_j) > k:  # local top-k under the FINAL order
                    order = np.lexsort((v_j, -d_j))[:k]
                    d_j, v_j = d_j[order], v_j[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(v_j), qids[j], dtype=np.int64),
                            "vec_id": v_j,
                            "dot_q": d_j,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = emb.select("vec_id", "embedding").mapInPandas(_score_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot_q", "rank")
    )


def ann_topk_quantized_expr(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Pure-expression twin of :func:`ann_topk_quantized` — kept as the
    row-equality pin for the Arrow kernel (test_ann_recall), NOT a hot
    path: the per-pair zip_with/aggregate dot evaluates per element in
    Catalyst's interpreted HOF evaluator."""
    qz = quantize_embeddings(emb)
    queries = qz.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("quv")
    )
    joined = qz.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    dot_q = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("quv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = joined.select("query_id", "vec_id", dot_q.alias("dot_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot_q", "rank")
    )


def semdedup(
    emb: DataFrame,
    n_centroids: int = 16,
    tau_e4: int = 9000,
    n_probe: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding space,
    then inside each cluster drop every vector whose cosine to a LOWER-id
    cluster-mate reaches ``tau_e4`` (keep-first, the same deterministic
    survivor rule as dedup_keep_first — no transitive closure, so the kept
    set is a pure per-pair predicate and the oracle needs no recursion).

    Output: (vec_id, cid, kept) for EVERY corpus vector.

    Centroids are the n_iters=0 seeded-reservoir choice (ivf_centroids),
    making the whole decision an engine-independent function of the stored
    table — same oracle-ability argument as ivf_topk(n_iters=0).

    Scale shape: one centroid-assignment scan (codebook rides as literals),
    then a self-join keyed on the probed cluster id — the pairwise work is
    ≤ n_probe²·Σ|cluster|², which is exactly the knob n_centroids controls
    (production sizing is n_centroids ∝ √N so clusters stay √N; a skewed/
    hot cluster takes the same count + hub-cap remedy as dedup.py's hot
    buckets). The probed cid is the only shuffle key; no corpus-sized
    driver traffic.

    Boundary recall (the round-4 measured trade, closed in round 5 by
    multi-probe): strict argmax assignment (``n_probe=1``) misses pairs
    straddling a seeded boundary — 0.64-0.84 on the planted copies across
    n_centroids 4-32 at sf0.001, vs 1.0 for the multi-table banding
    (embedding_cosine_dups) on the same plants. With the default
    ``n_probe=2`` each vector joins the pair stage under its TWO nearest
    centroids (the standard multi-probe overlap), so a straddling pair
    meets whenever either side's runner-up list is the other's winner —
    measured ≥0.95 on the same plants at n_centroids=16 (pinned). The
    reported ``cid`` stays the argmax cluster; pairwise work is bounded
    by n_probe²·Σ|cluster|², the same n_centroids ∝ √N sizing knob.
    """
    cents = ivf_centroids(emb, n_centroids, n_iters=0)
    if not cents:
        return emb.sparkSession.createDataFrame([], "vec_id long, cid int, kept boolean")
    scored = F.array(
        *[
            F.struct(
                _dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c])).alias(
                    "dot"
                ),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(cents)
        ]
    )
    # one descending (dot, cid) sort yields BOTH the argmax cid (= head,
    # ivf_assign's array_max tiebreak) and the n_probe membership list
    srt = F.reverse(F.array_sort(scored))
    probed = emb.select(
        "vec_id",
        "embedding",
        srt[0]["cid"].alias("cid"),
        F.transform(F.slice(srt, 1, n_probe), lambda s: s["cid"]).alias("probe_cids"),
    )
    memb = probed.select(
        "vec_id", "embedding", F.explode("probe_cids").alias("pcid")
    )
    a = memb.select(
        F.col("pcid"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va")
    )
    b = memb.select(
        F.col("pcid"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    # a pair sharing both probe lists scores twice — harmless, the drop
    # verdict is a DISTINCT on vec_b, so no pair-level dedup shuffle
    dropped = (
        a.join(b, "pcid")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(F.floor(cos * 10000).cast("long") >= tau_e4)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        probed.join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("_drop").isNull().alias("kept"),
        )
    )


def prototypicality_prune(
    emb: DataFrame,
    n_centroids: int = 16,
    drop_bp: int = 2500,
) -> DataFrame:
    """D4-style prototypicality pruning (Tirumala et al. 2023, "D4:
    Improving LLM Pretraining via Document De-Duplication and
    Diversification"): after semantic dedup, the vectors CLOSEST to their
    cluster centroid are the most redundant — drop the top ``drop_bp``
    basis points of each cluster by centroid-cosine, keep the diverse tail.

    Output: (vec_id, cid, cos_c_e4, kept); per cluster of size n exactly
    (n·drop_bp) DIV 10000 rows are dropped (non-negative numerator, so
    Spark DIV ≡ DuckDB // — the pinned cross-engine rule), ranked by
    (cos_c_e4 DESC, vec_id ASC).

    Centroids are again the n_iters=0 seeded-reservoir vectors; note the
    seed vectors themselves sit at cosine 1.0 to their own centroid and are
    pruned first — exactly D4's "prototypes are redundant" intent. The
    argmax assignment compares raw dot products with the (dot, cid DESC)
    tiebreak of ivf_assign; cos_c_e4 then normalizes the WINNING dot by
    both norms (the centroid norm is a literal-array fold, bit-identical
    to the oracle's sqrt(list_dot_product)).

    Scale: one assignment scan + one window over cid — the window's
    partition key is the cluster id, so state per task is one cluster.
    """
    cents = ivf_centroids(emb, n_centroids, n_iters=0)
    if not cents:
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, cid int, cos_c_e4 long, kept boolean"
        )
    scored = F.array(
        *[
            F.struct(
                _dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c])).alias("dot"),
                F.lit(i).alias("cid"),
                _norm(F.array(*[F.lit(float(x)) for x in c])).alias("cnorm"),
            )
            for i, c in enumerate(cents)
        ]
    )
    best = F.array_max(scored)
    base = emb.select(
        "vec_id",
        best["cid"].alias("cid"),
        F.floor(best["dot"] / (_norm(F.col("embedding")) * best["cnorm"]) * 10000)
        .cast("long")
        .alias("cos_c_e4"),
    )
    w = Window.partitionBy("cid").orderBy(F.desc("cos_c_e4"), F.asc("vec_id"))
    wc = Window.partitionBy("cid")
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn("kept", F.expr(f"_rk > (_n * {int(drop_bp)}) DIV 10000"))
        .select("vec_id", "cid", "cos_c_e4", "kept")
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    min_margin_e6: int = 1_060_000,
    n_planes: int = EMB_DUP_PLANES,
    n_tables: int = EMB_DUP_TABLES,
    seed: int = EMB_DUP_SEED,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the
    CCMatrix/LASER recipe for mining parallel training pairs from two
    monolingual embedding spaces): candidates from the multi-table
    sign-bucket banding, ratio-margin scoring against each side's
    top-``k`` candidate neighborhood, best target per source kept when
    the margin clears ``min_margin_e6``.

    margin(x,y) = cos(x,y) / ((mean_k cos(x,·) + mean_k cos(y,·)) / 2),
    computed ENTIRELY in int64 after the per-pair e6 floor:
    margin_e6 = (2e6·cos_e6·kx·ky) DIV (sx·ky + sy·kx) with sx/kx the
    sum/count of x's top-k candidate cosines — integer sums are
    summation-order-free, so the oracle replays the margin bit-for-bit
    (a float neighborhood MEAN would not be; that's the pinned Lloyd-
    step lesson). Negative-cos candidates are dropped before the
    neighborhood stats, keeping every numerator/denominator
    non-negative (DIV ≡ floor, the pinned cross-engine rule).

    Output: (src_id, tgt_id, cos_e6, margin_e6) — at most one row per
    src_id (best margin, tgt_id tiebreak).

    Scale: banding is the same one-scan vectorized kernel as
    embedding_cosine_dups; the candidate join keys on (table, bucket)
    — never all-pairs — and every window partitions by a vector id.
    Production adds the hot-bucket hub cap before the join, exactly as
    dedup.py's machinery; mining quality then degrades gracefully to
    the banding recall curve documented on ann_topk_lsh.
    """
    dim = _embedding_dim(src)
    bs = lsh_bucket_multi(src, n_planes, n_tables, seed, dim).select(
        F.col("vec_id").alias("src_id"), "table", "bucket"
    )
    bt = lsh_bucket_multi(tgt, n_planes, n_tables, seed, dim).select(
        F.col("vec_id").alias("tgt_id"), "table", "bucket"
    )
    cand = bs.join(bt, ["table", "bucket"]).select("src_id", "tgt_id").distinct()
    sv = src.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv"))
    tv = tgt.select(F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv"))
    cos = _dot(F.col("sv"), F.col("tv")) / (_norm(F.col("sv")) * _norm(F.col("tv")))
    pairs = (
        cand.join(sv, "src_id")
        .join(tv, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.floor(cos * 1_000_000).cast("long").alias("cos_e6"),
        )
        .where(F.col("cos_e6") > 0)
    )
    wx = Window.partitionBy("src_id").orderBy(F.desc("cos_e6"), F.asc("tgt_id"))
    wy = Window.partitionBy("tgt_id").orderBy(F.desc("cos_e6"), F.asc("src_id"))
    ranked = pairs.withColumn("rx", F.row_number().over(wx)).withColumn(
        "ry", F.row_number().over(wy)
    )
    sx = (
        ranked.where(F.col("rx") <= k)
        .groupBy("src_id")
        .agg(F.sum("cos_e6").alias("sx"), F.count(F.lit(1)).alias("kx"))
    )
    sy = (
        ranked.where(F.col("ry") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("cos_e6").alias("sy"), F.count(F.lit(1)).alias("ky"))
    )
    scored = (
        pairs.join(sx, "src_id")
        .join(sy, "tgt_id")
        .withColumn(
            "margin_e6",
            F.expr("(2000000 * cos_e6 * kx * ky) DIV (sx * ky + sy * kx)"),
        )
    )
    wbest = Window.partitionBy("src_id").orderBy(F.desc("margin_e6"), F.asc("tgt_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(wbest))
        .where((F.col("_rk") == 1) & (F.col("margin_e6") >= min_margin_e6))
        .select("src_id", "tgt_id", "cos_e6", "margin_e6")
    )


def hashed_features(docs: DataFrame, dim: int = 64, salt: str = "emb") -> DataFrame:
    """Sparse hashing-trick document features (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): each token is
    hashed once to a (bucket, sign) pair — bucket = md5₆₀ % dim, sign
    from the next bit of the same digest — and a document's feature is
    the signed count per touched bucket. The sign hash makes the
    hashed inner product an unbiased estimator of the exact BoW inner
    product, which is what lets a FIXED ``dim`` survive an unbounded
    vocabulary at 100 TB.

    Output: (doc_id, bucket, w) — only TOUCHED buckets appear (a bucket
    whose signs cancel to 0 still appears, with w = 0: the groupBy sees
    it; this matches the oracle's GROUP BY exactly).

    Scale shape: posexplode + one md5 per token ROW (regular codegen'd
    expressions — exploding to rows is precisely what keeps the md5
    chain OUT of the interpreted per-element HOF evaluator, the repo's
    documented trap), then ONE (doc_id, bucket)-keyed partial-agg
    shuffle whose width is bounded by min(n_tokens, dim) per doc.
    For the zero-shuffle dense path used by the similarity family, see
    :func:`embed_text_hash` (row-pinned consistent by test)."""
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).alias("t"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("t"))), 1, 15), 16, 10
    ).cast("long")
    feats = tok.select(
        "doc_id",
        F.pmod(h, F.lit(dim)).alias("bucket"),
        F.expr(f"CASE WHEN pmod({_H_SQL(salt)} DIV {dim}, 2) = 0 THEN 1 ELSE -1 END").alias(
            "s"
        ),
    )
    return feats.groupBy("doc_id", "bucket").agg(
        F.sum("s").cast("long").alias("w")
    )


def _H_SQL(salt: str) -> str:
    """The 60-bit token-hash expression as a SQL string (over column t) —
    shared by hashed_features' sign arm so bucket and sign provably read
    the SAME digest."""
    return (
        f"cast(conv(substring(md5(concat('{salt}:', t)), 1, 15), 16, 10) AS bigint)"
    )


def embed_text_hash(docs: DataFrame, dim: int = 64, salt: str = "emb") -> DataFrame:
    """Dense hashing-trick document embeddings — the deterministic,
    GPU-free vectorizer that bridges the `documents` table into the
    similarity family (cosine_topk / semdedup / d4 / ANN indexes all
    take its output directly). Replaces the reference's GPU embedding
    step (phase 2/src/embedder.py — CLIP/sentence-transformer calls)
    per the north rule: same role (text → fixed-dim vector feeding
    retrieval/dedup), engine-independent function of the stored bytes.

    embedding[b] = Σ_token sign(token), over the same (bucket, sign)
    hash as :func:`hashed_features` (consistency pinned by test).
    Counts are small integers, exactly representable in float32, so
    every downstream double cast is exact and the DuckDB replay is
    bit-identical.

    Output: (vec_id = doc_id, embedding array<float> length ``dim``,
    label 0) — the embeddings-table schema.

    Scale shape: ZERO shuffle — one Arrow-batched kernel pass with a
    per-batch token→(bucket, sign) memo (Zipf: one md5 per distinct
    token per batch; the classifier_score / winnow_fingerprints
    pattern). Embarrassingly parallel over doc partitions; at 100 TB
    this is a pure map stage whose output co-partitions with its input,
    so a following semdedup/ANN build starts from the same layout."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in it:
            vecs = []
            for text in pdf["text"]:
                v = np.zeros(dim, dtype=np.float32)
                for t in java_ws.split((text or "").lower()):
                    if not t:
                        continue
                    bs = memo.get(t)
                    if bs is None:
                        hv = int(
                            hashlib.md5((salt + ":" + t).encode()).hexdigest()[:15],
                            16,
                        )
                        bs = (hv % dim, np.float32(1.0 if (hv // dim) % 2 == 0 else -1.0))
                        memo[t] = bs
                    v[bs[0]] += bs[1]
                vecs.append(v.tolist())
            yield pd.DataFrame(
                {
                    "vec_id": pdf["doc_id"].astype("int64"),
                    "embedding": vecs,
                    "label": np.zeros(len(pdf), dtype="int32"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _batches, "vec_id long, embedding array<float>, label int"
    )
