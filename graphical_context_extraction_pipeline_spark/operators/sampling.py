"""Deterministic corpus sampling, splitting, and sequence packing — the
batch-preparation operators a training-data pipeline runs after curation.

All assignment decisions derive from the portable md5 bucket hash (first 15
hex digits of md5(salt || key) as bigint, same construction as the dedup
family) so the DuckDB oracle recomputes every bucket bit-for-bit and the
assignment is stable across runs, engines, and partitionings — re-running
the pipeline on a grown corpus never reassigns an existing document's
split/sample (the property per-partition `rand()` cannot give you).

Scale notes:
  - hash_split / stratified_sample are pure narrow projections + filters —
    zero shuffle, fully pushed into the scan stage.
  - pack_sequences shuffles once on the salt bucket; each bucket packs
    independently in an Arrow-batched grouped-map kernel. Bucket count is a
    caller knob: size it so a bucket's docs fit one task (at 100 TB,
    n_buckets ≈ corpus_tokens / (budget · seqs_per_task) keeps groups
    bounded); packing quality is unaffected because bins never span buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import _tokens


def hash_bucket(col, salt: str, mod: int):
    """Deterministic bucket in [0, mod): first 15 hex digits of
    md5(salt || value) as bigint, modulo `mod`. Identical in DuckDB as
    cast(('0x' || substr(md5(salt || cast(v AS varchar)), 1, 15)) AS bigint) % mod.
    """
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10
        ).cast("long"),
        F.lit(mod),
    )


def hash_split(docs: DataFrame, train_bp: int = 9600, val_bp: int = 9800) -> DataFrame:
    """Deterministic train/val/test split by content-independent doc_id hash:
    bucket = md5-bucket(doc_id) in [0, 10000); split boundaries in basis
    points (defaults 96% / 2% / 2%). Narrow, zero-shuffle, stable under
    corpus growth."""
    b = hash_bucket(F.col("doc_id"), "split:", 10000)
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < train_bp, F.lit("train"))
        .when(b < val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(
    docs: DataFrame, rates_bp: dict[str, int], default_bp: int = 0
) -> DataFrame:
    """Deterministic per-stratum (language) downsample: keep a doc iff its
    md5 bucket (salt 'sample:') falls below the stratum's rate in basis
    points. Gives exact-in-expectation per-language fractions with zero
    shuffle and reproducible membership."""
    b = hash_bucket(F.col("doc_id"), "sample:", 10000)
    rate = F.lit(default_bp)
    for lang, bp in sorted(rates_bp.items()):
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", b.alias("bucket"), rate.alias("rate_bp"))
        .where(F.col("bucket") < F.col("rate_bp"))
        .select("doc_id", "lang", "bucket")
    )


def mixture_sample(docs: DataFrame, weights_bp: dict[str, int]) -> DataFrame:
    """Resample the corpus to a target per-source mixture (weights in basis
    points, e.g. {"web": 5000, "code": 3000, "wiki": 2000}): the largest
    deterministic subsample whose expected composition matches the target.

    The feasible total is set by the LIMITING source — T = min over weighted
    sources of (count_s · 10000) div w_bp_s — and each source keeps
    accept_bp_s = (T · w_bp_s) div count_s ≤ 10000 of its docs by md5
    bucket (salt 'mix:'), so membership is reproducible and stable across
    runs. Sources with no weight (or absent from `weights_bp`) are dropped.
    Integer-only arithmetic: T·w_bp ≤ 10^16 even at the 10^12-doc contract
    scale, two orders of magnitude inside int64.

    Scale: per-source counts are one partial-aggregated shuffle collapsing
    to ≤|sources| rows; the acceptance table (|sources| rows) broadcasts
    back, so the corpus itself is scanned once and never shuffled."""
    wcol = F.lit(0).cast("long")
    for src, bp in sorted(weights_bp.items()):
        wcol = F.when(F.col("source") == src, F.lit(bp).cast("long")).otherwise(wcol)
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("source", "cnt", wcol.alias("w_bp"))
        .where(F.col("w_bp") > 0)
    )
    total = counts.agg(F.min(F.expr("(cnt * 10000) div w_bp")).alias("t_total"))
    accept = counts.crossJoin(F.broadcast(total)).select(
        "source",
        F.least(F.lit(10000).cast("long"), F.expr("(t_total * w_bp) div cnt")).alias(
            "accept_bp"
        ),
    )
    b = hash_bucket(F.col("doc_id"), "mix:", 10000)
    return (
        docs.join(F.broadcast(accept), "source")
        .select("doc_id", "source", b.alias("bucket"), "accept_bp")
        .where(F.col("bucket") < F.col("accept_bp"))
    )


def select_token_budget(docs: DataFrame, budget: int) -> DataFrame:
    """Greedy quality-first corpus selection under a global token budget:
    visit docs in (passes_quality desc, stopword_bp desc, doc_id asc) order
    and keep each doc whose inclusive cumulative token count stays ≤
    `budget` — the standard "best docs until the budget runs out" cut.

    The global prefix sum is computed WITHOUT a global sort: the ordering
    key's leading components (passes_quality, stopword_bp) become a coarse
    bucket, per-bucket token totals (≤ 2·10001 rows) get their running
    offsets on the aggregated side, and each doc adds a WITHIN-bucket
    running sum partitioned by its bucket. Because the bucket IS the prefix
    of the sort key and the intra-bucket order (doc_id) is its suffix, the
    two-phase sum equals the single-ordering cumsum exactly — the DuckDB
    oracle computes the naive global window and must match row-for-row.

    Scale: one corpus shuffle (the per-bucket window); the only unbounded
    window orders the KB-scale bucket relation. A bucket heavy in one
    stopword_bp value sorts externally (spills, not OOMs)."""
    from pyspark.sql import Window

    from .text_analysis import quality_score

    q = quality_score(docs).select(
        "doc_id", "n_tokens", "stopword_bp", F.col("passes_quality").cast("int").alias("pq")
    )
    bucket_tot = q.groupBy("pq", "stopword_bp").agg(F.sum("n_tokens").alias("btok"))
    wb = Window.orderBy(F.desc("pq"), F.desc("stopword_bp"))
    offsets = bucket_tot.select(
        "pq", "stopword_bp", (F.sum("btok").over(wb) - F.col("btok")).alias("offset")
    )
    ww = Window.partitionBy("pq", "stopword_bp").orderBy("doc_id")
    return (
        q.join(F.broadcast(offsets), ["pq", "stopword_bp"])
        .select(
            "doc_id",
            F.col("pq").cast("boolean").alias("passes_quality"),
            "stopword_bp",
            "n_tokens",
            (F.col("offset") + F.sum("n_tokens").over(ww)).cast("long").alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= budget)
    )


def _firstfit_fold(budget: int):
    """The first-fit-sequential grouped-map kernel shared by
    pack_sequences and semantic_packing: visit the group's docs in
    doc_id order, open a new bin exactly when fill + n would exceed
    ``budget`` (oversize docs get singleton bins)."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, fills = [], []
        seq, fill = 0, None
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n > budget:
                seq, fill = seq + 1, n
            else:
                fill += n
            seqs.append(seq)
            fills.append(fill)
        pdf["seq_idx"] = pd.Series(seqs, dtype="int64")
        pdf["fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return _pack


def pack_sequences(docs: DataFrame, budget: int = 512, n_buckets: int = 8) -> DataFrame:
    """Greedy first-fit-sequential sequence packing: assign docs to fixed
    token-budget training sequences (bins). Docs are dealt to `n_buckets`
    salt buckets by doc_id hash; within a bucket, docs are visited in
    doc_id order and a new bin opens exactly when the incumbent bin's fill
    plus the doc's whitespace-token count would exceed `budget` (an
    oversize doc therefore always occupies a singleton bin). Emits one row
    per doc: (doc_id, bucket, n_tokens, seq_idx, fill) with `fill` the
    bin's running token total after the doc is placed.

    The per-bucket fold is inherently sequential (a reset-on-overflow
    cumulative sum — not window-expressible), so it runs as an
    Arrow-batched grouped-map kernel; everything before it is JVM-side.
    The DuckDB oracle replays the identical fold as a recursive CTE, so
    this stays a fully independently-checked operator despite the kernel.
    """
    base = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), "pack:", n_buckets).alias("bucket"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )

    return base.groupBy("bucket").applyInPandas(
        _firstfit_fold(budget),
        "doc_id long, bucket long, n_tokens long, seq_idx long, fill long",
    )


def topk_priority(doc_id_col):
    """The md5 bottom-k priority (salt 'topk:') shared by :func:`sample_k`
    and its streaming twin (streaming/sampling.py) — keeping the two on
    one expression is what makes the batch ≡ stream law an identity."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("topk:"), doc_id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def sample_k(docs: DataFrame, k: int = 10) -> DataFrame:
    """Exact-k deterministic sample per source: the k docs with the
    smallest md5 priority (salt 'topk:') — a reproducible uniform draw
    whose membership is an order statistic, so it is identical across
    runs, engines, and partitionings (the md5-priority reservoir idea the
    IVF codebook seeding already uses). (source, doc_id, rk) with rk the
    1-based priority rank.

    Scale: classic two-phase distributed bottom-k — each scan partition
    keeps its own local bottom-k first (window over (source, partition),
    parallel, no skew because partition ids spread every source), then the
    global rank runs over the ≤ k·n_partitions survivors. A single-phase
    per-source window would funnel each source's ENTIRE row stream through
    one sort chain; two-phase output is provably identical (the global
    bottom-k is contained in every partition-local bottom-k union — pinned
    by test) while only priorities, never text, enter either exchange."""
    from pyspark.sql import Window

    pri = topk_priority(F.col("doc_id"))
    base = docs.select("source", "doc_id", pri.alias("priority")).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("source", "pid").orderBy("priority", "doc_id")
    survivors = (
        base.withColumn("lrk", F.row_number().over(w_local)).where(F.col("lrk") <= k)
    )
    w_global = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w_global).cast("long"))
        .where(F.col("rk") <= k)
        .select("source", "doc_id", "rk")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    train_bp: int = 9600,
    val_bp: int = 9800,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: the split unit is the near-dup CLUSTER, not the document.
    Every member of a connected component (transitive closure over
    ``pairs``) hashes on the component id, so near-identical documents
    land in the same split by construction — the eval-contamination mode
    plain hash_split cannot prevent. Unclustered docs hash on their own
    id with the SAME salt, so their assignment is identical to
    hash_split's (the two splits differ only where dup structure exists).

    Emits (doc_id, split_key, bucket, split). Plan: components over the
    pairs relation (iterative, bounded by the dup graph, orders of
    magnitude below corpus size), then ONE corpus join against the
    membership table — broadcast when the dup graph is small.
    """
    from .cluster import connected_components

    cc = connected_components(pairs, src, dst)
    key = F.coalesce(F.col("component"), F.col("doc_id"))
    b = hash_bucket(key, "split:", 10000)
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            key.cast("long").alias("split_key"),
            b.alias("bucket"),
            F.when(b < train_bp, F.lit("train"))
            .when(b < val_bp, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def epoch_shuffle(docs: DataFrame, epoch: int, n_shards: int = 16) -> DataFrame:
    """Reproducible training-order shuffle: every epoch deals documents
    into ``n_shards`` shards with a deterministic within-shard order —
    (doc_id, shard, pos) where shard and position derive ONLY from
    (epoch, doc_id) via portable md5. Re-running the job, changing the
    partitioning, or regenerating on another cluster yields byte-identical
    shard files; a different epoch yields an independent permutation —
    the property data loaders need for resumable multi-epoch training
    without materializing a global random order.

    Plan: the shard deal is a hash projection (zero shuffle); positions
    are per-shard windows over (priority, doc_id) — n_shards parallel
    sort chains, each ~|corpus|/n_shards rows, no global sort or
    single-partition funnel.
    """
    from pyspark.sql import Window

    pri = hash_bucket(F.col("doc_id"), f"epoch{epoch}:", 1 << 40)
    shard = hash_bucket(F.col("doc_id"), f"shard{epoch}:", n_shards)
    w = Window.partitionBy("shard").orderBy("priority", "doc_id")
    return (
        docs.select("doc_id", shard.alias("shard"), pri.alias("priority"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def weighted_sample(
    docs: DataFrame, k: int = 100, weight_col: str = "n_chars", id_col: str = "doc_id"
) -> DataFrame:
    """Exactly-k systematic probability-proportional-to-size draw:
    (doc_id, weight, n_picks) for every document selected at least once,
    with Σ n_picks = k exactly. This is the mixture-construction sampler —
    "give me k documents proportional to quality/length/domain weight" —
    as a deterministic order statistic rather than an RNG draw, so the
    result is identical across runs, engines, and partitionings.

    Construction (all integer): lay the documents end to end on the
    weight axis in doc_id order (exact global cumulative weights via
    partitioning.global_cumsum — no single-partition window); drop the k
    midpoint grid points p_j = ⌊(2j+1)·W / 2k⌋ onto the axis; a document
    is picked once per grid point strictly inside its (cum−w, cum]
    interval. The count needs no per-point join: #{j : p_j < x} collapses
    to f(x) = (2kx + W − 1) DIV (2W) — numerator non-negative for every
    x ≥ 0, so Spark's truncating DIV and DuckDB's flooring // agree (the
    pinned cross-engine division rule) — and n_picks = f(cum) − f(cum−w).
    Σ n_picks telescopes to f(W) − f(0) = k, exactly.

    Heavy documents (w > W/k) legitimately receive multiple picks —
    that's PPS-with-replacement semantics on a systematic grid; consumers
    wanting at-most-once should cap weights at W/k upstream.

    Rows with weight ≤ 0 are unsampleable and dropped before the cumsum.
    int64 budget: 2k·W must stay under 2^63 — at k=10^6 that bounds total
    corpus weight to ~4.6·10^12; pre-scale weights (w DIV 2^s) when the
    corpus mass is larger, exactly like the fixed-point estimators.
    """
    from .partitioning import global_cumsum

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(weight_col).cast("long").alias("weight")
    ).where(F.col(weight_col) > 0)
    withw = global_cumsum(base, ["doc_id"], "weight", "cum", total_col="W")

    def f(x):
        # 2k is computed in Python so it lands as ONE bigint literal —
        # "2 * {k}" would constant-fold in int32 under ANSI and overflow
        # for k > 2^30 (the top_terms idf-literal lesson)
        return F.expr(f"({2 * k} * ({x}) + W - 1) DIV (2 * W)")

    return (
        withw.withColumn("n_picks", (f("cum") - f("cum - weight")).cast("long"))
        .where(F.col("n_picks") >= 1)
        .select("doc_id", "weight", "n_picks")
    )


def quota_mixture(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """The mixture constructor, end to end: apportion exactly ``k`` picks
    across sources by Hamilton largest remainder over each source's total
    weight (urls.crawl_budget — Σ slots = k exactly), then draw each
    source's slots by the systematic PPS grid (:func:`weighted_sample`'s
    arithmetic) over that source's own documents. Emits
    (source, doc_id, weight, n_picks) with Σ n_picks = k — the "sample a
    training mixture proportional to source mass, then proportional to
    document quality within each source" recipe as one deterministic,
    engine-replayable operator.

    Scale: ONE range-partitioned sort by (source, doc_id) gives every
    source a contiguous run, so a single :func:`global_cumsum` serves all
    sources — no per-source window funnel even when one source dominates
    the corpus. The per-source metadata (total, slots, cumulative base of
    earlier sources) is a source-count-sized relation folded on the
    driver and broadcast back, the same tiny-relation pattern as
    global_rank's offset map. int64 budget: 2k·W per the weighted_sample
    note.
    """
    from .partitioning import global_cumsum

    base = docs.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
    ).where(F.col(weight_col) > 0)
    c = global_cumsum(base, ["source", "doc_id"], "weight", "cum")
    totals = base.groupBy("source").agg(F.sum("weight").alias("w_src"))
    # Hamilton on the driver: the source relation is mixture-scale
    # (dozens–thousands) and already has to come back for the broadcast
    # meta anyway — urls.crawl_budget is the distributed twin of this
    # exact arithmetic (floors + largest remainders, ties source asc) for
    # domain-scale relations; equality is pinned by test
    trows = sorted(
        ((r["source"], int(r["w_src"])) for r in totals.collect()), key=lambda t: t[0]
    )
    total_w = sum(w for _, w in trows)
    if total_w <= 0 or k <= 0:
        return c.select("source", "doc_id", "weight").limit(0).withColumn(
            "n_picks", F.lit(0).cast("long")
        )
    floors = [(src, w, (k * w) // total_w, (k * w) % total_w) for src, w in trows]
    deficit = k - sum(fl for _, _, fl, _ in floors)
    extra = {
        src
        for src, _, _, _ in sorted(floors, key=lambda t: (-t[3], t[0]))[:deficit]
    }
    meta_rows, acc = [], 0
    for src, w, fl, _ in floors:
        meta_rows.append((src, w, fl + (1 if src in extra else 0), acc))
        acc += w
    meta = docs.sparkSession.createDataFrame(
        meta_rows or [("", 0, 0, 0)], "source string, w_src long, slots long, base long"
    )
    j = c.join(F.broadcast(meta), "source")

    def f(x):
        return F.expr(f"(2 * slots * ({x}) + w_src - 1) DIV (2 * w_src)")

    return (
        j.withColumn("cum_s", F.col("cum") - F.col("base"))
        .withColumn("n_picks", (f("cum_s") - f("cum_s - weight")).cast("long"))
        .where(F.col("n_picks") >= 1)
        .select("source", "doc_id", "weight", "n_picks")
    )


def dsir_scores(
    docs: DataFrame,
    target_sources: list[str],
    n_buckets: int = 256,
    salt: str = "dsir:",
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-unigram features are under a small
    in-domain TARGET distribution than under the raw corpus, so the
    pipeline can resample raw web mass toward the target domain.

    Feature space: tokens hashed into ``n_buckets`` md5 buckets (the
    portable bucket construction above, salt ``dsir:``). Both unigram LMs
    are Laplace-smoothed bucket histograms; the per-doc log importance
    weight is, in e6 fixed point,

        logw_e6 = sum_tokens [ln_e6(t_cnt[b]+1) - ln_e6(s_cnt[b]+1)]
                  - n_tokens * (ln_e6(T + B) - ln_e6(S + B))

    with t/s the target/raw bucket counts, T/S their totals, and ln_e6 the
    pure-integer recurrence from functions/intmath.py — so the oracle
    recomputes every score bit-for-bit (no float ln anywhere). True DSIR
    then draws Gumbel-top-k on logw; the deterministic scored relation is
    the contract here, and the draw composes with weighted_sample /
    topk_priority downstream.

    int64 budget: |ln_e6(x)| <= 4.4e7 for x < 2^63, so a doc needs ~2e11
    tokens to overflow the signed-64 sum — five orders above any real doc.

    Scale: the histogram pass is one bucket-bounded shuffle (<= n_buckets
    rows out of the partial aggregation, map-side combined); scoring is a
    ZERO-shuffle projection — the per-bucket log-ratios are driver-folded
    into a literal map (bm25-idf precedent) and each doc reduces its own
    token array intra-row. At 100 TB nothing but the B-row histogram ever
    crosses the wire.
    """
    from ..functions.intmath import ln_e6

    toks = _tokens(F.col("text"))
    tok = docs.select(
        "source", F.explode(toks).alias("token")
    ).withColumn("b", hash_bucket(F.col("token"), salt, n_buckets))
    s_rows = tok.groupBy("b").count().collect()
    t_rows = (
        tok.where(F.col("source").isin(list(target_sources)))
        .groupBy("b")
        .count()
        .collect()
    )
    s_cnt = {r["b"]: r["count"] for r in s_rows}
    t_cnt = {r["b"]: r["count"] for r in t_rows}
    s_tot = sum(s_cnt.values())
    t_tot = sum(t_cnt.values())
    c_e6 = ln_e6(t_tot + n_buckets, 1) - ln_e6(s_tot + n_buckets, 1)

    pairs: list = []
    for b in range(n_buckets):
        lr = ln_e6(t_cnt.get(b, 0) + 1, 1) - ln_e6(s_cnt.get(b, 0) + 1, 1)
        pairs.extend([F.lit(b), F.lit(lr)])
    lr_map = F.create_map(*pairs)

    per_tok = F.transform(
        toks, lambda t: F.element_at(lr_map, hash_bucket(t, salt, n_buckets).cast("int"))
    )
    n_tok = F.size(toks).cast("long")
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        (
            F.aggregate(per_tok, F.lit(0).cast("long"), lambda acc, x: acc + x)
            - n_tok * F.lit(c_e6)
        ).alias("logw_e6"),
    )


def dsir_select(
    docs: DataFrame,
    target_sources: list[str],
    k: int,
    n_buckets: int = 256,
    salt: str = "dsir:",
) -> DataFrame:
    """Top-k DSIR selection: the k docs whose hashed-unigram importance
    weight vs the target domain is highest ((logw_e6, doc_id) ordered so
    ties never flap). orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row driver merge, no global sort, no
    SinglePartition window."""
    return (
        dsir_scores(docs, target_sources, n_buckets=n_buckets, salt=salt)
        .orderBy(F.col("logw_e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _temper(w: int, alpha_q: int) -> int:
    """size^(alpha_q/4) in floored-integer form, built ONLY from IEEE
    double sqrt + floor so the oracle replays it bit-for-bit (sqrt is
    correctly rounded in Python, the JVM, and DuckDB — the pinned
    cross-engine contract from the int8 quantizer; ln/exp/pow are NOT):

        alpha_q=4: w
        alpha_q=2: floor(sqrt(w))
        alpha_q=3: floor(sqrt(w * floor(sqrt(w))))
        alpha_q=1: floor(sqrt(floor(sqrt(w))))

    q ∈ {1,2,4} track floor(w^(q/4)) within 1; q=3 is its own monotone
    tempering curve bounded by w^(3/4) − w^(1/4) − 1 ≤ v ≤ w^(3/4) (the
    inner floor's lost fraction is amplified by the outer sqrt — fine
    for mixture weights, do not use it as an exact quantile).

    int64→double budget: every sqrt operand must stay under 2^53 for the
    int→double conversion to be exact — w < 2^53 covers alpha_q ∈ {1,2},
    and alpha_q=3 needs w^1.5 < 2^53 i.e. w < ~2^35 (3.4e10). Per-SOURCE
    character totals at 100 TB can exceed that: pre-scale (w DIV 2^s)
    upstream exactly like the fixed-point estimators."""
    import math

    if alpha_q == 4:
        return w
    if alpha_q == 2:
        return math.floor(math.sqrt(w))
    if alpha_q == 3:
        return math.floor(math.sqrt(w * math.floor(math.sqrt(w))))
    if alpha_q == 1:
        return math.floor(math.sqrt(math.floor(math.sqrt(w))))
    raise ValueError(f"alpha_q must be in {{1,2,3,4}}, got {alpha_q}")


def temper_sql(expr: str, alpha_q: int) -> str:
    """The DuckDB twin of :func:`_temper` over a SQL expression."""
    if alpha_q == 4:
        return expr
    if alpha_q == 2:
        return f"cast(floor(sqrt(cast(({expr}) AS double))) AS bigint)"
    if alpha_q == 3:
        inner = f"cast(floor(sqrt(cast(({expr}) AS double))) AS bigint)"
        return f"cast(floor(sqrt(cast(({expr}) * {inner} AS double))) AS bigint)"
    if alpha_q == 1:
        inner = f"cast(floor(sqrt(cast(({expr}) AS double))) AS bigint)"
        return f"cast(floor(sqrt(cast({inner} AS double))) AS bigint)"
    raise ValueError(f"alpha_q must be in {{1,2,3,4}}, got {alpha_q}")


def temperature_mixture(
    docs: DataFrame,
    k: int = 100,
    alpha_q: int = 2,
    weight_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-flattened source mixture (the XLM-R / mT5 recipe:
    sample sources with p ∝ size^α, α < 1, so head sources stop drowning
    the tail): Hamilton largest-remainder apportionment of exactly ``k``
    picks across sources over the TEMPERED totals size^(alpha_q/4)
    (:func:`_temper` — floored IEEE-sqrt composition, engine-replayable),
    then each source's slots drawn by the systematic PPS grid over that
    source's RAW document weights — tempering reshapes the across-source
    mixture, not the within-source quality signal.

    alpha_q=4 degrades to quota_mixture exactly (pinned by test);
    alpha_q=2 is α=0.5, the common flattening.

    Scale shape is quota_mixture's verbatim: ONE range-partitioned
    (source, doc_id) cumsum serves every source; the per-source meta
    (raw total, tempered total, slots, base) is a source-count-sized
    relation folded on the driver and broadcast back. Σ n_picks = k
    exactly (Hamilton exactness + the telescoping grid)."""
    from .partitioning import global_cumsum

    base = docs.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
    ).where(F.col(weight_col) > 0)
    c = global_cumsum(base, ["source", "doc_id"], "weight", "cum")
    totals = base.groupBy("source").agg(F.sum("weight").alias("w_src"))
    trows = sorted(
        ((r["source"], int(r["w_src"])) for r in totals.collect()), key=lambda t: t[0]
    )
    tempered = [(src, w, _temper(w, alpha_q)) for src, w in trows]
    total_t = sum(t for _, _, t in tempered)
    if total_t <= 0 or k <= 0:
        return c.select("source", "doc_id", "weight").limit(0).withColumn(
            "n_picks", F.lit(0).cast("long")
        )
    floors = [
        (src, w, (k * t) // total_t, (k * t) % total_t) for src, w, t in tempered
    ]
    deficit = k - sum(fl for _, _, fl, _ in floors)
    extra = {
        src for src, _, _, _ in sorted(floors, key=lambda t: (-t[3], t[0]))[:deficit]
    }
    meta_rows, acc = [], 0
    for src, w, fl, _ in floors:
        meta_rows.append((src, w, fl + (1 if src in extra else 0), acc))
        acc += w
    meta = docs.sparkSession.createDataFrame(
        meta_rows or [("", 0, 0, 0)], "source string, w_src long, slots long, base long"
    )
    j = c.join(F.broadcast(meta), "source")

    def f(x):
        return F.expr(f"(2 * slots * ({x}) + w_src - 1) DIV (2 * w_src)")

    return (
        j.withColumn("cum_s", F.col("cum") - F.col("base"))
        .withColumn("n_picks", (f("cum_s") - f("cum_s - weight")).cast("long"))
        .where(F.col("n_picks") >= 1)
        .select("source", "doc_id", "weight", "n_picks")
    )


def temper_expr(col, alpha_q: int):
    """Spark-expression twin of :func:`_temper` (floored IEEE-sqrt
    composition; java.lang.Math.sqrt is correctly rounded, same contract
    as the python/DuckDB twins). Needed where the tempered relation is
    corpus-scale (e.g. a vocabulary) and driver-side tempering can't
    apply; same int64→double budget notes as _temper."""
    c = col.cast("double")
    if alpha_q == 4:
        return col.cast("long")
    if alpha_q == 2:
        return F.floor(F.sqrt(c)).cast("long")
    if alpha_q == 3:
        inner = F.floor(F.sqrt(c)).cast("long")
        return F.floor(F.sqrt((col.cast("long") * inner).cast("double"))).cast("long")
    if alpha_q == 1:
        inner = F.floor(F.sqrt(c)).cast("long")
        return F.floor(F.sqrt(inner.cast("double"))).cast("long")
    raise ValueError(f"alpha_q must be in {{1,2,3,4}}, got {alpha_q}")


def negative_sampling(docs: DataFrame, k: int = 1000, alpha_q: int = 3) -> DataFrame:
    """word2vec negative-sampling table (Mikolov et al. 2013): draw ``k``
    negatives from the vocabulary with p ∝ count^(3/4) (``alpha_q``/4 —
    3 is the paper's exponent), as the exactly-k systematic PPS draw
    over the TEMPERED unigram counts.

    Output: (token, cnt, weight, n_picks) for every token drawn at least
    once, Σ n_picks = k exactly — the materialized alias table a trainer
    samples from (frequent tokens receive multiple slots, exactly the
    unigram-table construction, but deterministic and partition-invariant
    instead of an RNG draw).

    Scale: one (token) count shuffle bounded by vocabulary size; the
    tempering is a per-row expression (:func:`temper_expr`) and the draw
    is :func:`weighted_sample`'s distributed prefix sum — no
    SinglePartition stage anywhere. int64 budget: 2k·Σcnt^(3/4) under
    2^63, looser than the raw-count budget by the tempering itself.
    """
    from .text_analysis import _tokens

    vocab = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tempered = vocab.select(
        "token", "cnt", temper_expr(F.col("cnt"), alpha_q).alias("w")
    )
    picked = weighted_sample(tempered, k=k, weight_col="w", id_col="token")
    return (
        picked.withColumnRenamed("doc_id", "token")
        .join(vocab, "token")
        .select("token", "cnt", "weight", "n_picks")
    )


def semantic_packing(
    docs: DataFrame,
    emb: DataFrame,
    budget: int = 512,
    n_centroids: int = 16,
) -> DataFrame:
    """In-context semantic packing (Shi et al. 2023, "In-Context
    Pretraining: Language Modeling Beyond Document Boundaries"): pack
    RELATED documents into the same fixed-budget training sequences, so
    each packed sequence reads as topically-coherent long context instead
    of random concatenation. Cluster ids come from the n_iters=0
    seeded-reservoir codebook (engine-independent, the semdedup/ivf
    argument); within a cluster the first-fit fold is IDENTICAL to
    pack_sequences (shared kernel), visiting docs in doc_id order.

    Output: (doc_id, cid, n_tokens, seq_idx, fill) — one row per packed
    doc; docs without an embedding row are not packable and drop out at
    the join (document the id space: doc_id ≡ vec_id).

    Scale: one assignment scan (codebook literals), one doc_id equi-join,
    one grouped-map fold keyed on cid — the same bounded-group shape as
    pack_sequences with the hash bucket replaced by the semantic one.
    At 10^12 docs, n_centroids scales with the corpus exactly as
    semdedup's does (clusters ≈ group state per task)."""
    from .similarity import ivf_assign, ivf_centroids
    from .text_analysis import _tokens

    cents = ivf_centroids(emb, n_centroids, n_iters=0)
    if not cents:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, cid long, n_tokens long, seq_idx long, fill long"
        )
    cid = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("doc_id"), F.col("cid").cast("long").alias("cid")
    )
    base = docs.select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    ).join(cid, "doc_id")
    return base.groupBy("cid").applyInPandas(
        _firstfit_fold(budget),
        "doc_id long, cid long, n_tokens long, seq_idx long, fill long",
    )


def span_corruption(
    docs: DataFrame,
    block: int = 3,
    mask_mod: int = 7,
) -> DataFrame:
    """T5-style span-corruption pretraining pairs (Raffel et al. 2020):
    mask aligned ``block``-token spans and emit (input_text, target_text)
    — the input has each masked span replaced by its ``<extra_id_k>``
    sentinel, the target lists sentinel + removed tokens per span and
    ends with the final sentinel (the T5 convention).

    DETERMINISTIC mask choice instead of an RNG: block j of document d
    is masked iff md5-bucket('mask:' d ':' j) % mask_mod == 0 — the
    portable hash_bucket construction, so masking is reproducible across
    runs/retries/engines and the DuckDB oracle replays it. Aligned
    blocks make selection stateless (no overlap bookkeeping); each
    masked block is its own span, sentinel k = its rank among the doc's
    masked blocks (adjacent masked blocks keep distinct sentinels —
    documented divergence from T5's span merging, chosen so the
    construction stays one local decision per block). block=3,
    mask_mod=7 ≈ the paper's ~15% at mean span 3.

    Output: (doc_id, n_tokens, n_masked, input_text, target_text);
    empty docs pass through with empty strings.

    Scale: ZERO shuffle — one Arrow-batched kernel over (doc_id, text)
    (the classifier_score pattern; a pure-expression build needs a
    per-position prefix rank, O(n²) interpreted per row — the pinned
    fold trap)."""
    import hashlib
    import re
    from typing import Iterator

    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _masked(doc_id, j: int) -> bool:
        h = int(
            hashlib.md5(f"mask:{doc_id}:{j}".encode()).hexdigest()[:15], 16
        )
        return h % mask_mod == 0

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "n_tokens": [], "n_masked": [],
                   "input_text": [], "target_text": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in java_ws.split((text or "").lower()) if t]
                n = len(toks)
                inp, tgt = [], []
                n_masked = 0
                k = 0
                for j in range(0, (n + block - 1) // block):
                    seg = toks[j * block : (j + 1) * block]
                    if _masked(doc_id, j):
                        inp.append(f"<extra_id_{k}>")
                        tgt.append(f"<extra_id_{k}>")
                        tgt.extend(seg)
                        n_masked += len(seg)
                        k += 1
                    else:
                        inp.extend(seg)
                if k > 0:
                    tgt.append(f"<extra_id_{k}>")
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["n_masked"].append(n_masked)
                out["input_text"].append(" ".join(inp))
                out["target_text"].append(" ".join(tgt))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        _batches,
        "doc_id long, n_tokens long, n_masked long, input_text string, target_text string",
    )


def unimax_budgets(
    docs: DataFrame,
    budget: int = 400_000,
    epoch_cap_bp: int = 30_000,
    weight_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a total training budget across sources so that
    no source is repeated more than ``epoch_cap_bp``/10000 epochs, and
    whatever the capped (low-resource) sources cannot absorb flows to
    the sources that still have headroom. The temperature knob the
    ``temperature_mixture`` family tunes by feel, replaced by one
    interpretable parameter: the maximum epoch count.

    Water-filling, in the paper's sequential form, all integer: visit
    sources in ascending weight order (ties: source asc); at each step
    with ``k_left`` sources unvisited, allocate
    ``min((epoch_cap_bp·n) DIV 10000, remaining DIV k_left)`` and deduct
    it. Small sources hit their epoch cap and release budget; the
    released budget raises the fair share of every later (larger)
    source. Σ budget ≤ ``budget`` with equality whenever the cap mass
    Σ caps ≥ ``budget``.

    Output: (source, n_weight, budget, epochs_bp), epochs_bp =
    (10000·budget) DIV n_weight ≤ epoch_cap_bp. Rows with non-positive
    total weight are unallocatable and dropped.

    Scale: one partial-agg shuffle builds the per-source totals; the
    water-filling itself is O(n_sources) driver arithmetic over that
    mixture-scale relation (dozens–thousands of rows — the same bounded
    collect as :func:`quota_mixture`'s Hamilton fold and bpe_learn's
    merge-table). Document weights never leave the executors; both
    engines replay the loop bit-for-bit because every division is a
    floor on non-negative operands (the pinned DIV/`//` rule).
    """
    totals = (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col(weight_col) > 0)
        .groupBy("source")
        .agg(F.sum("w").alias("n"))
    )
    rows = sorted(
        ((r["source"], int(r["n"])) for r in totals.collect()),
        key=lambda t: (t[1], t[0]),
    )
    out, remaining = [], int(budget)
    for i, (src, n) in enumerate(rows):
        k_left = len(rows) - i
        alloc = min((epoch_cap_bp * n) // 10000, remaining // k_left)
        remaining -= alloc
        out.append((src, n, alloc, (10000 * alloc) // n))
    return docs.sparkSession.createDataFrame(
        out or [("", 0, 0, 0)],
        "source string, n_weight long, budget long, epochs_bp long",
    ).where(F.col("n_weight") > 0)
