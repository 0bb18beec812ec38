"""Near-dup cluster resolution: pair edges → transitive closure →
canonical-per-cluster surviving corpus.

The dedup family (ngram_jaccard_pairs / minhash_lsh_pairs /
simhash_near_pairs / embedding_cosine_dups) emits *pairs*; a training-data
pipeline's end product is the corpus deduplicated under the pairs'
TRANSITIVE closure (A~B, B~C ⇒ keep one of {A,B,C}). This module closes
that gap — the Spark-side counterpart of the reference's per-video
keep-chain dedup (phase 2/src/chunker.py frame dedup keeps one
representative per near-dup chain), lifted to corpus scale.

Scale design (min-label propagation):
- `connected_components` iterates  label ← min(label, min over neighbours'
  labels)  to a fixpoint. Each round is ONE shuffle join (edges ⋈ labels on
  the source node) plus ONE groupBy(dst).min — both with map-side partial
  aggregation; convergence is detected with a count of changed labels.
- Round count is the graph DIAMETER, and near-dup similarity graphs are
  shallow by construction: clusters produced by LSH blocking are cliques or
  hub stars (see dedup._bucket_pairs), so 2-4 rounds close real corpora.
  For pathological chain-shaped graphs the classic O(log n) alternating
  large-star/small-star rewriting (Kiveris et al., "Connected Components
  in MapReduce and Beyond", SoCC'14) is implemented as
  :func:`connected_components_star` — same output contract, pinned
  equivalent, and it closes a 60-hop chain in a handful of rounds where
  the propagation loop would need 60. Since round 5 the star variant is
  the DEFAULT closure behind neardup_clusters/neardup_survivors (and so
  the whole curation pipeline): the scale curve showed web_curate's wall
  at the 50k-doc tier was round-count-bound (propagation 271 s vs star
  168 s, identical rows); pass closure="propagation" to get the
  one-pass-per-round loop back for known-shallow clique graphs.
- Lineage is truncated every round (localCheckpoint) — an iterative plan
  otherwise doubles in depth per round and OOMs the planner long before the
  data is the problem. On a real cluster prefer reliable checkpointing
  (spark.sparkContext.setCheckpointDir on durable storage) so a lost
  executor does not recompute the whole iteration history.
- Skew: a giant cluster's hub node appears in m edges; AQE skew-join
  splitting handles the join side, and the min aggregation is associative
  so the combiner absorbs the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    a = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    b = pairs.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    return a.unionAll(b).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(doc_id, component) for every node appearing in ``pairs``, where
    component = the minimum doc_id reachable through the pair graph —
    a deterministic canonical cluster id.

    Only nodes that occur in at least one pair are returned (every other
    doc is its own trivial component; callers join against the corpus for
    the survivor view, see neardup_survivors).

    Raises RuntimeError if the propagation has not converged after
    ``max_iters`` rounds (a graph with diameter > max_iters — pathological
    for near-dup graphs, whose LSH-blocked clusters are cliques/stars).
    Silently returning partial labels would be WRONG components; raise the
    cap or switch to large-star/small-star rewriting for such graphs."""
    edges = _symmetric_edges(pairs, src, dst)
    # cache the (static) edge relation — it is re-joined every round
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    n_changed = 0
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["s"] == labels["node"])
            .groupBy(F.col("d").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # truncate lineage
        n_changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({n_changed} labels still changing) — graph diameter exceeds "
            "max_iters; raise it or use star-rewriting for chain-shaped graphs"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def neardup_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    closure: str = "star",
) -> DataFrame:
    """Cluster membership table: (doc_id, component, n_members) for every
    doc that belongs to a non-trivial near-dup cluster. n_members is the
    cluster size — one extra groupBy on the component key (map-side
    partial count) joined back along the same key.

    ``closure`` picks the components algorithm: ``"star"`` (default since
    round 5) = O(log n)-round large-star/small-star rewriting;
    ``"propagation"`` = min-label propagation (one shuffle round per hop
    of graph diameter). Both produce IDENTICAL labels (equivalence pinned
    by test_cluster_resolution); star became the default after the scale
    curve showed web_curate's 50k-doc wall was round-count-bound —
    271 s propagation vs 168 s star on the same tier, same rows."""
    cc_fn = connected_components_star if closure == "star" else connected_components
    cc = cc_fn(pairs, src, dst)
    sizes = cc.groupBy("component").agg(F.count("*").cast("long").alias("n_members"))
    return cc.join(sizes, "component").select("doc_id", "component", "n_members")


def neardup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    closure: str = "star",
) -> DataFrame:
    """The deduplicated corpus under transitive near-dup closure: every doc
    that is not in any cluster, plus each cluster's canonical (minimum
    doc_id) member. Output (doc_id, n_merged): n_merged = how many corpus
    docs this survivor represents (cluster size; 1 for unclustered docs).

    Plan: components over the pairs (iterative, see connected_components),
    then ONE left join of the corpus against the membership table — the
    corpus is never shuffled more than once, which is the property that
    matters at 100 TB (the membership table is |clustered docs| rows,
    orders of magnitude smaller than the corpus)."""
    members = neardup_clusters(pairs, src, dst, closure=closure)
    return (
        docs.select("doc_id")
        .join(members, "doc_id", "left")
        .where(F.col("component").isNull() | (F.col("doc_id") == F.col("component")))
        .select("doc_id", F.coalesce(F.col("n_members"), F.lit(1)).cast("long").alias("n_merged"))
    )


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — same output contract as :func:`connected_components`
    (doc_id, component = min reachable id; equivalence pinned by test), but
    O(log n) rounds in the graph DIAMETER instead of O(diameter): the
    operator for chain-shaped pair graphs where min-label propagation
    would need one shuffle round per hop.

      large-star: every neighbour v > u re-attaches to m(u) = min(Γ(u)∪{u})
      small-star: every neighbour v < u (and u itself) attaches to the
                  minimum of that ≤-neighbourhood

    Each round is two join+groupBy passes over the edge relation; the edge
    set only shrinks toward stars rooted at component minima. Fixpoint is
    detected on the canonical undirected edge set (count + order-invariant
    hash); lineage is truncated per round exactly like the propagation
    loop."""
    edges = _symmetric_edges(pairs, src, dst).where(F.col("s") != F.col("d"))
    edges = edges.localCheckpoint(eager=True)

    def _sym(e: DataFrame) -> DataFrame:
        return (
            e.select("s", "d")
            .unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
            .where(F.col("s") != F.col("d"))
            .distinct()
        )

    def _signature(e: DataFrame):
        canon = e.where(F.col("s") < F.col("d"))
        row = canon.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-invariant and overflow-free (ANSI sum of raw
            # 64-bit hashes overflows)
            F.expr("bit_xor(xxhash64(s, d))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        m = e.groupBy("s").agg(F.min("d").alias("mn"))
        m = m.select("s", F.least("s", "mn").alias("m"))
        return (
            e.join(m, "s")
            .where(F.col("d") > F.col("s"))
            .select(F.col("d").alias("s"), F.col("m").alias("d"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        le = e.where(F.col("d") < F.col("s"))
        m = le.groupBy("s").agg(F.min("d").alias("m"))
        nbr = le.join(m, "s").select(F.col("d").alias("v"), "m")
        self_ = m.select(F.col("s").alias("v"), "m")
        return (
            nbr.unionByName(self_)
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("s"), F.col("m").alias("d"))
        )

    sig = _signature(edges)
    converged = False
    for _ in range(max_rounds):
        edges = _sym(_large_star(edges))
        edges = _sym(_small_star(edges)).localCheckpoint(eager=True)
        new_sig = _signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"star rewriting did not reach a fixpoint in {max_rounds} rounds"
        )
    # at the fixpoint every edge is (member, component-min) in some
    # orientation: label = least(node, min neighbour)
    return (
        edges.groupBy("s")
        .agg(F.min("d").alias("mn"))
        .select(
            F.col("s").alias("doc_id"),
            F.least("s", "mn").alias("component"),
        )
    )


def soft_dedup(
    docs: DataFrame, pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates (the
    neardup_survivors contract), DOWN-WEIGHT every member of a near-dup
    cluster so the cluster's total training mass equals one document —
    the "count each distinct piece of content once, however many copies
    exist" policy from data-constrained LM scaling work (repeating
    content is worth less than fresh content, but not worth zero).

    Output (doc_id, n_members, weight_e6) for EVERY corpus doc:
    n_members = transitive near-dup cluster size (1 for unclustered),
    weight_e6 = 1000000 DIV n_members. Integer e6 fixed point; both
    operands non-negative so Spark DIV ≡ DuckDB // (the pinned
    cross-engine division contract). Σ weight_e6 over a cluster is
    ≤ 1e6 (floor per member), never more — the conservative side.

    Plan shape is neardup_survivors': components over the pairs
    (iterative min-label propagation, cluster-sized relation), then ONE
    left join of the corpus against the membership table — the corpus
    shuffles once; the weight is an intra-row expression after that.
    Composes with sampling.weighted_sample / quota_mixture downstream
    (weight_col="weight_e6")."""
    members = neardup_clusters(pairs, src, dst)
    return (
        docs.select("doc_id")
        .join(members.select("doc_id", "n_members"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_members"), F.lit(1)).cast("long").alias("n_members"),
        )
        .withColumn(
            "weight_e6", F.expr("1000000 DIV n_members").cast("long")
        )
    )
