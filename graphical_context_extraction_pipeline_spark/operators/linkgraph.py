"""Link-graph analytics over the crawl: edges, degrees, PageRank.

Web-corpus curation uses the hyperlink graph for quality priors (domains
nobody links to are disproportionately spam — the original use of
PageRank) and crawl scheduling. This module extracts the DOMAIN-level
graph from page HTML and computes:

- :func:`extract_links` — (src_domain, dst_domain, n_links) edges from
  ``href`` attributes: absolute http(s) targets resolve to their own
  domain, root-relative targets to the page's domain, everything else
  (fragments, mailto, javascript — and protocol-relative ``//host/..``
  hrefs, which the corpus contract does not produce) is dropped or, for
  ``//``-prefixed hrefs, counted as same-domain; extend the CASE here and
  in the oracle together if the contract ever grows them;
- :func:`degree_stats` — per-domain in/out degree and link counts;
- :func:`pagerank` — damping-0.85 PageRank, a FIXED number of synchronous
  iterations, all arithmetic in e9 fixed point (every term is an integer
  division, so Spark and the DuckDB oracle replay bit-for-bit; no float
  accumulation order dependence). Dangling mass is dropped, not
  redistributed — documented semantics shared by both engines.

Scale: the page→edge extraction is scan → project → explode (no
exchange); the edge rollup is one shuffle of (src, dst) pairs. PageRank
iterates join + groupBy on the DOMAIN graph, orders of magnitude smaller
than the page corpus; lineage is truncated per round with localCheckpoint
exactly like operators/cluster.py's label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import _domain

DAMPING_NUM, DAMPING_DEN = 85, 100
E9 = 1_000_000_000

_HREF_RE = r'<a\b[^>]*href="([^"]*)"'


def _dst_domain(href, src_domain):
    """Href → destination domain, the single resolution contract shared by
    :func:`extract_links` and :func:`anchor_counts` (mirrored verbatim in
    the DuckDB oracle CASE): absolute → its own host's domain,
    protocol-relative ``//host/path`` → that host's domain (checked BEFORE
    the root-relative arm, which its prefix would otherwise match —
    silently misattributing the edge to the page's own domain),
    root-relative ``/path`` → the page's domain, anything else dropped."""
    pr_host = F.nullif(
        F.regexp_replace(
            F.lower(F.regexp_extract(href, r"^//([^/?#]+)", 1)), r"^www\.", ""
        ),
        F.lit(""),
    )
    return (
        F.when(href.rlike(r"^https?://"), _domain(href))
        .when(href.startswith("//"), pr_host)
        .when(href.startswith("/"), src_domain)
        .otherwise(F.lit(None))
    )


def extract_links(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Domain-level edge list: (src_domain, dst_domain, n_links), n_links
    the number of anchors. Self-links (site navigation) are kept — they
    carry real weight-normalization consequences for PageRank and are
    dropped by consumers that don't want them."""
    hrefs = pages.select(
        _domain(F.col(url_col)).alias("src_domain"),
        F.explode(F.regexp_extract_all(F.col("html"), F.lit(_HREF_RE), F.lit(1))).alias("href"),
    )
    dst = _dst_domain(F.col("href"), F.col("src_domain"))
    return (
        hrefs.select("src_domain", dst.alias("dst_domain"))
        .where(F.col("dst_domain").isNotNull())
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").cast("long").alias("n_links"))
    )


_ANCHOR_ELEM_RE = r'(?s)<a\b[^>]*href="[^"]*"[^>]*>.*?</a>'
_ANCHOR_INNER_RE = r"(?s)^<a[^>]*>(.*)</a>$"


def anchor_texts(pages: DataFrame, url_col: str = "url", k: int = 3) -> DataFrame:
    """Incoming anchor-text profile: for each destination domain, the top-k
    most frequent normalized anchor texts across the crawl —
    (dst_domain, anchor_text, n, rank). Anchor text is the classic external
    description of a page (what OTHER pages call it): a quality/relevance
    prior for curation and the standard retrieval-augmentation signal.

    Href resolution follows :func:`extract_links`'s contract exactly
    (absolute → own domain, root-relative → page domain, everything else
    dropped); inner text is normalized with the html_extract entity/tag
    rules. Ties break (count desc, text asc) so top-k is deterministic.

    Scale: page → anchor extraction is scan → project → explode with no
    exchange; the (dst_domain, anchor_text) rollup is one shuffle of short
    normalized strings with map-side partial counts, and the top-k window
    runs over the already-aggregated relation (rows = distinct texts per
    domain, not anchors)."""
    from pyspark.sql import Window

    counted = anchor_counts(pages, url_col)
    w = Window.partitionBy("dst_domain").orderBy(F.desc("n"), F.asc("anchor_text"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def anchor_counts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """The aggregated incoming-anchor relation feeding :func:`anchor_texts`
    and :func:`domain_quality`: (dst_domain, anchor_text, n)."""
    from .html_extract import _norm_text

    elems = pages.select(
        _domain(F.col(url_col)).alias("src_domain"),
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(_ANCHOR_ELEM_RE), F.lit(0))
        ).alias("elem"),
    )
    href = F.regexp_extract(F.col("elem"), _HREF_RE, 1)
    dst = _dst_domain(href, F.col("src_domain"))
    txt = _norm_text(F.regexp_extract(F.col("elem"), _ANCHOR_INNER_RE, 1))
    return (
        elems.select(dst.alias("dst_domain"), txt.alias("anchor_text"))
        .where(F.col("dst_domain").isNotNull() & (F.col("anchor_text") != ""))
        .groupBy("dst_domain", "anchor_text")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-domain degrees over the edge list: (domain, out_degree,
    in_degree, out_links, in_links). Domains appearing only as source or
    only as target get zeros on the other side (full outer union)."""
    out_d = edges.groupBy(F.col("src_domain").alias("domain")).agg(
        F.count("*").cast("long").alias("out_degree"),
        F.sum("n_links").cast("long").alias("out_links"),
    )
    in_d = edges.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.count("*").cast("long").alias("in_degree"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    return (
        out_d.join(in_d, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).cast("long").alias("out_links"),
            F.coalesce("in_links", F.lit(0)).cast("long").alias("in_links"),
        )
    )


def pagerank(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Integer-exact PageRank on the domain graph: (domain, rank_e9).

    r_0(v)   = floor(1e9 / N)
    r_{k+1}(v) = floor(0.15e9 / N)
               + Σ_{u→v} floor(r_k(u) · 85 · w(u,v) / (100 · out(u)))

    Every term floors to a bigint before summing, so there is no float
    accumulation anywhere and the DuckDB oracle (the same recurrence as
    chained CTEs) matches exactly. Dangling domains keep receiving the
    teleport term but their own mass is dropped (sums < 1e9 — standard
    "dangling mass removed" variant).

    The iteration joins ranks (N rows) to edges (E rows) k times;
    localCheckpoint truncates the growing plan each round — the same
    pattern as cluster.connected_components.
    """
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .unionAll(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("domain", F.lit(0).cast("long").alias("rank_e9")).limit(0)
    base = int(0.15 * E9) // n
    out_tot = edges.groupBy("src_domain").agg(F.sum("n_links").alias("out_links"))
    w_edges = edges.join(out_tot, "src_domain").localCheckpoint(eager=True)

    ranks = nodes.select("domain", F.lit(E9 // n).cast("long").alias("rank_e9"))
    for _ in range(n_iters):
        contrib = (
            w_edges.join(ranks, w_edges["src_domain"] == ranks["domain"])
            .select(
                F.col("dst_domain").alias("domain"),
                # SQL DIV: exact integer division (a float `/` then cast can
                # round across an integer boundary on large numerators)
                F.expr(
                    f"(rank_e9 * {DAMPING_NUM} * n_links) DIV ({DAMPING_DEN} * out_links)"
                ).alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "domain", "left")
            .select(
                "domain",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("rank_e9"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def domain_quality(pages: DataFrame, url_col: str = "url", n_iters: int = 3) -> DataFrame:
    """The per-domain verdict table a crawl scheduler / domain-level
    quality gate consumes: one row per domain joining crawl mass
    (n_pages, n_canonical, sum_html_len), graph position (degrees, e9
    PageRank), and incoming anchor evidence (distinct texts, total
    anchors). Domains appearing in ANY signal appear in the output
    (key-union base + left joins); absent signals coalesce to 0 — a
    dst-only domain (linked but never crawled) has zero crawl mass, a
    crawled island has zero in-degree.

    Scale: every input relation is already domain-granular (orders of
    magnitude below page count); the joins shuffle only those rollups.
    PageRank's iteration cost dominates and is bounded by the domain graph,
    not the corpus."""
    from .urls import domain_stats

    edges = extract_links(pages, url_col)
    deg = degree_stats(edges)
    pr = pagerank(edges, n_iters)
    ds = domain_stats(pages, url_col)
    anch = (
        anchor_counts(pages, url_col)
        .groupBy(F.col("dst_domain").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchor_texts"),
            F.sum("n").cast("long").alias("n_incoming_anchors"),
        )
    )
    base = (
        ds.select("domain")
        .unionByName(deg.select("domain"))
        .unionByName(pr.select("domain"))
        .unionByName(anch.select("domain"))
        .distinct()
    )
    out = (
        base.join(ds, "domain", "left")
        .join(deg, "domain", "left")
        .join(pr, "domain", "left")
        .join(anch, "domain", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return out.select(
        "domain",
        z("n_pages"),
        z("n_canonical"),
        z("sum_html_len"),
        z("out_degree"),
        z("in_degree"),
        z("out_links"),
        z("in_links"),
        z("rank_e9"),
        z("n_anchor_texts"),
        z("n_incoming_anchors"),
    )


E6 = 1_000_000


def hits(edges: DataFrame, n_iters: int = 2) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs & authorities) on the weighted
    domain graph: (domain, hub_e6, auth_e6).

    Each half-step is the classic mutual recursion, max-normalized in e6
    fixed point so every value is a bigint and the DuckDB oracle (the same
    chain of CTEs) matches bit-for-bit:

        a_raw(v) = Σ_{u→v} h(u) · w(u,v)     a(v) = a_raw · 1e6 DIV max(a_raw)
        h_raw(u) = Σ_{u→v} a(v) · w(u,v)     h(u) = h_raw · 1e6 DIV max(h_raw)

    starting from h ≡ 1e6. Max-normalization (instead of the usual L2)
    keeps the arithmetic in integers; the RANKING is what HITS is consumed
    for and ordering is preserved. Overflow budget: Σ h·w ≤ 1e6 · Σw per
    node — safe in int64 up to ~9e12 weighted in-links per domain.

    Scale: per iteration two edge⋈rank joins + two aggregations on domain
    keys (the graph relation, orders of magnitude below page count); the
    per-round max is a scalar agg. localCheckpoint truncates lineage per
    round, as in pagerank/connected_components.
    """
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .unionAll(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.rdd.isEmpty():
        return nodes.select(
            "domain",
            F.lit(0).cast("long").alias("hub_e6"),
            F.lit(0).cast("long").alias("auth_e6"),
        ).limit(0)

    e = edges.select("src_domain", "dst_domain", "n_links").localCheckpoint(eager=True)

    def _half(scores: DataFrame, score_col: str, join_on: str, emit: str, out_col: str) -> DataFrame:
        raw = (
            e.join(scores, e[join_on] == scores["domain"])
            .select(F.col(emit).alias("domain"), (F.col(score_col) * F.col("n_links")).alias("c"))
            .groupBy("domain")
            .agg(F.sum("c").alias("raw"))
        )
        m = raw.agg(F.max("raw")).first()[0] or 1
        return nodes.join(raw, "domain", "left").select(
            "domain",
            F.expr(f"coalesce(raw, 0) * {E6} DIV {int(m)}").cast("long").alias(out_col),
        )

    h = nodes.select("domain", F.lit(E6).cast("long").alias("hub_e6"))
    a = None
    for _ in range(n_iters):
        a = _half(h, "hub_e6", "src_domain", "dst_domain", "auth_e6").localCheckpoint(eager=True)
        h = _half(a, "auth_e6", "dst_domain", "src_domain", "hub_e6").localCheckpoint(eager=True)
    return nodes.join(h, "domain", "left").join(a, "domain", "left").select(
        "domain",
        F.coalesce("hub_e6", F.lit(0)).cast("long").alias("hub_e6"),
        F.coalesce("auth_e6", F.lit(0)).cast("long").alias("auth_e6"),
    )


def domain_components(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Weakly connected components of the domain link graph — (domain,
    component, n_members) with component = the lexicographically smallest
    reachable domain. Link-graph communities drive crawl partitioning
    (assign whole components to crawler shards so politeness state stays
    local) and spam-cluster triage (a dense component of low-quality
    domains is one verdict, not |domains| verdicts).

    Reuses cluster.connected_components verbatim — min-label propagation
    is type-generic (least/min order strings lexicographically, which the
    DuckDB oracle mirrors exactly)."""
    from .cluster import neardup_clusters

    edges = extract_links(pages, url_col)
    cc = neardup_clusters(edges, src="src_domain", dst="dst_domain")
    return cc.select(F.col("doc_id").alias("domain"), "component", "n_members")


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-domain reciprocal-link profile — the classic link-farm signal
    (organically linked domains receive far more links than they return;
    rings of mutually linking domains stand out): for each domain with
    outgoing edges, how many of its distinct out-neighbors link back.
    Emits (domain, out_neighbors, reciprocal, reciprocity_bp).

    One self-join of the (deduped) edge relation on the reversed key —
    domain-granular, orders of magnitude below page count.
    """
    e = edges.select("src_domain", "dst_domain").distinct()
    back = e.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
    )
    j = e.join(back, ["src_domain", "dst_domain"], "left_semi").groupBy(
        "src_domain"
    ).agg(F.count(F.lit(1)).cast("long").alias("reciprocal"))
    outs = e.groupBy("src_domain").agg(
        F.count(F.lit(1)).cast("long").alias("out_neighbors")
    )
    return (
        outs.join(j, "src_domain", "left")
        .select(
            F.col("src_domain").alias("domain"),
            "out_neighbors",
            F.coalesce("reciprocal", F.lit(0)).cast("long").alias("reciprocal"),
            F.expr(
                "(10000 * coalesce(reciprocal, 0)) DIV out_neighbors"
            ).cast("long").alias("reciprocity_bp"),
        )
    )


def cocitation(edges: DataFrame, min_shared: int = 2) -> DataFrame:
    """Co-citation strength: pairs of destination domains linked FROM the
    same source domain, counted over distinct sources — the classic
    related-domain signal (domains cited together are topically close).
    Emits (dom_a, dom_b, n_shared_sources) for dom_a < dom_b with at
    least ``min_shared`` shared citers.

    One self-join of the deduped (src, dst) relation on src: fan-out is
    C(out_degree, 2) per source — bounded by the domain graph's out
    degrees, not page count."""
    e = edges.select("src_domain", "dst_domain").distinct()
    a = e.select(F.col("src_domain").alias("s"), F.col("dst_domain").alias("dom_a"))
    b = e.select(F.col("src_domain").alias("s"), F.col("dst_domain").alias("dom_b"))
    return (
        a.join(b, "s")
        .where(F.col("dom_a") < F.col("dom_b"))
        .groupBy("dom_a", "dom_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_sources"))
        .where(F.col("n_shared_sources") >= min_shared)
    )


def label_propagation(edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """Synchronous label-propagation communities over the undirected
    domain graph, ``n_rounds`` fixed — (domain, community). Each round
    every node adopts the most frequent label among its DISTINCT
    neighbors; ties prefer the node's CURRENT label when it is among the
    tied set, else the lexicographically smallest (classic LP randomizes
    ties — the deterministic twin must break them somehow, and a bare
    min-label tie FLOODS across thin bridges, collapsing LP into
    connected components: hand-traced in the test). Self-loops dropped.
    Fully deterministic (fixed rounds + struct tiebreak), so the DuckDB
    oracle replays it bit-for-bit as chained per-round CTEs — the same
    discipline as :func:`hits`.

    Complements :func:`domain_components`: weak connectivity merges
    everything a bridge touches; LP keeps densely linked cores separate
    when the bridge is thin (spam-ring triage wants the cores).

    Scale: one edge join + one (node, label) partial-agg count + one
    min-struct rollup per round — all keyed shuffles on the DOMAIN graph
    (orders of magnitude below page count); no windows, no collects.
    """
    e = (
        edges.select("src_domain", "dst_domain")
        .where(F.col("src_domain") != F.col("dst_domain"))
        .distinct()
    )
    ue = e.unionByName(
        e.select(
            F.col("dst_domain").alias("src_domain"),
            F.col("src_domain").alias("dst_domain"),
        )
    ).distinct()
    labels = ue.select(F.col("src_domain").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(n_rounds):
        nb = ue.join(
            labels.withColumnRenamed("node", "dst_domain"), "dst_domain"
        ).select(F.col("src_domain").alias("node"), "label")
        cnt = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        cur = labels.select("node", F.col("label").alias("cur"))
        labels = (
            cnt.join(cur, "node")
            .groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.when(F.col("label") == F.col("cur"), F.lit(0))
                        .otherwise(F.lit(1))
                        .alias("nk"),
                        F.col("label").alias("l"),
                    )
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
        )
    return labels.select(
        F.col("node").alias("domain"), F.col("label").alias("community")
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-domain triangle count and local clustering coefficient over
    the undirected domain graph — (domain, degree, n_triangles,
    clustering_bp) with clustering_bp = (20000·T) DIV (d·(d−1)), the
    2T/(d(d−1)) coefficient in basis points (0 when degree < 2).
    Link-farm rings and tightly knit spam clusters light up as
    high-clustering cores; organic hub domains sit low.

    Shape: canonicalize each undirected edge once as (a < b), enumerate
    wedges with the id-ordered two-hop join (a < b < c — each triangle
    materializes exactly once), close them against the edge relation,
    then explode each closed triangle to its three corners for the
    per-node rollup. Joins are all keyed on domain ids; at web scale the
    standard refinement is DEGREE ordering instead of id ordering (hubs
    become wedge middles at most once), which changes only the ordering
    key — the plan shape is identical.
    """
    e = (
        edges.select("src_domain", "dst_domain")
        .where(F.col("src_domain") != F.col("dst_domain"))
        .select(
            F.least("src_domain", "dst_domain").alias("a"),
            F.greatest("src_domain", "dst_domain").alias("b"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("domain"))
        .unionByName(e.select(F.col("b").alias("domain")))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # wedges a<b<c (b is the middle), closed by the (a, c) edge
    w = e.alias("e1").join(
        e.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
    )
    tri = w.join(
        e.select(F.col("a").alias("ta"), F.col("b").alias("tc")),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    ).select("a", "b", "c")
    corners = (
        tri.select(F.col("a").alias("domain"))
        .unionByName(tri.select(F.col("b").alias("domain")))
        .unionByName(tri.select(F.col("c").alias("domain")))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    z = F.lit(0).cast("long")
    return (
        deg.join(corners, "domain", "left")
        .select(
            "domain",
            "degree",
            F.coalesce("n_triangles", z).alias("n_triangles"),
            F.when(F.col("degree") < 2, z)
            .otherwise(
                F.expr("(20000 * coalesce(n_triangles, 0)) DIV (degree * (degree - 1))")
            )
            .alias("clustering_bp"),
        )
    )


def kcore(edges: DataFrame, k: int = 2, max_rounds: int = 200) -> DataFrame:
    """k-core of the undirected domain graph: iteratively peel nodes of
    degree < k until fixpoint; return (domain, core_degree) for the
    surviving subgraph, core_degree the node's degree WITHIN the core.

    The k-core is the classic link-spam / link-farm density signal
    (Batagelj-Zaveršnik peeling): organic long-tail domains fall out at
    small k, while reciprocal-link rings survive arbitrarily deep cores.
    The fixpoint is unique and independent of peeling order, so the
    synchronous per-round peel here and the DuckDB oracle's recursive
    replay agree without any round-count coupling.

    Shape per round: one degree rollup (map-side partial count) over the
    symmetric edge list + two anti-joins against the under-degree node
    set — all keyed on the DOMAIN graph, orders of magnitude below page
    count; AQE broadcasts the (shrinking) removal set. localCheckpoint
    truncates lineage each round, exactly like pagerank's iteration.
    Rounds are data-bounded (a path graph peels O(diameter) times);
    ``max_rounds`` is a guard against degenerate inputs, not a semantic
    knob — hitting it raises rather than returning a non-fixpoint.
    """
    e = (
        edges.select("src_domain", "dst_domain")
        .where(F.col("src_domain") != F.col("dst_domain"))
        .distinct()
    )
    ue = (
        e.unionByName(
            e.select(
                F.col("dst_domain").alias("src_domain"),
                F.col("src_domain").alias("dst_domain"),
            )
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        bad = (
            ue.groupBy("src_domain")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") < k)
            .select(F.col("src_domain").alias("node"))
            .localCheckpoint()
        )
        if bad.count() == 0:
            return ue.groupBy(F.col("src_domain").alias("domain")).agg(
                F.count(F.lit(1)).cast("long").alias("core_degree")
            )
        ue = (
            ue.join(bad.withColumnRenamed("node", "src_domain"), "src_domain", "left_anti")
            .join(bad.withColumnRenamed("node", "dst_domain"), "dst_domain", "left_anti")
            .select("src_domain", "dst_domain")
            .localCheckpoint()
        )
    raise RuntimeError(f"kcore did not converge within {max_rounds} rounds")


def trustrank(edges: DataFrame, seeds: tuple[str, ...], n_iters: int = 3) -> DataFrame:
    """TrustRank (Gyöngyi et al.): PageRank with the teleport vector
    restricted to a trusted seed set — trust flows OUT of the seeds along
    links, so domains unreachable from any seed end at zero.

        t_0(v)     = ⌊1e9/S⌋·[v ∈ seeds]
        t_{k+1}(v) = ⌊0.15e9/S⌋·[v ∈ seeds]
                   + Σ_{u→v} ⌊t_k(u)·85·w(u,v) / (100·out(u))⌋

    with S = len(seeds) — a seed absent from the graph simply wastes its
    teleport share (caller contract: seed the graph's own domains). Same
    e9 integer fixed point, per-term floors, dangling-drop and
    localCheckpoint round structure as :func:`pagerank`, so the DuckDB
    oracle replays the recurrence bit-for-bit. (domain, trust_e9).
    """
    if not seeds:
        raise ValueError("trustrank needs a non-empty seed set")
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .unionAll(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    s = len(seeds)
    base = int(0.15 * E9) // s
    is_seed = F.col("domain").isin(*seeds)
    out_tot = edges.groupBy("src_domain").agg(F.sum("n_links").alias("out_links"))
    w_edges = edges.join(out_tot, "src_domain").localCheckpoint(eager=True)

    ranks = nodes.select(
        "domain",
        F.when(is_seed, F.lit(E9 // s)).otherwise(F.lit(0)).cast("long").alias("trust_e9"),
    )
    for _ in range(n_iters):
        contrib = (
            w_edges.join(ranks, w_edges["src_domain"] == ranks["domain"])
            .select(
                F.col("dst_domain").alias("domain"),
                F.expr(
                    f"(trust_e9 * {DAMPING_NUM} * n_links) DIV ({DAMPING_DEN} * out_links)"
                ).alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "domain", "left")
            .select(
                "domain",
                (
                    F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("long")
                .alias("trust_e9"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def spam_mass(edges: DataFrame, seeds: tuple[str, ...], n_iters: int = 3) -> DataFrame:
    """Spam-mass estimate per domain: the share of a domain's PageRank
    NOT accounted for by trust flowing from the seed set —
    (domain, rank_e9, trust_e9, spam_mass_bp) with

        spam_mass_bp = (10000 · max(rank − trust, 0)) DIV rank

    High spam mass = authority earned from link structure the trusted
    core never endorses (the TrustRank paper's spam-demotion signal).
    The max(…, 0) clamps BEFORE the division — trust can locally exceed
    rank near seeds, and a negative numerator is exactly the truncate-vs-
    floor cross-engine trap this repo pins. rank_e9 ≥ the teleport base ≥
    1 at any realistic node count; the 0-guard covers degenerate corpora.

    The two recurrences are FUSED into one iteration loop — each round is
    a single edge join computing both contribution columns (running
    pagerank() and trustrank() separately would walk the edges twice per
    round and double the checkpoint count for identical numbers; the
    python-replica test pins that the fused loop equals the standalone
    operators term for term).
    """
    if not seeds:
        raise ValueError("spam_mass needs a non-empty seed set")
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .unionAll(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "domain",
            F.lit(0).cast("long").alias("rank_e9"),
            F.lit(0).cast("long").alias("trust_e9"),
            F.lit(0).cast("long").alias("spam_mass_bp"),
        ).limit(0)
    s = len(seeds)
    base_r, base_t = int(0.15 * E9) // n, int(0.15 * E9) // s
    is_seed = F.col("domain").isin(*seeds)
    out_tot = edges.groupBy("src_domain").agg(F.sum("n_links").alias("out_links"))
    w_edges = edges.join(out_tot, "src_domain").localCheckpoint(eager=True)

    ranks = nodes.select(
        "domain",
        F.lit(E9 // n).cast("long").alias("rank_e9"),
        F.when(is_seed, F.lit(E9 // s)).otherwise(F.lit(0)).cast("long").alias("trust_e9"),
    )
    flow = f"* {DAMPING_NUM} * n_links) DIV ({DAMPING_DEN} * out_links)"
    for _ in range(n_iters):
        contrib = (
            w_edges.join(ranks, w_edges["src_domain"] == ranks["domain"])
            .select(
                F.col("dst_domain").alias("domain"),
                F.expr(f"(rank_e9 {flow}").alias("cr"),
                F.expr(f"(trust_e9 {flow}").alias("ct"),
            )
            .groupBy("domain")
            .agg(F.sum("cr").alias("in_r"), F.sum("ct").alias("in_t"))
        )
        ranks = (
            nodes.join(contrib, "domain", "left")
            .select(
                "domain",
                (F.lit(base_r) + F.coalesce(F.col("in_r"), F.lit(0)))
                .cast("long")
                .alias("rank_e9"),
                (
                    F.when(is_seed, F.lit(base_t)).otherwise(F.lit(0))
                    + F.coalesce(F.col("in_t"), F.lit(0))
                )
                .cast("long")
                .alias("trust_e9"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.withColumn(
        "spam_mass_bp",
        F.when(F.col("rank_e9") <= 0, F.lit(0))
        .otherwise(F.expr("(10000 * greatest(rank_e9 - trust_e9, 0)) DIV rank_e9"))
        .cast("long"),
    )


def random_walks(edges: DataFrame, length: int = 4) -> DataFrame:
    """DeepWalk-style random-walk corpus over the domain graph (Perozzi et
    al. 2014; node2vec's p=q=1 case): one walk of ``length`` steps from
    every node with out-edges, the graph-embedding training corpus
    (walks are the 'sentences' a skip-gram model trains on, composing
    with sampling.negative_sampling for the negative table).

    DETERMINISTIC next-hop choice instead of an RNG: step i from a walk
    started at ``start`` picks sorted-neighbor index
    md5-bucket('walk:' start ':' i) % degree — reproducible across runs,
    engines, partitionings, speculative re-execution (the salted_join
    rule: retries must agree), and exactly replayable by the oracle's
    recursive CTE. Walks stop early at dangling nodes (inner join).

    Output: (start, step, node) rows, step 0 = the start node itself.

    Scale: adjacency is one (src, sorted-neighbor-array) rollup;
    each step is one equi-join of the frontier against it keyed on the
    current node — ``length`` bounded shuffles total, the standard
    distributed-walk shape. Hub rows carry their neighbor array once
    (array size = out-degree; cap upstream for pathological hubs, as
    the dedup hot-bucket machinery does)."""
    src, dst = "src_domain", "dst_domain"
    adj = (
        edges.select(src, dst)
        .distinct()
        .groupBy(src)
        .agg(F.sort_array(F.collect_list(dst)).alias("nbrs"))
        .withColumnRenamed(src, "node")
    )
    frontier = adj.select(
        F.col("node").alias("start"), F.lit(0).cast("long").alias("step"), "node"
    )
    out = frontier
    for i in range(length):
        pri = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("walk:"), F.col("start"), F.lit(f":{i}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        stepped = (
            frontier.join(adj, "node")
            .select(
                "start",
                F.lit(i + 1).cast("long").alias("step"),
                F.element_at("nbrs", (pri % F.size("nbrs") + 1).cast("int")).alias(
                    "node"
                ),
            )
        )
        frontier = stepped
        out = out.unionByName(stepped)
    return out


def walk_skipgrams(
    edges: DataFrame, length: int = 4, window: int = 2
) -> DataFrame:
    """Skip-gram training pairs over the deterministic walk corpus
    (DeepWalk's second half: walks are the 'sentences', this is the
    (center, context) pair stream a skip-gram model consumes, with
    sampling.negative_sampling supplying the negatives): for every walk,
    all ordered node pairs within ``window`` steps, rolled up per
    (center, context).

    Output: (center, context, n_pairs).

    Scale: the walk relation is |V|·(length+1) rows; the pair expansion
    self-joins it keyed on the walk id (start), ≤ (length+1)·2·window
    pairs per walk — a bounded blow-up, then one pair-keyed partial-agg
    rollup."""
    walks = random_walks(edges, length)
    a = walks.select(
        F.col("start"), F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("start"), F.col("step").alias("sb"), F.col("node").alias("context")
    )
    pairs = (
        a.join(b, "start")
        .where(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .select("center", "context")
    )
    return pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def seed_distances(
    edges: DataFrame, seeds: tuple[str, ...], max_depth: int = 3
) -> DataFrame:
    """Multi-source BFS over the directed domain graph: every domain's
    link distance FROM the seed set (min over seeds), up to
    ``max_depth`` hops — the classic trust-distance feature (TrustRank's
    combinatorial cousin: spam rarely sits within a couple of clicks of
    curated seeds) and the standard bounded-frontier BFS shape.

    Output: (node, dist) for reachable domains, dist ∈ [0, max_depth];
    seeds emit dist 0 whether or not they appear in the graph.

    Scale: one frontier-vs-edges equi-join + one anti-join against the
    visited set per level — ``max_depth`` bounded rounds, lineage
    truncated per round (localCheckpoint, the iterative-op discipline of
    pagerank/kcore); the visited relation only ever grows by the newly
    reached frontier."""
    spark = edges.sparkSession
    e2 = edges.select(
        F.col("src_domain").alias("s"), F.col("dst_domain").alias("d")
    ).distinct()
    visited = spark.createDataFrame(
        [(s, 0) for s in seeds], "node string, dist long"
    )
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e2, frontier["node"] == e2["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited
