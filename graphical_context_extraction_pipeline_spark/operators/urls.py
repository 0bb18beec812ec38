"""URL parsing, canonicalization, dedup and domain-level curation.

Standard web-corpus curation stages (CCNet/C4-style): parse each page URL,
canonicalize it (lowercase host, strip a leading ``www.`` label, drop
tracking query params and fragments, trim trailing slashes), collapse
canonical duplicates, profile domains, and drop blocklisted domains.

Everything is regex/string expressions from the portable Java-regex/RE2
subset (same contract as operators/html_extract.py) — NOT Spark's
``parse_url``, which DuckDB lacks — so the oracles replay the exact
parser. Zero Python, and the only shuffles are the two aggregations
(canonical groups, domain rollup), both keyed on high-cardinality,
skew-free keys.

At 10^12 documents: url_parse / domain_filter are scan→project (no
exchange); url_dedup shuffles only (canonical_url, doc_id) pairs — the
narrow projection is explicit so the page payload never enters the
exchange; domain blocklists are tiny literal sets (broadcast semantics via
``isin``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-z][a-z0-9+.-]*):"
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# Domains curation pipelines routinely drop wholesale (planted in the
# synthetic URL space by datagen.URL_DOMAINS).
DEFAULT_BLOCKLIST = ("tracker.ads.example",)


def _host(url: Column) -> Column:
    return F.regexp_extract(url, _HOST_RE, 1)


def _domain(url: Column) -> Column:
    # lowercase host, strip ONE leading www. label (m./blog. stay — they
    # are distinct properties; collapsing them needs a suffix list, which
    # is policy, not parsing)
    return F.regexp_replace(F.lower(_host(url)), r"^www\.", "")


def _canonical(url: Column) -> Column:
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), r"/+$", "")
    return F.concat(F.lit("https://"), _domain(url), path)


def url_parse(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per page: (doc_id, url, scheme, host, domain, path,
    n_segments, has_query, canonical_url)."""
    u = F.col(url_col)
    path = F.regexp_extract(u, _PATH_RE, 1)
    return pages.select(
        "doc_id",
        u.alias("url"),
        F.regexp_extract(u, _SCHEME_RE, 1).alias("scheme"),
        _host(u).alias("host"),
        _domain(u).alias("domain"),
        path.alias("path"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast("long").alias("n_segments"),
        (F.regexp_extract(u, _QUERY_RE, 1) != "").cast("long").alias("has_query"),
        _canonical(u).alias("canonical_url"),
    )


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical-URL dedup decision: one row per canonical group —
    (canonical_url, n_pages, keep_doc_id) with the smallest doc_id kept
    (mirror-crawl and tracking-param duplicates collapse here before any
    content-level dedup spends cycles on them)."""
    u = F.col(url_col)
    return (
        pages.select(_canonical(u).alias("canonical_url"), F.col("doc_id"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain crawl profile: (domain, n_pages, n_canonical,
    sum_html_len). Partial aggregation handles the fan-in; distinct
    canonical counts ride the same exchange (one shuffle total under AQE's
    distinct-aggregate planning)."""
    u = F.col(url_col)
    return (
        pages.select(
            _domain(u).alias("domain"),
            _canonical(u).alias("canonical_url"),
            F.length("html").cast("long").alias("html_len"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.countDistinct("canonical_url").cast("long").alias("n_canonical"),
            F.sum("html_len").cast("long").alias("sum_html_len"),
        )
    )


def domain_filter(
    pages: DataFrame,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
    url_col: str = "url",
) -> DataFrame:
    """Pages surviving the domain blocklist: (doc_id, url, domain). The
    blocklist is a literal IN-set (broadcast by construction); the page
    payload is never shuffled."""
    u = F.col(url_col)
    out = pages.select("doc_id", u.alias("url"), _domain(u).alias("domain"))
    return out.where(~F.col("domain").isin(*blocklist))


def frontier_schedule(
    pages: DataFrame,
    max_per_domain: int = 1000,
    url_col: str = "url",
) -> DataFrame:
    """Politeness-aware crawl scheduling: canonical-dedup'd URLs are dealt
    into per-domain WAVES — wave k holds each domain's (k+1)-th URL, so a
    crawler executing waves in order fetches at most one URL per domain
    per wave (rate-limit compliance by construction) while every wave
    stays embarrassingly parallel across domains. Domains past
    ``max_per_domain`` URLs are truncated — the per-domain crawl budget.

    Order within a domain is the md5 of the canonical URL (deterministic,
    spread — no crawl-order bias toward lexicographically early paths);
    swap in a quality prior (e.g. PageRank from linkgraph.py) by sorting
    on its column instead.

    Scale: one shuffle for the canonical-group agg, one for the
    per-domain window; the row_number sort is per-domain and the wave cap
    bounds every partition's output. Emits
    (domain, canonical_url, wave, n_pages).
    """
    from pyspark.sql import Window

    u = F.col(url_col)
    canon = (
        pages.select(_canonical(u).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
    )
    dom = F.regexp_extract(F.col("canonical_url"), r"^https://([^/]+)", 1)
    w = Window.partitionBy("domain").orderBy(F.md5(F.col("canonical_url")), "canonical_url")
    return (
        canon.withColumn("domain", dom)
        .withColumn("wave", (F.row_number().over(w) - 1).cast("long"))
        .where(F.col("wave") < max_per_domain)
        .select("domain", "canonical_url", "wave", "n_pages")
    )


# Prefix rules in the robots.txt exclusion-protocol shape (host, allow |
# disallow, path prefix). The default set exercises every decision arm on
# the synthetic URL space (datagen._base_url paths): full-host block,
# directory block, longest-match allow override, and untouched hosts.
DEFAULT_ROBOTS_RULES = (
    ("tracker.ads.example", "disallow", "/"),
    ("m.tracker.ads.example", "disallow", "/"),
    ("example.com", "disallow", "/items"),
    ("example.com", "allow", "/items/page-1"),
    ("news.example.org", "disallow", "/docs"),
    ("wiki.example.net", "disallow", "/posts"),
    ("wiki.example.net", "allow", "/posts/page-2"),
)


def robots_filter(
    pages: DataFrame,
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_ROBOTS_RULES,
    url_col: str = "url",
) -> DataFrame:
    """Robots-exclusion verdict per page: longest-prefix-match over
    (host, allow|disallow, prefix) rules — the REP precedence rule (most
    specific path wins; on equal length allow wins; no matching rule means
    allowed). Hosts are matched exactly after the www. strip (robots are a
    per-host contract — subdomains need their own rules).

    Scale shape: the rules relation is collapsed to ONE array row per
    domain (tiny — robots files are KBs) and broadcast; every page then
    resolves its verdict intra-row with a HOF fold over the matching
    prefixes, so the page stream is scan → broadcast-join → project with
    ZERO shuffles at any corpus size. Emits
    (doc_id, url, domain, matched_prefix, allowed) — matched_prefix ''
    when no rule applies.
    """
    spark = pages.sparkSession
    rules_df = (
        spark.createDataFrame(
            [(d, 1 if kind == "allow" else 0, p) for d, kind, p in rules],
            "domain string, is_allow long, prefix string",
        )
        .groupBy("domain")
        # sorted so the fold's tie-keep is deterministic (full ties resolve
        # to the lexicographically smallest prefix)
        .agg(F.sort_array(F.collect_list(F.struct("prefix", "is_allow"))).alias("rules"))
    )
    u = F.col(url_col)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    parsed = pages.select(
        "doc_id",
        u.alias("url"),
        _domain(u).alias("domain"),
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path).alias("path"),
    )
    matching = F.filter(F.col("rules"), lambda r: F.col("path").startswith(r["prefix"]))
    # fold to the winning rule: longer prefix wins, allow wins length ties;
    # sentinel (-1, allow) = "no rule" so the verdict coalesces to allowed
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).cast("int").alias("plen"),
            F.lit(1).cast("long").alias("is_allow"),
            F.lit("").alias("prefix"),
        ),
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > acc["plen"])
            | ((F.length(r["prefix"]) == acc["plen"]) & (r["is_allow"] > acc["is_allow"])),
            F.struct(
                F.length(r["prefix"]).alias("plen"),
                r["is_allow"].alias("is_allow"),
                r["prefix"].alias("prefix"),
            ),
        ).otherwise(acc),
    )
    return (
        parsed.join(F.broadcast(rules_df), "domain", "left")
        .withColumn("_best", best)
        .select(
            "doc_id",
            "url",
            "domain",
            F.coalesce(F.col("_best")["prefix"], F.lit("")).alias("matched_prefix"),
            F.coalesce(F.col("_best")["is_allow"], F.lit(1)).cast("long").alias("allowed"),
        )
    )


def path_templates(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL path-template mining: digit runs in the canonical path collapse
    to ``N`` so structurally identical URLs group (``/posts/page-7`` and
    ``/posts/page-812`` → ``/posts/page-N``). The per-(domain, template)
    profile is how crawl curation spots infinite spaces — calendars,
    faceted navigation, session-id paths — before they eat the fetch
    budget: a template whose n_urls dwarfs its sibling templates is a trap.

    One aggregation shuffle on (domain, template) — high-cardinality,
    skew-free keys; the page payload never leaves the scan. Emits
    (domain, template, n_urls, n_pages, example_url) with the
    lexicographically smallest canonical URL as the deterministic example.
    """
    u = F.col(url_col)
    canon = _canonical(u)
    path = F.regexp_extract(canon, r"^https://[^/]+(.*)$", 1)
    return (
        pages.select(
            _domain(u).alias("domain"),
            F.regexp_replace(path, r"[0-9]+", "N").alias("template"),
            canon.alias("canonical_url"),
        )
        .groupBy("domain", "template")
        .agg(
            F.countDistinct("canonical_url").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.min("canonical_url").alias("example_url"),
        )
    )


def recrawl_priority(
    old_pages: DataFrame, new_pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-domain change profile between two crawl snapshots — the signal
    a recrawl scheduler allocates budget by (domains whose content churns
    get refetched often; static domains decay to rare verification
    crawls). Canonical URLs are the join key; content identity is
    min(md5(html)) per canonical group, so the page payload reduces to a
    32-byte signature BEFORE any shuffle. Emits one row per domain seen
    in either snapshot: (domain, n_old, n_new, n_added, n_removed,
    n_changed, n_unchanged, change_rate_bp) with
    change_rate_bp = 10000·(added+removed+changed)/|canonical union|.

    Scale: two canonical-group aggregations + one full-outer join on
    canonical_url + one domain rollup — all high-cardinality keys, HTML
    never leaves its scan.
    """
    u = F.col(url_col)

    def snap(pages: DataFrame, tag: str) -> DataFrame:
        return (
            pages.select(
                _canonical(u).alias("canonical_url"),
                F.md5(F.col("html")).alias("sig"),
            )
            .groupBy("canonical_url")
            .agg(F.min("sig").alias(f"sig_{tag}"))
        )

    j = snap(old_pages, "old").join(snap(new_pages, "new"), "canonical_url", "full_outer")
    status = (
        F.when(F.col("sig_old").isNull(), F.lit("added"))
        .when(F.col("sig_new").isNull(), F.lit("removed"))
        .when(F.col("sig_old") != F.col("sig_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    dom = F.regexp_extract(F.col("canonical_url"), r"^https://([^/]+)", 1)
    per = j.select(dom.alias("domain"), status.alias("status"))

    def n(s: str):
        return F.sum((F.col("status") == s).cast("long")).alias(f"n_{s}")

    agg = per.groupBy("domain").agg(
        n("added"), n("removed"), n("changed"), n("unchanged"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
    return agg.select(
        "domain",
        (F.col("n_removed") + F.col("n_changed") + F.col("n_unchanged")).alias("n_old"),
        (F.col("n_added") + F.col("n_changed") + F.col("n_unchanged")).alias("n_new"),
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        F.expr(
            "(10000 * (n_added + n_removed + n_changed)) DIV greatest(n_union, 1)"
        ).cast("long").alias("change_rate_bp"),
    )


def crawl_budget(
    weights: DataFrame,
    budget: int,
    weight_col: str = "weight",
    domain_col: str = "domain",
) -> DataFrame:
    """Exact integer apportionment of ``budget`` fetch slots across
    domains, proportional to weight — Hamilton's largest-remainder method:

        floor_i = (budget · w_i) DIV W        rem_i = (budget · w_i) % W
        slots_i = floor_i + 1 for the (budget − Σ floor) largest
                  remainders (ties: domain asc), else floor_i

    so Σ slots = budget EXACTLY (no float shares, no drift) and the
    allocation is deterministic. Zero-weight relations allocate nothing
    (documented degenerate case).

    Scale: two scalar aggregates + partitioning.global_rank over the
    domain relation (range-partitioned sort, parallel per-partition
    row numbers — no single-partition window). Emits
    (domain, weight, slots).
    """
    from .partitioning import global_rank

    w = weights.select(
        F.col(domain_col).alias("domain"), F.col(weight_col).cast("long").alias("weight")
    )
    tot = w.agg(F.sum("weight").alias("s")).first()["s"] or 0
    if tot <= 0 or budget <= 0:
        return w.select("domain", "weight", F.lit(0).cast("long").alias("slots")).limit(0)
    base = w.select(
        "domain",
        "weight",
        F.expr(f"(cast({budget} as bigint) * weight) DIV {tot}").alias("fl"),
        F.expr(f"(cast({budget} as bigint) * weight) % {tot}").alias("rem"),
    )
    deficit = budget - (base.agg(F.sum("fl").alias("s")).first()["s"] or 0)
    ranked = global_rank(base, [F.col("rem").desc(), F.col("domain").asc()], "rk")
    return ranked.select(
        "domain",
        "weight",
        (F.col("fl") + (F.col("rk") <= deficit).cast("long")).cast("long").alias("slots"),
    )


def polite_frontier(
    pages: DataFrame,
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_ROBOTS_RULES,
    max_per_domain: int = 1000,
    url_col: str = "url",
) -> DataFrame:
    """The crawl stack composed end to end: robots-exclusion verdicts gate
    which pages exist at all, then the survivors are canonical-deduped and
    dealt into per-domain politeness waves — ONE plan, so Catalyst prunes
    and reorders across the stage boundary (the robots broadcast join and
    the canonical aggregation share the single page scan)."""
    allowed = robots_filter(pages, rules=rules, url_col=url_col).where(
        F.col("allowed") == 1
    )
    return frontier_schedule(allowed, max_per_domain=max_per_domain, url_col="url")


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """Parse raw robots.txt bodies into the (domain, is_allow, prefix)
    rules relation robots_filter consumes — closing the politeness stack
    from raw crawler input. Grammar subset (the parts REP crawlers agree
    on): case-insensitive ``user-agent:`` lines open a group, consecutive
    user-agent lines share one group, ``allow:`` / ``disallow:`` lines
    bind to the CURRENT group, ``#`` comments and unknown directives are
    ignored, and only groups naming ``agent`` (default ``*``) contribute.
    An empty-path disallow (``Disallow:`` with no value) means allow-all
    and is dropped.

    Input (domain string, body string); one robots.txt is a few KB, so
    the per-row line fold is bounded — everything stays intra-row until
    one explode, zero shuffles. Emits (domain, is_allow, prefix).
    """
    lines = F.split(F.col("body"), "\n")
    # per line: (directive, value) with comments stripped, lowercased key
    parsed = F.transform(
        lines,
        lambda ln: F.struct(
            F.lower(F.trim(F.regexp_extract(ln, r"^\s*([A-Za-z-]+)\s*:", 1))).alias("k"),
            F.trim(
                F.regexp_replace(F.regexp_extract(ln, r"^\s*[A-Za-z-]+\s*:(.*)$", 1), r"#.*$", "")
            ).alias("v"),
        ),
    )
    # group id = running count of user-agent lines that OPEN a group (a
    # user-agent line after rules opens a new group; consecutive ua lines
    # share one) — computed positionally so the fold carries scalars only
    def with_groups(p):
        is_ua = F.transform(p, lambda r: (r["k"] == "user-agent").cast("int"))
        opens = F.transform(
            F.sequence(F.lit(1), F.size(p)),
            lambda i: (
                (F.element_at(is_ua, i.cast("int")) == 1)
                & ((i == 1) | (F.element_at(is_ua, (i - 1).cast("int")) == 0))
            ).cast("int"),
        )
        gid = F.transform(
            F.sequence(F.lit(1), F.size(p)),
            lambda i: F.aggregate(
                F.slice(opens, 1, i.cast("int")), F.lit(0), lambda a, x: a + x
            ),
        )
        return F.struct(p.alias("p"), is_ua.alias("ua"), gid.alias("gid"))

    from ..functions.exprs import bind

    g = bind(parsed, lambda p: F.when(F.size(p) >= 1, with_groups(p)))
    rows = robots.select("domain", g.alias("g"))
    # which group ids name our agent
    star_groups = F.filter(
        F.sequence(F.lit(1), F.size(F.col("g.p"))),
        lambda i: (F.element_at(F.col("g.p"), i.cast("int"))["k"] == "user-agent")
        & (F.element_at(F.col("g.p"), i.cast("int"))["v"] == agent),
    )
    star_gids = F.transform(
        star_groups, lambda i: F.element_at(F.col("g.gid"), i.cast("int"))
    )
    rules = F.filter(
        F.sequence(F.lit(1), F.size(F.col("g.p"))),
        lambda i: F.element_at(F.col("g.p"), i.cast("int"))["k"].isin("allow", "disallow")
        & F.array_contains(star_gids, F.element_at(F.col("g.gid"), i.cast("int")))
        & (F.element_at(F.col("g.p"), i.cast("int"))["v"] != ""),
    )
    out = rows.where(F.col("g").isNotNull()).select(
        "domain",
        F.explode(
            F.transform(
                rules,
                lambda i: F.struct(
                    (F.element_at(F.col("g.p"), i.cast("int"))["k"] == "allow")
                    .cast("long")
                    .alias("is_allow"),
                    F.element_at(F.col("g.p"), i.cast("int"))["v"].alias("prefix"),
                ),
            )
        ).alias("r"),
    )
    return out.select("domain", F.col("r.is_allow").alias("is_allow"), F.col("r.prefix").alias("prefix"))


_SM_ELEM_RE = r"<url>.*?</url>"
_SM_LOC_RE = r"<loc>([^<]*)</loc>"
_SM_LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "xml", domain_col: str = "domain"
) -> DataFrame:
    """Sitemap XML → (domain, url, lastmod) rows: each ``<url>`` element's
    ``<loc>`` plus its optional ``<lastmod>`` ('' when absent — a string
    sentinel, never NULL, per the repo's hash-compare discipline; kept as
    the raw string because cross-engine date parsing is a trap). Patterns
    are the portable Java∩RE2 subset (non-greedy ``.*?``, char classes —
    no lookarounds), so the DuckDB oracle parses identically.

    Scale: scan → regexp_extract_all → explode — zero exchange; one
    sitemap document never leaves its row until it is already (url,
    lastmod) pairs."""
    el = F.explode(
        F.regexp_extract_all(F.col(xml_col), F.lit(_SM_ELEM_RE), F.lit(0))
    ).alias("el")
    base = sitemaps.select(F.col(domain_col).alias("domain"), el)
    return base.select(
        "domain",
        F.regexp_extract(F.col("el"), _SM_LOC_RE, 1).alias("url"),
        F.regexp_extract(F.col("el"), _SM_LASTMOD_RE, 1).alias("lastmod"),
    ).where(F.col("url") != "")


def sitemap_staleness(
    sitemaps: DataFrame, pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Sitemap ↔ crawl reconciliation, the recrawl scheduler's other input
    (alongside content change rates): full-outer join of the parsed
    sitemap urls against the crawl's canonical urls per domain —
    (domain, url, status, lastmod) with status

      'uncrawled' — listed in the sitemap, absent from the crawl (fetch
                    frontier candidates, the sitemap's whole point);
      'unlisted'  — crawled but not listed (orphan pages / stale sitemap);
      'listed'    — present in both.

    Scale: the sitemap side reduces to (domain, url, lastmod) triples and
    the crawl side to DISTINCT canonical urls before the single sort-merge
    join; html never enters the shuffle. AQE broadcasts the sitemap side
    when it is batch-sized."""
    # real sitemaps repeat locs (shards, hand-edited files): collapse to
    # one row per (domain, url), keeping the max lastmod (deterministic;
    # ISO dates compare correctly as strings, and '' loses to any date)
    parsed = (
        parse_sitemaps(sitemaps)
        .groupBy("domain", "url")
        .agg(F.max("lastmod").alias("lastmod"))
    )
    u = F.col(url_col)
    crawled = (
        pages.select(_domain(u).alias("domain"), _canonical(u).alias("url"))
        .distinct()
        .withColumn("in_crawl", F.lit(True))
    )
    j = parsed.withColumn("in_map", F.lit(True)).join(
        crawled, ["domain", "url"], "full_outer"
    )
    return j.select(
        "domain",
        "url",
        F.when(F.col("in_map").isNull(), F.lit("unlisted"))
        .when(F.col("in_crawl").isNull(), F.lit("uncrawled"))
        .otherwise(F.lit("listed"))
        .alias("status"),
        F.coalesce("lastmod", F.lit("")).alias("lastmod"),
    )


TEXT_URL_RE = r"https?://[A-Za-z0-9._\-]+(?:/[A-Za-z0-9._/\-]*)?"


def text_urls(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """URL mentions in PLAIN text (no HTML markup — the citation/link
    signal for corpora that arrive as extracted text): one portable
    regex (Java ∩ RE2 subset: no lookaround, non-capturing group only)
    over a zero-shuffle scan, one explode.

    Output: (doc_id, url, domain) per mention (duplicates kept — mention
    COUNT is the signal; distinct downstream if needed)."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(TEXT_URL_RE), F.lit(0))
            ).alias("url"),
        )
        .select("doc_id", "url", _domain(F.col("url")).alias("domain"))
    )
