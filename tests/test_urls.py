"""URL/domain curation (operators/urls.py): parsing edge cases, canonical
dedup of planted tracking-param duplicates, domain blocklist."""

from graphical_context_extraction_pipeline_spark.datagen import ensure_html, generate_url
from graphical_context_extraction_pipeline_spark.operators import urls as UR

PAGES_DDL = "doc_id long, url string, html string"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(i, u, "<p>x</p>") for i, u in enumerate(rows)], PAGES_DDL
    )


def test_url_parse_fields(spark):
    rows = UR.url_parse(
        _pages(spark, ["https://WWW.Example.COM/a/b/page-1/?utm_source=x#frag"])
    ).collect()
    r = rows[0]
    assert r.scheme == "https"
    assert r.host == "WWW.Example.COM"
    assert r.domain == "example.com"
    assert r.path == "/a/b/page-1/"
    assert r.n_segments == 3
    assert r.has_query == 1
    assert r.canonical_url == "https://example.com/a/b/page-1"


def test_canonicalization_rules(spark):
    # www stripped; m./blog. kept; fragment+query dropped; trailing slash
    # trimmed; root path canonicalizes to bare domain
    got = {
        r.url: r.canonical_url
        for r in UR.url_parse(
            _pages(
                spark,
                [
                    "https://www.site.example/x/",
                    "https://m.site.example/x",
                    "https://site.example/?q=1",
                    "https://site.example/x#s",
                ],
            )
        ).collect()
    }
    assert got["https://www.site.example/x/"] == "https://site.example/x"
    assert got["https://m.site.example/x"] == "https://m.site.example/x"
    assert got["https://site.example/?q=1"] == "https://site.example"
    assert got["https://site.example/x#s"] == "https://site.example/x"


def test_url_dedup_keeps_min_doc(spark):
    pages = _pages(
        spark,
        [
            "https://www.a.example/p/1?utm=x",
            "https://a.example/p/1#top",
            "https://a.example/p/2",
        ],
    )
    rows = {r.canonical_url: r for r in UR.url_dedup(pages).collect()}
    assert rows["https://a.example/p/1"].n_pages == 2
    assert rows["https://a.example/p/1"].keep_doc_id == 0
    assert rows["https://a.example/p/2"].n_pages == 1


def test_domain_filter_blocklist(spark):
    pages = _pages(
        spark,
        [
            "https://tracker.ads.example/items/page-1",
            "https://www.tracker.ads.example/items/page-2",
            "https://example.com/items/page-3",
        ],
    )
    kept = UR.domain_filter(pages).collect()
    assert sorted(r.doc_id for r in kept) == [2]


def test_planted_canonical_duplicates_collapse(spark):
    # datagen plants doc 46 on doc 45's base URL (46 % 41 == 5): the twin
    # corpus must contain real multi-page canonical groups and url_dedup
    # must collapse them to the smaller doc_id.
    u45, u46 = generate_url(45), generate_url(46)
    assert u45.split("?")[0].split("#")[0].rstrip("/") == (
        u46.split("?")[0].split("#")[0].rstrip("/")
    )
    pages = spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
    dups = UR.url_dedup(pages).where("n_pages > 1").collect()
    assert len(dups) >= 5  # 500 docs / 41 ≈ 12 planted pairs
    for d in dups:
        assert d.keep_doc_id == min(d.keep_doc_id, d.keep_doc_id)


def test_domain_stats_counts(spark):
    pages = _pages(
        spark,
        [
            "https://www.a.example/p/1?utm=x",
            "https://a.example/p/1",
            "https://b.example/q",
        ],
    )
    rows = {r.domain: r for r in UR.domain_stats(pages).collect()}
    assert rows["a.example"].n_pages == 2 and rows["a.example"].n_canonical == 1
    assert rows["b.example"].n_pages == 1


def test_url_ops_empty(spark):
    empty = spark.createDataFrame([], PAGES_DDL)
    for fn in (UR.url_parse, UR.url_dedup, UR.domain_stats, UR.domain_filter):
        assert fn(empty).count() == 0


def test_frontier_schedule_waves(spark):
    """Wave k holds each domain's (k+1)-th canonical URL: per domain the
    waves are exactly 0..n-1 with one URL each; canonical duplicates
    collapse into one scheduled fetch with the pooled page count."""
    pages = _pages(
        spark,
        [
            "https://a.example/p1",
            "https://www.a.example/p1?utm_source=x",  # canonical dup of p1
            "https://a.example/p2",
            "https://a.example/p3",
            "https://b.example/only",
        ],
    )
    rows = UR.frontier_schedule(pages).collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    assert sorted(r.wave for r in by_dom["a.example"]) == [0, 1, 2]
    assert [r.wave for r in by_dom["b.example"]] == [0]
    pooled = {r.canonical_url: r.n_pages for r in by_dom["a.example"]}
    assert pooled["https://a.example/p1"] == 2
    # politeness invariant: at most one URL per (domain, wave)
    assert len({(r.domain, r.wave) for r in rows}) == len(rows)


def test_frontier_schedule_budget_truncates(spark):
    pages = _pages(spark, [f"https://a.example/p{i}" for i in range(7)])
    rows = UR.frontier_schedule(pages, max_per_domain=3).collect()
    assert len(rows) == 3
    assert sorted(r.wave for r in rows) == [0, 1, 2]
    # md5 priority is deterministic: same input, same schedule
    again = UR.frontier_schedule(pages, max_per_domain=3).collect()
    assert {r.canonical_url for r in rows} == {r.canonical_url for r in again}


def test_robots_filter_precedence(spark):
    """REP precedence: longest prefix wins; allow wins a length tie; no
    matching rule (or unknown host) means allowed."""
    rules = (
        ("a.example", "disallow", "/private"),
        ("a.example", "allow", "/private/ok"),
        ("a.example", "disallow", "/dup"),   # length tie vs the allow below
        ("a.example", "allow", "/dup"),
        ("b.example", "disallow", "/"),
    )
    pages = _pages(
        spark,
        [
            "https://a.example/private/secret",   # blocked by /private
            "https://a.example/private/ok/page",  # longest-match allow
            "https://a.example/dup/x",            # tie -> allow wins
            "https://a.example/open",             # no rule -> allowed
            "https://b.example/anything",         # host-wide block
            "https://b.example",                  # empty path matches '/'
            "https://c.example/x",                # unknown host -> allowed
        ],
    )
    got = {r.url: (r.allowed, r.matched_prefix)
           for r in UR.robots_filter(pages, rules=rules).collect()}
    assert got["https://a.example/private/secret"] == (0, "/private")
    assert got["https://a.example/private/ok/page"] == (1, "/private/ok")
    assert got["https://a.example/dup/x"] == (1, "/dup")
    assert got["https://a.example/open"] == (1, "")
    assert got["https://b.example/anything"] == (0, "/")
    assert got["https://b.example"] == (0, "/")
    assert got["https://c.example/x"] == (1, "")


def test_robots_filter_one_row_per_page(spark):
    # multiple matching rules never duplicate a page row
    pages = _pages(spark, ["https://a.example/private/ok/page"] * 3)
    rules = (("a.example", "disallow", "/private"), ("a.example", "allow", "/private/ok"))
    assert UR.robots_filter(pages, rules=rules).count() == 3


def test_path_templates_digit_collapse(spark):
    pages = _pages(
        spark,
        [
            "https://a.example/posts/page-7",
            "https://a.example/posts/page-812/",        # canonical trim joins group
            "https://www.a.example/posts/page-7?utm=x",  # same canonical as row 0
            "https://a.example/cal/2024/05/31",
            "https://b.example/posts/page-1",
        ],
    )
    got = {(r.domain, r.template): r for r in UR.path_templates(pages).collect()}
    pp = got[("a.example", "/posts/page-N")]
    assert pp.n_urls == 2 and pp.n_pages == 3
    assert pp.example_url == "https://a.example/posts/page-7"
    assert ("a.example", "/cal/N/N/N") in got
    assert got[("b.example", "/posts/page-N")].n_urls == 1


def test_recrawl_priority_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "https://a.example/keep", "<p>same</p>"),
            (2, "https://a.example/change", "<p>v1</p>"),
            (3, "https://a.example/gone", "<p>bye</p>"),
            (4, "https://www.a.example/keep?utm=x", "<p>same</p>"),  # canonical dup
            (5, "https://b.example/static", "<p>s</p>"),
        ],
        PAGES_DDL,
    )
    new = spark.createDataFrame(
        [
            (11, "https://a.example/keep", "<p>same</p>"),
            (12, "https://a.example/change", "<p>v2</p>"),
            (14, "https://a.example/fresh", "<p>new</p>"),
            (15, "https://b.example/static", "<p>s</p>"),
        ],
        PAGES_DDL,
    )
    got = {r.domain: r for r in UR.recrawl_priority(old, new).collect()}
    a = got["a.example"]
    assert (a.n_added, a.n_removed, a.n_changed, a.n_unchanged) == (1, 1, 1, 1)
    assert a.n_old == 3 and a.n_new == 3  # canonical dup collapsed
    assert a.change_rate_bp == 7500  # 3 of 4 canonical union entries
    b = got["b.example"]
    assert b.change_rate_bp == 0 and b.n_unchanged == 1
    # disjoint snapshots: everything added+removed, rate 10000
    got2 = UR.recrawl_priority(
        old.where("doc_id = 3"), new.where("doc_id = 14")
    ).collect()
    assert all(r.change_rate_bp == 10000 for r in got2)


def test_crawl_budget_exact_apportionment(spark):
    """budget 7 over weights (5,3,2): floors (3,2,1) + one remainder grant
    to the largest remainder; total is exactly the budget."""
    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("d", 0)], "domain string, weight long"
    )
    got = {r.domain: r.slots for r in UR.crawl_budget(w, 7).collect()}
    assert got == {"a": 4, "b": 2, "c": 1, "d": 0}
    # remainder tie (all rem equal): domain-asc grants, sum still exact
    w2 = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "domain string, weight long"
    )
    got2 = {r.domain: r.slots for r in UR.crawl_budget(w2, 5).collect()}
    assert got2 == {"x": 2, "y": 2, "z": 1} and sum(got2.values()) == 5
    # degenerate: zero total weight or zero budget -> empty allocation
    w0 = spark.createDataFrame([("a", 0)], "domain string, weight long")
    assert UR.crawl_budget(w0, 10).count() == 0
    assert UR.crawl_budget(w, 0).count() == 0


def test_global_rank_matches_single_window(spark):
    """Range-partitioned global rank == the unpartitioned window's ranks
    on a multi-partition relation with duplicate order keys."""
    from pyspark.sql import Window

    from graphical_context_extraction_pipeline_spark.operators.partitioning import global_rank
    from pyspark.sql import functions as F

    df = spark.range(0, 5000, 1, 16).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    got = {r.id: r.rk for r in global_rank(df, [F.col("v").desc(), F.col("id").asc()], "rk").collect()}
    want = {
        r.id: r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id").asc())).cast("long")
        ).collect()
    }
    assert got == want


def test_polite_frontier_excludes_blocked(spark):
    rules = (("b.example", "disallow", "/"),)
    pages = _pages(
        spark,
        ["https://a.example/p1", "https://a.example/p2", "https://b.example/x"],
    )
    rows = UR.polite_frontier(pages, rules=rules).collect()
    assert {r.domain for r in rows} == {"a.example"}
    assert sorted(r.wave for r in rows) == [0, 1]


def test_parse_robots_grammar_and_roundtrip(spark):
    body = (
        "# comment\n"
        "User-agent: googlebot\n"
        "Disallow: /google-only\n"
        "\n"
        "User-agent: *\n"
        "User-Agent: otherbot\n"
        "Disallow: /private   # trailing comment\n"
        "Allow: /private/ok\n"
        "Crawl-delay: 10\n"
        "Disallow:\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /second-group\n"
    )
    robots = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nDisallow: /")],
        "domain string, body string",
    )
    got = {(r.domain, r.is_allow, r.prefix) for r in UR.parse_robots(robots).collect()}
    assert got == {
        ("a.example", 0, "/private"),
        ("a.example", 1, "/private/ok"),
        ("a.example", 0, "/second-group"),
        ("b.example", 0, "/"),
    }
    # agent filter: googlebot's group is only visible when asked for
    gb = {(r.domain, r.prefix) for r in UR.parse_robots(robots, agent="googlebot").collect()}
    assert gb == {("a.example", "/google-only")}
    # bodies with no star group, or empty body, contribute nothing
    none = spark.createDataFrame(
        [("c.example", "User-agent: foo\nDisallow: /x"), ("d.example", "")],
        "domain string, body string",
    )
    assert UR.parse_robots(none).count() == 0


def test_parse_robots_feeds_robots_filter(spark):
    """End-to-end: parsing a body and applying the parsed rules gives the
    same verdicts as the literal rule tuples."""
    body = "User-agent: *\nDisallow: /private\nAllow: /private/ok"
    robots = spark.createDataFrame([("a.example", body)], "domain string, body string")
    parsed = tuple(
        ("a.example", "allow" if r.is_allow else "disallow", r.prefix)
        for r in UR.parse_robots(robots).collect()
    )
    pages = _pages(
        spark,
        ["https://a.example/private/x", "https://a.example/private/ok/y", "https://a.example/open"],
    )
    via_parsed = {r.url: r.allowed for r in UR.robots_filter(pages, rules=parsed).collect()}
    literal = (("a.example", "disallow", "/private"), ("a.example", "allow", "/private/ok"))
    via_literal = {r.url: r.allowed for r in UR.robots_filter(pages, rules=literal).collect()}
    assert via_parsed == via_literal
    assert via_parsed["https://a.example/private/x"] == 0
    assert via_parsed["https://a.example/private/ok/y"] == 1


# ---------------------------------------------------------------------------
# sitemap parse + staleness
# ---------------------------------------------------------------------------

def test_parse_sitemaps_optional_lastmod(spark):
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    xml = ("<urlset><url><loc>https://a.example/x</loc>"
           "<lastmod>2024-01-05</lastmod></url>"
           "<url><loc>https://a.example/y</loc></url>"
           "<url><lastmod>2024-01-01</lastmod></url></urlset>")  # no loc → dropped
    sm = spark.createDataFrame([("a.example", xml)], "domain string, xml string")
    got = {(r.url, r.lastmod) for r in UR.parse_sitemaps(sm).collect()}
    assert got == {("https://a.example/x", "2024-01-05"), ("https://a.example/y", "")}


def test_sitemap_staleness_statuses(spark):
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    xml = ("<urlset><url><loc>https://a.example/crawled</loc>"
           "<lastmod>2024-01-02</lastmod></url>"
           "<url><loc>https://a.example/new-page</loc></url></urlset>")
    sm = spark.createDataFrame([("a.example", xml)], "domain string, xml string")
    pages = spark.createDataFrame(
        [(1, "https://www.a.example/crawled", "<html></html>"),
         (2, "https://a.example/orphan/", "<html></html>")],
        "doc_id bigint, url string, html string",
    )
    got = {(r.url, r.status, r.lastmod) for r in UR.sitemap_staleness(sm, pages).collect()}
    assert got == {
        ("https://a.example/crawled", "listed", "2024-01-02"),   # www + canonical match
        ("https://a.example/new-page", "uncrawled", ""),
        ("https://a.example/orphan", "unlisted", ""),            # trailing / canonicalized
    }


def test_sitemap_staleness_duplicate_locs_collapse(spark):
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    xml = ("<urlset><url><loc>https://a.example/p</loc></url>"
           "<url><loc>https://a.example/p</loc><lastmod>2024-02-01</lastmod></url>"
           "<url><loc>https://a.example/p</loc><lastmod>2024-01-01</lastmod></url>"
           "</urlset>")
    sm = spark.createDataFrame([("a.example", xml)], "domain string, xml string")
    pages = spark.createDataFrame(
        [(1, "https://a.example/p", "<html></html>")],
        "doc_id bigint, url string, html string",
    )
    rows = UR.sitemap_staleness(sm, pages).collect()
    assert len(rows) == 1
    assert (rows[0].status, rows[0].lastmod) == ("listed", "2024-02-01")
