"""DOM-heuristics main-content extraction (operators/html_extract.py):
hand-crafted pages pinning block segmentation, entity handling, the
link-density and length thresholds, and chrome removal."""

from graphical_context_extraction_pipeline_spark.datagen import generate_html_doc
from graphical_context_extraction_pipeline_spark.operators import html_extract as H

PAGES_DDL = "doc_id long, url string, html string"


def _page(spark, html, doc_id=1):
    return spark.createDataFrame([(doc_id, f"https://x/{doc_id}", html)], PAGES_DDL)


def test_chrome_dropped_content_kept(spark):
    html = (
        "<html><head><title>t</title></head><body>"
        '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>'
        "<p>the quick brown fox jumps over the lazy dog</p>"
        "<h2>a section heading here</h2>"
        '<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
        "</body></html>"
    )
    out = H.main_content(_page(spark, html)).collect()[0]
    assert out.main_text == "the quick brown fox jumps over the lazy dog\na section heading here"
    assert out.n_kept == 2


def test_script_style_comment_removed(spark):
    html = (
        "<p>real content stays right here</p>"
        "<script>var x = 1 < 2; fake('content');</script>"
        "<style>p { color: red; }</style>"
        "<!-- hidden comment content -->"
        "<p>and a second real paragraph</p>"
    )
    rows = H.html_blocks(_page(spark, html)).collect()
    texts = [r.text for r in rows]
    assert texts == ["real content stays right here", "and a second real paragraph"]


def test_entity_unescape_order(spark):
    # '&amp;lt;' must yield the literal '&lt;' (amp unescaped last), and
    # '&lt;b&gt;' must NOT become a stripped tag (tags stripped first).
    html = "<p>rock &amp; roll &lt;b&gt;bold&lt;/b&gt; and &amp;lt; stays</p>"
    row = H.html_blocks(_page(spark, html)).collect()[0]
    assert row.text == "rock & roll <b>bold</b> and &lt; stays"


def test_link_density_boundary(spark):
    # anchor text 6 chars / text 20 chars = 3000 bp exactly → kept;
    # 7/20 = 3500 bp → dropped.
    at_limit = '<p>aaaa bbbb ccc <a href="/x">dd efg</a></p>'  # 20 chars, 6 link
    over = '<p>aaa bbbb ccc <a href="/x">dd efgh</a></p>'  # 20 chars, 7 link
    out1 = H.main_content(_page(spark, at_limit)).collect()[0]
    out2 = H.main_content(_page(spark, over)).collect()[0]
    assert out1.n_kept == 1 and out2.n_kept == 0
    b1 = H.html_blocks(_page(spark, at_limit)).collect()[0]
    assert (b1.text_len, b1.link_text_len, b1.link_density_bp) == (20, 6, 3000)


def test_min_text_len_boundary(spark):
    assert H.main_content(_page(spark, "<p>exactly15chars.</p>")).collect()[0].n_kept == 1
    assert H.main_content(_page(spark, "<p>only14chars..</p>")).collect()[0].n_kept == 0


def test_empty_and_boilerplate_only_pages_emit_rows(spark):
    only_nav = '<nav><a href="/">Home</a></nav>'
    for html in ("", only_nav):
        out = H.main_content(_page(spark, html)).collect()
        assert len(out) == 1
        assert out[0].main_text == "" and out[0].n_kept == 0


def test_html_meta(spark):
    html = (
        '<html><head><title> My  Title </title>'
        '<meta name="description" content="the description text">'
        "</head><body><h1>Big Header</h1>"
        '<a href="/1">x</a><a href="/2">y</a></body></html>'
    )
    m = H.html_meta(_page(spark, html)).collect()[0]
    assert m.title == "My Title"
    assert m.meta_description == "the description text"
    assert m.h1 == "Big Header"
    assert m.n_anchors == 2


def test_generator_deterministic_and_recoverable():
    u1, h1 = generate_html_doc(42, "alpha beta gamma delta " * 20, "src1")
    u2, h2 = generate_html_doc(42, "alpha beta gamma delta " * 20, "src1")
    assert (u1, h1) == (u2, h2)
    # different doc → different chrome draws, same structure
    _, h3 = generate_html_doc(43, "alpha beta gamma delta " * 20, "src1")
    assert h3 != h1


def test_main_content_recovers_article_words(spark):
    # End-to-end: the extracted main text consists (almost) entirely of the
    # original article words — chrome vocabulary (nav labels, promo, legal)
    # must not leak in.
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    _, html = generate_html_doc(7, text, "src0")
    out = H.main_content(_page(spark, html, doc_id=7)).collect()[0]
    got = set(out.main_text.replace("\n", " ").split())
    # allowed non-article tokens: the injected entity tail + the list-item
    # suffix the generator appends to <li> rows
    article = set(text.split()) | {"&", "more", "<here>", "item"}
    assert got <= article, got - article
    # and a healthy majority of the body made it through
    assert out.kept_text_len > len(text) * 0.5


def test_html_ops_empty_input(spark):
    empty = spark.createDataFrame([], PAGES_DDL)
    assert H.html_blocks(empty).count() == 0
    assert H.main_content(empty).count() == 0
    assert H.html_meta(empty).count() == 0


def test_markdown_rendition(spark):
    """Headings map to ##/###, list items to '- ', paragraphs stay plain,
    blocks join with blank lines in block order; chrome never leaks."""
    from graphical_context_extraction_pipeline_spark.operators.html_extract import (
        main_content_markdown,
    )

    body = (
        "<h2>Section One Heading</h2>"
        "<p>A paragraph long enough to pass the minimum text length rule.</p>"
        "<li>A list item that is also long enough to be kept here.</li>"
        "<h3>Sub Heading Number Two</h3>"
        '<nav><a href="/a">Aa</a> <a href="/b">Bb</a> chrome chrome chrome</nav>'
    )
    pages = spark.createDataFrame(
        [(1, "https://x.example/p", body)], "doc_id long, url string, html string"
    )
    row = main_content_markdown(pages).collect()[0]
    parts = row["markdown"].split("\n\n")
    assert parts[0] == "## Section One Heading"
    assert parts[1].startswith("A paragraph")
    assert parts[2] == "- A list item that is also long enough to be kept here."
    assert parts[3] == "### Sub Heading Number Two"
    assert row["n_kept"] == 4
    assert "chrome" not in row["markdown"]


def test_sections_heading_delimited(spark):
    from graphical_context_extraction_pipeline_spark.operators import html_extract as HT

    html = (
        "<p>preamble paragraph long enough to be kept here</p>"
        "<h2>First Section Heading Long Enough</h2>"
        "<p>body one is long enough to pass the filter</p>"
        "<p>body two is long enough to pass the filter</p>"
        "<h2>Second Section Heading Long Enough</h2>"
        "<h3>Nested Heading Also Long Enough Here</h3>"
        "<p>body three is long enough to pass the filter</p>"
    )
    pages = spark.createDataFrame([(1, "u", html)], "doc_id long, url string, html string")
    rows = {r.section_idx: r for r in HT.sections(pages).collect()}
    assert rows[0].heading == "" and "preamble" in rows[0].body
    assert rows[1].heading == "First Section Heading Long Enough"
    assert rows[1].body.count("\n") == 1 and rows[1].n_blocks == 3
    # consecutive headings: the h2 section has an empty body, the h3
    # starts its own section
    assert rows[2].heading == "Second Section Heading Long Enough"
    assert rows[2].body == "" and rows[2].n_blocks == 1
    assert rows[3].heading == "Nested Heading Also Long Enough Here"
    assert "body three" in rows[3].body
    # page with no kept blocks emits no sections
    empty = spark.createDataFrame([(2, "u", "<p>tiny</p>")], "doc_id long, url string, html string")
    assert HT.sections(empty).count() == 0
