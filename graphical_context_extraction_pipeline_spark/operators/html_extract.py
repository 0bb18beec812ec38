"""HTML main-content extraction — DOM heuristics, JVM-side end to end.

The north rule's core capability: "HTML boilerplate strip … DOM
heuristics". Input is a table (doc_id, url, html); output is the article
body with chrome (nav/header/aside/footer), link farms, scripts, styles
and comments removed — the Readability/Boilerpipe block-classification
family (Kohlschütter et al., WSDM'10: text density + link density are the
two dominant features), restated as pure Spark SQL expressions:

1. strip comments and ``<script>``/``<style>`` subtrees;
2. segment into blocks at block-level tag boundaries (a sentinel byte is
   injected before each block tag, then one ``split`` — no parser, no
   Python; the page is processed as a flat tag stream exactly like the
   single-pass segmenters in production extraction pipelines);
3. per block: tag, tag-stripped entity-unescaped whitespace-normalized
   text, text length, anchor count, anchor-text length, and link density
   in basis points;
4. classify: content tags (p/h2/h3/li/…) with ``text_len ≥ MIN_TEXT_LEN``
   and ``link_density_bp ≤ MAX_LINK_DENSITY_BP`` survive; nav chrome and
   link-dense boilerplate die.

Everything is built-in string/regex/HOF expressions inside whole-stage
codegen — zero Python UDFs, zero shuffles (per-document work only), so at
10^12 documents the job is scan → project, embarrassingly parallel. The
regex subset used (lazy quantifiers, ``(?s)``, ``\\b``, alternation — NO
lookaround, NO backreferences in patterns) is chosen to behave identically
under Java regex (Spark) and RE2 (the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import bind

# Block-level boundaries, longest-first so leftmost-first alternation can
# never pick a prefix alternative. \b guards '<p' vs '<pre' style clashes.
BLOCK_TAGS = (
    "blockquote", "footer", "header", "aside", "table", "title",
    "h1", "h2", "h3", "h4", "nav", "div", "ul", "ol", "tr", "td", "th", "li", "p",
)
# Blocks whose text is article content when dense enough.
CONTENT_TAGS = ("p", "h2", "h3", "li", "blockquote", "td", "th")
MIN_TEXT_LEN = 15
MAX_LINK_DENSITY_BP = 3000

_SEP = "\x1e"
_MARK_RE = r"<(" + "|".join(BLOCK_TAGS) + r")\b"
_ANCHOR_RE = r"(?s)<a\b[^>]*>(.*?)</a>"
# Unescape AFTER tag stripping (so '&lt;here&gt;' never reads as a tag)
# and '&amp;' LAST (so '&amp;lt;' correctly yields the literal '&lt;').
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

_BLOCK_T = (
    "struct<block_idx:bigint,tag:string,text:string,text_len:bigint,"
    "n_links:bigint,link_text_len:bigint,link_density_bp:bigint>"
)


def _norm_text(x: Column) -> Column:
    out = F.regexp_replace(x, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _blocks_expr(html: Column) -> Column:
    """array<struct> of classified blocks for one page."""
    clean = F.regexp_replace(html, r"(?s)<!--.*?-->", " ")
    clean = F.regexp_replace(clean, r"(?s)<(script|style)\b[^>]*>.*?</(script|style)>", " ")
    marked = F.regexp_replace(clean, _MARK_RE, _SEP + "<$1")

    def rec(blk, i):
        text = _norm_text(blk)
        anchors = F.regexp_extract_all(blk, F.lit(_ANCHOR_RE), F.lit(1))
        text_len = F.length(text).cast("long")
        link_text_len = F.aggregate(
            F.transform(anchors, lambda a: F.length(_norm_text(a)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.struct(
            i.cast("long").alias("block_idx"),
            F.regexp_extract(blk, r"^<([a-z0-9]+)", 1).alias("tag"),
            text.alias("text"),
            text_len.alias("text_len"),
            F.size(anchors).cast("long").alias("n_links"),
            link_text_len.alias("link_text_len"),
            F.floor(link_text_len * 10000 / F.greatest(text_len, F.lit(1)))
            .cast("long")
            .alias("link_density_bp"),
        ).cast(_BLOCK_T)

    return bind(
        F.split(marked, _SEP),
        lambda arr: F.filter(F.transform(arr, rec), lambda b: b["text"] != ""),
    )


def html_blocks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """The block relation: one row per non-empty block with its DOM
    features. ``block_idx`` is the block's position in the raw tag stream
    (holes where empty blocks were dropped), so downstream consumers can
    reconstruct document order."""
    return pages.select(
        "doc_id", F.explode(_blocks_expr(F.col(html_col))).alias("b")
    ).select("doc_id", "b.*")


def main_content(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Boilerplate-stripped article body per page (one row per input doc,
    even when nothing survives): main_text joined with newlines in block
    order, plus classification counters."""
    kept = bind(
        _blocks_expr(F.col(html_col)),
        lambda blocks: F.struct(
            F.size(blocks).cast("long").alias("n_blocks"),
            F.filter(
                blocks,
                lambda b: b["tag"].isin(*CONTENT_TAGS)
                & (b["text_len"] >= MIN_TEXT_LEN)
                & (b["link_density_bp"] <= MAX_LINK_DENSITY_BP),
            ).alias("kept"),
        ),
    )
    return pages.select("doc_id", "url", kept.alias("k")).select(
        "doc_id",
        "url",
        F.array_join(F.transform("k.kept", lambda b: b["text"]), "\n").alias("main_text"),
        F.size("k.kept").cast("long").alias("n_kept"),
        F.col("k.n_blocks").alias("n_blocks"),
        F.aggregate(
            F.transform("k.kept", lambda b: b["text_len"]),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("kept_text_len"),
    )


def html_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Head metadata + page-level link stats: title, meta description, h1,
    total anchor count."""
    h = F.col(html_col)
    return pages.select(
        "doc_id",
        "url",
        _norm_text(F.regexp_extract(h, r"(?s)<title>(.*?)</title>", 1)).alias("title"),
        F.regexp_extract(h, r'<meta name="description" content="([^"]*)"', 1).alias(
            "meta_description"
        ),
        _norm_text(F.regexp_extract(h, r"(?s)<h1[^>]*>(.*?)</h1>", 1)).alias("h1"),
        F.size(F.regexp_extract_all(h, F.lit(r"<a\b"), F.lit(0))).cast("long").alias("n_anchors"),
    )


# tag → markdown prefix for the emitted line; everything else (p, td, th,
# blockquote) renders as a plain paragraph. Shared with the oracle as data.
MD_PREFIX = (("h2", "## "), ("h3", "### "), ("li", "- "))


def main_content_markdown(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Markdown rendition of the extracted article body (the form most
    text-curation pipelines actually store): the SAME kept-block
    classification as :func:`main_content`, with headings mapped to
    '## '/'### ', list items to '- ', and paragraphs verbatim, joined with
    blank lines in block order. One row per page (empty markdown when
    nothing survives), plus the kept-block count so consumers can filter
    empty extractions without string inspection.

    Scale: identical plan shape to main_content — scan → project, zero
    Python, zero shuffle; the markdown mapping is a per-block CASE inside
    the same HOF chain."""
    def _md_line(b):
        out = b["text"]
        for tag, prefix in MD_PREFIX:
            out = F.when(b["tag"] == tag, F.concat(F.lit(prefix), b["text"])).otherwise(out)
        return out

    kept = bind(
        _blocks_expr(F.col(html_col)),
        lambda blocks: F.filter(
            blocks,
            lambda b: b["tag"].isin(*CONTENT_TAGS)
            & (b["text_len"] >= MIN_TEXT_LEN)
            & (b["link_density_bp"] <= MAX_LINK_DENSITY_BP),
        ),
    )
    return pages.select("doc_id", "url", kept.alias("kept")).select(
        "doc_id",
        "url",
        F.array_join(F.transform("kept", _md_line), "\n\n").alias("markdown"),
        F.size("kept").cast("long").alias("n_kept"),
    )


HEADING_TAGS = ("h2", "h3")


def sections(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Heading-delimited sections of the extracted article — the RAG-prep
    shape (retrieval units with their own heading context instead of one
    undifferentiated body): kept content blocks are segmented at h2/h3
    boundaries, blocks before the first heading form a preamble section.
    Emits (doc_id, section_idx, heading, body, n_blocks); heading is ''
    for the preamble, body joins the section's non-heading block texts
    with newlines.

    Same single page scan and classification as main_content; the
    sectioning is the O(n) positional segments primitive (starter flags →
    consecutive_pairs → one slice per section) — zero shuffle, no O(n²)
    append-fold.
    """
    from ..functions.exprs import segments

    def build(blocks):
        kept = F.filter(
            blocks,
            lambda b: b["tag"].isin(*CONTENT_TAGS)
            & (b["text_len"] >= MIN_TEXT_LEN)
            & (b["link_density_bp"] <= MAX_LINK_DENSITY_BP),
        )

        def to_sections(k):
            # project the kept structs into two PRIMITIVE arrays once —
            # sectioning then slices string arrays, never fat structs
            # (measured ~2× on the sf0.1 twin corpus)
            pair = F.struct(
                F.transform(k, lambda b: b["text"]).alias("txts"),
                F.transform(
                    k, lambda b: b["tag"].isin(*HEADING_TAGS).cast("int")
                ).alias("ish"),
            )

            def over(p):
                txts, ish = p["txts"], p["ish"]

                def is_start(arr, i):
                    return (i == 1) | (F.element_at(arr, i.cast("int")) == 1)

                def sec(seg):
                    is_h = F.element_at(ish, seg["a"].cast("int")) == 1
                    body_start = seg["a"] + is_h.cast("int")
                    body_len = seg["b"] - body_start
                    body = F.array_join(
                        F.slice(txts, body_start.cast("int"), body_len.cast("int")),
                        "\n",
                    )
                    return F.struct(
                        F.when(is_h, F.element_at(txts, seg["a"].cast("int")))
                        .otherwise(F.lit(""))
                        .alias("heading"),
                        body.alias("body"),
                        (seg["b"] - seg["a"]).cast("long").alias("n_blocks"),
                    )

                return F.when(
                    F.size(ish) >= 1, F.transform(segments(ish, is_start), sec)
                ).otherwise(F.expr("array()").cast(
                    "array<struct<heading:string,body:string,n_blocks:bigint>>"
                ))

            return bind(pair, over)

        return bind(kept, to_sections)

    secs = pages.select(
        "doc_id", bind(_blocks_expr(F.col(html_col)), build).alias("secs")
    )
    out = secs.select("doc_id", F.posexplode("secs").alias("section_idx", "s"))
    return out.select(
        "doc_id",
        F.col("section_idx").cast("long").alias("section_idx"),
        F.col("s.heading").alias("heading"),
        F.col("s.body").alias("body"),
        F.col("s.n_blocks").alias("n_blocks"),
    )
