"""Planted-construction gates for dedup.strip_duplicate_passages: exact
coverage masking, overlapping occurrences, sub-threshold survival, and
degenerate inputs."""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators.dedup import (
    strip_duplicate_passages,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    out = strip_duplicate_passages(_docs(spark, rows), **kw).collect()
    return {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed) for r in out}


PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly one 8-gram


def test_shared_passage_removed_from_both_docs(spark):
    rows = [
        (1, f"alpha beta {PASSAGE} gamma"),
        (2, f"{PASSAGE} delta epsilon"),
        (3, "unrelated text entirely here without any duplicate eight gram"),
    ]
    got = _run(spark, rows)
    assert got[1] == ("alpha beta gamma", 11, 8)
    assert got[2] == ("delta epsilon", 10, 8)
    assert got[3][2] == 0 and got[3][0] == rows[2][1]


def test_overlapping_occurrences_mask_union_of_positions(spark):
    # "x p1..p8 p1..p8 y" in doc 1: both occurrences of the hot passage
    # cover tokens 1..16; x and y survive
    rows = [
        (1, f"x {PASSAGE} {PASSAGE} y"),
        (2, f"{PASSAGE} tail"),
    ]
    got = _run(spark, rows)
    assert got[1] == ("x y", 18, 16)
    assert got[2] == ("tail", 9, 8)


def test_fully_removed_doc_yields_empty_string(spark):
    rows = [(1, PASSAGE), (2, PASSAGE)]
    got = _run(spark, rows)
    assert got[1] == ("", 8, 8)
    assert got[2] == ("", 8, 8)


def test_passage_below_min_docs_survives(spark):
    rows = [
        (1, f"{PASSAGE} solo occurrence"),
        (2, "a completely different document body of words"),
    ]
    got = _run(spark, rows)
    assert got[1][2] == 0  # df=1 < min_docs=2


def test_short_null_and_empty_docs_pass_through(spark):
    rows = [(1, "only seven tokens here not eight ok"), (2, ""), (3, None)]
    # add two docs sharing a passage so the hot set is non-empty
    rows += [(4, PASSAGE), (5, PASSAGE)]
    got = _run(spark, rows)
    assert got[1] == ("only seven tokens here not eight ok", 7, 0)
    assert got[2] == ("", 0, 0)
    assert got[3] == ("", 0, 0)


def test_partial_overlap_of_distinct_hot_passages(spark):
    # two different hot 8-grams overlapping inside one doc: union coverage
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "a5 a6 a7 a8 b1 b2 b3 b4"
    rows = [
        (1, f"{a} b1 b2 b3 b4 tail"),  # contains both hot passages, overlapping
        (2, a),
        (3, b),
    ]
    got = _run(spark, rows)
    # doc 1 tokens: a1..a8 b1..b4 tail = 13; covered 0..11 -> only "tail"
    assert got[1] == ("tail", 13, 12)


def test_whitespace_normalization_contract(spark):
    rows = [(1, "  spaced\tout\ntext  here  "), (2, "x"), (3, "x")]
    got = _run(spark, rows)
    assert got[1] == ("spaced out text here", 4, 0)


# ---------------------------------------------------------------------------
# C4 sentence-span family (c4_spans / c4_span_dedup)
# ---------------------------------------------------------------------------

def test_c4_spans_hand_traced(spark):
    from graphical_context_extraction_pipeline_spark.operators import dedup

    shared = "One two. Three four. Five six."
    docs = spark.createDataFrame(
        [
            (1, shared + " Unique tail here."),
            (2, "Fresh head first! " + shared),
            (3, "Nothing in common. At all. Truly."),
        ],
        "doc_id bigint, text string",
    )
    rows = dedup.c4_spans(docs).collect()
    # exactly the shared 3-sentence block duplicates (lowercased key)
    assert len(rows) == 1
    r = rows[0]
    assert r.span == "one two.\x1fthree four.\x1ffive six."
    assert r.n_docs == 2 and r.example_doc_id == 1


def test_c4_span_dedup_removes_covered_sentences(spark):
    from graphical_context_extraction_pipeline_spark.operators import dedup

    shared = "One two. Three four. Five six."
    docs = spark.createDataFrame(
        [
            (1, shared + " Unique tail here."),
            (2, "Fresh head first! " + shared),
            (3, "Too short. Only two."),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in dedup.c4_span_dedup(docs).collect()}
    # doc 1: sentences 0-2 covered, the tail survives
    assert got[1].clean_text == "Unique tail here."
    assert (got[1].n_sentences, got[1].n_removed) == (4, 3)
    # doc 2: the head survives, sentences 1-3 covered
    assert got[2].clean_text == "Fresh head first!"
    assert (got[2].n_sentences, got[2].n_removed) == (4, 3)
    # <3 sentences: passthrough, zero removed
    assert got[3].clean_text == "Too short. Only two."
    assert got[3].n_removed == 0


def test_c4_within_doc_repeat_counts_once(spark):
    from graphical_context_extraction_pipeline_spark.operators import dedup

    block = "Alpha one. Beta two. Gamma three."
    docs = spark.createDataFrame(
        [(1, block + " " + block), (2, "Unrelated body. More text. Third bit.")],
        "doc_id bigint, text string",
    )
    # the span repeats WITHIN doc 1 only → document frequency 1 → not hot
    assert dedup.c4_spans(docs).count() == 0
    got = {r.doc_id: r for r in dedup.c4_span_dedup(docs).collect()}
    assert got[1].n_removed == 0
