"""Degenerate-input robustness: every operator must return an empty result
(not crash) on empty tables — the 100 TB pipeline will see empty partitions,
empty micro-batches, and filtered-to-nothing inputs constantly."""

import pytest

from graphical_context_extraction_pipeline_spark.datagen import SPANS_DDL
from graphical_context_extraction_pipeline_spark.operators import (
    boilerplate as BP,
    dedup,
    relational as R,
    similarity,
    text_analysis as TA,
    validate as V,
)
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents

FLAT_DDL = "doc_id long, text string, lang string, source string, n_chars long"
EMB_DDL = "vec_id long, embedding array<float>, label string"


@pytest.fixture(scope="module")
def empties(spark):
    return (
        spark.createDataFrame([], SPANS_DDL),
        spark.createDataFrame([], FLAT_DDL),
        spark.createDataFrame([], EMB_DDL),
    )


OPS = {
    "extract": lambda sp, fl, em: extract_documents(sp),
    "chunk_segmentation": lambda sp, fl, em: R.chunk_segmentation(sp),
    "chunk_asr_text": lambda sp, fl, em: R.chunk_asr_text(sp),
    "chunk_chapter_assign": lambda sp, fl, em: R.chunk_chapter_assign(sp),
    "chrome_tokens": lambda sp, fl, em: R.chrome_tokens(sp),
    "timeline_interleave": lambda sp, fl, em: R.timeline_interleave(sp),
    "sliding_windows": lambda sp, fl, em: R.sliding_window_chunks(sp),
    "boilerplate_lines": lambda sp, fl, em: BP.boilerplate_lines(sp),
    "strip_boilerplate": lambda sp, fl, em: BP.strip_boilerplate(sp),
    "boilerplate_partition_local": lambda sp, fl, em: BP.boilerplate_lines_partition_local(sp),
    "coverage": lambda sp, fl, em: V.coverage(sp),
    "keyframe_gaps": lambda sp, fl, em: V.keyframe_gaps(sp),
    "asr_gaps": lambda sp, fl, em: V.asr_gaps(sp),
    "chapter_counts": lambda sp, fl, em: V.chapter_counts(sp),
    "ocr_frame_dedup": lambda sp, fl, em: R.ocr_frame_dedup(sp),
    "frame_ocr_basename": lambda sp, fl, em: R.frame_ocr_basename_join(sp),
    "dedup_exact": lambda sp, fl, em: dedup.exact_duplicates(fl),
    "dedup_keep_first": lambda sp, fl, em: dedup.dedup_keep_first(fl),
    "dedup_incremental": lambda sp, fl, em: dedup.dedup_incremental(fl, fl),
    "ngram_jaccard": lambda sp, fl, em: dedup.ngram_jaccard_pairs(fl),
    "minhash_lsh": lambda sp, fl, em: dedup.minhash_lsh_pairs(fl),
    "simhash": lambda sp, fl, em: dedup.simhash(fl),
    "simhash_near_pairs": lambda sp, fl, em: dedup.simhash_near_pairs(fl),
    "token_stats": lambda sp, fl, em: TA.token_stats(fl),
    "lang_id": lambda sp, fl, em: TA.lang_id(fl),
    "quality_score": lambda sp, fl, em: TA.quality_score(fl),
    "fingerprint": lambda sp, fl, em: TA.fingerprint(fl),
    "cosine_topk": lambda sp, fl, em: similarity.cosine_topk(em, [0, 1]),
    "ann_topk_lsh": lambda sp, fl, em: similarity.ann_topk_lsh(em, [0, 1]),
    "ivf_topk": lambda sp, fl, em: similarity.ivf_topk(em, [0, 1]),
    "embedding_cosine_dups": lambda sp, fl, em: similarity.embedding_cosine_dups(em),
    # session-5 families
    "hll_registers": lambda sp, fl, em: _CO().hll_registers(fl),
    "hll_distinct": lambda sp, fl, em: _CO().hll_distinct(fl),
    "cms_counts": lambda sp, fl, em: _CO().cms_counts(fl),
    "cms_token_estimates": lambda sp, fl, em: _CO().cms_token_estimates(fl),
    "forget_docs": lambda sp, fl, em: _CO().forget_docs(fl, fl),
    "forget_audit": lambda sp, fl, em: _CO().forget_audit(fl, fl),
    "sample_k": lambda sp, fl, em: _SA().sample_k(fl, 3),
    "unigram_surprisal": lambda sp, fl, em: TA.unigram_surprisal(fl),
    "dedup_incremental_bloom": lambda sp, fl, em: dedup.dedup_incremental_bloom(fl, fl),
    "cc_star": lambda sp, fl, em: _CL().connected_components_star(
        fl.selectExpr("doc_id AS doc_a", "doc_id + 1 AS doc_b")
    ),
}


def _CO():
    from graphical_context_extraction_pipeline_spark.operators import corpus

    return corpus


def _SA():
    from graphical_context_extraction_pipeline_spark.operators import sampling

    return sampling


def _CL():
    from graphical_context_extraction_pipeline_spark.operators import cluster

    return cluster


@pytest.mark.parametrize("name", sorted(OPS))
def test_empty_input_yields_empty_output(name, spark, empties):
    df = OPS[name](*empties)
    assert df.count() == 0
    assert df.columns  # schema survives


def test_null_spans_row(spark):
    """A row with spans = NULL (not empty array) flows through extraction
    and the intra-row relational ops without crashing."""
    from graphical_context_extraction_pipeline_spark.operators import relational as R

    df = spark.createDataFrame(
        [("doc_null", None, None, None)], SPANS_DDL
    )
    assert extract_documents(df).count() == 0
    assert R.timeline_interleave(df).count() == 0
    assert R.sliding_window_chunks(df).count() == 0
    assert R.ocr_frame_dedup(df).count() == 0
    assert BP.strip_boilerplate(df).count() == 0


def test_empty_html_pages(spark):
    from graphical_context_extraction_pipeline_spark.operators import linkgraph as LG

    pages = spark.createDataFrame([], "doc_id long, url string, html string")
    for op in (LG.extract_links, LG.anchor_counts, LG.anchor_texts, LG.domain_quality):
        df = op(pages)
        assert df.count() == 0, op.__name__
        assert df.columns


def test_empty_inputs_session6_ops(spark):
    """Session-6 families on empty relations: empty out, schema intact."""
    from graphical_context_extraction_pipeline_spark.operators import (
        html_extract as HT,
        linkgraph as LG,
        search as SE,
        urls as UR,
    )
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    pages = spark.createDataFrame([], "doc_id long, url string, html string")
    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    edges = spark.createDataFrame(
        [], "src_domain string, dst_domain string, n_links long"
    )
    ops = [
        (UR.frontier_schedule, pages),
        (UR.robots_filter, pages),
        (UR.path_templates, pages),
        (UR.polite_frontier, pages),
        (lambda p: UR.recrawl_priority(p, p), pages),
        (lambda d: UR.crawl_budget(d.selectExpr("source AS domain", "doc_id AS weight"), 10), docs),
        (LG.hits, edges),
        (LG.domain_components, pages),
        (LG.link_reciprocity, edges),
        (SE.inverted_index, docs),
        (lambda d: SE.bm25(d, "cat dog"), docs),
        (lambda d: SE.phrase_search(d, "cat dog"), docs),
        (lambda d: SE.snippets(d, "cat dog"), docs),
        (HT.sections, pages),
        (CO.length_quantiles, docs),
        (CO.corpus_health, docs),
        (lambda d: SA.epoch_shuffle(d, epoch=1), docs),
    ]
    for op, arg in ops:
        df = op(arg)
        assert df.count() == 0, getattr(op, "__name__", op)
        assert df.columns
