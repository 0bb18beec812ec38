"""Scale guarantees asserted as physical-plan properties."""

from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import relational as R
from graphical_context_extraction_pipeline_spark.operators import validate as V
from graphical_context_extraction_pipeline_spark.operators.extract import extract_documents
from graphical_context_extraction_pipeline_spark.plans.explain import (
    count_exchanges,
    has_broadcast_join,
    has_sort_merge_join,
    physical_plan,
    read_schema_columns,
)


def test_extraction_is_shuffle_free(spark, docs_path):
    """The hot path: scan → mapInPandas → (count). Zero Exchange nodes."""
    docs = spark.read.parquet(docs_path)
    chunks = extract_documents(docs)
    assert count_exchanges(chunks) == 0, physical_plan(chunks)


def test_coverage_is_shuffle_free(spark, docs_path):
    """Intra-row HOF analytics need no shuffle either."""
    docs = spark.read.parquet(docs_path)
    cov = V.coverage(docs)
    assert count_exchanges(cov) == 0, physical_plan(cov)


def test_chapter_assign_broadcasts_dimension(spark, docs_path):
    """J4's chapter dimension side must be broadcast (the fact-side
    chunk↔contained joins may legitimately sort-merge)."""
    docs = spark.read.parquet(docs_path)
    j = R.chunk_chapter_assign(docs)
    plan = physical_plan(j)
    assert has_broadcast_join(j), plan
    # the chapters relation itself must never be the big side of an SMJ:
    # all three chapter joins carry explicit broadcast hints
    assert plan.count("BroadcastExchange") >= 2, plan


def test_timeline_interleave_is_shuffle_free(spark, docs_path):
    """Per-doc ordering + seq numbering happen INSIDE the row (array_sort +
    posexplode) — the span stream must never hit an Exchange."""
    docs = spark.read.parquet(docs_path)
    tl = R.timeline_interleave(docs)
    assert count_exchanges(tl) == 0, physical_plan(tl)


def test_strip_boilerplate_span_stream_not_shuffled(spark, docs_path):
    """The boilerplate dimension may shuffle (it is tiny); the span stream
    side reaches the output through broadcast + intra-row ops only. The
    dimension aggregations account for every Exchange in the plan — the
    same aggregations alone must show the same count."""
    from graphical_context_extraction_pipeline_spark.operators import boilerplate as BP
    from pyspark.sql import functions as F

    docs = spark.read.parquet(docs_path)
    stripped = BP.strip_boilerplate(docs)
    dim_only = BP.boilerplate_lines(docs).agg(F.collect_set("norm"))
    assert count_exchanges(stripped) == count_exchanges(dim_only), physical_plan(stripped)
    assert has_broadcast_join(stripped) or "BroadcastExchange" in physical_plan(stripped)


def test_word_spans_shuffle_free(spark, docs_path):
    """Word re-emission is two colocated lateral explodes — no Exchange."""
    docs = spark.read.parquet(docs_path)
    ws = R.word_spans(docs)
    assert count_exchanges(ws) == 0, physical_plan(ws)


def test_gap_detectors_are_shuffle_free(spark, docs_path):
    """W3/W4 via intra-row consecutive pairs instead of lead() windows."""
    docs = spark.read.parquet(docs_path)
    for op in (V.keyframe_gaps, V.asr_gaps):
        df = op(docs)
        assert count_exchanges(df) == 0, physical_plan(df)


def test_chrome_tokens_shuffle_free(spark, docs_path):
    """Chrome token counting happens INSIDE the row (sorted-run detection
    over the per-doc token array) — zero Exchanges; only the few surviving
    chrome tokens are ever exploded."""
    docs = spark.read.parquet(docs_path)
    ct = R.chrome_tokens(docs)
    assert count_exchanges(ct) == 0, physical_plan(ct)


def test_sliding_windows_single_shuffle(spark, docs_path):
    """Arithmetic span→window fan-out: no window-dimension join; exactly the
    one per-(doc,window) aggregation shuffle."""
    docs = spark.read.parquet(docs_path)
    sw = R.sliding_window_chunks(docs)
    assert count_exchanges(sw) == 1, physical_plan(sw)


def test_column_pruning_reaches_scan(spark, docs_path):
    """A doc_id-only projection must not read the fat spans column."""
    docs = spark.read.parquet(docs_path).select("doc_id")
    cols = read_schema_columns(docs)
    assert "doc_id" in cols
    assert "spans" not in cols, cols


def test_flat_filter_pushdown(spark):
    """Predicates on the flat documents table reach the parquet scan."""
    from graphical_context_extraction_pipeline_spark.plans.explain import pushed_filters

    flat = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    q = flat.where(F.col("lang") == "en").select("doc_id")
    pf = pushed_filters(q)
    assert "lang" in pf, pf


def test_validation_report_single_shuffle(spark, docs_path):
    """The rollup's spans-side ingredients are intra-row; the only shuffle
    is the chunk-side aggregation joined back on doc_id (the chunks arrive
    shuffle-free from extract)."""
    docs = spark.read.parquet(docs_path)
    rep = V.validation_report(docs, extract_documents(docs))
    assert count_exchanges(rep) <= 2, physical_plan(rep)


def test_curation_quality_gate_inline(spark, docs_path):
    """The quality gate must be an inline predicate on the scan, not a join
    of the corpus against its own score table: the rejected branch alone
    (scan + filter) carries zero Exchange."""
    from graphical_context_extraction_pipeline_spark.operators.text_analysis import (
        passes_quality_expr,
    )

    flat = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rejected = flat.select("doc_id", "text").where(~passes_quality_expr())
    assert count_exchanges(rejected) == 0, physical_plan(rejected)


def test_survivors_corpus_scanned_once(spark):
    """neardup_survivors: the corpus side appears exactly once in the plan
    (one scan, one join against the membership table)."""
    from graphical_context_extraction_pipeline_spark.operators import cluster as CL
    from graphical_context_extraction_pipeline_spark.operators import dedup

    flat = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(flat)
    surv = CL.neardup_survivors(flat, pairs)
    plan = physical_plan(surv)
    # the final assembly joins ONE corpus scan against the (checkpointed)
    # membership relation; the pair machinery is behind the checkpoint
    assert plan.count("Scan ExistingRDD") <= 2, plan


def test_words_pruned_from_non_word_scans(spark, docs_path):
    """The contract's per-word `words` arrays must never reach the parquet
    scan of a query that doesn't touch them: nested-schema pruning cannot
    see through arrays_zip of the raw span_attrs column, so operators zip
    individually extracted attr-field arrays instead (functions.exprs.
    zip_spans). A regression here silently multiplies every span query's
    scan volume once word detail dominates span_attrs."""
    from graphical_context_extraction_pipeline_spark.operators import export as EX
    from graphical_context_extraction_pipeline_spark.plans.explain import formatted_plan

    spark.conf.set("spark.sql.maxMetadataStringLength", 8000)
    docs = spark.read.parquet(docs_path)
    ops = [
        R.chrome_tokens,
        R.ocr_conf_stats,
        R.chunk_segmentation,
        R.chunk_asr_text,
        R.ocr_frame_dedup,
        R.frame_ocr_basename_join,
        V.coverage,
        V.asr_gaps,
        V.chapter_counts,
        EX.transcript_lines,
    ]
    for op in ops:
        schemas = "\n".join(
            line for line in formatted_plan(op(docs)).splitlines() if "ReadSchema" in line
        )
        assert "words:array" not in schemas, (op.__name__, schemas)


def test_word_spans_scan_prunes_to_needed_fields(spark, docs_path):
    """word_spans DOES need words (+end_ms) — and nothing else from
    span_attrs."""
    from graphical_context_extraction_pipeline_spark.plans.explain import formatted_plan

    spark.conf.set("spark.sql.maxMetadataStringLength", 8000)
    docs = spark.read.parquet(docs_path)
    schemas = "\n".join(
        line for line in formatted_plan(R.word_spans(docs)).splitlines() if "ReadSchema" in line
    )
    assert "words:array" in schemas, schemas
    for absent in ("bbox", "confidence", "scene_id"):
        assert absent not in schemas, (absent, schemas)


def test_repetition_stats_is_shuffle_free(spark):
    """Repetition signals are intra-row sorted-run folds: one scan, zero
    Exchange nodes (the explode+groupBy formulation costs 3 scans + 4
    shuffles for identical output)."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = TA.repetition_stats(docs)
    assert count_exchanges(rep) == 0, physical_plan(rep)
    plan = physical_plan(rep)
    assert plan.count("Scan parquet") <= 2, plan  # one scan (+detail echo)


def test_hash_split_and_sample_are_shuffle_free(spark):
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (SA.hash_split(docs), SA.stratified_sample(docs, {"en": 5000})):
        assert count_exchanges(df) == 0, physical_plan(df)


def test_pack_sequences_single_bucket_shuffle(spark):
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = SA.pack_sequences(docs, budget=512, n_buckets=4)
    assert count_exchanges(packed) == 1, physical_plan(packed)


def test_contamination_broadcasts_eval_side(spark):
    """The benchmark/eval shingle relation must reach the join as a
    broadcast — the 100 TB train side is never shuffled for the join; the
    only Exchange is the pair-count aggregation."""
    from graphical_context_extraction_pipeline_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 50 == 0)
    pairs = dedup.contamination_pairs(docs, ev)
    assert has_broadcast_join(pairs), physical_plan(pairs)
    assert not has_sort_merge_join(pairs), physical_plan(pairs)
    assert count_exchanges(pairs) == 1, physical_plan(pairs)


def test_pii_scrub_shuffle_free_and_pruned(spark):
    """PII scrub is one narrow codegen projection: zero Exchanges, and the
    scan reads only (doc_id, text)."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = TA.pii_scrub(docs)
    assert count_exchanges(out) == 0, physical_plan(out)
    assert set(read_schema_columns(out)) <= {"doc_id", "text"}, physical_plan(out)


def test_mixture_sample_corpus_side_not_shuffled(spark):
    """The corpus is scanned once and joined to the broadcast acceptance
    table — every Exchange in the plan belongs to the tiny per-source count
    aggregation (same count as the counts relation alone), never the corpus."""
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SA.mixture_sample(docs, {"src0": 5000, "src1": 5000})
    counts_only = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    assert has_broadcast_join(out), physical_plan(out)
    assert not has_sort_merge_join(out), physical_plan(out)
    # corpus-side join input must not add shuffles beyond the dimension aggs
    assert count_exchanges(out) <= 2 * count_exchanges(counts_only) + 1, physical_plan(out)


def test_select_token_budget_no_global_sort_of_corpus(spark):
    """The two-phase prefix sum must not contain a global (non-partitioned)
    sort of the doc relation: the only Window.orderBy-without-partition
    runs over the aggregated bucket relation. Detect via Exchange
    SinglePartition feeding a Sort of the FULL corpus: the plan is allowed
    one rangepartitioning/SinglePartition exchange only on the aggregated
    side (which follows a HashAggregate)."""
    from graphical_context_extraction_pipeline_spark.operators import sampling as SA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SA.select_token_budget(docs, budget=10_000)
    plan = physical_plan(out)
    # doc-side window is partitioned by bucket -> a hashpartitioning
    # exchange must exist; exactly one SinglePartition exchange (bucket
    # offsets) is tolerated
    assert plan.count("SinglePartition") <= 1, plan
    assert "hashpartitioning(pq" in plan or "hashpartitioning(" in plan, plan


def test_duplicate_passages_single_shuffle_no_collect(spark):
    """Passage DF counting is one partial-aggregated groupBy: a single
    Exchange and no collect_list buffers anywhere in the plan."""
    from graphical_context_extraction_pipeline_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup.duplicate_passages(docs)
    plan = physical_plan(out)
    assert count_exchanges(out) == 1, plan
    assert "collect_list" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_corpus_diff_shuffles_hashes_not_text(spark):
    """Both sides reduce to (doc_id, md5) before the full-outer join: the
    join inputs' exchanges carry no `text` column."""
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    old = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = old.withColumn("text", F.concat(F.col("text"), F.lit("x")))
    out = CO.corpus_diff(old, new)
    plan = physical_plan(out)
    # md5 projected below the exchange: no raw text reference above scans
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, plan


def test_length_histogram_single_shuffle_pruned(spark):
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = CO.length_histogram(docs)
    assert count_exchanges(out) == 1, physical_plan(out)
    assert set(read_schema_columns(out)) <= {"source", "text"}, physical_plan(out)


def test_corpus_stats_single_shuffle(spark):
    """Window rank + rollup share one hashpartitioning(source) exchange."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = TA.corpus_stats(docs)
    plan = physical_plan(out)
    assert count_exchanges(out) <= 2, plan  # window partition + final agg reuse
    assert "SinglePartition" not in plan, plan


def test_sessionize_single_event_shuffle(spark):
    """One hashpartitioning(user_id) exchange moves events; the rollup's
    exchange carries only partially-aggregated session rows (HashAggregate
    below it). No SinglePartition anywhere."""
    from graphical_context_extraction_pipeline_spark.operators import events as EV

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = EV.sessionize(ev)
    plan = physical_plan(out)
    assert "SinglePartition" not in plan, plan
    assert count_exchanges(out) <= 2, plan
    assert "hashpartitioning(user_id" in plan, plan


def test_event_rollup_single_shuffle_pruned(spark):
    from graphical_context_extraction_pipeline_spark.operators import events as EV

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = EV.event_rollup(ev)
    assert count_exchanges(out) == 1, physical_plan(out)
    assert set(read_schema_columns(out)) <= {"ts", "event_type", "value"}, physical_plan(out)


def test_layout_ops_shuffle_free_and_pruned(spark, docs_path):
    """PDF/layout heuristics are intra-row folds over the sorted block
    array: scan → project → Generate, zero Exchange. Their scans read only
    (doc_id, spans, span_attrs.bbox) — in particular the heavy per-word
    arrays stay out of the ReadSchema."""
    from graphical_context_extraction_pipeline_spark.operators import layout as LY
    from graphical_context_extraction_pipeline_spark.plans.explain import formatted_plan

    spark.conf.set("spark.sql.maxMetadataStringLength", 8000)
    docs = spark.read.parquet(docs_path)
    for op in (LY.reading_order, LY.paragraphs, LY.headings):
        out = op(docs)
        assert count_exchanges(out) == 0, (op.__name__, physical_plan(out))
        schemas = "\n".join(
            line for line in formatted_plan(out).splitlines() if "ReadSchema" in line
        )
        assert "words:array" not in schemas, (op.__name__, schemas)
        assert "confidence" not in schemas, (op.__name__, schemas)
        assert "bbox" in schemas, (op.__name__, schemas)


def test_html_extraction_shuffle_free_no_python(spark):
    """DOM-heuristics extraction is scan → project (regex/HOF expressions
    inside codegen): zero Exchange, zero Python evaluation nodes — and
    main_content keeps per-page work intra-row (no explode/re-group)."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import html_extract as HT

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    for op in (HT.html_blocks, HT.main_content, HT.html_meta):
        out = op(pages)
        plan = physical_plan(out)
        assert count_exchanges(out) == 0, (op.__name__, plan)
        assert "Python" not in plan, (op.__name__, plan)


def test_url_ops_plan_shapes(spark):
    """url_parse/domain_filter: scan → project, zero Exchange. url_dedup
    shuffles only the narrow (canonical_url, doc_id) projection; domain
    rollups keep partial aggregation below their single exchange."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    for op in (UR.url_parse, UR.domain_filter):
        out = op(pages)
        assert count_exchanges(out) == 0, (op.__name__, physical_plan(out))
    dd = UR.url_dedup(pages)
    plan = physical_plan(dd)
    assert count_exchanges(dd) == 1, plan
    assert "html" not in read_schema_columns(dd), plan  # payload never scanned
    ds = UR.domain_stats(pages)
    plan = physical_plan(ds)
    assert count_exchanges(ds) <= 2, plan  # distinct-agg expansion under AQE
    assert "SinglePartition" not in plan, plan


def test_link_edges_single_shuffle(spark):
    """Edge extraction: scan → Generate → partial agg → ONE exchange. The
    page html is consumed pre-shuffle (only (src, dst) pairs move)."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import linkgraph as LG

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = LG.extract_links(pages)
    plan = physical_plan(out)
    assert count_exchanges(out) == 1, plan
    assert "SinglePartition" not in plan, plan


def test_multimodal_ops_shuffle_free_pruned(spark, docs_path):
    """caption_pairs / mm_sequence: scan → project (+Generate), zero
    Exchange; the scan reads only the spans column (no span_attrs at all)."""
    from graphical_context_extraction_pipeline_spark.operators import multimodal as MM
    from graphical_context_extraction_pipeline_spark.plans.explain import formatted_plan

    spark.conf.set("spark.sql.maxMetadataStringLength", 8000)
    docs = spark.read.parquet(docs_path)
    for op in (MM.caption_pairs, MM.mm_sequence):
        out = op(docs)
        assert count_exchanges(out) == 0, (op.__name__, physical_plan(out))
        schemas = "\n".join(
            line for line in formatted_plan(out).splitlines() if "ReadSchema" in line
        )
        assert "span_attrs" not in schemas, (op.__name__, schemas)


def test_top_terms_two_shuffles_no_window(spark):
    """(doc,term,tf) comes from intra-row run segments (no first groupBy);
    df + per-doc top-k are the only exchanges. No window over the corpus,
    no SinglePartition."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = TA.top_terms(docs)
    plan = physical_plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Window" not in plan, plan
    assert count_exchanges(out) <= 3, plan  # df agg + join sides + topk agg


def test_hll_distinct_two_partial_aggs_no_collect(spark):
    """The HLL profile is two partial-aggregated groupBys (registers, then
    the per-group estimate over ≤ m rows): exactly two Exchanges, no
    collect_list buffers, and the scan reads only (source, text)."""
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = CO.hll_distinct(docs)
    plan = physical_plan(out)
    assert count_exchanges(out) == 2, plan
    assert "collect_list" not in plan, plan
    cols = read_schema_columns(out)
    assert set(cols) <= {"source", "text"}, cols


def test_bloom_incremental_broadcasts_bit_set(spark):
    """The bloom classification joins the batch against an explicitly
    broadcast bit set (never a shuffled join on bit_pos), so the batch side
    stays unshuffled until the small maybe-side anti-join."""
    from graphical_context_extraction_pipeline_spark.operators import dedup

    seen = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = seen.limit(50).withColumn("doc_id", F.col("doc_id") + 900000)
    out = dedup.dedup_incremental_bloom(batch, seen, m_bits=4096)
    plan = physical_plan(out)
    assert "BroadcastExchange" in plan, plan
    assert "collect_list" not in plan, plan


def test_anchor_texts_window_over_aggregated_relation(spark):
    """Anchor extraction is scan→project→explode (no exchange); the only
    shuffles are the (domain, text) rollup and the per-domain top-k window
    over the ALREADY-aggregated relation — never a window over raw anchors,
    and no SinglePartition anywhere."""
    from graphical_context_extraction_pipeline_spark.datagen import ensure_html
    from graphical_context_extraction_pipeline_spark.operators import linkgraph as LG

    pages = spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
    out = LG.anchor_texts(pages)
    plan = physical_plan(out)
    assert count_exchanges(out) == 2, plan
    assert "SinglePartition" not in plan, plan


def test_cms_single_shuffle_matrix_broadcast_probe_join(spark):
    """The counter matrix is one partial-aggregated groupBy of (row, pos)
    int pairs; the point-query join broadcasts the ≤ d·w-row sketch."""
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cms = CO.cms_counts(docs)
    assert count_exchanges(cms) == 1, physical_plan(cms)
    probes = docs.sparkSession.createDataFrame([("alpha",), ("beta",)], "tok string")
    est = CO.cms_estimate(cms, probes)
    plan = physical_plan(est)
    assert "BroadcastExchange" in plan, plan
    assert "collect_list" not in plan, plan


def test_unigram_surprisal_no_text_in_shuffles(spark):
    """The LM scoring pipeline shuffles only (doc_id, token) pairs and the
    (token, count) model — raw text never enters an exchange, and there is
    no collect anywhere (the corpus total rides a 1-row broadcast)."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = TA.unigram_surprisal(docs)
    plan = physical_plan(out)
    assert "collect_list" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, plan


def test_asof_attribution_single_exchange_pushed_filters(spark):
    """The union–window as-of join moves both event streams through ONE
    hashpartitioning(user_id) exchange; conversion/view type filters reach
    the parquet scan as PushedFilters and value/props never load."""
    from graphical_context_extraction_pipeline_spark.operators import temporal as TP

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = TP.view_attribution(ev)
    plan = physical_plan(out)
    assert count_exchanges(out) == 1, plan
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(user_id" in plan, plan
    assert "In(event_type" in plan, plan
    assert set(read_schema_columns(out)) <= {"event_id", "ts", "user_id", "event_type"}, plan


def test_concurrent_sessions_bucket_join_no_cartesian(spark):
    """The interval self-overlap is an equi-join on the time bucket (plus
    the pair-once claim filter) — no BroadcastNestedLoop/Cartesian, no
    SinglePartition anywhere in the composed plan."""
    from graphical_context_extraction_pipeline_spark.operators import temporal as TP

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = TP.concurrent_sessions(ev)
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_strip_passages_bounded_buffers_no_text_key_shuffle(spark):
    """Passage removal: the only aggregation buffer is the per-doc covered
    START set (bounded by the doc's own token count) — no collect_list
    anywhere; shuffles are keyed by passage/doc_id, never SinglePartition."""
    from graphical_context_extraction_pipeline_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = D.strip_duplicate_passages(docs)
    plan = physical_plan(out)
    assert "collect_list" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert count_exchanges(out) <= 4, plan


def test_length_quantiles_histogram_form_no_value_buffering(spark):
    """Exact quantiles via the (value,count) histogram: no `percentile`
    buffering aggregate anywhere, two exchanges total (the histogram
    group-by, then the shared hashpartitioning(source) for windows +
    final rollup), scan pruned to (source, text)."""
    from graphical_context_extraction_pipeline_spark.operators import corpus as CO

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = CO.length_quantiles(docs)
    plan = physical_plan(out)
    assert "percentile" not in plan.lower(), plan
    assert count_exchanges(out) <= 2, plan
    assert set(read_schema_columns(out)) <= {"source", "text"}, plan
    assert "SinglePartition" not in plan, plan


def test_frontier_schedule_two_narrow_shuffles(spark):
    """Canonical-group agg + per-domain window: two exchanges, page
    payload never scanned (url-only ReadSchema), no global sort."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = UR.frontier_schedule(pages)
    plan = physical_plan(out)
    assert count_exchanges(out) <= 2, plan
    assert set(read_schema_columns(out)) <= {"url"}, plan
    assert "SinglePartition" not in plan, plan


def test_robots_filter_pages_side_never_shuffles(spark):
    """The rules relation collapses to per-domain arrays (its own tiny
    exchange) and broadcasts; the page stream is scan → broadcast-join →
    intra-row fold, scanning only (doc_id, url)."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = UR.robots_filter(pages)
    plan = physical_plan(out)
    assert has_broadcast_join(out), plan
    assert count_exchanges(out) <= 1, plan  # the rules-side groupBy only
    assert set(read_schema_columns(out)) <= {"doc_id", "url"}, plan


def test_path_templates_single_narrow_shuffle(spark):
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = UR.path_templates(pages)
    plan = physical_plan(out)
    assert count_exchanges(out) <= 2, plan  # distinct-agg expansion under AQE
    assert set(read_schema_columns(out)) <= {"url"}, plan
    assert "SinglePartition" not in plan, plan


def test_inverted_index_bounded_buffers_hot_set_broadcast(spark):
    """df rollup is pure partial agg; the posting collect runs behind a
    broadcast anti-join on the hot set, so no aggregation buffer can hold
    more than cap entries. No single-partition funnels."""
    from graphical_context_extraction_pipeline_spark.operators import search as SE

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SE.inverted_index(docs)
    plan = physical_plan(out)
    assert has_broadcast_join(out), plan
    assert "SinglePartition" not in plan, plan
    assert set(read_schema_columns(out)) <= {"doc_id", "text"}, plan


def test_bm25_two_scans_zero_shuffles_single_tokenize(spark):
    """Scoring pass: scan → project → TakeOrderedAndProject. Zero
    exchanges, no global sort, and the bound token array is evaluated
    exactly once per row (the >0 filter must not re-inline it)."""
    from graphical_context_extraction_pipeline_spark.operators import search as SE

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SE.bm25(docs, "dup vector spark", k=10)
    plan = physical_plan(out)
    assert count_exchanges(out) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("split(lower") == 1, plan


def test_recrawl_priority_html_reduced_to_md5_before_shuffle(spark):
    """Both snapshots collapse to (canonical_url, md5) signatures before
    the full-outer join — no exchange carries html."""
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import urls as UR

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = UR.recrawl_priority(pages, pages)
    plan = physical_plan(out)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line, plan
    assert "SinglePartition" not in plan, plan


def test_html_sections_zero_shuffle(spark):
    from graphical_context_extraction_pipeline_spark import datagen
    from graphical_context_extraction_pipeline_spark.operators import html_extract as HT

    pages = spark.read.parquet(datagen.ensure_html("/root/testdata/sf0.001"))
    out = HT.sections(pages)
    plan = physical_plan(out)
    assert count_exchanges(out) == 0, plan
    assert "Generate" in plan, plan  # posexplode, not a join fan-out


def test_bm25_from_index_point_lookup_and_broadcast(spark, tmp_path):
    """Serving shape: the token filter is PUSHED to the index parquet
    scan (point lookup — 'dup' appears in PushedFilters), the candidate
    relation broadcast-joins norms, and the norms scan reads only its
    two columns."""
    from graphical_context_extraction_pipeline_spark.operators import search as SE
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        has_broadcast_join,
        physical_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SE.inverted_index(docs).write.parquet(str(tmp_path / "postings"))
    SE.doc_norms(docs).write.parquet(str(tmp_path / "norms"))
    out = SE.bm25_from_index(
        spark.read.parquet(str(tmp_path / "postings")),
        spark.read.parquet(str(tmp_path / "norms")),
        "dup graft",
    )
    plan = physical_plan(out)
    assert has_broadcast_join(out), plan
    assert "SinglePartition" not in plan, plan
    # scoring never rescans the corpus text
    assert "documents.parquet" not in plan, plan
    # the dl fetch is a point lookup too: candidate doc_ids pushed into
    # the norms scan
    assert "PushedFilters: [In(doc_id" in plan, plan


def test_embedding_incremental_single_banding_node_per_side(spark):
    """The 10-table banding is ONE vectorized ArrowEvalPython node per
    banding evaluation (a single numpy matmul), not 10 unioned per-table
    scans or 80 interpreted HOF folds — the round-4 11.6 s → 1.1 s fix,
    pinned. Exactly 3 evaluations: batch once, seen twice (the seen
    banding subtree feeds both the bucket stats and the index join; in
    production the seen index is a materialized table, so the double
    evaluation is a test-fixture artifact, not a serving cost)."""
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators.similarity import (
        embedding_incremental_pairs,
    )
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        physical_plan,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 40 == 1).withColumn(
        "vec_id", F.col("vec_id") + 600000
    )
    plan = physical_plan(embedding_incremental_pairs(batch, emb))
    assert plan.count("ArrowEvalPython") == 3, plan
    assert "SinglePartition" not in plan, plan


def test_ann_from_index_probe_pushdown_no_shuffle(spark, tmp_path):
    """Vector serving shape: the query's 10 (table, bucket) probe keys
    are PUSHED into the materialized index's parquet scan (Or(And(
    EqualTo(table,..), EqualTo(bucket,..))..) in PushedFilters), no
    banding job runs at query time (zero ArrowEvalPython), and the only
    exchange is the ≤k-row ordered take — never a corpus-sized shuffle."""
    from graphical_context_extraction_pipeline_spark.operators import similarity
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        physical_plan,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = similarity._embedding_dim(emb)
    similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        dim,
    ).write.parquet(str(tmp_path / "embindex"))
    index = spark.read.parquet(str(tmp_path / "embindex"))
    qv = list(emb.where("vec_id = 0").first()["embedding"])
    plan = physical_plan(similarity.ann_from_index(index, qv, k=5))
    assert "PushedFilters: [Or(" in plan or "EqualTo(table," in plan, plan
    assert "ArrowEvalPython" not in plan, plan  # no banding at query time
    assert "embeddings.parquet" not in plan, plan  # corpus never rescanned


def test_bm25_serve_batch_distributed_no_singlepartition(spark, tmp_path):
    """Batched serving shape: query terms broadcast into the index join,
    postings explode executor-side (a Generate node over the index scan,
    NOT a driver collect), the top-k window partitions by query_id —
    never SinglePartition — and document text is never rescanned."""
    from graphical_context_extraction_pipeline_spark.operators import search as SE
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        has_broadcast_join,
        physical_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SE.inverted_index(docs).write.parquet(str(tmp_path / "postings"))
    SE.doc_norms(docs).write.parquet(str(tmp_path / "norms"))
    qdf = spark.createDataFrame(
        [(1, "dup graft"), (2, "vector")], "query_id long, query string"
    )
    out = SE.bm25_serve_batch(
        spark.read.parquet(str(tmp_path / "postings")),
        spark.read.parquet(str(tmp_path / "norms")),
        qdf,
    )
    plan = physical_plan(out)
    assert has_broadcast_join(out), plan
    assert "SinglePartition" not in plan, plan
    assert "Generate explode" in plan, plan  # postings explode in-plan
    assert "documents.parquet" not in plan, plan


def test_ann_serve_batch_broadcasts_queries_index_never_shuffles(spark, tmp_path):
    """Batched vector serving: exactly ONE ArrowEvalPython node (the
    query batch's banding — the materialized index needs none), the
    banded queries broadcast into the bucket join, the top-k window
    partitions by query — no SinglePartition, no corpus rescan."""
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators import similarity
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        has_broadcast_join,
        physical_plan,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = similarity._embedding_dim(emb)
    similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        dim,
    ).write.parquet(str(tmp_path / "embindex"))
    index = spark.read.parquet(str(tmp_path / "embindex"))
    queries = emb.where(emb.vec_id.isin([0, 1])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ann_serve_batch(index, queries, k=5, dim=dim)
    plan = physical_plan(out)
    assert plan.count("ArrowEvalPython") == 1, plan
    assert has_broadcast_join(out), plan
    assert "SinglePartition" not in plan, plan


def test_bigram_surprisal_text_never_shuffles(spark):
    """The bigram model path: text reduces to (doc_id, w1, w2) pairs
    intra-row before any Exchange, and no window or collect appears
    anywhere (the pair relation is referenced by the model and the
    scoring join — AQE reuses the aggregation exchange across them)."""
    from graphical_context_extraction_pipeline_spark.operators.text_analysis import (
        bigram_surprisal,
    )
    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bigram_surprisal(flat)
    plan = physical_plan(out)
    assert "collect_list" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, plan
    assert "Window" not in plan, plan


def test_triangle_stats_no_windows_no_collect(spark):
    """Triangle counting is joins + partial aggs only — no windows, no
    SinglePartition, domain-granular keys throughout."""
    from graphical_context_extraction_pipeline_spark.datagen import ensure_html
    from graphical_context_extraction_pipeline_spark.operators import linkgraph as LG
    from graphical_context_extraction_pipeline_spark.plans.explain import (
        physical_plan,
    )

    pages = spark.read.parquet(ensure_html("/root/testdata/sf0.001"))
    plan = physical_plan(LG.triangle_stats(LG.extract_links(pages)))
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_classifier_inference_is_shuffle_free(spark):
    """Classifier inference at 100 TB must stay embarrassingly parallel:
    one Arrow-batched kernel over a pruned (doc_id, text) scan — zero
    Exchange, no row-at-a-time Python (BatchEvalPython), and the scan
    must not drag other columns through the kernel."""
    from graphical_context_extraction_pipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (TA.classifier_score(docs), TA.classifier_select(docs, 0)):
        plan = physical_plan(df)
        assert count_exchanges(df) == 0, plan
        assert "BatchEvalPython" not in plan, plan
        cols = read_schema_columns(df)
        assert set(cols) <= {"doc_id", "text"}, cols


def test_semdedup_shuffles_only_on_cid(spark):
    """SemDeDup's pairwise stage must key on the cluster id alone: the
    codebook rides as literals (no centroid-side Exchange), so every
    Exchange in the plan hashes on cid / the final drop-id semi-join —
    never a corpus-wide all-pairs shape."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = SIM.semdedup(emb, n_centroids=4, tau_e4=9000)
    plan = physical_plan(out)
    # assignment itself adds no Exchange: scan → project(argmax literals)
    assigned = SIM.ivf_assign(emb, SIM.ivf_centroids(emb, 4, 0))
    assert count_exchanges(assigned) == 0, physical_plan(assigned)
    assert "EvalPython" not in plan, plan


def test_embed_text_hash_zero_shuffle(spark):
    """The dense vectorizer is a pure map stage: one Arrow kernel over a
    (doc_id, text)-pruned scan — NO Exchange anywhere, no row-at-a-time
    Python. At fleet scale its output co-partitions with its input."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SIM.embed_text_hash(flat, 64)
    plan = physical_plan(out)
    assert count_exchanges(out) == 0, plan
    assert "BatchEvalPython" not in plan, plan


def test_session5_ops_no_cartesian_no_row_python(spark):
    """Sweep: none of the session-5 operators may degrade to a Cartesian
    product or row-at-a-time Python (BatchEvalPython) — every join is
    keyed (or an intentional tiny broadcast cross of a scalar relation),
    every kernel Arrow-batched."""
    from pyspark.sql import functions as F

    from graphical_context_extraction_pipeline_spark.operators import (
        curate as CU,
        dedup,
        linkgraph as LG,
        sampling as SA,
        similarity as SIM,
        text_analysis as TA,
        urls as UR,
    )

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    edges = LG.extract_links(
        spark.createDataFrame(
            [(1, "https://a.com/x", '<a href="https://b.com/y">l</a>')],
            "doc_id long, url string, html string",
        )
    )
    dfs = {
        "semdedup": SIM.semdedup(emb, n_centroids=4),
        "text_semdedup": SIM.semdedup(
            SIM.embed_text_hash(flat, 64), n_centroids=4, tau_e4=9500
        ),
        "text_hashed_features": SIM.hashed_features(flat, 64),
        "d4_prune": SIM.prototypicality_prune(emb, n_centroids=4),
        "bitext": SIM.bitext_mine(
            emb.where(F.col("vec_id") % 2 == 0), emb.where(F.col("vec_id") % 2 == 1)
        ),
        "winnow_pairs": dedup.winnow_pairs(flat),
        "cdc_stats": dedup.cdc_dedup_stats(flat),
        "kn": TA.kneser_ney_bigrams(flat),
        "cooc": TA.cooccurrence_counts(flat),
        "verdicts": CU.training_verdicts(flat.select("doc_id", "text")),
        "span_corruption": SA.span_corruption(flat),
        "neg_sampling": SA.negative_sampling(flat, k=50),
        "walks": LG.random_walks(edges, length=2),
        "seed_dist": LG.seed_distances(edges, ("a.com",), max_depth=2),
        "text_urls": UR.text_urls(flat),
    }
    from graphical_context_extraction_pipeline_spark.operators import multimodal as MM

    spans = spark.read.parquet(
        "/root/repo/data/sf0.001/documents_spans.parquet"
    ).select("doc_id", "spans")
    dfs["exact_substring_runs"] = dedup.exact_substring_runs(flat)
    dfs["media_ref_pairs"] = MM.media_ref_pairs(spans)
    dfs["moore_lewis_select"] = TA.moore_lewis_select(
        flat, flat.where(F.col("source").isin("src0", "src1"))
    )
    dfs["ngram_novelty"] = dedup.ngram_novelty(flat)
    from graphical_context_extraction_pipeline_spark.operators import search as SE

    pidx = SE.positional_index(flat, cap=64)
    dfs["phrase_from_index"] = SE.phrase_from_index(pidx, "vector spark")
    dfs["phrase_serve_batch"] = SE.phrase_serve_batch(
        pidx,
        spark.createDataFrame([(1, "vector spark")], "query_id long, phrase string"),
    )
    for name, df in dfs.items():
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
