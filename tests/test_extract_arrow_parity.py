"""Pin: the Arrow-native extraction fast path (operators/extract_arrow.py)
produces EXACTLY the rows of the row-wise pandas reference path, through the
real Spark execution of both (mapInArrow vs mapInPandas), at the gate corpus
and on adversarial kernel-fuzz documents."""

import pyarrow as pa

from graphical_context_extraction_pipeline_spark.operators.extract import (
    _chunks_from_buckets,
    _doc_chunks,
    extract_documents,
    extract_documents_pandas,
)
from graphical_context_extraction_pipeline_spark.operators.extract_arrow import (
    _iter_doc_buckets,
    rows_to_batch,
)


def _sorted_rows(df):
    return sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda d: d["chunk_id"],
    )


def test_spark_level_parity_gate_corpus(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    arrow_rows = _sorted_rows(extract_documents(docs))
    pandas_rows = _sorted_rows(extract_documents_pandas(docs))
    assert len(arrow_rows) == len(pandas_rows) > 0
    for a, p in zip(arrow_rows, pandas_rows):
        assert a == p


def test_local_bucket_parity_gate_corpus(spark, docs_path):
    """Batch-level check without Spark in the loop: the Arrow bucketer feeds
    the shared core the same bucket lists the dict loop builds."""
    import pyarrow.parquet as pq

    table = pq.read_table(docs_path)
    pdf = table.to_pandas()
    ref = {}
    for doc_id, spans, attrs, meta in zip(
        pdf["doc_id"], pdf["spans"], pdf["span_attrs"], pdf["meta"]
    ):
        rows = _doc_chunks(doc_id, spans, attrs, meta)
        if rows:
            ref[doc_id] = rows
    act = {}
    total = 0
    for batch in table.combine_chunks().to_batches():
        rows = []
        for doc_id, buckets, meta_d in _iter_doc_buckets(batch):
            r = _chunks_from_buckets(doc_id, *buckets, meta_d)
            if r:
                act[doc_id] = r
            rows.extend(r)
        rb = rows_to_batch(rows, 7)
        assert rb.num_rows == len(rows)
        total += rb.num_rows
    assert act == ref
    assert total == sum(len(v) for v in ref.values())


def test_rows_to_batch_empty():
    rb = rows_to_batch([], -1)
    assert rb.num_rows == 0
    assert rb.schema.names[0] == "chunk_id"


def test_arrow_path_edge_docs(spark):
    """Nulls and shape edges: missing meta values, null confidences/scene_ids,
    short/None bboxes, score-less words, empty docs, no-scene docs."""
    rows = [
        ("empty", [], [], None),
        ("noscene", [("asr", "hello world", None, 0)], [
            {"end_ms": 10, "confidence": 0.9, "bbox": None, "scene_id": None, "n_words": 2, "words": None},
        ], None),
        ("edge", [
            ("scene", "3: intro", None, 0),
            ("asr", "spoken words here", None, 100),
            ("asr", "fallback segment", None, 200),
            ("frame", None, "f/frame_0001.jpg", 150),
            ("ocr", "screen text", "f/frame_0001.jpg", 150),
            ("ocr", "dropped lowconf", "f/frame_0001.jpg", 150),
            ("ocr", "dropped nullconf", "f/frame_0001.jpg", 150),
        ], [
            {"end_ms": 9000, "confidence": None, "bbox": None, "scene_id": None, "n_words": None, "words": None},
            {"end_ms": 190, "confidence": 0.5, "bbox": None, "scene_id": None, "n_words": 3,
             "words": [{"word": "spoken", "start_ms": 100, "end_ms": 120, "score": 0.75},
                        {"word": "words", "start_ms": 120, "end_ms": 150, "score": None},
                        {"word": "here", "start_ms": 150, "end_ms": 190, "score": 0.5}]},
            {"end_ms": 290, "confidence": 0.25, "bbox": None, "scene_id": None, "n_words": 2, "words": []},
            {"end_ms": None, "confidence": None, "bbox": None, "scene_id": 3, "n_words": None, "words": None},
            {"end_ms": None, "confidence": 0.8, "bbox": [4.0], "scene_id": None, "n_words": None, "words": None},
            {"end_ms": None, "confidence": 0.4, "bbox": [1.0, 2.0], "scene_id": None, "n_words": None, "words": None},
            {"end_ms": None, "confidence": None, "bbox": None, "scene_id": None, "n_words": None, "words": None},
        ], {"title": "T", "channel": None, "description": "d" * 600, "tags": None, "upload_date": None, "duration_ms": None}),
    ]
    ddl = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "span_attrs array<struct<end_ms:int,confidence:double,bbox:array<double>,"
        "scene_id:int,n_words:int,words:array<struct<word:string,start_ms:int,"
        "end_ms:int,score:double>>>>, "
        "meta struct<title:string,channel:string,description:string,"
        "tags:array<string>,upload_date:string,duration_ms:long>"
    )
    docs = spark.createDataFrame(rows, schema=ddl)
    arrow_rows = _sorted_rows(extract_documents(docs))
    pandas_rows = _sorted_rows(extract_documents_pandas(docs))
    assert arrow_rows == pandas_rows
    assert len(arrow_rows) == 1  # only "edge" has a scene
    chunk = arrow_rows[0]
    assert chunk["asr_text"] == "spoken words here fallback segment"
    # A1 quirk: with a single OCR frame, every token reaches the 0.8
    # frame-fraction chrome threshold, so the surviving block is dropped
    # as chrome — both paths must agree on the empty on-screen text
    assert chunk["ocr_text"] == ""
