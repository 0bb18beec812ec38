"""graphical_context_extraction_pipeline_spark — a PySpark-native rebuild of the
graphical-context extraction pipeline (reference: Risad-Raihan/
graphical-context-extraction-pipeline, read-only at /root/reference).

Brand-new engine, NOT a port: the reference's per-video sequential Python
pipeline (phase 2/src/pipeline.py:33-225) is re-expressed as a zero-shuffle
DataFrame job over an interleaved text+media `documents` table
(doc_id, spans array<struct<kind,text,media_ref,offset>>), with all
per-document sequential logic confined inside Arrow-batched pandas UDFs
and everything else in native Spark SQL expressions.
"""

__version__ = "0.1.0"
