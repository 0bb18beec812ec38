"""Shared Spark SQL expression combinators."""

from __future__ import annotations

from pyspark.sql import functions as F


def bind(expr, f):
    """Let-binding for Spark SQL array expressions: evaluate ``expr`` ONCE
    and pass it to ``f`` as a higher-order-function lambda variable.

    Load-bearing for performance: Catalyst's CollapseProject freely inlines
    a projected column into every downstream reference, so an expensive
    array expression (tokenize → hash → combine) referenced from N places
    (size / slices / explode) gets evaluated N times. Wrapping it as the
    element of a 1-element array and binding it through ``transform`` forces
    single evaluation (measured 2-4× on the dedup shingle pipelines)."""
    return F.element_at(F.transform(F.array(expr), f), 1)


def consecutive_pairs(arr):
    """array<T> → array<struct<a:T, b:T>> of consecutive element pairs of a
    SORTED array — the intra-row equivalent of lead() over a per-key window
    (zero shuffle). Empty/singleton arrays yield an empty pair array; the
    empty branch is built from zero-length slices of the same array so both
    CASE branches carry the element type without spelling it out."""

    def pairs(a):
        n = F.size(a) - 1
        empty = F.zip_with(
            F.slice(a, 1, 0), F.slice(a, 1, 0), lambda x, y: F.struct(x.alias("a"), y.alias("b"))
        )
        full = F.zip_with(
            F.slice(a, 1, n), F.slice(a, 2, n), lambda x, y: F.struct(x.alias("a"), y.alias("b"))
        )
        return F.when(n >= 1, full).otherwise(empty)

    return bind(arr, pairs)


def zip_spans(attrs: tuple[str, ...] = ("end_ms",)):
    """arrays_zip of the spans array (as field ``s``) with INDIVIDUALLY
    EXTRACTED span_attrs field arrays (each named after its attr field).

    Load-bearing for scan cost: Catalyst's nested-schema pruning cannot see
    through ``arrays_zip`` of a whole struct-array column, so zipping raw
    ``span_attrs`` drags every attr field — including the heavy per-word
    ``words`` arrays — through the parquet scan of queries that never touch
    them (measured 2.6× on chrome_tokens at sf0.1 once the contract grew
    word detail). ``span_attrs.f`` compiles to GetArrayStructFields, which
    prunes exactly: ReadSchema carries only the named fields (asserted by
    tests/test_plan_properties.py). Consumers address attr fields as
    ``z.<field>``."""
    return F.arrays_zip(
        F.col("spans").alias("s"),
        *[F.col(f"span_attrs.{f}").alias(f) for f in attrs],
    )


def segments(arr, is_start):
    """[start, end) index ranges (1-based, end exclusive) of the groups of
    a SORTED array, where ``is_start(arr, i)`` decides whether the i-th
    element opens a new group (use a CASE branch for the ``i == 1`` guard —
    ``element_at(arr, 0)`` raises and SQL OR does not short-circuit).

    The O(n) intra-row group-by-adjacency primitive: an ``aggregate`` fold
    that APPENDS group rows to its accumulator copies the array every step
    — O(n²) per row (measured 6× on layout.paragraphs at sf0.1). Starter
    indexes from one positional scan, paired into ranges via
    consecutive_pairs with a sentinel n+1. Callers must short-circuit
    empty arrays BEFORE calling (sequence(1, 0) is DESCENDING, not empty).
    """
    n = F.size(arr)
    starters = F.filter(F.sequence(F.lit(1), n), lambda i: is_start(arr, i))
    return consecutive_pairs(F.concat(starters, F.array(n + 1)))
