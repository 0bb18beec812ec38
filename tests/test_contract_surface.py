"""Driver-contract self-consistency: the claims in COVERAGE.md and the
oracle surface must always reference real queries()."""

import os
import re

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_oracle_has_a_query():
    queries = set(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())
    missing = oracles - queries
    assert not missing, f"oracle_sql entries without queries(): {sorted(missing)}"


def test_coverage_md_query_claims_exist():
    queries = set(entrymod.queries().keys())
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    claimed = set(re.findall(r"`Q:([a-z0-9_]+)`", text)) | set(
        re.findall(r"Q:([a-z0-9_]+)", text)
    )
    missing = claimed - queries
    assert not missing, f"COVERAGE.md claims queries that do not exist: {sorted(missing)}"


def test_oracle_sql_is_valid_duckdb():
    """Every oracle string at least BINDS in DuckDB (tables registered as in
    the driver) — catches syntax/typo regressions without running them."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle {name} does not bind: {ex}") from ex


def test_corpus_exercises_word_paths():
    """The driver-gate corpus must keep BOTH A3 confidence paths live:
    segments WITH per-word structs (incl. scoreless words — the enricher
    filter's subjects, reference phase 2/src/enricher.py:51-68) and
    segments WITHOUT word detail (confidence × n_words fallback)."""
    from graphical_context_extraction_pipeline_spark.datagen import DOCS_PER_SF, generate_doc

    with_words = without = scoreless = 0
    for i in range(DOCS_PER_SF["sf0.001"]):
        for sp, at in zip(*(lambda d: (d["spans"], d["span_attrs"]))(generate_doc(i))):
            if sp["kind"] != "asr":
                continue
            w = at["words"]
            if w is None:
                without += 1
            else:
                assert len(w) == at["n_words"]
                assert w[0]["start_ms"] == sp["offset"] and w[-1]["end_ms"] == at["end_ms"]
                assert all(a["end_ms"] >= a["start_ms"] for a in w)
                with_words += 1
                scoreless += sum(1 for x in w if x["score"] is None)
    assert with_words > 50 and without > 20 and scoreless > 100, (with_words, without, scoreless)
