"""Driver-style correctness gate, run locally: every queries() entry with an
oracle_sql() twin must produce identical (order-insensitive) results in
Spark and DuckDB at sf0.01."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

# SPARK_GRAFT_ORACLE_SF=sf0.1 re-runs the whole parity suite at 10× the
# driver's gate scale (both sides switch corpora together)
SF_DIR = f"/root/testdata/{os.environ.get('SPARK_GRAFT_ORACLE_SF', 'sf0.01')}"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df):
    """pandas → sorted list of value tuples with normalized cells."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        vals = []
        for v in row:
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float) and v.is_integer():
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return cols, out


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row counts {len(s_rows)} vs {len(d_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {s_rows[mism[0]]} vs {d_rows[mism[0]]}"


def test_all_queries_run(spark):
    """Every queries() entry (incl. rows-only ones) executes and returns a
    stable schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
