"""The libm-free idf recurrence: Python twin ≡ DuckDB twin exactly (same
integer algorithm, so identity is structural, not a shared-libm accident),
and both track floor(1e6·ln) to within the documented ±1."""

import math
import random

import duckdb
import pytest

from graphical_context_extraction_pipeline_spark.functions.intmath import (
    ln_e6,
    ln_e6_sql,
)


def _cases():
    random.seed(7)
    cases = [
        (2 * n + 2, 2 * d + 1)
        for n in (1, 10, 100, 991, 10**4, 10**6, 10**9, 10**12)
        for d in range(0, 200)
        if 2 * n + 2 >= 2 * d + 1
    ]
    cases += [(random.randint(2, 2**62), 1) for _ in range(300)]
    cases += [(random.randint(2, 2**62),) * 2 for _ in range(50)]  # ratio 1
    b = [random.randint(1, 2**40) for _ in range(300)]
    cases += [(x * random.randint(1, 2**20), x) for x in b]
    return cases


def test_python_twin_tracks_libm_floor():
    worst = 0
    for a, b in _cases():
        got = ln_e6(a, b)
        true = math.floor(1_000_000 * math.log(a / b)) if a > b else 0
        worst = max(worst, abs(got - true))
    assert worst <= 1  # documented contract: within ±1 of the e6 floor


def test_duckdb_twin_is_bit_identical():
    con = duckdb.connect()
    items, col = ln_e6_sql("a", "b", "x")
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _cases())
    rows = con.execute(f"SELECT a, b, {items} FROM t").fetchall()
    for r in rows:
        a, b, v = int(r[0]), int(r[1]), int(r[-1])
        assert ln_e6(a, b) == v, (a, b)


def test_domain_guard():
    with pytest.raises(ValueError):
        ln_e6(3, 5)
    with pytest.raises(ValueError):
        ln_e6(1, 0)
    assert ln_e6(1, 1) == 0
