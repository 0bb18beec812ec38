"""bitext_mine: planted parallel pair mined first + full python replica
(numpy banding, integer neighborhood margins)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

EMB_DDL = "vec_id long, embedding array<float>, label string"
DIM = 8
PLANES, TABLES, SEED = SIM.EMB_DUP_PLANES, SIM.EMB_DUP_TABLES, SIM.EMB_DUP_SEED


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(40):
        v = rng.normal(size=DIM)
        rows.append((i, [float(np.float32(x)) for x in v], "x"))
    # plant: tgt 101 is a tiny perturbation of src 0 (a true translation pair)
    base = [x for x in rows[0][1]]
    rows.append((101, [float(np.float32(x + 0.01)) for x in base], "y"))
    df = spark.createDataFrame(rows, EMB_DDL)
    return df.where(F.col("vec_id") % 2 == 0), df.where(F.col("vec_id") % 2 == 1)


def _py_mine(src_rows, tgt_rows, k, min_margin):
    planes = np.concatenate(
        [SIM._hyperplanes(DIM, PLANES, SEED + 1000 * t) for t in range(TABLES)]
    )
    weights = 1 << np.arange(PLANES, dtype=np.int64)

    def buckets(v):
        bits = (np.asarray(v, dtype=np.float64) @ planes.T) > 0
        return bits.reshape(TABLES, PLANES) @ weights

    sb = {i: buckets(v) for i, v in src_rows.items()}
    tb = {j: buckets(v) for j, v in tgt_rows.items()}
    cand = {
        (i, j)
        for i in sb
        for j in tb
        if any(sb[i][t] == tb[j][t] for t in range(TABLES))
    }

    def cos_e6(a, b):
        a = [float(x) for x in a]
        b = [float(x) for x in b]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.floor(dot / (na * nb) * 1_000_000)

    p = {
        (i, j): cos_e6(src_rows[i], tgt_rows[j])
        for i, j in cand
        if cos_e6(src_rows[i], tgt_rows[j]) > 0
    }
    sx, sy = {}, {}
    for i in {i for i, _ in p}:
        tops = sorted(((c, j) for (a, j), c in p.items() if a == i), key=lambda t: (-t[0], t[1]))[:k]
        sx[i] = (sum(c for c, _ in tops), len(tops))
    for j in {j for _, j in p}:
        tops = sorted(((c, i) for (i, b), c in p.items() if b == j), key=lambda t: (-t[0], t[1]))[:k]
        sy[j] = (sum(c for c, _ in tops), len(tops))
    out = {}
    for (i, j), c in p.items():
        sxi, kx = sx[i]
        syj, ky = sy[j]
        m = (2_000_000 * c * kx * ky) // (sxi * ky + syj * kx)
        cur = out.get(i)
        if cur is None or (m, -j) > (cur[2], -cur[1]):
            out[i] = (c, j, m)
    return {
        (i, j, c, m) for i, (c, j, m) in out.items() if m >= min_margin
    }


def test_bitext_mine_replica_and_plant(spark, corpus):
    src, tgt = corpus
    src_rows = {r["vec_id"]: list(r["embedding"]) for r in src.collect()}
    tgt_rows = {r["vec_id"]: list(r["embedding"]) for r in tgt.collect()}
    got = {
        (r["src_id"], r["tgt_id"], r["cos_e6"], r["margin_e6"])
        for r in SIM.bitext_mine(src, tgt, k=2, min_margin_e6=0).collect()
    }
    expect = _py_mine(src_rows, tgt_rows, k=2, min_margin=0)
    assert got == expect
    # the planted pair is mined for src 0 with near-1.0 cosine
    planted = [t for t in got if t[0] == 0]
    assert planted and planted[0][1] == 101 and planted[0][2] > 990_000


def test_bitext_mine_threshold_filters(spark, corpus):
    src, tgt = corpus
    everything = SIM.bitext_mine(src, tgt, k=2, min_margin_e6=0).collect()
    hi = SIM.bitext_mine(src, tgt, k=2, min_margin_e6=1_200_000).collect()
    assert {r["src_id"] for r in hi} <= {r["src_id"] for r in everything}
    assert all(r["margin_e6"] >= 1_200_000 for r in hi)
    assert len(hi) < len(everything)
