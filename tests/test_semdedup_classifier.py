"""SemDeDup / D4 prototypicality pruning / hashed-classifier inference.

Unit-level pins over tiny constructed corpora (the oracle-parity suite
covers the registered sf0.01 shapes); python replicas recompute every
decision independently.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from graphical_context_extraction_pipeline_spark.operators import (
    similarity as SIM,
    text_analysis as TA,
)

EMB_DDL = "vec_id long, embedding array<float>, label string"


def _unit(*xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [float(x / n) for x in xs]


def _perturb(v, d):
    return [float(x + d) for x in v]


@pytest.fixture(scope="module")
def emb(spark):
    # two well-separated directions plus near-copies of vector 1
    rows = [
        (1, _unit(1.0, 0.1, 0.0, 0.0), "a"),
        (2, _perturb(_unit(1.0, 0.1, 0.0, 0.0), 0.01), "a"),  # near-dup of 1
        (3, _perturb(_unit(1.0, 0.1, 0.0, 0.0), 0.03), "a"),  # near-dup of 1
        (10, _unit(0.0, 0.0, 1.0, 0.2), "b"),
        (11, _unit(0.0, 0.1, 1.0, 0.0), "b"),
        (12, _unit(0.2, 0.0, 1.0, 0.1), "b"),
    ]
    return spark.createDataFrame(rows, EMB_DDL)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_semdedup_drops_later_near_dups(spark, emb):
    out = {r["vec_id"]: r for r in SIM.semdedup(emb, n_centroids=2, tau_e4=9900).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 12}
    # keep-first: the lowest id of the near-dup group survives
    assert out[1]["kept"]
    assert not out[2]["kept"] and not out[3]["kept"]
    # the b-direction vectors are not that similar to each other
    rows = emb.collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in rows}
    for i in (10, 11, 12):
        for j in (10, 11, 12):
            if i < j:
                assert math.floor(_cos(vecs[i], vecs[j]) * 10000) < 9900
    assert out[10]["kept"] and out[11]["kept"] and out[12]["kept"]
    # near-dups landed in the same cluster as their original
    assert out[1]["cid"] == out[2]["cid"] == out[3]["cid"]


def test_semdedup_python_replica(spark, emb):
    """Full independent replay: seeded-reservoir centroids, dot-argmax
    assignment with the (dot, cid DESC) tiebreak, MULTI-PROBE (top-2
    centroid) pair scope, keep-first verdicts — for n_probe in {1, 2}."""
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def pri(vid):
        return int(hashlib.md5(f"ivf:{vid}".encode()).hexdigest()[:15], 16)

    n_cent = 2
    cents = [vecs[v] for v in sorted(vecs, key=lambda v: (pri(v), v))[:n_cent]]

    def probe(v, n_probe):
        scored = [(sum(x * y for x, y in zip(v, c)), i) for i, c in enumerate(cents)]
        return [i for _, i in sorted(scored, key=lambda t: (-t[0], -t[1]))[:n_probe]]

    tau = 9900
    for n_probe in (1, 2):
        cid = {vid: probe(v, 1)[0] for vid, v in vecs.items()}
        memb = {vid: set(probe(v, n_probe)) for vid, v in vecs.items()}
        dropped = set()
        for a in vecs:
            for b in vecs:
                if a < b and memb[a] & memb[b]:
                    if math.floor(_cos(vecs[a], vecs[b]) * 10000) >= tau:
                        dropped.add(b)
        got = {
            r["vec_id"]: (r["cid"], r["kept"])
            for r in SIM.semdedup(
                emb, n_centroids=n_cent, tau_e4=tau, n_probe=n_probe
            ).collect()
        }
        assert got == {v: (cid[v], v not in dropped) for v in vecs}, n_probe


def test_semdedup_empty(spark):
    empty = spark.createDataFrame([], EMB_DDL)
    assert SIM.semdedup(empty).count() == 0


def test_prototypicality_prune_counts_and_order(spark, emb):
    # drop_bp=3400 on a 3-member cluster -> (3*3400) DIV 10000 = 1 dropped
    out = SIM.prototypicality_prune(emb, n_centroids=2, drop_bp=3400).collect()
    by_cid = {}
    for r in out:
        by_cid.setdefault(r["cid"], []).append(r)
    assert len(out) == 6
    saw_drop = False
    for cid, members in by_cid.items():
        n_drop = (len(members) * 3400) // 10000
        dropped = [r for r in members if not r["kept"]]
        assert len(dropped) == n_drop
        saw_drop = saw_drop or n_drop > 0
        # dropped rows are exactly the top of the (cos desc, vec_id) order
        order = sorted(members, key=lambda r: (-r["cos_c_e4"], r["vec_id"]))
        assert {r["vec_id"] for r in order[:n_drop]} == {r["vec_id"] for r in dropped}
    assert saw_drop
    # a self-assigned seed vector sits at cosine 1.0 -> e4 floor 10000
    assert max(r["cos_c_e4"] for r in out) == 10000


def test_prototypicality_drop_all_and_none(spark, emb):
    none = SIM.prototypicality_prune(emb, n_centroids=2, drop_bp=0).collect()
    assert all(r["kept"] for r in none)
    allbp = SIM.prototypicality_prune(emb, n_centroids=2, drop_bp=10000).collect()
    assert not any(r["kept"] for r in allbp)


def _py_weight(feat: str) -> int:
    h = int(hashlib.md5((TA.CLS_SALT + feat).encode()).hexdigest()[:15], 16)
    return h % TA.CLS_WEIGHT_MOD - (TA.CLS_WEIGHT_MOD - 1) // 2


def _py_score(text: str):
    toks = text.lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return len(feats), sum(_py_weight(f) for f in feats)


DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def test_classifier_score_replica(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "single",
        "",
        "   ",
        "Repeated repeated REPEATED tokens tokens",
        "a b c d e f g h i j k l m n o p",
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, DOCS_DDL)
    got = {r["doc_id"]: (r["n_feats"], r["margin"]) for r in TA.classifier_score(docs).collect()}
    assert got == {i: _py_score(t) for i, t in enumerate(texts)}


def test_classifier_select_cross_multiplied(spark):
    texts = ["alpha beta gamma delta", "zeta eta theta", "one", ""]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, DOCS_DDL)
    thr = 0  # keep docs with non-negative mean weight
    kept = {r["doc_id"] for r in TA.classifier_select(docs, min_mean_w_e3=thr).collect()}
    expect = set()
    for i, t in enumerate(texts):
        n, m = _py_score(t)
        if n > 0 and m * 1000 >= thr * n:
            expect.add(i)
    assert kept == expect
    # empty-text doc is always dropped
    assert 3 not in kept


def test_semdedup_recall_single_vs_multi_probe(spark):
    """SemDeDup's round-4 measured trade, closed by multi-probe in round
    5.  Strict argmax scope (n_probe=1) misses near-dup pairs straddling
    a seeded cluster boundary — recall on the planted perturbed copies is
    substantial but strictly below the 1.0 the multi-table banding
    (embedding_cosine_dups) achieves on the SAME plants (pinned by
    test_embedding_dups_recall); measured band at n_centroids ∈
    {4, 8, 16, 32} on sf0.001: 0.76 / 0.76 / 0.64 / 0.84 (seeded
    boundaries are noisy, not monotone).  The default n_probe=2 overlap
    catches the straddlers: measured 1.0 at n_centroids=16 on the same
    plants; the pin leaves noise room at ≥0.95 per the round-4 verdict's
    bar."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planted = entry._planted_emb(emb)
    plant_ids = {r["vec_id"] for r in planted.where("vec_id >= 600000").collect()}
    assert plant_ids, "no plants at this sf"

    def recall(n_probe):
        out = {
            r["vec_id"]: r["kept"]
            for r in SIM.semdedup(planted, 16, 9000, n_probe=n_probe).collect()
        }
        caught = sum(1 for v in plant_ids if not out[v])
        return caught / len(plant_ids), out

    r1, _ = recall(1)
    assert 0.5 <= r1 < 1.0, r1
    r2, out2 = recall(2)
    assert r2 >= 0.95, (r2, r1)
    assert r2 > r1  # multi-probe strictly closes the boundary gap here
    # originals always survive (keep-first + no natural pair above tau)
    originals = {v - 600000 for v in plant_ids if v < 700000}
    assert all(out2[o] for o in originals)
