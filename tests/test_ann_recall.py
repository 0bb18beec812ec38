"""ANN quality gates: approximate top-k (LSH buckets, IVF probing) must
recover a meaningful fraction of the exact cosine top-k, and every result
they do return must be exact-cosine-scored (re-rank correctness)."""

from graphical_context_extraction_pipeline_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"
QUERY_IDS = list(range(10))
K = 10


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], {})[r["vec_id"]] = r["cos_e4"]
    return out


def test_ivf_recall_and_rerank_exactness(spark):
    emb = _emb(spark)
    exact = _by_query(similarity.cosine_topk(emb, QUERY_IDS, k=K).collect())
    approx = _by_query(similarity.ivf_topk(emb, QUERY_IDS, k=K, n_centroids=16, n_probe=4).collect())

    recalls = []
    for q, want in exact.items():
        got = approx.get(q, {})
        recalls.append(len(set(got) & set(want)) / len(want))
        # re-rank exactness: any vec the ANN returns carries the exact score
        for v, score in got.items():
            if v in want:
                assert score == want[v], (q, v)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, recalls


def test_lsh_recall(spark):
    emb = _emb(spark)
    exact = _by_query(similarity.cosine_topk(emb, QUERY_IDS, k=K).collect())
    approx = _by_query(similarity.ann_topk_lsh(emb, QUERY_IDS, k=K).collect())
    recalls = [
        len(set(approx.get(q, {})) & set(want)) / len(want) for q, want in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_probe_sweep_monotone(spark):
    """More probes → recall can only improve (same centroids, superset of
    candidate lists)."""
    emb = _emb(spark)
    exact = _by_query(similarity.cosine_topk(emb, QUERY_IDS, k=K).collect())

    def recall(n_probe):
        approx = _by_query(
            similarity.ivf_topk(emb, QUERY_IDS, k=K, n_centroids=16, n_probe=n_probe).collect()
        )
        rs = [
            len(set(approx.get(q, {})) & set(want)) / len(want) for q, want in exact.items()
        ]
        return sum(rs) / len(rs)

    r2, r16 = recall(2), recall(16)
    assert r16 >= r2
    assert r16 >= 0.99  # probing every list IS the exact search


def test_ann_from_index_merge_law(spark):
    """Serving from the materialized banded index ≡ ann_topk_lsh over the
    corpus, per query, at the same (planes, tables, seed) — the vector
    twin of the bm25_from_index merge law."""
    emb = _emb(spark)
    dim = similarity._embedding_dim(emb)
    index = similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        dim,
    )
    want_all = _by_query(
        similarity.ann_topk_lsh(
            emb,
            QUERY_IDS[:3],
            k=K,
            n_planes=similarity.EMB_DUP_PLANES,
            n_tables=similarity.EMB_DUP_TABLES,
            seed=similarity.EMB_DUP_SEED,
        ).collect()
    )
    qvs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(emb.vec_id.isin(QUERY_IDS[:3])).collect()
    }
    for q in QUERY_IDS[:3]:
        got = {
            r["vec_id"]: (r["cos_e4"], r["rank"])
            for r in similarity.ann_from_index(
                index, qvs[q], k=K, exclude_ids=(q,)
            ).collect()
        }
        want = want_all.get(q, {})
        assert {v: c for v, (c, _) in got.items()} == want, q
        # rank order: dense 1..n by (cos desc, vec_id asc)
        ranked = sorted(got.items(), key=lambda kv: (-kv[1][0], kv[0]))
        assert [r for _, (_, r) in ranked] == list(range(1, len(ranked) + 1))


def test_ann_from_index_probe_misses_and_self(spark):
    emb = _emb(spark)
    dim = similarity._embedding_dim(emb)
    index = similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        dim,
    )
    qv = list(emb.where("vec_id = 0").first()["embedding"])
    # without exclusion the query's own row is the top hit (cos 10000 or
    # 9999 on the e4 floor boundary)
    top = similarity.ann_from_index(index, qv, k=1).first()
    assert top["vec_id"] == 0 and top["cos_e4"] >= 9999 and top["rank"] == 1
    # empty index → empty result, stable schema
    got = similarity.ann_from_index(index.limit(0), qv, k=5)
    assert got.count() == 0
    assert got.columns == ["vec_id", "cos_e4", "rank"]


def test_ann_serve_batch_merge_law(spark):
    """Batched serving from the materialized index ≡ ann_topk_lsh per
    stored query at the same (planes, tables, seed)."""
    from pyspark.sql import functions as F

    emb = _emb(spark)
    dim = similarity._embedding_dim(emb)
    index = similarity.lsh_bucket_multi(
        emb,
        similarity.EMB_DUP_PLANES,
        similarity.EMB_DUP_TABLES,
        similarity.EMB_DUP_SEED,
        dim,
    )
    qids = QUERY_IDS[:3]
    queries = emb.where(emb.vec_id.isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _by_query(
        similarity.ann_serve_batch(index, queries, k=K, dim=dim).collect()
    )
    want = _by_query(
        similarity.ann_topk_lsh(
            emb,
            qids,
            k=K,
            n_planes=similarity.EMB_DUP_PLANES,
            n_tables=similarity.EMB_DUP_TABLES,
            seed=similarity.EMB_DUP_SEED,
        ).collect()
    )
    assert got == want
    # empty query batch → empty, schema stable
    out = similarity.ann_serve_batch(index, queries.limit(0), k=K, dim=dim)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cos_e4", "rank"]


def test_ivf_from_index_merge_law(spark):
    """Serving from the materialized assignment ≡ ivf_topk(n_iters=0)
    per stored query at the same codebook."""
    from pyspark.sql import functions as F

    emb = _emb(spark)
    cents = similarity.ivf_centroids(emb, n_centroids=16, n_iters=0)
    assigned = similarity.ivf_assign(emb, cents)
    want_all = _by_query(
        similarity.ivf_topk(emb, QUERY_IDS[:3], k=K, n_centroids=16, n_iters=0).collect()
    )
    qvs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin(QUERY_IDS[:3])).collect()
    }
    for q in QUERY_IDS[:3]:
        got = {
            r["vec_id"]: r["cos_e4"]
            for r in similarity.ivf_from_index(
                assigned, cents, qvs[q], k=K, exclude_ids=(q,)
            ).collect()
        }
        assert got == want_all.get(q, {}), q
    # empty probe result keeps the schema
    out = similarity.ivf_from_index(assigned.limit(0), cents, qvs[QUERY_IDS[0]])
    assert out.count() == 0 and out.columns == ["vec_id", "cos_e4", "rank"]


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------

def test_quantize_range_and_zero_vector(spark):
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: list(r.qvec) for r in SIM.quantize_embeddings(emb).collect()}
    # (3,4)/5 = (0.6, 0.8) → floor(76.2+0.5)=76, floor(101.6+0.5)=102
    assert got[1] == [76, 102]
    assert got[2] == [0, 0]          # zero vector: no NaN poisoning
    assert got[3] == [-127, 0]
    assert all(all(-127 <= v <= 127 for v in q) for q in got.values())


def test_quantized_topk_recall_vs_exact(spark):
    """Int8 SQ keeps ≥0.85 mean recall@10 against exact cosine (measured
    0.98 mean / 0.90 min at both sf0.001 and sf0.01 — the bound leaves
    noise room, a collapse to LSH-level ~0.65 fails loudly)."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ids = list(range(10))
    exact, quant = {}, {}
    for r in SIM.cosine_topk(emb, ids).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    for r in SIM.ann_topk_quantized(emb, ids).collect():
        quant.setdefault(r.query_id, set()).add(r.vec_id)
    recs = [len(exact[q] & quant.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recs) / len(recs) >= 0.85, recs


def test_quantized_topk_kernel_matches_expression_twin(spark):
    """The Arrow kernel (one mapInPandas pass, int64 matmul, per-batch
    top-k pre-reduction) returns EXACTLY the expression twin's rows —
    the integer ranking has no tie ambiguity, so set equality is the
    right pin (round-5 fix for the interpreted-HOF trap: the twin ran
    ~13× cosine_topk's wall on the same plan shape)."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ids = list(range(10))
    kern = {tuple(r) for r in SIM.ann_topk_quantized(emb, ids).collect()}
    expr = {tuple(r) for r in SIM.ann_topk_quantized_expr(emb, ids).collect()}
    assert kern == expr
    assert len(kern) > 0


def test_quantized_topk_plan_one_arrow_stage(spark):
    """Exactly ONE Arrow batch stage (the lsh_bucket_multi /
    classifier_score rule: pay one kernel, never per-pair interpreted
    HOFs), no per-row Python, and no join — queries ride the closure, so
    the corpus is scanned once with the window input pre-reduced to
    ≤ k·|Q| rows per batch."""
    from graphical_context_extraction_pipeline_spark.operators import similarity as SIM
    from graphical_context_extraction_pipeline_spark.plans.explain import physical_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = physical_plan(SIM.ann_topk_quantized(emb, [1, 2]))
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan and "Join" not in plan, plan


def test_suggest_planes_sizing_rule():
    """planes ≈ log2(n / target_bucket), floored at the measured-recall
    default: the constant-occupancy serving geometry demonstrated on the
    100× diverse span (BENCH/SERVING_CURVE.md)."""
    from graphical_context_extraction_pipeline_spark.operators.similarity import (
        EMB_DUP_PLANES,
        suggest_planes,
    )

    assert suggest_planes(0) == EMB_DUP_PLANES
    assert suggest_planes(500) == EMB_DUP_PLANES
    assert suggest_planes(2_000) == EMB_DUP_PLANES  # log2(250) ≈ 7.97 → floor
    assert suggest_planes(20_000) == 11
    assert suggest_planes(200_000) == 15
    # occupancy stays pinned near the target across 3 decades
    for n in (20_000, 200_000, 2_000_000):
        p = suggest_planes(n)
        assert 4 <= n / 2**p <= 16, (n, p)
    # monotone in n
    planes = [suggest_planes(n) for n in (1_000, 10_000, 100_000, 1_000_000)]
    assert planes == sorted(planes)
