"""UniMax water-filling: cap binding, fair-share floor, released-budget
redistribution, telescoping total, and input-order independence."""

from graphical_context_extraction_pipeline_spark.operators import sampling


def _docs(spark, rows):
    # (doc_id, source, n_chars)
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def _by_src(df):
    return {r["source"]: r.asDict() for r in df.collect()}


def test_all_capped_when_budget_is_ample(spark):
    # budget far above cap mass: every source stops at exactly its cap
    out = _by_src(
        sampling.unimax_budgets(
            _docs(spark, [(1, "a", 100), (2, "b", 300)]),
            budget=10_000,
            epoch_cap_bp=20_000,  # 2.0 epochs
        )
    )
    assert out["a"]["budget"] == 200 and out["a"]["epochs_bp"] == 20_000
    assert out["b"]["budget"] == 600 and out["b"]["epochs_bp"] == 20_000


def test_fair_share_when_budget_is_scarce(spark):
    # budget below every cap: equal sources split it evenly
    out = _by_src(
        sampling.unimax_budgets(
            _docs(spark, [(1, "a", 1000), (2, "b", 1000)]),
            budget=900,
            epoch_cap_bp=20_000,
        )
    )
    assert out["a"]["budget"] == 450 and out["b"]["budget"] == 450


def test_capped_small_source_releases_budget_to_large(spark):
    # fair share 500 each, but 'a' caps at 2.0 epochs × 100 = 200;
    # the released 300 flows to 'b' (500 + 300 = 800, under b's cap 2000)
    out = _by_src(
        sampling.unimax_budgets(
            _docs(spark, [(1, "a", 100), (2, "b", 1000)]),
            budget=1000,
            epoch_cap_bp=20_000,
        )
    )
    assert out["a"]["budget"] == 200
    assert out["b"]["budget"] == 800
    assert out["b"]["epochs_bp"] == 8000


def test_total_telescopes_and_never_exceeds_budget(spark):
    rows = [(i, f"s{i % 5}", 50 + 37 * i) for i in range(1, 40)]
    out = sampling.unimax_budgets(
        _docs(spark, rows), budget=3_000, epoch_cap_bp=15_000
    ).collect()
    total = sum(r["budget"] for r in out)
    assert total <= 3_000
    assert all(r["epochs_bp"] <= 15_000 for r in out)


def test_input_order_and_partitioning_independent(spark):
    rows = [(i, f"s{i % 4}", 100 + 13 * i) for i in range(1, 30)]
    a = _by_src(sampling.unimax_budgets(_docs(spark, rows), budget=2000))
    b = _by_src(
        sampling.unimax_budgets(
            _docs(spark, list(reversed(rows))).repartition(7), budget=2000
        )
    )
    assert a == b


def test_nonpositive_weights_dropped(spark):
    out = _by_src(
        sampling.unimax_budgets(
            _docs(spark, [(1, "a", 0), (2, "b", -5), (3, "c", 100)]),
            budget=1000,
            epoch_cap_bp=20_000,
        )
    )
    assert set(out) == {"c"}
    assert out["c"]["budget"] == 200  # capped at 2.0 epochs
