"""Multimodal plumbing + scalar function unit tests."""

import math

from graphical_context_extraction_pipeline_spark.functions.textnorm import (
    normalize_text,
    tfidf_cosine,
    tokens,
)
from graphical_context_extraction_pipeline_spark.operators.media import (
    FEATURE_DIM,
    extract_media_features,
    frame_sample_plan,
    synthesize_media,
)


def test_normalize_text():
    assert normalize_text("  a b​c  ") == "a bc"
    assert normalize_text("’quote“x”") == "'quote\"x\""
    assert normalize_text("a\t\n  b") == "a b"
    assert normalize_text(None) is None
    assert tokens("A  b\tC") == ["a", "b", "c"]


def test_tfidf_cosine_spec():
    # identical docs → 1.0; disjoint → 0.0; hand-checked mixed case
    assert tfidf_cosine("alpha beta", "alpha beta") == 1.0
    assert tfidf_cosine("alpha beta", "gamma delta") == 0.0
    assert tfidf_cosine("", "x y") == 0.0
    # one shared term of two (smooth idf): shared idf=ln(3/3)+1=1,
    # unique idf=ln(3/2)+1; cos = 1*1 / (sqrt(1+u^2)*sqrt(1+u^2))
    u = math.log(3 / 2) + 1
    expect = 1.0 / (1 + u * u)
    assert abs(tfidf_cosine("alpha beta", "alpha gamma") - expect) < 1e-12
    # single-char tokens are dropped (sklearn \w\w+ pattern)
    assert tfidf_cosine("a b", "a b") == 0.0


def test_media_feature_plumbing(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    media = synthesize_media(docs)
    n_assets = media.count()
    assert n_assets > 0
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == n_assets
    for r in rows[:5]:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-3  # normalized histogram
        assert r.n_bytes > 0 and len(r.sha256) == 64
    # determinism: same payloads → same features
    again = {r.media_ref: list(r.feature) for r in extract_media_features(media).collect()}
    for r in rows:
        assert again[r.media_ref] == list(r.feature)


def test_frame_sample_plan(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    plan = frame_sample_plan(docs, every_ms=5000)
    r = plan.head()
    assert r.sample_ts[0] == 0
    assert all(b - a == 5000 for a, b in zip(r.sample_ts, r.sample_ts[1:]))


def test_media_resize_plumbing(spark, docs_path):
    """resize stage: deterministic output dims/bytes, zero shuffle, one row
    per asset (decode is the documented deterministic fake)."""
    from graphical_context_extraction_pipeline_spark.operators.media import (
        resize_media,
        synthesize_media,
    )
    from graphical_context_extraction_pipeline_spark.plans.explain import count_exchanges

    docs = spark.read.parquet(docs_path)
    media = synthesize_media(docs)
    resized = resize_media(media, target_w=8, target_h=8)
    rows = resized.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["payload"]) == 8 * 8  # uint8 8x8 fake image
    # determinism: same input -> same bytes
    again = {r["media_ref"]: bytes(r["payload"]) for r in resized.collect()}
    assert all(bytes(r["payload"]) == again[r["media_ref"]] for r in rows)
    assert count_exchanges(resize_media(media)) == count_exchanges(media)


def test_media_admit_gate(spark, docs_path):
    """LAION-shape metadata admit gate: rule flags match the resolution
    ladder by hand; both failing rungs (thumbnail, 4:1 banner) have real
    members in the corpus; zero shuffle beyond the feature stage."""
    import hashlib

    from graphical_context_extraction_pipeline_spark.operators.media import (
        RESOLUTION_LADDER,
        extract_media_features,
        media_admit,
        synthesize_media,
    )

    docs = spark.read.parquet(docs_path)
    feats = extract_media_features(synthesize_media(docs))
    rows = media_admit(feats).collect()
    assert len(rows) == feats.count()
    seen = set()
    for r in rows:
        hexd = hashlib.sha256(r["media_ref"].encode()).hexdigest()
        w, h = RESOLUTION_LADDER[int(hexd[:2], 16) % len(RESOLUTION_LADDER)]
        assert (r["width"], r["height"]) == (w, h)  # ladder replay
        assert r["ok_resolution"] == (w >= 200 and h >= 200)
        assert r["ok_aspect"] == (w <= 3 * h and h <= 3 * w)
        assert r["ok_bytes"] is True  # 64-byte payloads by construction
        assert r["keep"] == (r["ok_resolution"] and r["ok_aspect"] and r["ok_bytes"])
        seen.add((w, h))
    # the plants are real: the thumb rung fails resolution, the banner
    # rung fails aspect, and at least one passing rung exists
    assert (160, 120) in seen and (1920, 480) in seen
    assert any(w >= 200 and h >= 200 and w <= 3 * h and h <= 3 * w for w, h in seen)
