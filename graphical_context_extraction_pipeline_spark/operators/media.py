"""Multimodal (binary) column operators.

Images/audio/video are opaque `binary` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The image/audio codec libraries are NOT in this
container, so the decode kernel is a clearly-marked deterministic fake
(seeded from the payload bytes) behind an import-try — the Spark-side
plumbing (schema, batch shape, partitioning, UDF signature) is real and
tested, and swapping in Pillow/ffmpeg later changes ONE function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_ref string, payload binary, "
    "media_meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

FEATURES_DDL = (
    "media_ref string, mime string, n_bytes long, sha256 string, "
    "width int, height int, feature array<float>"
)

FEATURE_DIM = 32


# deterministic (width, height) ladder for synthesized assets, indexed by
# the first sha256 byte of the ref (replayed verbatim by the oracle
# replica, oracle_artifacts._media_feature_rows): an HD frame, a thumbnail
# (fails a min-resolution admit rule), a 4:1 banner (fails max-aspect), a
# portrait, and an SD frame — so resolution/aspect gates have real work.
RESOLUTION_LADDER = ((1280, 720), (160, 120), (1920, 480), (480, 800), (640, 480))


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic opaque payloads for every frame media_ref in the spans
    table (payload bytes derived from the ref — stable across runs);
    width/height drawn from RESOLUTION_LADDER by the ref's hash."""
    frames = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "frame")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    idx = F.conv(F.substring(F.sha2(F.col("media_ref"), 256), 1, 2), 16, 10).cast(
        "int"
    ) % len(RESOLUTION_LADDER)
    width = F.lit(None).cast("int")
    height = F.lit(None).cast("int")
    for i, (w, h) in enumerate(RESOLUTION_LADDER):
        width = F.when(idx == i, F.lit(w)).otherwise(width)
        height = F.when(idx == i, F.lit(h)).otherwise(height)
    return frames.select(
        "media_ref",
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("payload"),
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            width.alias("width"),
            height.alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def _decode_image(payload: bytes, mime: str) -> np.ndarray:
    """Decode kernel. Real codecs are absent in this image — try them, fall
    back to a DETERMINISTIC FAKE (seeded grey image) so the distributed
    plumbing is exercised end-to-end."""
    try:  # pragma: no cover - not installed in this container
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(16, 16), dtype=np.uint8)


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["media_meta"]):
            payload = bytes(payload) if payload is not None else b""
            meta = meta or {}
            img = _decode_image(payload, meta.get("mime") or "")
            # 32-bin normalized intensity histogram as the feature vector —
            # deterministic, codec-agnostic; swap for a real model embedding
            hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
            tot = hist.sum() or 1
            feat = (hist / tot).astype(np.float32)
            rows.append(
                (
                    ref,
                    meta.get("mime"),
                    len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    meta.get("width"),
                    meta.get("height"),
                    feat.tolist(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["media_ref", "mime", "n_bytes", "sha256", "width", "height", "feature"],
        )


def extract_media_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """binary payloads → per-asset feature rows (Arrow-batched map; media
    assets are independent rows, like documents).

    The input is explicitly repartitioned by ROW COUNT before the kernel:
    AQE coalesces upstream shuffle output by BYTES, and a media-ref
    relation is tiny on the wire (53k refs ≈ a few MB → ONE post-AQE
    partition) while decode cost is per row — measured 25.5 s serial vs
    ~2 s repartitioned at sf0.1. The general rule for any decode /
    model-inference stage: partition by expected kernel cost, never trust
    byte-based coalescing of the cheap key relation that feeds it."""
    n = partitions or media.sparkSession.sparkContext.defaultParallelism
    return media.repartition(n).mapInPandas(_feature_batches, schema=FEATURES_DDL)


def media_features_canonical(features: DataFrame) -> DataFrame:
    """Hash-stable projection of the feature table: the float32 feature
    vector is serialized as comma-joined e8 integers (floor(x·1e8 + 0.5) on
    the exact float32→double value — identical in any engine), everything
    else already scalar."""
    feature_e8_s = F.array_join(
        F.transform(
            F.col("feature"),
            lambda x: F.floor(x.cast("double") * 100000000.0 + 0.5).cast("long").cast("string"),
        ),
        ",",
    )
    return features.select(
        "media_ref",
        "mime",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "sha256",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        feature_e8_s.alias("feature_e8_s"),
    )


def media_admit(
    features: DataFrame,
    min_width: int = 200,
    min_height: int = 200,
    max_aspect_x: int = 3,
    min_bytes: int = 1,
) -> DataFrame:
    """LAION-style per-asset admit gate over the media feature table — the
    metadata arm of image-corpus curation (LAION-5B discards tiny thumbs
    and extreme aspect ratios before any model scoring; the model-score
    arm here is ``multimodal.caption_ocr_agreement``). One row per asset,
    every rule its own inspectable flag (the gopher_rules contract):

        ok_resolution  width ≥ min_width ∧ height ≥ min_height
        ok_aspect      width ≤ max_aspect_x·height ∧ height ≤ max_aspect_x·width
        ok_bytes       n_bytes ≥ min_bytes (degenerate/truncated payloads)
        keep           AND of the three

    The aspect rule is integer cross-multiplication — no float ratio, so
    the DuckDB oracle hash-matches bit-for-bit.

    Scale: a zero-shuffle projection of the feature relation (the decode
    cost was already paid by extract_media_features); composes with the
    interleave gate upstream of mm_curate for asset-level curation."""
    w, h, nb = F.col("width").cast("long"), F.col("height").cast("long"), F.col("n_bytes")
    ok_res = (w >= min_width) & (h >= min_height)
    ok_aspect = (w <= max_aspect_x * h) & (h <= max_aspect_x * w)
    ok_bytes = nb >= min_bytes
    return features.select(
        "media_ref",
        w.alias("width"),
        h.alias("height"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        ok_res.alias("ok_resolution"),
        ok_aspect.alias("ok_aspect"),
        ok_bytes.alias("ok_bytes"),
        (ok_res & ok_aspect & ok_bytes).alias("keep"),
    )


RESIZED_DDL = (
    "media_ref string, width int, height int, payload binary, "
    "media_meta struct<mime:string, width:int, height:int, duration_ms:long>"
)


def _resize_batches(target_w: int, target_h: int):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["media_meta"]):
                payload = bytes(payload) if payload is not None else b""
                img = _decode_image(payload, (meta or {}).get("mime") or "")
                # deterministic nearest-neighbour downsample of the decoded
                # (possibly fake) image; re-encode is stubbed as raw bytes —
                # swapping in Pillow changes _decode_image + this encode only
                ys = np.linspace(0, img.shape[0] - 1, target_h).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, target_w).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append((ref, target_w, target_h, small.tobytes(), meta))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "payload", "media_meta"]
            )

    return fn


def resize_media(media: DataFrame, target_w: int = 8, target_h: int = 8) -> DataFrame:
    """Resize stage for binary image columns (Arrow-batched map, zero
    shuffle). The decode/encode kernels are the deterministic stubs of
    `_decode_image` — the distributed plumbing (schema, batching,
    independence per asset) is the real, tested part."""
    return media.mapInPandas(_resize_batches(target_w, target_h), schema=RESIZED_DDL)


def frame_sample_plan(docs: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plan for video spans: which timestamps a decoder would
    sample, per doc (sequence HOF — plan is computable without any codec)."""
    return docs.where(F.col("meta.duration_ms") > 0).select(
        "doc_id",
        F.sequence(
            F.lit(0).cast("long"), F.col("meta.duration_ms") - 1, F.lit(every_ms).cast("long")
        ).alias("sample_ts"),
    )
