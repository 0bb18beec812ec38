"""Convert the reference pipeline's committed phase-1 JSON artifacts into one
interleaved-spans `documents` row (FIXTURES.md §4) — so the engine is tested
against the reference's own published input/output pair, not only the
transcribed oracle.

Artifact shapes (reference):
  asr.json       segments[{start,end,text,words[{word,start,end,score}]}]
                 (phase 1/src/extract/asr.py:118-146)
  scenes.json    scenes[{scene_id,start_ms,end_ms,...}] (extract/scenes.py:67-90)
  keyframes.json keyframes[{frame_id,scene_id,timestamp_ms,path,...}]
                 (extract/keyframes.py:84-118)
  ocr.json       results[{frame_id,timestamp_ms,image_path,text_blocks[
                 {text,bbox,confidence}],...}] (extract/ocr.py:95-125)
  source/metadata.json  {id,title,channel,description,tags,upload_date,
                 duration,chapters[{title,start_time,end_time}]}
                 (ingest/downloader.py:83-123)
"""

from __future__ import annotations

import json
import os

KIND_PRIORITY = {"chapter": 0, "scene": 1, "asr": 2, "frame": 3, "ocr": 4}


def polygon_to_rect(points) -> list[float] | None:
    """P2: 4-point OCR polygon → [x_min, y_min, x_max, y_max], re-derived
    exactly as the reference does at artifact-write time (phase 1/src/
    extract/ocr.py:186-195). Returns None for missing/degenerate input so
    the caller can fall back to a precomputed rect."""
    if not points:
        return None
    xs = [float(p[0]) for p in points]
    ys = [float(p[1]) for p in points]
    return [min(xs), min(ys), max(xs), max(ys)]


def load_reference_doc(artifact_dir: str) -> dict:
    """phase-1 artifact directory → one datagen-shaped document dict."""

    def _load(name):
        with open(os.path.join(artifact_dir, name)) as f:
            return json.load(f)

    asr = _load("asr.json")["segments"]
    scenes = _load("scenes.json")["scenes"]
    keyframes = _load("keyframes.json")["keyframes"]
    ocr_results = _load("ocr.json")["results"]
    meta = _load(os.path.join("source", "metadata.json"))
    doc_id = meta["id"]

    spans, attrs = [], []

    def add(kind, text, media_ref, offset, end_ms=None, conf=None, bbox=None, scene_id=None, n_words=None, words=None):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": int(offset)})
        attrs.append(
            {
                "end_ms": None if end_ms is None else int(end_ms),
                "confidence": None if conf is None else float(conf),
                "bbox": bbox,
                "scene_id": None if scene_id is None else int(scene_id),
                "n_words": None if n_words is None else int(n_words),
                "words": words,
            }
        )

    for ch in meta.get("chapters") or []:
        add(
            "chapter",
            ch["title"],
            None,
            int(float(ch["start_time"]) * 1000),
            end_ms=int(float(ch["end_time"]) * 1000),
        )
    for sc in scenes:
        add("scene", f"{sc['scene_id']}:{sc['end_ms']}", None, sc["start_ms"], end_ms=sc["end_ms"])
    for seg in asr:
        words = seg.get("words") or []
        # The reference enricher (phase 2/src/enricher.py:51-68) skips words
        # WITHOUT a 'score' key from both numerator and denominator (common
        # in WhisperX output for numerals/punctuation tokens), so the loader
        # must preserve "missing" as None — filling 0.0 would deflate the
        # chunk asr_confidence vs the reference.
        scored = [w["score"] for w in words if "score" in w]
        conf = sum(scored) / len(scored) if scored else 0.0
        add(
            "asr",
            seg["text"].strip(),
            None,
            seg["start"],
            end_ms=seg["end"],
            conf=conf,
            n_words=len(words),
            # per-word timestamps/scores preserved for downstream consumers
            # (reference ASRSegment.words, phase 2/src/loader.py:12-18);
            # A3 chunk confidence is derived from these raw scores
            words=[
                {
                    "word": w.get("word"),
                    "start_ms": int(w["start"]) if w.get("start") is not None else None,
                    "end_ms": int(w["end"]) if w.get("end") is not None else None,
                    "score": float(w["score"]) if "score" in w else None,
                }
                for w in words
            ]
            or None,
        )
    frame_path = {}
    for kf in keyframes:
        path = kf["path"]
        frame_path[kf["frame_id"]] = path
        add("frame", None, path, kf["timestamp_ms"], scene_id=kf.get("scene_id"))
    for res in ocr_results:
        path = frame_path.get(res["frame_id"], res.get("image_path"))
        ts = res["timestamp_ms"]
        for arrival, b in enumerate(res.get("text_blocks") or []):
            add(
                "ocr",
                b["text"],
                path,
                ts + arrival,
                conf=b["confidence"],
                bbox=polygon_to_rect(b.get("bbox_polygon")) or list(b["bbox"]),
            )

    order = sorted(
        range(len(spans)),
        key=lambda j: (spans[j]["offset"], KIND_PRIORITY[spans[j]["kind"]], spans[j]["text"] or ""),
    )
    return {
        "doc_id": doc_id,
        "spans": [spans[j] for j in order],
        "span_attrs": [attrs[j] for j in order],
        "meta": {
            "title": meta.get("title"),
            "channel": meta.get("channel"),
            "description": meta.get("description") or "",
            "tags": meta.get("tags") or [],
            "upload_date": meta.get("upload_date"),
            "duration_ms": int(float(meta.get("duration", 0)) * 1000),
        },
    }


def load_reference_chunks(output_dir: str) -> list[dict]:
    with open(os.path.join(output_dir, "chunks.json")) as f:
        return json.load(f)
