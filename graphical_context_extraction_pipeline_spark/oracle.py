"""Pure-Python executable spec for the extraction pipeline.

Transcribed (NOT copied) from the reference's deterministic core:
  - chunk fold / merge-short-scenes   reference: phase 2/src/chunker.py:104-150
  - interval joins J1-J4              reference: phase 2/src/chunker.py:196-234
  - UI-chrome frequency heuristic     reference: phase 2/src/ocr_cleanup.py:36-61
  - reading-order sort + chrome-only  reference: phase 2/src/ocr_cleanup.py:118-131
  - consecutive near-dup frame dedup  reference: phase 2/src/ocr_cleanup.py:82-115
  - [SPOKEN]/[ON SCREEN] merge        reference: phase 2/src/aligner.py:39-80
  - confidence / completeness enrich  reference: phase 2/src/enricher.py:19-86

Operates on one document dict (the datagen / parquet row shape:
doc_id, spans, span_attrs, meta) and returns the list of chunk dicts.
This is the oracle the Spark pipeline is tested against for
span-sequence equality (kind, text, media_ref, order).
"""

from __future__ import annotations

from .functions.textnorm import normalize_text, tfidf_cosine, tokens

MIN_SCENE_MS = 5000  # merge threshold (reference: phase 2/src/config.py:35-40)
OCR_CONF_MIN = 0.5  # P1 (reference: phase 1/src/config.py:66)
CHROME_FRAME_FRACTION = 0.8  # A1 (reference: phase 2/src/config.py:39)
NEAR_DUP_OVERLAP = 0.9  # W2 (reference: phase 2/src/config.py:40)

KIND_PRIORITY = {"chapter": 0, "scene": 1, "asr": 2, "frame": 3, "ocr": 4}


def _frame_number(path: str) -> int:
    stem = path.rsplit("/", 1)[-1]
    digits = "".join(c for c in stem if c.isdigit())
    return int(digits) if digits else -1


def _parse_doc(doc: dict) -> dict:
    """Split the interleaved spans array back into typed modality lists."""
    chapters, scenes, asr, frames, ocr = [], [], [], [], []
    for span, attr in zip(doc["spans"], doc["span_attrs"]):
        kind = span["kind"]
        if kind == "chapter":
            chapters.append(
                {"title": span["text"], "start_ms": span["offset"], "end_ms": attr["end_ms"]}
            )
        elif kind == "scene":
            sid = int(span["text"].split(":", 1)[0])
            scenes.append({"scene_id": sid, "start_ms": span["offset"], "end_ms": attr["end_ms"]})
        elif kind == "asr":
            # score_sum/n_words mirror the kernel: per-word scores when the
            # contract carries them (reference phase 2/src/loader.py:12-18)
            # — scoreless words (score NULL) excluded from both sum and
            # count, matching enricher.py:51-68 — else the
            # (confidence × n_words) segment fallback
            words = attr.get("words")
            if words:
                scored = [w["score"] for w in words if w.get("score") is not None]
                score_sum, n_words = sum(scored), len(scored)
            else:
                score_sum = (attr["confidence"] or 0.0) * (attr.get("n_words") or 0)
                n_words = attr.get("n_words") or 0
            asr.append(
                {
                    "start_ms": span["offset"],
                    "end_ms": attr["end_ms"],
                    "text": normalize_text(span["text"]) or "",
                    "confidence": attr["confidence"],
                    "score_sum": score_sum,
                    "n_words": n_words,
                }
            )
        elif kind == "frame":
            frames.append(
                {"path": span["media_ref"], "ts": span["offset"], "scene_id": attr.get("scene_id")}
            )
        elif kind == "ocr":
            ocr.append(
                {
                    "path": span["media_ref"],
                    "offset": span["offset"],
                    "text": normalize_text(span["text"]) or "",
                    "confidence": attr["confidence"],
                    "bbox": attr["bbox"],
                }
            )
    chapters.sort(key=lambda c: (c["start_ms"], c["end_ms"], c["title"]))
    # fully-determined key: (start, end, id) — a start_ms-only sort would
    # leave equal-start scenes in input order, making chunking depend on
    # span array order (found by differential fuzzing vs the kernel)
    scenes.sort(key=lambda s: (s["start_ms"], s["end_ms"], s["scene_id"]))
    asr.sort(key=lambda a: (a["start_ms"], a["end_ms"], a["text"]))
    frames.sort(key=lambda f: (f["ts"], f["path"]))
    return {"chapters": chapters, "scenes": scenes, "asr": asr, "frames": frames, "ocr": ocr}


def extract_chunks(doc: dict) -> list[dict]:
    p = _parse_doc(doc)
    chapters, scenes, asr, frames, ocr = (
        p["chapters"],
        p["scenes"],
        p["asr"],
        p["frames"],
        p["ocr"],
    )

    # P1: OCR confidence filter
    ocr = [b for b in ocr if b["confidence"] is not None and b["confidence"] >= OCR_CONF_MIN]

    # A1: doc-level UI-chrome token frequency. Occurrences are counted, not
    # distinct frames (quirk pinned from reference ocr_cleanup.py:48).
    frame_paths_with_ocr = {b["path"] for b in ocr}
    total_frames = len(frame_paths_with_ocr)
    counts: dict[str, int] = {}
    for b in ocr:
        for t in tokens(b["text"]):
            counts[t] = counts.get(t, 0) + 1
    chrome = (
        {t for t, c in counts.items() if c >= CHROME_FRAME_FRACTION * total_frames}
        if total_frames > 0
        else set()
    )

    # W1: left-to-right scene fold (merge scenes shorter than MIN_SCENE_MS
    # into the running previous chunk; >60s scenes kept as-is)
    chunk_bounds = []
    for idx, sc in enumerate(scenes):
        dur = sc["end_ms"] - sc["start_ms"]
        if idx > 0 and dur < MIN_SCENE_MS and chunk_bounds:
            prev = chunk_bounds[-1]
            prev["t_end_ms"] = sc["end_ms"]
            prev["merged_scene_ids"].append(sc["scene_id"])
        else:
            chunk_bounds.append(
                {
                    "t_start_ms": sc["start_ms"],
                    "t_end_ms": sc["end_ms"],
                    "scene_id": sc["scene_id"],
                    "merged_scene_ids": [sc["scene_id"]],
                }
            )

    # index OCR by frame path
    ocr_by_path: dict[str, list[dict]] = {}
    for b in ocr:
        ocr_by_path.setdefault(b["path"], []).append(b)

    # frame → scene: detector-assigned scene_id (reference J2 semantics,
    # chunker.py:220-226); timestamp containment only as fallback
    def frame_scene(f: dict) -> int | None:
        if f.get("scene_id") is not None:
            return f["scene_id"]
        for sc in scenes:
            if sc["start_ms"] <= f["ts"] < sc["end_ms"]:
                return sc["scene_id"]
        return None

    chunks = []
    for cb in chunk_bounds:
        t0, t1 = cb["t_start_ms"], cb["t_end_ms"]

        # J4: chapter containment at t0, fallback = last chapter, else Unknown
        chapter_index, chapter_title = 0, "Unknown"
        if chapters:
            chapter_index, chapter_title = len(chapters) - 1, chapters[-1]["title"]
            for ci, ch in enumerate(chapters):
                if ch["start_ms"] <= t0 < ch["end_ms"]:
                    chapter_index, chapter_title = ci, ch["title"]
                    break

        # J1: inclusive interval-overlap — boundary-touching segments land in
        # both adjacent chunks
        segs = [a for a in asr if a["end_ms"] >= t0 and a["start_ms"] <= t1]
        asr_text = " ".join(s["text"] for s in segs if s["text"])

        # J2: frames of merged scenes
        merged = set(cb["merged_scene_ids"])
        cframes = [f for f in frames if frame_scene(f) in merged]

        # J3 + cleanup: per frame (ts order) sort blocks in reading order,
        # drop chrome-only blocks, then run the near-dup keep-chain
        frame_entries = []
        for f in cframes:
            def _order_key(b: dict):
                # missing/short bbox → (0, 0) reading-order key, same as the
                # kernel's default (reading order only needs a total order)
                bb = b["bbox"]
                y = bb[1] if bb is not None and len(bb) > 1 else 0.0
                x = bb[0] if bb is not None and len(bb) > 0 else 0.0
                return (y, x, b["text"], -b["confidence"])

            blocks = sorted(ocr_by_path.get(f["path"], []), key=_order_key)
            kept = []
            for b in blocks:
                toks = tokens(b["text"])
                if toks and all(t in chrome for t in toks):
                    continue  # chrome-only block dropped
                kept.append(b)
            text = " ".join(b["text"] for b in kept if b["text"])
            conf = sum(b["confidence"] for b in kept) / len(kept) if kept else 0.0
            frame_entries.append({"frame": f, "blocks": kept, "text": text, "conf": conf})

        # W2: consecutive near-duplicate dedup — compare against last KEPT,
        # replace-in-place keeping the higher mean confidence
        kept_frames: list[dict] = []
        for fe in frame_entries:
            if not fe["text"]:
                continue
            if kept_frames:
                prev = kept_frames[-1]
                cur_t = set(tokens(fe["text"]))
                prev_t = set(tokens(prev["text"]))
                denom = max(len(cur_t), len(prev_t))
                overlap = len(cur_t & prev_t) / denom if denom else 0.0
                if overlap >= NEAR_DUP_OVERLAP:
                    if fe["conf"] > prev["conf"]:
                        kept_frames[-1] = fe
                    continue
            kept_frames.append(fe)

        ocr_text = " | ".join(fe["text"] for fe in kept_frames)

        # F3: merged text
        if asr_text and ocr_text:
            merged_text = f"[SPOKEN] {asr_text} [ON SCREEN] {ocr_text}"
        elif asr_text:
            merged_text = f"[SPOKEN] {asr_text}"
        elif ocr_text:
            merged_text = f"[ON SCREEN] {ocr_text}"
        else:
            merged_text = ""

        # enrichment (A3-A5) — asr confidence is word-weighted: the reference
        # averages over all WORDS of the chunk's segments (enricher.py:51-68),
        # and segment confidence is the mean word score, so weighting by
        # n_words recovers the word-level mean exactly
        tot_words = sum(s["n_words"] for s in segs)
        asr_conf = (
            sum(s["score_sum"] for s in segs) / tot_words if tot_words else 0.0
        )
        chunk_blocks = [b for f in cframes for b in ocr_by_path.get(f["path"], [])]
        ocr_conf = (
            sum(b["confidence"] for b in chunk_blocks) / len(chunk_blocks)
            if chunk_blocks
            else 0.0
        )
        alignment = tfidf_cosine(asr_text, ocr_text) if (asr_text and ocr_text) else 0.0

        # out_spans: THE span-sequence equality contract. OCR offsets are
        # rewritten to frame_ts + reading_rank so cleaned reading order is
        # observable in the contract.
        out_spans = []
        for s in segs:
            out_spans.append(("asr", s["text"], None, s["start_ms"]))
        for f in cframes:
            out_spans.append(("frame", None, f["path"], f["ts"]))
        for fe in kept_frames:
            for rank, b in enumerate(fe["blocks"]):
                if b["text"]:
                    out_spans.append(("ocr", b["text"], b["path"], fe["frame"]["ts"] + rank))
        out_spans.sort(key=lambda s: (s[3], KIND_PRIORITY[s[0]], s[1] or "", s[2] or ""))

        # media-anchored context windows (north-star replacement enrichment):
        # each text span links to the nearest frame span by |offset|, earlier
        # frame wins ties
        span_ctx = []
        for kind, _text, _ref, off in out_spans:
            best = None
            if kind in ("asr", "ocr") and cframes:
                best_d = None
                for f in cframes:
                    d = abs(f["ts"] - off)
                    if best_d is None or d < best_d:
                        best_d, best = d, f["path"]
            span_ctx.append(best)

        meta = doc.get("meta") or {}
        chunks.append(
            {
                "chunk_id": f"{doc['doc_id']}_ch{chapter_index}_sc{cb['scene_id']}",
                "doc_id": doc["doc_id"],
                # reference Chunk.source is the ingest-source tag, hardcoded
                # "youtube" at construction (phase 2/src/chunker.py:18,179)
                "source": "youtube",
                "t_start_ms": t0,
                "t_end_ms": t1,
                "chapter_index": chapter_index,
                "chapter_title": chapter_title,
                "scene_id": cb["scene_id"],
                "merged_scene_ids": cb["merged_scene_ids"],
                "asr_text": asr_text,
                "ocr_text": ocr_text,
                "merged_text": merged_text,
                "out_spans": [
                    {"kind": k, "text": t, "media_ref": r, "offset": o}
                    for k, t, r, o in out_spans
                ],
                "span_ctx": span_ctx,
                "keyframe_ids": [_frame_number(f["path"]) for f in cframes],
                "keyframe_paths": [f["path"] for f in cframes],
                "has_keyframe": len(cframes) > 0,
                "asr_confidence": asr_conf,
                "ocr_confidence": ocr_conf,
                "alignment_score": alignment,
                "completeness": {
                    "has_speech": len(segs) > 0,
                    "has_visual": len(cframes) > 0,
                    "has_ocr_text": len(ocr_text) > 0,
                },
                "provenance": {
                    "video_title": meta.get("title"),
                    "channel": meta.get("channel"),
                    "video_description": (meta.get("description") or "")[:500],
                    "tags": meta.get("tags"),
                    "publish_date": meta.get("upload_date"),
                },
            }
        )
    return chunks
