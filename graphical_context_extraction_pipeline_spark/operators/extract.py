"""The core extraction operator: interleaved spans → enriched chunks.

Spark-first design notes (scale rationale, SURVEY.md §7):

- The input table is one row per document, so the whole deterministic core of
  the reference's phase-2 pipeline (chunk fold W1, interval joins J1-J4, OCR
  cleanup A1/W2/O1/P5, text merge F3, enrichment A3-A5, alignment F13) is
  **embarrassingly parallel across documents** — implemented as a single
  ``mapInPandas`` over Arrow batches with **zero shuffles**. At 10^12 docs /
  100 TB this scales linearly with executors; no stage boundary exists to
  bottleneck on.
- Per-document sequential folds (scene merge, near-dup keep-chain) cannot be
  expressed as Spark window functions (they compare against the last *kept*
  element, not a fixed lag — reference: phase 2/src/ocr_cleanup.py:82-115),
  which is exactly the case the grouped/batched pandas UDF exists for.
- Within a batch the hot paths are numpy-vectorized: interval joins via
  ``np.searchsorted`` over sorted offset arrays instead of the reference's
  O(n·m) nested-loop scans (reference: phase 2/src/chunker.py:211-234).
- Skew (media-heavy docs with 10× spans) is handled upstream by
  ``spark.sql.files.maxPartitionBytes`` + AQE and small Arrow batches; each
  doc is independent so there is no hot key to salt within this operator.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd

from ..functions.textnorm import normalize_text, tfidf_cosine, tokens

MIN_SCENE_MS = 5000
OCR_CONF_MIN = 0.5
CHROME_FRAME_FRACTION = 0.8
NEAR_DUP_OVERLAP = 0.9
KIND_PRIORITY = {"chapter": 0, "scene": 1, "asr": 2, "frame": 3, "ocr": 4}

CHUNK_SOURCE = "youtube"  # reference Chunk.source (phase 2/src/chunker.py:18,179)

CHUNKS_DDL = (
    "chunk_id string, doc_id string, source string, t_start_ms int, t_end_ms int, "
    "chapter_index int, chapter_title string, scene_id int, "
    "merged_scene_ids array<int>, "
    "asr_text string, ocr_text string, merged_text string, "
    "out_spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "span_ctx array<string>, "
    "keyframe_ids array<int>, keyframe_paths array<string>, has_keyframe boolean, "
    "asr_confidence double, ocr_confidence double, alignment_score double, "
    "completeness struct<has_speech:boolean,has_visual:boolean,has_ocr_text:boolean>, "
    "provenance struct<video_title:string,channel:string,video_description:string,"
    "tags:array<string>,publish_date:string>, "
    "part_id int"
)

CHUNK_COLUMNS = [
    "chunk_id", "doc_id", "source", "t_start_ms", "t_end_ms", "chapter_index",
    "chapter_title", "scene_id", "merged_scene_ids", "asr_text", "ocr_text",
    "merged_text", "out_spans", "span_ctx", "keyframe_ids", "keyframe_paths",
    "has_keyframe", "asr_confidence", "ocr_confidence", "alignment_score",
    "completeness", "provenance", "part_id",
]


# struct elements arrive as dicts (Arrow) or Rows (createDataFrame) — both
# support subscript access, used directly in the hot loop


@lru_cache(maxsize=65536)
def _frame_number(path: str) -> int:
    # cached: every OCR block on a frame re-asks for the same path (~30×
    # per frame), and worker processes are long-lived
    stem = path.rsplit("/", 1)[-1]
    digits = "".join(c for c in stem if c.isdigit())
    return int(digits) if digits else -1


def _doc_chunks(doc_id: str, spans, attrs, meta) -> list[tuple]:
    """Vectorized single-document extraction (independent impl of the spec).

    Row-wise reference path: buckets the span dicts with a Python loop, then
    delegates to :func:`_chunks_from_buckets` (shared with the Arrow-native
    fast path in ``extract_arrow.py``, which produces the same buckets from
    flat Arrow child arrays without materializing per-span dicts).
    """
    if spans is None or len(spans) == 0:
        return []
    meta_d = meta if isinstance(meta, dict) else {}

    # ---- single pass: bucket spans by kind -------------------------------
    chap_t, chap_s, chap_e = [], [], []
    scn_id, scn_s, scn_e = [], [], []
    asr_t, asr_s, asr_e, asr_c, asr_w = [], [], [], [], []
    frm_p, frm_ts, frm_sid = [], [], []
    ocr_p, ocr_txt, ocr_c, ocr_y, ocr_x = [], [], [], [], []
    for sp, at in zip(spans, attrs):
        kind = sp["kind"]
        if kind == "asr":
            asr_t.append(normalize_text(sp["text"]) or "")
            asr_s.append(sp["offset"])
            asr_e.append(at["end_ms"])
            # A3 word fidelity: when the contract carries per-word
            # (word, start, end, score) structs (reference phase 2/src/
            # loader.py:12-18), the chunk confidence is the mean over the
            # RAW word scores (enricher.py:51-68) — asr_c holds the
            # per-segment score SUM so the chunk mean is Σsums/Σcounts.
            # Words WITHOUT a score (score is NULL in the contract; the
            # enricher's `if "score" in word` filter) are excluded from both
            # sum and count. Sources without word detail fall back to
            # confidence × n_words (arithmetically the same quantity, one
            # extra rounding).
            try:
                words = at["words"]
            except (KeyError, ValueError, IndexError):
                words = None
            if words is not None and len(words) > 0:
                scored = [w["score"] for w in words if w["score"] is not None]
                asr_c.append(sum(scored))
                asr_w.append(len(scored))
            else:
                asr_c.append((at["confidence"] or 0.0) * (at["n_words"] or 0))
                asr_w.append(at["n_words"] or 0)
        elif kind == "ocr":
            conf = at["confidence"]
            if conf is None or conf < OCR_CONF_MIN:
                continue  # P1 pushed to scan time
            bbox = at["bbox"]
            ocr_p.append(sp["media_ref"])
            ocr_txt.append(normalize_text(sp["text"]) or "")
            ocr_c.append(conf)
            ocr_y.append(bbox[1] if bbox is not None and len(bbox) > 1 else 0.0)
            ocr_x.append(bbox[0] if bbox is not None and len(bbox) > 0 else 0.0)
        elif kind == "frame":
            frm_p.append(sp["media_ref"])
            frm_ts.append(sp["offset"])
            frm_sid.append(at["scene_id"])
        elif kind == "scene":
            scn_id.append(int(sp["text"].split(":", 1)[0]))
            scn_s.append(sp["offset"])
            scn_e.append(at["end_ms"])
        elif kind == "chapter":
            chap_t.append(sp["text"])
            chap_s.append(sp["offset"])
            chap_e.append(at["end_ms"])

    return _chunks_from_buckets(
        doc_id,
        chap_t, chap_s, chap_e,
        scn_id, scn_s, scn_e,
        asr_t, asr_s, asr_e, asr_c, asr_w,
        frm_p, frm_ts, frm_sid,
        ocr_p, ocr_txt, ocr_c, ocr_y, ocr_x,
        meta_d,
    )


def _chunks_from_buckets(
    doc_id: str,
    chap_t, chap_s, chap_e,
    scn_id, scn_s, scn_e,
    asr_t, asr_s, asr_e, asr_c, asr_w,
    frm_p, frm_ts, frm_sid,
    ocr_p, ocr_txt, ocr_c, ocr_y, ocr_x,
    meta_d: dict,
) -> list[tuple]:
    """Per-document extraction over kind-bucketed plain-Python lists.

    The bucket lists carry exactly what the row-wise loop in
    :func:`_doc_chunks` appends (post P1 filter, post normalize_text) so the
    two bucketing front-ends are interchangeable by construction.
    """
    if not scn_s:
        return []

    # ---- W1 fold, vectorized: a scene starts a new chunk iff it is the
    # first or long enough; chunk id = running count of starters -----------
    order = np.lexsort((scn_id, scn_e, scn_s))  # (start, end, id) — fully determined
    scn_id_a = np.asarray(scn_id, dtype=np.int64)[order]
    scn_s_a = np.asarray(scn_s, dtype=np.int64)[order]
    scn_e_a = np.asarray(scn_e, dtype=np.int64)[order]
    dur = scn_e_a - scn_s_a
    starter = dur >= MIN_SCENE_MS
    starter[0] = True
    cidx = np.cumsum(starter) - 1  # chunk index per scene
    n_chunks = int(cidx[-1]) + 1
    starts_per_chunk = scn_s_a[starter]
    # t_end = end of last scene in each chunk group
    last_in_chunk = np.r_[cidx[1:] != cidx[:-1], True]
    ends_per_chunk = scn_e_a[last_in_chunk]
    primary_scene = scn_id_a[starter]
    merged_ids = [scn_id_a[cidx == c].tolist() for c in range(n_chunks)]

    # ---- A1: chrome tokens over all P1-surviving OCR blocks --------------
    tok_lists = [tokens(t) for t in ocr_txt]
    total_frames = len(set(ocr_p))
    chrome: set[str] = set()
    if total_frames:
        counts: dict[str, int] = {}
        for tl in tok_lists:
            for t in tl:
                counts[t] = counts.get(t, 0) + 1
        thresh = CHROME_FRAME_FRACTION * total_frames
        chrome = {t for t, c in counts.items() if c >= thresh}

    # ---- chapters sorted by the fully-determined key (start, end, title) --
    if chap_s:
        ch_ord = sorted(range(len(chap_s)), key=lambda j: (chap_s[j], chap_e[j], chap_t[j]))
        chap_t = [chap_t[j] for j in ch_ord]
        chap_s_a = np.asarray(chap_s, dtype=np.int64)[ch_ord]
        chap_e_a = np.asarray(chap_e, dtype=np.int64)[ch_ord]
    else:
        chap_s_a = chap_e_a = None

    # ---- ASR sorted by (start, end, text) ---------------------------------
    if asr_s:
        a_ord = sorted(range(len(asr_s)), key=lambda j: (asr_s[j], asr_e[j], asr_t[j]))
        asr_t = [asr_t[j] for j in a_ord]
        asr_s_a = np.asarray(asr_s, dtype=np.int64)[a_ord]
        asr_e_a = np.asarray(asr_e, dtype=np.int64)[a_ord]
        asr_c_a = np.asarray(asr_c, dtype=np.float64)[a_ord]
        asr_w_a = np.asarray(asr_w, dtype=np.int64)[a_ord]
    else:
        asr_s_a = np.empty(0, dtype=np.int64)
        asr_e_a = np.empty(0, dtype=np.int64)
        asr_c_a = np.empty(0, dtype=np.float64)
        asr_w_a = np.empty(0, dtype=np.int64)

    # ---- frames → scene → chunk: detector-assigned scene_id first
    # (reference J2 joins on scene_id, chunker.py:220-226), timestamp
    # containment via searchsorted as fallback ---------------------------
    f_ord = sorted(range(len(frm_ts)), key=lambda j: (frm_ts[j], frm_p[j]))
    frm_p = [frm_p[j] for j in f_ord]
    frm_sid = [frm_sid[j] for j in f_ord]
    frm_ts_a = np.asarray([frm_ts[j] for j in f_ord], dtype=np.int64)
    sid_to_cidx = {int(s): int(c) for s, c in zip(scn_id_a, cidx)}
    if len(frm_ts_a):
        # FIRST containing scene in sorted order (the oracle scans the list
        # front-to-back; overlapping scenes made "last starting ≤ ts"
        # diverge — found by differential fuzzing). first j with end[j] > ts
        # == first j where the prefix-max of ends crosses ts → binary search
        # on the (non-decreasing) prefix max; containment additionally needs
        # start[j] ≤ ts, i.e. j < hi.
        pmax = np.maximum.accumulate(scn_e_a)
        hi_arr = np.searchsorted(scn_s_a, frm_ts_a, side="right")
        jstar = np.searchsorted(pmax, frm_ts_a, side="right")
        valid = jstar < hi_arr
        contain_chunk = np.where(valid, cidx[np.clip(jstar, 0, len(cidx) - 1)], -1)
        f_chunk = np.asarray(
            [
                sid_to_cidx.get(int(sid), -1) if sid is not None else int(contain_chunk[j])
                for j, sid in enumerate(frm_sid)
            ],
            dtype=np.int64,
        )
    else:
        f_chunk = np.empty(0, dtype=np.int64)

    # frame path → (ts, chunk); group OCR blocks by path
    path_info = {p: (int(ts), int(c)) for p, ts, c in zip(frm_p, frm_ts_a, f_chunk)}
    blocks_by_path: dict[str, list[int]] = {}
    for j, p in enumerate(ocr_p):
        blocks_by_path.setdefault(p, []).append(j)

    # frames grouped per chunk, in ts order (frm already sorted)
    frames_by_chunk: dict[int, list[int]] = {}
    for j, c in enumerate(f_chunk):
        if c >= 0:
            frames_by_chunk.setdefault(int(c), []).append(j)

    tags = meta_d.get("tags")
    provenance = (
        meta_d.get("title"),
        meta_d.get("channel"),
        (meta_d.get("description") or "")[:500],
        None if tags is None else list(tags),
        meta_d.get("upload_date"),
    )

    rows = []
    for c in range(n_chunks):
        t0 = int(starts_per_chunk[c])
        t1 = int(ends_per_chunk[c])

        # J4 chapter containment — FIRST containing chapter in sorted order
        # (reference scans the chapter list front-to-back, chunker.py:196-209;
        # with overlapping chapters "last starting ≤ t0" diverges — found by
        # differential fuzzing), fallback last, else Unknown
        if chap_s_a is not None and len(chap_s_a):
            hi = int(np.searchsorted(chap_s_a, t0, side="right"))
            ci = -1
            for j in range(hi):  # chapters per doc are few; O(hi) is fine
                if t0 < chap_e_a[j]:
                    ci = j
                    break
            if ci >= 0:
                chapter_index, chapter_title = ci, chap_t[ci]
            else:
                chapter_index, chapter_title = len(chap_t) - 1, chap_t[-1]
        else:
            chapter_index, chapter_title = 0, "Unknown"

        # J1 inclusive overlap via searchsorted on sorted starts
        hi = int(np.searchsorted(asr_s_a, t1, side="right"))
        seg_idx = [j for j in range(hi) if asr_e_a[j] >= t0]
        asr_text = " ".join(asr_t[j] for j in seg_idx if asr_t[j])

        fidx = frames_by_chunk.get(c, [])
        kf_paths = [frm_p[j] for j in fidx]
        kf_ts = [int(frm_ts_a[j]) for j in fidx]

        # per-frame reading-order sort + chrome-only drop
        frame_entries = []  # (ts, path, [block_j...], text, conf)
        for p, ts in zip(kf_paths, kf_ts):
            bj = blocks_by_path.get(p, [])
            bj = sorted(bj, key=lambda j: (ocr_y[j], ocr_x[j], ocr_txt[j], -ocr_c[j]))
            if chrome:
                kept = [j for j in bj if not (tok_lists[j] and all(t in chrome for t in tok_lists[j]))]
            else:
                # no chrome tokens ⇒ the all() test is False for every
                # non-empty token list and empty lists are kept too
                kept = bj
            text = " ".join(ocr_txt[j] for j in kept if ocr_txt[j])
            # sum/len (not np.mean's pairwise sum) — bit-identical to the
            # oracle so near-dup confidence tiebreaks can't diverge
            conf = sum(ocr_c[j] for j in kept) / len(kept) if kept else 0.0
            frame_entries.append((ts, p, kept, text, conf))

        # W2 near-dup keep-chain (compare vs last KEPT)
        kept_frames: list[tuple] = []
        for fe in frame_entries:
            if not fe[3]:
                continue
            if kept_frames:
                prev = kept_frames[-1]
                cur_t = set(fe[3].lower().split())
                prev_t = set(prev[3].lower().split())
                denom = max(len(cur_t), len(prev_t))
                if denom and len(cur_t & prev_t) / denom >= NEAR_DUP_OVERLAP:
                    if fe[4] > prev[4]:
                        kept_frames[-1] = fe
                    continue
            kept_frames.append(fe)

        ocr_text = " | ".join(fe[3] for fe in kept_frames)

        if asr_text and ocr_text:
            merged_text = f"[SPOKEN] {asr_text} [ON SCREEN] {ocr_text}"
        elif asr_text:
            merged_text = f"[SPOKEN] {asr_text}"
        elif ocr_text:
            merged_text = f"[ON SCREEN] {ocr_text}"
        else:
            merged_text = ""

        # mean over all words of the chunk's segments (enricher.py:51-68):
        # asr_c_a already holds per-segment word-score sums; sequential sums
        # match the pure-Python oracle bit-for-bit
        tot_w = sum(int(asr_w_a[j]) for j in seg_idx)
        asr_conf = (
            sum(float(asr_c_a[j]) for j in seg_idx) / tot_w if tot_w else 0.0
        )
        chunk_block_confs = [ocr_c[j] for p in kf_paths for j in blocks_by_path.get(p, [])]
        ocr_conf = sum(chunk_block_confs) / len(chunk_block_confs) if chunk_block_confs else 0.0
        alignment = tfidf_cosine(asr_text, ocr_text) if (asr_text and ocr_text) else 0.0

        out_spans = [("asr", asr_t[j], None, int(asr_s_a[j])) for j in seg_idx]
        out_spans += [("frame", None, p, ts) for p, ts in zip(kf_paths, kf_ts)]
        for fe in kept_frames:
            for rank, j in enumerate(fe[2]):
                if ocr_txt[j]:
                    out_spans.append(("ocr", ocr_txt[j], fe[1], fe[0] + rank))
        out_spans.sort(key=lambda s: (s[3], KIND_PRIORITY[s[0]], s[1] or "", s[2] or ""))

        # media-anchored context windows: nearest frame by |offset|, earlier
        # wins ties — vectorized via searchsorted over the sorted frame ts
        kf_ts_a = np.asarray(kf_ts, dtype=np.int64)
        if len(kf_ts_a) and out_spans:
            offs = np.asarray([s[3] for s in out_spans], dtype=np.int64)
            pos = np.searchsorted(kf_ts_a, offs, side="left")
            left = np.clip(pos - 1, 0, len(kf_ts_a) - 1)
            right = np.clip(pos, 0, len(kf_ts_a) - 1)
            d_left = np.abs(offs - kf_ts_a[left])
            d_right = np.abs(kf_ts_a[right] - offs)
            nearest = np.where(d_left <= d_right, left, right)
            # duplicate frame timestamps: earliest frame with that ts wins
            nearest = np.searchsorted(kf_ts_a, kf_ts_a[nearest], side="left")
            span_ctx = [
                kf_paths[int(nearest[k])] if s[0] in ("asr", "ocr") else None
                for k, s in enumerate(out_spans)
            ]
        else:
            span_ctx = [None] * len(out_spans)

        rows.append(
            (
                f"{doc_id}_ch{chapter_index}_sc{int(primary_scene[c])}",
                doc_id,
                CHUNK_SOURCE,
                t0,
                t1,
                chapter_index,
                chapter_title,
                int(primary_scene[c]),
                merged_ids[c],
                asr_text,
                ocr_text,
                merged_text,
                out_spans,
                span_ctx,
                [_frame_number(p) for p in kf_paths],
                kf_paths,
                len(kf_paths) > 0,
                asr_conf,
                ocr_conf,
                alignment,
                (len(seg_idx) > 0, len(kf_paths) > 0, len(ocr_text) > 0),
                provenance,
            )
        )
    return rows


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # partition-id lineage: every output row records which task produced it,
    # enabling the per-partition metrics/audit rollup in pipeline.py
    from pyspark import TaskContext

    ctx = TaskContext.get()
    part_id = ctx.partitionId() if ctx is not None else -1
    for pdf in it:
        out: list[tuple] = []
        metas = pdf["meta"] if "meta" in pdf.columns else [None] * len(pdf)
        for doc_id, spans, attrs, meta in zip(pdf["doc_id"], pdf["spans"], pdf["span_attrs"], metas):
            out.extend(r + (part_id,) for r in _doc_chunks(doc_id, spans, attrs, meta))
        yield pd.DataFrame(out, columns=CHUNK_COLUMNS)


def extract_documents(docs_df):
    """spans table → chunks table. Zero-shuffle Arrow-batched map.

    Dispatches to the Arrow-native fast path (extract_arrow.py): same rows
    as the row-wise pandas path below (pinned by
    tests/test_extract_arrow_parity.py), without materializing per-span
    dicts on input or re-converting tuples element-wise on output.
    """
    from .extract_arrow import extract_documents_arrow

    return extract_documents_arrow(docs_df)


def extract_documents_pandas(docs_df):
    """Row-wise reference implementation (kept as the parity pin)."""
    return docs_df.mapInPandas(_extract_batches, schema=CHUNKS_DDL)
