"""Deterministic synthetic interleaved-documents generator (FIXTURES.md spec).

One row per document (≙ one video in the reference pipeline), with the span
kinds mirroring the reference's timeline event types
(reference: phase 2/src/timeline.py:13-21) and Phase-1 artifacts:

    doc_id      string
    spans       array<struct<kind, text, media_ref, offset:int>>
    span_attrs  array<struct<end_ms:int, confidence:double, bbox:array<double>>>
                  (positionally aligned with spans)
    meta        struct<title, channel, description, tags:array<string>,
                       upload_date, duration_ms:long>

Generation is pure and per-doc seeded (seed derived from 42 and the doc
index), so doc i is byte-identical at every scale factor and under any
parallelism — sf0.01's 200 docs are the first 200 of sf0.1's 2000.

The generator is itself a distributed Spark job (spark.range → mapInPandas),
because at the target scale (10^12 docs) even test-corpus synthesis must not
be a driver-side loop.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- vocab

CONTENT_VOCAB = [
    "model", "training", "data", "pipeline", "spark", "cluster", "query",
    "tutorial", "video", "slide", "frame", "audio", "speech", "vector",
    "index", "search", "token", "layer", "network", "gradient", "batch",
    "epoch", "loss", "metric", "deploy", "server", "client", "request",
    "response", "cache", "memory", "disk", "shuffle", "partition", "join",
    "filter", "select", "group", "window", "stream", "table", "column",
    "schema", "parquet", "iceberg", "arrow", "pandas", "python", "scala",
    "java", "code", "function", "class", "object", "method", "variable",
    "string", "integer", "float", "boolean", "array", "struct", "nested",
    "timeline", "chunk", "scene", "keyframe", "overlay", "caption",
    "subtitle", "chapter", "segment", "duration", "timestamp", "offset",
    "alignment", "confidence", "score", "threshold", "sample", "extract",
]

# UI-chrome boilerplate vocabulary (reference: phase 2/src/ocr_cleanup.py:53-58
# detects these by per-video frequency, not a fixed list — our generator
# injects them so the frequency heuristic has something to find)
BOILER_VOCAB = [
    "file", "edit", "view", "insert", "format", "tools", "help",
    "share", "present", "slideshow", "untitled", "autosave",
]

CHANNEL_NAMES = ["DataWorks", "SparkCasts", "MLTutorials", "PipelineTV"]

TITLE_WORDS = [
    "Intro", "Advanced", "Complete", "Guide", "Deep", "Dive", "Crash",
    "Course", "Masterclass", "Walkthrough", "Basics", "Patterns",
]

# zero-width / NBSP / curly-quote noise as seen in the golden OCR full_text
# (reference: phase 1/XNQTWZ87K4I/ocr.json)
NOISE_CHARS = [" ", "​", "’", "“", "”", "﻿"]

KIND_PRIORITY = {"chapter": 0, "scene": 1, "asr": 2, "frame": 3, "ocr": 4}

DOCS_PER_SF = {"sf0.001": 20, "sf0.01": 200, "sf0.1": 2000, "sf0.4": 8000}


def _doc_seed(i: int) -> int:
    # splitmix-style stable mix of (42, i)
    x = (i + 0x9E3779B97F4A7C15 * 43) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return (x ^ (x >> 31)) & 0x7FFFFFFF


def _asr_words(rng, toks, start_ms: int, end_ms: int) -> list[dict]:
    """Per-word timing/score structs (reference phase 2/src/loader.py:12-18:
    ASRSegment.words carries WhisperX word dicts). ~1 in 8 words is
    scoreless — WhisperX omits 'score' for some tokens (numerals etc.) —
    and the enricher (phase 2/src/enricher.py:51-68) excludes those from
    BOTH the numerator and denominator of the confidence mean; generating
    them here pins that filter through the driver's oracle gate."""
    n = len(toks)
    cuts = np.sort(rng.uniform(0.0, 1.0, size=n - 1)) if n > 1 else np.array([])
    inner = (start_ms + cuts * (end_ms - start_ms)).astype(np.int64).tolist()
    bounds = [int(start_ms), *[int(b) for b in inner], int(end_ms)]
    out = []
    for k, w in enumerate(toks):
        score = None if rng.rand() < 0.12 else round(float(rng.uniform(0.3, 1.0)), 4)
        out.append({"word": str(w), "start_ms": bounds[k], "end_ms": bounds[k + 1], "score": score})
    return out


def generate_doc(i: int) -> dict:
    """Generate one document as plain-Python dict (shared by Spark gen and
    the pure-Python oracle tests)."""
    rng = np.random.RandomState(_doc_seed(i))
    doc_id = f"doc_{i:08d}"
    skew = 10 if (i % 100 == 7) else 1  # media-heavy skew docs

    # ---- edge docs (prefix-stable at every sf) -------------------------
    empty_doc = i == 0
    asr_only = i == 1
    ocr_only = i == 2
    no_chapters = i == 3
    chapters_end_early = i == 4

    # ---- scenes: contiguous, forced merge/chain/long patterns ----------
    n_scenes = 0 if empty_doc else int(rng.randint(4, 31)) * skew
    if asr_only:
        n_scenes = int(rng.randint(4, 10))
    durs = np.exp(rng.normal(np.log(15000.0), 0.6, size=max(n_scenes, 1)))
    durs = np.clip(durs, 1200, 55000).astype(np.int64)
    if n_scenes >= 2:
        durs[1] = rng.randint(1500, 4500)  # short → merge path
    if n_scenes >= 6:
        durs[3] = rng.randint(1500, 4900)  # chain of consecutive shorts
        durs[4] = rng.randint(1500, 4900)
    if n_scenes >= 3:
        durs[n_scenes // 2] = rng.randint(61000, 85000)  # long → no-op split
    starts = np.concatenate([[0], np.cumsum(durs)[:-1]]) if n_scenes else np.array([], dtype=np.int64)
    ends = starts + durs[:n_scenes] if n_scenes else np.array([], dtype=np.int64)
    duration_ms = int(ends[-1]) if n_scenes else int(rng.randint(60000, 120000))
    scenes = [
        {"scene_id": int(s_i), "start_ms": int(st), "end_ms": int(en)}
        for s_i, (st, en) in enumerate(zip(starts, ends))
    ]

    # ---- chapters: float-second bounds (×1000 int-truncation path) -----
    chapters = []
    if not (empty_doc or no_chapters):
        n_ch = int(rng.randint(1, 7))
        cover = duration_ms / 1000.0
        if chapters_end_early:
            cover = cover / 2.0
        cuts = np.sort(rng.uniform(0.0, cover, size=n_ch - 1)) if n_ch > 1 else np.array([])
        bounds = [0.0, *[float(c) + rng.uniform(0.001, 0.999) * 1e-3 for c in cuts], cover]
        for c_i in range(n_ch):
            title = " ".join(rng.choice(TITLE_WORDS, size=2))
            chapters.append(
                {"title": f"{title} {c_i}", "start_s": float(bounds[c_i]), "end_s": float(bounds[c_i + 1])}
            )

    # ---- ASR segments ---------------------------------------------------
    asr = []
    if not (empty_doc or ocr_only):
        t = int(rng.randint(0, 1200))
        while t < duration_ms - 1000:
            dur = int(rng.randint(1000, 8000))
            end = min(t + dur, duration_ms)
            n_tok = int(rng.randint(5, 21))
            toks = list(rng.choice(CONTENT_VOCAB, size=n_tok))
            if rng.rand() < 0.08:  # unicode noise
                j = int(rng.randint(0, len(toks)))
                toks[j] = rng.choice(NOISE_CHARS) + toks[j]
            asr.append(
                {
                    "start_ms": t,
                    "end_ms": end,
                    "text": " ".join(toks),
                    "confidence": round(float(rng.uniform(0.5, 1.0)), 4),
                    "n_words": n_tok,
                    # ~1 in 4 segments carries no word detail at all — the
                    # confidence × n_words fallback path stays exercised
                    "words": _asr_words(rng, toks, t, end) if rng.rand() >= 0.25 else None,
                }
            )
            gap = int(rng.randint(0, 900))
            if rng.rand() < 0.06:
                gap = int(rng.randint(5500, 20000))  # silence gap > 5 s (ASR-gap path)
            t = end + gap
        # boundary-touching segments: end exactly at a chunk-boundary scene
        # start (pins the inclusive-overlap duplication semantics,
        # reference: phase 2/src/chunker.py:216)
        big_scenes = [s for s in scenes if s["start_ms"] > 3000 and (s["end_ms"] - s["start_ms"]) >= 5000]
        if big_scenes and asr:
            pick = big_scenes[int(rng.randint(0, len(big_scenes)))]
            b = pick["start_ms"]
            btoks = list(rng.choice(CONTENT_VOCAB, size=6))
            asr.append(
                {
                    "start_ms": b - 2000,
                    "end_ms": b,
                    "text": " ".join(btoks),
                    "confidence": round(float(rng.uniform(0.5, 1.0)), 4),
                    "n_words": 6,
                    "words": _asr_words(rng, btoks, b - 2000, b) if rng.rand() >= 0.25 else None,
                }
            )
        asr.sort(key=lambda a: (a["start_ms"], a["end_ms"], a["text"]))

    # ---- keyframes ------------------------------------------------------
    frames = []  # {frame_id, ts, path, scene_id}
    fid = 0
    if not (empty_doc or asr_only):
        for sc in scenes:
            p = rng.rand()
            n_f = 0 if p < 0.12 else (1 if p < 0.55 else (2 if p < 0.85 else 3))
            span_len = sc["end_ms"] - sc["start_ms"]
            for k in range(n_f):
                ts = sc["start_ms"] + int(k * span_len / max(n_f, 1)) + int(rng.randint(0, 200))
                ts = min(ts, sc["end_ms"] - 1)
                frames.append(
                    {
                        "frame_id": fid,
                        "ts": int(ts),
                        "path": f"frames/{doc_id}/frame_{fid:05d}.jpg",
                        "scene_id": sc["scene_id"],
                    }
                )
                fid += 1
        # force a >30s keyframe gap in some docs (validator W3 severity path)
        if rng.rand() < 0.3 and len(frames) > 3:
            cut_ts = frames[len(frames) // 2]["ts"]
            frames = [f for f in frames if not (cut_ts < f["ts"] < cut_ts + 32000)]

    # ---- OCR blocks per frame -------------------------------------------
    # per-doc chrome design: injected into ~85% of frames → must be detected
    # as chrome (occurrence count >= 0.8 * total_frames,
    # reference: phase 2/src/ocr_cleanup.py:48-58, threshold config.py:39)
    chrome_set = list(rng.choice(BOILER_VOCAB, size=4, replace=False))
    near_thresh_tok = str(rng.choice([b for b in BOILER_VOCAB if b not in chrome_set]))
    quirk_tok = "menubar"  # appears in ~55% of frames but 2× each → chrome by occurrence count
    ocr = []  # {frame_id, ts, path, text, conf, bbox, arrival}
    frames_with_ocr = [f for f in frames if rng.rand() > 0.1]
    n_focr = len(frames_with_ocr)
    prev_blocks = None
    for f_i, fr in enumerate(frames_with_ocr):
        if prev_blocks is not None and rng.rand() < 0.22:
            # consecutive near-duplicate frame: ≥90% token overlap,
            # different confidences (pins keep-higher-conf replace-in-place,
            # reference: phase 2/src/ocr_cleanup.py:101-113)
            blocks = [dict(b) for b in prev_blocks]
            for b in blocks:
                b["conf"] = round(float(np.clip(b["conf"] + rng.uniform(-0.2, 0.2), 0.31, 0.99)), 4)
            if blocks and rng.rand() < 0.5 and len(blocks) > 9:
                blocks = blocks[:-1]  # still ≥90% overlap
        else:
            n_b = int(rng.randint(1, 14)) * (skew if not asr_only else 1)
            blocks = []
            for _ in range(n_b):
                n_tok = int(rng.randint(1, 8))
                toks = list(rng.choice(CONTENT_VOCAB, size=n_tok))
                if rng.rand() < 0.05:
                    j = int(rng.randint(0, len(toks)))
                    toks[j] = toks[j] + rng.choice(NOISE_CHARS)
                if rng.rand() < 0.10:
                    toks = list(rng.choice(chrome_set, size=int(rng.randint(1, 4))))  # chrome-only block
                blocks.append(
                    {
                        "text": " ".join(toks),
                        "conf": round(float(rng.uniform(0.3, 1.0)), 4),
                        "bbox": [
                            round(float(rng.uniform(0, 1000)), 2),
                            round(float(rng.uniform(0, 680)), 2),
                            round(float(rng.uniform(1000, 1280)), 2),
                            round(float(rng.uniform(680, 720)), 2),
                        ],
                    }
                )
            # chrome injection (~85% of frames)
            if rng.rand() < 0.85:
                blocks.append(
                    {
                        "text": " ".join(chrome_set) + " " + " ".join(rng.choice(CONTENT_VOCAB, size=2)),
                        "conf": round(float(rng.uniform(0.5, 1.0)), 4),
                        "bbox": [0.0, 0.0, 400.0, 20.0],
                    }
                )
            # near-threshold token (~75% of frames → NOT chrome)
            if f_i < int(0.75 * n_focr):
                blocks.append(
                    {
                        "text": near_thresh_tok + " " + str(rng.choice(CONTENT_VOCAB)),
                        "conf": round(float(rng.uniform(0.5, 1.0)), 4),
                        "bbox": [500.0, 700.0, 600.0, 720.0],
                    }
                )
            # occurrence-count quirk token: 55% of frames, twice per frame
            if f_i % 2 == 0:
                blocks.append(
                    {
                        "text": f"{quirk_tok} {quirk_tok}",
                        "conf": round(float(rng.uniform(0.5, 1.0)), 4),
                        "bbox": [900.0, 700.0, 1000.0, 720.0],
                    }
                )
        prev_blocks = blocks
        for arrival, b in enumerate(blocks):
            ocr.append(
                {
                    "frame_id": fr["frame_id"],
                    "ts": fr["ts"],
                    "path": fr["path"],
                    "text": b["text"],
                    "conf": b["conf"],
                    "bbox": b["bbox"],
                    "arrival": arrival,
                }
            )

    # ---- assemble interleaved spans -------------------------------------
    spans, attrs = [], []

    def add(kind, text, media_ref, offset, end_ms=None, conf=None, bbox=None, scene_id=None, n_words=None, words=None):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": int(offset)})
        attrs.append(
            {
                "end_ms": None if end_ms is None else int(end_ms),
                "confidence": None if conf is None else float(conf),
                "bbox": bbox,
                # frames carry the detector-assigned scene id (the reference
                # joins keyframes to chunks by scene_id, not by timestamp —
                # phase 2/src/chunker.py:220-226)
                "scene_id": None if scene_id is None else int(scene_id),
                "n_words": None if n_words is None else int(n_words),
                "words": words,
            }
        )

    for ch in chapters:
        add("chapter", ch["title"], None, int(ch["start_s"] * 1000), end_ms=int(ch["end_s"] * 1000))
    for sc in scenes:
        add("scene", f"{sc['scene_id']}:{sc['end_ms']}", None, sc["start_ms"], end_ms=sc["end_ms"])
    for a in asr:
        add(
            "asr", a["text"], None, a["start_ms"],
            end_ms=a["end_ms"], conf=a["confidence"], n_words=a["n_words"], words=a.get("words"),
        )
    for fr in frames:
        add("frame", None, fr["path"], fr["ts"], scene_id=fr["scene_id"])
    for o in ocr:
        add("ocr", o["text"], o["path"], o["ts"] + o["arrival"], conf=o["conf"], bbox=o["bbox"])

    # stable input ordering: (offset, kind priority, text) — mirrors the
    # reference timeline's stable insertion-order sort
    # (reference: phase 2/src/timeline.py:52-67)
    order = sorted(
        range(len(spans)),
        key=lambda j: (spans[j]["offset"], KIND_PRIORITY[spans[j]["kind"]], spans[j]["text"] or ""),
    )
    spans = [spans[j] for j in order]
    attrs = [attrs[j] for j in order]

    title = " ".join(rng.choice(TITLE_WORDS, size=3)) + f" #{i}"
    meta = {
        "title": title,
        "channel": str(rng.choice(CHANNEL_NAMES)),
        "description": " ".join(rng.choice(CONTENT_VOCAB, size=200)),  # >500 chars → truncation path
        "tags": [str(t) for t in rng.choice(CONTENT_VOCAB, size=5)],
        "upload_date": f"2025{int(rng.randint(1, 13)):02d}{int(rng.randint(1, 29)):02d}",
        "duration_ms": duration_ms,
    }
    return {"doc_id": doc_id, "spans": spans, "span_attrs": attrs, "meta": meta}


# ---------------------------------------------------------------- Spark IO

SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "span_attrs array<struct<end_ms:int,confidence:double,bbox:array<double>,scene_id:int,n_words:int,"
    # per-word ASR detail (reference phase 2/src/loader.py:12-18): the
    # golden loader fills it from asr.json; the synthetic generator fills
    # it for ~75% of ASR segments (~12% of words scoreless) and leaves the
    # rest NULL so both A3 confidence paths stay exercised
    "words:array<struct<word:string,start_ms:int,end_ms:int,score:double>>>>, "
    "meta struct<title:string,channel:string,description:string,"
    "tags:array<string>,upload_date:string,duration_ms:long>"
)


def _gen_batches(it):
    import pandas as pd

    for pdf in it:
        rows = [generate_doc(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(
            {
                "doc_id": [r["doc_id"] for r in rows],
                "spans": [
                    [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
                    for r in rows
                ],
                "span_attrs": [
                    [
                        (
                            a["end_ms"], a["confidence"], a["bbox"], a["scene_id"], a["n_words"],
                            None if a.get("words") is None else [
                                (w["word"], w["start_ms"], w["end_ms"], w["score"]) for w in a["words"]
                            ],
                        )
                        for a in r["span_attrs"]
                    ]
                    for r in rows
                ],
                "meta": [
                    (
                        r["meta"]["title"],
                        r["meta"]["channel"],
                        r["meta"]["description"],
                        r["meta"]["tags"],
                        r["meta"]["upload_date"],
                        r["meta"]["duration_ms"],
                    )
                    for r in rows
                ],
            }
        )


# Bump whenever generate_doc's OUTPUT changes (new fields, different RNG
# draws, …): cached corpora under data/<sf>/ are regenerated when their
# stamp doesn't match — the corpus-side analogue of
# oracle_artifacts.ARTIFACTS_VERSION (a bare _SUCCESS check would pin a
# checkout to whatever corpus generation it first materialized forever).
CORPUS_VERSION = 2  # v2: per-word ASR structs (words arrays)


def _corpus_current(path: str) -> bool:
    import os

    marker = os.path.join(path, "_SUCCESS")
    stamp = os.path.join(path, "_CORPUS_VERSION")
    if not os.path.exists(marker):
        return False
    try:
        with open(stamp) as f:
            return f.read().strip() == str(CORPUS_VERSION)
    except OSError:
        return False


def _stamp_corpus(path: str) -> None:
    import os

    with open(os.path.join(path, "_CORPUS_VERSION"), "w") as f:
        f.write(str(CORPUS_VERSION))


def write_documents(spark, n_docs: int, out_path: str, partitions: int | None = None) -> None:
    """Distributed synthesis: spark.range → mapInPandas → parquet."""
    partitions = partitions or max(8, min(64, n_docs // 25 or 1))
    df = spark.range(0, n_docs, 1, partitions).mapInPandas(_gen_batches, schema=SPANS_DDL)
    df.write.mode("overwrite").parquet(out_path)
    _stamp_corpus(out_path)


def ensure_documents(spark, sf_tag: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotent: generate the spans table for a scale tag if absent or
    generated by an older datagen (see CORPUS_VERSION)."""
    import os

    n = DOCS_PER_SF[sf_tag]
    path = os.path.join(base_dir, sf_tag, "documents_spans.parquet")
    if not _corpus_current(path):
        write_documents(spark, n, path)
    return path


def ensure_documents_local(sf_tag: str, base_dir: str = "/root/repo/data") -> str:
    """Spark-free twin of ensure_documents (pyarrow writer) for consumers
    that must not depend on a SparkSession — e.g. ``oracle_sql()`` whose
    DuckDB strings read this corpus and may run before any Spark query has
    had the chance to synthesize it. Byte-layout differs from the Spark
    writer but rows are identical (both materialize generate_doc), and both
    paths honor the _SUCCESS marker so whichever runs first wins."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = DOCS_PER_SF[sf_tag]
    path = os.path.join(base_dir, sf_tag, "documents_spans.parquet")
    if _corpus_current(path):
        return path

    docs = [generate_doc(i) for i in range(n)]
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    attr_t = pa.struct(
        [
            ("end_ms", pa.int32()),
            ("confidence", pa.float64()),
            ("bbox", pa.list_(pa.float64())),
            ("scene_id", pa.int32()),
            ("n_words", pa.int32()),
            (
                "words",
                pa.list_(
                    pa.struct(
                        [
                            ("word", pa.string()),
                            ("start_ms", pa.int32()),
                            ("end_ms", pa.int32()),
                            ("score", pa.float64()),
                        ]
                    )
                ),
            ),
        ]
    )
    meta_t = pa.struct(
        [
            ("title", pa.string()),
            ("channel", pa.string()),
            ("description", pa.string()),
            ("tags", pa.list_(pa.string())),
            ("upload_date", pa.string()),
            ("duration_ms", pa.int64()),
        ]
    )
    table = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], pa.list_(span_t)),
            "span_attrs": pa.array([d["span_attrs"] for d in docs], pa.list_(attr_t)),
            "meta": pa.array([d["meta"] for d in docs], meta_t),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    _stamp_corpus(path)
    return path


def sf_tag_from_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to a generator tag."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return tag if tag in DOCS_PER_SF else "sf0.01"


# --------------------------------------------------------------------------
# HTML twin corpus (DOM-heuristics / main-content extraction family)
# --------------------------------------------------------------------------
# The north rule names "HTML boilerplate strip … DOM heuristics" as core
# extraction capability. The driver's flat `documents` table is plain text,
# so each doc is deterministically rendered into a boilerplate-wrapped HTML
# page (nav/header/aside/footer chrome, inline links, entities, script/
# style/comment noise) and the extractors must recover the article body.
# Both engines read the SAME materialized table (data/<sf>/
# documents_html.parquet), so the synthesis needs to be deterministic, not
# SQL-expressible.

HTML_VERSION = 3  # v3: absolute cross-domain outlinks (link-graph family)

NAV_ITEMS = ["Home", "About", "Contact", "Blog", "Shop", "Login", "Careers", "Help"]

URL_DOMAINS = [
    "example.com",
    "news.example.org",
    "tracker.ads.example",
    "papers.edu.example",
    "wiki.example.net",
]


def _base_url(doc_id: int) -> str:
    """Scheme+host+path for one doc — text-free so a LATER doc can rebuild
    an EARLIER doc's base to plant canonical-duplicate URLs."""
    urng = np.random.RandomState((doc_id * 7919 + 13) % (2**32))
    sub = ["", "www.", "WWW.", "blog.", "m."][int(urng.randint(0, 5))]
    dom = URL_DOMAINS[int(urng.randint(0, len(URL_DOMAINS)))]
    seg = ["articles", "posts", "docs", "items"][int(urng.randint(0, 4))]
    slash = "/" if urng.rand() < 0.2 else ""
    return f"https://{sub}{dom}/{seg}/page-{doc_id}{slash}"


def generate_url(doc_id: int) -> str:
    """Every 41st doc reuses the PREVIOUS doc's base with its own tracking
    params/fragment — a canonical duplicate the URL-dedup operator must
    collapse. Query/fragment draws come from a separate stream so the base
    reconstruction stays exact."""
    base = _base_url(doc_id - 1 if (doc_id % 41 == 5 and doc_id > 0) else doc_id)
    urng = np.random.RandomState((doc_id * 104729 + 7) % (2**32))
    q = "?utm_source=feed&ref=rss" if urng.rand() < 0.35 else ""
    frag = "#sec-2" if urng.rand() < 0.2 else ""
    return base + q + frag


def generate_html_doc(doc_id: int, text: str, source: str) -> tuple[str, str]:
    """(url, html) for one flat document — pure function of its row."""
    rng = np.random.RandomState((doc_id * 2654435761 + 97) % (2**32))
    words = (text or "").split()
    title = " ".join(words[:4]) if words else f"untitled {doc_id}"
    desc = " ".join(words[:12]) if words else title
    url = generate_url(doc_id)

    nav = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.choice(NAV_ITEMS, size=4, replace=False)
    )
    paras: list[list[str]] = []
    i = 4
    while i < len(words):
        n = int(rng.randint(8, 15))
        chunk = list(words[i : i + n])
        i += n
        if rng.rand() < 0.25 and len(chunk) >= 4:
            j = int(rng.randint(0, len(chunk) - 2))
            chunk[j] = f'<a href="/r/{doc_id}_{j}">{chunk[j]} {chunk[j + 1]}</a>'
            del chunk[j + 1]
        paras.append(chunk)
    body: list[str] = []
    for k, chunk in enumerate(paras):
        if k and k % 3 == 0:
            plain = " ".join(chunk[:3])
            body.append(f"<h2>{plain}</h2>")
        txt = " ".join(chunk)
        if k == 1:
            txt += " &amp; more &lt;here&gt;"  # entity-unescape exercise
        body.append(f"<p>{txt}</p>")
    if len(paras) >= 2 and rng.rand() < 0.5:
        items = "".join(f"<li>{' '.join(p[:3])} item</li>" for p in paras[:3])
        body.append(f"<ul>{items}</ul>")
    # aside links are ABSOLUTE and cross-domain: the link-graph operators
    # need real inter-domain edges, not just same-site navigation
    aside = "".join(
        f'<a href="https://{URL_DOMAINS[int(rng.randint(0, len(URL_DOMAINS)))]}'
        f'/promo/{n}">promo {n}</a> '
        for n in range(int(rng.randint(2, 4)))
    )
    return url, (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{desc}">'
        "<style>body { color: #222; }</style>"
        "</head><body>"
        f"<header><h1>{title}</h1></header>"
        f"<nav><ul>{nav}</ul></nav>"
        "<!-- layout: static rebuild -->"
        f'<div class="content">{"".join(body)}</div>'
        f"<aside>{aside}</aside>"
        '<footer><p><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> '
        f"copyright {2000 + doc_id % 26}</p></footer>"
        "<script>var t = 1 < 2; track('pv');</script>"
        "</body></html>"
    )


def _html_current(path: str) -> bool:
    import os

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(path, "_HTML_VERSION")) as f:
            return f.read().strip() == str(HTML_VERSION)
    except OSError:
        return False


def ensure_html(sf_dir: str, base_dir: str = "/root/repo/data") -> str:
    """Materialize the HTML twin of <sf_dir>/documents.parquet under
    data/<tag>/documents_html.parquet (Spark-free pyarrow writer; both the
    Spark queries and the DuckDB oracles read this table)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = os.path.join(base_dir, tag, "documents_html.parquet")
    if _html_current(path):
        return path

    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    ).to_pylist()
    src.sort(key=lambda r: r["doc_id"])
    urls, htmls = [], []
    for r in src:
        u, h = generate_html_doc(int(r["doc_id"]), r["text"], r["source"])
        urls.append(u)
        htmls.append(h)
    table = pa.table(
        {
            "doc_id": pa.array([int(r["doc_id"]) for r in src], pa.int64()),
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.string()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-00000.parquet"))
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    with open(os.path.join(path, "_HTML_VERSION"), "w") as f:
        f.write(str(HTML_VERSION))
    return path
