"""Spark-free oracle artifacts for the driver's DuckDB correctness gate.

The relational queries are oracled by *recomputing* them in DuckDB SQL.
The pandas-kernel pipeline (extract → chunks) and the two stateful folds
cannot be recomputed faithfully in DuckDB (its 1.0.0 ``list_reduce`` is
defective for folds over a few hundred elements — see NOTES_STATE.md), so
their oracle is this module: an INDEPENDENT pure-Python implementation
(``oracle.py`` is the transcribed executable spec of the reference, with
file:line citations) evaluated over the same deterministic corpus
(``datagen.generate_doc`` — the exact rows the parquet holds) and written
to parquet that the driver's DuckDB oracle SQL then reads. The comparison
is therefore Spark-vs-pure-Python, with DuckDB as the transport — the same
"Python fold reference written to parquet and diffed" protocol the W2
keep-chain tests already use.

Everything here is bit-deterministic: float accumulations follow the same
order as the Spark kernels, and all oracle-facing floats are floored to
fixed-point integers on BOTH sides.
"""

from __future__ import annotations

import hashlib
import math
import os
import re

# bump when any artifact's schema or semantics change — stale artifacts are
# rebuilt automatically
ARTIFACTS_VERSION = 6

US = "\x1f"  # field separator inside a serialized span
RS = "\x1e"  # separator between serialized spans / list elements

# Java-regex \s (ASCII-only), matching Spark's split(text, '\\s+') exactly —
# Python's re \s is Unicode-aware and would also split on NBSP
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")

OCR_CONF_MIN = 0.5
NEAR_DUP_BP = 9000


def _e6(x: float) -> int:
    return int(math.floor(x * 1000000.0))


def _round_half_up(x: float) -> int:
    # Spark F.round on DOUBLE is HALF_UP; equals floor(x+0.5) for x ≥ 0
    return int(math.floor(x + 0.5))


# --------------------------------------------------------------------------
# chunks (canonical projection) + context windows
# --------------------------------------------------------------------------

def _canonical_chunk_row(c: dict) -> dict:
    prov = c["provenance"]
    return {
        "chunk_id": c["chunk_id"],
        "doc_id": c["doc_id"],
        "source": c["source"],
        "t_start_ms": int(c["t_start_ms"]),
        "t_end_ms": int(c["t_end_ms"]),
        "chapter_index": int(c["chapter_index"]),
        "chapter_title": c["chapter_title"],
        "scene_id": int(c["scene_id"]),
        "merged_scene_ids_s": ",".join(str(int(s)) for s in c["merged_scene_ids"]),
        "asr_text": c["asr_text"],
        "ocr_text": c["ocr_text"],
        "merged_text": c["merged_text"],
        "out_spans_s": RS.join(
            US.join(
                [
                    s["kind"],
                    s["text"] or "",
                    s["media_ref"] or "",
                    str(int(s["offset"])),
                ]
            )
            for s in c["out_spans"]
        ),
        "span_ctx_s": RS.join(x or "" for x in c["span_ctx"]),
        "keyframe_ids_s": ",".join(str(int(k)) for k in c["keyframe_ids"]),
        "keyframe_paths_s": RS.join(c["keyframe_paths"]),
        "has_keyframe": bool(c["has_keyframe"]),
        "asr_conf_e6": _e6(c["asr_confidence"]),
        "ocr_conf_e6": _e6(c["ocr_confidence"]),
        "alignment_e6": _e6(c["alignment_score"]),
        "has_speech": bool(c["completeness"]["has_speech"]),
        "has_visual": bool(c["completeness"]["has_visual"]),
        "has_ocr_text": bool(c["completeness"]["has_ocr_text"]),
        "video_title": prov["video_title"] or "",
        "channel": prov["channel"] or "",
        "video_description": prov["video_description"] or "",
        "tags_s": RS.join(prov["tags"] or []),
        "publish_date": prov["publish_date"] or "",
    }


# --------------------------------------------------------------------------
# W2-relational fold replica (operators/relational.py:ocr_frame_dedup)
# --------------------------------------------------------------------------

def _java_tokens(text: str) -> set[str]:
    return {t for t in _JAVA_WS.split(text.lower()) if t != ""}


def _frame_dedup_rows(doc: dict) -> list[dict]:
    blocks = [
        (s, a)
        for s, a in zip(doc["spans"], doc["span_attrs"])
        if s["kind"] == "ocr"
        and a["confidence"] is not None
        and a["confidence"] >= OCR_CONF_MIN
        and s["text"] is not None
    ]
    by_path: dict[str, list[tuple]] = {}
    for s, a in blocks:
        by_path.setdefault(s["media_ref"], []).append((s, a))

    frames = []
    for path, bl in by_path.items():
        def _order_key(sa):
            s, a = sa
            bb = a["bbox"]
            y = bb[1] if bb is not None and len(bb) > 1 else 0.0
            x = bb[0] if bb is not None and len(bb) > 0 else 0.0
            return (y, x, s["text"], -_round_half_up(a["confidence"] * 10000))

        ordered = sorted(bl, key=_order_key)
        text = " ".join(s["text"] for s, _ in ordered)
        conf_e4 = int(
            math.floor(sum(_round_half_up(a["confidence"] * 10000) for _, a in bl) / len(bl))
        )
        ts = min(int(s["offset"]) for s, _ in bl)
        frames.append((ts, path, text, conf_e4))
    frames.sort()

    kept: list[tuple] = []
    for f in frames:
        if f[2] == "":
            continue
        if kept:
            last = kept[-1]
            cur_t = _java_tokens(f[2])
            last_t = _java_tokens(last[2])
            denom = max(len(cur_t), len(last_t))
            if denom > 0 and len(cur_t & last_t) * 10000 >= denom * NEAR_DUP_BP:
                if f[3] > last[3]:
                    kept[-1] = f
                continue
        kept.append(f)

    return [
        {
            "doc_id": doc["doc_id"],
            "rank": rank + 1,
            "ts": f[0],
            "path": f[1],
            "full_text": f[2],
            "conf_e4": f[3],
        }
        for rank, f in enumerate(kept)
    ]


# --------------------------------------------------------------------------
# media feature replica (operators/media.py synthesize + extract)
# --------------------------------------------------------------------------

def _media_feature_rows(docs: list[dict]) -> list[dict]:
    import numpy as np

    refs = sorted(
        {
            s["media_ref"]
            for doc in docs
            for s in doc["spans"]
            if s["kind"] == "frame" and s["media_ref"] is not None
        }
    )
    rows = []
    from .operators.media import RESOLUTION_LADDER

    for ref in refs:
        # synthesize_media: payload = UTF-8 bytes of the sha2 hex STRING;
        # width/height from the ladder by the digest's first byte (the
        # Spark side reads the first 2 hex chars — the same byte)
        hexd = hashlib.sha256(ref.encode("utf-8")).hexdigest()
        payload = hexd.encode("utf-8")
        width, height = RESOLUTION_LADDER[int(hexd[:2], 16) % len(RESOLUTION_LADDER)]
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
        hist, _ = np.histogram(img, bins=32, range=(0, 256))
        tot = hist.sum() or 1
        feat = (hist / tot).astype(np.float32)
        rows.append(
            {
                "media_ref": ref,
                "mime": "image/jpeg",
                "n_bytes": len(payload),
                "sha256": hashlib.sha256(payload).hexdigest(),
                "width": width,
                "height": height,
                "feature_e8_s": ",".join(
                    str(int(math.floor(float(v) * 100000000.0 + 0.5))) for v in feat
                ),
            }
        )
    return rows


# --------------------------------------------------------------------------
# BPE replica (independent spec of operators/bpe.py — tokenizer-training
# support): top-V truncated word table, greedy max-pair merges, sequential
# encode. Written against the textual contract in bpe.py's docstring, not
# its code.
# --------------------------------------------------------------------------

BPE_N_MERGES = 40
BPE_MAX_VOCAB = 65536
BPE_TARGET_N = None  # full corpus


def _bpe_word_table(texts: list[str]) -> list[tuple[str, int]]:
    from collections import Counter

    wf: Counter = Counter()
    for t in texts:
        for w in _JAVA_WS.split((t or "").lower()):
            if w:
                wf[w] += 1
    ranked = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:BPE_MAX_VOCAB]


def _bpe_merge_word(syms: tuple, left: str, right: str) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if syms[i] == left and i + 1 < len(syms) and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_learn_replica(word_table: list[tuple[str, int]]):
    from collections import Counter

    vocab = {i: (tuple(w), f) for i, (w, f) in enumerate(word_table) if w}
    merges = []
    for step in range(1, BPE_N_MERGES + 1):
        stats: Counter = Counter()
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        best_cnt = max(stats.values())
        left, right = min(p for p, c in stats.items() if c == best_cnt)
        merges.append({"step": step, "left": left, "right": right, "pair_count": best_cnt})
        vocab = {
            i: (_bpe_merge_word(syms, left, right), f) for i, (syms, f) in vocab.items()
        }
    return merges


def _bpe_encode_replica(doc_rows: list[tuple], merges: list[dict]) -> list[dict]:
    seq = [(m["left"], m["right"]) for m in merges]
    memo: dict[str, list[str]] = {}

    def pieces_of(word: str) -> list[str]:
        if word in memo:
            return memo[word]
        syms: tuple = tuple(word)
        for l, r in seq:
            if len(syms) < 2:
                break
            syms = _bpe_merge_word(syms, l, r)
        memo[word] = list(syms)
        return memo[word]

    out = []
    for doc_id, text in doc_rows:
        words = [w for w in _JAVA_WS.split((text or "").lower()) if w]
        pieces: list[str] = []
        for w in words:
            pieces.extend(pieces_of(w))
        out.append(
            {
                "doc_id": int(doc_id),
                "n_words": len(words),
                "n_pieces": len(pieces),
                "pieces_sig": hashlib.md5(US.join(pieces).encode("utf-8")).hexdigest(),
            }
        )
    return out


# --------------------------------------------------------------------------
# artifact writer
# --------------------------------------------------------------------------

def _write_parquet(path: str, rows: list[dict], schema) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path)


def ensure_oracle_artifacts(sf_tag: str, base_dir: str = "/root/repo/data") -> str:
    """Idempotent: build all oracle parquet artifacts for a scale tag."""
    import pyarrow as pa

    from . import oracle
    from .datagen import DOCS_PER_SF, generate_doc

    out_dir = os.path.join(base_dir, sf_tag)
    marker = os.path.join(out_dir, "_ORACLE_ARTIFACTS_VERSION")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(ARTIFACTS_VERSION):
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    docs = [generate_doc(i) for i in range(DOCS_PER_SF[sf_tag])]

    chunk_rows, ctx_rows, dedup_rows = [], [], []
    for doc in docs:
        for c in oracle.extract_chunks(doc):
            chunk_rows.append(_canonical_chunk_row(c))
            for s, ctx in zip(c["out_spans"], c["span_ctx"]):
                ctx_rows.append(
                    {
                        "chunk_id": c["chunk_id"],
                        "kind": s["kind"],
                        "offset": int(s["offset"]),
                        "nearest_frame": ctx,
                    }
                )
        dedup_rows.extend(_frame_dedup_rows(doc))

    s, i64, b = pa.string(), pa.int64(), pa.bool_()
    chunk_schema = pa.schema(
        [
            ("chunk_id", s), ("doc_id", s), ("source", s),
            ("t_start_ms", i64), ("t_end_ms", i64),
            ("chapter_index", i64), ("chapter_title", s), ("scene_id", i64),
            ("merged_scene_ids_s", s), ("asr_text", s), ("ocr_text", s),
            ("merged_text", s), ("out_spans_s", s), ("span_ctx_s", s),
            ("keyframe_ids_s", s), ("keyframe_paths_s", s), ("has_keyframe", b),
            ("asr_conf_e6", i64), ("ocr_conf_e6", i64), ("alignment_e6", i64),
            ("has_speech", b), ("has_visual", b), ("has_ocr_text", b),
            ("video_title", s), ("channel", s), ("video_description", s),
            ("tags_s", s), ("publish_date", s),
        ]
    )
    _write_parquet(os.path.join(out_dir, "oracle_chunks.parquet"), chunk_rows, chunk_schema)
    _write_parquet(
        os.path.join(out_dir, "oracle_context_windows.parquet"),
        ctx_rows,
        pa.schema([("chunk_id", s), ("kind", s), ("offset", i64), ("nearest_frame", s)]),
    )
    _write_parquet(
        os.path.join(out_dir, "oracle_frame_dedup.parquet"),
        dedup_rows,
        pa.schema(
            [("doc_id", s), ("rank", i64), ("ts", i64), ("path", s), ("full_text", s), ("conf_e4", i64)]
        ),
    )
    _write_parquet(
        os.path.join(out_dir, "oracle_media_features.parquet"),
        _media_feature_rows(docs),
        pa.schema(
            [
                ("media_ref", s), ("mime", s), ("n_bytes", i64), ("sha256", s),
                ("width", i64), ("height", i64), ("feature_e8_s", s),
            ]
        ),
    )
    # BPE merge-table + encode replicas over the FLAT documents table (the
    # testdata corpus the bpe_* queries read), pyarrow in, parquet out
    flat_path = os.path.join("/root/testdata", sf_tag, "documents.parquet")
    if os.path.exists(flat_path):
        import pyarrow.parquet as pq

        tbl = pq.read_table(flat_path, columns=["doc_id", "text"])
        doc_ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        merges = _bpe_learn_replica(_bpe_word_table(texts))
        _write_parquet(
            os.path.join(out_dir, "oracle_bpe_merges.parquet"),
            merges,
            pa.schema([("step", i64), ("left", s), ("right", s), ("pair_count", i64)]),
        )
        _write_parquet(
            os.path.join(out_dir, "oracle_bpe_encode.parquet"),
            _bpe_encode_replica(list(zip(doc_ids, texts)), merges),
            pa.schema(
                [("doc_id", i64), ("n_words", i64), ("n_pieces", i64), ("pieces_sig", s)]
            ),
        )

    with open(marker, "w") as f:
        f.write(str(ARTIFACTS_VERSION))
    return out_dir
