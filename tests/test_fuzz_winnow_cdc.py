"""Derandomized fuzz: winnowing and CDC kernels vs pure-python replicas
over randomized token streams (repetition-heavy, tiny, empty, single)."""

import hashlib
import random

from graphical_context_extraction_pipeline_spark.operators import dedup

P, C = 2147483647, 1000003


def _py_winnow(text, k=3, w=4):
    toks = text.lower().split()
    th = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
    if len(th) < k:
        return set()
    kh = []
    for i in range(len(th) - k + 1):
        acc = th[i]
        for j in range(1, k):
            acc = (acc * C + th[i + j]) % P
        kh.append(acc)
    if len(kh) < w:
        return {min(kh)}
    return {min(kh[i:i + w]) for i in range(len(kh) - w + 1)}


def _py_cdc(text, mask=31):
    toks = text.lower().split()
    if not toks:
        return []
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % (mask + 1) == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (i, hashlib.md5(" ".join(c).encode()).hexdigest(), len(c))
        for i, c in enumerate(chunks)
    ]


def _corpus(seed: int, n_docs: int = 30):
    rng = random.Random(seed)
    vocab = [f"t{j}" for j in range(rng.randint(3, 40))]
    rows = []
    for i in range(n_docs):
        n = rng.choice([0, 1, 2, 3, 5, 8, 40, 200])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows.append((n_docs, ""))
    rows.append((n_docs + 1, "  "))
    return rows


def test_fuzz_winnow_and_cdc_vs_replicas(spark):
    for seed in (1, 7, 42):
        rows = _corpus(seed)
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        got_w = {}
        for r in dedup.winnow_fingerprints(docs).collect():
            got_w.setdefault(r["doc_id"], set()).add(r["fp"])
        want_w = {i: _py_winnow(t) for i, t in rows if _py_winnow(t)}
        assert got_w == want_w, f"winnow mismatch at seed {seed}"

        got_c = {}
        for r in dedup.cdc_chunks(docs).collect():
            got_c.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_hash"], r["n_tokens"])
            )
        for d in got_c:
            got_c[d].sort()
        want_c = {i: _py_cdc(t) for i, t in rows if _py_cdc(t)}
        assert got_c == want_c, f"cdc mismatch at seed {seed}"
