"""Spec-level scalar text primitives, shared by the Spark pipeline and the
pure-Python oracle (they are *the spec*; the interesting correctness surface
is the distributed orchestration around them).

Normalization covers the OCR-noise characters observed in the reference's
golden full_text (reference: phase 1/XNQTWZ87K4I/ocr.json): NBSP, zero-width
chars, curly quotes — plus NFC unicode normalization and Python-``str.split``
whitespace collapsing (reference tokenizes with bare ``.split()``,
phase 2/src/ocr_cleanup.py:47).
"""

from __future__ import annotations

import math
import re
import unicodedata
from collections import Counter

_ZW_TABLE = dict.fromkeys(map(ord, "​‌‍﻿"), None)
_CHAR_TABLE = {
    ord("’"): "'",
    ord("‘"): "'",
    ord("“"): '"',
    ord("”"): '"',
    ord(" "): " ",
}
_WS_RE = re.compile(r"\s+")
_TFIDF_TOKEN_RE = re.compile(r"\b\w\w+\b")
# the two-document corpus admits exactly two idf values: df=1 → ln(3/2)+1,
# df=2 → ln(3/3)+1 = 1.0 (see tfidf_cosine docstring)
_IDF_DF1 = math.log(3.0 / 2.0) + 1.0


def normalize_text(s: str | None) -> str | None:
    """NFC + strip zero-width + ASCII-fold quotes + collapse whitespace.

    Fast path: for ASCII strings with no tabs/newlines/double/edge spaces
    every step below is the identity (NFC is a no-op on ASCII; both
    translate tables key only non-ASCII chars; the \\s+→' ' sub changes
    nothing), and that is the overwhelmingly common case in the hot loop.
    """
    if s is None:
        return None
    if (
        s.isascii()
        and "  " not in s
        and "\t" not in s
        and "\n" not in s
        and "\r" not in s
        and "\x0b" not in s
        and "\x0c" not in s
        and not s.startswith(" ")
        and not s.endswith(" ")
    ):
        return s
    s = unicodedata.normalize("NFC", s).translate(_ZW_TABLE).translate(_CHAR_TABLE)
    return _WS_RE.sub(" ", s).strip()


def tokens(s: str | None) -> list[str]:
    """Lowercase whitespace tokens (Python str.split semantics)."""
    if not s:
        return []
    return s.lower().split()


def tfidf_cosine(a: str | None, b: str | None) -> float:
    """Two-document TF-IDF cosine between a chunk's spoken and on-screen text.

    Deterministic pure function of the two strings (the reference fits a
    per-chunk-pair sklearn TfidfVectorizer, phase 2/src/aligner.py:19-24,
    54-61 — corpus size is always 2, so idf ∈ {ln(3/2)+1, ln(3/3)+1} with
    smooth-idf, l2 norm). Tokenization matches sklearn's default
    token_pattern (?u)\\b\\w\\w+\\b.
    """
    ta = _TFIDF_TOKEN_RE.findall(a.lower()) if a else []
    tb = _TFIDF_TOKEN_RE.findall(b.lower()) if b else []
    if not ta or not tb:
        return 0.0
    ca = Counter(ta)  # C-accelerated counting; values identical to a dict loop
    cb = Counter(tb)
    # sorted iteration: float accumulation order is fixed, so the score is
    # bit-identical across processes regardless of PYTHONHASHSEED (the
    # canonical chunk projection floors this to e6 for oracle hashing)
    vocab = sorted(set(ca) | set(cb))
    dot = 0.0
    na = 0.0
    nb = 0.0
    # bit-identical restructure of the naive per-token loop (idf recomputed
    # via math.log each time): shared tokens have idf exactly 1.0 so
    # va = float(count); exclusive tokens contribute 0.0 to dot and to the
    # other norm, and x += 0.0 is the identity on finite floats — the
    # accumulation ORDER over the sorted vocab is unchanged, so the result
    # is the same double, which the e6-floored oracle columns depend on.
    for t in vocab:
        a_c = ca.get(t, 0)
        b_c = cb.get(t, 0)
        if a_c and b_c:
            va = float(a_c)
            vb = float(b_c)
            dot += va * vb
            na += va * va
            nb += vb * vb
        elif a_c:
            va = a_c * _IDF_DF1
            na += va * va
        else:
            vb = b_c * _IDF_DF1
            nb += vb * vb
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / math.sqrt(na * nb)
