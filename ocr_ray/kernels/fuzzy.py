"""Deterministic fuzzy dictionary matching.

Reimplements what the reference gets from rapidfuzz (not available here):
``fuzz.ratio`` is the normalized InDel similarity
``100 * 2*LCS(a,b) / (len(a)+len(b))`` and ``process.extractOne(..,
score_cutoff=t)`` picks the best-scoring candidate (reference:
app/services/dictionary_corrector.py:670-708).

The reference iterates a Python *set*, so ties are resolved in hash order —
nondeterministic across processes. This engine freezes a deterministic spec
instead: candidates are scanned in sorted order and the FIRST strict
improvement wins, i.e. ties resolve to the lexicographically smallest
candidate (SURVEY.md §7.3 item 2).
"""
from __future__ import annotations

import functools

from ocr_ray import data


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0, 100] (rapidfuzz fuzz.ratio)."""
    if not a and not b:
        return 100.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(len(a)*len(b)) with a rolling row."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        best = 0
        for j, cb in enumerate(b):
            if ca == cb:
                best = prev[j] + 1
            elif prev[j + 1] > best:
                best = prev[j + 1]
            append(best)
        prev = cur
    return prev[-1]


@functools.lru_cache(maxsize=65536)
def best_dictionary_match(word_lower: str, threshold: int = 65) -> str | None:
    """Best kamus entry with similarity ≥ threshold, or None.

    Mirrors the reference's extractOne call (dictionary_corrector.py:691-696)
    with the deterministic tie-break described above. Words already in the
    kamus return None ("no correction needed", reference :687-688).

    Cached per process: OCR noise repeats heavily across a corpus, so the
    cache turns the O(|kamus|·|word|²) scan into a dict hit on the hot path.
    """
    if word_lower in data.kamus():
        return None

    lw = len(word_lower)
    best: str | None = None
    best_score = -1.0
    for cand in data.kamus_sorted():
        lc = len(cand)
        # score = 200*LCS/(lw+lc) and LCS <= min(lw,lc): cheap upper bound
        # lets us skip candidates that cannot beat the current best / cutoff.
        if 200.0 * min(lw, lc) / (lw + lc) < max(best_score, float(threshold)):
            continue
        score = indel_ratio(word_lower, cand)
        if score >= threshold and score > best_score:
            best, best_score = cand, score
    return best
