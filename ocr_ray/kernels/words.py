"""Word extraction / validity helpers shared by scoring and learning.

Reference: app/services/dictionary_corrector.py:217-235 (unknown words),
app/services/scoring_service.py:62-72 (word extraction),
app/services/learning_service.py:34-47 (trackable-word validity).
"""
from __future__ import annotations

import re

from ocr_ray import data

_WORD_RE = re.compile(r"[a-zA-Z]{3,}")


def extract_words(text: str) -> list[str]:
    """Lowercased alphabetic runs of ≥3 chars, in document order."""
    if not text:
        return []
    return _WORD_RE.findall(text.lower())


def get_unknown_words(text: str) -> list[str]:
    """Distinct extracted words not present in the kamus.

    The reference returns ``list(set(...))`` — nondeterministic order
    (dictionary_corrector.py:235); this engine returns sorted order,
    frozen as spec (SURVEY.md §2.7 D1).
    """
    kamus = data.kamus()
    return sorted({w for w in extract_words(text) if w not in kamus})


def is_valid_word(word: str) -> bool:
    """Trackable by the learning aggregation: ≥3 chars, no digits,
    alphabetic allowing - and ' (reference learning_service.py:34-47)."""
    if not word or len(word) < 3:
        return False
    if any(c.isdigit() for c in word):
        return False
    return word.replace("-", "").replace("'", "").isalpha()
