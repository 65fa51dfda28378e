"""Old-Indonesian-spelling normalization (Van Ophuijsen / Soewandi → EYD).

Reproduces the reference's spelling_normalizer
(app/services/spelling_normalizer.py): ordered digraph rules
(oe→u, dj→j, tj→c, nj→ny, sj→sy, ch→kh, :31-41), whole-word j→y map
(jang→yang, :45-51), foreign-word whitelist skip (:16-27, 54-56), and
case-preserving replacement (ALL-CAPS match → upper, First-upper →
capitalize, :86-100). Runs AFTER dictionary correction in the repair
chain (reference app/routers/ocr.py:203-229).
"""
from __future__ import annotations

import functools
import re

from ocr_ray import data

_TOKEN_SCAN = re.compile(r"\S+|\s+")


@functools.lru_cache(maxsize=1)
def _compiled_rules() -> tuple[tuple[re.Pattern, str], ...]:
    return tuple(
        (re.compile(pat, re.IGNORECASE), repl) for pat, repl in data.rules_ejaan()
    )


def _replace_preserve_case(text: str, pattern: re.Pattern, replacement: str) -> str:
    def repl(m: re.Match) -> str:
        hit = m.group(0)
        if hit.isupper():
            return replacement.upper()
        if hit[0].isupper():
            return replacement.capitalize()
        return replacement

    return pattern.sub(repl, text)


@functools.lru_cache(maxsize=1 << 17)
def normalize_word(word: str) -> str:
    # memoized per token: depends only on the STATIC spelling tables
    # (kata_asing / j_ke_y / rules), never on the run dictionary
    if word.lower() in data.kata_asing():
        return word

    special = data.j_ke_y().get(word.lower())
    if special is not None:
        if word[0].isupper():
            return special.capitalize()
        return special

    result = word
    for pattern, replacement in _compiled_rules():
        result = _replace_preserve_case(result, pattern, replacement)
    return result


def normalize_text(text: str) -> str:
    """Normalize every token, preserving whitespace runs exactly."""
    if not text:
        return text
    return "".join(
        normalize_word(tok) if tok.strip() else tok
        for tok in _TOKEN_SCAN.findall(text)
    )


def normalize_with_comparison(text: str) -> tuple[str, str, int]:
    """Returns (original, normalized, n_changed_words) — change count is the
    positional word-wise diff of ``str.split()`` outputs (reference
    :132-153)."""
    if not text:
        return text, text, 0
    normalized = normalize_text(text)
    changes = sum(
        1 for a, b in zip(text.split(), normalized.split()) if a != b
    )
    return text, normalized, changes
