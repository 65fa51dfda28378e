"""Currency / number / date normalization for OCR output.

Reproduces ``normalize_currency_and_numbers`` from the reference
(app/services/dictionary_corrector.py:1304-1408): Rupiah format repair,
month-context year fixes, digit-lookalike translation after "Rp", and
19xx/20xx year character repair. Rule ORDER is load-bearing and matches
the reference list exactly; all rules in the first block run
case-insensitively, the "Rp"-lookbehind digit fixes are case-sensitive
(:1384-1385), as in the reference.
"""
from __future__ import annotations

import re

_MONTHS = (
    r"(januari|februari|maret|april|mei|juni|juli|agustus|september|"
    r"oktober|november|desember)"
)

# (pattern, replacement) applied in order with re.IGNORECASE
# (reference rp_patterns, :1320-1366).
_RULES: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(p, re.IGNORECASE), r)
    for p, r in [
        # Rp.277.-- / Rp.277,-- → Rp 277,-
        (r"Rp\.?\s*(\d+(?:[.,]\d+)*)\s*[-.,]+\s*[-]+", r"Rp \1,-"),
        # Rp.277 / Rp277 → Rp 277
        (r"Rp\.?\s*(\d+(?:[.,]\d+)*)", r"Rp \1"),
        # OCR misreads of the symbol itself: Ru.277, RPy 277
        (r"Ru\.?\s*(\d+(?:[.,]\d+)*)", r"Rp \1"),
        (r"R[Pp]y\.?\s*(\d+(?:[.,]\d+)*)", r"Rp \1"),
        # Leading symbol noise ate the "Rp": " ..277" → " Rp 277"
        (r"(^|\s)[.:]+(\d+(?:[.,]\d+)*)(?=\s|$|[-.,])", r"\1Rp \2"),
        # Year lost its leading 1 after a month name: "maret 962" → "maret 1962"
        (_MONTHS + r"\s*[,.]*\s*([98]\d{2})(?!\d)", r"\1 1\2"),
        # Same, with a trailing l/I/1 misread: "maret 97l" → "maret 1971"
        (_MONTHS + r"\s*[,.]*\s*([98]\d)[lI1](?!\d)", r"\1 1\g<2>1"),
        # "ll Maret" / "II Maret" → "11 Maret"
        (r"\b([lI]{2})\s+" + _MONTHS, r"11 \2"),
        # Split year rejoin with month context: "maret 19 71" → "maret 1971"
        (_MONTHS + r"\s*[,.]*\s*(19|20)\s+(\d{2})(?!\d)", r"\1 \2\3"),
        # Specific amount misread
        (r"25\s*[,.]\s*[zZ]00", r"25.100"),
        # Number-word spellings mangled by OCR
        (r"\b[Pp][lI1][hbn]\b", r"puluh"),
        (r"\b(ke\s*lima|kelima)\s+(ribu|ratus)", r"lima \2"),
        (r"\bs[o0a]ratus\b", r"seratus"),
        # Specific name misreads
        (r"\b[Kk]asm\s*[.,]\s*nem\b", r"Kasminem"),
        (r"\b[Ss]ukati[l1I]\b", r"Sukati"),
        (r"\b[Mm]aineh\b", r"Mainah"),
    ]
)

# Digit-lookalike translation applied to number runs right after "Rp "/"Rp."
# (case-sensitive lookbehinds, reference :1383-1385).
_AFTER_RP = (
    re.compile(r"(?<=Rp\s)[lOoIzZsS0-9.,]+"),
    re.compile(r"(?<=Rp\.)[lOoIzZsS0-9.,]+"),
)
_LOOKALIKE = str.maketrans("lOoIzZsSb", "100122556")
_HAS_LOOKALIKE = re.compile(r"[lOoIzZsS]")
_HAS_DIGIT = re.compile(r"\d")

# Year character repair: 1g63 → 1963, 196l → 1961 (reference :1399-1406).
_YEAR_19 = re.compile(r"\b1[9g][0-9lOog]{2}\b")
_YEAR_20 = re.compile(r"\b20[0-9lOo]{2}\b")


def _fix_number_chars(m: re.Match) -> str:
    num = m.group(0)
    if _HAS_LOOKALIKE.search(num) and _HAS_DIGIT.search(num):
        return num.translate(_LOOKALIKE)
    return num


def _fix_year(m: re.Match) -> str:
    return m.group(0).replace("g", "9").replace("l", "1").replace("O", "0")


def normalize_currency_and_numbers(text: str) -> str:
    if not text:
        return text
    result = text
    for pattern, repl in _RULES:
        result = pattern.sub(repl, result)
    for pattern in _AFTER_RP:
        result = pattern.sub(_fix_number_chars, result)
    result = _YEAR_19.sub(_fix_year, result)
    result = _YEAR_20.sub(_fix_year, result)
    return result
