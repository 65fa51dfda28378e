"""Pure text-repair kernels (str → str / struct), faithful to the reference
service's behavior (see each module's docstring for file:line citations).

These are deliberately plain Python functions with no Ray dependency so the
same code backs (a) the Ray ``map_batches`` stages, (b) the plain-Python
oracle used for span-sequence-equality testing, and (c) the pytest golden
tests generated from the reference's own smoke fixtures.
"""
from ocr_ray.kernels.dictionary import (
    apply_multi_word_corrections,
    correct_text,
    correct_with_stats,
    correct_word,
)
from ocr_ray.kernels.currency import normalize_currency_and_numbers
from ocr_ray.kernels.spelling import normalize_text, normalize_with_comparison
from ocr_ray.kernels.scoring import calculate_quality_score
from ocr_ray.kernels.words import extract_words, get_unknown_words, is_valid_word
from ocr_ray.kernels.repair import repair_text

__all__ = [
    "apply_multi_word_corrections",
    "correct_text",
    "correct_with_stats",
    "correct_word",
    "normalize_currency_and_numbers",
    "normalize_text",
    "normalize_with_comparison",
    "calculate_quality_score",
    "extract_words",
    "get_unknown_words",
    "is_valid_word",
    "repair_text",
]
