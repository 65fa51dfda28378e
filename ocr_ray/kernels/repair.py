"""The composed text-repair chain — the reference's per-request pipeline
as one pure function (reference app/routers/ocr.py:203-242; ORDER is
load-bearing):

1. dictionary correction (``correct_with_stats``) then
   currency/number normalization — when ``use_dictionary``;
2. old-spelling normalization on the *corrected* text — when
   ``normalize_spelling`` (else normalized == corrected);
3. quality scoring over the final text with the engine confidences and
   the dictionary-correction count.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from ocr_ray.kernels.currency import normalize_currency_and_numbers
from ocr_ray.kernels.dictionary import correct_with_stats
from ocr_ray.kernels.scoring import QualityScore, calculate_quality_score
from ocr_ray.kernels.spelling import normalize_with_comparison


@dataclass
class RepairResult:
    text: str                    # raw input (the reference returns raw OCR text)
    corrected_text: str
    normalized_text: str
    dictionary_corrections: int
    spelling_changes: int
    quality: QualityScore = field(default=None)  # type: ignore[assignment]


def repair_text(
    text: str,
    confidence_scores: Optional[Sequence[float]] = None,
    use_dictionary: bool = True,
    normalize_spelling: bool = True,
    score: bool = True,
) -> RepairResult:
    corrected = text
    dictionary_corrections = 0
    if use_dictionary and text:
        corrected, dictionary_corrections = correct_with_stats(text)
        corrected = normalize_currency_and_numbers(corrected)

    spelling_changes = 0
    if normalize_spelling and corrected:
        _, normalized, spelling_changes = normalize_with_comparison(corrected)
    else:
        normalized = corrected

    quality = None
    if score:
        quality = calculate_quality_score(
            text=(normalized if normalized else corrected) or text,
            confidence_scores=confidence_scores,
            dictionary_corrections=dictionary_corrections or 0,
        )

    return RepairResult(
        text=text,
        corrected_text=corrected,
        normalized_text=normalized,
        dictionary_corrections=dictionary_corrections,
        spelling_changes=spelling_changes,
        quality=quality,
    )
