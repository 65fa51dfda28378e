"""Composite OCR quality scoring.

Reproduces the reference scoring_service (app/services/scoring_service.py):
overall = int(0.40·confidence + 0.30·dict_match% + 0.30·(100 − correction%))
with label bands Excellent ≥85 / Good ≥70 / Fair ≥50 / Poor (:38-59),
confidence defaulting to 75 when absent and 0-1 inputs scaled to 0-100
(:112-126), dictionary match of 100 for empty word lists (:83-84).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from ocr_ray import data
from ocr_ray.kernels.words import extract_words

WEIGHT_CONFIDENCE = 0.40
WEIGHT_DICTIONARY = 0.30
WEIGHT_CORRECTION = 0.30


@dataclass
class QualityScore:
    overall: int
    label: str
    confidence: float
    dictionary_match: float
    correction_rate: float
    total_words: int
    matched_words: int
    corrected_words: int

    def as_dict(self) -> dict:
        # flat dataclass: a __dict__ copy avoids dataclasses.asdict's
        # recursive deep-copy machinery (hot path: once per span)
        return dict(self.__dict__)


def quality_label(score: int) -> str:
    if score >= 85:
        return "Excellent"
    if score >= 70:
        return "Good"
    if score >= 50:
        return "Fair"
    return "Poor"


def _confidence_score(confidences: Sequence[float]) -> float:
    if not confidences:
        return 75.0
    avg = sum(confidences) / len(confidences)
    if avg <= 1.0:
        avg *= 100
    return min(100.0, max(0.0, avg))


def calculate_quality_score(
    text: str,
    confidence_scores: Optional[Sequence[float]] = None,
    dictionary_corrections: int = 0,
) -> QualityScore:
    words = extract_words(text)
    total = len(words)

    confidence = _confidence_score(confidence_scores or [])

    kamus = data.kamus()
    matched = sum(1 for w in words if w in kamus)
    dict_match = (matched / total * 100) if total else 100.0

    if total:
        correction = max(0, 100 - dictionary_corrections / total * 100)
    else:
        correction = 100.0

    overall = int(
        confidence * WEIGHT_CONFIDENCE
        + dict_match * WEIGHT_DICTIONARY
        + correction * WEIGHT_CORRECTION
    )
    overall = min(100, max(0, overall))

    return QualityScore(
        overall=overall,
        label=quality_label(overall),
        confidence=round(confidence, 1),
        dictionary_match=round(dict_match, 1),
        correction_rate=round(correction, 1),
        total_words=total,
        matched_words=matched,
        corrected_words=dictionary_corrections,
    )
