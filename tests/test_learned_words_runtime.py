"""Run-level learned-words dictionary extension (the reference's startup
merge): extending the kamus changes unknown-word extraction, scoring and
fuzzy targets, and is reversible."""
from __future__ import annotations

from ocr_ray import data
from ocr_ray.kernels import calculate_quality_score, correct_with_stats, get_unknown_words


def test_runtime_extra_words_extend_and_reset():
    novel = "zzqproprietary"
    try:
        assert novel in get_unknown_words(f"kata {novel} muncul")
        base_score = calculate_quality_score(novel).matched_words

        n = data.set_runtime_extra_words([novel, "  OtherWord  "])
        assert n == 2
        assert novel in data.kamus()
        assert "otherword" in data.kamus()
        # no longer unknown; scoring counts it matched
        assert novel not in get_unknown_words(f"kata {novel} muncul")
        assert calculate_quality_score(novel).matched_words == base_score + 1
        # fuzzy can now target the learned word
        corrected, count = correct_with_stats("zzqproprietarx")
        assert corrected == novel and count == 1
    finally:
        data.set_runtime_extra_words(())
        assert novel not in data.kamus()
        assert novel in get_unknown_words(f"kata {novel} muncul")
