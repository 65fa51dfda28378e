"""Frozen correction/dictionary tables.

Pure data extracted from the reference's module-level literals (see
scripts/extract_tables.py for provenance; reference:
app/services/dictionary_corrector.py:28-1129,
app/services/spelling_normalizer.py:16-51). Loaded once per process and
shared by every worker; the run dictionary is FROZEN for determinism
(the reference mutates it mid-stream via auto-learn — deliberately not
replicated, see SURVEY.md §7.3 item 6).
"""
from __future__ import annotations

import functools
import json
import pathlib

_HERE = pathlib.Path(__file__).resolve().parent

# run-level dictionary extension (approved learned words) — the batch
# analogue of the reference's startup merge (load_learned_words,
# dictionary_corrector.py:199-214 called from main.py:147-153): applied
# ONCE before a run (each actor's __init__), then frozen for determinism.
_EXTRA_WORDS: frozenset[str] = frozenset()


def set_runtime_extra_words(words) -> int:
    """Extend the kamus for this process/run. Returns the extension size.
    Clears every cache derived from the kamus (sorted order, fuzzy
    pruning index, match cache) so the change is consistent."""
    global _EXTRA_WORDS
    _EXTRA_WORDS = frozenset(str(w).lower().strip() for w in words if w)
    kamus.cache_clear()
    kamus_sorted.cache_clear()
    try:
        from ocr_ray.kernels import fuzzy

        fuzzy.best_dictionary_match.cache_clear()
        fuzzy._kamus_char_index.cache_clear()
    except ImportError:  # pragma: no cover
        pass
    try:
        from ocr_ray.kernels import dictionary

        dictionary.correct_word.cache_clear()
    except ImportError:  # pragma: no cover
        pass
    return len(_EXTRA_WORDS)


@functools.lru_cache(maxsize=None)
def _load(name: str) -> dict:
    return json.loads((_HERE / name).read_text())


@functools.lru_cache(maxsize=None)
def kamus() -> frozenset[str]:
    """Effective dictionary: KAMUS_DOKUMEN ∪ NAMA_INDONESIA (585 words)
    ∪ any run-level learned-words extension."""
    return frozenset(_load("kamus.json")["kamus"]) | _EXTRA_WORDS


@functools.lru_cache(maxsize=None)
def kamus_sorted() -> tuple[str, ...]:
    """Dictionary in sorted order — the deterministic candidate order for
    fuzzy matching (replaces the reference's nondeterministic set
    iteration, frozen as spec; SURVEY.md §7.3 item 2)."""
    return tuple(sorted(kamus()))


@functools.lru_cache(maxsize=None)
def phrase_corrections() -> dict[str, str]:
    """Single-token exact fixes (reference PHRASE_CORRECTIONS, 324 pairs)."""
    return _load("corrections.json")["phrase"]


@functools.lru_cache(maxsize=None)
def multi_word_corrections() -> dict[str, str]:
    """Multi-word phrase fixes (reference MULTI_WORD_CORRECTIONS, 277 pairs)."""
    return _load("corrections.json")["multi_word"]


@functools.lru_cache(maxsize=None)
def kata_asing() -> frozenset[str]:
    """Foreign-word whitelist protected from spelling normalization."""
    return frozenset(_load("spelling.json")["kata_asing"])


@functools.lru_cache(maxsize=None)
def rules_ejaan() -> tuple[tuple[str, str], ...]:
    """Ordered digraph rules oe→u, dj→j, tj→c, nj→ny, sj→sy, ch→kh."""
    return tuple((a, b) for a, b in _load("spelling.json")["rules_ejaan"])


@functools.lru_cache(maxsize=None)
def j_ke_y() -> dict[str, str]:
    """Special whole-word j→y map (jang→yang, …)."""
    return _load("spelling.json")["j_ke_y"]
