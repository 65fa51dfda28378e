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


@functools.lru_cache(maxsize=None)
def _load(name: str) -> dict:
    return json.loads((_HERE / name).read_text())


@functools.lru_cache(maxsize=None)
def kamus() -> frozenset[str]:
    """Effective dictionary: KAMUS_DOKUMEN ∪ NAMA_INDONESIA (585 words)."""
    return frozenset(_load("kamus.json")["kamus"])


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
