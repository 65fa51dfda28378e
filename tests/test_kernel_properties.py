"""Property-style invariants for the repair kernels (SURVEY.md §5:
case preservation, whitespace preservation, tokenizer invariants)."""
from __future__ import annotations

import re

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from ocr_ray.kernels import (
    correct_with_stats,
    normalize_currency_and_numbers,
    normalize_text,
)

_WS = re.compile(r"\s+")

# words that look like the corpus: letters with occasional case variety
word = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyzABCDE"), min_size=1, max_size=12
)
text_strategy = st.lists(word, min_size=0, max_size=15).map(" ".join)
mixed_strategy = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
                           max_codepoint=0x24F),
    max_size=120,
)


@settings(max_examples=120, deadline=None)
@given(text_strategy)
def test_whitespace_runs_preserved_by_dictionary(text):
    corrected, _ = correct_with_stats(text)
    assert _WS.findall(corrected) == _WS.findall(text)


@settings(max_examples=120, deadline=None)
@given(text_strategy)
def test_whitespace_runs_preserved_by_spelling(text):
    assert _WS.findall(normalize_text(text)) == _WS.findall(text)


@settings(max_examples=120, deadline=None)
@given(mixed_strategy)
def test_kernels_total_no_crash(text):
    corrected, n = correct_with_stats(text)
    assert isinstance(corrected, str) and n >= 0
    assert isinstance(normalize_text(text), str)
    assert isinstance(normalize_currency_and_numbers(text), str)


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_idempotent_spelling(text):
    # The reference's normalizer is single-pass (byte parity is the
    # spec, pinned by goldens), so a rule whose output can recreate its
    # own left-hand side is legitimately NOT idempotent: 'ddj' → 'dj'
    # (leftover 'd' + dj→j output 'j') → 'j' on a second pass. Exclude
    # exactly that self-recreating shape; idempotency must hold
    # everywhere else.
    assume(not re.search(r"[dD]{2,}[jJ]", text))
    once = normalize_text(text)
    assert normalize_text(once) == once


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(["jelan", "JELAN", "Jelan", "kramet", "KRAMET", "Kramet"]))
def test_case_style_preserved(token):
    corrected, _ = correct_with_stats(token)
    if token.isupper():
        assert corrected.isupper()
    elif token[0].isupper():
        assert corrected[0].isupper()
    else:
        assert corrected.islower()
