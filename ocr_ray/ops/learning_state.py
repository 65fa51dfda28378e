"""Learned-words state table: persistence, merge semantics, export/import.

The reference accumulates unknown-word counts in SQLite with auto-approve
at frequency ≥ 5 (learning_service.py:49-107) and an admin JSON
export/import API with merge / replace / approved_only modes, a 10k-word
cap and word validation (learning.py:184-369). This module re-expresses
that as a small Parquet state table — schema
``(word:string, frequency:int64, is_approved:bool)`` — merged with new
corpus counts via pure Arrow ops (the state is tiny; the corpus-side
count is the distributed part, ops/analysis.unknown_word_counts).

Frozen-semantics notes:
- corpus merge ADDS frequencies (the reference increments per request,
  learning_service.py:74-99);
- import merge takes MAX(frequency) and approves if either side is
  approved (learning.py:313-327 — yes, the two paths differ; both kept);
- auto-approve applies after merge at FREQUENCY_THRESHOLD.
"""
from __future__ import annotations

import json
import pathlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.ops.analysis import FREQUENCY_THRESHOLD

STATE_SCHEMA = pa.schema(
    [
        ("word", pa.string()),
        ("frequency", pa.int64()),
        ("is_approved", pa.bool_()),
    ]
)

# import validation: 2-50 chars, letters/dash/apostrophe (learning.py docstring
# "Words must be 2-50 characters; only letters, dash and apostrophe")
_VALID_IMPORT = re.compile(r"^[a-zA-Z\-']{2,50}$")
MAX_IMPORT_WORDS = 10_000


def empty_state() -> pa.Table:
    return STATE_SCHEMA.empty_table()


def load_state(path: str) -> pa.Table:
    p = pathlib.Path(path)
    if not p.exists():
        return empty_state()
    return pq.read_table(p)


def save_state(state: pa.Table, path: str) -> str:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(state.sort_by("word"), p)
    return str(p)


def _group_sum(table: pa.Table) -> pa.Table:
    grouped = table.group_by("word").aggregate(
        [("frequency", "sum"), ("is_approved", "max")]
    )
    return pa.table(
        {
            "word": grouped.column("word"),
            "frequency": grouped.column("frequency_sum"),
            "is_approved": grouped.column("is_approved_max"),
        }
    )


def _apply_auto_approve(state: pa.Table) -> pa.Table:
    approved = pc.or_(
        state.column("is_approved"),
        pc.greater_equal(state.column("frequency"), FREQUENCY_THRESHOLD),
    )
    return state.set_column(
        state.schema.get_field_index("is_approved"), "is_approved", approved
    )


def merge_counts(state: pa.Table, counts: pa.Table) -> pa.Table:
    """Fold corpus counts (word, frequency) into the state: frequencies
    ADD, then auto-approve at the threshold (track_unknown_words
    semantics)."""
    counts_typed = pa.table(
        {
            "word": pc.cast(counts.column("word"), pa.string()),
            "frequency": pc.cast(counts.column("frequency"), pa.int64()),
            "is_approved": pa.array([False] * counts.num_rows, pa.bool_()),
        }
    )
    merged = _group_sum(pa.concat_tables([state.cast(STATE_SCHEMA), counts_typed]))
    return _apply_auto_approve(merged).sort_by("word")


def import_words(
    state: pa.Table, entries: list[dict], mode: str = "merge"
) -> tuple[pa.Table, dict]:
    """JSON import with the reference's modes. ``entries`` rows:
    {"word", "frequency", "is_approved"}. Returns (new_state, stats)."""
    if mode not in ("merge", "replace", "approved_only"):
        raise ValueError(f"unknown import mode {mode!r}")
    if len(entries) > MAX_IMPORT_WORDS:
        raise ValueError(f"import capped at {MAX_IMPORT_WORDS} words")

    imported, skipped, rejected = 0, 0, 0
    rows = []
    for e in entries:
        word = str(e.get("word", "")).lower().strip()
        if not _VALID_IMPORT.match(word):
            rejected += 1
            continue
        approved = bool(e.get("is_approved", False))
        if mode == "approved_only" and not approved:
            skipped += 1
            continue
        rows.append(
            {
                "word": word,
                "frequency": int(e.get("frequency", 1)),
                "is_approved": approved,
            }
        )
        imported += 1

    incoming = (
        pa.Table.from_pylist(rows, schema=STATE_SCHEMA) if rows else empty_state()
    )
    if mode == "replace":
        new_state = incoming
    else:
        # keyed outer-merge: MAX(frequency), approve-if-either
        both = pa.concat_tables([state.cast(STATE_SCHEMA), incoming])
        grouped = both.group_by("word").aggregate(
            [("frequency", "max"), ("is_approved", "max")]
        )
        new_state = pa.table(
            {
                "word": grouped.column("word"),
                "frequency": grouped.column("frequency_max"),
                "is_approved": grouped.column("is_approved_max"),
            }
        )
    return new_state.sort_by("word"), {
        "imported": imported,
        "skipped": skipped,
        "rejected": rejected,
    }


def export_words(state: pa.Table, approved_only: bool = False) -> list[dict]:
    """JSON export (learning.py:184-248): rows sorted by word."""
    table = state
    if approved_only:
        table = table.filter(pc.equal(table.column("is_approved"), True))
    return table.sort_by("word").to_pylist()


def export_json(state: pa.Table, path: str, approved_only: bool = False) -> str:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps({"words": export_words(state, approved_only)}, indent=1))
    return str(p)


def import_json(state: pa.Table, path: str, mode: str = "merge") -> tuple[pa.Table, dict]:
    payload = json.loads(pathlib.Path(path).read_text())
    return import_words(state, payload.get("words", []), mode)
