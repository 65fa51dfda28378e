"""char_diversity vs a plain-Python Counter oracle, incl. multibyte
codepoints and the empty-doc exclusion rule."""
from __future__ import annotations

from collections import Counter

import pyarrow as pa

DOCS = [
    (1, "aabbbc"),
    (2, ""),            # excluded: emits no row
    (3, "héé😀😀😀"),   # multibyte codepoints counted as single chars
    (4, "zzzzzz"),
    (5, "the quick brown fox"),
]


def _expected():
    rows = []
    for doc_id, text in DOCS:
        if not text:
            continue
        c = Counter(text)
        rows.append(
            {
                "doc_id": doc_id,
                "n_chars": len(text),
                "n_distinct": len(c),
                "sum_sq": sum(v * v for v in c.values()),
            }
        )
    return rows


def test_char_diversity_batch_matches_counter():
    from ocr_ray.ops.textstats import char_diversity_batch

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )
    got = char_diversity_batch(t).to_pylist()
    assert got == _expected()


def test_char_diversity_all_empty_batch():
    from ocr_ray.ops.textstats import char_diversity_batch

    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["", ""], pa.string()),
        }
    )
    out = char_diversity_batch(t)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "n_chars", "n_distinct", "sum_sq"]


def test_char_diversity_dataset(ray_session):
    import ray.data as rd

    from ocr_ray.ops.textstats import char_diversity

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )
    got = char_diversity(rd.from_arrow(t)).to_pandas().to_dict("records")
    assert got == _expected()
