"""sorted_neighborhood_pairs vs a brute ROW_NUMBER self-join, with keys
spread across many range buckets (cross-bucket carry), heavy key ties
(in-bucket runs), and tiny buckets smaller than the window."""
from __future__ import annotations

import re

import pyarrow as pa


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _brute(texts, window=3, key_chars=24):
    keyed = sorted(
        (( _norm(t)[:key_chars], i) for i, t in enumerate(texts)),
    )
    pairs = set()
    for a in range(len(keyed)):
        for b in range(a + 1, min(a + window, len(keyed) - 1) + 1):
            pairs.add((keyed[a][1], keyed[b][1]))
    return pairs


def test_sorted_neighborhood(ray_session):
    import ray.data as rd

    from ocr_ray.ops.dedup import sorted_neighborhood_pairs

    texts = [
        "alpha beta gamma one",
        "alpha beta gamma two",     # key tie on the 24-char prefix? no:
        "alpha beta gamma one",     # exact tie with doc 0
        "  Alpha   BETA gamma one", # normalizes to the same key as doc 0
        "zulu omega",
        "zulu omega prime",
        "mike november",
        "mike november again",
        "qq",                       # short key, tiny bucket
        "rr",                       # tiny bucket, adjacent in order
        "ss",                       # three consecutive tiny buckets
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = sorted_neighborhood_pairs(docs, window=3).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples()}
    want = _brute(texts, window=3)
    assert got == want
    assert len(out) == len(want)  # no duplicate pair rows
    # the tiny single-doc buckets must pair through the carry walk
    assert any(a in (8, 9, 10) or b in (8, 9, 10) for a, b in got)


def test_sorted_neighborhood_identical_corpus(ray_session):
    """Adversarial skew: every doc shares one normalization key, so the
    whole corpus lands in ONE bucket run. Pair volume must stay n*window
    (never quadratic) and the wall must stay bounded."""
    import time

    import ray.data as rd

    from ocr_ray.ops.dedup import sorted_neighborhood_pairs

    n, w = 20_000, 3
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["same text for every doc"] * n),
            }
        )
    )
    t0 = time.perf_counter()
    out = sorted_neighborhood_pairs(docs, window=w)
    n_pairs = out.count()
    wall = time.perf_counter() - t0
    # rank-window pairs over one giant tie run: n*w - w*(w+1)/2
    assert n_pairs == n * w - w * (w + 1) // 2
    assert wall < 120  # bounded: linear pair volume, no quadratic blowup
