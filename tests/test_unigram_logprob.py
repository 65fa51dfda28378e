"""unigram_logprob vs a hand-computed quantized-log oracle."""
from __future__ import annotations

import math
import re

import pyarrow as pa

_WORDS = re.compile(r"[a-zA-Z]{3,}")


def _brute(texts):
    from collections import Counter

    per_doc = [Counter(_WORDS.findall(t.lower())) for t in texts]
    corpus = Counter()
    for c in per_doc:
        corpus.update(c)
    total = sum(corpus.values())
    out = {}
    for doc_id, c in enumerate(per_doc):
        if not c:
            continue
        n_tok = sum(c.values())
        q = sum(
            tf * math.floor(math.log(corpus[w] / total) * 1_000_000)
            for w, tf in c.items()
        )
        out[doc_id] = (n_tok, q, float(q) / float(n_tok) / 1_000_000.0)
    return out


def test_unigram_logprob(ray_session):
    import ray.data as rd

    from ocr_ray.ops.tfidf import unigram_logprob

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the rare word appears",
        "zz a of",  # no >=3-letter token -> no output row
        "quick quick brown unique",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {
        int(r.doc_id): (int(r.n_tokens), int(r.qlogprob), float(r.avg_logprob))
        for r in unigram_logprob(docs).to_pandas().itertuples()
    }
    want = _brute(texts)
    assert set(got) == set(want) == {0, 1, 3}
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1]
        assert abs(got[d][2] - want[d][2]) < 1e-15


def test_unigram_logprob_empty(ray_session):
    import ray.data as rd

    from ocr_ray.ops.tfidf import unigram_logprob

    docs = rd.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        .empty_table()
    )
    assert unigram_logprob(docs).count() == 0
