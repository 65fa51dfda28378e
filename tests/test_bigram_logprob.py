"""bigram_logprob vs a hand-computed conditional quantized-log oracle."""
from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow as pa

_WORDS = re.compile(r"[a-zA-Z]{3,}")


def _brute(texts):
    pairs_per_doc = []
    cpair: Counter = Counter()
    cctx: Counter = Counter()
    for t in texts:
        ws = _WORDS.findall(t.lower())
        ps = list(zip(ws, ws[1:]))
        pairs_per_doc.append(ps)
        cpair.update(ps)
        cctx.update(p[0] for p in ps)
    out = {}
    for doc_id, ps in enumerate(pairs_per_doc):
        if not ps:
            continue
        q = sum(
            math.floor(math.log(cpair[p] / cctx[p[0]]) * 1_000_000)
            for p in ps
        )
        out[doc_id] = (len(ps), q, float(q) / float(len(ps)) / 1_000_000.0)
    return out


def test_bigram_logprob(ray_session):
    import ray.data as rd

    from ocr_ray.ops.lm import bigram_logprob

    texts = [
        "the quick brown fox the quick red fox",
        "the quick brown dog sleeps",
        "xx yy",            # no >=3-letter bigram -> no row
        "lonely",           # single word -> no row
        "brown fox brown fox brown fox",  # repeated pair multiplicity
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
        int(r.doc_id): (
            int(r.n_bigrams), int(r.qlogprob), float(r.avg_logprob)
        )
        for r in bigram_logprob(docs).to_pandas().itertuples()
    }
    want = _brute(texts)
    assert set(got) == set(want) == {0, 1, 4}
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1]
        assert abs(got[d][2] - want[d][2]) < 1e-15
