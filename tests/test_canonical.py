"""dedup_minhash_canonical keeper policy: longest text wins, ties to
the smallest doc_id; cluster sizes counted; singletons emit no row."""
from __future__ import annotations

import pyarrow as pa

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)

DOCS = [
    (1, BASE),                                  # near-dup of 2, shorter
    (2, BASE + " phi chi psi"),                 # longest of cluster {1,2}
    (7, "one two three four five six seven eight nine ten " * 3),
    (9, "one two three four five six seven eight nine ten " * 3),
    (42, "completely different text about nothing shared here with anyone"),
]


def test_canonical_longest_wins_ties_min_id(ray_session):
    import ray.data as rd

    from ocr_ray.ops.dedup import dedup_minhash_canonical

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )
    out = dedup_minhash_canonical(docs, threshold=0.5).to_pandas()
    got = {
        int(r.component): (
            int(r.canonical_doc),
            int(r.canonical_chars),
            int(r.cluster_size),
        )
        for r in out.itertuples()
    }
    # cluster {1,2}: doc 2 is longer → canonical despite larger id
    assert got[1] == (2, len(DOCS[1][1]), 2)
    # cluster {7,9}: equal lengths → tie to min id
    assert got[7] == (7, len(DOCS[2][1]), 2)
    # singleton 42 never enters the pair graph
    assert len(got) == 2
