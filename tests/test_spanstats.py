"""doc_span_profile / span_kind_stats vs a plain-Python oracle,
including empty span lists and null text fields."""
from __future__ import annotations

import pyarrow as pa

SPAN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def _table():
    docs = [
        ("d1", [("text", "hello", "", 0), ("image", None, "img:1", 1),
                ("text", "worlds", "", 2)]),
        ("d2", []),  # empty spans: contributes nothing
        ("d3", [("pdf", None, "pdf:9", 0), ("pdf", "ocr'd", "pdf:9", 1)]),
    ]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for k, t, m, o in spans
                    ]
                    for _, spans in docs
                ],
                pa.list_(SPAN_T),
            ),
        }
    )


def test_profile_batch():
    from ocr_ray.ops.spanstats import _profile_batch

    rows = sorted(
        _profile_batch(_table()).to_pylist(),
        key=lambda r: (r["doc_id"], r["kind"]),
    )
    assert rows == [
        {"doc_id": "d1", "kind": "image", "n_spans": 1, "sum_chars": 0},
        {"doc_id": "d1", "kind": "text", "n_spans": 2, "sum_chars": 11},
        {"doc_id": "d3", "kind": "pdf", "n_spans": 2, "sum_chars": 5},
    ]


def test_profile_empty_batch():
    from ocr_ray.ops.spanstats import _profile_batch

    out = _profile_batch(_table().slice(1, 1))  # only the empty-span doc
    assert out.num_rows == 0


def test_kind_stats_dataset(ray_session):
    import ray.data as rd

    from ocr_ray.ops.spanstats import span_kind_stats

    out = span_kind_stats(rd.from_arrow(_table())).to_pandas()
    got = {
        r.kind: (int(r.n_spans), int(r.n_docs), int(r.sum_chars))
        for r in out.itertuples()
    }
    assert got == {
        "image": (1, 1, 0),
        "pdf": (2, 1, 5),
        "text": (2, 1, 11),
    }
