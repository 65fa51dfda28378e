"""percentile_cont_by_type / pii_rate_by_source / cross_label_pairs."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_percentile_cont_matches_native_quantile_cont(ray_session):
    import duckdb
    import ray.data as rd

    from ocr_ray.ops.stats import percentile_cont_by_type

    rng = np.random.default_rng(17)
    n = 5000
    events = pa.table(
        {
            "event_type": pa.array(
                rng.choice(["a", "b", "c"], n).tolist(), pa.string()
            ),
            # signed, irregular doubles — the interpolation formula
            # (1-frac)*lo + frac*hi must match DuckDB bit-for-bit
            "value": pa.array(
                rng.standard_normal(n) * 1e4, pa.float64()
            ),
        }
    )
    got = (
        percentile_cont_by_type(rd.from_arrow(events).repartition(4))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", events)
    want = con.execute(
        "SELECT event_type, quantile_cont(value, 0.25) AS p25,"
        " quantile_cont(value, 0.5) AS p50,"
        " quantile_cont(value, 0.9) AS p90,"
        " quantile_cont(value, 0.99) AS p99"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ).df()
    for c in ["p25", "p50", "p90", "p99"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_pii_rate_by_source_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.redact import pii_rate_by_source

    docs = pa.table(
        {
            "source": pa.array(["s1", "s1", "s1", "s2"], pa.string()),
            "text": pa.array(
                [
                    "mail me at a.b@example.com or c@d.org",
                    "clean text only",
                    "see https://x.test/page now",
                    "nothing here",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        pii_rate_by_source(rd.from_arrow(docs))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_pii_docs"] == 2
    assert out.loc["s1", "n_emails"] == 2
    assert out.loc["s1", "n_urls"] == 1
    assert out.loc["s1", "rate_millionths"] == 2 * 1_000_000 // 3
    assert out.loc["s2", "n_pii_docs"] == 0
    assert out.loc["s2", "rate_millionths"] == 0


def test_cross_label_pairs_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import cross_label_pairs

    rng = np.random.default_rng(23)
    base = rng.standard_normal((6, 16))
    # vec 100 ≈ vec 0 but different label → must surface;
    # vec 101 ≈ vec 1 with the SAME label → must be filtered
    near0 = base[0] + 1e-5
    near1 = base[1] + 1e-5
    vecs = np.vstack([base, near0, near1])
    ids = np.array([0, 1, 2, 3, 4, 5, 100, 101], np.int64)
    labels = np.array([10, 20, 30, 40, 50, 60, 99, 20], np.int64)
    emb = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row for row in vecs], pa.list_(pa.float64())
            ),
            "label": pa.array(labels, pa.int64()),
        }
    )
    out = cross_label_pairs(
        rd.from_arrow(emb), threshold=0.999
    ).to_pandas()
    pairs = set(zip(out.vec_a, out.vec_b))
    assert (0, 100) in pairs
    assert (1, 101) not in pairs
    row = out[(out.vec_a == 0) & (out.vec_b == 100)].iloc[0]
    assert row.label_a == 10 and row.label_b == 99
    assert row.cosine > 0.999
