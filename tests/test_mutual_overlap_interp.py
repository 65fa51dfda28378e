"""Unit tests for mutual_nn_pairs, cross_source_overlap_matrix and
daily_linear_interp — hand-computed expectations on tiny inputs."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400 * 1_000_000


def test_mutual_nn_pairs_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import mutual_nn_pairs

    # angles 0, 10, 25 degrees: nn(0)=1, nn(1)=0 (10 < 15), nn(2)=1
    # -> only (0, 1) is mutual
    angs = np.deg2rad([0.0, 10.0, 25.0])
    vecs = np.stack([np.cos(angs), np.sin(angs)], axis=1)
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [list(v) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
    out = mutual_nn_pairs(rd.from_arrow(emb)).to_pandas()
    assert len(out) == 1
    assert out["vec_id_a"].tolist() == [0]
    assert out["vec_id_b"].tolist() == [1]
    assert abs(out["sim"][0] - np.cos(np.deg2rad(10.0))) < 1e-6


def test_mutual_nn_pairs_two_clusters(ray_session):
    import ray.data as rd

    from ocr_ray.ops.similarity import mutual_nn_pairs

    angs = np.deg2rad([0.0, 5.0, 90.0, 95.0])
    vecs = np.stack([np.cos(angs), np.sin(angs)], axis=1)
    emb = pa.table(
        {
            "vec_id": pa.array([10, 11, 20, 21], pa.int64()),
            "embedding": pa.array(
                [list(v) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )
    out = (
        mutual_nn_pairs(rd.from_arrow(emb))
        .to_pandas()
        .sort_values("vec_id_a")
        .reset_index(drop=True)
    )
    assert out["vec_id_a"].tolist() == [10, 20]
    assert out["vec_id_b"].tolist() == [11, 21]


def test_cross_source_overlap_matrix(ray_session):
    import ray.data as rd

    from ocr_ray.ops.textstats import (
        cross_source_overlap_matrix,
        winnow_fingerprints,
    )

    phrase = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different material with no shared phrasing at all ok"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([phrase, phrase, other], pa.string()),
            "source": pa.array(["A", "B", "C"], pa.string()),
        }
    )
    out = (
        cross_source_overlap_matrix(rd.from_arrow(docs))
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    n_fps = len(set(winnow_fingerprints(phrase)))
    assert out["source_a"].tolist() == ["A"]
    assert out["source_b"].tolist() == ["B"]
    assert out["n_cooccurrences"].tolist() == [n_fps]


def test_daily_linear_interp_hand(ray_session):
    import ray.data as rd

    from ocr_ray.ops.resample import daily_linear_interp

    # type X observed on days 0 and 3: 10.00 and 40.00 dollars
    events = pa.table(
        {
            "ts": pa.array([0, 3 * DAY_US], pa.timestamp("us")),
            "event_type": pa.array(["X", "X"], pa.string()),
            "value": pa.array([10.0, 40.0], pa.float64()),
        }
    )
    out = (
        daily_linear_interp(rd.from_arrow(events))
        .to_pandas()
        .sort_values("day_idx")
        .reset_index(drop=True)
    )
    assert out["day_idx"].tolist() == [0, 1, 2, 3]
    assert out["observed"].tolist() == [1, 0, 0, 1]
    assert out["interp_milli_cents"].tolist() == [
        1_000_000,
        2_000_000,
        3_000_000,
        4_000_000,
    ]


def test_daily_linear_interp_single_day(ray_session):
    import ray.data as rd

    from ocr_ray.ops.resample import daily_linear_interp

    events = pa.table(
        {
            "ts": pa.array([5 * DAY_US], pa.timestamp("us")),
            "event_type": pa.array(["X"], pa.string()),
            "value": pa.array([2.5], pa.float64()),
        }
    )
    out = daily_linear_interp(rd.from_arrow(events)).to_pandas()
    assert out["day_idx"].tolist() == [5]
    assert out["observed"].tolist() == [1]
    assert out["interp_milli_cents"].tolist() == [250_000]


def test_daily_linear_interp_negative_values_match_duckdb(ray_session):
    """ADVICE r03: negative daily sums used to floor (Python //) in the
    engine while DuckDB truncates toward zero — the +K offset makes
    both sides compute the same floor. Events with negative values
    (refunds) across a gap day exercise the case."""
    import duckdb
    import ray.data as rd

    from ocr_ray.ops.resample import daily_linear_interp, daily_linear_interp_sql

    base = np.datetime64("2024-01-01T12:00:00", "us")
    ts = [base, base + np.timedelta64(2, "D")]
    t = pa.table(
        {
            "event_type": pa.array(["refund", "refund"], pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array([-10.01, -0.50], pa.float64()),
        }
    )
    got = (
        daily_linear_interp(rd.from_arrow(t))
        .to_pandas()
        .sort_values("day_idx")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(daily_linear_interp_sql())
        .df()
        .sort_values("day_idx")
        .reset_index(drop=True)
    )
    assert list(got.interp_milli_cents) == list(want.interp_milli_cents)
    # the midpoint of -1001 and -50 cents floors to -526 milli*...:
    # (-1001 + -50) / 2 = -525.5 cents -> floor at milli-cent precision
    mid = got[got.observed == 0].interp_milli_cents.iloc[0]
    assert mid == (-1001 * 1000 + -50 * 1000) // 2


def test_mutual_nn_blocked_matches_exact(ray_session):
    """Plan-equivalence pin (VERDICT r04 #1): the blocked IVF top-1
    path equals the exact broadcast path — on a random corpus with the
    default nprobe=None (exact by construction), and on well-separated
    clusters even with nprobe=1 (the subquadratic config)."""
    import ray.data as rd

    from ocr_ray.ops.similarity import mutual_nn_pairs

    rng = np.random.RandomState(7)
    # 3 well-separated clusters in 8-d
    centers = np.eye(3, 8) * 10.0
    vecs = np.concatenate(
        [c + rng.standard_normal((20, 8)) * 0.05 for c in centers]
    )
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [list(v) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["vec_id_a", "vec_id_b"])
            .reset_index(drop=True)
        )

    exact = canon(mutual_nn_pairs(rd.from_arrow(emb), mode="exact"))
    assert len(exact) > 0
    blocked_all = canon(mutual_nn_pairs(rd.from_arrow(emb)))
    blocked_sub = canon(
        mutual_nn_pairs(
            rd.from_arrow(emb), n_clusters=3, nprobe=1, sample_size=64
        )
    )
    for got in (blocked_all, blocked_sub):
        assert got["vec_id_a"].tolist() == exact["vec_id_a"].tolist()
        assert got["vec_id_b"].tolist() == exact["vec_id_b"].tolist()
        np.testing.assert_allclose(got["sim"], exact["sim"], atol=1e-9)


def test_mutual_nn_blocked_random_default_exact(ray_session):
    """Default nprobe=None probes every cluster: identical to exact on
    an unstructured random corpus (no cluster separation to lean on)."""
    import ray.data as rd

    from ocr_ray.ops.similarity import mutual_nn_pairs

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((60, 16))
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64) * 3 + 1),
            "embedding": pa.array(
                [list(v) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["vec_id_a", "vec_id_b"])
            .reset_index(drop=True)
        )

    exact = canon(mutual_nn_pairs(rd.from_arrow(emb), mode="exact"))
    blocked = canon(mutual_nn_pairs(rd.from_arrow(emb), n_clusters=8))
    assert blocked["vec_id_a"].tolist() == exact["vec_id_a"].tolist()
    assert blocked["vec_id_b"].tolist() == exact["vec_id_b"].tolist()
    np.testing.assert_allclose(blocked["sim"], exact["sim"], atol=1e-9)
