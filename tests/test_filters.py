"""Gopher rule-set flags and DSIR importance weights (ops/filters.py)."""
from __future__ import annotations

import math

import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs far "
    "away to find more of that good food for the winter season while "
    "birds sing in tall trees near quiet rivers and children play games "
    "outside until the evening light fades away into calm night skies"
)  # ≥50 words, sane ratios, ≥2 stopwords


def test_gopher_rules_fire_individually(ray_session):
    from ocr_ray.ops.filters import gopher_quality_flags

    docs = {
        "good": GOOD,
        "short": "too few words here",                      # f_wc (+f_stop)
        "longwords": " ".join(["pneumonoultramicroscopic"] * 60),  # f_mwl, f_stop
        "symbols": GOOD + " " + "# " * 60,                  # f_sym
        "bullets": "\n".join(["- item"] * 10),              # f_bullet (+others)
        "ellipses": "\n".join([GOOD, "trailing...", "more...", "also..."]),
        "numeric": GOOD + " " + "123 456 " * 200,           # f_alpha
    }
    t = pa.table(
        {
            "lang": pa.array(list(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    out = gopher_quality_flags(_ds(t)).to_pandas().set_index("lang")
    assert out.loc["good", "n_pass"] == 1
    assert out.loc["short", "f_wc"] == 1
    assert out.loc["longwords", "f_mwl"] == 1
    assert out.loc["symbols", "f_sym"] == 1
    assert out.loc["bullets", "f_bullet"] == 1
    assert out.loc["ellipses", "f_ellipsis"] == 1
    assert out.loc["numeric", "f_alpha"] == 1
    assert out.loc["longwords", "f_stop"] == 1
    assert int(out["n_docs"].sum()) == len(docs)


def test_gopher_rollup_groups_by_lang_source(ray_session):
    from ocr_ray.ops.filters import gopher_quality_flags

    t = pa.table(
        {
            "lang": pa.array(["en", "en", "de"], pa.string()),
            "source": pa.array(["a", "b", "a"], pa.string()),
            "text": pa.array([GOOD, GOOD, GOOD], pa.string()),
        }
    )
    out = gopher_quality_flags(_ds(t)).to_pandas()
    assert len(out) == 3 and out["n_pass"].sum() == 3


def test_dsir_weights_favor_target_distribution(ray_session):
    from ocr_ray.ops.filters import dsir_weights

    # target slice (en) is all 'th'-bucket words; the off-target slice
    # is all 'zq'-ish words — an unseen-by-target doc must weigh less
    en = "the this that those them they then there " * 8
    zz = "zzap zzoom zzig zzag zzen zzut zzar zzet " * 8
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en", "xx", "xx"], pa.string()),
            "text": pa.array([en, zz, en], pa.string()),
        }
    )
    out = dsir_weights(_ds(t)).to_pandas().set_index("doc_id")
    # doc 3 has the target's feature profile, doc 2 the opposite
    assert out.loc[3, "weight_micro"] > out.loc[2, "weight_micro"]
    assert out.loc[1, "weight_micro"] == out.loc[3, "weight_micro"]


def test_dsir_weight_matches_hand_computation(ray_session):
    from ocr_ray.ops.filters import dsir_weights

    # two docs, one word each: buckets th (target) and ab (not)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["en", "xx"], pa.string()),
            "text": pa.array(["the", "abba"], pa.string()),
        }
    )
    out = dsir_weights(_ds(t)).to_pandas().set_index("doc_id")
    k = 676.0
    raw_tot, tgt_tot = 2, 1

    def lr(tgt_n, raw_n):
        return int(
            math.floor(
                1_000_000.0
                * math.log(
                    ((tgt_n + 1.0) * (raw_tot + k))
                    / ((raw_n + 1.0) * (tgt_tot + k))
                )
                + 0.5
            )
        )

    assert out.loc[1, "weight_micro"] == lr(1, 1)
    assert out.loc[2, "weight_micro"] == lr(0, 1)
    assert out.loc[1, "n_feat"] == 1


def test_dsir_no_features_no_row(ray_session):
    from ocr_ray.ops.filters import dsir_weights

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["en", "en"], pa.string()),
            "text": pa.array(["the words here", "123 456 !!"], pa.string()),
        }
    )
    out = dsir_weights(_ds(t)).to_pandas()
    assert list(out["doc_id"]) == [1]


def test_dsir_multi_block_counts_merge(ray_session):
    """Bucket statistics must merge across blocks before scoring."""
    import ray.data as rd

    from ocr_ray.ops.filters import dsir_weights

    blocks = [
        pa.table(
            {
                "doc_id": pa.array([i * 2, i * 2 + 1], pa.int64()),
                "lang": pa.array(["en", "xx"], pa.string()),
                "text": pa.array(["the thin thing", "zzap zzoom"], pa.string()),
            }
        )
        for i in range(5)
    ]
    out = dsir_weights(rd.from_arrow(blocks)).to_pandas()
    assert len(out) == 10
    en = out[out["doc_id"] % 2 == 0]["weight_micro"].unique()
    xx = out[out["doc_id"] % 2 == 1]["weight_micro"].unique()
    # identical texts → identical weights regardless of block placement
    assert len(en) == 1 and len(xx) == 1
    assert en[0] > xx[0]


def test_dsir_clip_ess_monotone(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.ops.filters import dsir_clip_ess

    docs = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "lang": pa.array(
                ["en", "en", "en", "id", "id", "id", "en", "id"],
                pa.string(),
            ),
            "text": pa.array(
                [
                    "the quick brown fox", "the lazy dog sleeps",
                    "stream of tables", "yang dan di ke",
                    "dari untuk dengan", "pada ini itu",
                    "hash join filter scan", "adalah tidak akan",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        dsir_clip_ess(rd.from_arrow(docs))
        .to_pandas()
        .sort_values("clip_micro")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # every clip scores all docs; ESS in (0, n]
    assert (out["n_docs"] == 8).all()
    assert ((out["ess"] > 0) & (out["ess"] <= 8)).all()
    # tighter clips can only concentrate less: ESS non-increasing as
    # the clip loosens is NOT guaranteed in general, but the hardest
    # clip (0: all positive weights flattened to <=1) must have ESS
    # at least as high as the loosest
    assert out["ess"].iloc[0] >= out["ess"].iloc[-1] - 1e-9
