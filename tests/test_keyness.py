"""keyness ops vs brute-force Python oracles: exact Mann-Whitney AUC
(ties/midranks), chi-square keyness term ranking, contingency
contributions, and BPE pair counts."""
from __future__ import annotations

import random
from collections import Counter

import pyarrow as pa
import pytest


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def _rand_docs(n=200, seed=7):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa", "sigma", "omega"]
    rows = []
    for i in range(n):
        src = rng.choice(["web", "books", "news"])
        lang = rng.choice(["en", "id"])
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        if src == "web":
            words += ["clickbait"] * rng.randint(0, 4)
        rows.append((i, " ".join(words), lang, src))
    return rows


def _brute_auc(pairs):
    """pairs: list of (value, is_pos). Probability a random positive
    outranks a random negative, ties at 0.5."""
    pos = [v for v, p in pairs if p]
    neg = [v for v, p in pairs if not p]
    if not pos or not neg:
        return 0.5
    s = 0.0
    for p in pos:
        for q in neg:
            s += 1.0 if p > q else (0.5 if p == q else 0.0)
    return s / (len(pos) * len(neg))


def test_length_auc_matches_brute_force(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import length_auc

    rows = _rand_docs()
    out = length_auc(rd.from_arrow(_docs_table(rows))).to_pylist()[0]
    pairs = [(len(r[1]), r[2] == "en") for r in rows]
    want = _brute_auc(pairs)
    assert out["n_pos"] == sum(1 for _, p in pairs if p)
    assert out["n_neg"] == sum(1 for _, p in pairs if not p)
    assert out["auc"] == pytest.approx(want, abs=1e-12)


def test_length_auc_single_class(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import length_auc

    rows = [(i, "x" * (i + 1), "en", "web") for i in range(5)]
    out = length_auc(rd.from_arrow(_docs_table(rows))).to_pylist()[0]
    assert out["auc"] == 0.5 and out["n_neg"] == 0


def _brute_keyness(rows, k=15, min_count=5):
    counts: Counter = Counter()
    import re

    word_re = re.compile(r"[a-zA-Z]{3,}")
    for _, text, _, src in rows:
        for w in word_re.findall(text.lower()):
            counts[(src, w)] += 1
    n_w: Counter = Counter()
    t_s: Counter = Counter()
    for (s, w), n in counts.items():
        n_w[w] += n
        t_s[s] += n
    big_n = sum(counts.values())
    scored = []
    for (s, w), a in counts.items():
        b = n_w[w] - a
        if a < min_count or a * (big_n - t_s[s]) <= b * t_s[s]:
            continue
        nf, af, bf = float(big_n), float(a), float(b)
        cf, df = float(t_s[s] - a), float(big_n - t_s[s] - b)
        diff = af * df - bf * cf
        chi2 = nf * diff * diff / (
            float(n_w[w]) * (nf - float(n_w[w]))
            * float(t_s[s]) * (nf - float(t_s[s]))
        )
        scored.append((s, w, a, b, chi2))
    out = []
    for s in {x[0] for x in scored}:
        grp = sorted((x for x in scored if x[0] == s),
                     key=lambda x: (-x[4], x[1]))[:k]
        for rank, x in enumerate(grp, 1):
            out.append((x[0], x[1], x[2], x[3], x[4], rank))
    return sorted(out)


def test_keyness_terms_matches_brute_force(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import keyness_terms

    rows = _rand_docs(n=300, seed=11)
    got = keyness_terms(rd.from_arrow(_docs_table(rows))).to_pandas()
    got_rows = sorted(
        (r.source, r.word, int(r.n), int(r.n_elsewhere), float(r.chi2),
         int(r.rank))
        for r in got.itertuples()
    )
    assert got_rows == _brute_keyness(rows)


def test_keyness_overrepresented_word_ranks_first(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import keyness_terms

    rows = _rand_docs(n=300, seed=11)
    got = keyness_terms(rd.from_arrow(_docs_table(rows))).to_pandas()
    web_top = got[(got.source == "web") & (got["rank"] == 1)].word.tolist()
    assert web_top == ["clickbait"]


def test_contingency_chi2(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import contingency_chi2

    rows = _rand_docs(n=120, seed=3)
    out = contingency_chi2(rd.from_arrow(_docs_table(rows))).to_pylist()
    cell: Counter = Counter((r[2], r[3]) for r in rows)
    rt: Counter = Counter(r[2] for r in rows)
    ct: Counter = Counter(r[3] for r in rows)
    n = len(rows)
    assert len(out) == len(cell)
    for r in out:
        key = (r["lang"], r["source"])
        assert r["n"] == cell[key]
        e = rt[r["lang"]] * ct[r["source"]] / n
        assert r["expected"] == pytest.approx(e, rel=1e-12)
        assert r["contrib"] == pytest.approx((cell[key] - e) ** 2 / e,
                                             rel=1e-12)
    # emitted in deterministic (lang, source) order
    assert [(r["lang"], r["source"]) for r in out] == sorted(
        (r["lang"], r["source"]) for r in out
    )


def test_bpe_merge_pairs_matches_counter(ray_session):
    import ray.data as rd
    import re

    from ocr_ray.ops.keyness import bpe_merge_pairs

    rows = _rand_docs(n=150, seed=5)
    got = bpe_merge_pairs(rd.from_arrow(_docs_table(rows)), k=1000)
    word_re = re.compile(r"[a-zA-Z]{3,}")
    want: Counter = Counter()
    for _, text, _, _ in rows:
        for w in word_re.findall(text.lower()):
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    got_pairs = {r["pair"]: r["n"] for r in got.to_pylist()}
    assert got_pairs == dict(want)
    # top-k boundary rule: n DESC then pair ASC
    lst = got.to_pylist()
    keys = [(-r["n"], r["pair"]) for r in lst]
    assert keys == sorted(keys)


def test_bpe_merge_pairs_empty(ray_session):
    import ray.data as rd

    from ocr_ray.ops.keyness import bpe_merge_pairs

    rows = [(1, "!!! ??", "en", "web")]
    got = bpe_merge_pairs(rd.from_arrow(_docs_table(rows)))
    assert got.num_rows == 0
