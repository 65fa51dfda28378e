"""Wide-corpus golden generation: run ~200 synthesized noisy texts (the
engine's own corpus generator, so they exercise the correction tables,
currency/date strings, old spelling and random unknown words) through
the REFERENCE kernels under the deterministic rapidfuzz shim, and pin
the full repair chain output (dictionary → currency → spelling + counts).

Complements tests/goldens/kernels.json (handpicked cases) with breadth:
any divergence between ocr_ray.kernels and the reference on this corpus
fails tests/test_kernels_wide.py.

Run once: python scripts/gen_goldens_wide.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import types

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        best = 0
        for j, cb in enumerate(b):
            if ca == cb:
                best = prev[j] + 1
            elif prev[j + 1] > best:
                best = prev[j + 1]
            cur.append(best)
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str, **_kw) -> float:
    total = len(a) + len(b)
    return 100.0 if total == 0 else 200.0 * _lcs_len(a, b) / total


def _extract_one(query, choices, scorer=_ratio, score_cutoff=0, **_kw):
    best, best_score = None, -1.0
    for cand in sorted(choices):
        s = scorer(query, cand)
        if s >= score_cutoff and s > best_score:
            best, best_score = cand, s
    return None if best is None else (best, best_score, 0)


fake = types.ModuleType("rapidfuzz")
fake.fuzz = types.SimpleNamespace(ratio=_ratio)
fake.process = types.SimpleNamespace(extractOne=_extract_one)
sys.modules["rapidfuzz"] = fake
sys.path.insert(0, "/root/reference")

from app.services import dictionary_corrector as ref_dc  # noqa: E402
from app.services import spelling_normalizer as ref_sn  # noqa: E402

from ocr_ray.synth import _rng, text_payload  # noqa: E402


def main() -> None:
    cases = []
    for i in range(200):
        text = text_payload(_rng("wide-golden", i))
        corrected, n = ref_dc.correct_with_stats(text)
        currency = ref_dc.normalize_currency_and_numbers(corrected)
        _, normalized, spelling_changes = ref_sn.normalize_with_comparison(currency)
        cases.append(
            {
                "input": text,
                "corrected": corrected,
                "count": n,
                "currency": currency,
                "normalized": normalized,
                "spelling_changes": spelling_changes,
            }
        )

    dest = ROOT / "tests" / "goldens" / "kernels_wide.json"
    dest.write_text(json.dumps(cases, ensure_ascii=False))
    print(f"wrote {dest}: {len(cases)} cases")


if __name__ == "__main__":
    main()
