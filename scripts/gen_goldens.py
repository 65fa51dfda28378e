"""Generate golden kernel fixtures by running the REFERENCE's own kernels.

The reference's fuzzy path needs rapidfuzz (absent here) and is
nondeterministic over set iteration; we inject a deterministic fake
rapidfuzz that (a) implements fuzz.ratio as normalized InDel similarity
(the real formula) and (b) iterates candidates in sorted order — exactly
the tie-break spec frozen into ocr_ray.kernels.fuzzy. With that shim the
reference and the engine must agree byte-for-byte; the goldens pin it.

Run once: python scripts/gen_goldens.py  → tests/goldens/kernels.json
"""
from __future__ import annotations

import json
import pathlib
import sys
import types

# ---- deterministic fake rapidfuzz -----------------------------------------


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
    if total == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / total


def _extract_one(query, choices, scorer=_ratio, score_cutoff=0, **_kw):
    best, best_score = None, -1.0
    for cand in sorted(choices):
        s = scorer(query, cand)
        if s >= score_cutoff and s > best_score:
            best, best_score = cand, s
    if best is None:
        return None
    return best, best_score, 0


fake = types.ModuleType("rapidfuzz")
fake.fuzz = types.SimpleNamespace(ratio=_ratio)
fake.process = types.SimpleNamespace(extractOne=_extract_one)
sys.modules["rapidfuzz"] = fake

sys.path.insert(0, "/root/reference")

from app.services import dictionary_corrector as ref_dc  # noqa: E402
from app.services import spelling_normalizer as ref_sn  # noqa: E402
from app.services import scoring_service as ref_sc  # noqa: E402

CASES_DICT = [
    # the reference's own smoke block (dictionary_corrector.py:1429-1443)
    "DEPARTNN PCAAI DAN TENAGA",
    "Jelan Kramet 63 Jakrta",
    "Rumah tersebut dibawah ini",
    "Gaji pokok Rp. 277",
    "Nomoa 2078",
    # FIXTURES.md F2 extras
    "11Septenbor 1962",
    "tahun 1g63 dan 196l",
    "ll Maret sampai II April",
    "Rp.277.--",
    "Ru. 25.000 dan RPy 1.500",
    "pembayaran September 962",
    "september 97l tercatat",
    "november 19 71 selesai",
    "Dopartoron/wta bertugas",
    "Kasm.nem dan Sukatil serta Maineh",
    "DEPARTEMEN pekerjaan Umum dan tenaca kerdja",
    "departntnptsyaai pan tenaca",
    "Soerat keterangan nomor 12",
    "Gedoeng kantor di djalan kramat",
    "  spasi   ganda\ttab\ndan newline  ",
    "kerdja-sama dengan 'istri'",
    "Jakrta, 15 Nopember 1965.",
    "(Direktoer) [Kepala]: wedana;",
    "A1B2 mixed123tokens 99x",
    "",
]

CASES_SPELL = [
    # the reference's own smoke block (spelling_normalizer.py:157-172)
    "Oetara adalah arah jang penting",
    "Djalan ini menoedju ke pasar",
    "Tjari barang di toko itoe",
    "Njamuk sangat mengganggu",
    "Sjarat utama adalah kedjujoeran",
    "Chabar baik dari project manager",
    # extras: case preservation, j→y map, whitespace
    "OETARA DAN DJALAN",
    "Jang terhormat, jaitoe bapak",
    "jangan diubah",
    "Penoendjoekan  roemah   negara",
    "DJoeragan Tjokro dan NJonja",
    "",
]

CASES_SCORE = [
    {
        "text": (
            "\n    DEPARTEMEN PEKERJAAN UMUM\n    Jalan Kramat Jakarta\n"
            "    Nomor 2078 tanggal 15 November 1965\n    Kepada Yth. Direktur\n    "
        ),
        "confidences": [0.92, 0.88, 0.95, 0.78, 0.85],
        "corrections": 3,
    },
    {"text": "", "confidences": [], "corrections": 0},
    {"text": "katabukan kamus semua", "confidences": None, "corrections": 0},
    {"text": "departemen pekerjaan umum", "confidences": [88.0, 92.5], "corrections": 1},
    {"text": "xy zz qq", "confidences": [0.2], "corrections": 5},
]


def main() -> None:
    out = {"dictionary": [], "spelling": [], "scoring": [], "unknown_words": []}

    for text in CASES_DICT:
        corrected, n = ref_dc.correct_with_stats(text)
        currency = ref_dc.normalize_currency_and_numbers(corrected)
        out["dictionary"].append(
            {"input": text, "corrected": corrected, "count": n, "currency": currency}
        )

    for text in CASES_SPELL:
        orig, norm, changes = ref_sn.normalize_with_comparison(text)
        out["spelling"].append({"input": text, "normalized": norm, "changes": changes})

    for case in CASES_SCORE:
        r = ref_sc.calculate_quality_score(
            text=case["text"],
            confidence_scores=case["confidences"],
            dictionary_corrections=case["corrections"],
        )
        out["scoring"].append(
            {
                **case,
                "expected": {
                    "overall": r.overall,
                    "label": r.label,
                    "confidence": r.confidence,
                    "dictionary_match": r.dictionary_match,
                    "correction_rate": r.correction_rate,
                    "total_words": r.total_words,
                    "matched_words": r.matched_words,
                    "corrected_words": r.corrected_words,
                },
            }
        )

    for text in CASES_DICT[:8]:
        # reference returns unordered list(set()); goldens store sorted —
        # the engine's frozen deterministic order (SURVEY.md §2.7 D1)
        out["unknown_words"].append(
            {"input": text, "words": sorted(ref_dc.get_unknown_words(text))}
        )

    dest = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    dest.mkdir(parents=True, exist_ok=True)
    (dest / "kernels.json").write_text(
        json.dumps(out, indent=1, ensure_ascii=False)
    )
    print(f"wrote {dest/'kernels.json'}: "
          f"{len(out['dictionary'])} dict, {len(out['spelling'])} spell, "
          f"{len(out['scoring'])} score cases")


if __name__ == "__main__":
    main()
