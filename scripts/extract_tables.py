"""One-off extractor: pull the correction *tables* (pure data, no code) out of
the reference repo's source via AST literal parsing, and write them as JSON
data files under ocr_ray/data/.

The reference (alfalaq12/OCR) defines these as module-level dict/set literals:
  - KAMUS_DOKUMEN, NAMA_INDONESIA, KATA_UPPERCASE   (dictionary_corrector.py:28-196)
  - PHRASE_CORRECTIONS                               (dictionary_corrector.py:244-648)
  - MULTI_WORD_CORRECTIONS                           (dictionary_corrector.py:746-1129)
  - KATA_ASING, RULES_EJAAN, KATA_J_KE_Y             (spelling_normalizer.py:16-51)

Duplicate dict keys in the source collapse exactly as Python evaluates them
(last wins), so literal_eval yields the *effective* tables (SURVEY.md §7.3).

Run once: python scripts/extract_tables.py
"""
from __future__ import annotations

import ast
import json
import pathlib

REF = pathlib.Path("/root/reference/app/services")
OUT = pathlib.Path(__file__).resolve().parent.parent / "ocr_ray" / "data"


def literal_assignments(path: pathlib.Path, names: set[str]) -> dict:
    tree = ast.parse(path.read_text())
    found = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name) and tgt.id in names:
                found[tgt.id] = ast.literal_eval(node.value)
    missing = names - found.keys()
    if missing:
        raise SystemExit(f"missing in {path}: {missing}")
    return found


def main() -> None:
    dc = literal_assignments(
        REF / "dictionary_corrector.py",
        {
            "KAMUS_DOKUMEN",
            "NAMA_INDONESIA",
            "KATA_UPPERCASE",
            "PHRASE_CORRECTIONS",
            "MULTI_WORD_CORRECTIONS",
        },
    )
    sn = literal_assignments(
        REF / "spelling_normalizer.py",
        {"KATA_ASING", "RULES_EJAAN", "KATA_J_KE_Y"},
    )

    OUT.mkdir(parents=True, exist_ok=True)

    # Effective runtime dictionary = KAMUS_DOKUMEN | NAMA_INDONESIA
    # (dictionary_corrector.py:196 does KAMUS_DOKUMEN.update(NAMA_INDONESIA)).
    kamus = sorted(set(dc["KAMUS_DOKUMEN"]) | set(dc["NAMA_INDONESIA"]))
    (OUT / "kamus.json").write_text(
        json.dumps(
            {
                "kamus": kamus,
                "kata_uppercase": sorted(dc["KATA_UPPERCASE"]),
            },
            indent=0,
            ensure_ascii=False,
        )
    )

    (OUT / "corrections.json").write_text(
        json.dumps(
            {
                "phrase": dc["PHRASE_CORRECTIONS"],
                "multi_word": dc["MULTI_WORD_CORRECTIONS"],
            },
            indent=0,
            ensure_ascii=False,
        )
    )

    (OUT / "spelling.json").write_text(
        json.dumps(
            {
                "kata_asing": sorted(sn["KATA_ASING"]),
                "rules_ejaan": list(sn["RULES_EJAAN"]),
                "j_ke_y": sn["KATA_J_KE_Y"],
            },
            indent=0,
            ensure_ascii=False,
        )
    )

    print(
        f"kamus={len(kamus)} phrase={len(dc['PHRASE_CORRECTIONS'])} "
        f"multi_word={len(dc['MULTI_WORD_CORRECTIONS'])} "
        f"kata_asing={len(sn['KATA_ASING'])} rules={len(sn['RULES_EJAAN'])}"
    )


if __name__ == "__main__":
    main()
