"""Deterministic synthesis of the interleaved text+media documents table.

Input shape per BASELINE.json input_hint:
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

kind ∈ {text, html, pdf, image}. Text spans carry noisy OCR-like Indonesian
drawn from the reference's own correction tables (wrong keys), old-spelling
text, currency/date strings and clean kamus words; html spans wrap one
main-content block in link-farm boilerplate; pdf/image spans carry only a
``media_ref`` whose scanned "payload" is a pure deterministic function of
the ref string (``media_payload``) — the sandbox stand-in for fetching the
object and running Tesseract (reference app/services/minio_service.py:30-39,
ocr_service.py:299-414).

Everything is seeded: same (n_docs, seed) → byte-identical table. ~1% of
docs are media-heavy (tens of pdf spans) to reproduce the reference's skew
exemplar (the 203 s 16-page PDF in ocr_history.db).
"""
from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from ocr_ray import data

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
INTERLEAVED_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)

_OLD_SPELLING = [
    "Oetara adalah arah jang penting",
    "Djalan ini menoedju ke pasar",
    "Tjari barang di toko itoe",
    "Njamuk sangat mengganggu di waktoe malam",
    "Sjarat utama adalah kedjujoeran",
    "Chabar baik dari project manager",
    "Soerat keterangan penoendjoekan roemah",
    "Pegawai jang bersangkoetan wadjib melapor",
]

_CURRENCY_DATES = [
    "Gaji pokok Rp. 277",
    "Rp.25.000.-- setiap boelan",
    "ll Maret 1962 sampai 11 April",
    "tanggal 11Septenbor 1962",
    "tahun 1g63 dan 196l",
    "sewa Ru. 1.500 sebulan",
    "november 19 71 berakhir",
    "terhitung september 962",
]


def _rng(*parts: object) -> random.Random:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _noisy_words(rng: random.Random, n: int) -> list[str]:
    phrase = sorted(data.phrase_corrections())
    kamus = list(data.kamus_sorted())
    words = []
    for _ in range(n):
        r = rng.random()
        if r < 0.25:
            words.append(rng.choice(phrase))      # known OCR misreads
        elif r < 0.85:
            words.append(rng.choice(kamus))       # clean dictionary words
        else:
            # unknown-but-plausible word (feeds the learning aggregation)
            words.append(
                "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(4, 9)))
            )
    return words


def _sentence(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.2:
        return rng.choice(_OLD_SPELLING)
    if r < 0.35:
        return rng.choice(_CURRENCY_DATES)
    words = _noisy_words(rng, rng.randint(4, 10))
    if rng.random() < 0.3:
        words[0] = words[0].capitalize()
    return " ".join(words)


def text_payload(rng: random.Random, n_sentences: int | None = None) -> str:
    n = n_sentences or rng.randint(1, 5)
    return ". ".join(_sentence(rng) for _ in range(n))


def html_payload(rng: random.Random) -> tuple[str, str]:
    """Returns (html_source, expected_main_text) — boilerplate nav/footer
    link farms around one high-text-density content div."""
    paragraphs = [text_payload(rng, rng.randint(1, 2)) for _ in range(rng.randint(2, 4))]
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in _noisy_words(rng, rng.randint(4, 8))
    )
    footer_links = " ".join(
        f'<a href="#{w}">{w}</a>' for w in _noisy_words(rng, rng.randint(3, 6))
    )
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        "<html><head><title>arsip</title><script>var x=1;</script>"
        "<style>.m{color:red}</style></head><body>"
        f"<nav><ul>{nav_links}</ul></nav>"
        f'<div id="main">{body}</div>'
        f"<footer>{footer_links}</footer>"
        "</body></html>"
    )
    expected = "\n".join(" ".join(p.split()) for p in paragraphs)
    return html, expected


def media_payload(media_ref: str) -> tuple[str, list[float]]:
    """Deterministic scanned-page payload for a media_ref: (page_text,
    per-word confidences). Pure function of the ref string — the mock OCR
    engine and the oracle both call this, so extraction is reproducible
    without shipping a registry."""
    rng = _rng("media", media_ref)
    text = text_payload(rng, rng.randint(2, 4))
    n_words = max(1, len(text.split()))
    confidences = [round(rng.uniform(0.55, 0.99), 4) for _ in range(n_words)]
    return text, confidences


_KINDS = ("text", "html", "pdf", "image")
_KIND_WEIGHTS = (0.50, 0.25, 0.15, 0.10)


def generate_interleaved(n_docs: int, seed: int = 42) -> pa.Table:
    doc_ids, spans_col = [], []
    for i in range(n_docs):
        doc_id = f"doc-{seed}-{i:08d}"
        rng = _rng("doc", seed, i)
        if rng.random() < 0.01:
            # media-heavy skew exemplar: one long scanned PDF
            kinds = ["pdf"] * rng.randint(16, 48)
        else:
            kinds = rng.choices(_KINDS, weights=_KIND_WEIGHTS, k=rng.randint(1, 8))
        spans = []
        for offset, kind in enumerate(kinds):
            if kind == "text":
                spans.append(
                    {"kind": kind, "text": text_payload(rng), "media_ref": "", "offset": offset}
                )
            elif kind == "html":
                html, _ = html_payload(rng)
                spans.append(
                    {"kind": kind, "text": html, "media_ref": "", "offset": offset}
                )
            else:
                ref = f"mem://pages/{doc_id}/{offset}"
                spans.append(
                    {"kind": kind, "text": "", "media_ref": ref, "offset": offset}
                )
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()),
         "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT))},
        schema=INTERLEAVED_SCHEMA,
    )
