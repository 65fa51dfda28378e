from __future__ import annotations

from ocr_ray.kernels.html_extract import extract_main_text
from ocr_ray.synth import _rng, html_payload


def test_strips_boilerplate_keeps_main():
    html = (
        "<html><body>"
        '<nav><ul><li><a href="/a">beranda</a></li><li><a href="/b">arsip</a></li>'
        '<li><a href="/c">kontak</a></li></ul></nav>'
        '<div id="content"><p>Surat keterangan nomor 12 tahun 1965.</p>'
        "<p>Departemen pekerjaan umum dan tenaga kerja.</p></div>"
        '<footer><a href="#x">syarat</a> <a href="#y">privasi</a></footer>'
        "</body></html>"
    )
    out = extract_main_text(html)
    assert out == (
        "Surat keterangan nomor 12 tahun 1965.\n"
        "Departemen pekerjaan umum dan tenaga kerja."
    )


def test_script_style_dropped():
    html = "<body><div><p>isi utama dokumen ini panjang</p></div><script>var a=1;</script><style>p{}</style></body>"
    assert extract_main_text(html) == "isi utama dokumen ini panjang"


def test_empty_and_garbage():
    assert extract_main_text("") == ""
    assert extract_main_text("<div></div>") == ""
    assert extract_main_text("plain text no tags at all") == "plain text no tags at all"


def test_synth_html_roundtrip():
    # the generator's expected main text is exactly what the stripper recovers
    for i in range(20):
        html, expected = html_payload(_rng("html-test", i))
        assert extract_main_text(html) == expected


def test_inline_tags_do_not_split_lines():
    html = "<body><div><p>kata <b>tebal</b> dan <i>miring</i> menyatu</p></div></body>"
    assert extract_main_text(html) == "kata tebal dan miring menyatu"
