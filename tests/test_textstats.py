from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.ops.textstats import (
    rolling_hashes,
    winnow_fingerprints,
)


def test_rolling_hash_shift_invariance():
    # same k-grams → same hash values regardless of position
    h1 = rolling_hashes("abcdefghij", k=4)
    h2 = rolling_hashes("XXabcdefghij"[2:], k=4)
    assert np.array_equal(h1, h2)
    # whitespace-normalized: runs collapse
    assert np.array_equal(
        rolling_hashes("a  b\tc", k=3), rolling_hashes("a b c", k=3)
    )


def test_winnow_overlap_detects_shared_passage():
    base = "surat keterangan nomor dua puluh tujuh tentang penggunaan rumah negara"
    doc_a = "awalan berbeda dulu. " + base + " akhiran lain."
    doc_b = "pembuka teks lain ya. " + base + " dan penutup berbeda."
    doc_c = "dokumen sama sekali tidak mirip dengan lainnya di sini."
    fa, fb, fc = (set(winnow_fingerprints(d)) for d in (doc_a, doc_b, doc_c))
    assert len(fa & fb) > 0           # shared passage → shared fingerprints
    assert len(fa & fc) == 0 or len(fa & fc) < len(fa & fb)


def test_winnow_edge_cases():
    assert winnow_fingerprints("") == []
    assert winnow_fingerprints("abc") == []          # shorter than k
    short = winnow_fingerprints("abcdefgh")          # one window
    assert len(short) == 1


def test_multimodal_preprocess_stubs(ray_session):
    import ray.data as rd

    from ocr_ray.ops import multimodal as mm

    media = mm.synthesize_media(12)
    ds = rd.from_arrow(media).map_batches(
        mm.DeskewImage, batch_format="pyarrow", concurrency=1, batch_size=6
    ).map_batches(
        mm.RemoveBackground, batch_format="pyarrow", concurrency=1, batch_size=6
    )
    df = ds.to_pandas()
    assert "deskew_angle" in df and "background_neutralized" in df
    assert (df["background_neutralized"]).all()
    # angles below the threshold are zeroed, others kept
    nonzero = df[df["deskew_angle"] != 0.0]["deskew_angle"].abs()
    assert (nonzero >= 0.5).all()
