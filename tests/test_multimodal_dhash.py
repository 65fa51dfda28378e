"""dHash image near-dup: exact copies at hamming 0, content-jittered
twins within the threshold, bit-exact hash stability, degenerate-size
guard."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.ops.multimodal import (
    decode_raw_image,
    dhash64,
    encode_raw_image,
    render_text_page,
    synthesize_raw_images,
)


def test_dhash_is_exact_and_shift_invariant_to_uniform_brightness():
    img = render_text_page(96, 80, n_lines=5, seed=3)
    h0 = dhash64(img)
    assert h0 == dhash64(img)  # deterministic
    brighter = np.clip(img.astype(np.int16) + 7, 0, 255).astype(np.uint8)
    # uniform brightness shifts every block mean equally → same hash
    assert dhash64(brighter) == h0


def test_dhash_rejects_degenerate_images():
    with pytest.raises(ValueError):
        dhash64(np.zeros((4, 4, 3), np.uint8))


def test_media_dhash_pairs_finds_planted_dups(ray_session):
    """Mirrors q_media_dhash_pairs' corpus construction: texture pages,
    exact copies at i%10==9, never-clipping brightness twins at i%10==5.
    Both plant kinds must surface at hamming 0 (the shift invariance is
    exact on the 0..249-bounded textures) and nothing else collides."""
    import ray.data as rd

    from ocr_ray.ops.multimodal import (
        media_dhash_pairs,
        synthesize_texture_images,
    )

    tbl = synthesize_texture_images(40, seed=11)
    payloads = tbl.column("payload").to_pylist()
    planted = []
    for i in range(len(payloads)):
        if i % 10 == 9:
            payloads[i] = payloads[i - 9]
            planted.append((i - 9, i))
        elif i % 10 == 5 and i >= 5:
            img = decode_raw_image(payloads[i - 5])
            img = (img.astype(np.int16) + 6).astype(np.uint8)
            payloads[i] = encode_raw_image(img)
            planted.append((i - 5, i))
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": tbl.column("media_id"),
                "media_type": tbl.column("media_type"),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in media_dhash_pairs(media).take_all()
    }
    for a, b in planted:
        assert pairs.get((a, b)) == 0, (a, b, pairs)
    # the twin (d+5) and copy (d+9) of the same base close transitively
    closure = set(planted) | {
        (d + 5, d + 9) for d in range(0, len(payloads) - 9, 10)
    }
    assert set(pairs) == closure  # textures never collide by accident


def test_media_dhash_violations_empty(ray_session):
    """The invariant gate (ordering, exact-recompute hamming, planted-
    pair completeness) must emit zero rows on the planted corpus."""
    from ocr_ray import driver as drv

    out = drv.QUERIES["media_dhash_violations"]("/root/testdata/sf0.001")
    assert out.num_rows == 0
    assert out.schema.names == ["media_a", "media_b", "reason"]
