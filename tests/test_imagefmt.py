"""BMP / netpbm stdlib codecs (kernels/imagefmt.py) and their wiring
into the media seam (DecodeMedia transcode + dhash parity)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.kernels.imagefmt import (
    decode_bmp,
    decode_netpbm,
    encode_bmp,
    encode_netpbm,
    is_bmp,
    is_netpbm,
)


@pytest.mark.parametrize("shape", [(5, 3, 3), (7, 4, 3), (16, 17, 3), (1, 1, 3)])
def test_bmp_round_trip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_bmp(img)
    assert is_bmp(data)
    assert np.array_equal(decode_bmp(data), img)


def test_bmp_row_padding_widths():
    # widths 1-8 exercise every 4-byte padding remainder
    for w in range(1, 9):
        img = np.arange(3 * 3 * w, dtype=np.uint8).reshape(3, w, 3)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_errors():
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XXnot a bmp")
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_bmp(img))
    data[28] = 8  # bpp 8
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(data))


@pytest.mark.parametrize("grey", [False, True])
def test_netpbm_round_trip(grey):
    rng = np.random.default_rng(3 if grey else 4)
    shape = (9, 6) if grey else (9, 6, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_netpbm(img)
    assert is_netpbm(data)
    assert np.array_equal(decode_netpbm(data), img)


def test_netpbm_comment_header():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = b"P5\n# a comment line\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_netpbm(data), img)


def test_decode_media_transcodes_bmp_and_ppm(ray_session):
    from ocr_ray.ops.multimodal import (
        DecodeMedia,
        decode_raw_image,
        is_raw_image,
        render_text_page,
    )

    pages = [render_text_page(64, 48, seed=i) for i in range(2)]
    stage = DecodeMedia(real_codecs=True)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [encode_bmp(pages[0]), encode_netpbm(pages[1])],
                pa.binary(),
            ),
        }
    )
    out = stage(t)
    for i in range(2):
        p = out.column("payload")[i].as_py()
        assert is_raw_image(p)
        assert np.array_equal(decode_raw_image(p), pages[i])
    # metadata mode: dims parsed, payload untouched
    meta = DecodeMedia(real_codecs=False)(t)
    assert meta.column("width")[0].as_py() == 64
    assert meta.column("height")[1].as_py() == 48
    assert is_bmp(meta.column("payload")[0].as_py())


def test_dhash_parity_across_all_codecs(ray_session):
    import ray.data as rd

    from ocr_ray.kernels.png import encode_png
    from ocr_ray.ops.multimodal import (
        encode_raw_image,
        media_dhash_pairs,
        render_text_page,
    )

    pages = [render_text_page(96, 64, seed=i) for i in range(4)]
    dup = pages[0].copy()
    ids = [0, 1, 2, 3, 100]
    imgs = pages + [dup]
    encoders = [encode_raw_image, encode_png, encode_bmp, encode_netpbm]

    def pairs_of(enc_cycle):
        t = pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [enc_cycle[i % len(enc_cycle)](img)
                     for i, img in enumerate(imgs)],
                    pa.binary(),
                ),
            }
        )
        return sorted(
            (int(a), int(b), int(h))
            for a, b, h in media_dhash_pairs(rd.from_arrow(t))
            .to_pandas()[["media_a", "media_b", "hamming"]]
            .itertuples(index=False)
        )

    # mixed-codec corpus produces the identical pair set as raw-only
    assert pairs_of(encoders) == pairs_of([encode_raw_image])
    assert (0, 100, 0) in pairs_of(encoders)
