"""Raw-PCM audio kernels: codec-free round-trip, RMS/ZCR features,
silence segmentation — real computation (not stubs) on deterministic
speech-shaped clips."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_raw_audio_roundtrip():
    from ocr_ray.ops.multimodal import decode_raw_audio, encode_raw_audio

    pcm = (np.sin(np.linspace(0, 100, 16000)) * 10000).astype(np.int16)
    back, rate = decode_raw_audio(encode_raw_audio(pcm, 16000))
    assert rate == 16000
    assert np.array_equal(back, pcm)


def test_synthesize_deterministic():
    from ocr_ray.ops.multimodal import synthesize_raw_audio

    a = synthesize_raw_audio(3)
    b = synthesize_raw_audio(3)
    assert a.equals(b)
    assert a.column("media_type").to_pylist() == ["audio"] * 3


def test_chunk_stats_voiced_vs_silence(ray_session):
    import ray.data as rd

    from ocr_ray.ops.multimodal import (
        audio_chunk_stats,
        encode_raw_audio,
    )

    rate = 16000
    # 1 s of loud 440 Hz, then 1 s of silence
    t = np.arange(rate, dtype=np.float64)
    loud = (8000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    silent = np.zeros(rate, np.int16)
    payload = encode_raw_audio(np.concatenate([loud, silent]), rate)
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    got = (
        audio_chunk_stats(media, chunk_ms=250)
        .to_pandas()
        .sort_values("chunk_idx")
    )
    assert len(got) == 8
    # first 4 chunks voiced (rms ~ 8000/sqrt(2)), last 4 silent
    assert (got.rms.iloc[:4] > 4000).all()
    assert (got.rms.iloc[4:] < 1.0).all()
    # 440 Hz -> ~880 crossings/s -> zcr ~ 880/16000 per sample
    assert abs(got.zcr.iloc[0] - 880 / rate) < 0.01
    assert got.start_ms.tolist() == [0, 250, 500, 750, 1000, 1250, 1500, 1750]


def test_silence_segments(ray_session):
    import ray.data as rd

    from ocr_ray.ops.multimodal import encode_raw_audio, silence_segments

    rate = 16000
    t = np.arange(int(0.4 * rate), dtype=np.float64)
    burst = (8000 * np.sin(2 * np.pi * 200 * t / rate)).astype(np.int16)
    gap = np.zeros(int(0.3 * rate), np.int16)
    tiny = (8000 * np.sin(2 * np.pi * 200 * np.arange(int(0.04 * rate))
                          / rate)).astype(np.int16)  # below min_segment_ms
    pcm = np.concatenate([gap, burst, gap, tiny, gap, burst])
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([7], pa.int64()),
                "payload": pa.array(
                    [encode_raw_audio(pcm, rate)], pa.binary()
                ),
            }
        )
    )
    got = silence_segments(media).to_pandas().sort_values("segment_idx")
    # tiny 40 ms burst filtered; two 400 ms segments survive
    assert len(got) == 2
    s0, s1 = got.iloc[0], got.iloc[1]
    assert abs(int(s0.start_ms) - 300) <= 50
    assert abs(int(s0.end_ms) - 700) <= 50
    assert abs(int(s1.end_ms - s1.start_ms) - 400) <= 50


def test_synthesized_clips_segment_nondegenerate(ray_session):
    import ray.data as rd

    from ocr_ray.ops.multimodal import silence_segments, synthesize_raw_audio

    media = rd.from_arrow(synthesize_raw_audio(4))
    got = silence_segments(media).to_pandas()
    # every clip has voiced bursts -> at least one segment each
    assert set(got.media_id) == {0, 1, 2, 3}
    assert (got.end_ms > got.start_ms).all()
