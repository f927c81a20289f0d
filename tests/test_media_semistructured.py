"""Audio/video media stages and JSON-column operators."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest


def _wav_bytes(channels=2, rate=44100, bits=16, n_samples=44100) -> bytes:
    data_size = n_samples * channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * (bits // 8), channels * (bits // 8), bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_probe_wav_info():
    from docler_ray.stages.media import probe_wav_info, sniff_audio_mime

    wav = _wav_bytes()
    assert sniff_audio_mime(wav) == "audio/wav"
    info = probe_wav_info(wav)
    assert info["channels"] == 2
    assert info["sample_rate"] == 44100
    assert info["bits"] == 16
    assert abs(info["duration_secs"] - 1.0) < 1e-9
    assert probe_wav_info(b"OggS garbage") is None
    assert sniff_audio_mime(b"ID3\x04rest") == "audio/mpeg"


def test_audio_feature_extractor_batch():
    from docler_ray.stages.media import AudioFeatureExtractor

    fx = AudioFeatureExtractor()
    batch = pa.table(
        {"url": ["a", "b"], "audio": [_wav_bytes(channels=1), b"\xff\xfbmp3ish"]}
    )
    out = fx(batch)
    assert out.column("mime_sniffed").to_pylist() == ["audio/wav", "audio/mpeg"]
    assert out.column("channels").to_pylist() == [1, None]


def test_video_frame_sampler_schedule():
    from docler_ray.stages.media import VideoFrameSampler

    fx = VideoFrameSampler(interval_secs=10.0, max_frames=4)
    batch = pa.table(
        {
            "url": ["v1", "v2"],
            "video": [b"\x01\x02" * 5000, b""],
            "duration_secs": [35.0, 5.0],
        }
    )
    out = fx(batch)
    v1 = out.filter(pa.compute.equal(out.column("url"), "v1"))
    assert v1.column("t_offset_secs").to_pylist() == [0.0, 10.0, 20.0, 30.0]
    # deterministic fingerprints
    out2 = fx(batch)
    assert out.column("frame_fingerprint").to_pylist() == out2.column(
        "frame_fingerprint"
    ).to_pylist()


def test_decode_video_frames_stubbed():
    from docler_ray.stages.media import decode_video_frames

    with pytest.raises(NotImplementedError, match="decoder"):
        decode_video_frames(b"xx")


def test_json_field_counts(ray_session):
    import ray.data

    from docler_ray.stages.semistructured import json_field_counts

    rows = (
        [{"props": '{"k": 1}'}] * 3
        + [{"props": '{"k": 2}'}] * 2
        + [{"props": "not json"}, {"props": None}, {"props": '{"other": 9}'}]
    )
    ds = ray.data.from_items(rows)
    out = json_field_counts(ds, col="props", field="k").to_pandas()
    got = {row["k"]: row["n"] for _, row in out.iterrows()}
    assert got[1] == 3 and got[2] == 2
    import math

    null_n = [n for k, n in got.items() if k is None or (isinstance(k, float) and math.isnan(k))]
    assert sum(null_n) == 3


def test_png_codec_round_trips_all_filters():
    """Stdlib PNG codec (functions/png.py): encode/decode round trips for
    1/2/3/4 channels under filter types 0/1/2, plus hand-built
    Average/Paeth scanlines (the foreign-PNG decode paths)."""
    import struct
    import zlib

    import numpy as np

    from docler_ray.functions.png import (
        _PNG_MAGIC,
        _chunk,
        decode_png,
        encode_png,
        png_transform,
        resize_nearest,
    )

    rng = np.random.RandomState(0)
    for ch in (1, 2, 3, 4):
        a = rng.randint(0, 256, (13, 9, ch), dtype=np.uint8)
        for ft in (0, 1, 2):
            b, info = decode_png(encode_png(a, filter_type=ft))
            assert np.array_equal(a, b), (ch, ft)
            assert (info["width"], info["height"]) == (9, 13)

    # Average (3) / Paeth (4) rows, filtered by hand from known recon
    recon = np.array([[10, 20, 30], [40, 60, 90]], dtype=np.uint8)
    r0 = []
    for x in range(3):
        left = int(recon[0, x - 1]) if x else 0
        r0.append((int(recon[0, x]) - (left + 0) // 2) & 0xFF)
    r1 = []
    for x in range(3):
        a_ = int(recon[1, x - 1]) if x else 0
        b_ = int(recon[0, x])
        c_ = int(recon[0, x - 1]) if x else 0
        p = a_ + b_ - c_
        pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
        pred = a_ if (pa_ <= pb_ and pa_ <= pc_) else (b_ if pb_ <= pc_ else c_)
        r1.append((int(recon[1, x]) - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(bytes([3]) + bytes(r0) + bytes([4]) + bytes(r1))
    png = (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
    dec, _ = decode_png(png)
    assert np.array_equal(dec[:, :, 0], recon)

    # transform semantics: long side capped, index math integer
    big = rng.randint(0, 256, (30, 20, 3), dtype=np.uint8)
    arr, info = decode_png(png_transform(encode_png(big), max_dim=10))
    assert (info["width"], info["height"]) == (6, 10)
    assert np.array_equal(arr, resize_nearest(big, 6, 10))

    # extreme aspect ratio: short side clamps to 1, never 0 (advisor repro:
    # w=1, h=10000, max_dim<h/2 truncated the width to 0 -> invalid IHDR)
    tall = rng.randint(0, 256, (100, 1, 3), dtype=np.uint8)
    arr, info = decode_png(png_transform(encode_png(tall), max_dim=10))
    assert (info["width"], info["height"]) == (1, 10)


def test_png_codec_guards():
    import pytest as _pytest

    from docler_ray.functions.png import decode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF")
