"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Re-expresses the reference's image utilities
(/root/reference/src/docler/utils.py:18-128: pil_to_bytes,
encode/decode_image_to_base64, png_to_webp, get_mime_from_pil) for a
no-PIL environment: base64 codecs and magic-byte/header probing are real
pure-Python implementations; pixel-level transforms (resize, webp re-encode,
frame sampling) are STUBS gated on PIL importability that raise
NotImplementedError with the exact dependency named. The Ray-side plumbing —
schema, actor signature, batch layout — is real and tested, so dropping PIL
into the image turns the stubs on without touching the pipeline.
"""

from __future__ import annotations

import base64
import struct

import pyarrow as pa

_MAGIC_TO_MIME = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "image/webp"),  # refined below (RIFF....WEBP)
    (b"BM", "image/bmp"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
)


def sniff_image_mime(data: bytes) -> str | None:
    """Magic-byte MIME detection (the reference's API test checks these exact
    signatures, tests/test_api_integration.py:21-301)."""
    for magic, mime in _MAGIC_TO_MIME:
        if data.startswith(magic):
            if mime == "image/webp" and data[8:12] != b"WEBP":
                continue
            return mime
    return None


def probe_image_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from PNG / GIF / JPEG headers, pure Python."""
    mime = sniff_image_mime(data)
    try:
        if mime == "image/png" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if mime == "image/gif" and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if mime == "image/jpeg":
            i = 2
            while i + 9 < len(data):
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return int(w), int(h)
                seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
                i += 2 + seg_len
    except (struct.error, IndexError):
        return None
    return None


def encode_image_to_base64(data: bytes, mime_type: str | None = None) -> str:
    """bytes -> data-URL (reference: src/docler/utils.py encode path)."""
    mime = mime_type or sniff_image_mime(data) or "application/octet-stream"
    return f"data:{mime};base64,{base64.b64encode(data).decode('ascii')}"


def decode_image_from_base64(data_url: str) -> tuple[bytes, str]:
    """data-URL -> (bytes, mime) (reference: mistral_provider/utils.py:13-42)."""
    if not data_url.startswith("data:"):
        msg = "Not a data URL"
        raise ValueError(msg)
    header, _, payload = data_url.partition(",")
    mime = header[5:].split(";", 1)[0] or "application/octet-stream"
    return base64.b64decode(payload), mime


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def png_to_webp(data: bytes, max_dim: int = 1080, quality: int = 20) -> bytes:
    """STUB: webp re-encode (resize >1080px, quality 20 — the reference's
    exact parameters, src/docler/utils.py png_to_webp). Requires PIL, which
    is not installed in this environment."""
    if not _pil_available():
        msg = "png_to_webp requires Pillow (PIL), not installed in this environment"
        raise NotImplementedError(msg)
    from io import BytesIO

    from PIL import Image  # pragma: no cover

    img = Image.open(BytesIO(data))  # pragma: no cover
    if max(img.size) > max_dim:  # pragma: no cover
        ratio = max_dim / max(img.size)
        img = img.resize((int(img.width * ratio), int(img.height * ratio)))
    out = BytesIO()  # pragma: no cover
    img.save(out, format="WEBP", quality=quality)  # pragma: no cover
    return out.getvalue()  # pragma: no cover


# --- audio -------------------------------------------------------------------

_AUDIO_MAGIC = (
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"\xff\xf3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
)


def sniff_audio_mime(data: bytes) -> str | None:
    """Magic-byte audio MIME detection (WAV via RIFF/WAVE, plus MP3/OGG/FLAC)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    for magic, mime in _AUDIO_MAGIC:
        if data.startswith(magic):
            return mime
    return None


def probe_wav_info(data: bytes) -> dict | None:
    """Pure-Python WAV header parse: channels, sample rate, bit depth and
    duration from the fmt/data chunks. Returns None for non-WAV payloads."""
    if sniff_audio_mime(data) != "audio/wav" or len(data) < 12:
        return None
    pos, n = 12, len(data)
    fmt: dict | None = None
    data_size: int | None = None
    try:
        while pos + 8 <= n:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"fmt " and pos + 24 <= n:
                channels, rate = struct.unpack("<HI", data[pos + 10 : pos + 16])
                (bits,) = struct.unpack("<H", data[pos + 22 : pos + 24])
                fmt = {"channels": channels, "sample_rate": rate, "bits": bits}
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    except struct.error:
        return None
    if fmt is None:
        return None
    if data_size is not None and fmt["sample_rate"] and fmt["channels"] and fmt["bits"]:
        bytes_per_sec = fmt["sample_rate"] * fmt["channels"] * (fmt["bits"] // 8)
        fmt["duration_secs"] = data_size / bytes_per_sec if bytes_per_sec else None
    else:
        fmt["duration_secs"] = None
    return fmt


class AudioFeatureExtractor:
    """Actor-pool stage: (key, audio binary) batch -> typed audio metadata
    rows. WAV header parsing is real; decode/transcode of compressed codecs
    is where a decoder library would plug in (none in this environment)."""

    def __init__(self, audio_col: str = "audio", key_col: str = "url") -> None:
        self.audio_col = audio_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col)
        payloads = batch.column(self.audio_col).to_pylist()
        out = {"mime_sniffed": [], "n_bytes": [], "channels": [],
               "sample_rate": [], "duration_secs": []}
        for data in payloads:
            data = data or b""
            info = probe_wav_info(data)
            out["mime_sniffed"].append(sniff_audio_mime(data) or "")
            out["n_bytes"].append(len(data))
            out["channels"].append(info["channels"] if info else None)
            out["sample_rate"].append(info["sample_rate"] if info else None)
            out["duration_secs"].append(info["duration_secs"] if info else None)
        return pa.table(
            {
                self.key_col: keys,
                "mime_sniffed": pa.array(out["mime_sniffed"], pa.string()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "channels": pa.array(out["channels"], pa.int32()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "duration_secs": pa.array(out["duration_secs"], pa.float64()),
            }
        )


# --- video -------------------------------------------------------------------


def decode_video_frames(data: bytes):  # pragma: no cover - stub by design
    """STUB: pixel-level frame decode requires a video decoder (PyAV/ffmpeg),
    not installed in this environment."""
    msg = "decode_video_frames requires a video decoder (PyAV/ffmpeg), not installed"
    raise NotImplementedError(msg)


class VideoFrameSampler:
    """Actor-pool stage: (key, video binary, duration) batch -> one row per
    sampled frame timestamp (every ``interval_secs``). The sampling schedule,
    schema and batch layout are real; frame pixel decode is stubbed
    (``decode_video_frames``), so each row carries the frame's time offset
    and a deterministic content fingerprint of the byte range a decoder
    would read — swap the stub for PyAV and the pipeline shape is unchanged.
    Small batch sizes are the operating assumption (wide binary rows)."""

    def __init__(
        self,
        video_col: str = "video",
        key_col: str = "url",
        duration_col: str = "duration_secs",
        interval_secs: float = 10.0,
        max_frames: int = 32,
    ) -> None:
        self.video_col = video_col
        self.key_col = key_col
        self.duration_col = duration_col
        self.interval_secs = interval_secs
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        keys = batch.column(self.key_col).to_pylist()
        payloads = batch.column(self.video_col).to_pylist()
        durations = (
            batch.column(self.duration_col).to_pylist()
            if self.duration_col in batch.column_names
            else [None] * len(keys)
        )
        out = {"key": [], "frame_idx": [], "t_offset_secs": [], "frame_fingerprint": []}
        for key, data, duration in zip(keys, payloads, durations):
            data = data or b""
            dur = duration if duration is not None else len(data) / 1_000_000
            n_frames = min(self.max_frames, int(dur // self.interval_secs) + 1)
            for i in range(n_frames):
                t = i * self.interval_secs
                # byte range a decoder would seek to, fingerprinted for
                # deterministic downstream dedup/tests without real decode
                lo = int(len(data) * (t / dur)) if dur else 0
                window = data[lo : lo + 4096]
                out["key"].append(key)
                out["frame_idx"].append(i)
                out["t_offset_secs"].append(t)
                out["frame_fingerprint"].append(zlib.crc32(window) & 0xFFFFFFFF)
        return pa.table(
            {
                self.key_col: pa.array(out["key"]),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "t_offset_secs": pa.array(out["t_offset_secs"], pa.float64()),
                "frame_fingerprint": pa.array(out["frame_fingerprint"], pa.int64()),
            }
        )


class ImageFeatureExtractor:
    """Actor-pool stage: docs batch -> exploded image-feature rows.

    Real plumbing: explodes the nested ``images`` list<struct> column into
    one row per image with (url, image_id, filename, mime_sniffed, n_bytes,
    width, height). Pixel decode beyond header probing is where PIL would
    plug in. Small ``batch_size`` is the operating assumption — rows carry
    binary payloads (SURVEY.md §7.4 wide-row note).
    """

    def __init__(self, images_col: str = "images", key_col: str = "url") -> None:
        self.images_col = images_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        images_col = batch.column(self.images_col).to_pylist()
        out = {
            "url": [], "image_id": [], "filename": [],
            "mime_sniffed": [], "n_bytes": [], "width": [], "height": [],
        }
        for key, images in zip(keys, images_col):
            for img in images or []:
                data = img.get("content") or b""
                dims = probe_image_dimensions(data) if data else None
                out["url"].append(key)
                out["image_id"].append(img.get("id") or "")
                out["filename"].append(img.get("filename") or "")
                out["mime_sniffed"].append(sniff_image_mime(data) or "")
                out["n_bytes"].append(len(data))
                out["width"].append(dims[0] if dims else None)
                out["height"].append(dims[1] if dims else None)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "image_id": pa.array(out["image_id"], pa.string()),
                "filename": pa.array(out["filename"], pa.string()),
                "mime_sniffed": pa.array(out["mime_sniffed"], pa.string()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
            }
        )
