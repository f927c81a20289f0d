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
