"""MIME taxonomy: the fixed universe of types this engine dispatches on.

Functional analog of the reference's hand-maintained MIME tables
(/root/reference/src/docler/mime_types.py:10-174) and ``check_mime``
(/root/reference/src/docler/utils.py:49-77), at comparable breadth: the
full extension map plus grouped families (text-like, office, image, audio,
video) so any real corpus's long tail resolves to a known type. Content
sniffing is magic-byte based so it can run vectorized over an Arrow binary
column without trusting file extensions; extension lookup exists for the
path-driven ingest route. Types and magics are standard IANA / file-format
values (public knowledge).

Dispatch contract: the extract stage routes every TEXTY_MIME_TYPES member
without a dedicated extractor to ``text_passthrough`` (so csv/rst/org/tex
corpora degrade to readable text instead of error rows); binary families
(office/image/audio/video) without a registered extractor produce per-row
errors — honest, since their parsers need libs absent from this
environment (SURVEY.md environment constraints).
"""

from __future__ import annotations

HTML_MIME = "text/html"
PDFISH_MIME = "application/x-pdfish"
PDF_MIME = "application/pdf"
TEXT_MIME = "text/plain"
MARKDOWN_MIME = "text/markdown"
XML_MIME = "application/xml"
JSON_MIME = "application/json"
UNKNOWN_MIME = "application/octet-stream"
ZIP_MIME = "application/zip"
OLE2_MIME = "application/x-ole-storage"  # legacy MS Office container
MSWORD_MIME = "application/msword"
MSEXCEL_MIME = "application/vnd.ms-excel"
MSPOWERPOINT_MIME = "application/vnd.ms-powerpoint"
ODT_MIME = "application/vnd.oasis.opendocument.text"
RTF_MIME = "application/rtf"
EPUB_MIME = "application/epub+zip"

DOCX_MIME = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
XLSX_MIME = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
PPTX_MIME = "application/vnd.openxmlformats-officedocument.presentationml.presentation"

# --- families ----------------------------------------------------------------

TEXTY_MIME_TYPES: frozenset[str] = frozenset(
    {
        TEXT_MIME,
        MARKDOWN_MIME,
        "text/csv",
        "text/tab-separated-values",
        "text/x-rst",
        "text/x-org",
        "text/x-python",
        "text/css",
        "text/javascript",
        XML_MIME,
        "text/xml",
        JSON_MIME,
        "application/x-ndjson",
        "application/x-latex",
        "application/x-bibtex",
        "application/x-ipynb+json",
    }
)

OFFICE_MIME_TYPES: frozenset[str] = frozenset(
    {
        DOCX_MIME,
        XLSX_MIME,
        PPTX_MIME,
        "application/msword",
        "application/vnd.ms-excel",
        "application/vnd.ms-excel.sheet.macroEnabled.12",
        "application/vnd.ms-excel.sheet.binary.macroEnabled.12",
        "application/vnd.ms-excel.addin.macroEnabled.12",
        "application/vnd.ms-excel.template.macroEnabled.12",
        "application/vnd.ms-powerpoint",
        "application/vnd.oasis.opendocument.text",
        "application/vnd.oasis.opendocument.spreadsheet",
        "application/vnd.oasis.opendocument.presentation",
        "application/rtf",
        "application/epub+zip",
    }
)

IMAGE_MIME_TYPES: frozenset[str] = frozenset(
    {
        "image/png",
        "image/jpeg",
        "image/pjpeg",
        "image/gif",
        "image/bmp",
        "image/x-bmp",
        "image/x-ms-bmp",
        "image/tiff",
        "image/x-tiff",
        "image/webp",
        "image/jp2",
        "image/jpx",
        "image/jpm",
        "image/mj2",
        "image/svg+xml",
        "image/x-portable-anymap",
        "image/x-portable-bitmap",
        "image/x-portable-graymap",
        "image/x-portable-pixmap",
    }
)

AUDIO_MIME_TYPES: frozenset[str] = frozenset(
    {
        "audio/mpeg",
        "audio/mp3",
        "audio/wav",
        "audio/x-wav",
        "audio/webm",
        "audio/ogg",
        "audio/flac",
        "audio/m4a",
        "audio/aac",
    }
)

VIDEO_MIME_TYPES: frozenset[str] = frozenset(
    {
        "video/mp4",
        "video/mpeg",
        "video/webm",
        "video/quicktime",
        "video/x-msvideo",
        "video/x-matroska",
    }
)

SUPPORTED_MIME_TYPES: frozenset[str] = (
    frozenset({HTML_MIME, PDFISH_MIME, PDF_MIME})
    | TEXTY_MIME_TYPES
    | OFFICE_MIME_TYPES
    | IMAGE_MIME_TYPES
    | AUDIO_MIME_TYPES
    | VIDEO_MIME_TYPES
)

EXT_TO_MIME: dict[str, str] = {
    # markup / text
    ".html": HTML_MIME,
    ".htm": HTML_MIME,
    ".xhtml": HTML_MIME,
    ".txt": TEXT_MIME,
    ".text": TEXT_MIME,
    ".md": MARKDOWN_MIME,
    ".markdown": MARKDOWN_MIME,
    ".rst": "text/x-rst",
    ".org": "text/x-org",
    ".csv": "text/csv",
    ".tsv": "text/tab-separated-values",
    ".xml": XML_MIME,
    ".json": JSON_MIME,
    ".ndjson": "application/x-ndjson",
    ".jsonl": "application/x-ndjson",
    ".tex": "application/x-latex",
    ".bib": "application/x-bibtex",
    ".ipynb": "application/x-ipynb+json",
    ".py": "text/x-python",
    ".css": "text/css",
    ".js": "text/javascript",
    # documents
    ".pdf": PDF_MIME,
    ".pdfish": PDFISH_MIME,
    ".rtf": "application/rtf",
    ".epub": "application/epub+zip",
    ".docx": DOCX_MIME,
    ".doc": "application/msword",
    ".odt": "application/vnd.oasis.opendocument.text",
    # spreadsheets
    ".xlsx": XLSX_MIME,
    ".xls": "application/vnd.ms-excel",
    ".xlsm": "application/vnd.ms-excel.sheet.macroEnabled.12",
    ".xlsb": "application/vnd.ms-excel.sheet.binary.macroEnabled.12",
    ".xlam": "application/vnd.ms-excel.addin.macroEnabled.12",
    ".xla": "application/vnd.ms-excel.template.macroEnabled.12",
    ".ods": "application/vnd.oasis.opendocument.spreadsheet",
    # presentations
    ".pptx": PPTX_MIME,
    ".ppt": "application/vnd.ms-powerpoint",
    ".odp": "application/vnd.oasis.opendocument.presentation",
    # images
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".gif": "image/gif",
    ".bmp": "image/bmp",
    ".tiff": "image/tiff",
    ".tif": "image/tiff",
    ".webp": "image/webp",
    ".jp2": "image/jp2",
    ".jpx": "image/jpx",
    ".jpm": "image/jpm",
    ".mj2": "image/mj2",
    ".svg": "image/svg+xml",
    ".pnm": "image/x-portable-anymap",
    ".pbm": "image/x-portable-bitmap",
    ".pgm": "image/x-portable-graymap",
    ".ppm": "image/x-portable-pixmap",
    # audio / video
    ".mp3": "audio/mpeg",
    ".wav": "audio/wav",
    ".ogg": "audio/ogg",
    ".flac": "audio/flac",
    ".m4a": "audio/m4a",
    ".aac": "audio/aac",
    ".mp4": "video/mp4",
    ".mpeg": "video/mpeg",
    ".mpg": "video/mpeg",
    ".webm": "video/webm",
    ".mov": "video/quicktime",
    ".avi": "video/x-msvideo",
    ".mkv": "video/x-matroska",
}

# Magic prefixes for payload sniffing (pdfish magics defined by this engine,
# see docler_ray/pdfish/format.py; the rest are the standard file signatures).
PDFISH_MAGIC = b"PDFISH01"
PDFISH_ENCRYPTED_MAGIC = b"PDFISHEN"
PDF_MAGIC = b"%PDF"

_BINARY_MAGICS: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", OLE2_MIME),
    (b"PK\x03\x04", ZIP_MIME),
    (b"fLaC", "audio/flac"),
    (b"OggS", "audio/ogg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),  # EBML (webm/mkv)
)


def _looks_like_bmp(head: bytes) -> bool:
    """'BM' is 2 ASCII letters, so require the header's reserved fields
    (bytes 6-9, always zero in real BMPs) — otherwise any text starting
    with 'BM...' would misclassify as an image and become an error row."""
    return (
        head.startswith(b"BM")
        and len(head) >= 14
        and head[6:10] == b"\x00\x00\x00\x00"
    )


def _looks_like_id3(head: bytes) -> bool:
    """'ID3' is 3 ASCII letters; require a plausible ID3v2 header: major
    version <= 10, version bytes != 0xFF, and the sync-safe size bytes'
    high bits clear (the ID3v2 spec)."""
    return (
        head.startswith(b"ID3")
        and len(head) >= 10
        and head[3] <= 10
        and head[4] != 0xFF
        and all(b < 0x80 for b in head[6:10])
    )


def _sniff_zip(payload: bytes) -> str:
    """Disambiguate a PK-magic payload: OOXML office formats are zip
    archives whose part layout names the format (word/ = docx, ppt/ = pptx,
    xl/ = xlsx). Reads only the central directory (end of the in-memory
    payload) — no part decompression; a torn or non-archive PK payload
    stays application/zip."""
    import io
    import zipfile

    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            names = zf.namelist()
            # ODF / EPUB archives carry a literal `mimetype` member
            # (stored first, uncompressed) naming the format exactly
            if "mimetype" in names:
                declared = zf.read("mimetype").strip().decode("ascii", "replace")
                if declared == EPUB_MIME or declared.startswith(
                    "application/vnd.oasis.opendocument."
                ):
                    return declared
    except Exception:
        return ZIP_MIME
    for name in names:
        if name.startswith("word/"):
            return DOCX_MIME
        if name.startswith("ppt/"):
            return PPTX_MIME
        if name.startswith("xl/"):
            return XLSX_MIME
    return ZIP_MIME


def _sniff_ole2(payload: bytes) -> str:
    """Disambiguate an OLE2-magic payload by its CFB directory streams
    (WordDocument = .doc, Workbook = .xls, PowerPoint Document = .ppt) —
    the legacy-office analog of ``_sniff_zip``'s part-layout sniff. Reads
    only the FAT + directory chain; a torn container stays x-ole-storage."""
    from docler_ray.office.ole2 import sniff_ole2

    return sniff_ole2(payload) or OLE2_MIME


def sniff_mime(payload: bytes) -> str:
    """Classify a raw page payload by magic bytes / content shape.

    Replaces the reference's extension-driven ``mimetypes.guess_type`` path
    (/root/reference/src/docler/converters/base.py:269) — Common-Crawl URLs
    have no trustworthy extensions, so we sniff content. ZIP-based office
    formats sniff as application/zip and OLE2 (legacy Office) as
    x-ole-storage: telling docx from xlsx needs the archive listing, which
    the extension route (``mime_from_extension``) disambiguates when a path
    is available.
    """
    if not payload:
        return UNKNOWN_MIME
    head = payload[:256]
    if head.startswith(b"PK\x03\x04"):
        return _sniff_zip(payload)
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        return _sniff_ole2(payload)
    if head.startswith(PDFISH_MAGIC) or head.startswith(PDFISH_ENCRYPTED_MAGIC):
        return PDFISH_MIME
    if head.startswith(PDF_MAGIC):
        return PDF_MIME
    if head[:4] == b"RIFF" and len(head) >= 12:
        sub = head[8:12]
        if sub == b"WAVE":
            return "audio/wav"
        if sub == b"WEBP":
            return "image/webp"
        return UNKNOWN_MIME
    for magic, mime in _BINARY_MAGICS:
        if head.startswith(magic):
            return mime
    if _looks_like_bmp(head):
        return "image/bmp"
    if _looks_like_id3(head):
        return "audio/mpeg"
    # mp4 family: size-prefixed 'ftyp' box at offset 4
    if len(head) >= 12 and head[4:8] == b"ftyp":
        return "video/mp4"
    # BOM'd text (UTF-16/32 HTML interleaves NULs through the ASCII magic):
    # decode the head with the BOM codec, then re-run the markup checks
    from docler_ray.html.charset import bom_codec

    bc = bom_codec(head)
    if bc is not None:
        decoded = payload[:512].decode(
            "utf-8" if bc == "utf-8-sig" else bc, "replace"
        ).lstrip("\ufeff")  # the BOM char itself is not "printable"
        # a BOM prefix alone is NOT evidence (binary noise can start
        # \xff\xfe, and noise decoded as UTF-16 is mostly PRINTABLE CJK \u2014
        # no printability ratio separates it from real CJK text): the BOM
        # branch only upgrades on MARKUP evidence; BOM'd plain text falls
        # through to the byte rules (conservative: stays binary, exactly
        # the pre-charset-ladder verdict)
        dl = decoded.lstrip("\ufeff \t\r\n").lower()
        if dl.startswith(("<!doctype html", "<html")) or "<html" in dl:
            return HTML_MIME
        if dl.startswith("<?xml"):
            return XML_MIME
    lowered = head.lstrip()[:64].lower()
    if (
        lowered.startswith(b"<!doctype html")
        or lowered.startswith(b"<html")
        or b"<html" in head.lower()
    ):
        return HTML_MIME
    if lowered.startswith(b"<?xml"):
        return XML_MIME
    # Heuristic: mostly-printable utf-8 => text.
    try:
        head.decode("utf-8")
    except UnicodeDecodeError:
        return UNKNOWN_MIME
    if lowered.startswith(b"{\\rtf"):
        return RTF_MIME
    if lowered.startswith((b"{", b"[")):
        return JSON_MIME
    return TEXT_MIME


def mime_from_extension(path: str) -> str | None:
    """Extension -> MIME lookup against the fixed table (None if unknown)."""
    dot = path.rfind(".")
    if dot < 0:
        return None
    return EXT_TO_MIME.get(path[dot:].lower())


def check_mime(
    path: str,
    *,
    allowed_mime_types: frozenset[str] | set[str] | None = None,
    raise_if_none_found: bool = False,
) -> str | None:
    """Extension -> MIME with allow-list validation (the reference's
    ``check_mime`` contract, utils.py:49-77, resolved against THIS module's
    table instead of the stdlib mimetypes registry so dispatch and
    validation can never disagree).

    ``path`` may be a filename or a bare extension (".pdf").
    """
    path_str = path if not path.startswith(".") else f"file{path}"
    mime = mime_from_extension(path_str)
    if mime is None and raise_if_none_found:
        msg = f"Could not determine MIME type for {path}"
        raise ValueError(msg)
    if allowed_mime_types and mime not in allowed_mime_types:
        # reference semantics: an undetermined type also fails the allow-list
        msg = f"Invalid MIME type: {mime}. Allowed types: {sorted(allowed_mime_types)}"
        raise ValueError(msg)
    return mime
