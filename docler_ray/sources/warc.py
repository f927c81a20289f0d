"""WARC ingestion: Common-Crawl-style web archives -> the pages table.

The engine's canonical input is the pages Parquet table
(url, warc_ts, html, text, lang — sources/synth.py), but Common Crawl
ships WARC (ISO 28500): one archive file per crawl shard holding
``response`` records (the raw HTTP capture) and — in the WET sibling —
``conversion`` records (the crawler's plain-text rendering). This module
reads that format directly into the pages shape so the flagship pipeline
(extract_pipeline.build_pages_dataset) can run over .warc/.warc.gz shards
with the same checkpoint/lineage machinery as Parquet shards (shard ==
file there too; the manifest hashes the file path).

Reference parity: the reference ingests individual files/URLs per call
(src/docler/converters/base.py convert_file / convert_files); WARC is the
bulk-crawl equivalent of that file surface, re-expressed as a Ray Data
source.

Format notes (public spec, ISO 28500 / WARC 1.1):
- A record is ``WARC/1.1\r\n`` + header lines + CRLF CRLF + exactly
  Content-Length payload bytes + CRLF CRLF.
- ``.warc.gz`` concatenates one gzip MEMBER per record (seekability);
  Python's gzip.decompress handles multi-member streams natively.
- response records carry ``application/http; msgtype=response`` payloads:
  an HTTP status line + headers + CRLF CRLF + entity body (the html
  column). ``Content-Language`` maps to lang.
- conversion records (WET) carry text/plain payloads keyed back to the
  response by WARC-Target-URI; they fill the text column.

Scale shape: one WARC file is one read task (Common Crawl shards are
~1 GiB, the standard processing granularity) — read_binary_files yields
whole files, parse_warc is a single linear pass, and per-task memory is
bounded by the file size, never the corpus. Lineage: the output carries
the source path per row, same as the Parquet read's include_paths=True.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import io

import pyarrow as pa

from docler_ray.sources.synth import PAGES_SCHEMA

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
_WARC_DATE_FMT_NOFRAC = "%Y-%m-%dT%H:%M:%SZ"


# --- writing (deterministic synthesis for tests/benchmarks) ------------------

def _record(warc_type: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
    lines = [b"WARC/1.1", f"WARC-Type: {warc_type}".encode()]
    for k, v in headers:
        if "\r" in v or "\n" in v:
            raise ValueError(f"header value for {k} contains CR/LF: {v[:60]!r}")
        lines.append(f"{k}: {v}".encode())
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _HDR_END + payload + _HDR_END


def _record_id(*parts: str) -> str:
    h = hashlib.md5("\x00".join(parts).encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _warc_date(ts: _dt.datetime) -> str:
    return ts.strftime(_WARC_DATE_FMT)


def warc_bytes_for_pages(rows: list[dict], *, gzip_members: bool = True) -> bytes:
    """Serialize pages rows (url/warc_ts/html/text/lang dicts) as a WARC
    archive: a warcinfo record, then per page one response record (html as
    the HTTP entity body, lang as Content-Language) and one WET-style
    conversion record (the text column). Deterministic byte-for-byte in
    the input (record ids derive from the url)."""
    out = io.BytesIO()

    def emit(rec: bytes) -> None:
        out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)

    info_payload = b"software: docler_ray warc writer\r\nformat: WARC/1.1\r\n"
    emit(
        _record(
            "warcinfo",
            [
                ("WARC-Record-ID", _record_id("warcinfo", str(len(rows)))),
                ("WARC-Date", _warc_date(_dt.datetime(2026, 1, 1))),
                ("Content-Type", "application/warc-fields"),
            ],
            info_payload,
        )
    )
    for row in rows:
        ts = row["warc_ts"]
        if not isinstance(ts, _dt.datetime):
            ts = ts.as_py() if hasattr(ts, "as_py") else _dt.datetime.fromisoformat(str(ts))
        html = row["html"]
        if not isinstance(html, bytes):
            html = bytes(html)
        if "\r" in row["lang"] or "\n" in row["lang"]:
            raise ValueError(f"lang contains CR/LF: {row['lang']!r}")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: application/octet-stream\r\n"
            + f"Content-Language: {row['lang']}\r\n".encode()
            + f"Content-Length: {len(html)}\r\n".encode()
            + _CRLF
            + html
        )
        emit(
            _record(
                "response",
                [
                    ("WARC-Record-ID", _record_id("response", row["url"])),
                    ("WARC-Date", _warc_date(ts)),
                    ("WARC-Target-URI", row["url"]),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
        emit(
            _record(
                "conversion",
                [
                    ("WARC-Record-ID", _record_id("conversion", row["url"])),
                    ("WARC-Refers-To", _record_id("response", row["url"])),
                    ("WARC-Date", _warc_date(ts)),
                    ("WARC-Target-URI", row["url"]),
                    ("Content-Type", "text/plain"),
                ],
                (row["text"] or "").encode("utf-8"),
            )
        )
    return out.getvalue()


def write_warc_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    rows_per_shard: int = 10_000,
    gzip_members: bool = True,
) -> list[str]:
    """write_pages_corpus's WARC twin: the SAME deterministic pages
    (synth.page_record) as .warc.gz shards with identical shard
    boundaries, so a pipeline run over either format must produce
    byte-identical docs."""
    import os

    from docler_ray.sources.synth import page_record

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"
    paths: list[str] = []
    shard = 0
    for start in range(0, n_rows, rows_per_shard):
        n = min(rows_per_shard, n_rows - start)
        path = os.path.join(out_dir, f"pages-{shard:05d}{ext}")
        if not os.path.exists(path):
            rows = [page_record(i, seed) for i in range(start, start + n)]
            data = warc_bytes_for_pages(rows, gzip_members=gzip_members)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        paths.append(path)
        shard += 1
    return paths


# --- parsing ------------------------------------------------------------------

def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line: {line[:60]!r}")
        # WARC 1.1 header values may be UTF-8 (spec §4); decoding latin-1
        # would mojibake non-ASCII target URIs silently
        headers[k.decode("utf-8").strip().lower()] = v.decode("utf-8").strip()
    return headers


def _parse_warc_date(s: str) -> _dt.datetime:
    for fmt in (_WARC_DATE_FMT, _WARC_DATE_FMT_NOFRAC):
        try:
            return _dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable WARC-Date: {s!r}")


def iter_warc_records(data: bytes):
    """Yield (warc_headers: dict, payload: bytes) per record. Fails loud on
    framing errors (truncated payload, missing version line) — a corrupt
    archive should fail its shard, not silently drop records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    end = len(data)
    while pos < end:
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        block = data[pos:hdr_end]
        version, _, rest = block.partition(_CRLF)
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}, got {version[:20]!r}")
        headers = _parse_headers(rest)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad Content-Length in record at offset {pos}") from exc
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + length
        if body_end + len(_HDR_END) > end:
            raise ValueError(f"truncated record payload at offset {pos}")
        if data[body_end : body_end + len(_HDR_END)] != _HDR_END:
            raise ValueError(f"missing record terminator at offset {body_end}")
        yield headers, data[body_start:body_end]
        pos = body_end + len(_HDR_END)


def parse_warc_pages(data: bytes, path: str = "") -> pa.Table:
    """One WARC archive -> a pages table (+ path lineage column).

    response records become rows (html = HTTP entity body, lang =
    Content-Language, falling back to the conversion record's
    WARC-Identified-Content-Language); conversion records fill text for
    the matching WARC-Target-URI, wherever they appear in the archive
    (the merge is order-independent; rows come out in response-record
    order; a response with SEVERAL conversion records keeps the last). A
    pure WET shard (conversion records only — how Common Crawl actually
    ships the text sibling) yields text-only rows (html=b'') in record
    order, one row PER conversion record (duplicate URIs preserved, so
    export_wet output re-ingests losslessly). A MIXED archive with a
    conversion record whose response is absent fails loud — that's
    corruption, not a WET shard. The URI->row merge state is file-bounded
    (one archive), never corpus-bounded.
    """
    order: list[str] = []
    rows: dict[str, dict] = {}
    # last (text, ts, lang) per URI for the mixed-archive attach
    conversions: dict[str, tuple[str, _dt.datetime, str]] = {}
    # every conversion record in order for the pure-WET path
    conv_rows: list[dict] = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri", "")
        if rtype == "response":
            sep = payload.find(_HDR_END)
            if sep < 0:
                raise ValueError(f"response record for {uri!r} has no HTTP header block")
            http_headers = _parse_headers(payload[payload.find(_CRLF) + 2 : sep])
            if uri in rows:
                raise ValueError(f"duplicate response record for {uri!r}")
            order.append(uri)
            rows[uri] = {
                "url": uri,
                "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
                "html": payload[sep + len(_HDR_END) :],
                "text": "",
                "lang": http_headers.get("content-language", ""),
            }
        elif rtype == "conversion":
            text = payload.decode("utf-8")
            ts = _parse_warc_date(headers.get("warc-date", ""))
            # the header Common Crawl WET uses for detected language
            lang = headers.get("warc-identified-content-language", "")
            conversions[uri] = (text, ts, lang)
            conv_rows.append(
                {"url": uri, "warc_ts": ts, "html": b"", "text": text, "lang": lang}
            )
        # warcinfo / request / metadata records are not page content: skip
    if rows:
        dangling = [u for u in conversions if u not in rows]
        if dangling:
            raise ValueError(
                f"conversion record(s) without a response record: {dangling[:3]!r}"
            )
        for uri, (text, _ts, lang) in conversions.items():
            rows[uri]["text"] = text
            if not rows[uri]["lang"]:
                rows[uri]["lang"] = lang
        out_rows = [rows[u] for u in order]
    else:
        # pure WET shard: text-only pages, one row per record
        out_rows = conv_rows
    cols = {name: [r[name] for r in out_rows] for name in PAGES_SCHEMA.names}
    table = pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)
    return table.append_column(
        "path", pa.array([path] * len(out_rows), pa.string())
    )


def read_warc(paths: list[str]):
    """WARC shards -> pages Dataset (url, warc_ts, html, text, lang, path).

    One file per parse task (batch_size=1): per-task memory is one
    archive, matching Common Crawl's ~1 GiB shard granularity, and block
    count == shard count so downstream stages see the same block shape as
    the Parquet route's per-file blocks.
    """
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_warc_pages(data.as_py(), p.as_py())
            for data, p in zip(batch.column("bytes"), batch.column("path"))
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(
        parse, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
    )


def export_wet(
    ds,
    out_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
    lang_col: str | None = None,
    gzip_members: bool = True,
):
    """WET sink: write a docs/pages Dataset back out as WET-style archives
    (conversion records only — the text sibling format Common Crawl
    publishes), one ``.warc.gz`` shard per task. Round-trips through
    :func:`read_warc`, which ingests a pure-WET shard as text-only pages,
    so exported corpora re-enter the engine losslessly.

    One shard per map task (output parallelism == pipeline parallelism,
    the export_jsonl convention; a failed run resumes by shard). Shard
    names are the md5 of the shard BYTES — deterministic for a
    deterministic input partitioning, and distinct content can never
    collide (identical content overwrites with identical bytes). Two
    blocks with byte-identical content (duplicate docs pre-dedup)
    intentionally coalesce to one shard; the returned manifest still
    lists each block's (path, n_records) row. Returns that manifest as a
    Dataset; consuming it drives the streaming write.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"
    base_ts = _dt.datetime(2026, 1, 1)

    def write_shard(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if not n:
            return pa.table(
                {"path": pa.array([], pa.string()), "n_records": pa.array([], pa.int64())}
            )
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        tss = batch.column(ts_col).to_pylist() if ts_col else [base_ts] * n
        langs = batch.column(lang_col).to_pylist() if lang_col else [""] * n
        rows = [
            {
                "url": u or "",
                "warc_ts": ts if ts is not None else base_ts,
                "html": b"",
                "text": t or "",
                "lang": lg or "",
            }
            for u, t, ts, lg in zip(urls, texts, tss, langs)
        ]
        out = io.BytesIO()
        for row in rows:
            hdrs = [
                ("WARC-Record-ID", _record_id("conversion", row["url"])),
                ("WARC-Date", _warc_date(row["warc_ts"])),
                ("WARC-Target-URI", row["url"]),
                ("Content-Type", "text/plain"),
            ]
            if row["lang"]:
                # the header Common Crawl WET uses for detected language
                hdrs.append(("WARC-Identified-Content-Language", row["lang"]))
            rec = _record(
                "conversion",
                hdrs,
                row["text"].encode("utf-8"),
            )
            out.write(gzip.compress(rec, mtime=0) if gzip_members else rec)
        # name shards by the CONTENT hash: distinct shard bytes can never
        # collide (a same-content overwrite rewrites identical bytes), so
        # duplicate first-urls across blocks cannot silently lose a shard
        shard = hashlib.md5(out.getvalue()).hexdigest()[:16]
        path = os.path.join(out_dir, f"wet-{shard}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out.getvalue())
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "n_records": pa.array([n], pa.int64())}
        )

    return ds.map_batches(
        write_shard, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
