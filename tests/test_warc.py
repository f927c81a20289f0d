"""WARC source: round-trip fidelity, framing strictness, and the contract
that matters — a pipeline run over WARC shards produces byte-identical
docs to the same pages read from Parquet (the format is lineage, not
semantics). Reference analog: the reference's file-surface tests
(/root/reference/tests/test_converters.py) pin per-file conversion; here
the "file" is a Common-Crawl archive shard.
"""

from __future__ import annotations

import gzip

import pandas as pd
import pyarrow as pa
import pytest

from docler_ray.sources.synth import PAGES_SCHEMA, generate_pages_table, page_record
from docler_ray.sources.warc import (
    iter_warc_records,
    parse_warc_pages,
    warc_bytes_for_pages,
    write_warc_corpus,
)

N = 120


def _rows(n: int = N) -> list[dict]:
    return [page_record(i, seed=7) for i in range(n)]


@pytest.mark.parametrize("gzip_members", [True, False])
def test_warc_round_trip(gzip_members):
    rows = _rows()
    data = warc_bytes_for_pages(rows, gzip_members=gzip_members)
    table = parse_warc_pages(data, path="shard-0")
    want = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    got = table.drop_columns(["path"])
    assert got.schema.equals(want.schema)
    assert got.equals(want)  # byte-identical html, text, lang, us-precision ts
    assert table.column("path").to_pylist() == ["shard-0"] * len(rows)


def test_warc_writer_deterministic():
    rows = _rows(30)
    assert warc_bytes_for_pages(rows) == warc_bytes_for_pages(rows)


def test_warc_gzip_members_are_individually_seekable():
    """Each record is its own gzip member (the .warc.gz contract that makes
    archives range-readable): the stream must contain one member per
    record, i.e. more than one magic header."""
    data = warc_bytes_for_pages(_rows(5))
    assert data.count(b"\x1f\x8b\x08") >= 11  # warcinfo + 5*(response+conversion)
    # and single-shot multi-member decompression still parses
    assert len(parse_warc_pages(data)) == 5


def test_warc_framing_errors_fail_loud():
    rows = _rows(3)
    plain = warc_bytes_for_pages(rows, gzip_members=False)
    with pytest.raises(ValueError, match="truncated|terminator"):
        list(iter_warc_records(plain[:-10]))
    with pytest.raises(ValueError, match="version"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n"))
    # duplicate response record for one URI is corpus corruption
    dup = rows + [rows[0]]
    with pytest.raises(ValueError, match="duplicate"):
        parse_warc_pages(warc_bytes_for_pages(dup, gzip_members=False))


def test_warc_missing_conversion_record_yields_empty_text():
    rows = _rows(2)
    data = warc_bytes_for_pages(rows, gzip_members=False)
    # drop the conversion records wholesale by re-emitting only response ones
    kept = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") == "conversion":
            continue
        kept.append((headers, payload))
    from docler_ray.sources.warc import _CRLF, _HDR_END  # framing constants

    out = b""
    for headers, payload in kept:
        lines = [b"WARC/1.1"] + [
            f"{k}: {v}".encode() for k, v in headers.items() if k != "content-length"
        ]
        lines.append(f"Content-Length: {len(payload)}".encode())
        out += _CRLF.join(lines) + _HDR_END + payload + _HDR_END
    table = parse_warc_pages(out)
    assert table.column("text").to_pylist() == ["", ""]
    assert table.column("html").to_pylist() == [r["html"] for r in rows]


def _reframe(records) -> bytes:
    """Re-emit (headers, payload) pairs as a plain WARC stream."""
    from docler_ray.sources.warc import _CRLF, _HDR_END

    out = b""
    for headers, payload in records:
        lines = [b"WARC/1.1"] + [
            f"{k}: {v}".encode() for k, v in headers.items() if k != "content-length"
        ]
        lines.append(f"Content-Length: {len(payload)}".encode())
        out += _CRLF.join(lines) + _HDR_END + payload + _HDR_END
    return out


def test_warc_conversion_before_response_still_attaches():
    """The WET merge is order-independent: a conversion record that
    precedes its response must still fill text."""
    rows = _rows(3)
    data = warc_bytes_for_pages(rows, gzip_members=False)
    recs = list(iter_warc_records(data))
    # move all conversion records to the FRONT (after warcinfo)
    conv = [r for r in recs if r[0].get("warc-type") == "conversion"]
    rest = [r for r in recs if r[0].get("warc-type") != "conversion"]
    table = parse_warc_pages(_reframe(rest[:1] + conv + rest[1:]))
    assert table.column("text").to_pylist() == [r["text"] for r in rows]
    assert table.column("url").to_pylist() == [r["url"] for r in rows]


def test_warc_pure_wet_shard_yields_text_only_pages():
    """A WET shard (conversion records only — how Common Crawl ships the
    text sibling) must ingest as text-only pages, not silently drop."""
    rows = _rows(4)
    data = warc_bytes_for_pages(rows, gzip_members=False)
    recs = list(iter_warc_records(data))
    conv_only = [r for r in recs if r[0].get("warc-type") in ("warcinfo", "conversion")]
    table = parse_warc_pages(_reframe(conv_only))
    assert len(table) == 4
    assert table.column("text").to_pylist() == [r["text"] for r in rows]
    assert table.column("html").to_pylist() == [b""] * 4
    assert table.column("lang").to_pylist() == [""] * 4


def test_warc_dangling_conversion_in_mixed_archive_fails_loud():
    rows = _rows(2)
    data = warc_bytes_for_pages(rows, gzip_members=False)
    recs = list(iter_warc_records(data))
    # drop ONE response record, keep both conversions -> corruption
    dropped = [
        r
        for r in recs
        if not (
            r[0].get("warc-type") == "response"
            and r[0].get("warc-target-uri") == rows[0]["url"]
        )
    ]
    with pytest.raises(ValueError, match="without a response"):
        parse_warc_pages(_reframe(dropped))


def test_warc_non_ascii_url_round_trips():
    row = page_record(0, seed=7)
    row["url"] = "https://café.example/fr/doc-ü"
    table = parse_warc_pages(warc_bytes_for_pages([row]))
    assert table.column("url").to_pylist() == [row["url"]]


def test_warc_crlf_in_header_values_rejected():
    row = page_record(0, seed=7)
    row["url"] = "https://evil.example/\r\nWARC-Type: response"
    with pytest.raises(ValueError, match="CR/LF"):
        warc_bytes_for_pages([row])
    row2 = page_record(1, seed=7)
    row2["lang"] = "en\r\nX-Injected: 1"
    with pytest.raises(ValueError, match="CR/LF"):
        warc_bytes_for_pages([row2])


def test_read_warc_dataset_matches_parquet_read(ray_session, tmp_path):
    """read_warc over .warc.gz shards == the Parquet pages table."""
    import pyarrow.parquet as pq

    from docler_ray.sources.warc import read_warc

    paths = write_warc_corpus(str(tmp_path), N, seed=7, rows_per_shard=50)
    assert len(paths) == 3 and paths[0].endswith(".warc.gz")
    got = (
        read_warc(paths)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        generate_pages_table(N, seed=7)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["path"].map(lambda p: p.endswith((".warc", ".warc.gz"))).all()
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        pd.testing.assert_series_equal(got[col], want[col], check_names=True)


def test_pipeline_over_warc_equals_parquet(ray_session, tmp_path):
    """The flagship job over WARC shards writes byte-identical docs to the
    same job over Parquet shards — format is transparent to extraction,
    checkpoint manifests, and lineage."""
    from docler_ray.pipelines.extract_pipeline import (
        PipelineConfig,
        run_extract_job,
    )
    from docler_ray.sources.synth import write_pages_corpus

    n = 150
    pq_dir, warc_dir = str(tmp_path / "pq"), str(tmp_path / "warc")
    pq_files = write_pages_corpus(pq_dir, n, seed=11, rows_per_shard=75)
    warc_files = write_warc_corpus(warc_dir, n, seed=11, rows_per_shard=75)

    cfg = PipelineConfig(extract_concurrency=2)
    out_pq, out_warc = str(tmp_path / "out_pq"), str(tmp_path / "out_warc")
    t1 = run_extract_job(pq_files, out_pq, cfg)
    t2 = run_extract_job(warc_files, out_warc, cfg)
    assert t1["docs"] == t2["docs"] and t1["errors"] == t2["errors"]

    import pyarrow.parquet as pq

    def docs_df(out):
        df = pq.read_table(f"{out}/docs").to_pandas()
        df["images"] = df["images"].map(
            lambda v: None if v is None else str(list(v))
        )
        return (
            df.drop(columns=["path", "shard_id"], errors="ignore")
            .sort_values("url")
            .reset_index(drop=True)
        )

    a, b = docs_df(out_pq), docs_df(out_warc)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b)

    # manifests exist for every WARC shard (resume machinery format-blind)
    import os

    manifests = os.listdir(f"{out_warc}/manifests")
    assert len([m for m in manifests if m.endswith(".json")]) >= 2


def test_export_wet_round_trips_through_read_warc(ray_session, tmp_path):
    """export_wet -> .warc.gz WET shards -> read_warc re-ingests the same
    (url, text) set as text-only pages (html=b'', lang preserved when a
    lang column is exported)."""
    import ray.data

    from docler_ray.sources.warc import export_wet, read_warc

    docs = [
        {"url": f"https://h{i % 3}.example/doc-{i}", "text": f"doc body {i}\nline two {i}", "lang": "en" if i % 2 else "fr"}
        for i in range(40)
    ]
    ds = ray.data.from_items(docs)
    out = str(tmp_path / "wet")
    manifest = export_wet(ds, out, lang_col="lang").to_pandas()
    assert manifest["n_records"].sum() == 40
    assert all(p.endswith(".warc.gz") for p in manifest["path"])

    back = read_warc(sorted(manifest["path"].tolist())).to_pandas()
    assert len(back) == 40
    got = back.sort_values("url")[["url", "text", "lang"]].reset_index(drop=True)
    want = (
        pd.DataFrame(docs)
        .sort_values("url")[["url", "text", "lang"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (back["html"].map(len) == 0).all()


def test_export_wet_duplicate_urls_round_trip(ray_session, tmp_path):
    """Duplicate urls (pre-dedup docs) must survive the export->re-ingest
    round trip: one row per conversion record, no dict collapse, and
    identical-content blocks coalesce to one shard without data loss."""
    import ray.data

    from docler_ray.sources.warc import export_wet, read_warc

    docs = [
        {"url": "https://h.example/same", "text": "first copy"},
        {"url": "https://h.example/same", "text": "second copy"},
        {"url": "https://h.example/other", "text": "unique"},
    ]
    out = str(tmp_path / "wet")
    manifest = export_wet(ray.data.from_items(docs), out).to_pandas()
    assert manifest["n_records"].sum() == 3
    back = read_warc(sorted(set(manifest["path"]))).to_pandas()
    assert sorted(back["text"]) == ["first copy", "second copy", "unique"]


def test_warc_mixed_archive_lang_falls_back_to_wet_header():
    """Response without Content-Language + conversion carrying
    WARC-Identified-Content-Language -> lang comes from the WET header."""
    from docler_ray.sources.warc import _CRLF, _HDR_END, _record, _record_id

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n" + _CRLF + b"hi"
    )
    recs = _record(
        "response",
        [
            ("WARC-Record-ID", _record_id("response", "u1")),
            ("WARC-Date", "2026-01-01T00:00:00.000000Z"),
            ("WARC-Target-URI", "https://x.example/a"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    ) + _record(
        "conversion",
        [
            ("WARC-Record-ID", _record_id("conversion", "u1")),
            ("WARC-Date", "2026-01-01T00:00:00.000000Z"),
            ("WARC-Target-URI", "https://x.example/a"),
            ("Content-Type", "text/plain"),
            ("WARC-Identified-Content-Language", "deu"),
        ],
        b"hallo",
    )
    table = parse_warc_pages(recs)
    assert table.column("lang").to_pylist() == ["deu"]
    assert table.column("text").to_pylist() == ["hallo"]
