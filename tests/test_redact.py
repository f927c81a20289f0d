"""PII redaction: Python-vs-DuckDB pattern equivalence on adversarial
strings (the cross-engine contract the driver oracle relies on), plus
rewrite semantics."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from docler_ray.functions.redact import (
    EMAIL_PATTERN,
    IPV4_PATTERN,
    Redactor,
    redact_text,
)

ADVERSARIAL = [
    "",
    "plain text no pii",
    "contact john.doe+spam@sub.example.co.uk now",
    "a@b.co. trailing dot and a@b.c short tld",
    "ip 192.168.0.1 and bad 999.1.1.1 and embedded 1234.5.6.7",
    "edge 255.255.255.255 0.0.0.0 256.1.1.1",
    "email-at-ip style user@10.0.0.1x and x@y.zz",
    "double a@b.com c@d.org 10.1.2.3 10.1.2.300",
    "dots..everywhere..@..here 1.2.3.4.5.6",
    "UPPER@CASE.COM MiXeD@CaSe.Org",
]


def _duck(text: str) -> tuple[str, int, int]:
    con = duckdb.connect()
    row = con.execute(
        "SELECT regexp_replace(regexp_replace(t, ?, '<EMAIL>', 'g'), ?, '<IP>', 'g'), "
        "array_length(regexp_extract_all(t, ?)), "
        "array_length(regexp_extract_all(regexp_replace(t, ?, '<EMAIL>', 'g'), ?)) "
        "FROM (SELECT ? AS t)",
        [EMAIL_PATTERN, IPV4_PATTERN, EMAIL_PATTERN, EMAIL_PATTERN, IPV4_PATTERN, text],
    ).fetchone()
    return row[0], int(row[1]), int(row[2])


def test_python_duckdb_equivalence():
    for s in ADVERSARIAL:
        assert redact_text(s) == _duck(s), s


def test_rewrite_semantics():
    out, ne, ni = redact_text("mail a@b.com from 10.0.0.1")
    assert out == "mail <EMAIL> from <IP>"
    assert (ne, ni) == (1, 1)


def test_batch_shape():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x@y.zz at 1.2.3.4"], pa.string()),
        }
    )
    out = Redactor()(batch)
    assert out.column_names == ["doc_id", "text_redacted", "n_emails", "n_ips"]
    assert out.column("n_emails").to_pylist() == [1]
    assert out.column("n_ips").to_pylist() == [1]
