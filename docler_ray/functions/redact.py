"""PII redaction: email / IPv4 scrubbing as a stateless map pass.

The standard pre-training hygiene operator (C4/RefinedWeb-style PII
masking). Zero shuffle — a pure per-document rewrite, so the 100-TB shape
is trivially right; the only contract that matters is DETERMINISM and
cross-engine reproducibility of the patterns.

The patterns are deliberately restricted to a regex subset with identical
semantics in Python ``re`` and RE2-style engines (DuckDB
``regexp_replace(..., 'g')``): character classes, bounded repetition,
no backreferences, no lookaround, no ``\\b`` (word-boundary handling is
done with explicit guards instead where needed). The driver oracle runs
the SAME patterns through DuckDB and pins the rewritten text
byte-for-byte; ``tests/test_redact.py`` additionally pins
Python-vs-DuckDB equivalence on adversarial synthetic strings (the
corpus itself is PII-free, so the in-corpus oracle proves the no-op
contract and the unit tests prove the rewrite contract).
"""

from __future__ import annotations

import re

import pyarrow as pa

# Kept RE2-safe AND Python-re-identical; see module docstring.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_IPV4_RE = re.compile(IPV4_PATTERN)


def redact_text(text: str) -> tuple[str, int, int]:
    """Scrub emails then IPv4s; returns (redacted, n_emails, n_ips).
    Order matters (an email's host part may contain digit runs): the
    oracle applies the same order."""
    out, n_email = _EMAIL_RE.subn(EMAIL_TOKEN, text or "")
    out, n_ip = _IPV4_RE.subn(IP_TOKEN, out)
    return out, n_email, n_ip


class Redactor:
    """documents batch -> (id, text_redacted, n_emails, n_ips)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, n_es, n_is = [], [], []
        for t in batch.column(self.text_col).to_pylist():
            o, ne, ni = redact_text(t)
            outs.append(o)
            n_es.append(ne)
            n_is.append(ni)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "text_redacted": pa.array(outs, pa.string()),
                "n_emails": pa.array(n_es, pa.int64()),
                "n_ips": pa.array(n_is, pa.int64()),
            }
        )


def redact(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(
        Redactor(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
