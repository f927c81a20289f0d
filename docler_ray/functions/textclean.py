"""C4-style line-level text cleaning (Raffel et al., arXiv:1910.10683 §2.2).

The C4 recipe filters a web corpus at two granularities: LINE rules (keep a
line only if it is long enough, ends like a sentence, and carries no banned
boilerplate substring) and DOCUMENT rules (drop the whole page if it
contains a placeholder-text or source-code marker). Both are rebuilt here as
pure functions with an exactly SQL-mirrorable definition — word counts use
single-space ``split(' ')`` (= DuckDB ``string_split(x, ' ')``), substring
checks are lowercase ``contains``, and the terminal-punctuation rule is the
RE2 class ``[.!?"]$`` — so the DuckDB oracle replays the whole filter with
``list_filter`` lambdas and pins the rewritten text byte-for-byte.

No reference precedent (docler normalizes markdown, it never filters
content); this is the training-data cleaning tier.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

_TERMINAL_RE = re.compile(r'[.!?"]$')


@dataclass(frozen=True)
class LineFilterConfig:
    """Parameterized C4-style rules. C4's published constants are
    ``min_words=5`` + terminal punctuation + banned boilerplate phrases;
    the defaults here keep those shapes but every knob is explicit because
    the useful values are corpus-dependent."""

    min_words: int = 5
    require_terminal_punct: bool = True
    banned_line_substrings: tuple[str, ...] = ("javascript", "cookie policy")
    banned_doc_substrings: tuple[str, ...] = ("lorem ipsum", "{")

    def __post_init__(self) -> None:
        for s in self.banned_line_substrings + self.banned_doc_substrings:
            if s != s.lower():
                raise ValueError(f"banned substrings must be lowercase: {s!r}")


def keep_line(line: str, cfg: LineFilterConfig) -> bool:
    """One line's verdict. ``split(' ')`` (NOT ``split()``) so the count
    matches ``array_length(string_split(x, ' '))`` exactly, empties
    included."""
    if len(line.split(" ")) < cfg.min_words:
        return False
    if cfg.require_terminal_punct and not _TERMINAL_RE.search(line):
        return False
    low = line.lower()
    return all(b not in low for b in cfg.banned_line_substrings)


def clean_document(text: str, cfg: LineFilterConfig) -> tuple[str, int, int, bool]:
    """-> (cleaned text, kept lines, total lines, doc_banned). A banned
    document still reports its line stats; the Dataset stage decides whether
    to drop the row."""
    low = text.lower()
    banned = any(b in low for b in cfg.banned_doc_substrings)
    lines = text.split("\n")
    kept = [ln for ln in lines if keep_line(ln, cfg)]
    return "\n".join(kept), len(kept), len(lines), banned


def line_filter(
    ds,
    *,
    text_col: str = "text",
    cfg: LineFilterConfig | None = None,
    drop_banned_docs: bool = True,
):
    """Dataset stage: rewrite ``text_col`` to its kept lines, append
    ``n_lines_kept`` / ``n_lines_total``, and (by default) drop documents
    hitting a document-level ban. Stateless zero-shuffle map pass; the
    per-line loop is inherent to a content-rewriting rule but stays inside
    one batch (no driver involvement, no materialization)."""
    cfg = cfg or LineFilterConfig()

    def apply(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        cleaned: list[str] = []
        n_kept: list[int] = []
        n_total: list[int] = []
        keep_row: list[bool] = []
        for t in texts:
            c, k, n, banned = clean_document(t or "", cfg)
            cleaned.append(c)
            n_kept.append(k)
            n_total.append(n)
            keep_row.append(not banned)
        idx = batch.schema.get_field_index(text_col)
        out = batch.set_column(idx, text_col, pa.array(cleaned, type=pa.string()))
        out = out.append_column("n_lines_kept", pa.array(n_kept, type=pa.int64()))
        out = out.append_column("n_lines_total", pa.array(n_total, type=pa.int64()))
        if drop_banned_docs:
            out = out.filter(pa.array(keep_row))
        return out

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def line_filter_sql(
    source_expr: str,
    cfg: LineFilterConfig,
    *,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """The DuckDB replay of :func:`line_filter` over ``source_expr`` (an SQL
    expression producing the text to clean). Used by the oracle AND by the
    adversarial equivalence tests, so Python and SQL can never drift apart
    silently."""
    conds = [f"array_length(string_split(x, ' ')) >= {cfg.min_words}"]
    if cfg.require_terminal_punct:
        conds.append("regexp_matches(x, '[.!?\"]$')")
    for b in cfg.banned_line_substrings:
        esc = b.replace("'", "''")
        conds.append(f"NOT contains(lower(x), '{esc}')")
    line_pred = " AND ".join(conds)
    doc_conds = []
    for b in cfg.banned_doc_substrings:
        esc = b.replace("'", "''")
        doc_conds.append(f"NOT contains(lower(src), '{esc}')")
    doc_pred = " AND ".join(doc_conds) if doc_conds else "TRUE"
    return (
        f"WITH src_t AS (SELECT {id_col}, {source_expr} AS src FROM {table}), "
        f"l AS (SELECT {id_col}, src, string_split(src, chr(10)) AS lines "
        f"FROM src_t WHERE {doc_pred}), "
        f"f AS (SELECT {id_col}, "
        f"list_filter(lines, x -> {line_pred}) AS kept, "
        f"array_length(lines) AS n_total FROM l) "
        # COALESCE: DuckDB's array_to_string returns NULL for an empty
        # list, Python's "\n".join([]) returns '' — pin the '' convention
        f"SELECT {id_col}, COALESCE(array_to_string(kept, chr(10)), '') AS text, "
        f"CAST(array_length(kept) AS BIGINT) AS n_lines_kept, "
        f"CAST(n_total AS BIGINT) AS n_lines_total FROM f"
    )


# --- whitespace / control-char normalization ---------------------------------

# Ordered rewrite rules, each RE2-safe and engine-identical: the Ray side
# runs them through Arrow's replace_substring_regex (RE2) and the oracle
# through DuckDB regexp_replace(..., 'g') (also RE2) — literally the same
# engine, so byte-identical output is a structural guarantee, not a hope.
# Classes are explicit ASCII (no \s: Python/RE2 disagree on Unicode there).
WS_NORM_RULES: tuple[tuple[str, str], ...] = (
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),  # strip control chars
    (r"\r\n", "\n"),  # CRLF -> LF
    (r"\r", "\n"),  # bare CR -> LF
    (r"[ \t]+", " "),  # collapse horizontal runs
    (r" ?\n ?", "\n"),  # trim around newlines
    (r"\n\n\n+", "\n\n"),  # squeeze blank-line runs
)


def normalize_ws(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace/control normalization as a fully VECTORIZED map pass:
    one chained RE2 rewrite per rule plus an edge trim, zero Python per
    row, zero shuffle. Emits (id, text_norm, n_chars_before,
    n_chars_after); the oracle replays the same rule list byte-for-byte.
    """
    import pyarrow.compute as pc

    def apply(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col), "")
        before = pc.cast(pc.utf8_length(text), pa.int64())
        out = text
        for pat, rep in WS_NORM_RULES:
            out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
        out = pc.utf8_trim(out, " \n")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_norm": out,
                "n_chars_before": before,
                "n_chars_after": pc.cast(pc.utf8_length(out), pa.int64()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def normalize_ws_sql(
    *, text_col: str = "text", id_col: str = "doc_id", table: str = "documents"
) -> str:
    """DuckDB replay of :func:`normalize_ws` — same rules, same order."""
    expr = f"coalesce({text_col}, '')"
    before = f"CAST(length({expr}) AS BIGINT) AS n_chars_before"
    out = expr
    for pat, rep in WS_NORM_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    out = f"trim({out}, ' ' || chr(10))"
    return (
        f"SELECT {id_col}, {before}, {out} AS text_norm, "
        f"CAST(length({out}) AS BIGINT) AS n_chars_after FROM {table}"
    )
