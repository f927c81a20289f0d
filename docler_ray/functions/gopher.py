"""Gopher-style document-level quality rules (Rae et al., arXiv:2112.11446
§A.1.1), rebuilt with exactly SQL-mirrorable definitions.

Where C4 (functions/textclean.py) filters LINES, Gopher filters whole
DOCUMENTS on corpus statistics: word count bounds, mean word length,
symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-token
fraction, and a minimum stopword hit count. Every rule below is a pure
function whose Python and DuckDB spellings are structurally identical —
words are ``[a-zA-Z]+`` regex matches (= ``regexp_extract_all``), tokens
are single-space splits (= ``string_split(x, ' ')``), substring counts are
left-to-right non-overlapping (``str.count`` = length-delta / pattern
length), and every ratio guard (`n > 0 AND ...`) appears in both spellings
— so the oracle replays the whole filter and pins each rule's boolean
per document.

No reference precedent (docler never filters content); this is the
training-data quality tier next to the C4 line filter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

_WORD_RE = re.compile(r"[a-zA-Z]+")
_ALPHA_RE = re.compile(r"[a-zA-Z]")

# Gopher's "must contain >= 2 of these" stopword probe
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOP_RES = {w: re.compile(rf"\b{w}\b") for w in STOPWORDS}


@dataclass(frozen=True)
class GopherConfig:
    """Published Gopher constants as defaults; every knob explicit."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_word_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_token_frac: float = 0.8
    min_stopword_hits: int = 2


def gopher_signals(text: str, cfg: GopherConfig) -> dict:
    """One document -> rule booleans + keep. Pure, no corpus state."""
    words = _WORD_RE.findall(text)
    n_words = len(words)
    ok_word_count = cfg.min_words <= n_words <= cfg.max_words

    total_len = sum(len(w) for w in words)
    ok_mean_word_len = n_words > 0 and (
        cfg.min_mean_word_len <= total_len / n_words <= cfg.max_mean_word_len
    )

    n_symbols = text.count("#") + text.count("...")
    ok_symbol_ratio = (
        n_words > 0 and n_symbols / n_words <= cfg.max_symbol_word_ratio
    )

    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(
        1 for ln in lines if ln.startswith("- ") or ln.startswith("* ")
    )
    ok_bullet_lines = n_bullet / n_lines <= cfg.max_bullet_line_frac
    n_ellipsis = sum(1 for ln in lines if ln.endswith("..."))
    ok_ellipsis_lines = n_ellipsis / n_lines <= cfg.max_ellipsis_line_frac

    tokens = text.split(" ")
    n_alpha = sum(1 for t in tokens if _ALPHA_RE.search(t))
    ok_alpha_tokens = n_alpha / len(tokens) >= cfg.min_alpha_token_frac

    low = text.lower()
    stop_hits = sum(1 for w in STOPWORDS if _STOP_RES[w].search(low))
    ok_stopwords = stop_hits >= cfg.min_stopword_hits

    keep = (
        ok_word_count
        and ok_mean_word_len
        and ok_symbol_ratio
        and ok_bullet_lines
        and ok_ellipsis_lines
        and ok_alpha_tokens
        and ok_stopwords
    )
    return {
        "n_words": n_words,
        "ok_word_count": ok_word_count,
        "ok_mean_word_len": ok_mean_word_len,
        "ok_symbol_ratio": ok_symbol_ratio,
        "ok_bullet_lines": ok_bullet_lines,
        "ok_ellipsis_lines": ok_ellipsis_lines,
        "ok_alpha_tokens": ok_alpha_tokens,
        "ok_stopwords": ok_stopwords,
        "keep": keep,
    }


_BOOL_COLS = (
    "ok_word_count",
    "ok_mean_word_len",
    "ok_symbol_ratio",
    "ok_bullet_lines",
    "ok_ellipsis_lines",
    "ok_alpha_tokens",
    "ok_stopwords",
    "keep",
)


class GopherFlags:
    """Actor-pool map_batches callable: documents batch -> (id, n_words,
    per-rule booleans, keep). Regexes are module-level compiled once per
    process; the per-row loop is inherent to content rules and stays
    inside one batch."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        cfg: GopherConfig | None = None,
    ) -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.cfg = cfg or GopherConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            gopher_signals(t or "", self.cfg)
            for t in batch.column(self.text_col).to_pylist()
        ]
        out = pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_words": pa.array(
                    [r["n_words"] for r in rows], type=pa.int64()
                ),
            }
        )
        for c in _BOOL_COLS:
            out = out.append_column(
                c, pa.array([r[c] for r in rows], type=pa.bool_())
            )
        return out


def gopher_flags(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: GopherConfig | None = None,
    concurrency: tuple[int, int] | int | None = (1, 4),
):
    """Dataset -> per-document rule flags. Stateless zero-shuffle pass.

    Default concurrency is an AUTOSCALING (1, 4) pool: a fixed-size pool
    of c actors deadlocks a c-CPU cluster (all CPUs pinned by idle actors,
    none left for the upstream read task — observed as a 4-actor pool
    starving ReadParquet forever under ``num_cpus=4``)."""
    return ds.map_batches(
        GopherFlags,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "cfg": cfg,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def gopher_sql(
    cfg: GopherConfig,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """The DuckDB replay of :func:`gopher_flags` — used by the oracle AND
    the adversarial equivalence tests so the two spellings cannot drift."""
    stop_terms = " + ".join(
        f"CASE WHEN regexp_matches(lower(t), '\\b{w}\\b') THEN 1 ELSE 0 END"
        for w in STOPWORDS
    )
    return f"""
WITH base AS (
  SELECT {id_col},
    {text_col} AS t,
    regexp_extract_all({text_col}, '[a-zA-Z]+') AS words,
    string_split({text_col}, chr(10)) AS lines,
    string_split({text_col}, ' ') AS toks
  FROM {table}
), m AS (
  SELECT {id_col}, t, lines, toks,
    CAST(array_length(words) AS BIGINT) AS n_words,
    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0)
      AS BIGINT) AS total_len,
    CAST(length(t) - length(replace(t, '#', '')) AS BIGINT)
      + CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT)
      AS n_symbols,
    CAST(array_length(lines) AS BIGINT) AS n_lines,
    CAST(coalesce(list_sum(list_transform(lines, x ->
      CASE WHEN starts_with(x, '- ') OR starts_with(x, '* ')
      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_bullet,
    CAST(coalesce(list_sum(list_transform(lines, x ->
      CASE WHEN suffix(x, '...') THEN 1 ELSE 0 END)), 0) AS BIGINT)
      AS n_ellipsis,
    CAST(coalesce(list_sum(list_transform(toks, x ->
      CASE WHEN regexp_matches(x, '[a-zA-Z]') THEN 1 ELSE 0 END)), 0)
      AS BIGINT) AS n_alpha,
    CAST(array_length(toks) AS BIGINT) AS n_toks,
    CAST({stop_terms} AS BIGINT) AS stop_hits
  FROM base
), f AS (
  SELECT {id_col}, n_words,
    (n_words >= {cfg.min_words} AND n_words <= {cfg.max_words})
      AS ok_word_count,
    (n_words > 0 AND total_len / n_words >= {cfg.min_mean_word_len}
      AND total_len / n_words <= {cfg.max_mean_word_len})
      AS ok_mean_word_len,
    (n_words > 0 AND n_symbols / n_words <= {cfg.max_symbol_word_ratio})
      AS ok_symbol_ratio,
    (n_bullet / n_lines <= {cfg.max_bullet_line_frac}) AS ok_bullet_lines,
    (n_ellipsis / n_lines <= {cfg.max_ellipsis_line_frac})
      AS ok_ellipsis_lines,
    (n_alpha / n_toks >= {cfg.min_alpha_token_frac}) AS ok_alpha_tokens,
    (stop_hits >= {cfg.min_stopword_hits}) AS ok_stopwords
  FROM m
)
SELECT {id_col}, n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
  ok_bullet_lines, ok_ellipsis_lines, ok_alpha_tokens, ok_stopwords,
  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
   AND ok_bullet_lines AND ok_ellipsis_lines AND ok_alpha_tokens
   AND ok_stopwords) AS keep
FROM f
"""
