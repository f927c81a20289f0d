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


def _per_doc_sums(flat_bools, offsets) -> "object":
    """Sum a flat per-element boolean array back to per-document counts
    using the list array's offsets (numpy ``add.reduceat``)."""
    import numpy as np

    vals = flat_bools.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.asarray(offsets)
    starts = offsets[:-1]
    n_docs = len(starts)
    out = np.zeros(n_docs, dtype=np.int64)
    nonempty = offsets[1:] > starts
    if vals.size:
        red = np.add.reduceat(vals, np.minimum(starts, vals.size - 1))
        out[nonempty] = red[nonempty]
    return out


class GopherFlags:
    """Actor-pool map_batches callable: documents batch -> (id, n_words,
    per-rule booleans, keep) — fully VECTORIZED (round-3 rewrite of the
    per-row loop; this filter runs over the whole corpus, so the hot path
    is Arrow kernels + numpy, zero Python per row).

    Bit-equivalence with :func:`gopher_signals` / the SQL replay:
    word/char counts use the same RE2-safe ``[a-zA-Z]+`` classes
    (``count_substring_regex`` counts the same non-overlapping maximal
    runs as ``re.findall``); ``#``/``...`` use ``count_substring``
    (= ``str.count`` left-to-right non-overlapping); line and token rules
    split with the same separators and reduce per-doc via list offsets;
    stopword probes run ``\\b``-anchored RE2 on the lowercased text —
    identical to Python ``re`` on ASCII text (the engines diverge only on
    non-ASCII word-boundary adjacency, where the SQL oracle is also RE2,
    so batch output matches the ORACLE by construction; pinned on
    adversarial corpora in tests/test_gopher.py)."""

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
        import numpy as np
        import pyarrow.compute as pc

        cfg = self.cfg
        text = pc.fill_null(batch.column(self.text_col), "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        n_words = pc.count_substring_regex(text, "[a-zA-Z]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        total_len = pc.count_substring_regex(text, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_symbols = (
            pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
            + pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
        ).astype(np.int64)

        # line rules: split on \n, evaluate flat, reduce per doc
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        line_offsets = lines.offsets.to_numpy(zero_copy_only=False)
        flat_lines = lines.flatten()
        n_lines = np.diff(line_offsets).astype(np.int64)
        bullet = pc.or_(
            pc.starts_with(flat_lines, "- "), pc.starts_with(flat_lines, "* ")
        )
        n_bullet = _per_doc_sums(bullet, line_offsets)
        n_ellipsis = _per_doc_sums(
            pc.ends_with(flat_lines, "..."), line_offsets
        )

        # token rule: split on single spaces (str.split(" ") semantics)
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        tok_offsets = toks.offsets.to_numpy(zero_copy_only=False)
        n_toks = np.diff(tok_offsets).astype(np.int64)
        n_alpha = _per_doc_sums(
            pc.match_substring_regex(toks.flatten(), "[a-zA-Z]"), tok_offsets
        )

        low = pc.utf8_lower(text)
        stop_hits = np.zeros(len(batch), dtype=np.int64)
        for w in STOPWORDS:
            stop_hits += pc.match_substring_regex(
                low, rf"\b{w}\b"
            ).to_numpy(zero_copy_only=False)

        ok_word_count = (n_words >= cfg.min_words) & (n_words <= cfg.max_words)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_len = total_len / np.maximum(n_words, 1)
        ok_mean_word_len = (
            (n_words > 0)
            & (mean_len >= cfg.min_mean_word_len)
            & (mean_len <= cfg.max_mean_word_len)
        )
        ok_symbol_ratio = (n_words > 0) & (
            n_symbols / np.maximum(n_words, 1) <= cfg.max_symbol_word_ratio
        )
        ok_bullet = n_bullet / n_lines <= cfg.max_bullet_line_frac
        ok_ellipsis = n_ellipsis / n_lines <= cfg.max_ellipsis_line_frac
        ok_alpha = n_alpha / n_toks >= cfg.min_alpha_token_frac
        ok_stop = stop_hits >= cfg.min_stopword_hits
        keep = (
            ok_word_count
            & ok_mean_word_len
            & ok_symbol_ratio
            & ok_bullet
            & ok_ellipsis
            & ok_alpha
            & ok_stop
        )
        cols = {
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(n_words, pa.int64()),
        }
        for name, arr in zip(
            _BOOL_COLS,
            (
                ok_word_count,
                ok_mean_word_len,
                ok_symbol_ratio,
                ok_bullet,
                ok_ellipsis,
                ok_alpha,
                ok_stop,
                keep,
            ),
        ):
            cols[name] = pa.array(arr, pa.bool_())
        return pa.table(cols)


def gopher_flags(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: GopherConfig | None = None,
    concurrency: tuple[int, int] | int | None = None,
):
    """Dataset -> per-document rule flags. Stateless zero-shuffle pass.

    Runs as a plain TASK pool by default: the round-3 vectorized rewrite
    left no per-actor state to amortize, and an actor pool here only adds
    spinup latency (measured ~2 s of a 2.5 s query) plus a deadlock
    hazard (a fixed c-actor pool on a c-CPU cluster pins every CPU under
    idle actors and starves the upstream read task — observed under
    ``num_cpus=4``). Pass ``concurrency`` to force an actor pool."""
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(
            GopherFlags,
            fn_constructor_kwargs={
                "text_col": text_col,
                "id_col": id_col,
                "cfg": cfg,
            },
            **kwargs,
        )
    fn = GopherFlags(text_col=text_col, id_col=id_col, cfg=cfg)
    return ds.map_batches(fn, **kwargs)


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
    coalesce({text_col}, '') AS t,
    regexp_extract_all(coalesce({text_col}, ''), '[a-zA-Z]+') AS words,
    string_split(coalesce({text_col}, ''), chr(10)) AS lines,
    string_split(coalesce({text_col}, ''), ' ') AS toks
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
