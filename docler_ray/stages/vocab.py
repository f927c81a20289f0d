"""Vocabulary induction: corpus-wide adjacent-symbol-pair counting — the
statistic behind byte-pair encoding's merge step (Sennrich et al.,
arXiv:1508.07909 §3: the most frequent adjacent pair becomes the next
merge).

Scale shape: the pair DOMAIN is alphabet-bounded (<= 26^2 for lowercase
ASCII words), so each batch reduces to a <= 676-row partial count via one
numpy ``bincount`` over the batch's concatenated bytes — zero per-character
Python — and the trailing groupby sums O(676 x blocks) tiny rows. Driver
state is the final 676-row table: constant in corpus size, which is why the
top-k runs on the driver instead of paying a top-k operator's merge.

Tokenization contract (mirrored by the DuckDB oracle): words are maximal
``[a-z]+`` runs of the lowercased text; pairs are the adjacent character
pairs INSIDE each word, counted per occurrence. The numpy spelling —
mask adjacent byte positions where both bytes are lowercase letters —
counts exactly those pairs because a non-letter byte breaks every pair it
touches, and documents are joined with a non-letter separator so no pair
spans documents.

No reference precedent (docler has no corpus-level operators, SURVEY.md
§2.7); this is the tokenizer-training primitive of the training-data tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PAIR_DOMAIN = 256 * 256

# the BPE word contract shared by train_bpe, bpe_encode_stats and their
# tests: maximal lowercase [a-z]+ runs of the lowercased text
import re as _re

_BPE_WORD_RE = _re.compile(r"[a-z]+")


def pair_counts_batch(texts: list[str]) -> np.ndarray:
    """Dense 256x256 count vector of adjacent lowercase-letter byte pairs
    within [a-z]+ runs, one fused numpy pass over the whole batch."""
    joined = "\n".join(t or "" for t in texts).lower()
    codes = np.frombuffer(joined.encode("utf-8", "replace"), dtype=np.uint8)
    if codes.size < 2:
        return np.zeros(_PAIR_DOMAIN, dtype=np.int64)
    is_alpha = (codes >= 97) & (codes <= 122)
    valid = is_alpha[:-1] & is_alpha[1:]
    pair_ids = (
        codes[:-1].astype(np.int64) * 256 + codes[1:].astype(np.int64)
    )[valid]
    return np.bincount(pair_ids, minlength=_PAIR_DOMAIN).astype(np.int64)


def top_symbol_pairs(ds, *, text_col: str = "text", k: int = 20):
    """Corpus top-k adjacent character pairs -> (pair, n, rank) Arrow table.

    One stateless map pass emitting a sparse (pair, partial_n) table per
    batch, a pair-keyed groupby-sum (alphabet-bounded exchange), then a
    driver-side rank over the <= 676 final rows. Ties rank lexicographic
    ascending so the result is total-ordered and oracle-stable.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts = pair_counts_batch(batch.column(text_col).to_pylist())
        nz = np.nonzero(counts)[0]
        pairs = [chr(p >> 8) + chr(p & 0xFF) for p in nz]
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "partial_n": pa.array(counts[nz], pa.int64()),
            }
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair")
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # alphabet-bounded: <= 676 rows at any corpus size
    )
    totals = totals.sort_values(
        ["n", "pair"], ascending=[False, True]
    ).reset_index(drop=True)
    totals["rank"] = np.arange(1, len(totals) + 1, dtype=np.int64)
    top = totals.head(k)
    return pa.table(
        {
            "pair": pa.array(top["pair"], pa.string()),
            "n": pa.array(top["n"], pa.int64()),
            "rank": pa.array(top["rank"], pa.int64()),
        }
    )


def unk_stats(ds, *, text_col: str = "text", vocab_k: int = 10):
    """Tokenizer-coverage check: if the vocabulary were the corpus's exact
    top-``vocab_k`` tokens, how many token occurrences fall outside it?

    -> one row (vocab_size, total_tokens, unk_tokens), all exact integers.

    Composition of existing machinery: the exact heavy-hitter operator
    (stages/frequent.py, MG sketch + recount) selects the vocabulary; the
    vocab set broadcasts once (``ray.put``, vocab_k-bounded); one stateless
    map pass emits 2-int partials per batch that a tiny Sum aggregate
    folds. Tokenization = frequent.py's lowercase [a-z0-9]+ runs.
    """
    import ray
    from ray.data.aggregate import Sum

    from docler_ray.stages.frequent import _TOKEN_RE, top_tokens
    from docler_ray.stages.joins import _get_broadcast

    vocab_tbl = top_tokens(ds, text_col, k=vocab_k)
    vocab_ref = ray.put(set(vocab_tbl.column("token").to_pylist()))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vocab: set[str] = _get_broadcast(vocab_ref)
        # vectorized tokenization: split the lowered text on non-token runs
        # == maximal [a-z0-9]+ runs (findall's tokens), empties filtered;
        # equality-vs-vocab via one is_in kernel over the flat token array
        low = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
        flat = toks.combine_chunks().flatten() if isinstance(
            toks, pa.ChunkedArray
        ) else toks.flatten()
        nonempty = pc.not_equal(flat, "")
        total = pc.sum(pc.cast(nonempty, pa.int64())).as_py() or 0
        known = pc.sum(
            pc.cast(
                pc.and_(
                    nonempty,
                    pc.is_in(flat, value_set=pa.array(sorted(vocab))),
                ),
                pa.int64(),
            )
        ).as_py() or 0
        return pa.table(
            {
                "partial_total": pa.array([total], pa.int64()),
                "partial_unk": pa.array([total - known], pa.int64()),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("partial_total", alias_name="total_tokens"),
        Sum("partial_unk", alias_name="unk_tokens"),
    )
    return pa.table(
        {
            "vocab_size": pa.array([vocab_tbl.num_rows], pa.int64()),
            "total_tokens": pa.array([agg["total_tokens"] or 0], pa.int64()),
            "unk_tokens": pa.array([agg["unk_tokens"] or 0], pa.int64()),
        }
    )


# --- full BPE training (iterative; oracle-exempt by design) -------------------

def _bpe_merges_from_word_counts(
    word_counts: "list[tuple[str, int]]", n_merges: int, min_pair_count: int
) -> "list[tuple[int, str, str, int]]":
    """Reference BPE merge loop (Sennrich 1508.07909 algorithm 1) over a
    (word, count) table: words start as character-symbol sequences; each
    round merges the count-weighted most frequent adjacent symbol pair
    (ties broken lexicographically on (left, right) — deterministic).
    Returns [(rank, left, right, pair_count)]. Pure function, also used
    by the brute-force test oracle."""
    from collections import Counter

    seqs: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_counts if w
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, int(cnt)))
        tgt = left + right
        new_seqs = []
        for sym, c in seqs:
            i, out = 0, []
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(tgt)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs.append((out, c))
        seqs = new_seqs
    return merges


def train_bpe(
    ds,
    *,
    text_col: str = "text",
    n_merges: int = 40,
    max_words: int = 100_000,
    min_pair_count: int = 2,
):
    """Corpus-scale BPE vocabulary training (Sennrich et al. 1508.07909).

    The scale split mirrors how production tokenizer trainers work: the
    corpus-proportional step is WORD COUNTING — per-batch Counter partials
    into one word-keyed exchange — and the iterative merge loop runs on
    the compact (word, count) table, truncated to the ``max_words`` most
    frequent words (bounded driver state; HF tokenizers / sentencepiece
    train from exactly this word-frequency representation). Tokens are
    lowercase [a-z]+ runs (the top_symbol_pairs contract).

    Iterative + data-dependent => genuinely non-SQL-expressible (the
    sanctioned oracle exemption); correctness is pinned by a brute-force
    equivalence test and determinism goldens. Returns a Dataset
    [(rank, left, right, pair_count)] of at most ``n_merges`` merges.
    """
    import ray.data
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            counts.update(_BPE_WORD_RE.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    wc = (
        ds.map_batches(word_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    # bounded truncation: top max_words by (count desc, word) — vocabulary
    # tables are huge at web scale, the trainer's working set must not be
    top = wc.sort(["cnt", "word"], descending=[True, False]).limit(max_words)
    rows = top.to_pandas()  # <= max_words rows by construction
    merges = _bpe_merges_from_word_counts(
        list(zip(rows["word"], rows["cnt"].astype(int))), n_merges, min_pair_count
    )
    table = pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )
    return ray.data.from_arrow(table)


def _encode_word(word: str, ranks: dict) -> int:
    """Number of BPE pieces for one word under a trained merge table
    (apply merges greedily by rank — the standard BPE encode loop)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def bpe_encode_stats(
    ds, *, text_col: str = "text", id_col: str = "doc_id", n_merges: int = 30
):
    """Full tokenizer lifecycle at corpus scale: train BPE on the corpus
    (train_bpe — one word-keyed exchange + bounded driver merge loop),
    broadcast the merge table once, then encode the corpus in a single
    zero-shuffle map pass, emitting (doc_id, n_words, n_pieces) per doc.
    Per-batch word->piece-count cache turns per-occurrence encoding into
    per-distinct-word encoding (corpora repeat words heavily). Model
    scoring -> rows-only by the sanctioned exemption; pinned by the
    brute-force encode test."""
    import ray

    merges = train_bpe(ds, text_col=text_col, n_merges=n_merges).to_pandas()
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ranks_ref = ray.put(ranks)

    def encode(batch: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        cache: dict[str, int] = {}
        n_words_out: list[int] = []
        n_pieces_out: list[int] = []
        for t in batch.column(text_col).to_pylist():
            words = _BPE_WORD_RE.findall((t or "").lower())
            total = 0
            for w in words:
                p = cache.get(w)
                if p is None:
                    p = cache[w] = _encode_word(w, rk)
                total += p
            n_words_out.append(len(words))
            n_pieces_out.append(total)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_words": pa.array(n_words_out, pa.int64()),
                "n_pieces": pa.array(n_pieces_out, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
