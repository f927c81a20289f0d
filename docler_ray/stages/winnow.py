"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD'03).

The MOSS selection rule: hash every word k-gram, slide a window of w
consecutive gram hashes, keep the minimum of each window (ties -> the
RIGHTMOST minimum), and the distinct selected positions form the document's
fingerprint set. Guarantee (the paper's Theorem 1 analog): any shared
substring of at least w + k - 1 words produces at least one shared
fingerprint, while the expected density is 2/(w+1) — a local, position-
independent signature, unlike fixed-stride sampling.

Zero-shuffle: fingerprinting is a stateless map over the corpus; each doc's
selection runs fully vectorized (one sliding_window_view min + a reversed
argmin for the rightmost-tie rule). Gram hashes are the repo's 52-bit md5
convention so the DuckDB oracle replays them bit-for-bit:
``('0x' || substr(md5(gram), 1, 13))::UBIGINT``.

No reference precedent (docler has no fingerprinting tier); the algorithm is
from the published paper only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from docler_ray.functions.tokens import ws_tokens

DEFAULT_K = 4  # words per gram
DEFAULT_W = 8  # grams per window


def gram_hashes(tokens: list[str], k: int = DEFAULT_K) -> np.ndarray:
    """52-bit md5 hash per word k-gram (space-joined), int64 ndarray.

    A doc with fewer than k tokens has no grams (empty array) — winnowing
    is defined on grams, and the paper's guarantee needs >= w+k-1 words
    anyway; short docs legitimately fingerprint to the empty set.
    """
    n = len(tokens) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        g = " ".join(tokens[i : i + k])
        out[i] = int(hashlib.md5(g.encode("utf-8", "replace")).hexdigest()[:13], 16)
    return out


def winnow_positions(h: np.ndarray, w: int = DEFAULT_W) -> np.ndarray:
    """Selected gram positions (sorted, distinct) under the SIGMOD'03 rule.

    Fewer than w grams -> the whole doc is one window (the paper's
    degenerate case): select the rightmost global minimum.
    """
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n < w:
        w = n
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost argmin: argmin of the reversed window is the FIRST minimum
    # from the right, so w-1-that is the rightmost minimum's offset
    right_off = w - 1 - np.argmin(win[:, ::-1], axis=1)
    sel = np.arange(len(win), dtype=np.int64) + right_off
    return np.unique(sel)


def winnow_profile(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
):
    """Per-document fingerprint profile: (id, n_grams, n_fp, fp_min,
    fp_xor, fp_sum) — the three reductions pin the exact selected MULTISET
    (hashes at distinct selected positions) without shipping it; fp_sum
    headroom: 52-bit hashes x <=2^11 selections stays < 2^63.

    Stateless zero-copy map pass; no exchange.
    """

    def prof(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        ng = np.empty(len(texts), dtype=np.int64)
        nf = np.empty(len(texts), dtype=np.int64)
        fmin = np.zeros(len(texts), dtype=np.int64)
        fxor = np.zeros(len(texts), dtype=np.int64)
        fsum = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = gram_hashes(ws_tokens(t or ""), k)
            sel = winnow_positions(h, w)
            ng[i] = len(h)
            nf[i] = len(sel)
            if len(sel):
                picked = h[sel]
                fmin[i] = picked.min()
                fxor[i] = np.bitwise_xor.reduce(picked)
                fsum[i] = picked.sum()
        return pa.table(
            {
                id_col: ids,
                "n_grams": pa.array(ng),
                "n_fp": pa.array(nf),
                "fp_min": pa.array(fmin),
                "fp_xor": pa.array(fxor),
                "fp_sum": pa.array(fsum),
            }
        )

    return ds.map_batches(prof, batch_format="pyarrow", zero_copy_batch=True)


def winnow_shared_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    min_shared: int = 2,
):
    """Document pairs sharing >= min_shared distinct fingerprint HASHES —
    the MOSS match step. Plan: the map pass emits each doc's DISTINCT
    selected hashes as (fp, id) postings; ONE fp-keyed int64 exchange
    groups co-owners; tiny groups (a fingerprint shared corpus-wide is
    boilerplate, handled by the hot-bucket cap) emit their C(g,2) pairs
    vectorized; a final (a,b)-keyed count groupby applies the threshold.

    Partitioning assumption: fingerprint buckets are near-uniform (md5);
    a fp owned by > _HOT_OWNER_CAP docs is dropped as boilerplate — the
    standard posting-list cap, documented so callers can raise it.
    """
    from ray.data.aggregate import Count

    _HOT_OWNER_CAP = 256

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        fps, owners = [], []
        for i, t in enumerate(texts):
            h = gram_hashes(ws_tokens(t or ""), k)
            sel = winnow_positions(h, w)
            if len(sel):
                uniq = np.unique(h[sel])
                fps.append(uniq)
                owners.append(np.full(len(uniq), ids[i], dtype=np.int64))
        if not fps:
            return pa.table(
                {"fp": pa.array([], pa.int64()), "owner": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "fp": pa.array(np.concatenate(fps)),
                "owner": pa.array(np.concatenate(owners)),
            }
        )

    post = ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _coarse_allpairs(post, [], owner_cap=_HOT_OWNER_CAP)
    counted = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_shared"))
    return counted.filter(
        expr=f"n_shared >= {int(min_shared)}"
    )


def containment_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    num: int = 4,
    den: int = 5,
    owner_cap: int = 256,
):
    """Broder containment pairs (the ASYMMETRIC sibling of resemblance,
    Broder SEQUENCES'97 §2): C(A,B) = |S(A) ∩ S(B)| / |S(A)| over distinct
    word k-gram shingle sets — the score that catches a short document
    QUOTED inside a long one, which Jaccard dilutes away. Emits (a, b,
    n_shared, n_a, n_b) for pairs whose containment in EITHER direction
    reaches num/den, tested as the exact integer cross-multiply
    n_shared * den >= num * min(n_a, n_b).

    Plan: each posting row carries its owner's distinct-gram COUNT as
    payload, so pair emission inside the gram group yields (a, b, n_a,
    n_b) directly and NO doc-level join ever happens; one gram-keyed
    exchange (md5-uniform, owners > owner_cap dropped as boilerplate) +
    one (a, b, n_a, n_b) count exchange."""
    from ray.data.aggregate import Count

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        fps, owners, counts = [], [], []
        for i, t in enumerate(texts):
            uniq = np.unique(gram_hashes(ws_tokens(t or ""), k))
            if len(uniq):
                fps.append(uniq)
                owners.append(np.full(len(uniq), ids[i], dtype=np.int64))
                counts.append(np.full(len(uniq), len(uniq), dtype=np.int64))
        if not fps:
            return pa.table(
                {
                    "fp": pa.array([], pa.int64()),
                    "owner": pa.array([], pa.int64()),
                    "n_own": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "fp": pa.array(np.concatenate(fps)),
                "owner": pa.array(np.concatenate(owners)),
                "n_own": pa.array(np.concatenate(counts)),
            }
        )

    post = ds.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _coarse_allpairs(post, ["n_own"], owner_cap=owner_cap)
    counted = pairs.groupby(["a", "b", "n_own_a", "n_own_b"]).aggregate(
        Count(alias_name="n_shared")
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_a = batch.column("n_own_a")
        n_b = batch.column("n_own_b")
        mn = pc.min_element_wise(n_a, n_b)
        ok = pc.greater_equal(
            pc.multiply(batch.column("n_shared"), den), pc.multiply(mn, num)
        )
        out = batch.filter(ok)
        return pa.table(
            {
                "a": out.column("a"),
                "b": out.column("b"),
                "n_shared": out.column("n_shared"),
                "n_a": out.column("n_own_a"),
                "n_b": out.column("n_own_b"),
            }
        )

    return counted.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _coarse_allpairs(post, value_cols: list[str], *, owner_cap: int):
    """Shared ALL-pairs-per-fingerprint emission: ONE coarse exchange
    (fp folded into a bounded-keyspace bucket), then each bucket task
    emits every within-fp pair via the shifted-array trick — for offset d,
    rows t and t+d pair iff fp[t] == fp[t+d] — so the loop count is
    bounded by the LONGEST surviving segment (<= owner_cap), not the
    number of fingerprints: per-fp Python calls measured 5x slower on the
    sf1 tier (62.8 s -> see BASELINE.md). Oversized fp segments (shared
    boilerplate) drop before emission. Owners are unique within an fp
    (distinct grams per doc), so sorting by (fp, owner) makes a < b
    structural. Input columns: fp, owner, *value_cols (per-owner payloads
    gathered onto both sides as {col}_a / {col}_b)."""
    import pandas as pd

    def emit(df: pd.DataFrame) -> pa.Table:
        cols_a = {f"{c}_a": np.array([], dtype=np.int64) for c in value_cols}
        cols_b = {f"{c}_b": np.array([], dtype=np.int64) for c in value_cols}
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                **{k: pa.array(v) for k, v in {**cols_a, **cols_b}.items()},
            }
        )
        if df.empty:
            return empty
        df = df.sort_values(["fp", "owner"], kind="mergesort")
        fp = df["fp"].to_numpy(dtype=np.int64)
        own = df["owner"].to_numpy(dtype=np.int64)
        vals = {c: df[c].to_numpy(dtype=np.int64) for c in value_cols}
        # drop oversized fp segments before pairing
        uniq, inv, counts = np.unique(fp, return_inverse=True, return_counts=True)
        keep = counts[inv] <= owner_cap
        if not keep.all():
            fp, own = fp[keep], own[keep]
            vals = {c: v[keep] for c, v in vals.items()}
        n = len(fp)
        if n < 2:
            return empty
        max_seg = int(np.bincount(np.unique(fp, return_inverse=True)[1]).max())
        outs_a, outs_b = [], []
        outs_vals = {c: ([], []) for c in value_cols}
        for d in range(1, max_seg):
            m = fp[d:] == fp[:-d]
            if not m.any():
                break
            outs_a.append(own[:-d][m])
            outs_b.append(own[d:][m])
            for c, v in vals.items():
                outs_vals[c][0].append(v[:-d][m])
                outs_vals[c][1].append(v[d:][m])
        if not outs_a:
            return empty
        out = {
            "a": pa.array(np.concatenate(outs_a)),
            "b": pa.array(np.concatenate(outs_b)),
        }
        for c in value_cols:
            out[f"{c}_a"] = pa.array(np.concatenate(outs_vals[c][0]))
            out[f"{c}_b"] = pa.array(np.concatenate(outs_vals[c][1]))
        return pa.table(out)

    def add_coarse(batch: pa.Table) -> pa.Table:
        f = batch.column("fp").to_numpy(zero_copy_only=False).astype(np.uint64)
        coarse = ((f * np.uint64(1000003)) % np.uint64(1024)).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse))

    return (
        post.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit, batch_format="pandas")
    )
