"""Edit-distance (Levenshtein) near-duplicate detection — the
string-metric member of the dedup family (exact-hash, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine live in ``dedup.py``; this one
finds pairs whose UTF-8 byte edit distance is <= d_max, the metric the
reference-era dedup literature calls "fuzzy duplicate" and the only one
here with a true metric guarantee).

No reference precedent (docler has no distributed operators, SURVEY.md
§2.7); semantics pinned to DuckDB's ``levenshtein`` which is UNIT-COST
over UTF-8 BYTES (probed: levenshtein('你好a','你是a') = 3), so every
kernel below operates on ``uint8`` views of the encoded text.

Plan (one exchange, exact):

1. map-side: compute byte length, replicate each doc into length bands
   ``floor(L/W)`` and ``floor(max(L-d,0)/W)`` with band width
   ``W = 2*d_max`` (at most 2 rows/doc, usually 1 — consecutive bands).
   A pair within distance d has ``|La-Lb| <= d < W``, so the longer
   member's two bands always cover ``floor(min(La,Lb)/W)``: the pair is
   counted exactly once, in the MIN-length member's own band.
2. ONE coarse exchange keyed on a single int64
   ``crc32(group) << 20 | band`` (the round-5 coarse-key rule; crc
   collisions merely merge buckets — pairing re-checks group equality).
3. in-bucket: sort by (byte length, id), two-pointer window
   ``|ΔL| <= d``, then two vectorized prefilters before the DP —
   the length bound and the character-histogram bound
   ``dist >= ceil(L1(hist_a, hist_b) / 2)`` (one edit changes the byte
   multiset by at most 2) — and an exact min-plus-scan Levenshtein DP
   (numpy row kernel, early abandon when a row's min exceeds d) on the
   survivors.

Scale note: the exchange is band-bounded, but in-bucket candidate count
is quadratic in band occupancy after the two prefilters; at corpus scale
(many same-length docs) compose with segment indexing (PassJoin,
Li et al., ICDE'11: a pair within distance d must share one of d+1
position-constrained segments exactly) as the candidate generator and
keep ``levenshtein_bytes`` as the verify kernel. The group key includes
``lang``, mirroring the per-language dispatch rule of the extraction
tier.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_BAND_FACTOR = 2  # band width W = _BAND_FACTOR * d_max; exactness needs W > d


def levenshtein_bytes(a: np.ndarray, b: np.ndarray, d_max: int) -> int:
    """Exact unit-cost Levenshtein over two uint8 arrays, early-abandoning
    past ``d_max`` (returns d_max+1 as the "too far" sentinel).

    Row DP vectorized with the min-plus prefix trick: after the
    substitution/deletion minimum, insertions are
    ``cur[j] = min_{k<=j}(tmp[k] + j - k)`` =
    ``j + running-min(tmp[k] - k)`` — one ``np.minimum.accumulate`` per
    row instead of a per-cell Python loop.
    """
    la, lb = len(a), len(b)
    if abs(la - lb) > d_max:
        return d_max + 1
    if la == 0 or lb == 0:
        return max(la, lb) if max(la, lb) <= d_max else d_max + 1
    jj = np.arange(lb + 1, dtype=np.int32)
    prev = jj.copy()
    cur = np.empty(lb + 1, dtype=np.int32)
    for i in range(la):
        np.minimum(prev[:-1] + (b != a[i]), prev[1:] + 1, out=cur[1:])
        cur[0] = i + 1
        cur -= jj
        np.minimum.accumulate(cur, out=cur)
        cur += jj
        if cur.min() > d_max:
            return d_max + 1
        prev, cur = cur, prev
    d = int(prev[-1])
    return d if d <= d_max else d_max + 1


def levenshtein_many(
    a_list: list[np.ndarray], b: np.ndarray, d_max: int
) -> np.ndarray:
    """Exact Levenshtein of MANY uint8 strings against one ``b``, batched:
    every candidate pair of a two-pointer window shares its right-hand
    string, so one DP row step becomes one (pairs x len(b)) matrix op
    instead of ``len(a_list)`` scalar-kernel rows. Early abandon compacts
    the pair set each row (shared-vocab corpora defeat histogram
    prefilters, so most of the join's cost lives here — measured 20x over
    the per-pair kernel at sf0.1). Returns d_max+1 sentinels like
    :func:`levenshtein_bytes`.
    """
    p = len(a_list)
    out = np.full(p, d_max + 1, dtype=np.int32)
    if p == 0:
        return out
    lb = len(b)
    la = np.fromiter((len(a) for a in a_list), dtype=np.int64, count=p)
    if lb == 0:
        small = la <= d_max
        out[small] = la[small]
        return out
    keep0 = np.abs(la - lb) <= d_max
    idx = np.nonzero(keep0)[0]
    if idx.size == 0:
        return out
    lmax = int(la[idx].max())
    a_mat = np.zeros((idx.size, lmax), dtype=np.uint8)
    for r, i in enumerate(idx):
        a_mat[r, : la[i]] = a_list[i]
    la_sub = la[idx].astype(np.int64)
    ids = np.arange(idx.size)

    # diagonal band, width W = 2d+1 (cells outside exceed d_max anyway):
    # band coord k of row i is column c = i - d + k; dp[i-1][c-1] aligns to
    # the SAME k, dp[i-1][c] to k+1 — so each row is shift-free except one
    # roll for the delete arm. b is padded so the gather b[c-1] for
    # c in [i-d, i+d] never indexes out of range.
    d = d_max
    w = 2 * d + 1
    inf = np.int32(1 << 20)
    kk = np.arange(w, dtype=np.int32)
    # gather b[c-1] for c = i-d+k reads bpad[i+k], i <= lb+d, k <= 2d
    bpad = np.full(lb + 3 * d + 2, -1, dtype=np.int16)  # -1: never a uint8
    bpad[d + 1 : d + 1 + lb] = b
    # row 0: column c = k - d; dp[0][c] = c for 0 <= c <= min(lb, d)
    prev = np.broadcast_to(
        np.where((kk >= d) & (kk - d <= lb), kk - d, inf).astype(np.int32),
        (idx.size, w),
    ).copy()
    # empty left strings retire at row 0: dp[0][lb] = lb (keep0 => lb <= d)
    done = la_sub == 0
    if done.any():
        out[idx[ids[done]]] = lb
        live = ~done
        prev, la_sub, ids, a_mat = prev[live], la_sub[live], ids[live], a_mat[live]
        if not len(ids):
            return out
    for i in range(1, lmax + 1):
        ai = a_mat[:, i - 1].astype(np.int16)
        # columns this row: c = i - d + k; valid 1 <= c <= lb (c == 0 set
        # explicitly); b gather index c - 1 = i - d + k - 1 -> bpad offset
        bs = bpad[i : i + w]
        neq = (bs[None, :] != ai[:, None]).astype(np.int32)
        cur = prev + neq  # substitute: dp[i-1][c-1], same k
        dele = np.empty_like(prev)  # dp[i-1][c] = prev k+1
        dele[:, :-1] = prev[:, 1:]
        dele[:, -1] = inf
        np.minimum(cur, dele + 1, out=cur)
        # invalid columns (c < 1 or c > lb) -> inf; column c == 0 -> i
        c_lo, c_hi = i - d, i + d
        if c_lo < 1:
            cur[:, : 1 - c_lo] = inf
            if c_lo <= 0 <= c_hi:
                cur[:, -c_lo] = i  # dp[i][0]
        if c_hi > lb:
            cur[:, w - (c_hi - lb) :] = inf
        # insert arm: cur[k] = min_{k' <= k}(cur[k'] + k - k')
        cur -= kk
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += kk
        np.minimum(cur, inf, out=cur)
        # retire pairs whose left string ends at this row: answer at
        # column lb -> k = lb - i + d
        done = la_sub == i
        if done.any():
            fin = cur[done, lb - i + d]
            ok = fin <= d_max
            out[idx[ids[done]][ok]] = fin[ok]
            live = ~done
            cur, la_sub, ids, a_mat = (
                cur[live],
                la_sub[live],
                ids[live],
                a_mat[live],
            )
            if not len(ids):
                return out
        alive = cur.min(axis=1) <= d_max
        if not alive.all():
            cur, la_sub, ids, a_mat = (
                cur[alive],
                la_sub[alive],
                ids[alive],
                a_mat[alive],
            )
            if not len(ids):
                return out
        prev = cur
    return out


def levenshtein_pairs(
    arrs: list[np.ndarray],
    left_idx: np.ndarray,
    right_idx: np.ndarray,
    d_max: int,
) -> np.ndarray:
    """Exact banded Levenshtein for an ARBITRARY pair list over one doc
    set: every DP row step is one set of (alive-pairs x W) matrix ops no
    matter how many distinct right strings the pairs reference (each row
    gathers its own b-slice from a padded matrix), so a whole blocking
    cell's candidate set amortizes numpy dispatch in ONE call — the
    overhead-bound regime of per-pivot batching (measured 45-pair average
    per pivot at sf0.1) disappears. Returns d_max+1 sentinels beyond the
    threshold, like :func:`levenshtein_bytes`.
    """
    p = len(left_idx)
    out = np.full(p, d_max + 1, dtype=np.int32)
    if p == 0:
        return out
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    la = lens[left_idx]
    lb = lens[right_idx]
    # trivial rows: a length gap beyond d, or an empty side
    keep = (np.abs(la - lb) <= d_max) & (la > 0) & (lb > 0)
    empty = (~keep) & (np.maximum(la, lb) <= d_max) & (np.minimum(la, lb) == 0)
    out[empty] = np.maximum(la, lb)[empty].astype(np.int32)
    rows = np.nonzero(keep)[0]
    if rows.size == 0:
        return out
    d = d_max
    w = 2 * d + 1
    inf = np.int16(1 << 13)  # saturation headroom: inf + w + 1 << int16 max
    kk = np.arange(w, dtype=np.int16)
    lmax = int(lens.max())
    a_mat = np.zeros((len(arrs), lmax), dtype=np.uint8)
    # b rows padded so row i's gather bpad[doc, i + k] = b[i - d + k - 1]
    b_pad = np.full((len(arrs), lmax + 3 * d + 2), -1, dtype=np.int16)
    for r, a in enumerate(arrs):
        a_mat[r, : len(a)] = a
        b_pad[r, d + 1 : d + 1 + len(a)] = a
    li = left_idx[rows].astype(np.int64)
    ri = right_idx[rows].astype(np.int64)
    la_s = la[rows]
    lb_s = lb[rows].astype(np.int16)
    ids = rows
    # completion bound (the key abandon accelerator for shared-vocabulary
    # corpora, where plain row minima stay low while true distance is
    # huge): any path through band cell k still needs >= |k - t_final|
    # edits to close the remaining length gap, t_final = lb - la + d being
    # the answer cell's band coordinate — constant per pair. Cells with
    # cur[k] + pen[k] > d can never reach the answer under threshold and
    # are masked to inf; a pair dies when every cell is masked.
    t_final = (lb_s - la_s + d).astype(np.int16)
    pen = np.abs(kk[None, :] - t_final[:, None]).astype(np.int16)
    prev = np.broadcast_to(
        np.where(kk >= d, kk - d, inf).astype(np.int16), (rows.size, w)
    ).copy()
    prev = np.where((kk - d)[None, :] > lb_s[:, None], inf, prev)
    for i in range(1, int(la_s.max()) + 1):
        ai = a_mat[li, i - 1].astype(np.int16)
        bs = b_pad[ri[:, None], i + kk[None, :]]
        cur = prev + (bs != ai[:, None]).astype(np.int16)
        dele = np.empty_like(prev)
        dele[:, :-1] = prev[:, 1:]
        dele[:, -1] = inf
        np.minimum(cur, dele + 1, out=cur)
        c_lo = i - d
        if c_lo < 1:
            cur[:, : 1 - c_lo] = inf
            if c_lo <= 0:
                cur[:, -c_lo] = i  # column 0
        # per-pair upper bound: cells past column lb are invalid
        t = lb_s - np.int16(i) + np.int16(d)  # band coord of column lb
        np.putmask(cur, kk[None, :] > t[:, None], inf)
        cur -= kk
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += kk
        np.minimum(cur, inf, out=cur)
        done = la_s == i
        if done.any():
            fin = np.take_along_axis(
                cur[done], t[done][:, None].astype(np.int64), axis=1
            )[:, 0]
            ok = fin <= d_max
            out[ids[done][ok]] = fin[ok].astype(np.int32)
            live = ~done
            cur, la_s, lb_s, li, ri, ids, pen = (
                cur[live],
                la_s[live],
                lb_s[live],
                li[live],
                ri[live],
                ids[live],
                pen[live],
            )
            if not len(ids):
                return out
        np.putmask(cur, cur + pen > d_max, inf)
        alive = cur.min(axis=1) <= d_max
        if not alive.all():
            cur, la_s, lb_s, li, ri, ids, pen = (
                cur[alive],
                la_s[alive],
                lb_s[alive],
                li[alive],
                ri[alive],
                ids[alive],
                pen[alive],
            )
            if not len(ids):
                return out
        prev = cur
    return out


def _expand_bands(text_col: str, group_col: str, id_col: str, d_max: int):
    w = _BAND_FACTOR * d_max

    def expand(batch: pa.Table) -> pa.Table:
        blen = pc.binary_length(batch.column(text_col)).to_numpy().astype(np.int64)
        own = blen // w
        low = np.maximum(blen - d_max, 0) // w
        idx = np.arange(len(blen))
        # every doc in its own band; low-band replica only when distinct
        rep = idx[low != own]
        take = np.concatenate([idx, rep])
        bands = np.concatenate([own, low[low != own]])
        out = batch.select([id_col, text_col, group_col]).take(pa.array(take))
        out = out.append_column("blen", pa.array(blen[take], pa.int64()))
        out = out.append_column("band", pa.array(bands, pa.int64()))
        groups = out.column(group_col).to_pylist()
        coarse = np.fromiter(
            (
                (zlib.crc32(str(g).encode("utf-8")) << 20) | (b & 0xFFFFF)
                for g, b in zip(groups, bands)
            ),
            dtype=np.int64,
            count=len(bands),
        )
        return out.append_column("coarse", pa.array(coarse, pa.int64()))

    return expand


def _pairs_in_group(
    text_col: str, group_col: str, id_col: str, d_max: int
):
    w = _BAND_FACTOR * d_max

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list[int] = []
        out_b: list[int] = []
        out_d: list[int] = []
        # a coarse bucket may merge several (group, band) cells on crc
        # collision; pair only inside a cell
        for (_, band), sub in df.groupby([group_col, "band"], sort=False):
            sub = sub.sort_values(["blen", id_col], kind="mergesort")
            texts = sub[text_col].to_numpy()
            blens = sub["blen"].to_numpy()
            ids = sub[id_col].to_numpy()
            n = len(sub)
            if n < 2:
                continue
            arrs = [
                np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts
            ]
            hists = np.zeros((n, 256), dtype=np.int32)
            for i, arr in enumerate(arrs):
                if len(arr):
                    np.add.at(hists[i], arr, 1)
            # dedup rule: the pair belongs to the MIN member's own band
            # (blens sorted, so min is the earlier row)
            own_band = blens // w == band
            start = 0
            left_parts, right_parts = [], []
            for j in range(1, n):
                while blens[j] - blens[start] > d_max:
                    start += 1
                cand = np.arange(start, j)[own_band[start:j]]
                if cand.size == 0:
                    continue
                # vectorized histogram prefilter: dist >= ceil(L1/2)
                l1 = np.abs(hists[cand] - hists[j]).sum(axis=1)
                cand = cand[l1 <= 2 * d_max]
                if cand.size:
                    left_parts.append(cand)
                    right_parts.append(np.full(cand.size, j, dtype=np.int64))
            if not left_parts:
                continue
            left_idx = np.concatenate(left_parts)
            right_idx = np.concatenate(right_parts)
            # one batched banded DP over the WHOLE cell's candidate set
            dists = levenshtein_pairs(arrs, left_idx, right_idx, d_max)
            hit = dists <= d_max
            for i, j, d in zip(left_idx[hit], right_idx[hit], dists[hit]):
                a, b = (
                    (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                )
                out_a.append(int(a))
                out_b.append(int(b))
                out_d.append(int(d))
        # Arrow out (even when empty, the schema rides along): downstream
        # pair consumers (min_label_components) iterate Arrow blocks
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    return pairs


def levenshtein_neardup_pairs(
    ds,
    *,
    text_col: str,
    group_col: str,
    id_col: str,
    d_max: int,
):
    """All pairs (id_a < id_b) within the same ``group_col`` whose UTF-8
    byte Levenshtein distance is <= d_max -> Dataset(id_a, id_b, dist).

    Exact (no probabilistic recall gap, unlike MinHash/SimHash): the
    length-band replication covers every qualifying pair once, and the
    DP kernel is the true distance.
    """
    import ray.data

    expanded = ds.map_batches(
        _expand_bands(text_col, group_col, id_col, d_max),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pairs = expanded.groupby("coarse").map_groups(
        _pairs_in_group(text_col, group_col, id_col, d_max),
        batch_format="pandas",
    )
    # 0-row typed anchor: a legitimately pair-free corpus must still
    # present the (id_a, id_b, dist) schema (setops.py precedent)
    anchor = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
    )
    # anchor FIRST: a fully-empty map_groups output carries no schema, and
    # union's result schema follows the leading dataset
    return anchor.union(pairs)
