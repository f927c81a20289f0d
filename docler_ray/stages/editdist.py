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
            for j in range(1, n):
                while blens[j] - blens[start] > d_max:
                    start += 1
                cand = np.arange(start, j)[own_band[start:j]]
                if cand.size == 0:
                    continue
                # vectorized histogram prefilter: dist >= ceil(L1/2)
                l1 = np.abs(hists[cand] - hists[j]).sum(axis=1)
                for i in cand[l1 <= 2 * d_max]:
                    d = levenshtein_bytes(arrs[i], arrs[j], d_max)
                    if d <= d_max:
                        a, b = (
                            (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                        )
                        out_a.append(int(a))
                        out_b.append(int(b))
                        out_d.append(d)
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
