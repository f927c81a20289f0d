"""Distributed sketches: HyperLogLog approximate distinct count.

No reference precedent (SURVEY.md §2.7 — no sketches/distinct in docler);
at 10^12 documents an exact COUNT(DISTINCT text) is a full shuffle of every
hash, while the HLL register table is 2^p bytes regardless of corpus size.
Scale pattern: each batch folds its values into one register row
(vectorized numpy); the merge is an elementwise max over (num_blocks x 2^p)
bytes — driver-sized by construction, like topk's partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

def _hash64(values: list[str]) -> np.ndarray:
    """64-bit blake2b hash of utf-8 strings — deterministic across processes
    and uniform enough for HLL's theoretical error bound (crc32-derived
    folds measured ~3x the expected bias on similar-prefix strings)."""
    from hashlib import blake2b

    # one frombuffer over the joined digests instead of a per-value
    # int.from_bytes (same little-endian 64-bit values, ~2x on the Python
    # side of the loop; the blake2b call itself is the irreducible cost)
    buf = b"".join(
        blake2b((v or "").encode("utf-8", "replace"), digest_size=8).digest()
        for v in values
    )
    return np.frombuffer(buf, dtype="<u8").astype(np.uint64, copy=False)


def hll_register_row(values: list[str], p: int = 12) -> np.ndarray:
    """Fold a batch of values into one 2^p-register HLL row (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = leading zeros of `rest` + 1, capped at 64-p+1
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for bit in range(64 - p):
        is_set = (rest >> np.uint64(63 - bit)) & np.uint64(1) == 1
        newly = is_set & ~found
        rank[newly] = bit + 1
        found |= is_set
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, col: str, *, p: int = 12) -> int:
    """Approximate distinct count of a string column (~1.04/sqrt(2^p)
    relative error; p=12 -> ~1.6%)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_register_row(batch.column(col).to_pylist(), p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in partials.iter_batches(batch_size=256, batch_format="pyarrow"):
        for blob in b.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return round(hll_estimate(merged))


def grouped_approx_distinct(ds, group_col: str, value_col: str, *, p: int = 12):
    """Approximate distinct ``value_col`` PER GROUP — the mergeable-sketch
    composition: each batch folds each group it sees into one 2^p-byte
    register row, and a ``groupby(group).map_groups`` merges register rows
    with an elementwise max (HLL merge is associative + commutative, so
    map-side partials compose exactly like Sum partials). The shuffle
    ships O(groups x num_blocks) fixed-size register rows — never values —
    which is THE way to run count-distinct per key at corpus scale.

    Returns a Dataset of (group, n_distinct_est: int64).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch.column(group_col).to_pylist(),
                "v": batch.column(value_col).to_pylist(),
            }
        )
        groups, blobs = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            blobs.append(hll_register_row(sub["v"].tolist(), p=p).tobytes())
        return pa.table(
            {
                group_col: pa.array(groups),
                "regs": pa.array(blobs, pa.binary()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in df["regs"]:
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
        return pd.DataFrame(
            {
                group_col: [df[group_col].iloc[0]],
                "n_distinct_est": np.array(
                    [round(hll_estimate(merged))], dtype=np.int64
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )


# --- count-min sketch --------------------------------------------------------

_CM_DEPTH = 4
_CM_WIDTH = 1 << 14  # 16384 columns; eps = e/w ~ 1.7e-4 of the stream mass


def _cm_positions(tokens: list[str]) -> np.ndarray:
    """(depth, n) column indices — depth independent hashes derived from one
    blake2b per DISTINCT token (row r uses bits of blake2b(token, salt=r)).
    Deterministic across processes, so partial sketches merge exactly."""
    from hashlib import blake2b

    cols = np.empty((_CM_DEPTH, len(tokens)), dtype=np.int64)
    for i, t in enumerate(tokens):
        d = blake2b((t or "").encode("utf-8", "replace"), digest_size=32).digest()
        for r in range(_CM_DEPTH):
            cols[r, i] = int.from_bytes(d[r * 8 : r * 8 + 8], "little") % _CM_WIDTH
    return cols


def count_min_build(ds, token_fn, *, text_col: str = "text"):
    """Mergeable count-min sketch (Cormode & Muthukrishnan, J. Algorithms
    2005) of a token stream, built as SPARSE partial rows: each map batch
    tokenizes, counts its distinct tokens (vectorized value_counts), folds
    them into (row, col, partial_n) cells, and ONE small groupby sums cells
    — the shuffle ships O(depth x distinct-per-batch) rows, never tokens,
    and the collected sketch is at most depth x width cells regardless of
    corpus size. Returns the dense (depth, width) int64 sketch plus the
    exact total token count N (the error bound's scale: est - true <=
    e/width * N with prob 1 - exp(-depth))."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column(text_col).to_pylist():
            toks.extend(token_fn(t or ""))
        if not toks:
            return pa.table(
                {
                    "row": pa.array([], type=pa.int64()),
                    "col": pa.array([], type=pa.int64()),
                    "partial_n": pa.array([], type=pa.int64()),
                }
            )
        vc = pa.compute.value_counts(pa.array(toks, type=pa.string()))
        values = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        cols = _cm_positions(values)
        rows = np.repeat(np.arange(_CM_DEPTH, dtype=np.int64), len(values))
        return pa.table(
            {
                "row": pa.array(rows),
                "col": pa.array(cols.reshape(-1)),
                "partial_n": pa.array(
                    np.tile(counts.astype(np.int64), _CM_DEPTH)
                ),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["row", "col"])
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()
    )
    sketch = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype=np.int64)
    sketch[cells["row"].to_numpy(), cells["col"].to_numpy()] = cells["n"].to_numpy()
    total = int(cells[cells["row"] == 0]["n"].sum())
    return sketch, total


def count_min_estimate(sketch: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-estimate each token's count: min over the depth rows. Always
    an OVERestimate of the true count (cells only ever add mass)."""
    cols = _cm_positions(tokens)
    per_row = sketch[np.arange(_CM_DEPTH)[:, None], cols]
    return per_row.min(axis=0)


# --- mergeable one-pass quantile sketch --------------------------------------

_QSKETCH_DRIVER_CAP = 2_000_000  # max merged sample entries on the driver


def quantile_sketch_onepass(ds, value_col: str, *, qs: list[float], eps: float = 0.01):
    """One-pass mergeable quantile estimates with a PINNED error bound.

    Each block contributes its sorted every-⌈eps*n_b⌉-th element with the
    exact local rank (an eps-approximate per-block CDF; MRL-style uniform
    rank sample) — so any threshold's global rank is known within
    eps*n + n_blocks after summing lower bounds. The merged sample is
    (n_blocks / eps) entries — driver-bounded by construction and guarded
    by ``_QSKETCH_DRIVER_CAP``. A second streaming pass recounts the
    chosen values' EXACT ranks, and ``within_bound`` pins
    |rank_le - target| <= eps*n + n_blocks in-query (the IVF-recall-pin
    pattern: the estimate itself is partition-dependent, the bound is
    not). Contrast stats.exact_quantiles_narrowing: that pays ~4 passes
    for exactness; this is the one-pass path a 100 TB profile job takes.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = np.sort(batch.column(value_col).to_numpy(zero_copy_only=False))
        n_b = len(v)
        if n_b == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.float64()),
                    "r": pa.array([], pa.int64()),
                    "bn": pa.array([], pa.int64()),
                }
            )
        s = max(1, int(math.ceil(eps * n_b)))
        idx = np.unique(np.concatenate([np.arange(0, n_b, s), [n_b - 1]]))
        bn = np.zeros(len(idx), dtype=np.int64)
        bn[0] = n_b
        return pa.table(
            {
                "v": pa.array(v[idx].astype(np.float64)),
                "r": pa.array(idx.astype(np.int64)),
                "bn": pa.array(bn),
            }
        )

    sk = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    merged = sk.to_pandas()
    if len(merged) > _QSKETCH_DRIVER_CAP:
        raise ValueError(
            f"merged quantile sample exceeds the driver cap "
            f"({len(merged)} > {_QSKETCH_DRIVER_CAP}); raise eps or "
            "pre-partition"
        )
    n = 0 if merged.empty else int(merged["bn"].sum())
    n_blocks = 0 if merged.empty else int((merged["bn"] > 0).sum())
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "q": pa.array(qs, pa.float64()),
                    "n": pa.array([0] * len(qs), pa.int64()),
                    "within_bound": pa.array([True] * len(qs), pa.bool_()),
                }
            )
        )
    # block-id per sample row: bn > 0 marks each block's first row
    blk = (merged["bn"] > 0).cumsum().to_numpy() - 1
    v = merged["v"].to_numpy()
    r = merged["r"].to_numpy()
    order = np.argsort(v, kind="mergesort")
    v_sorted, r_sorted, blk_sorted = v[order], r[order], blk[order]
    # rank lower bound at each candidate: for threshold t, each block
    # contributes (last sample <= t).r + 1; sweep candidates in value
    # order keeping the per-block current contribution
    contrib = np.zeros(n_blocks, dtype=np.int64)
    lo = np.empty(len(v_sorted), dtype=np.int64)
    total = 0
    for i in range(len(v_sorted)):
        b = blk_sorted[i]
        new = r_sorted[i] + 1
        total += new - contrib[b]
        contrib[b] = new
        lo[i] = total
    chosen = []
    for q in qs:
        target = max(1, int(math.ceil(q * n)))
        j = int(np.searchsorted(lo, target, side="left"))
        j = min(j, len(v_sorted) - 1)
        chosen.append(float(v_sorted[j]))
    # exact recount pass: rank_le of every chosen value in one scan
    ch = np.array(sorted(set(chosen)), dtype=np.float64)

    def recount(batch: pa.Table) -> pa.Table:
        vals = np.sort(batch.column(value_col).to_numpy(zero_copy_only=False))
        cnt = np.searchsorted(vals, ch, side="right").astype(np.int64)
        return pa.table(
            {
                "i": pa.array(np.arange(len(ch), dtype=np.int64)),
                "c": pa.array(cnt),
            }
        )

    counts = (
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("i")
        .aggregate(Sum("c", alias_name="rank_le"))
        .to_pandas()
        .sort_values("i")
    )
    rank_map = dict(zip(ch, counts["rank_le"].astype(int)))
    # the pin: |exact rank_le(chosen) - target| <= 2*eps*n + n_blocks.
    # Derivation: the picked candidate's LOWER bound first reaches the
    # target, so its true rank overshoots by < Σ_b s_b (the lower-bound
    # slack) plus the value gap to the previous candidate can hide
    # another < Σ_b s_b of mass; Σ_b s_b <= eps*n + n_blocks.
    bound = 2 * eps * n + n_blocks
    rows = [
        (q, n, bool(abs(rank_map[val] - max(1, int(math.ceil(q * n)))) <= bound))
        for q, val in zip(qs, chosen)
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "q": pa.array([r0[0] for r0 in rows], pa.float64()),
                "n": pa.array([r0[1] for r0 in rows], pa.int64()),
                "within_bound": pa.array([r0[2] for r0 in rows], pa.bool_()),
            }
        )
    )
