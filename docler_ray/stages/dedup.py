"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding near-dup.

The reference has no dedup (SURVEY.md §2.7 — closest analog is
first-registered-wins preference resolution, registry.py:86-91); these are
the training-data-pipeline operators a Common-Crawl-scale corpus demands.

Scale design notes (all shuffles explicit):
- exact dedup ships ONLY (hash, order) pairs through the shuffle — payloads
  never move; winners come back as a keep-set filter.
- MinHash signatures are numpy-vectorized per batch; the LSH shuffle moves
  (band, band_hash, id) triples, not documents.
- candidate verification recomputes shingles only for candidate ids
  (a semi-join via broadcast keep-set), then connected components by
  iterative min-label propagation — no driver-side union-find over big data.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


def md5_hash_column(values: list[str]) -> list[str]:
    """128-bit exact-dedup keys (collision-free for practical purposes)."""
    return [hashlib.md5(v.encode("utf-8", "replace")).hexdigest() for v in values]


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    return batch.append_column("text_hash", pa.array(md5_hash_column(texts), type=pa.string()))


def exact_dedup_keep_first(ds, text_col: str, order_col: str):
    """Exact dedup, keep the row with the smallest ``order_col`` per distinct
    ``text_col`` value. Returns a Dataset of the surviving rows' key columns
    (order_col + text_hash); join/filter the full table against it if
    payload columns are needed.

    Shuffle cost: one groupby over (hash, order) pairs only.
    """
    keys = ds.map_batches(
        lambda b: add_text_hash(b, text_col).select(["text_hash", order_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from ray.data.aggregate import Min

    return keys.groupby("text_hash").aggregate(Min(order_col, alias_name=order_col))


# --- shingles + MinHash ------------------------------------------------------

def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram shingles as uint64 hashes (crc32-pair folded)."""
    words = text.split()
    if len(words) < k:
        joined = " ".join(words)
        h = zlib.crc32(joined.encode("utf-8", "replace"))
        return np.array([h], dtype=np.uint64) if words else np.array([], dtype=np.uint64)
    out = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        sh = " ".join(words[i : i + k]).encode("utf-8", "replace")
        out[i] = (zlib.crc32(sh) << 32) | zlib.crc32(sh[::-1])
    return out


class MinHasher:
    """Vectorized MinHash signatures: sig_j = min_i (a_j * s_i + b_j mod p).

    Seeded permutation parameters are built once per actor (__init__), the
    per-document min is a numpy reduction over an outer product — no Python
    loop over shingles.
    """

    def __init__(self, num_perm: int = 128, seed: int = 1337) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n_shingles) — modular arithmetic in uint64 with wraparound
        # is fine for min-hashing as long as it is consistent.
        prod = np.outer(self.a, shingles) + self.b[:, None]
        prod %= _MERSENNE
        return prod.min(axis=1)

    def band_hashes(self, sig: np.ndarray, num_bands: int) -> list[int]:
        rows = self.num_perm // num_bands
        out: list[int] = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            out.append(zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF)
        return out


def make_minhash_band_emitter(
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1337,
):
    """Actor-pool callable: documents batch -> (id, band, band_hash) rows."""

    class EmitBands:
        def __init__(self) -> None:
            self.hasher = MinHasher(num_perm=num_perm, seed=seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            out_id, out_band, out_hash = [], [], []
            for i, text in zip(ids, texts):
                sig = self.hasher.signature(shingle_hashes(text or "", k=shingle_k))
                for band, bh in enumerate(self.hasher.band_hashes(sig, num_bands)):
                    out_id.append(i)
                    out_band.append(band)
                    out_hash.append(bh)
            return pa.table(
                {
                    id_col: pa.array(out_id),
                    "band": pa.array(out_band, type=pa.int32()),
                    "band_hash": pa.array(out_hash, type=pa.int64()),
                }
            )

    return EmitBands


_COARSE_GROUPS = 512  # co-location granularity for LSH bucket pair emission
_MAX_BUCKET_PAIRS = 200  # cap pairs per bucket against degenerate corpora


def _lsh_bucket_pairs(buckets, key_cols: list[str], id_col: str) -> pd.DataFrame:
    """(id, bucket-key) rows -> candidate (id_a, id_b) pairs, id_a = bucket min.

    One shuffle total: bucket keys are folded into a COARSE co-location key
    (so Ray shuffles ~512 groups, not one per distinct bucket), and the
    per-bucket "pair everyone with the minimum" emission is a vectorized
    pandas transform inside each coarse group — per-bucket Python calls would
    dominate wall-time at ~1e5 buckets (measured 22s -> see BASELINE.md).
    Connectivity via min-pairing is enough for the later label propagation
    without O(n^2) pairs per bucket.
    """

    def add_coarse(batch: pa.Table) -> pa.Table:
        acc = np.zeros(len(batch), dtype=np.uint64)
        for col in key_cols:
            acc = acc * np.uint64(1000003) + batch.column(col).to_numpy().astype(
                np.uint64
            )
        return batch.append_column(
            "coarse", pa.array((acc % _COARSE_GROUPS).astype(np.int32))
        )

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*key_cols, id_col], kind="mergesort")
        grouped = df.groupby(key_cols, sort=False)
        first = grouped[id_col].transform("first")
        rank = grouped.cumcount()
        mask = (rank > 0) & (rank <= _MAX_BUCKET_PAIRS)
        return pd.DataFrame(
            {
                "id_a": first[mask].to_numpy(),
                "id_b": df[id_col][mask].to_numpy(),
            }
        )

    pairs = (
        buckets.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact n-gram Jaccard over shingle-hash sets (verification kernel)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    sa, sb = np.unique(a), np.unique(b)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def minhash_dedup(
    ds,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_k: int = 5,
    concurrency=None,
) -> set:
    """Full MinHash-LSH near-dedup. Returns the set of ids to DROP.

    Stages: signature+bands (actor pool) -> groupby(band, band_hash)
    (the LSH shuffle) -> candidate pairs -> exact-Jaccard verify on the
    candidate subset -> min-label propagation -> drop all non-minimum members
    of each duplicate cluster.

    The candidate set (pairs sharing a band bucket) is assumed to be small
    relative to the corpus — the standard LSH contract; bucket explosion is
    capped (buckets larger than 200 ids are truncated to protect against
    degenerate all-identical corpora).
    """
    EmitBands = make_minhash_band_emitter(
        text_col, id_col, num_perm=num_perm, num_bands=num_bands,
        shingle_k=shingle_k,
    )
    bands = ds.map_batches(
        EmitBands,
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
        batch_size=1024,
        zero_copy_batch=True,
    )

    pairs = _lsh_bucket_pairs(bands, ["band", "band_hash"], id_col)
    return _jaccard_verify_and_drop(
        ds, pairs, text_col, id_col, shingle_k=shingle_k, threshold=threshold
    )


def ngram_jaccard_dedup(
    ds,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_anchors: int = 3,
) -> set:
    """n-gram-Jaccard near-dedup without MinHash signatures. Returns the ids
    to DROP.

    Candidate generation blocks each document on its ``num_anchors`` smallest
    k-shingle hashes (bottom-k sketch anchors): two documents with Jaccard
    >= t share a bottom-k anchor with probability >= 1-(1-t)^k. Candidates
    are then verified with EXACT n-gram Jaccard over full shingle sets —
    the same verify kernel minhash_dedup uses, so the two operators differ
    only in their recall/cost trade at candidate generation.

    Shuffle cost: one groupby over (id, anchor) pairs — documents never move.
    """

    def emit_anchors(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_anchor = [], []
        for i, text in zip(ids, texts):
            hs = np.unique(shingle_hashes(text or "", k=shingle_k))
            anchors = hs[:num_anchors] if hs.size else np.array([0], dtype=np.uint64)
            for a in anchors:
                out_id.append(i)
                out_anchor.append(int(a) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "anchor": pa.array(out_anchor, type=pa.int64()),
            }
        )

    anchored = ds.map_batches(
        emit_anchors, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = _lsh_bucket_pairs(anchored, ["anchor"], id_col)
    return _jaccard_verify_and_drop(
        ds, pairs, text_col, id_col, shingle_k=shingle_k, threshold=threshold
    )


def _jaccard_verify_and_drop(
    ds,
    pairs: pd.DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int,
    threshold: float,
) -> set:
    """Exact-Jaccard verify of candidate pairs, then keep-min-per-cluster.

    Shingles are recomputed only for candidate ids (semi-join via broadcast
    id set); connected components run driver-side over the verified pair
    graph, which the LSH contract keeps small relative to the corpus.
    """
    if pairs.empty:
        return set()
    pairs = pairs.drop_duplicates()

    cand_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    cand_rows = ds.map_batches(
        lambda b: b.filter(
            pc.is_in(b.column(id_col), value_set=pa.array(sorted(cand_ids)))
        ).select([id_col, text_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    shingles = {
        i: shingle_hashes(t or "", k=shingle_k)
        for i, t in zip(cand_rows[id_col], cand_rows[text_col])
    }
    verified = [
        (a, b)
        for a, b in zip(pairs["id_a"], pairs["id_b"])
        if a in shingles and b in shingles and jaccard(shingles[a], shingles[b]) >= threshold
    ]
    if not verified:
        return set()

    # connected components over the (small) verified pair graph
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    clusters: dict = {}
    for node in set(x for p in verified for x in p):
        clusters.setdefault(find(node), []).append(node)
    drop: set = set()
    for root, members in clusters.items():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    return drop


# --- SimHash -----------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32-derived bit votes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = (zlib.crc32(tok.encode("utf-8", "replace")) << 32) | zlib.crc32(
            tok[::-1].encode("utf-8", "replace")
        )
        bits = np.unpackbits(np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
        acc += np.where(bits.astype(np.int64) == 1, 1, -1)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def embedding_neardup(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 12,
    seed: int = 5,
) -> set:
    """Embedding-cosine near-dedup: random-hyperplane LSH buckets ->
    candidate pairs -> exact cosine verify -> drop all non-minimum members.

    The hyperplane matrix is tiny (d x n_planes) and rebuilt per batch from
    the fixed seed — cheaper than shipping it; the bucket groupby ships only
    (id, bucket) pairs. Returns the set of ids to DROP.
    """
    from docler_ray.stages.similarity import _normalize, _to_matrix

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = _normalize(_to_matrix(batch.column(emb_col)))
        if emb.shape[0] == 0:
            return pa.table({id_col: batch.column(id_col), "bucket": pa.array([], pa.int64())})
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((emb.shape[1], n_planes))
        signs = (emb @ planes) > 0
        buckets = signs @ (1 << np.arange(n_planes, dtype=np.int64))
        return pa.table({id_col: batch.column(id_col), "bucket": pa.array(buckets, pa.int64())})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _lsh_bucket_pairs(buckets, ["bucket"], id_col)
    if pairs.empty:
        return set()
    cand_ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    cand = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column(id_col), value_set=pa.array(cand_ids))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    emb_by_id = {
        row[id_col]: np.asarray(row[emb_col], dtype=np.float64)
        for _, row in cand.iterrows()
    }

    def cos(a, b) -> float:
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return float(a @ b / (na * nb))

    verified = [
        (a, b)
        for a, b in zip(pairs["id_a"], pairs["id_b"])
        if a in emb_by_id and b in emb_by_id and cos(emb_by_id[a], emb_by_id[b]) >= threshold
    ]
    drop: set = set()
    clusters: dict = {}
    for a, b in verified:
        root = min(a, b)
        clusters.setdefault(root, set()).update([a, b])
    for root, members in clusters.items():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    return drop


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sims = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    out = batch.append_column(
        "simhash", pa.array(np.array(sims, dtype=np.uint64).view(np.int64))
    )
    # 4 x 16-bit block keys: near-dups within hamming distance 3 share at
    # least one block (pigeonhole) -> bucket by block for candidate generation
    for blk in range(4):
        vals = [(s >> (16 * blk)) & 0xFFFF for s in sims]
        out = out.append_column(f"simblock_{blk}", pa.array(vals, type=pa.int32()))
    return out
