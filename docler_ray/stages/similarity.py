"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast,
  pre-normalized query matrix (`ray.put` once, fetched in each task — never
  re-shipped per batch), local top-k per batch, tiny global merge on the
  driver (candidates = n_queries x k x n_blocks rows).
- IVF variant (the scale path): seeded k-means centroids fitted on a driver
  sample, centroid assignment as a map_batches stage, queries probe only the
  nearest `nprobe` centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _to_matrix(column: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (double precision keeps
    top-k ordering identical to the DuckDB oracle on near-tie scores)."""
    import pyarrow.compute as pc

    if isinstance(column, pa.ChunkedArray):
        combined = column.combine_chunks()
        column = (
            combined.chunk(0)
            if isinstance(combined, pa.ChunkedArray) and combined.num_chunks
            else combined
        )
    if len(column) == 0:
        return np.empty((0, 0), dtype=np.float64)
    lengths = pc.list_value_length(column).to_numpy(zero_copy_only=False)
    d = int(lengths[0])
    if not (lengths == d).all():
        msg = "ragged embedding column"
        raise ValueError(msg)
    flat = column.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(lengths), d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute_force(
    ds,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_idx:int32, vec_id, score:float64) sorted by (query_idx, -score, id).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        emb = _normalize(_to_matrix(batch.column(emb_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if emb.shape[0] == 0:
            return pa.table(
                {"query_idx": pa.array([], pa.int32()),
                 id_col: pa.array([], batch.schema.field(id_col).type),
                 "score": pa.array([], pa.float64())}
            )
        scores = emb @ q.T  # (n, n_q)
        kk = min(k, scores.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            col = scores[:, qi]
            top = np.argpartition(-col, kk - 1)[:kk]
            for i in top:
                out_q.append(qi)
                out_id.append(ids[i])
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, batch.schema.field(id_col).type),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.map_batches(
        local_topk, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True
    ).to_pandas()  # small: n_q * k * n_blocks rows
    candidates = candidates.sort_values(
        ["query_idx", "score", id_col], ascending=[True, False, True]
    )
    top = candidates.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(top, preserve_index=False)


class IVFIndex:
    """Seeded k-means IVF index (the bucketed scale path).

    ``fit`` runs Lloyd iterations on a driver-side sample (deterministic);
    ``assign`` is a map_batches stage adding ``centroid_id``; ``search``
    probes the nearest ``nprobe`` centroids only.
    """

    def __init__(self, n_centroids: int = 16, n_iter: int = 5, seed: int = 7) -> None:
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.RandomState(self.seed)
        idx = rng.choice(len(x), size=min(self.n_centroids, len(x)), replace=False)
        c = x[np.sort(idx)].copy()
        for _ in range(self.n_iter):
            assign = (x @ c.T).argmax(axis=1)
            for j in range(c.shape[0]):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def make_assigner(self, emb_col: str = "embedding"):
        centroids_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(centroids_ref)
            emb = _normalize(_to_matrix(batch.column(emb_col)))
            cid = (emb @ c.T).argmax(axis=1).astype(np.int32) if len(emb) else np.array([], np.int32)
            return batch.append_column("centroid_id", pa.array(cid, pa.int32()))

        return assign

    def search(
        self,
        assigned_ds,
        queries: np.ndarray,
        *,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        k: int = 10,
        nprobe: int = 4,
    ) -> pa.Table:
        assert self.centroids is not None, "fit() first"
        qn = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted({int(c) for row in probe for c in row})
        import pyarrow.compute as pc

        filtered = assigned_ds.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("centroid_id"), value_set=pa.array(wanted, pa.int32()))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return knn_brute_force(filtered, qn, id_col=id_col, emb_col=emb_col, k=k)


def _centroid_matrix_ref(ds, id_col: str, emb_col: str, k: int):
    """First-k-ids centroid convention shared by centroid_assign_counts,
    centroid_assignments and dedup.semdedup: fetch rows with id < k via a
    distributed filter (k rows land on the driver, never the corpus),
    normalize, ray.put once."""
    cent_rows = (
        ds.map_batches(
            lambda b: b.filter(
                pc.less(pc.cast(b.column(id_col), pa.int64()), k)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()  # <= k rows by construction
        .sort_values(id_col)
    )
    if len(cent_rows) != k:
        raise ValueError(
            f"centroid selection expects ids 0..{k - 1} present; found "
            f"{len(cent_rows)} rows with {id_col} < {k} (renumber ids or "
            "pass centroids explicitly)"
        )
    c = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in cent_rows[emb_col]])
    )
    return ray.put(c)


def centroid_assignments(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
):
    """(id, cluster) per vector — the assignment projection of
    centroid_assign_counts (same centroids, same argmax tie rule: numpy
    argmax takes the FIRST max = lowest centroid id, the rule the kmeans
    oracle replays with ROW_NUMBER). Zero shuffle; used as SemDeDup's
    candidate generator."""
    cref = _centroid_matrix_ref(ds, id_col, emb_col, k)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        emb = _normalize(_to_matrix(batch.column(emb_col)))
        if not len(emb):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        cid = (emb @ cm.T).argmax(axis=1)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "cluster": pa.array(cid.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def centroid_assign_counts(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 8,
):
    """K-means ASSIGNMENT step at corpus scale: nearest-centroid (cosine)
    per vector against k fixed centroids -> (centroid_id, n) counts.

    Centroids are the first ``k`` vectors by id (deterministic, fetched
    with a distributed filter — k rows land on the driver, never the
    corpus) and broadcast once; each batch is one normalized matmul +
    argmax + bincount, emitting a k-row partial that a k-sized groupby
    folds. This is the per-iteration workhorse of distributed Lloyd's
    (the IVFIndex above runs full Lloyd on a sample; this operator is the
    full-corpus E-step) — counts-only output keeps the oracle exact
    (ties break to the lowest centroid id on both engines; the SQL
    replays cosine + ROW_NUMBER).
    """
    from ray.data.aggregate import Sum

    cref = _centroid_matrix_ref(ds, id_col, emb_col, k)

    def partial(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        emb = _normalize(_to_matrix(batch.column(emb_col)))
        if not len(emb):
            return pa.table(
                {
                    "centroid_id": pa.array([], pa.int64()),
                    "partial_n": pa.array([], pa.int64()),
                }
            )
        cid = (emb @ cm.T).argmax(axis=1)
        counts = np.bincount(cid, minlength=cm.shape[0]).astype(np.int64)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "centroid_id": pa.array(nz.astype(np.int64), pa.int64()),
                "partial_n": pa.array(counts[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("centroid_id")
        .aggregate(Sum("partial_n", alias_name="n"))
    )
