"""DSIR-style data selection: hashed-feature importance log-ratios per
document against a target-domain sample.

Data Selection with Importance Resampling (Xie et al., arXiv:2302.03169)
scores each raw document by log p_target(x) - log p_raw(x) under two
hashed n-gram bag models and resamples by the weights. This stage
computes exactly that log-ratio (unigram features, hashed into a
CONSTANT number of buckets) in integer millinats:

  bucket(tok)  = ('0x' || substr(md5(tok),1,4))::INT % N_BUCKETS
                 (the dedup.py md5 token-hash convention, SQL-replayable)
  target docs  = doc_id % 97 == 0 (the decontam.py held-out-sample
                 convention; callers pass any predicate)
  cost_m(b)    = floor(-1000 * ln((c_m(b)+1) / (n_m + N_BUCKETS)))
                 for model m in {target, raw}; raw = the WHOLE corpus
  llr_milli(d) = sum over d's token INSTANCES of
                 cost_raw(bucket) - cost_target(bucket)

Positive llr => the document looks more like the target domain. The ln
is libm on both engines (see stages/lm.py for the bit-identity argument)
and everything else is integer, so the DuckDB oracle is EXACT.

Scale shape: the model is CONSTANT-bounded (2 x N_BUCKETS int64 cells),
so — unlike lm.py's measured-size regime switch — broadcast is always
the right plan: per-batch bincount partials feed one bucket-keyed
exchange of <= N_BUCKETS rows per batch, the driver folds <= N_BUCKETS
rows into two cost arrays (constant driver state), ray.put ships them
once, and scoring is a single zero-shuffle map pass with a per-batch
token->bucket cache (corpora repeat tokens; the cache turns per-instance
md5 into per-distinct-token md5, the simhash64_batch trick).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from docler_ray.functions.tokens import ws_tokens

N_BUCKETS = 8192
_MILLI = 1000.0

_DSIR_MEMO: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8", "replace")).hexdigest()[:4], 16) % N_BUCKETS


def _cost_array(counts: np.ndarray, total: int) -> np.ndarray:
    denom = total + N_BUCKETS
    return np.array(
        [
            math.floor(-_MILLI * math.log((int(c) + 1) / denom))
            for c in counts
        ],
        dtype=np.int64,
    )


def dsir_log_ratios(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 97,
):
    """documents -> (doc_id, n_tokens, llr_milli), exact integers.

    ``target_mod``: docs with ``doc_id % target_mod == 0`` form the
    target-domain sample (a stand-in for "a held-out sample of the
    distribution you want more of" — swap for any predicate in real use).
    """
    import ray
    from ray.data.aggregate import Sum

    def bucket_partials(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        raw = np.zeros(N_BUCKETS, dtype=np.int64)
        tgt = np.zeros(N_BUCKETS, dtype=np.int64)
        cache: dict[str, int] = {}
        for i, t in zip(ids, texts):
            is_target = int(i) % target_mod == 0
            for tok in ws_tokens(t or ""):
                b = cache.get(tok)
                if b is None:
                    b = _bucket(tok)
                    cache[tok] = b
                raw[b] += 1
                if is_target:
                    tgt[b] += 1
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_raw": pa.array(raw[nz], pa.int64()),
                "c_tgt": pa.array(tgt[nz], pa.int64()),
            }
        )

    model = (
        ds.map_batches(bucket_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("c_raw", alias_name="c_raw"), Sum("c_tgt", alias_name="c_tgt"))
        .to_pandas()  # <= N_BUCKETS rows by construction: constant driver state
    )
    raw_counts = np.zeros(N_BUCKETS, dtype=np.int64)
    tgt_counts = np.zeros(N_BUCKETS, dtype=np.int64)
    if len(model):
        idx = model["bucket"].to_numpy()
        raw_counts[idx] = model["c_raw"].to_numpy()
        tgt_counts[idx] = model["c_tgt"].to_numpy()
    delta = _cost_array(raw_counts, int(raw_counts.sum())) - _cost_array(
        tgt_counts, int(tgt_counts.sum())
    )
    delta_ref = ray.put(delta)

    def score(batch: pa.Table) -> pa.Table:
        key = delta_ref.hex()
        d = _DSIR_MEMO.get(key)
        if d is None:
            d = ray.get(delta_ref)
            if len(_DSIR_MEMO) >= 2:
                _DSIR_MEMO.clear()
            _DSIR_MEMO[key] = d
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        n_out: list[int] = []
        llr_out: list[int] = []
        cache: dict[str, int] = {}
        for t in texts:
            toks = ws_tokens(t or "")
            s = 0
            for tok in toks:
                b = cache.get(tok)
                if b is None:
                    b = _bucket(tok)
                    cache[tok] = b
                s += int(d[b])
            n_out.append(len(toks))
            llr_out.append(s)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column(id_col), pa.int64()),
                "n_tokens": pa.array(n_out, pa.int64()),
                "llr_milli": pa.array(llr_out, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_sql(table: str = "documents", target_mod: int = 97) -> str:
    """The DuckDB replay of :func:`dsir_log_ratios` (same bucket hash,
    same smoothing, same libm ln, same millinat floor)."""
    from docler_ray.functions.tokens import ws_tokens_sql

    ws = ws_tokens_sql("text")
    nb = N_BUCKETS
    return (
        f"WITH toks AS (SELECT doc_id, unnest({ws}) AS tok FROM {table}), "
        "b AS (SELECT doc_id, "
        f"('0x' || substr(md5(tok), 1, 4))::INT % {nb} AS bucket FROM toks), "
        "m AS (SELECT bucket, COUNT(*) AS c_raw, "
        f"COUNT(*) FILTER (doc_id % {target_mod} = 0) AS c_tgt "
        "FROM b GROUP BY bucket), "
        "tot AS (SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM m), "
        "cost AS (SELECT bucket, "
        "CAST(floor(-1000.0 * ln((c_raw + 1)::DOUBLE / "
        f"((SELECT n_raw FROM tot) + {nb})::DOUBLE)) AS BIGINT) "
        "- CAST(floor(-1000.0 * ln((c_tgt + 1)::DOUBLE / "
        f"((SELECT n_tgt FROM tot) + {nb})::DOUBLE)) AS BIGINT) AS delta "
        "FROM m), "
        "scored AS (SELECT b.doc_id, COUNT(*) AS n_tokens, "
        "SUM(c.delta) AS llr_milli FROM b JOIN cost c USING (bucket) "
        "GROUP BY b.doc_id) "
        f"SELECT d.doc_id, CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(s.llr_milli, 0) AS BIGINT) AS llr_milli "
        f"FROM {table} d LEFT JOIN scored s USING (doc_id)"
    )
