"""Distributed statistics operators: exact quantiles over bounded domains
and deterministic sampling.

No reference precedent (docler's only aggregates are running counters,
SURVEY.md §2.7); these are corpus-triage operators. Scale pattern: the
shuffle ships (group, value, partial_count) triples — never rows — and the
final quantile walk runs over the value-count table, whose size is bounded
by the value domain, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def grouped_discrete_quantile(
    ds, *, value_col: str, group_col: str, q: float = 0.5
) -> pa.Table:
    """Exact discrete quantile of an integer column per group.

    Semantics match DuckDB's ``quantile_disc``: the element at 0-based
    sorted index ``ceil(n*q) - 1`` (probed empirically — NOT
    ``floor((n-1)*q)``; the two coincide only at q=0.5). Implementation:
    map-side value counts -> one groupby over (group, value) partials ->
    per-group cumulative walk over the (small) count table. Assumes the
    value domain is bounded (lengths, scores, page counts) — the count
    table is domain-sized, not corpus-sized.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, value_col]).to_pandas()
        g = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .reset_index(name="partial_n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, value_col])
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()
    )
    out_groups, out_vals = [], []
    for grp, sub in counts.groupby(group_col, sort=True):
        sub = sub.sort_values(value_col, kind="mergesort")
        total = int(sub["n"].sum())
        target = max(0, int(np.ceil(total * q)) - 1)
        cum = sub["n"].cumsum().to_numpy()
        idx = int(np.searchsorted(cum, target + 1))
        out_groups.append(grp)
        out_vals.append(sub[value_col].iloc[idx])
    return pa.table(
        {
            group_col: pa.array(out_groups),
            f"q{int(q * 100)}_{value_col}": pa.array(
                pd.Series(out_vals).astype("int64")
            ),
        }
    )


def grouped_discrete_quantiles(
    ds, *, value_col: str, group_col: str, qs: list[float]
) -> pa.Table:
    """Multiple exact discrete quantiles per group in ONE count exchange —
    :func:`grouped_discrete_quantile` generalized so a p25/p50/p75/p95
    profile costs the same single (group, value)-keyed shuffle instead of
    one corpus pass per q. Same quantile_disc semantics (0-based index
    ``ceil(n*q) - 1``) and the same bounded-value-domain assumption; the
    cumulative walk reuses one cumsum for every q.
    """
    from ray.data.aggregate import Sum

    if not qs:
        raise ValueError("grouped_discrete_quantiles needs at least one q")
    names = [f"q{int(q * 100)}_{value_col}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError("qs produce duplicate output column names")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, value_col]).to_pandas()
        g = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .reset_index(name="partial_n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, value_col])
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()
    )
    out_groups: list = []
    out_vals: dict = {name: [] for name in names}
    for grp, sub in counts.groupby(group_col, sort=True):
        sub = sub.sort_values(value_col, kind="mergesort")
        total = int(sub["n"].sum())
        cum = sub["n"].cumsum().to_numpy()
        out_groups.append(grp)
        for q, name in zip(qs, names):
            target = max(0, int(np.ceil(total * q)) - 1)
            idx = int(np.searchsorted(cum, target + 1))
            out_vals[name].append(int(sub[value_col].iloc[idx]))
    cols = {group_col: pa.array(out_groups)}
    for name in names:
        cols[name] = pa.array(out_vals[name], pa.int64())
    return pa.table(cols)


_SAMPLE_MOD = 1_000_003  # prime fold keeping the product in int64 range
_SAMPLE_MULT = 2_654_435_761  # Knuth multiplicative constant
_SAMPLE_SHIFT_DIV = 1 << 20  # take HIGH bits of the product before % 100
_REDUCE_BLOCKS = 8  # bottom-k tree-reduce width (driver collect <= 8 x k rows)


def sample_hash_bucket(ids: np.ndarray) -> np.ndarray:
    """Deterministic 0-99 bucket per integer id — pure arithmetic, so the
    EXACT same expression is writable in SQL (no library hash involved):
    ``((id % 1000003) * 2654435761) // 1048576 % 100``.

    The multiply-then-HIGH-BITS step matters: taking the product mod 100
    directly would make the bucket a pure function of (id % 100) — a
    residue-class sample, correlated with any periodic id-assignment
    pattern. Extracting bits 20+ of the product mixes the multiplier's
    avalanche into the bucket (round-1 ADVICE finding)."""
    mixed = (ids.astype(np.int64) % _SAMPLE_MOD) * _SAMPLE_MULT
    return (mixed // _SAMPLE_SHIFT_DIV) % 100


def bottomk_sample_quantiles(
    ds,
    *,
    value_col: str,
    id_col: str,
    qs: list[float],
    k: int = 4096,
) -> pa.Table:
    """Approximate quantiles from a DETERMINISTIC bottom-k-by-hash sample —
    the mergeable-sketch pattern with an exactly SQL-mirrorable definition.

    Each map batch keeps its k rows with the smallest (sample-hash(id), id)
    keys — so the partial stream is k rows PER BATCH — then one
    ``repartition(_REDUCE_BLOCKS)`` + per-block bottom-k merge bounds what
    reaches the driver at ``_REDUCE_BLOCKS x k`` rows REGARDLESS of input
    block count (without the reduce, a 10^6-block corpus would collect
    10^6 x k partial rows). The driver keeps the global bottom-k (a
    uniform-without-replacement sample, stable across runs and
    partitionings) and reads values off the sorted sample at the DuckDB
    ``quantile_disc`` index ``ceil(n*q) - 1``. Sampling error is the
    standard ~1/sqrt(k) quantile deviation; the ORACLE is exact because
    DuckDB selects the identical sample (ORDER BY the same hash expression
    LIMIT k).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mixed = (ids % _SAMPLE_MOD) * _SAMPLE_MULT
        order = np.lexsort((ids, mixed))[:k]
        return pa.table(
            {
                "mixed": pa.array(mixed[order]),
                id_col: pa.array(ids[order]),
                value_col: batch.column(value_col).take(pa.array(order)),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        mixed = batch.column("mixed").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, mixed))[:k]
        return batch.take(pa.array(order))

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(_REDUCE_BLOCKS)
        .map_batches(
            merge_block,
            batch_format="pyarrow",
            batch_size=None,  # whole blocks: one bottom-k per output block
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    partials = partials.sort_values(["mixed", id_col], kind="mergesort").head(k)
    vals = np.sort(partials[value_col].to_numpy())
    n = len(vals)
    out_q, out_v = [], []
    for q in qs:
        out_q.append(q)
        # DuckDB quantile_disc convention: element at ceil(n*q) - 1
        out_v.append(vals[max(0, int(np.ceil(n * q)) - 1)] if n else None)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def grouped_bottomn_sample(ds, *, group_col: str, id_col: str, n: int):
    """Stratified deterministic sample: the ``n`` rows with the smallest
    (sample-hash(id), id) keys PER GROUP — a fixed-size
    uniform-without-replacement sample per stratum (lang, source, ...),
    stable across runs and partitionings, with an exactly SQL-mirrorable
    definition (ROW_NUMBER over the same hash expression).

    Scale pattern: each batch keeps its per-group bottom-n (vectorized
    pandas), so the shuffle ships at most n x groups rows per batch; the
    final per-group head-n runs in ``map_groups``. Nothing is
    corpus-proportional as long as the group count is bounded (strata are
    categorical by construction).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, id_col]).to_pandas()
        ids = df[id_col].to_numpy().astype(np.int64)
        df["_mixed"] = (ids % _SAMPLE_MOD) * _SAMPLE_MULT
        df = df.sort_values(["_mixed", id_col], kind="mergesort")
        df = df.groupby(group_col, sort=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df[[group_col, id_col]]
        df = df.sort_values(["_mixed", id_col], kind="mergesort").head(n)
        return df[[group_col, id_col]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(head_n, batch_format="pandas")
    )


def deterministic_sample(ds, *, id_col: str, pct: int):
    """Keep rows whose id hashes into the first ``pct`` of 100 buckets.

    Seedless and stable across runs/cluster sizes (resume-safe): membership
    depends only on the id. Vectorized filter per batch; no shuffle.
    """

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        mask = sample_hash_bucket(ids) < pct
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def equi_width_histogram(
    ds,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int,
):
    """Equi-width histogram: counts per bucket of ``[lo, hi)`` split into
    ``n_buckets`` (out-of-range values clamp to the edge buckets, so every
    row lands exactly once). The canonical map-side pre-aggregation shape:
    each batch reduces to <= n_buckets (bucket, partial) rows via one
    vectorized ``np.bincount``, then a tiny groupby sums partials — the
    shuffle ships O(n_buckets x num_blocks) rows, never values.

    Bucket arithmetic is the single float64 expression
    ``floor((v - lo) * n_buckets / (hi - lo))`` evaluated identically by
    the DuckDB oracle, so counts hash-match exactly.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if not (hi > lo) or n_buckets < 1:
        raise ValueError("need hi > lo and n_buckets >= 1")
    width_den = float(hi - lo)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        b = np.floor((v - lo) * n_buckets / width_den)
        b = np.clip(b, 0, n_buckets - 1).astype(np.int64)
        counts = np.bincount(b, minlength=n_buckets)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "partial_n": pa.array(counts[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def grouped_moments(ds, *, group_col: str, value_col: str):
    """Grouped mean + population variance from MERGEABLE integer moments.

    Per batch, each group reduces to (n, sum, sum-of-squares) — all exact
    int64 — so the shuffle ships O(groups x blocks) partial rows and the
    combine is plain integer Sum (addition-order independent, unlike
    accumulating floats). The closed forms are evaluated ONCE per group in
    arbitrary-precision Python ints, then rounded by a single IEEE divide:
    ``mean = float(s1)/float(n)``, ``var = float(n*s2 - s1^2)/float(n*n)``
    — the DuckDB oracle computes the identical expressions from HUGEINT
    sums, so both engines round the same exact integers through the same
    one division and the doubles hash-match bit-for-bit.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(), "v": v})
        df["v2"] = df["v"] * df["v"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("v", "size"), p_s1=("v", "sum"), p_s2=("v2", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_s1", alias_name="s1"),
            Sum("p_s2", alias_name="s2"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # group-count-sized rows: exact Python-int closed forms, one IEEE
        # divide each (matches the oracle's HUGEINT -> DOUBLE arithmetic)
        n = batch.column("n_rows").to_pylist()
        s1 = batch.column("s1").to_pylist()
        s2 = batch.column("s2").to_pylist()
        mean = [float(a) / float(b) for a, b in zip(s1, n)]
        var = [
            float(b * c - a * a) / float(b * b) for a, b, c in zip(s1, n, s2)
        ]
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "mean_val": pa.array(mean, pa.float64()),
                "var_val": pa.array(var, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_max_coarse(ds, *, key_cols: list[str], value_col: str, n_rows=None):
    """Exact MAX(value) per composite key through a SINGLE-int64 coarse
    exchange instead of a multi-column Ray groupby.

    Ray 2.49's sort-based groupby re-materializes sort columns per
    partition boundary (``find_partition_index``), which on composite
    keys with string/timestamp columns costs O(boundaries x rows)
    conversions — the round-5 sf1 tier measured a 1.5M-row
    (int64, timestamp) groupby at 15.3 s where the same volume keyed on
    one int64 takes ~1 s. Plan: per-batch Arrow group_by partial max
    (the only corpus-sized pass), then ``coarse = hash(key_cols[0]) % P``
    co-location and an in-bucket Arrow group_by max. The FIRST key alone
    determines the bucket, so every partial of a composite key lands in
    one bucket and the in-bucket max is global-exact; the remaining key
    columns ride as payload, never as sort keys. The first key must be
    integer-typed."""
    import numpy as np
    import pyarrow as pa

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_buckets = max(64, (n_rows or 0) // 65536)
    vmax = f"{value_col}_max"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([*key_cols, value_col]).group_by(key_cols).aggregate(
            [(value_col, "max")]
        )
        first = g.column(key_cols[0]).to_numpy(zero_copy_only=False)
        coarse = (
            (first.astype(np.uint64) * np.uint64(1000003)) % np.uint64(n_buckets)
        ).astype(np.int64)
        return g.append_column("coarse", pa.array(coarse, pa.int64()))

    def merge(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([*key_cols, vmax])
            .group_by(key_cols)
            .aggregate([(vmax, "max")])
        )
        cols = {k: g.column(k) for k in key_cols}
        cols[value_col] = g.column(f"{vmax}_max")
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_comoments(ds, *, group_col: str, x_col: str, y_col: str):
    """Grouped population covariance from mergeable integer co-moments.

    Same exactness contract as :func:`grouped_moments`: per batch each
    group reduces to (n, sum_x, sum_y, sum_xy) — all exact int64, so the
    combine is order-independent integer Sum — and
    ``cov = float(n*sxy - sx*sy) / float(n*n)`` rounds exact Python ints
    through one IEEE divide, matching the oracle's HUGEINT arithmetic
    bit-for-bit."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {group_col: batch.column(group_col).to_pandas(), "x": x, "y": y}
        )
        df["xy"] = df["x"] * df["y"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_sx=("x", "sum"), p_sy=("y", "sum"),
            p_sxy=("xy", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_sx", alias_name="sx"),
            Sum("p_sy", alias_name="sy"),
            Sum("p_sxy", alias_name="sxy"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_rows").to_pylist()
        sx = batch.column("sx").to_pylist()
        sy = batch.column("sy").to_pylist()
        sxy = batch.column("sxy").to_pylist()
        cov = [
            float(b * d - a * c) / float(b * b)
            for a, b, c, d in zip(sx, n, sy, sxy)
        ]
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "cov_val": pa.array(cov, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_pearson(ds, *, group_col: str, x_col: str, y_col: str):
    """Grouped Pearson correlation from mergeable integer co-moments.

    Extends :func:`grouped_comoments` with the two square sums: per batch
    each group reduces to (n, sx, sy, sxy, sxx, syy) — exact int64
    partials, order-independent Sum — and

        r = float(n*sxy - sx*sy)
            / (sqrt(float(n*sxx - sx*sx)) * sqrt(float(n*syy - sy*sy)))

    Every float op (int->double cast, sqrt, multiply, divide) is IEEE
    correctly-rounded and evaluated in the SAME expression order by the
    HUGEINT oracle, so the doubles hash-match bit-for-bit. Zero-variance
    groups get NULL (the oracle's NULLIF twin). Bound (same as
    grouped_comoments): int64 partials require n * max(x^2) < 2^63 per
    block — holds for bounded per-doc ints at any corpus size because
    partials are per-BLOCK; the global combine is exact Python int via
    per-group Sum of block partials, which overflows only past ~9e18
    total mass (document the shard-the-sum fallback if a corpus ever
    crosses it).
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {group_col: batch.column(group_col).to_pandas(), "x": x, "y": y}
        )
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_sx=("x", "sum"), p_sy=("y", "sum"),
            p_sxy=("xy", "sum"), p_sxx=("xx", "sum"), p_syy=("yy", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_sx", alias_name="sx"),
            Sum("p_sy", alias_name="sy"),
            Sum("p_sxy", alias_name="sxy"),
            Sum("p_sxx", alias_name="sxx"),
            Sum("p_syy", alias_name="syy"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        corr = []
        for r in rows:
            n, sx, sy = r["n_rows"], r["sx"], r["sy"]
            vx = float(n * r["sxx"] - sx * sx)
            vy = float(n * r["syy"] - sy * sy)
            den = math.sqrt(vx) * math.sqrt(vy)
            corr.append(
                None if den == 0.0 else float(n * r["sxy"] - sx * sy) / den
            )
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "corr_val": pa.array(corr, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def key_count_log2_histogram(ds, *, key_col: str, n_rows: int | None = None):
    """Key-skew profile: histogram of per-key row counts in floor(log2(n))
    buckets — (bucket, n_keys, n_rows) — the shuffle-planning diagnostic
    that tells you whether a key is safe to partition on BEFORE paying the
    all-to-all (hot keys land in the high buckets).

    Plan (the grouped_max_coarse exchange shape): per-batch Arrow group_by
    count partials, ONE ``hash(key) % P`` int64 coarse exchange — every
    partial of a key shares its bucket, so the in-bucket per-key total is
    global-exact — then each bucket emits its (log2-bucket, n_keys,
    n_rows) partial rows and a dimension-sized groupby Sum folds them.
    The log2 bucket is computed integer-exactly via ``np.frexp``
    (exponent-1 == bit_length-1 for counts < 2^53 — never a float log,
    whose last-ulp rounding can cross the floor at exact powers of two);
    the SQL twin is ``length(bin(n)) - 1``, pure integer/string.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_rows = None
    n_buckets = max(64, (n_rows or 0) // 65536)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col]).group_by([key_col]).aggregate(
            [([], "count_all")]
        )
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(keys.dtype, np.integer):
            import zlib

            keys = np.array(
                [zlib.crc32(str(k).encode("utf-8")) for k in keys], np.uint64
            )
        coarse = (
            (keys.astype(np.uint64) * np.uint64(1000003)) % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                key_col: g.column(key_col),
                "partial_n": pc.cast(g.column("count_all"), pa.int64()),
                "coarse": pa.array(coarse, pa.int64()),
            }
        )

    def bucketize(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key_col, "partial_n"])
            .group_by([key_col])
            .aggregate([("partial_n", "sum")])
        )
        n = g.column("partial_n_sum").to_numpy(zero_copy_only=False)
        _, exp = np.frexp(n.astype(np.float64))
        bucket = (exp - 1).astype(np.int64)
        h = (
            pa.table({"bucket": pa.array(bucket), "n": pa.array(n)})
            .group_by(["bucket"])
            .aggregate([([], "count_all"), ("n", "sum")])
        )
        return pa.table(
            {
                "bucket": h.column("bucket"),
                "p_keys": pc.cast(h.column("count_all"), pa.int64()),
                "p_rows": h.column("n_sum"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("p_keys", alias_name="n_keys"),
            Sum("p_rows", alias_name="n_rows"),
        )
    )


def grouped_skewness(ds, *, group_col: str, value_col: str):
    """Grouped population skewness from mergeable integer moments.

    Per batch each group reduces to (n, s1, s2, s3) — exact int64
    partials. The closed form cancels every division by n:

        A = n^2*s3 - 3n*s1*s2 + 2*s1^3   (= n^3 * third central moment)
        B = n*s2 - s1^2                  (= n^2 * variance)
        skew = float(A) / (sb * sb * sb)   where sb = sqrt(float(B))

    A and B are exact Python ints (A exceeds int64 — s1^3 — so the
    finalize runs in arbitrary precision; the SQL twin uses HUGEINT);
    the float path is one cast per term, ONE sqrt, a left-associated
    cube, one divide — the identical IEEE sequence the oracle evaluates,
    so the doubles hash-match. Zero-variance groups get NULL.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(), "x": x})
        df["x2"] = df["x"] * df["x"]
        df["x3"] = df["x2"] * df["x"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_s1=("x", "sum"), p_s2=("x2", "sum"),
            p_s3=("x3", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_s1", alias_name="s1"),
            Sum("p_s2", alias_name="s2"),
            Sum("p_s3", alias_name="s3"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        skew = []
        for r in batch.to_pylist():
            n, s1, s2, s3 = r["n_rows"], r["s1"], r["s2"], r["s3"]
            a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
            b = n * s2 - s1 * s1
            if b == 0:
                skew.append(None)
                continue
            sb = math.sqrt(float(b))
            skew.append(float(a) / (sb * sb * sb))
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "skew_val": pa.array(skew, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_kurtosis(ds, *, group_col: str, value_col: str):
    """Grouped population kurtosis from mergeable integer moments — the
    fourth moment completes the mean/var/cov/skew family.

    Per batch each group reduces to (n, s1, s2, s3, s4) exact int64
    partials. The closed form cancels every division by n:

        A4 = n^3*s4 - 4n^2*s1*s3 + 6n*s1^2*s2 - 3*s1^4  (= n^4 * m4c)
        B  = n*s2 - s1^2                                 (= n^2 * m2c)
        kurtosis = float(A4) / (fb * fb)   where fb = float(B)

    (m4c/m2c^2 — n^4 cancels exactly.) A4 and B are exact Python ints
    (A4 exceeds int64 via s1^4; the SQL twin uses HUGEINT); the float
    path is one cast per term, a left-associated square, one divide —
    bit-identical doubles. Zero-variance groups get NULL. A normal
    distribution gives ~3.0 (no -3 excess adjustment — the population
    moment ratio, matching the explicit oracle expression, NOT DuckDB's
    sample-adjusted kurtosis()).

    Overflow bound: the s4 partials are int64, so the operator requires
    corpus_rows_per_group * max(x)^4 < 2^63 — fine for small bounded
    ints (token counts, line counts), NOT for raw char lengths; rescale
    or bucket the value first if x can exceed ~10^4 at 10^9 rows.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(), "x": x})
        df["x2"] = df["x"] * df["x"]
        df["x3"] = df["x2"] * df["x"]
        df["x4"] = df["x2"] * df["x2"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_s1=("x", "sum"), p_s2=("x2", "sum"),
            p_s3=("x3", "sum"), p_s4=("x4", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_s1", alias_name="s1"),
            Sum("p_s2", alias_name="s2"),
            Sum("p_s3", alias_name="s3"),
            Sum("p_s4", alias_name="s4"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        kurt = []
        for r in batch.to_pylist():
            n, s1, s2, s3, s4 = r["n_rows"], r["s1"], r["s2"], r["s3"], r["s4"]
            a4 = (
                n * n * n * s4
                - 4 * n * n * s1 * s3
                + 6 * n * s1 * s1 * s2
                - 3 * s1 * s1 * s1 * s1
            )
            b = n * s2 - s1 * s1
            if b == 0:
                kurt.append(None)
                continue
            fb = float(b)
            kurt.append(float(a4) / (fb * fb))
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "kurt_val": pa.array(kurt, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_zscore(ds, *, group_col: str, value_col: str, keep_cols: list[str]):
    """Per-row z-score standardization against the row's GROUP moments —
    the classic two-pass ML-preprocessing stage (fit: one aggregate
    exchange; transform: zero-shuffle broadcast map).

    Exactness: with integer values, z = (x - mean)/std_pop rewrites as

        z = float(n*x - s1) / sqrt(float(n*s2 - s1^2))

    — numerator and radicand are exact ints, so the float path is one
    cast each, one sqrt, one divide: bit-identical to the SQL twin that
    joins the same integer-sum CTE. Zero-variance groups get NULL.

    Scale: the fit table is GROUP-COUNT-sized (languages, categories) —
    the one sanctioned driver materialization — and ships to every
    transform task as three small dicts; the transform pass is pure map,
    so the corpus never shuffles. For high-cardinality groups use the
    coarse-exchange operators instead; this is the broadcast regime.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(), "x": x})
        df["x2"] = df["x"] * df["x"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_s1=("x", "sum"), p_s2=("x2", "sum")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    fit = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_s1", alias_name="s1"),
            Sum("p_s2", alias_name="s2"),
        )
    )
    # group-count-sized driver materialization (the broadcast regime)
    n_by: dict = {}
    s1_by: dict = {}
    den_by: dict = {}
    for r in fit.take_all():
        n, s1, s2 = int(r["n_rows"]), int(r["s1"]), int(r["s2"])
        b = n * s2 - s1 * s1
        n_by[r[group_col]] = n
        s1_by[r[group_col]] = s1
        den_by[r[group_col]] = math.sqrt(float(b)) if b > 0 else None

    def transform(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = g.map(n_by).to_numpy(dtype=np.int64)
        s1 = g.map(s1_by).to_numpy(dtype=np.int64)
        den = g.map(den_by).to_numpy(dtype=np.float64)
        num = (n * x - s1).astype(np.float64)
        with np.errstate(invalid="ignore"):
            z = num / den
        cols = {c: batch.column(c) for c in keep_cols}
        cols["zscore"] = pa.array(z, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mode(ds, *, group_col: str, value_col: str):
    """MODE per group (most frequent value; ties break to the SMALLEST
    value, so the result is deterministic and SQL-replayable).

    Plan: map-side partial counts per (group, value) batch-locally, one
    groupby over the pair key sums them (exchange sized by distinct
    pairs), then per-batch argmax partials and one group-keyed merge pick
    (max n, min value) — the second exchange ships one candidate row per
    group per block. All integers; no corpus-proportional state anywhere.
    """
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, value_col]).to_pandas()
        g = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .reset_index(name="partial_n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, value_col])
        .aggregate(Sum("partial_n", alias_name="n"))
    )

    def best_local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # (max n, min value) per group within this block
        df = df.sort_values([group_col, "n", value_col],
                            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(1), preserve_index=False
        )

    def best_global(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", value_col], ascending=[False, True],
                            kind="mergesort")
        return df.head(1)

    return (
        counts.map_batches(best_local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(best_global, batch_format="pandas")
    )


ROLLUP_ALL = "__all__"  # sentinel for the rolled-up level (columns are non-null)


def rollup_counts(ds, cols: list[str]):
    """ROLLUP counts (every GROUP BY prefix level) in ONE corpus pass.

    Each batch emits its partial counts for all len(cols)+1 rollup levels
    — (c1..ck), (c1..ck-1), ..., () — with rolled-up columns set to the
    ``ROLLUP_ALL`` sentinel, then one groupby sums partials. The exchange
    ships O(levels x groups x blocks) partial rows, never data rows; the
    grand-total level is 1 row per block. The SQL twin is GROUP BY ROLLUP
    with the same COALESCE sentinel, so counts hash-match exactly.
    """
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if not cols:
        raise ValueError("rollup_counts needs at least one column")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        levels = []
        for k in range(len(cols), -1, -1):
            if k == 0:
                lvl = pd.DataFrame(
                    {c: [ROLLUP_ALL] for c in cols} | {"partial_n": [len(df)]}
                )
            else:
                g = (
                    df.groupby(cols[:k], sort=False)
                    .size()
                    .reset_index(name="partial_n")
                )
                for c in cols[k:]:
                    g[c] = ROLLUP_ALL
                lvl = g[cols + ["partial_n"]]
            levels.append(lvl)
        return pa.Table.from_pandas(
            pd.concat(levels, ignore_index=True), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cols)
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def cube_counts(ds, cols: list[str]):
    """CUBE counts (every SUBSET grouping level, 2^k of them) in ONE
    corpus pass — ROLLUP's power-set sibling, the SQL ``GROUP BY CUBE``.

    Each batch emits its partial counts for all 2^k subset levels with
    non-grouped columns set to the ``ROLLUP_ALL`` sentinel; one groupby
    sums partials. The exchange ships O(2^k x groups x blocks) partial
    rows, never data rows — 2^k is schema-sized, so k is capped at 4
    (16 levels): a wider cube is a schema-design error, not a data size.
    The SQL twin is GROUP BY CUBE with the same COALESCE sentinel.
    """
    from itertools import combinations

    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if not cols:
        raise ValueError("cube_counts needs at least one column")
    if len(cols) > 4:
        raise ValueError("cube_counts caps at 4 columns (16 levels)")

    subsets = [
        list(s) for k in range(len(cols), -1, -1) for s in combinations(cols, k)
    ]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        levels = []
        for sub in subsets:
            if not sub:
                lvl = pd.DataFrame(
                    {c: [ROLLUP_ALL] for c in cols} | {"partial_n": [len(df)]}
                )
            else:
                g = df.groupby(sub, sort=False).size().reset_index(name="partial_n")
                for c in cols:
                    if c not in sub:
                        g[c] = ROLLUP_ALL
                lvl = g[cols + ["partial_n"]]
            levels.append(lvl)
        return pa.Table.from_pandas(
            pd.concat(levels, ignore_index=True), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cols)
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def unpivot(
    ds,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """UNPIVOT / melt — the wide->long reshape inverse of
    :func:`pivot_counts` (SQL ``UNPIVOT w ON c1, c2 ... INTO NAME var
    VALUE val``, pandas ``melt``).

    Pure map: each batch emits one stacked slice per value column
    (id columns zero-copy-referenced, the variable column a constant
    string per slice), so the op is ZERO-shuffle and streams at any
    scale — the output is k x input rows but never co-located.
    Value columns must share one Arrow type (SQL UNPIVOT's rule);
    mixed types are a schema error, not something to coerce silently.
    """
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")

    def melt(batch: pa.Table) -> pa.Table:
        types = {str(batch.schema.field(c).type) for c in value_cols}
        if len(types) > 1:
            raise ValueError(f"unpivot value columns mix types: {sorted(types)}")
        n = batch.num_rows
        parts = []
        for c in value_cols:
            cols = {ic: batch.column(ic) for ic in id_cols}
            cols[var_name] = pa.array([c] * n, pa.string())
            cols[value_name] = batch.column(c)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def entropy_from_counts(ds, *, id_cols: list[str], count_cols: list[str]):
    """Shannon entropy (nats) per row of a WIDE count table — compose
    after :func:`pivot_counts` for "entropy of a declared alphabet per
    entity" (behavioral diversity per user, script mix per host, ...).

    H = ln(n) - (c1*ln(c1) + ... + ck*ln(ck)) / n, evaluated in the
    DECLARED column order with 0*ln(0) = 0. Float determinism: every ln
    goes through libm ``math.log`` via a unique-value lookup (NEVER
    vectorized np.log, whose last ulp diverges from libm — the
    repo-wide rule), products/sums/divide are elementwise IEEE in the
    same fixed order the SQL twin spells out, so the doubles hash-match.
    Rows with n == 0 get NULL. Pure map — zero shuffle.
    """
    import math

    if not count_cols:
        raise ValueError("entropy_from_counts needs count columns")

    def _xlogx(arr: np.ndarray) -> np.ndarray:
        u, inv = np.unique(arr, return_inverse=True)
        vals = np.array(
            [0.0 if v <= 0 else float(v) * math.log(float(v)) for v in u],
            np.float64,
        )
        return vals[inv]

    def _logn(arr: np.ndarray) -> np.ndarray:
        u, inv = np.unique(arr, return_inverse=True)
        vals = np.array(
            [math.log(float(v)) if v > 0 else np.nan for v in u], np.float64
        )
        return vals[inv]

    def ent(batch: pa.Table) -> pa.Table:
        counts = [
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in count_cols
        ]
        n = counts[0].copy()
        for c in counts[1:]:
            n = n + c
        s = _xlogx(counts[0])
        for c in counts[1:]:
            s = s + _xlogx(c)
        with np.errstate(invalid="ignore", divide="ignore"):
            h = _logn(n) - s / n.astype(np.float64)
        cols = {c: batch.column(c) for c in id_cols}
        cols["n"] = pa.array(n, pa.int64())
        cols["entropy"] = pa.array(h, pa.float64(), from_pandas=True)
        return pa.table(cols)

    return ds.map_batches(ent, batch_format="pyarrow", zero_copy_batch=True)


def weighted_group_sample(
    ds,
    *,
    group_col: str,
    id_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
):
    """Training-mix construction: keep each row with its GROUP's sampling
    percentage (e.g. downsample en to 25% while keeping all de) — the
    per-source reweighting step that turns a filtered corpus into a training
    mixture. Deterministic and resume-safe: the keep decision is the same
    arithmetic bucket as :func:`deterministic_sample`
    (``sample_hash_bucket(id) < pct[group]``), so reruns and different
    partitionings select the identical row set, and the oracle replays the
    expression as a SQL CASE. Zero shuffle — one vectorized filter pass; the
    rates table is a handful of entries shipped in the task closure.
    """
    for g, p in rates.items():
        if not 0 <= int(p) <= 100:
            raise ValueError(f"rate out of [0,100] for group {g!r}: {p}")

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        buckets = sample_hash_bucket(ids)
        groups = pd.Series(batch.column(group_col).to_pylist())
        pct = groups.map(rates).fillna(default_pct).to_numpy(dtype=np.int64)
        return batch.filter(pa.array(buckets < pct))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def pivot_counts(ds, *, row_col: str, col_col: str, col_values: list):
    """PIVOT (crosstab) counts: one output row per ``row_col`` value, one
    int64 count column per DECLARED ``col_values`` entry (named
    ``<col_col>_<value>``) — the SQL ``PIVOT ... IN (...)`` shape.

    The column domain must be declared up front, exactly like SQL's
    IN-list: at corpus scale the pivoted columns are the output SCHEMA,
    and a schema cannot depend on an undiscovered unbounded domain.
    Values outside ``col_values`` are dropped (SQL IN-list semantics).

    Scale plan: each batch bincounts its (row, declared-col) matrix —
    vectorized over ``row_idx * k + col_idx`` — and emits ONE wide partial
    row per distinct row value, so the exchange ships
    O(rows x blocks) x k-wide partials, never data rows; a single groupby
    Sum folds them. Row cardinality bounds the output (dimension-sized:
    event types, languages, status codes), so no coarse keying is needed —
    the exchange is already tiny by construction.
    """
    from ray.data.aggregate import Sum

    if not col_values:
        raise ValueError("pivot_counts needs a declared col_values domain")
    out_names = [f"{col_col}_{v}" for v in col_values]
    if len(set(out_names)) != len(out_names):
        raise ValueError("col_values produce duplicate output column names")
    k = len(col_values)
    val_index = {v: i for i, v in enumerate(col_values)}

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([row_col, col_col]).to_pandas()
        col_idx = df[col_col].map(val_index)
        keep = col_idx.notna()
        df = df[keep]
        col_idx = col_idx[keep].to_numpy(dtype=np.int64)
        rows, row_idx = np.unique(df[row_col].to_numpy(), return_inverse=True)
        counts = np.bincount(
            row_idx * k + col_idx, minlength=len(rows) * k
        ).reshape(len(rows), k)
        cols = {row_col: pa.array(rows)}
        for j, name in enumerate(out_names):
            cols[name] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(row_col)
        .aggregate(*[Sum(n, alias_name=n) for n in out_names])
    )


_NARROW_BUCKETS = 1024  # histogram width per narrowing pass (driver holds B ints)
_NARROW_COLLECT_CAP = 65536  # collect the candidate slice once it's this small


def exact_quantiles_narrowing(ds, *, value_col: str, qs: list[float]):
    """EXACT discrete quantiles (quantile_disc semantics: the element at
    0-based sorted index ``ceil(q*n) - 1``) over an unbounded DOUBLE column
    — the continuous-domain sibling of ``grouped_discrete_quantiles``
    (which exchanges exact per-value counts and needs a bounded value
    domain).

    Plan: distributed binary search. Each pass histograms every still-active
    target's interval [lo, hi] into _NARROW_BUCKETS equal-width buckets with
    map-side int64 partials plus an EXACT strict-below count (v < lo), then
    descends to the rank-owning bucket WIDENED BY ONE BUCKET EACH SIDE —
    the slack absorbs float boundary fuzz in the (v-lo)/width binning, so
    the invariant "the target value lies in [lo, hi]" survives every pass
    without trusting bucket-edge arithmetic. The strict-below count is
    recomputed from the raw range each pass (never accumulated), so no
    rounding error can bias the rank. Once a target's interval holds
    <= _NARROW_COLLECT_CAP values (or collapses to zero width — the
    duplicate-heavy stall exit, reached in <= ~64 passes by the float
    mantissa bound) the slice is collected and resolved exactly.

    All active targets share one scan per round: zero shuffle, O(passes)
    streaming reads, driver state = targets x (B+1) counters. Returns a
    driver-side Arrow table (q, value) — quantile output is constant-sized
    by definition.
    """
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    if not qs:
        raise ValueError("exact_quantiles_narrowing needs at least one q")
    n = ds.count()
    if n == 0:
        return pa.table(
            {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
        )

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo0, hi0 = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])

    targets = [
        {
            "q": q,
            "k": max(math.ceil(q * n) - 1, 0),
            "lo": lo0,
            "hi": hi0,
            "count": n,
            "value": None,
        }
        for q in qs
    ]

    def hist_pass(intervals):
        """One scan: for each interval, bucket counts of values in [lo, hi]
        plus the exact count of values strictly below lo (bucket -1)."""
        b = _NARROW_BUCKETS
        ivs = [(float(lo), float(hi)) for lo, hi in intervals]

        def partial(batch: pa.Table) -> pa.Table:
            v = batch.column(value_col).to_numpy(zero_copy_only=False)
            rows = []
            belows = []
            for lo, hi in ivs:
                belows.append(int((v < lo).sum()))
                sel = v[(v >= lo) & (v <= hi)]
                width = hi - lo
                if width <= 0:
                    counts = np.zeros(b, dtype=np.int64)
                    counts[0] = len(sel)
                else:
                    idx = np.clip(
                        ((sel - lo) / width * b).astype(np.int64), 0, b - 1
                    )
                    counts = np.bincount(idx, minlength=b).astype(np.int64)
                rows.append(counts)
            flat = np.concatenate(
                [np.concatenate(([bl], cs)) for bl, cs in zip(belows, rows)]
            )
            return pa.table(
                {
                    "iv": pa.array(
                        np.repeat(np.arange(len(ivs)), b + 1), pa.int64()
                    ),
                    "bucket": pa.array(
                        np.tile(np.arange(-1, b), len(ivs)), pa.int64()
                    ),
                    "c": pa.array(flat, pa.int64()),
                }
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["iv", "bucket"])
            .aggregate(Sum("c", alias_name="n"))
            .to_pandas()
        )
        out = np.zeros((len(ivs), b + 1), dtype=np.int64)
        out[agg["iv"].to_numpy(), agg["bucket"].to_numpy() + 1] = agg[
            "n"
        ].to_numpy()
        return out[:, 0], out[:, 1:]

    def resolve(t):
        """Collect the candidate slice [lo, hi] and pick the exact element:
        rel = k - exact strict-below count, both range-based (no bucket
        arithmetic), so earlier binning fuzz cannot bias the answer."""
        lo, hi = t["lo"], t["hi"]

        # two bounded reads: the slice itself and the exact below-count
        vals = (
            ds.map_batches(
                lambda batch: batch.filter(
                    pc.and_(
                        pc.greater_equal(batch.column(value_col), lo),
                        pc.less_equal(batch.column(value_col), hi),
                    )
                ).select([value_col]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()[value_col]
            .to_numpy()
        )
        below = (
            ds.map_batches(
                lambda batch: pa.table(
                    {
                        "b": pa.array(
                            [
                                int(
                                    pc.sum(
                                        pc.less(batch.column(value_col), lo)
                                    ).as_py()
                                    or 0
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .aggregate(Sum("b", alias_name="n"))["n"]
        )
        vals = np.sort(vals)
        return float(vals[t["k"] - int(below)])

    b = _NARROW_BUCKETS
    for _ in range(90):  # ~341x shrink/pass + float-width floor: ample
        for t in targets:
            if t["value"] is None and (
                t["count"] <= _NARROW_COLLECT_CAP or t["hi"] <= t["lo"]
            ):
                if t["hi"] <= t["lo"]:
                    t["value"] = t["lo"]
                else:
                    t["value"] = resolve(t)
        active = [t for t in targets if t["value"] is None]
        if not active:
            break
        belows, hists = hist_pass([(t["lo"], t["hi"]) for t in active])
        for i, t in enumerate(active):
            counts = hists[i]
            rel = t["k"] - int(belows[i])  # 0-based rank inside [lo, hi]
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, rel + 1))
            width = t["hi"] - t["lo"]
            j_lo, j_hi = max(j - 1, 0), min(j + 1, b - 1)
            new_lo = t["lo"] + width * j_lo / b
            new_hi = t["hi"] if j_hi == b - 1 else t["lo"] + width * (j_hi + 1) / b
            t["count"] = int(counts[j_lo : j_hi + 1].sum())
            t["lo"], t["hi"] = max(new_lo, t["lo"]), min(new_hi, t["hi"])

    return pa.table(
        {
            "q": pa.array([t["q"] for t in targets], pa.float64()),
            "value": pa.array([t["value"] for t in targets], pa.float64()),
        }
    )


def priority_sample(ds, *, id_col: str, weight_col: str, k: int):
    """Weight-proportional fixed-size sample by PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM 54(6) 2007): priority q_i = w_i / u_i with
    u_i uniform from the id hash; the k largest priorities form the sample
    (subset-sum estimation then uses the (k+1)-th priority as the
    threshold). The fixed-k weighted sibling of weighted_group_sample
    (rate-based) and sample_k_per_lang (unweighted).

    Deterministic and engine-portable WITHOUT libm: u_i is the 52-bit
    md5(id) prefix + 1 (<= 2^52, so the int -> double conversion is exact),
    and q_i is ONE correctly-rounded IEEE divide — bit-identical in numpy
    and DuckDB (``w / (('0x' || substr(md5(id::VARCHAR),1,13))::UBIGINT +
    1)``), unlike exponential keys (-ln(u)/w) whose libm calls vary.
    Zero shuffle: hash + divide map-side, then the bounded top-k fold
    (driver holds k rows)."""
    import hashlib

    from docler_ray.stages.topk import topk

    def add_priority(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.fromiter(
            (
                int(hashlib.md5(str(d).encode("utf-8")).hexdigest()[:13], 16)
                for d in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        pri = w.astype(np.float64) / (h + 1).astype(np.float64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                weight_col: batch.column(weight_col),
                "priority": pa.array(pri, pa.float64()),
            }
        )

    mapped = ds.map_batches(
        add_priority, batch_format="pyarrow", zero_copy_batch=True
    )
    return topk(
        mapped,
        sort_col="priority",
        k=k,
        keep_cols=[id_col, weight_col],
        tie_col=id_col,
    )


def grouped_ols(ds, *, group_col: str, x_col: str, y_col: str):
    """Grouped simple linear regression (population OLS) from the same
    mergeable integer co-moments as :func:`grouped_pearson`:

        slope     = float(n*sxy - sx*sy) / float(n*sxx - sx*sx)
        intercept = (float(sy) - slope * float(sx)) / float(n)

    Every float op is IEEE correctly-rounded in a pinned order, so the
    doubles hash-match the HUGEINT-sum SQL twin. Zero-x-variance groups
    get NULL slope and intercept (NULLIF twin). One group-keyed exchange
    of 5-int partials; nothing else moves.
    """
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {group_col: batch.column(group_col).to_pandas(), "x": x, "y": y}
        )
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        g = df.groupby(group_col, sort=False).agg(
            p_n=("x", "size"), p_sx=("x", "sum"), p_sy=("y", "sum"),
            p_sxy=("xy", "sum"), p_sxx=("xx", "sum"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(
            Sum("p_n", alias_name="n_rows"),
            Sum("p_sx", alias_name="sx"),
            Sum("p_sy", alias_name="sy"),
            Sum("p_sxy", alias_name="sxy"),
            Sum("p_sxx", alias_name="sxx"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        slopes, intercepts = [], []
        for r in batch.to_pylist():
            n, sx, sy = r["n_rows"], r["sx"], r["sy"]
            den = n * r["sxx"] - sx * sx
            if den == 0:
                slopes.append(None)
                intercepts.append(None)
                continue
            slope = float(n * r["sxy"] - sx * sy) / float(den)
            slopes.append(slope)
            intercepts.append((float(sy) - slope * float(sx)) / float(n))
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n_rows": batch.column("n_rows"),
                "slope": pa.array(slopes, pa.float64()),
                "intercept": pa.array(intercepts, pa.float64()),
            }
        )

    return sums.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mad_discrete(ds, *, value_col: str, group_col: str):
    """Per-group exact median + median absolute deviation for an integer
    column with a bounded value domain (quantile_disc semantics at both
    levels, matching a spelled-out two-CTE SQL twin — NOT DuckDB's
    interpolating mad()).

    Two passes, each shipping (group, value, count) partials only: pass 1
    computes per-group medians (grouped_discrete_quantile); the
    group-sized median table broadcasts into pass 2's |x - med| transform,
    so documents never shuffle.
    """
    import ray

    med_tbl = grouped_discrete_quantile(ds, value_col=value_col, group_col=group_col)
    med_col = f"q50_{value_col}"
    med_map = dict(
        zip(med_tbl.column(group_col).to_pylist(), med_tbl.column(med_col).to_pylist())
    )
    med_ref = ray.put(med_map)

    def dev(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        g = batch.column(group_col).to_pylist()
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        med = np.fromiter((m[k] for k in g), dtype=np.int64, count=len(g))
        return pa.table(
            {
                group_col: batch.column(group_col),
                "dev": pa.array(np.abs(v - med)),
            }
        )

    dev_ds = ds.select_columns([group_col, value_col]).map_batches(
        dev, batch_format="pyarrow", zero_copy_batch=True
    )
    mad_tbl = grouped_discrete_quantile(dev_ds, value_col="dev", group_col=group_col)
    mad_map = dict(
        zip(mad_tbl.column(group_col).to_pylist(), mad_tbl.column("q50_dev").to_pylist())
    )
    groups = sorted(med_map)
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(groups),
                "median_val": pa.array(
                    [med_map[g] for g in groups], pa.int64()
                ),
                "mad": pa.array([mad_map[g] for g in groups], pa.int64()),
            }
        )
    )
