"""Corpus bigram-LM quality scoring: per-document negative log-likelihood
under an add-one-smoothed bigram language model estimated from the corpus
itself.

The CCNet-style quality gate (Wenzek et al., arXiv:1911.00359 score docs
with a KenLM n-gram model and filter by perplexity band); the model here
is the textbook add-one bigram LM (Jurafsky & Martin ch. 3) so the whole
thing — training AND scoring — is exact and SQL-replayable:

  p(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V)
  cost(g)  = floor(-1000 * ln p)        [integer millinats]
  nll_milli(doc) = sum over the doc's bigram INSTANCES of cost

Integer millinats make the per-doc sum addition-order independent; the
one float step (ln) is bit-identical across engines because BOTH sides
call the same libm: CPython's math.log and DuckDB's ln diverge on 0 of
200k random rationals on this host, while numpy's vectorized log differs
from libm in the last ulp on ~21% — so cost computation deliberately
loops math.log over DISTINCT grams (model-sized, never instance-sized)
and everything instance-sized stays vectorized/integer.

Scale shape (tokens = the ws_tokens ASCII contract):

1. model pass: per-batch Counter partials emit prefix-tagged keys
   ("g:"+gram with its instance count, "t:"+token once per batch) into
   ONE key-keyed exchange — c2 and the vocabulary share the shuffle.
2. regime switch on the MEASURED model row count (the dedup.py pattern):
   - <= _LM_BROADCAST_MODEL_ROWS: the model is dimension-sized (real
     n-gram LMs are pruned to fit serving memory for the same reason).
     Cost dict built on the driver (bounded by the cap), ray.put once,
     scored in ONE zero-shuffle map pass with a per-worker-process
     deserialization memo (joins.py's broadcast pattern).
   - else: fully distributed — prefix counts via a model-sized exchange,
     cost via a model-sized join, scoring via the instance x model
     big-big hash join, per-doc integer sums, left join onto the doc
     list. No driver state beyond scalars.
The corpus text is tokenized twice (model pass + scoring pass) rather
than materializing the gram-instance table, the same streaming-re-read
tradeoff stages/novelty.py documents.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

from docler_ray.functions.tokens import ws_tokens

_MILLI = 1000.0

# fast-path cap on MODEL rows (distinct grams + distinct tokens). A 2M-row
# cost dict is ~200 MB per worker heap — bounded by this constant, never
# by the corpus. Above it, the distributed regime runs.
_LM_BROADCAST_MODEL_ROWS = 2_000_000

# per-worker-process memo of the broadcast cost dict (built once per
# worker from the zero-copy Arrow table, not once per batch)
_LM_MEMO: dict[str, dict] = {}


def _doc_bigrams(text: str) -> Counter:
    toks = ws_tokens(text)
    return Counter(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))


def _gram_cost(c2: int, c1: int, v: int) -> int:
    # libm ln (see module docstring); floor to integer millinats
    return int(math.floor(-_MILLI * math.log((c2 + 1) / (c1 + v))))


def bigram_lm_scores(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    n_rows: int | None = None,
):
    """documents -> (doc_id, n_bigrams, nll_milli), exact integers.

    ``keep_cols`` pass through unchanged (threaded through the scoring map
    in the broadcast regime and through the doc-list join side in the
    distributed one — no extra exchange either way). Pass ``n_rows`` when
    ``ds`` is a lazy transform chain — the bucket-count probe otherwise
    executes the chain once more (free only on raw reads, where count()
    is parquet metadata)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from docler_ray.stages.dedup import _compact_nonempty, _num_partitions

    import zlib

    n_corpus = n_rows
    if n_corpus is None:
        try:
            n_corpus = ds.count()
        except Exception:  # pragma: no cover - count unavailable pre-exec
            n_corpus = None
    # ~64 documents' gram partials per bucket — the count exchange is keyed
    # on ONE int64 (crc32 of the key string), not the key itself: Ray's
    # sort-based groupby re-materializes a string first-sort-column per
    # partition boundary (find_partition_index), the round-5 sf1 audit's
    # pathological constant. Every occurrence of a key shares its bucket,
    # so the in-bucket Arrow group_by sum is the same GLOBAL count.
    n_buckets = max(64, (n_corpus or 0) // 64)

    def model_partials(batch: pa.Table) -> pa.Table:
        grams: Counter = Counter()
        toks: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            tl = ws_tokens(t or "")
            toks.update(tl)
            grams.update(tl[i] + " " + tl[i + 1] for i in range(len(tl) - 1))
        keys = ["g:" + g for g in grams] + ["t:" + t for t in toks]
        cnts = list(grams.values()) + [1] * len(toks)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
                "coarse": pa.array(
                    [zlib.crc32(k.encode("utf-8")) % n_buckets for k in keys],
                    pa.int64(),
                ),
            }
        )

    def sum_bucket(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["key", "cnt"])
            .group_by("key")
            .aggregate([("cnt", "sum")])
        )
        return pa.table(
            {
                "key": g.column("key"),
                "c2": pc.cast(g.column("cnt_sum"), pa.int64()),
            }
        )

    model, n_model = _compact_nonempty(
        ds.map_batches(model_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )

    def _zero_scores(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "n_bigrams": pa.array([0] * n, pa.int64()),
            "nll_milli": pa.array([0] * n, pa.int64()),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    if model is None or n_model == 0:
        return ds.map_batches(
            _zero_scores, batch_format="pyarrow", zero_copy_batch=True
        )

    if n_model <= _LM_BROADCAST_MODEL_ROWS:
        # ---- bounded broadcast fast path (driver state <= the cap) ----
        mt = model.to_pandas()
        is_gram = mt["key"].str.startswith("g:")
        v = int((~is_gram).sum())
        grams = mt.loc[is_gram]
        gram_strs = grams["key"].str[2:]
        w1 = gram_strs.str.split(" ", n=1).str[0]
        c1 = grams["c2"].groupby(w1.values).transform("sum")
        cost_tab = pa.table(
            {
                "gram": pa.array(gram_strs.tolist(), pa.string()),
                "cost": pa.array(
                    [
                        _gram_cost(int(a), int(b), v)
                        for a, b in zip(grams["c2"].values, c1.values)
                    ],
                    pa.int64(),
                ),
            }
        )
        cost_ref = ray.put(cost_tab)

        def score_batch(batch: pa.Table) -> pa.Table:
            key = cost_ref.hex()
            cost = _LM_MEMO.get(key)
            if cost is None:
                tab = ray.get(cost_ref)  # zero-copy Arrow
                cost = dict(
                    zip(tab.column("gram").to_pylist(), tab.column("cost").to_pylist())
                )
                if len(_LM_MEMO) >= 2:
                    _LM_MEMO.clear()
                _LM_MEMO[key] = cost
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            n_out: list[int] = []
            nll_out: list[int] = []
            for t in texts:
                bg = _doc_bigrams(t or "")
                n_out.append(sum(bg.values()))
                nll_out.append(sum(m * cost[g] for g, m in bg.items()))
            cols = {
                id_col: pa.array([int(i) for i in ids], pa.int64()),
                "n_bigrams": pa.array(n_out, pa.int64()),
                "nll_milli": pa.array(nll_out, pa.int64()),
            }
            for c in keep_cols:
                cols[c] = batch.column(c)
            return pa.table(cols)

        return ds.map_batches(
            score_batch, batch_format="pyarrow", zero_copy_batch=True
        )

    # ---- distributed regime (no driver state beyond scalars) ----
    # V: model-sized block scan of the materialized model, no exchange
    v = model.map_batches(
        lambda b: pa.table(
            {"one": pc.cast(pc.starts_with(b.column("key"), "t:"), pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sum("one")

    def gram_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.starts_with(batch.column("key"), "g:"))
        grams = [k[2:] for k in t.column("key").to_pylist()]
        w1 = [g.split(" ", 1)[0] for g in grams]
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "w1": pa.array(w1, pa.string()),
                "c2": t.column("c2"),
            }
        )

    c2w = model.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    c1 = (
        c2w.map_batches(
            lambda b: pa.table({"w1": b.column("w1"), "c2p": b.column("c2")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("w1")
        .aggregate(Sum("c2p", alias_name="c1"))
    )

    c2w_c, n_grams_total = _compact_nonempty(c2w)
    if c2w_c is None:
        # tokens exist but no doc has 2 tokens: every doc scores zero
        return ds.map_batches(
            _zero_scores, batch_format="pyarrow", zero_copy_batch=True
        )

    merged = c2w_c.join(
        c1,
        join_type="inner",
        on=("w1",),
        num_partitions=_num_partitions(n_grams_total),
    )

    def cost_rows(batch: pa.Table) -> pa.Table:
        costs = [
            _gram_cost(int(a), int(b), int(v))
            for a, b in zip(
                batch.column("c2").to_pylist(), batch.column("c1").to_pylist()
            )
        ]
        return pa.table(
            {"gram": batch.column("gram"), "cost": pa.array(costs, pa.int64())}
        )

    cost = merged.map_batches(cost_rows, batch_format="pyarrow", zero_copy_batch=True)

    def doc_pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_doc: list[int] = []
        out_gram: list[str] = []
        out_m: list[int] = []
        for i, t in zip(ids, texts):
            for g, m in _doc_bigrams(t or "").items():
                out_doc.append(int(i))
                out_gram.append(g)
                out_m.append(m)
        return pa.table(
            {
                "doc": pa.array(out_doc, pa.int64()),
                "gram": pa.array(out_gram, pa.string()),
                "m": pa.array(out_m, pa.int64()),
            }
        )

    pairs, n_pairs = _compact_nonempty(
        ds.map_batches(doc_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    scored = pairs.join(
        cost, join_type="inner", on=("gram",), num_partitions=_num_partitions(n_pairs)
    )

    nll = (
        scored.map_batches(
            lambda b: pa.table(
                {
                    "doc": b.column("doc"),
                    "m": b.column("m"),
                    "nll_p": pc.multiply(b.column("m"), b.column("cost")),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("doc")
        .aggregate(Sum("nll_p", alias_name="nll_milli"), Sum("m", alias_name="n_bigrams"))
    )

    # all doc ids (docs with 0 bigrams get zero rows) — no tokenization
    def doc_list(b: pa.Table) -> pa.Table:
        cols = {"doc": pc.cast(b.column(id_col), pa.int64())}
        for c in keep_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    left, n_docs = _compact_nonempty(
        ds.map_batches(doc_list, batch_format="pyarrow", zero_copy_batch=True)
    )
    joined = left.join(
        nll, join_type="left_outer", on=("doc",), num_partitions=_num_partitions(n_docs)
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {
            id_col: batch.column("doc"),
            "n_bigrams": pc.cast(
                pc.fill_null(batch.column("n_bigrams"), 0), pa.int64()
            ),
            "nll_milli": pc.cast(
                pc.fill_null(batch.column("nll_milli"), 0), pa.int64()
            ),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# a NULL lang must form its own NTILE partition exactly like SQL; the
# sentinel only keys driver-side count/offset tables, never the output
_NULL_LANG = "\x00<null-lang>"

# test hook: when set (driver-side, before building the pipeline) the tier
# scan raises if any group exceeds this many rows — the runtime proof that
# the round-3 whole-language-group plan is gone (captured at build time so
# it ships to workers with the closure; a worker-side module global would
# not see a driver monkeypatch)
_SCAN_GROUP_ROWS_CAP: int | None = None

# refinement: split any (lang, bucket) holding more than FACTOR x
# packing._TARGET_ROWS rows, for at most ROUNDS driver-triggered passes
_TIER_REFINE_FACTOR = 4
_TIER_REFINE_ROUNDS = 2


def perplexity_tiers(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    buckets: int = 3,
    n_rows: int | None = None,
    keep_cols: tuple[str, ...] = (),
):
    """CCNet's head/middle/tail split (arXiv:1911.00359 §4.3): per
    language, rank documents by per-bigram LM cost and NTILE them into
    ``buckets`` (tier 1 = head = most fluent). Output
    (doc_id, lang, n_bigrams, ppl_milli, tier, *keep_cols).

    ``ppl_milli`` = nll_milli / n_bigrams as ONE IEEE double division
    (0.0 for bigram-less docs), so DuckDB produces bit-identical values
    and ORDER BY (ppl_milli, doc_id) agrees across engines.

    Scale plan (the round-3 lang-keyed ``map_groups`` put a WHOLE language
    in one pandas frame — hash(lang) has only |langs| images, so the
    coarse-keyspace bound was void; this is the distributed-rank rewrite):

    1. score (the lm pipeline), append ppl, materialize the result ONCE —
       two passes follow and must not re-run the LM chain.
    2. order-preserving range bucket on the IEEE bit pattern of ppl:
       non-negative doubles order identically to their int64 bit
       patterns, so ``(bits - lo) * (B / span)`` floored is a monotone
       map into ~``packing._TARGET_ROWS``-sized buckets regardless of
       language cardinality. Equal ppl -> equal bucket (ties stay
       together; their mutual order is doc_id, resolved in the scan).
    3. per-(lang, bucket) counts -> driver (|langs| x B rows, never
       corpus rows); exclusive per-lang cumsum over bucket order gives
       every bucket its exact within-lang rank offset; the offset map is
       ``ray.put`` once (joins.py broadcast memo), not shipped per task.
    4. per-(lang, bucket) group scan: local sort by (ppl, id), global
       within-lang rank = offset + local index, NTILE by the SQL-standard
       fill formula. Each task holds ONE ~TARGET_ROWS bucket.

    5. refinement (up to 2 rounds, driver-triggered only when a
       (lang, bucket) exceeds ``_TIER_REFINE_FACTOR x TARGET`` rows): an
       oversized bucket with ppl SPREAD re-ranges on its own narrower
       bit span (resolution x B per round); an oversized bucket of pure
       TIES (min ppl == max ppl — e.g. every doc bigram-less) splits by
       doc_id range, which is order-preserving exactly because tied rows
       order purely by id. Refined buckets get fresh ids in a disjoint
       namespace and sort as (parent, sub) when offsets are assigned, so
       rank order is preserved. This closes the round-4 first-cut's
       residual limit — no corpus shape can hand one task a whole
       language (or a whole tie-mass) anymore."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from docler_ray.stages.joins import _get_broadcast
    from docler_ray.stages.packing import _bucket_count

    scored = bigram_lm_scores(
        ds,
        text_col=text_col,
        id_col=id_col,
        keep_cols=(lang_col, *keep_cols),
        n_rows=n_rows,
    )

    def add_ppl(batch: pa.Table) -> pa.Table:
        n = batch.column("n_bigrams").to_numpy()
        nll = batch.column("nll_milli").to_numpy()
        ppl = np.where(n > 0, nll / np.maximum(n, 1), 0.0)
        return batch.append_column("ppl_milli", pa.array(ppl, pa.float64()))

    # narrow unless keep_cols carries text; either way the scan exchange
    # below moves the same columns the round-3 lang exchange moved
    with_ppl = scored.map_batches(
        add_ppl, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_total = with_ppl.count()
    b = int(buckets)

    if n_total == 0:
        types = dict(zip(with_ppl.schema().names, with_ppl.schema().types))
        cols = {
            id_col: pa.array([], pa.int64()),
            lang_col: pa.array([], types[lang_col]),
            "n_bigrams": pa.array([], pa.int64()),
            "ppl_milli": pa.array([], pa.float64()),
            "tier": pa.array([], pa.int64()),
        }
        for c in keep_cols:
            cols[c] = pa.array([], types[c])
        return ray.data.from_arrow(pa.table(cols))

    import docler_ray.stages.packing as _packing

    n_buckets = _bucket_count(n_total)
    target_rows = int(_packing._TARGET_ROWS)
    bounds = with_ppl.aggregate(
        Min("ppl_milli", alias_name="lo"), Max("ppl_milli", alias_name="hi")
    )
    lo_bits = int(np.float64(bounds["lo"]).view(np.int64))
    hi_bits = int(np.float64(bounds["hi"]).view(np.int64))
    span = max(hi_bits - lo_bits, 1)
    # int64 -> float64 conversion, multiply-by-positive and floor are all
    # monotone, so equal bits share a bucket and bucket order == ppl order
    scale = float(n_buckets) / float(span)

    def _lang_key(batch: pa.Table):
        return pc.fill_null(
            pc.cast(batch.column(lang_col), pa.string()), _NULL_LANG
        )

    def make_rb(levels: tuple):
        """Bucket id as a pure function of (ppl bits, doc id) under the
        given refinement levels; each level rewrites oversized parent ids
        to ``start + sub`` where sub is a monotone re-range on the
        parent's own bit span (spread) or id span (pure ties)."""

        def rb_of(batch: pa.Table) -> np.ndarray:
            ppl = np.ascontiguousarray(
                batch.column("ppl_milli").to_numpy(), dtype=np.float64
            )
            bits = ppl.view(np.int64)
            rb = np.minimum(
                ((bits - lo_bits) * scale).astype(np.int64), n_buckets - 1
            )
            ids = (
                pc.cast(batch.column(id_col), pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            for parents, starts, modes, los, spans, sizes in levels:
                pos = np.searchsorted(parents, rb)
                mask = (pos < len(parents)) & (
                    parents[np.minimum(pos, len(parents) - 1)] == rb
                )
                if not mask.any():
                    continue
                p = pos[mask]
                key = np.where(modes[p] == 0, bits[mask], ids[mask])
                # float multiply by each parent's own positive scale is
                # monotone; identical keys share a sub-bucket
                sub = (
                    (key - los[p]).astype(np.float64)
                    * (sizes[p].astype(np.float64) / spans[p].astype(np.float64))
                ).astype(np.int64)
                rb[mask] = starts[p] + np.clip(sub, 0, sizes[p] - 1)
            return rb

        return rb_of

    def measure_counts(levels: tuple):
        """(lang_key, rb) -> rows, ppl min/max, id min/max — Arrow group_by
        partials map-side, one tiny exchange, never corpus rows."""
        rb_of = make_rb(levels)

        def partial(batch: pa.Table) -> pa.Table:
            g = (
                pa.table(
                    {
                        "lang_key": _lang_key(batch),
                        "rb": pa.array(rb_of(batch), pa.int64()),
                        "ppl": batch.column("ppl_milli"),
                        "id": pc.cast(batch.column(id_col), pa.int64()),
                    }
                )
                .group_by(["lang_key", "rb"])
                .aggregate(
                    [
                        ([], "count_all"),
                        ("ppl", "min"),
                        ("ppl", "max"),
                        ("id", "min"),
                        ("id", "max"),
                    ]
                )
            )
            return pa.table(
                {
                    "lang_key": g.column("lang_key"),
                    "rb": g.column("rb"),
                    "pn": pc.cast(g.column("count_all"), pa.int64()),
                    "pmin": g.column("ppl_min"),
                    "pmax": g.column("ppl_max"),
                    "imin": g.column("id_min"),
                    "imax": g.column("id_max"),
                }
            )

        return (
            with_ppl.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["lang_key", "rb"])
            .aggregate(
                Sum("pn", alias_name="n"),
                Min("pmin", alias_name="pmin"),
                Max("pmax", alias_name="pmax"),
                Min("imin", alias_name="imin"),
                Max("imax", alias_name="imax"),
            )
            .to_pandas()
        )

    # refinement loop: re-measure, split any (lang, bucket) that exceeds
    # the factor x TARGET bound — spread buckets re-range on their own
    # narrower bit span, pure-tie buckets split by doc_id range (their
    # rank order is purely id). Triggered only when needed; each round is
    # one pass over the materialized narrow table.
    levels: list[tuple] = []
    order_key: dict[int, tuple] = {}  # refined rb -> (parent-chain) sort key
    next_base = 1 << 40
    refine_cap = _TIER_REFINE_FACTOR * target_rows
    for _ in range(_TIER_REFINE_ROUNDS + 1):
        counts = measure_counts(tuple(levels))
        big = counts[counts["n"] > refine_cap]
        if big.empty or len(levels) >= _TIER_REFINE_ROUNDS:
            break
        # per-rb aggregates across langs: the split must be a pure
        # function of the row, identical for every language in the bucket
        agg = (
            big.groupby("rb")
            .agg(
                n=("n", "sum"),
                pmin=("pmin", "min"),
                pmax=("pmax", "max"),
                imin=("imin", "min"),
                imax=("imax", "max"),
            )
            .sort_index()
        )
        parents = agg.index.to_numpy().astype(np.int64)
        sizes = np.minimum(
            np.maximum(agg["n"].to_numpy() // target_rows, 2), 65536
        ).astype(np.int64)
        pmin_b = (
            np.ascontiguousarray(agg["pmin"].to_numpy(), dtype=np.float64)
            .view(np.int64)
        )
        pmax_b = (
            np.ascontiguousarray(agg["pmax"].to_numpy(), dtype=np.float64)
            .view(np.int64)
        )
        ties = pmin_b == pmax_b
        modes = np.where(ties, 1, 0).astype(np.int64)
        los = np.where(ties, agg["imin"].to_numpy(), pmin_b).astype(np.int64)
        spans = np.maximum(
            np.where(ties, agg["imax"].to_numpy() - agg["imin"].to_numpy(), pmax_b - pmin_b),
            1,
        ).astype(np.int64)
        starts = next_base + np.concatenate(([0], np.cumsum(sizes)[:-1]))
        next_base += int(sizes.sum()) + 1
        for i, parent in enumerate(parents):
            pkey = order_key.get(int(parent), (int(parent),))
            for s in range(int(sizes[i])):
                order_key[int(starts[i] + s)] = (*pkey, s)
        levels.append((parents, starts, modes, los, spans, sizes))

    # offsets: per lang, exclusive cumsum over buckets in PPL order —
    # refined ids sort by their parent-chain key, not their numeric id
    maxlen = max((len(v) for v in order_key.values()), default=1)

    def _okey(rb_val: int) -> tuple:
        k = order_key.get(int(rb_val), (int(rb_val),))
        return k + (-1,) * (maxlen - len(k))

    counts = counts.assign(_ord=[_okey(v) for v in counts["rb"]]).sort_values(
        ["lang_key", "_ord"], kind="mergesort"
    )
    langs = counts["lang_key"].drop_duplicates().tolist()
    lang_id = {k: i for i, k in enumerate(langs)}
    # offset table as SORTED ARRAYS, not a dict: langs x B entries reach
    # ~n/TARGET rows at extreme corpus sizes, where a Python dict costs
    # ~100 B/entry in every worker heap; three int64 arrays + searchsorted
    # keep the broadcast at 24 B/entry and the lookup vectorizable
    gkeys_l, starts_l, nlang_l = [], [], []
    for lk, grp in counts.groupby("lang_key", sort=False):
        ns = grp["n"].to_numpy().astype(np.int64)
        starts0 = np.concatenate(([0], np.cumsum(ns)[:-1]))
        nl = int(ns.sum())
        base = lang_id[lk] * (1 << 42)
        gkeys_l.append(base + grp["rb"].to_numpy().astype(np.int64))
        starts_l.append(starts0)
        nlang_l.append(np.full(len(ns), nl, dtype=np.int64))
    gkeys_arr = np.concatenate(gkeys_l)
    order0 = np.argsort(gkeys_arr, kind="stable")
    off_ref = ray.put(
        (
            gkeys_arr[order0],
            np.concatenate(starts_l)[order0],
            np.concatenate(nlang_l)[order0],
        )
    )
    langs_arr = pa.array(langs, pa.string())
    final_rb = make_rb(tuple(levels))

    def add_gkey(batch: pa.Table) -> pa.Table:
        lid = (
            pc.index_in(_lang_key(batch), value_set=langs_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rb = final_rb(batch)
        return batch.append_column(
            "gkey", pa.array(lid * (1 << 42) + rb, pa.int64())
        )

    rows_cap = _SCAN_GROUP_ROWS_CAP

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    lang_col: pd.Series([], dtype="object"),
                    "n_bigrams": pd.Series([], dtype="int64"),
                    "ppl_milli": pd.Series([], dtype="float64"),
                    "tier": pd.Series([], dtype="int64"),
                    **{c: pd.Series([], dtype="object") for c in keep_cols},
                }
            )
        if rows_cap is not None and len(df) > rows_cap:
            raise AssertionError(
                f"tier scan group holds {len(df)} rows > cap {rows_cap}"
            )
        gk_arr, st_arr, nl_arr = _get_broadcast(off_ref)
        pos = int(np.searchsorted(gk_arr, int(df["gkey"].iloc[0])))
        start, nl = int(st_arr[pos]), int(nl_arr[pos])
        df = df.sort_values(["ppl_milli", id_col], kind="mergesort")
        i0 = start + np.arange(len(df), dtype=np.int64)
        q, r = nl // b, nl % b
        split = r * (q + 1)
        tier = (
            np.where(i0 < split, i0 // max(q + 1, 1), r + (i0 - split) // max(q, 1))
            + 1
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                lang_col: df[lang_col].to_numpy(),
                "n_bigrams": df["n_bigrams"].to_numpy(),
                "ppl_milli": df["ppl_milli"].to_numpy(),
                "tier": tier.astype(np.int64),
                **{c: df[c].to_numpy() for c in keep_cols},
            }
        )

    return (
        with_ppl.map_batches(add_gkey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gkey")
        .map_groups(scan, batch_format="pandas")
    )
