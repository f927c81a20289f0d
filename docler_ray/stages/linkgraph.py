"""Web link-graph operators: anchor extraction, host-graph construction,
integer fixed-point PageRank, degree profiles, and triangle counting.

The reference's converter tier stops at per-document markdown
(/root/reference/src/docler/converters/base.py:118-287 yields text only);
these are the engine-tier continuations every Common-Crawl-style corpus
needs once pages are parsed: the link graph is a first-class output of web
extraction, and PageRank (Brin & Page, 1998) / triangle counting (Suri &
Vassilvitskii, WWW'11 node-iterator) are the canonical consumers.

Scale notes (100 TB corpus, ~10^8 hosts):

- ``extract_links`` is map-only (zero shuffle): per-page DOM walk in the
  same actor-pool shape as the extraction pipeline, emitting one row per
  resolved anchor.
- ``host_edge_counts`` is map-side pre-aggregated; the only exchange is
  keyed by (src_host, dst_host) — edge-cardinality, the graph's natural
  partitioning, reused by every downstream operator.
- ``pagerank`` keeps ALL arithmetic in int64 fixed-point (scale 10^12) so
  the distributed result hash-matches a SQL replay bit-for-bit: the sum of
  per-edge contributions is an exact integer no matter how Ray orders the
  combine. Ranks are node-cardinality; under ``broadcast_cap`` MEASURED
  nodes they ride the object store as one ``ray.put`` dict per iteration
  (edges never leave their partitions — one groupby(dst) exchange per
  iteration); above the cap the documented fallback is a per-iteration
  copartitioned join on src (2 exchanges/iter). Dangling nodes (out-degree
  0) leak their mass — the classic simplification — and the SQL twin leaks
  identically.
- ``triangle_stats`` orients each undirected edge by the (degree, id)
  total order, bounding every out-neighborhood by O(sqrt(m)); wedges are
  emitted per oriented source and closed by ONE copartitioned join against
  the oriented edge set — the m^{3/2} MapReduce bound.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np
import pyarrow as pa

PAGERANK_SCALE = 10**12
_WS_RE = re.compile(r"\s+")

# Hrefs that never become graph edges (non-navigational schemes).
_SKIP_PREFIXES = ("javascript:", "mailto:", "data:", "tel:", "about:")

# MEASURED node-count bound for the broadcast rank-dict regime. ~2M hosts
# x (str + int64) is tens of MB in the object store — well under a worker
# heap; a 10^8-host web graph takes the distributed-join regime instead.
_PAGERANK_BROADCAST_CAP = 2_000_000

# MEASURED distinct-edge bound below which the whole iteration runs on the
# driver (identical int64 arithmetic — regime-equality pinned in tests):
# a graph this small is setup-bound in the distributed plan (5 iterations
# x fixed AllToAll setup for a few thousand rows).
_PAGERANK_LOCAL_EDGE_CAP = 200_000


def resolve_href(base_url: str, href: str) -> str | None:
    """RFC 3986 resolution of an anchor href against its page URL.

    Returns the absolute http(s) URL with the fragment stripped, or None
    for empty / fragment-only / non-navigational (javascript:, mailto:,
    data:, tel:) hrefs and non-http results.
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href[:11].lower()
    for p in _SKIP_PREFIXES:
        if low.startswith(p):
            return None
    try:
        out = urljoin(base_url, href)
    except ValueError:
        return None
    frag = out.find("#")
    if frag >= 0:
        out = out[:frag]
    if not out.startswith(("http://", "https://")):
        return None
    return out


def url_host(url: str) -> str:
    """Lowercased authority of an absolute http(s) URL ('' if malformed)."""
    i = url.find("://")
    if i < 0:
        return ""
    rest = url[i + 3 :]
    for stop in ("/", "?", "#"):
        j = rest.find(stop)
        if j >= 0:
            rest = rest[:j]
    return rest.lower()


_LINKS_SCHEMA = pa.schema(
    [
        pa.field("src_url", pa.string()),
        pa.field("src_host", pa.string()),
        pa.field("dst_url", pa.string()),
        pa.field("dst_host", pa.string()),
        pa.field("anchor", pa.string()),
        pa.field("nofollow", pa.bool_()),
    ]
)


def extract_links_batch(batch: pa.Table, *, url_col: str = "url", html_col: str = "html") -> pa.Table:
    """Per-batch anchor extraction: decode (charset ladder) -> DOM parse
    (the extraction pipeline's own fast tokenizer) -> one output row per
    resolved <a href>. Non-HTML / undecodable payloads contribute no rows
    (link extraction is a best-effort side-channel of extraction — the
    per-row error contract lives in the extraction pipeline itself)."""
    from docler_ray.html.charset import decode_html
    from docler_ray.html.dom import parse_html

    urls = batch.column(url_col).to_pylist()
    payloads = batch.column(html_col).to_pylist()
    src_urls: list[str] = []
    dst_urls: list[str] = []
    anchors: list[str] = []
    nofollows: list[bool] = []
    for page_url, payload in zip(urls, payloads):
        if payload is None:
            continue
        if isinstance(payload, str):
            text = payload
        else:
            try:
                text, _codec = decode_html(payload)
            except Exception:
                continue
        if "<a" not in text and "<A" not in text:
            continue
        try:
            root = parse_html(text)
        except Exception:
            continue
        for node in root.find_all("a"):
            dst = resolve_href(page_url, node.attr("href"))
            if dst is None:
                continue
            src_urls.append(page_url)
            dst_urls.append(dst)
            anchors.append(_WS_RE.sub(" ", node.get_text()).strip())
            rel = node.attr("rel").lower().split()
            nofollows.append("nofollow" in rel)
    return pa.table(
        {
            "src_url": pa.array(src_urls, pa.string()),
            "src_host": pa.array([url_host(u) for u in src_urls], pa.string()),
            "dst_url": pa.array(dst_urls, pa.string()),
            "dst_host": pa.array([url_host(u) for u in dst_urls], pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "nofollow": pa.array(nofollows, pa.bool_()),
        },
        schema=_LINKS_SCHEMA,
    )


def extract_links(ds, *, url_col: str = "url", html_col: str = "html"):
    """Map-only link extraction over a pages Dataset (url, html binary)."""

    def fn(batch: pa.Table) -> pa.Table:
        return extract_links_batch(batch, url_col=url_col, html_col=html_col)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def host_edge_counts(links, *, follow_only: bool = True, drop_self: bool = True):
    """(src_host, dst_host, n) — the host graph. Map-side Arrow group_by
    partials, then ONE (src_host, dst_host)-keyed exchange."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if follow_only and "nofollow" in batch.column_names:
            batch = batch.filter(pc.invert(batch.column("nofollow")))
        if drop_self:
            batch = batch.filter(
                pc.not_equal(batch.column("src_host"), batch.column("dst_host"))
            )
        g = (
            batch.select(["src_host", "dst_host"])
            .group_by(["src_host", "dst_host"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["src_host", "dst_host", "pn"])

    return (
        links.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("pn", alias_name="n"))
    )


def degree_profile(edges, *, src_col: str = "src_host", dst_col: str = "dst_host", n_col: str = "n"):
    """Per-host (out_deg, in_deg, out_links, in_links) from distinct-edge
    counts — both endpoints emitted map-side, ONE host-keyed exchange."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.column(n_col).cast(pa.int64())
        k = len(batch)
        zeros = pa.array(np.zeros(k, dtype=np.int64))
        ones = pa.array(np.ones(k, dtype=np.int64))
        t_out = pa.table(
            {
                "host": batch.column(src_col),
                "p_out_deg": ones,
                "p_in_deg": zeros,
                "p_out_links": n,
                "p_in_links": zeros,
            }
        )
        t_in = pa.table(
            {
                "host": batch.column(dst_col),
                "p_out_deg": zeros,
                "p_in_deg": ones,
                "p_out_links": zeros,
                "p_in_links": n,
            }
        )
        g = pa.concat_tables([t_out, t_in]).group_by("host").aggregate(
            [
                ("p_out_deg", "sum"),
                ("p_in_deg", "sum"),
                ("p_out_links", "sum"),
                ("p_in_links", "sum"),
            ]
        )
        return g.rename_columns(
            ["host", "p_out_deg", "p_in_deg", "p_out_links", "p_in_links"]
        )

    return (
        edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(
            Sum("p_out_deg", alias_name="out_deg"),
            Sum("p_in_deg", alias_name="in_deg"),
            Sum("p_out_links", alias_name="out_links"),
            Sum("p_in_links", alias_name="in_links"),
        )
    )


def _contrib_partials(edges_w, rank_ref, src_col: str, dst_col: str):
    """Map-side per-dst contribution sums for one PageRank iteration:
    contrib(u->v) = R(u) // outdeg(u), exact int64."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        ranks: dict = ray.get(rank_ref) if rank_ref is not None else {}
        src = batch.column(src_col).to_pylist()
        od = batch.column("outdeg").to_numpy(zero_copy_only=False)
        r = np.fromiter((ranks.get(s, 0) for s in src), dtype=np.int64, count=len(src))
        contrib = r // od
        t = pa.table({dst_col: batch.column(dst_col), "pc_": pa.array(contrib)})
        g = t.group_by(dst_col).aggregate([("pc_", "sum")])
        return g.rename_columns([dst_col, "pc_"])

    return edges_w.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def pagerank(
    edges,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    iters: int = 5,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    broadcast_cap: int | None = None,
):
    """Integer fixed-point PageRank over DISTINCT directed edges.

    R_0(v)   = scale // N
    R_{t+1}(v) = ((den-num)*scale) // (den*N)
                 + (num * SUM_{u->v} R_t(u) // outdeg(u)) // den

    Every operation is int64 (floor divisions, order-independent sums), so
    the result is identical to the unrolled SQL twin regardless of combine
    order. Returns (host, rank_fp:int64, rank:float64) where rank is the
    ONE correctly-rounded IEEE divide rank_fp / scale.

    Regimes (MEASURED on node count): <= broadcast_cap nodes -> rank dict
    broadcast per iteration, one groupby(dst) exchange per iteration and a
    node-sized driver fold; above the cap raises with the documented
    distributed-join plan (per-iteration copartitioned join on src) so a
    silent driver OOM can never happen.
    """
    import ray
    from ray.data.aggregate import Sum

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap

    from ray.data.aggregate import Count

    # Distinct edges + out-degree, one (src,dst) exchange; outdeg attached
    # map-side from the node-sized broadcast dict.
    ded = edges.groupby([src_col, dst_col]).aggregate(Count(alias_name="_m"))
    ded = ded.drop_columns(["_m"]).materialize()

    local_cap = min(cap, _PAGERANK_LOCAL_EDGE_CAP)
    if ded.count() <= local_cap:
        # MEASURED small-graph regime: the distinct edge set fits on the
        # driver, where 5 iterations of exact int64 arithmetic beat 5
        # rounds of AllToAll setup. Bitwise-identical to the distributed
        # path (same floor divides, same order-independent sums).
        edf = ded.to_pandas()
        e_src = edf[src_col].tolist()
        e_dst = edf[dst_col].tolist()
        od_loc: dict = {}
        for s in e_src:
            od_loc[s] = od_loc.get(s, 0) + 1
        nodes_loc = sorted(set(e_src) | set(e_dst))
        n_loc = len(nodes_loc)
        if n_loc == 0:
            return _ranks_dataset({}, scale)
        base_loc = ((damping_den - damping_num) * scale) // (damping_den * n_loc)
        r_loc = {h: scale // n_loc for h in nodes_loc}
        for _t in range(iters):
            s_loc = dict.fromkeys(nodes_loc, 0)
            for a, b in zip(e_src, e_dst):
                s_loc[b] += r_loc[a] // od_loc[a]
            r_loc = {
                h: base_loc + (damping_num * s_loc[h]) // damping_den
                for h in nodes_loc
            }
        return _ranks_dataset(r_loc, scale)

    # Node set as a Dataset first: COUNT before any driver-side collect so
    # an over-cap graph raises instead of OOMing the driver.
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.concat_tables(
                    [
                        pa.table({"host": batch.column(src_col)}),
                        pa.table({"host": batch.column(dst_col)}),
                    ]
                ).column("host")
            }
        )

    nodes_ds = (
        ded.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return _ranks_dataset({}, scale)
    if n_nodes > cap:
        raise NotImplementedError(
            f"pagerank broadcast regime capped at {cap} nodes (measured "
            f"{n_nodes}); the distributed plan is a per-iteration "
            "copartitioned join of edges with the rank Dataset on "
            f"{src_col} (2 exchanges/iteration) — wire it when a corpus "
            "crosses the cap"
        )
    nodes = sorted(nodes_ds.to_pandas()["host"])

    out_tbl = ded.groupby(src_col).aggregate(Count(alias_name="outdeg")).to_pandas()
    outdeg = dict(zip(out_tbl[src_col], out_tbl["outdeg"].astype(int)))

    def attach(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).to_pylist()
        od = np.fromiter((outdeg[s] for s in src), dtype=np.int64, count=len(src))
        return batch.append_column("outdeg", pa.array(od))

    edges_w = ded.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    ranks = {h: scale // n_nodes for h in nodes}
    for _t in range(iters):
        rank_ref = ray.put(ranks)
        sums = (
            _contrib_partials(edges_w, rank_ref, src_col, dst_col)
            .groupby(dst_col)
            .aggregate(Sum("pc_", alias_name="s"))
            .to_pandas()
        )
        contrib = dict(zip(sums[dst_col], sums["s"].astype(int)))
        ranks = {
            h: base + (damping_num * contrib.get(h, 0)) // damping_den
            for h in nodes
        }
    return _ranks_dataset(ranks, scale)


def _ranks_dataset(ranks: dict, scale: int):
    import ray.data

    hosts = sorted(ranks)
    fp = np.array([ranks[h] for h in hosts], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "rank_fp": pa.array(fp),
                "rank": pa.array(fp.astype(np.float64) / float(scale)),
            }
        )
    )


def canonical_undirected(edges, *, src_col: str = "src_host", dst_col: str = "dst_host"):
    """Distinct canonical (u < v) undirected pairs; self-loops dropped.
    One (u, v)-keyed exchange."""
    from ray.data.aggregate import Count

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = batch.column(src_col)
        b = batch.column(dst_col)
        u = pc.min_element_wise(a, b)
        v = pc.max_element_wise(a, b)
        t = pa.table({"u": u, "v": v})
        return t.filter(pc.not_equal(t.column("u"), t.column("v")))

    return (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )


_SEP = "\x1f"


def triangle_stats(und, *, broadcast_cap: int | None = None):
    """Global triangle count + wedge count + clustering coefficient over
    distinct undirected (u < v) pairs.

    Orientation: each edge points from lower to higher in the (degree, id)
    total order, so every out-neighborhood is O(sqrt(m)) and each triangle
    is counted exactly once. Wedges (b, c) are emitted per oriented source
    from its sorted out-neighbor list and closed by ONE copartitioned join
    against the oriented edge-key set. Returns one row
    (n_triangles, n_wedges, global_cc) where global_cc = 3T / W is one
    exact-int IEEE divide (NULL when W = 0).
    """
    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    und = und.materialize()

    # Undirected degree per host (node-sized).
    deg = degree_profile(
        und.map_batches(
            lambda b: b.append_column("n", pa.array(np.ones(len(b), dtype=np.int64))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        src_col="u",
        dst_col="v",
        n_col="n",
    ).to_pandas()
    deg["deg"] = deg["out_deg"] + deg["in_deg"]
    deg_map = dict(zip(deg["host"], deg["deg"].astype(int)))
    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    if len(deg_map) > cap:
        raise NotImplementedError(
            f"triangle_stats degree-broadcast regime capped at {cap} nodes "
            f"(measured {len(deg_map)}); the distributed plan joins degrees "
            "onto edges by key instead of broadcasting"
        )
    n_wedges = int(sum(d * (d - 1) // 2 for d in deg_map.values()))
    deg_ref = ray.put(deg_map)

    def orient(batch: pa.Table) -> pa.Table:
        dm = ray.get(deg_ref)
        u = batch.column("u").to_pylist()
        v = batch.column("v").to_pylist()
        a_out, b_out = [], []
        for x, y in zip(u, v):
            if (dm[x], x) <= (dm[y], y):
                a_out.append(x)
                b_out.append(y)
            else:
                a_out.append(y)
                b_out.append(x)
        return pa.table(
            {"a": pa.array(a_out, pa.string()), "b": pa.array(b_out, pa.string())}
        )

    oriented = und.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_edges = oriented.count()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(deg_ref)
        outs = sorted(df["b"], key=lambda h: (dm[h], h))
        keys = [
            outs[i] + _SEP + outs[j]
            for i in range(len(outs))
            for j in range(i + 1, len(outs))
        ]
        return pd.DataFrame({"pair_key": keys})

    wedge_ds = oriented.groupby("a").map_groups(wedges)

    def edge_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "pair_key": pc.binary_join_element_wise(
                    batch.column("a"), batch.column("b"), _SEP
                )
            }
        )

    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow", zero_copy_batch=True)

    # Ray 2.49's hash join rejects the schema-less empty blocks that
    # map_groups emits for wedge-free sources — compact both sides (the
    # documented dedup._compact_nonempty workaround; bounded by wedge
    # count, the operator's inherent m^{3/2} budget) and short-circuit the
    # wedge-free graph.
    from docler_ray.stages.dedup import _compact_nonempty
    from docler_ray.stages.joins import copartition_hash_join

    wedge_c, n_w = _compact_nonempty(wedge_ds)
    if n_w == 0:
        n_triangles = 0
    else:
        ekeys_c, _n_e = _compact_nonempty(
            ekeys.map_batches(
                lambda b: b.append_column(
                    "_hit", pa.array(np.ones(len(b), dtype=np.int64))
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        closed = copartition_hash_join(
            wedge_c, ekeys_c, on="pair_key", size_hint=n_edges
        )
        n_triangles = int(closed.count())
    cc = None if n_wedges == 0 else float(3 * n_triangles) / float(n_wedges)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([n_triangles], pa.int64()),
                "n_wedges": pa.array([n_wedges], pa.int64()),
                "global_cc": pa.array([cc], pa.float64()),
            }
        )
    )


HITS_SCALE = 10**9


def hits(
    edges,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    iters: int = 3,
    scale: int = HITS_SCALE,
    broadcast_cap: int | None = None,
):
    """Integer fixed-point HITS (Kleinberg, JACM'99) over DISTINCT directed
    edges: hubs/authorities with max-normalization instead of the L2 norm —

        a_t(v) = (SUM_{u->v} h_{t-1}(u)) * scale // max_raw_a
        h_t(u) = (SUM_{u->v} a_t(v))     * scale // max_raw_h

    Every sum is order-independent int64 (per-edge terms <= scale, so
    partials stay < edges * scale); the normalizing multiply runs
    DRIVER-SIDE on the node-sized dict in arbitrary-precision Python ints
    (raw * scale would overflow int64 — the SQL twin widens through
    HUGEINT for the same step), so the result is bit-identical to the
    unrolled SQL regardless of combine order. Returns (host, hub_fp,
    auth_fp, hub, auth) with the floats being single IEEE divides by
    ``scale``.

    Same MEASURED regimes as :func:`pagerank`: small distinct-edge sets
    iterate on the driver; larger graphs under ``broadcast_cap`` nodes
    broadcast the score dict per half-step with one groupby exchange per
    direction; above the cap raises with the documented distributed-join
    plan."""
    import ray
    from ray.data.aggregate import Count, Sum

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    ded = edges.groupby([src_col, dst_col]).aggregate(Count(alias_name="_m"))
    ded = ded.drop_columns(["_m"]).materialize()

    def _norm(raw: dict) -> dict:
        mx = max(raw.values(), default=0)
        if mx == 0:
            return dict.fromkeys(raw, 0)
        return {h: (int(v) * scale) // mx for h, v in raw.items()}

    def _out(nodes, h, a):
        hf = np.array([h[x] for x in nodes], dtype=np.int64)
        af = np.array([a[x] for x in nodes], dtype=np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array(nodes, pa.string()),
                    "hub_fp": pa.array(hf),
                    "auth_fp": pa.array(af),
                    "hub": pa.array(hf.astype(np.float64) / scale),
                    "auth": pa.array(af.astype(np.float64) / scale),
                }
            )
        )

    n_edges = ded.count()
    if n_edges == 0:  # empty groupby output loses the key schema
        return _out([], {}, {})
    if n_edges <= min(cap, _PAGERANK_LOCAL_EDGE_CAP):
        edf = ded.to_pandas()
        e_src = edf[src_col].tolist()
        e_dst = edf[dst_col].tolist()
        nodes = sorted(set(e_src) | set(e_dst))
        if not nodes:
            return _out([], {}, {})
        h = dict.fromkeys(nodes, scale)
        a = dict.fromkeys(nodes, 0)
        for _t in range(iters):
            raw = dict.fromkeys(nodes, 0)
            for u, v in zip(e_src, e_dst):
                raw[v] += h[u]
            a = _norm(raw)
            raw = dict.fromkeys(nodes, 0)
            for u, v in zip(e_src, e_dst):
                raw[u] += a[v]
            h = _norm(raw)
        return _out(nodes, h, a)

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.concat_arrays(
                    [
                        batch.column(src_col).combine_chunks(),
                        batch.column(dst_col).combine_chunks(),
                    ]
                    if batch.num_rows
                    else [pa.array([], pa.string())]
                )
            }
        )

    nodes_ds = (
        ded.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return _out([], {}, {})
    if n_nodes > cap:
        raise NotImplementedError(
            f"hits broadcast regime capped at {cap} nodes (measured "
            f"{n_nodes}); the distributed plan is a per-half-step "
            f"copartitioned join of edges with the score Dataset "
            "(2 exchanges per half-step) — wire it when a corpus crosses "
            "the cap"
        )
    nodes = sorted(nodes_ds.to_pandas()["host"])

    def _half(score_ref, from_col: str, to_col: str) -> dict:
        def partial(batch: pa.Table) -> pa.Table:
            sc: dict = ray.get(score_ref)
            src = batch.column(from_col).to_pylist()
            r = np.fromiter(
                (sc.get(s, 0) for s in src), dtype=np.int64, count=len(src)
            )
            t = pa.table({to_col: batch.column(to_col), "pc_": pa.array(r)})
            g = t.group_by(to_col).aggregate([("pc_", "sum")])
            return g.rename_columns([to_col, "pc_"])

        sums = (
            ded.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(to_col)
            .aggregate(Sum("pc_", alias_name="s"))
            .to_pandas()
        )
        raw = dict.fromkeys(nodes, 0)
        raw.update(zip(sums[to_col], (int(x) for x in sums["s"])))
        return raw

    h = dict.fromkeys(nodes, scale)
    a = dict.fromkeys(nodes, 0)
    for _t in range(iters):
        a = _norm(_half(ray.put(h), src_col, dst_col))
        h = _norm(_half(ray.put(a), dst_col, src_col))
    return _out(nodes, h, a)


def k_core(und, k: int, *, broadcast_cap: int | None = None):
    """The k-core of the undirected distinct graph (Seidman, Social
    Networks'83): iteratively peel nodes of degree < k until fixpoint;
    returns (host, core_deg) for the survivors with their WITHIN-CORE
    degree. Input is :func:`canonical_undirected` output (u < v pairs).

    Regimes mirror :func:`pagerank`: small pair sets peel on the driver
    (numpy bincount per round); graphs under ``broadcast_cap`` nodes
    broadcast the alive-set per round and pay one endpoint-keyed count
    exchange per peel (rounds <= peels, each removes >= 1 node, so a
    skew-free corpus converges in tens of rounds — the documented
    distributed plan for beyond-cap graphs is the same loop with the
    alive set as a Dataset semi join instead of a broadcast dict).
    """
    import ray
    from ray.data.aggregate import Count

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    ded = und.materialize()
    n_edges = ded.count()

    def _out(hosts, degs) -> "ray.data.Dataset":
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array(list(hosts), pa.string()),
                    "core_deg": pa.array(np.asarray(degs, dtype=np.int64)),
                }
            )
        )

    if n_edges == 0:
        return _out([], [])

    if n_edges <= min(cap, _PAGERANK_LOCAL_EDGE_CAP):
        edf = ded.to_pandas()
        nodes = sorted(set(edf["u"]) | set(edf["v"]))
        idx = {h: i for i, h in enumerate(nodes)}
        eu = np.fromiter((idx[x] for x in edf["u"]), dtype=np.int64)
        ev = np.fromiter((idx[x] for x in edf["v"]), dtype=np.int64)
        alive = np.ones(len(nodes), dtype=bool)
        while True:
            keep = alive[eu] & alive[ev]
            deg = np.bincount(eu[keep], minlength=len(nodes)) + np.bincount(
                ev[keep], minlength=len(nodes)
            )
            nxt = alive & (deg >= k)
            if (nxt == alive).all():
                break
            alive = nxt
        sel = np.nonzero(alive)[0]
        return _out([nodes[i] for i in sel], deg[sel])

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.concat_arrays(
                    [
                        batch.column("u").combine_chunks(),
                        batch.column("v").combine_chunks(),
                    ]
                    if batch.num_rows
                    else [pa.array([], pa.string())]
                )
            }
        )

    nodes_ds = (
        ded.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_nodes = nodes_ds.count()
    if n_nodes > cap:
        raise NotImplementedError(
            f"k_core broadcast regime capped at {cap} nodes (measured "
            f"{n_nodes}); the distributed plan keeps the alive set as a "
            "Dataset and semi-joins it against both endpoints per round"
        )
    alive: set = set(nodes_ds.to_pandas()["host"])

    while True:
        # broadcast the alive set as an Arrow array: the filter below is
        # one vectorized is_in per endpoint, zero Python per row
        alive_ref = ray.put(pa.array(sorted(alive), pa.string()))

        def deg_partial(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            a = _get_broadcast_set(alive_ref)
            keep = pc.and_(
                pc.is_in(batch.column("u"), value_set=a),
                pc.is_in(batch.column("v"), value_set=a),
            )
            f = batch.filter(keep)
            t = pa.table(
                {
                    "host": pa.concat_arrays(
                        [
                            f.column("u").combine_chunks(),
                            f.column("v").combine_chunks(),
                        ]
                        if f.num_rows
                        else [pa.array([], pa.string())]
                    )
                }
            )
            g = t.group_by("host").aggregate([([], "count_all")])
            return g.rename_columns(["host", "pd_"])

        from ray.data.aggregate import Sum

        degs = (
            ded.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("host")
            .aggregate(Sum("pd_", alias_name="deg"))
            .to_pandas()
        )
        deg_map = dict(zip(degs["host"], (int(x) for x in degs["deg"])))
        nxt = {h for h in alive if deg_map.get(h, 0) >= k}
        if nxt == alive:
            hosts = sorted(alive)
            return _out(hosts, [deg_map.get(h, 0) for h in hosts])
        alive = nxt
        if not alive:
            return _out([], [])


def _get_broadcast_set(ref):
    """Per-task fetch of a broadcast alive-set (plasma dedups per node)."""
    import ray

    return ray.get(ref)


def resolve_redirects(
    edges,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    broadcast_cap: int | None = None,
):
    """Resolve every redirect source to its FINAL target over the
    functional redirect graph (each src has one outgoing edge after the
    distinct pass; later duplicates of a src are an input error and raise).
    Returns one row per src: (src, final, hops, cyclic) — final/hops NULL
    for sources whose chain enters a redirect LOOP (final is undefined;
    a fetcher treats them as dead).

    Regimes mirror :func:`pagerank`: the distinct edge map is
    node-cardinality state, so under the broadcast cap the resolution runs
    as ONE colored walk over the map (iterative three-color cycle
    detection, O(nodes) total — every node's answer memoizes); above the
    cap the documented plan is pointer-doubling self-joins (log2(longest
    chain) copartitioned joins, no driver state) and this raises naming
    it."""
    import ray
    from ray.data.aggregate import Count

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    ded = (
        edges.groupby([src_col, dst_col])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_edges = ded.count()

    def _out(srcs, finals, hops, cyc):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(srcs, pa.string()),
                    "final": pa.array(finals, pa.string()),
                    "hops": pa.array(hops, pa.int64()),
                    "cyclic": pa.array(cyc, pa.bool_()),
                }
            )
        )

    if n_edges == 0:
        return _out([], [], [], [])
    if n_edges > cap:
        raise NotImplementedError(
            f"resolve_redirects broadcast regime capped at {cap} distinct "
            f"edges (measured {n_edges}); beyond it run pointer-doubling "
            "self-joins: log2(longest chain) rounds of f := f∘f as "
            "copartitioned joins on the pointer column"
        )
    edf = ded.to_pandas()
    nxt: dict = {}
    for s, d in zip(edf[src_col], edf[dst_col]):
        if s in nxt and nxt[s] != d:
            raise ValueError(
                f"redirect map is not functional: {s!r} has two targets"
            )
        nxt[s] = d
    # three-color walk: 0/absent=white, 1=on current path, 2=resolved
    final: dict = {}
    hops: dict = {}
    cyclic: dict = {}
    color: dict = {}
    for start in nxt:
        if color.get(start) == 2:
            continue
        path = []
        node = start
        while True:
            if node not in nxt:  # terminal
                base_final, base_hops, base_cyc = node, 0, False
                break
            c = color.get(node)
            if c == 2:  # memoized
                base_final = final[node]
                base_hops = hops[node]
                base_cyc = cyclic[node]
                break
            if c == 1:  # closed a loop within this walk
                i = path.index(node)
                for p in path[i:]:
                    final[p], hops[p], cyclic[p], color[p] = None, None, True, 2
                path = path[:i]
                base_final, base_hops, base_cyc = None, None, True
                break
            color[node] = 1
            path.append(node)
            node = nxt[node]
        for j, p in enumerate(reversed(path), start=1):
            cyclic[p] = base_cyc
            final[p] = base_final
            hops[p] = None if base_cyc else base_hops + j
            color[p] = 2
    srcs = sorted(nxt)
    return _out(
        srcs,
        [final[s] for s in srcs],
        [hops[s] for s in srcs],
        [cyclic[s] for s in srcs],
    )


def random_walks(
    edges,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    walks_per_node: int = 2,
    walk_len: int = 8,
    broadcast_cap: int | None = None,
):
    """DeepWalk-style walk corpus (Perozzi et al., KDD'14) over the
    DISTINCT directed graph, DERANDOMIZED: at (node, step, walk) the next
    hop is the SORTED out-neighbor list indexed by a 52-bit md5 of
    "{node}:{walk}:{step}" — deterministic, so the walk corpus is
    reproducible across runs AND replayed exactly by a recursive-CTE SQL
    twin (a seeded RNG could not be). Walks stop early at sinks (no
    out-edges). Returns (walk_id, step, node) with walk_id =
    node-rank * walks_per_node + walk-index over the sorted start nodes.

    Regimes mirror :func:`pagerank`: the adjacency is node-cardinality
    state; under the cap it broadcasts once and every step advances ALL
    walks in one vectorized pass (steps, not walks, drive the loop);
    above the cap the documented plan is one copartitioned join per step
    against the edge Dataset."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    ded = (
        edges.groupby([src_col, dst_col])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    n_edges = ded.count()

    def _out(walk_ids, steps, nodes):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "walk_id": pa.array(walk_ids, pa.int64()),
                    "step": pa.array(steps, pa.int64()),
                    "node": pa.array(nodes, pa.string()),
                }
            )
        )

    if n_edges == 0:
        return _out([], [], [])
    if n_edges > cap:
        raise NotImplementedError(
            f"random_walks broadcast regime capped at {cap} distinct edges "
            f"(measured {n_edges}); beyond it advance all walks with one "
            "copartitioned join per step (frontier ⋈ edges on the current "
            "node, md5 pick inside the join task)"
        )
    edf = ded.to_pandas()
    adj: dict = {}
    for s, d in zip(edf[src_col], edf[dst_col]):
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    starts = sorted(set(edf[src_col]) | set(edf[dst_col]))

    walk_ids: list[int] = []
    steps: list[int] = []
    nodes: list[str] = []
    # frontier of live walks; each step advances all of them at once
    live = [
        (rank * walks_per_node + w, start)
        for rank, start in enumerate(starts)
        for w in range(walks_per_node)
    ]
    for wid, node in live:
        walk_ids.append(wid)
        steps.append(0)
        nodes.append(node)
    for step in range(1, walk_len):
        nxt = []
        for wid, node in live:
            ns = adj.get(node)
            if not ns:
                continue  # sink: walk ends early
            pick = (
                int(
                    hashlib.md5(
                        f"{node}:{wid}:{step}".encode()
                    ).hexdigest()[:13],
                    16,
                )
                % len(ns)
            )
            nxt.append((wid, ns[pick]))
        for wid, node in nxt:
            walk_ids.append(wid)
            steps.append(step)
            nodes.append(node)
        live = nxt
        if not live:
            break
    return _out(walk_ids, steps, nodes)


def skipgram_pairs(
    walks,
    *,
    window: int = 2,
    id_col: str = "walk_id",
    step_col: str = "step",
    node_col: str = "node",
):
    """(center, context, n) skip-gram training pairs over a walk corpus
    (the word2vec/DeepWalk consumer): every ordered pair within ±window
    steps of the same walk. In-bucket emission is fully vectorized —
    sort by (walk, step), then each offset in ±window is one shifted-array
    compare (same-walk AND step-delta mask), no per-row Python. One
    crc-coarse walk exchange for co-location, one (center, context)
    count exchange."""
    from ray.data.aggregate import Sum

    def add_coarse(batch: pa.Table) -> pa.Table:
        keys = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        coarse = ((keys * np.uint64(1000003)) % np.uint64(256)).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse))

    def emit(df):
        import pandas as pd

        if df.empty:
            return pd.DataFrame(
                {
                    "center": pd.Series([], dtype="object"),
                    "context": pd.Series([], dtype="object"),
                    "pn": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([id_col, step_col], kind="mergesort")
        wid = df[id_col].to_numpy()
        stp = df[step_col].to_numpy()
        nod = df[node_col].to_numpy()
        centers, contexts = [], []
        for off in range(1, window + 1):
            ok = (wid[off:] == wid[:-off]) & (stp[off:] - stp[:-off] == off)
            centers.append(nod[:-off][ok])
            contexts.append(nod[off:][ok])
            centers.append(nod[off:][ok])  # symmetric pair
            contexts.append(nod[:-off][ok])
        c = np.concatenate(centers) if centers else np.array([], dtype=object)
        x = np.concatenate(contexts) if contexts else np.array([], dtype=object)
        out = pd.DataFrame({"center": c, "context": x})
        g = out.groupby(["center", "context"], sort=False).size().reset_index()
        g.columns = ["center", "context", "pn"]
        return g

    return (
        walks.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit, batch_format="pandas")
        .groupby(["center", "context"])
        .aggregate(Sum("pn", alias_name="n"))
    )


def mutual_link_pairs(edges, *, src_col: str = "src_host", dst_col: str = "dst_host"):
    """Reciprocal host pairs — the classic link-exchange/spam-farm signal
    (mutual links are ~3x more likely between colluding hosts; TrustRank-
    era heuristic): canonical (u < v) pairs where BOTH directions exist,
    with each direction's multi-edge count. Plan: the map side canonizes
    AND splits each edge's count into forward/reverse partial columns, so
    ONE (u, v)-keyed exchange carries both directions; a pair survives
    iff both sums are positive. Returns (u, v, n_uv, n_vu)."""
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = batch.column(src_col)
        d = batch.column(dst_col)
        t = pa.table({"s": s, "d": d}).filter(pc.not_equal(s, d))
        u = pc.min_element_wise(t.column("s"), t.column("d"))
        v = pc.max_element_wise(t.column("s"), t.column("d"))
        fwd = pc.cast(pc.equal(t.column("s"), u), pa.int64())  # 1: u -> v
        g = (
            pa.table(
                {
                    "u": u,
                    "v": v,
                    "pf": fwd,
                    "pr": pc.subtract(1, fwd),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("pf", "sum"), ("pr", "sum")])
        )
        return g.rename_columns(["u", "v", "pf", "pr"])

    both = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Sum("pf", alias_name="n_uv"), Sum("pr", alias_name="n_vu"))
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.greater(batch.column("n_uv"), 0), pc.greater(batch.column("n_vu"), 0)
        )
        return batch.filter(ok)

    return both.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def glove_cooccurrence(
    walks,
    *,
    window: int = 2,
    id_col: str = "walk_id",
    step_col: str = "step",
    node_col: str = "node",
):
    """GloVe-style distance-weighted co-occurrence (Pennington et al.,
    EMNLP'14: X_ij accumulates 1/d per co-occurrence at distance d).
    Weights are carried EXACTLY as integers scaled by lcm(1..window) —
    for window 2 that is 2/d in {2, 1} — so the table hash-matches a SQL
    rebuild with no float accumulation order to pin. Same one-exchange
    shifted-array plan as :func:`skipgram_pairs`; returns (center,
    context, x2 = 2*X_ij)."""
    import math

    from ray.data.aggregate import Sum

    scale = math.lcm(*range(1, window + 1))

    def add_coarse(batch: pa.Table) -> pa.Table:
        keys = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        coarse = ((keys * np.uint64(1000003)) % np.uint64(256)).astype(np.int64)
        return batch.append_column("coarse", pa.array(coarse))

    def emit(df):
        import pandas as pd

        if df.empty:
            return pd.DataFrame(
                {
                    "center": pd.Series([], dtype="object"),
                    "context": pd.Series([], dtype="object"),
                    "pw": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values([id_col, step_col], kind="mergesort")
        wid = df[id_col].to_numpy()
        stp = df[step_col].to_numpy()
        nod = df[node_col].to_numpy()
        centers, contexts, weights = [], [], []
        for off in range(1, window + 1):
            ok = (wid[off:] == wid[:-off]) & (stp[off:] - stp[:-off] == off)
            w = scale // off
            for a, b in ((nod[:-off][ok], nod[off:][ok]),
                         (nod[off:][ok], nod[:-off][ok])):
                centers.append(a)
                contexts.append(b)
                weights.append(np.full(len(a), w, dtype=np.int64))
        c = np.concatenate(centers)
        x = np.concatenate(contexts)
        w = np.concatenate(weights)
        out = pd.DataFrame({"center": c, "context": x, "pw": w})
        g = out.groupby(["center", "context"], sort=False)["pw"].sum().reset_index()
        return g

    return (
        walks.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit, batch_format="pandas")
        .groupby(["center", "context"])
        .aggregate(Sum("pw", alias_name="x2"))
    )


def common_neighbor_scores(
    und,
    *,
    degree_cap: int = 4096,
    broadcast_cap: int | None = None,
):
    """Common-neighbor link-prediction scores (Liben-Nowell & Kleinberg,
    CIKM'03 — CN is the baseline every link predictor is measured
    against): for every node pair sharing >= 1 neighbor, the exact count
    of common neighbors, with an ``is_edge`` flag so consumers can split
    prediction candidates (non-edges) from triangle support (edges).
    Input is :func:`canonical_undirected` output.

    Plan: symmetrize to (center, neighbor) rows; ONE crc-coarse center
    exchange; within each bucket the per-center all-pairs emit is the
    shifted-array trick (sorted neighbors => u < v structural), centers
    above ``degree_cap`` dropped as hubs (a celebrity's neighbor pairs
    are quadratic noise — documented, like the LSH posting cap); one
    (u, v) count exchange; the edge flag is a broadcast membership test
    under the measured cap."""
    import ray
    from ray.data.aggregate import Count

    from docler_ray.stages.windows import _make_add_coarse

    cap = _PAGERANK_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    ded = und.materialize()
    n_edges = ded.count()

    def _empty():
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([], pa.string()),
                    "v": pa.array([], pa.string()),
                    "cn": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.bool_()),
                }
            )
        )

    if n_edges == 0:
        return _empty()
    if n_edges > cap:
        raise NotImplementedError(
            f"common_neighbor edge-flag broadcast capped at {cap} edges "
            f"(measured {n_edges}); beyond it flag via the exact bloom "
            "anti/semi join against the edge set"
        )
    edf = ded.to_pandas()
    edge_set = set(zip(edf["u"], edf["v"]))
    edges_ref = ray.put(edge_set)

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "center": pa.concat_arrays(
                    [
                        batch.column("u").combine_chunks(),
                        batch.column("v").combine_chunks(),
                    ]
                ),
                "nb": pa.concat_arrays(
                    [
                        batch.column("v").combine_chunks(),
                        batch.column("u").combine_chunks(),
                    ]
                ),
            }
        )

    sym = ded.map_batches(symmetrize, batch_format="pyarrow", zero_copy_batch=True)
    add_coarse = _make_add_coarse("center", 256)

    def emit(df):
        import pandas as pd

        if df.empty:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype="object"),
                    "v": pd.Series([], dtype="object"),
                }
            )
        df = df.sort_values(["center", "nb"], kind="mergesort")
        ctr = df["center"].to_numpy()
        nb = df["nb"].to_numpy()
        # drop hub centers before pairing
        uniq, inv, counts = np.unique(ctr, return_inverse=True, return_counts=True)
        keep = counts[inv] <= degree_cap
        ctr, nb = ctr[keep], nb[keep]
        if len(ctr) < 2:
            return pd.DataFrame(
                {"u": pd.Series([], dtype="object"), "v": pd.Series([], dtype="object")}
            )
        max_deg = int(np.bincount(np.unique(ctr, return_inverse=True)[1]).max())
        us, vs = [], []
        for d in range(1, max_deg):
            m = ctr[d:] == ctr[:-d]
            if not m.any():
                break
            us.append(nb[:-d][m])
            vs.append(nb[d:][m])
        if not us:
            return pd.DataFrame(
                {"u": pd.Series([], dtype="object"), "v": pd.Series([], dtype="object")}
            )
        return pd.DataFrame({"u": np.concatenate(us), "v": np.concatenate(vs)})

    counted = (
        sym.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(emit, batch_format="pandas")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="cn"))
    )

    def flag(batch: pa.Table) -> pa.Table:
        es = ray.get(edges_ref)
        us = batch.column("u").to_pylist()
        vs = batch.column("v").to_pylist()
        return batch.append_column(
            "is_edge", pa.array([(a, b) in es for a, b in zip(us, vs)], pa.bool_())
        )

    return counted.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)
