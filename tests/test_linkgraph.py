"""Link-graph kernels: RFC 3986 href resolution, anchor extraction from real
synth pages, integer fixed-point PageRank vs a pure-Python loop, triangle
census vs brute force, and regime/edge-case guards."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest

from docler_ray.stages.linkgraph import (
    PAGERANK_SCALE,
    canonical_undirected,
    degree_profile,
    extract_links,
    host_edge_counts,
    pagerank,
    resolve_href,
    triangle_stats,
    url_host,
)


@pytest.mark.parametrize(
    "base,href,want",
    [
        ("https://a.example/x/y", "/p/q", "https://a.example/p/q"),
        ("https://a.example/x/y", "z", "https://a.example/x/z"),
        ("https://a.example/x/y/", "../w", "https://a.example/x/w"),
        ("https://a.example/x/y", "./z", "https://a.example/x/z"),
        ("https://a.example/x", "https://b.example/c#frag", "https://b.example/c"),
        ("https://a.example/x", "//c.example/d", "https://c.example/d"),
        ("http://a.example/x", "//c.example/d", "http://c.example/d"),
        ("https://a.example/x", "?q=1", "https://a.example/x?q=1"),
        ("https://a.example/x", "javascript:void(0)", None),
        ("https://a.example/x", "MAILTO:x@y", None),
        ("https://a.example/x", "data:text/plain,hi", None),
        ("https://a.example/x", "tel:+15551234", None),
        ("https://a.example/x", "#top", None),
        ("https://a.example/x", "", None),
        ("https://a.example/x", "   ", None),
        ("https://a.example/x", "ftp://z/w", None),
    ],
)
def test_resolve_href(base, href, want):
    assert resolve_href(base, href) == want


def test_url_host():
    assert url_host("https://A.Example:8080/p?q#f") == "a.example:8080"
    assert url_host("http://h.example") == "h.example"
    assert url_host("not-a-url") == ""


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src_host": pa.array([f"h{a}" for a, _ in pairs], pa.string()),
                "dst_host": pa.array([f"h{b}" for _, b in pairs], pa.string()),
            }
        )
    )


def _rand_digraph(seed, n_nodes=14, n_draws=80):
    rng = np.random.default_rng(seed)
    return sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n_nodes, (n_draws, 2)) if a != b}
    )


def _py_pagerank(edges, iters=5, scale=PAGERANK_SCALE):
    nodes = sorted({x for e in edges for x in e})
    od: dict[int, int] = {}
    for a, _b in edges:
        od[a] = od.get(a, 0) + 1
    n = len(nodes)
    base = (15 * scale) // (100 * n)
    r = {h: scale // n for h in nodes}
    for _ in range(iters):
        s = {h: 0 for h in nodes}
        for a, b in edges:
            s[b] += r[a] // od[a]
        r = {h: base + (85 * s[h]) // 100 for h in nodes}
    return {f"h{h}": v for h, v in r.items()}


def test_pagerank_matches_pure_python(ray_session):
    edges = _rand_digraph(3)
    got = (
        pagerank(_edges_ds(edges), iters=5)
        .to_pandas()
        .set_index("host")["rank_fp"]
        .to_dict()
    )
    assert got == _py_pagerank(edges)


def test_pagerank_duplicate_edges_and_dangling(ray_session):
    # duplicates must collapse (distinct-edge semantics); h9 is dangling
    # (in-links only) and leaks its mass exactly like the SQL twin
    edges = [(0, 1), (0, 1), (1, 2), (2, 0), (2, 9), (2, 9)]
    got = (
        pagerank(_edges_ds(edges), iters=4)
        .to_pandas()
        .set_index("host")["rank_fp"]
        .to_dict()
    )
    assert got == _py_pagerank(sorted(set(edges)), iters=4)
    # total mass strictly below scale: the dangling leak
    assert sum(got.values()) < PAGERANK_SCALE


def test_pagerank_rank_is_single_divide(ray_session):
    edges = _rand_digraph(7)
    df = pagerank(_edges_ds(edges), iters=2).to_pandas()
    assert (
        df["rank"].to_numpy()
        == df["rank_fp"].to_numpy().astype(np.float64) / float(PAGERANK_SCALE)
    ).all()


def test_pagerank_over_cap_raises(ray_session, monkeypatch):
    import docler_ray.stages.linkgraph as lg

    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    with pytest.raises(NotImplementedError, match="broadcast regime capped"):
        pagerank(_edges_ds([(0, 1), (1, 2)]), iters=1, broadcast_cap=2)


def test_pagerank_distributed_regime_matches_local(ray_session, monkeypatch):
    """Force the broadcast-iterate regime (local edge cap 0) and pin it to
    the driver-side regime bit-for-bit."""
    import docler_ray.stages.linkgraph as lg

    edges = _rand_digraph(5)
    local = (
        pagerank(_edges_ds(edges), iters=3)
        .to_pandas()
        .set_index("host")["rank_fp"]
        .to_dict()
    )
    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    dist = (
        pagerank(_edges_ds(edges), iters=3)
        .to_pandas()
        .set_index("host")["rank_fp"]
        .to_dict()
    )
    assert dist == local == _py_pagerank(edges, iters=3)


def _py_hits(edges, iters=3, scale=None):
    from docler_ray.stages.linkgraph import HITS_SCALE

    scale = HITS_SCALE if scale is None else scale
    nodes = sorted({x for e in edges for x in e})

    def norm(raw):
        mx = max(raw.values(), default=0)
        if mx == 0:
            return dict.fromkeys(raw, 0)
        return {h: (v * scale) // mx for h, v in raw.items()}

    h = dict.fromkeys(nodes, scale)
    a = dict.fromkeys(nodes, 0)
    for _ in range(iters):
        raw = dict.fromkeys(nodes, 0)
        for u, v in edges:
            raw[v] += h[u]
        a = norm(raw)
        raw = dict.fromkeys(nodes, 0)
        for u, v in edges:
            raw[u] += a[v]
        h = norm(raw)
    return (
        {f"h{x}": h[x] for x in nodes},
        {f"h{x}": a[x] for x in nodes},
    )


def _hits_dicts(df):
    idx = df.set_index("host")
    return idx["hub_fp"].to_dict(), idx["auth_fp"].to_dict()


def test_hits_matches_pure_python(ray_session):
    from docler_ray.stages.linkgraph import hits

    edges = _rand_digraph(13)
    hub, auth = _hits_dicts(hits(_edges_ds(edges), iters=3).to_pandas())
    want_h, want_a = _py_hits(edges, iters=3)
    assert hub == want_h
    assert auth == want_a


def test_hits_duplicate_edges_collapse(ray_session):
    from docler_ray.stages.linkgraph import hits

    edges = [(0, 1), (0, 1), (1, 2), (2, 0), (2, 9), (2, 9)]
    hub, auth = _hits_dicts(hits(_edges_ds(edges), iters=3).to_pandas())
    want_h, want_a = _py_hits(sorted(set(edges)), iters=3)
    assert hub == want_h
    assert auth == want_a
    # max-normalization: the top hub and top authority sit exactly at scale
    from docler_ray.stages.linkgraph import HITS_SCALE

    assert max(hub.values()) == HITS_SCALE
    assert max(auth.values()) == HITS_SCALE


def test_hits_distributed_regime_matches_local(ray_session, monkeypatch):
    """Force the broadcast half-step regime (local edge cap 0) and pin it
    to the driver-side regime bit-for-bit."""
    import docler_ray.stages.linkgraph as lg

    edges = _rand_digraph(17)
    local = _hits_dicts(lg.hits(_edges_ds(edges), iters=2).to_pandas())
    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    dist = _hits_dicts(lg.hits(_edges_ds(edges), iters=2).to_pandas())
    assert dist == local == _py_hits(edges, iters=2)


def test_hits_float_is_single_divide(ray_session):
    from docler_ray.stages.linkgraph import HITS_SCALE, hits

    edges = _rand_digraph(19)
    df = hits(_edges_ds(edges), iters=2).to_pandas()
    assert (
        df["hub"].to_numpy()
        == df["hub_fp"].to_numpy().astype(np.float64) / float(HITS_SCALE)
    ).all()
    assert (
        df["auth"].to_numpy()
        == df["auth_fp"].to_numpy().astype(np.float64) / float(HITS_SCALE)
    ).all()


def test_hits_over_cap_raises(ray_session, monkeypatch):
    import docler_ray.stages.linkgraph as lg

    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    with pytest.raises(NotImplementedError, match="broadcast regime capped"):
        lg.hits(_edges_ds([(0, 1), (1, 2)]), iters=1, broadcast_cap=2)


def test_hits_empty_graph(ray_session):
    from docler_ray.stages.linkgraph import hits

    got = hits(_edges_ds([]), iters=3)
    # typed 0-row anchor: schema survives even though to_pandas() of an
    # empty Dataset drops columns (Ray 2.49 quirk)
    assert got.count() == 0
    assert got.schema().names == ["host", "hub_fp", "auth_fp", "hub", "auth"]


def test_triangles_match_brute_force(ray_session):
    edges = _rand_digraph(11, n_nodes=12, n_draws=70)
    und = canonical_undirected(_edges_ds(edges))
    got = triangle_stats(und).to_pandas()
    pairs = {
        (min(a, b), max(a, b)) for a, b in edges
    }
    nodes = sorted({x for p in pairs for x in p})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in pairs and (b, c) in pairs and (a, c) in pairs
    )
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert int(got["n_triangles"][0]) == tri
    assert int(got["n_wedges"][0]) == wedges
    assert got["global_cc"][0] == float(3 * tri) / float(wedges)


def test_triangles_empty_and_triangle_free(ray_session):
    # a star graph has wedges but zero triangles
    star = [(0, k) for k in range(1, 6)]
    got = triangle_stats(canonical_undirected(_edges_ds(star))).to_pandas()
    assert int(got["n_triangles"][0]) == 0
    assert int(got["n_wedges"][0]) == 10
    assert got["global_cc"][0] == 0.0


def test_extract_links_from_synth_page(ray_session):
    """The committed synth corpus embeds nav/footer/article anchors — the
    extractor must resolve them against the page host."""
    import ray.data

    from docler_ray.sources.synth import page_record

    # find an html row (kind < 0.90 for most i)
    rec = page_record(0)
    assert rec["html"].startswith(b"<!DOCTYPE")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([rec["url"]], pa.string()),
                "html": pa.array([rec["html"]], pa.binary()),
            }
        )
    )
    links = extract_links(ds).to_pandas()
    assert len(links) > 0
    page_host = url_host(rec["url"])
    # nav links are host-relative -> resolve to the page host
    assert (links["src_host"] == page_host).all()
    nav = links[links["dst_url"].str.contains("/section-")]
    assert len(nav) >= 4
    assert (nav["dst_host"] == page_host).all()
    # every resolved URL is absolute http(s) without fragments
    assert links["dst_url"].str.startswith(("http://", "https://")).all()
    assert not links["dst_url"].str.contains("#").any()


def test_extract_links_skips_binary_and_nofollow_flag(ray_session):
    import ray.data

    html = (
        b'<html><body><a href="/a">One</a>'
        b'<a rel="NOFOLLOW" href="https://x.example/b">Two</a></body></html>'
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    ["https://h.example/p", "https://h.example/q"], pa.string()
                ),
                "html": pa.array([html, b"\xff\xfe\x00\x01garbage"], pa.binary()),
            }
        )
    )
    links = extract_links(ds).to_pandas()
    assert len(links) == 2
    assert sorted(links["nofollow"]) == [False, True]
    counts = host_edge_counts(extract_links(ds)).to_pandas()
    # nofollow edge dropped, self-host edge dropped -> empty graph
    assert len(counts) == 0


def test_degree_profile_counts(ray_session):
    import ray.data

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": pa.array(["a", "a", "b"], pa.string()),
                "dst_host": pa.array(["b", "c", "c"], pa.string()),
                "n": pa.array([5, 2, 1], pa.int64()),
            }
        )
    )
    got = (
        degree_profile(edges)
        .to_pandas()
        .set_index("host")
        .sort_index()
    )
    assert got.loc["a"].tolist() == [2, 0, 7, 0]
    assert got.loc["b"].tolist() == [1, 1, 1, 5]
    assert got.loc["c"].tolist() == [0, 2, 0, 3]


def _brute_kcore(pairs, k):
    pairs = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = {x for p in pairs for x in p}
    while True:
        deg = dict.fromkeys(nodes, 0)
        for a, b in pairs:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        nxt = {n for n in nodes if deg[n] >= k}
        if nxt == nodes:
            return {f"h{n}": deg[n] for n in nodes}
        nodes = nxt


def _kcore_dict(df):
    return {h: int(d) for h, d in zip(df["host"], df["core_deg"])}


def test_kcore_matches_brute_force(ray_session):
    from docler_ray.stages.linkgraph import canonical_undirected, k_core

    for seed, k in ((3, 3), (9, 4), (21, 5)):
        edges = _rand_digraph(seed, n_nodes=16, n_draws=70)
        got = _kcore_dict(
            k_core(canonical_undirected(_edges_ds(edges)), k).to_pandas()
        )
        assert got == _brute_kcore(edges, k), (seed, k)


def test_kcore_triangle_with_tail(ray_session):
    from docler_ray.stages.linkgraph import canonical_undirected, k_core

    # the tail (2-3, 3-4) peels in two cascading rounds; triangle survives
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got = _kcore_dict(
        k_core(canonical_undirected(_edges_ds(pairs)), 2).to_pandas()
    )
    assert got == {"h0": 2, "h1": 2, "h2": 2}


def test_kcore_distributed_regime_matches_local(ray_session, monkeypatch):
    import docler_ray.stages.linkgraph as lg

    edges = _rand_digraph(6, n_nodes=14, n_draws=60)
    und = lambda: lg.canonical_undirected(_edges_ds(edges))  # noqa: E731
    local = _kcore_dict(lg.k_core(und(), 3).to_pandas())
    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    dist = _kcore_dict(lg.k_core(und(), 3).to_pandas())
    assert dist == local == _brute_kcore(edges, 3)


def test_kcore_empty_and_all_peeled(ray_session):
    from docler_ray.stages.linkgraph import canonical_undirected, k_core

    got = k_core(canonical_undirected(_edges_ds([])), 2)
    assert got.count() == 0
    assert got.schema().names == ["host", "core_deg"]
    # a path graph has no 2-core at all
    path = [(0, 1), (1, 2), (2, 3)]
    assert k_core(canonical_undirected(_edges_ds(path)), 2).count() == 0


def test_kcore_over_cap_raises(ray_session, monkeypatch):
    import docler_ray.stages.linkgraph as lg

    monkeypatch.setattr(lg, "_PAGERANK_LOCAL_EDGE_CAP", 0)
    with pytest.raises(NotImplementedError, match="broadcast regime capped"):
        lg.k_core(
            lg.canonical_undirected(_edges_ds([(0, 1), (1, 2)])),
            1,
            broadcast_cap=2,
        )


def _redirect_ds(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in pairs], pa.string()),
                "dst_url": pa.array([b for _, b in pairs], pa.string()),
            }
        )
    )


def test_resolve_redirects_chain_cycle_feeder(ray_session):
    from docler_ray.stages.linkgraph import resolve_redirects

    # chain a->b->c->T; 2-cycle x<->y; feeder f->x; duplicate edge collapses
    pairs = [("a", "b"), ("b", "c"), ("c", "T"), ("x", "y"), ("y", "x"), ("f", "x"), ("a", "b")]
    df = resolve_redirects(_redirect_ds(pairs)).to_pandas().set_index("src")
    assert df.loc["a", "final"] == "T" and df.loc["a", "hops"] == 3
    assert df.loc["b", "hops"] == 2 and df.loc["c", "hops"] == 1
    for n in ("x", "y", "f"):
        assert bool(df.loc[n, "cyclic"]) and df.loc[n, "final"] is None


def test_resolve_redirects_self_loop_and_memo(ray_session):
    from docler_ray.stages.linkgraph import resolve_redirects

    # s->s self loop; two chains converging on one terminal exercise memo
    pairs = [("s", "s"), ("p", "m"), ("q", "m"), ("m", "T")]
    df = resolve_redirects(_redirect_ds(pairs)).to_pandas().set_index("src")
    assert bool(df.loc["s", "cyclic"])
    assert df.loc["p", "hops"] == 2 and df.loc["q", "hops"] == 2
    assert df.loc["m", "hops"] == 1


def test_resolve_redirects_nonfunctional_raises(ray_session):
    from docler_ray.stages.linkgraph import resolve_redirects

    with pytest.raises(ValueError, match="not functional"):
        resolve_redirects(_redirect_ds([("a", "b"), ("a", "c")]))


def test_resolve_redirects_empty_and_cap(ray_session):
    from docler_ray.stages.linkgraph import resolve_redirects

    out = resolve_redirects(_redirect_ds([]))
    assert out.count() == 0
    with pytest.raises(NotImplementedError, match="broadcast regime capped"):
        resolve_redirects(_redirect_ds([("a", "b"), ("b", "c")]), broadcast_cap=1)


def test_random_walks_deterministic_and_valid(ray_session):
    import hashlib

    from docler_ray.stages.linkgraph import random_walks

    edges = _rand_digraph(23, n_nodes=10, n_draws=40)
    df1 = random_walks(_edges_ds(edges), walks_per_node=2, walk_len=6).to_pandas()
    df2 = random_walks(_edges_ds(edges), walks_per_node=2, walk_len=6).to_pandas()
    # reproducible bit-for-bit
    assert df1.sort_values(["walk_id", "step"]).values.tolist() == df2.sort_values(
        ["walk_id", "step"]
    ).values.tolist()
    # every consecutive hop is a real edge chosen by the md5 rule
    adj = {}
    for a, b in sorted(set(edges)):
        adj.setdefault(f"h{a}", []).append(f"h{b}")
    walks = df1.sort_values(["walk_id", "step"]).groupby("walk_id")
    for wid, g in walks:
        ns_nodes = g["node"].tolist()
        for step, (cur, nxt) in enumerate(zip(ns_nodes, ns_nodes[1:]), start=1):
            ns = adj[cur]
            pick = (
                int(hashlib.md5(f"{cur}:{wid}:{step}".encode()).hexdigest()[:13], 16)
                % len(ns)
            )
            assert nxt == ns[pick]


def test_random_walks_sink_ends_early(ray_session):
    from docler_ray.stages.linkgraph import random_walks

    # b is a sink: walks from a reach b at step 1 and stop
    df = random_walks(
        _edges_ds([(0, 1)]), walks_per_node=1, walk_len=5
    ).to_pandas()
    by_walk = df.groupby("walk_id")["step"].max().tolist()
    assert sorted(by_walk) == [0, 1]  # h1's walk ends at 0, h0's at 1


def test_random_walks_empty(ray_session):
    from docler_ray.stages.linkgraph import random_walks

    assert random_walks(_edges_ds([])).count() == 0


def test_skipgram_pairs_window_semantics(ray_session):
    import ray.data

    from docler_ray.stages.linkgraph import skipgram_pairs

    # one walk A B C D: window 2 pairs (symmetric):
    # dist1: AB BC CD (x2 directions), dist2: AC BD (x2)
    walks = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([0, 0, 0, 0, 1], pa.int64()),
                "step": pa.array([0, 1, 2, 3, 0], pa.int64()),
                "node": pa.array(["A", "B", "C", "D", "A"], pa.string()),
            }
        )
    )
    df = skipgram_pairs(walks, window=2).to_pandas()
    got = {(r.center, r.context): int(r.n) for r in df.itertuples()}
    want = {}
    for a, b in [("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"), ("B", "D")]:
        want[(a, b)] = 1
        want[(b, a)] = 1
    assert got == want  # the single-node walk 1 contributes nothing


def test_mutual_link_pairs(ray_session):
    from docler_ray.stages.linkgraph import mutual_link_pairs

    # 0<->1 mutual (2 fwd, 1 rev); 2->3 one-way; self-loop dropped
    edges = [(0, 1), (0, 1), (1, 0), (2, 3), (4, 4)]
    df = mutual_link_pairs(_edges_ds(edges)).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert (r["u"], r["v"], r["n_uv"], r["n_vu"]) == ("h0", "h1", 2, 1)


def test_glove_cooccurrence_weights(ray_session):
    import ray.data

    from docler_ray.stages.linkgraph import glove_cooccurrence

    # walk A B A: pairs at d=1 (A-B twice) weight 2; d=2 (A-A) weight 1
    walks = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([0, 0, 0], pa.int64()),
                "step": pa.array([0, 1, 2], pa.int64()),
                "node": pa.array(["A", "B", "A"], pa.string()),
            }
        )
    )
    df = glove_cooccurrence(walks, window=2).to_pandas()
    got = {(r.center, r.context): int(r.x2) for r in df.itertuples()}
    assert got == {("A", "B"): 4, ("B", "A"): 4, ("A", "A"): 2}


def test_common_neighbor_scores(ray_session):
    from docler_ray.stages.linkgraph import (
        canonical_undirected,
        common_neighbor_scores,
    )

    # square 0-1-2-3-0: opposite corners share 2 common neighbors and are
    # NOT edges (the prediction candidates); adjacent corners share 0
    # common neighbors... plus diagonal 0-2 added as a real edge makes
    # (1,3) the only pure candidate and gives edge pairs nonzero CN
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    df = (
        common_neighbor_scores(canonical_undirected(_edges_ds(pairs)))
        .to_pandas()
        .set_index(["u", "v"])
    )
    assert df.loc[("h1", "h3")].tolist() == [2, False]  # the candidate
    assert df.loc[("h0", "h2")].tolist() == [2, True]  # diagonal edge
    assert df.loc[("h0", "h1")].tolist() == [1, True]  # via h2
    # no pair without a common neighbor appears
    assert (df["cn"] >= 1).all()


def test_common_neighbor_empty(ray_session):
    from docler_ray.stages.linkgraph import (
        canonical_undirected,
        common_neighbor_scores,
    )

    out = common_neighbor_scores(canonical_undirected(_edges_ds([])))
    assert out.count() == 0
