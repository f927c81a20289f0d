"""URL/host analytics for Common-Crawl-style page tables.

The north-star input is a pages table keyed by ``url``; host-level skew is
the canonical web-corpus hazard (three hosts own half the synthetic corpus,
sources/synth.py:71-80). These operators give the pipeline its URL tier:
vectorized parsing (scheme/host/tld/path) with pyarrow's RE2 kernels,
per-host document counts (map-side partials, host-cardinality shuffle), and
broadcast blocklist filtering. No reference precedent (docler is
filesystem-keyed); the parse regex is RE2-safe so the DuckDB oracle replays
it verbatim.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (no backtracking constructs) — DuckDB regexp_extract replays this
# pattern verbatim, which is what makes the oracle exact.
URL_PATTERN = r"^([a-z][a-z0-9+.\-]*)://([^/?#]+)([^?#]*)"
_URL_NAMED = r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<host>[^/?#]+)(?P<path>[^?#]*)"
TLD_PATTERN = r"\.([^.]+)$"
_TLD_NAMED = r"\.(?P<tld>[^.]+)$"


def _fill_empty(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    return pc.fill_null(arr, "")


def parse_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append scheme/host/tld/path/path_depth columns — one vectorized
    ``extract_regex`` pass (RE2, zero Python per row). Non-matching or null
    urls parse to empty strings and path_depth 0, so the stage never drops
    rows (filtering is a separate, explicit operator)."""
    urls = pc.fill_null(batch.column(url_col), "")
    parts = pc.extract_regex(urls, pattern=_URL_NAMED)
    scheme = _fill_empty(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(_fill_empty(pc.struct_field(parts, "host")))
    path = _fill_empty(pc.struct_field(parts, "path"))
    tld = _fill_empty(
        pc.struct_field(pc.extract_regex(host, pattern=_TLD_NAMED), "tld")
    )
    depth = pc.cast(pc.count_substring(path, "/"), pa.int64())
    for name, arr in (
        ("scheme", scheme),
        ("host", host),
        ("tld", tld),
        ("path", path),
        ("path_depth", depth),
    ):
        batch = batch.append_column(name, arr)
    return batch


def parse_urls(ds, url_col: str = "url"):
    """Dataset wrapper: stateless zero-copy map pass."""
    return ds.map_batches(
        lambda b: parse_url_batch(b, url_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def host_profile(ds, url_col: str = "url"):
    """Per-host corpus profile: (host, tld, n docs, sum of path depths).

    Scale shape: the map side parses AND pre-aggregates each batch down to
    its distinct hosts, so the shuffle ships O(distinct hosts x blocks)
    partial rows — never documents — and the final groupby is
    host-cardinality-sized. This is the operator that finds the heavy hosts
    a url-hash repartition must break.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = parse_url_batch(batch.select([url_col]), url_col)
        g = (
            pa.table(
                {
                    "host": t.column("host"),
                    "tld": t.column("tld"),
                    "path_depth": t.column("path_depth"),
                }
            )
            .group_by(["host", "tld"])
            .aggregate([([], "count_all"), ("path_depth", "sum")])
        )
        return g.rename_columns(["host", "tld", "partial_n", "partial_depth"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["host", "tld"])
        .aggregate(
            Sum("partial_n", alias_name="n"),
            Sum("partial_depth", alias_name="sum_path_depth"),
        )
    )


def filter_blocked_hosts(ds, blocked: list[str], url_col: str = "url"):
    """Drop rows whose url host is on the blocklist — the domain-blocklist
    stage every web-text pipeline runs first. The blocklist is closed over
    (shipped once per task by Ray); at real scale a multi-million-entry list
    goes through ``ray.put`` + per-actor memo like joins._get_broadcast, but
    the operator contract (vectorized parse + ``is_in`` per batch, zero
    shuffle) is identical."""
    blocked_arr = pa.array(sorted({h.lower() for h in blocked}), type=pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        t = parse_url_batch(batch.select([url_col]), url_col)
        hit = pc.is_in(t.column("host"), value_set=blocked_arr)
        return batch.filter(pc.invert(hit))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def parse_query_params(ds, *, url_col: str = "url"):
    """Explode URL query strings into (param, value) rows with RFC 3986
    percent-decoding (urllib.parse.unquote_plus semantics minus the plus:
    '%xx' escapes decode, '+' stays literal — crawl URLs are not form
    submissions). Map-only; one output row per key=value pair, URLs
    without a query contribute nothing."""
    from urllib.parse import unquote

    def explode(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        params: list[str] = []
        values: list[str] = []
        for u in urls:
            if not u:
                continue
            qpos = u.find("?")
            if qpos < 0:
                continue
            query = u[qpos + 1 :]
            fpos = query.find("#")
            if fpos >= 0:
                query = query[:fpos]
            for part in query.split("&"):
                if not part:
                    continue
                eq = part.find("=")
                if eq < 0:
                    params.append(unquote(part))
                    values.append("")
                else:
                    params.append(unquote(part[:eq]))
                    values.append(unquote(part[eq + 1 :]))
        return pa.table(
            {
                "param": pa.array(params, pa.string()),
                "value": pa.array(values, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def query_param_profile(ds, *, url_col: str = "url"):
    """Per-parameter corpus profile: (param, n, n_distinct, min_value) —
    the crawl-frontier diagnostic that finds session-id/tracking params
    (huge n_distinct) vs structural ones. Map-side explode + distinct
    partials, ONE (param, value) exchange, then a param-sized fold."""
    from ray.data.aggregate import Count, Sum

    pairs = parse_query_params(ds, url_col=url_col)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["param", "value"]).aggregate([([], "count_all")])
        return g.rename_columns(["param", "value", "pn"])

    per_value = (
        pairs.map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["param", "value"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    def fold_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch.group_by("param").aggregate(
            [("n", "sum"), ([], "count_all"), ("value", "min")]
        )
        return g.rename_columns(["param", "pn", "pd", "pmin"])

    agg = (
        per_value.map_batches(
            fold_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("param")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("pd", alias_name="n_distinct"),
        )
    )
    # min_value needs its own Min over the per-value table; fold it into
    # the same param-sized result via a second tiny aggregate
    from ray.data.aggregate import Min

    mins = per_value.groupby("param").aggregate(Min("value", alias_name="min_value"))
    amap = agg.to_pandas().set_index("param")
    mmap = mins.to_pandas().set_index("param")
    params = sorted(amap.index)
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "param": pa.array(params, pa.string()),
                "n": pa.array(
                    [int(amap.loc[p, "n"]) for p in params], pa.int64()
                ),
                "n_distinct": pa.array(
                    [int(amap.loc[p, "n_distinct"]) for p in params], pa.int64()
                ),
                "min_value": pa.array(
                    [str(mmap.loc[p, "min_value"]) for p in params], pa.string()
                ),
            }
        )
    )


def crawl_schedule(
    ds,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    delay_s: int = 2,
    n_rows: int | None = None,
):
    """Per-host politeness scheduling for a crawl frontier: each URL's
    1-based position in its host's fetch queue (deterministic order:
    ascending ``id_col``) and its fetch-slot offset ``(seq-1) * delay_s``
    seconds — the frontier-to-schedule operator every polite crawler runs
    before dispatch (one fetch per host per delay window).

    Distributed plan: vectorized host parse (no exchange), then the shared
    per-key ordered pattern — ``coarse = crc32(host) % n_groups``
    co-locates each host's rows in ONE exchange while keeping ~constant
    rows per pandas task, and the in-bucket (host, id) mergesort +
    cumcount is vectorized across every host in the bucket. Per-task state
    is bucket-sized, never host- or corpus-sized."""
    import pandas as pd

    from docler_ray.stages.windows import _make_add_coarse, _session_group_count

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover
            n_rows = None
    parsed = parse_urls(ds, url_col).select_columns([id_col, "host"])
    add_coarse = _make_add_coarse("host", _session_group_count(n_rows))

    def schedule(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "host": pd.Series([], dtype="object"),
                    "seq": pd.Series([], dtype="int64"),
                    "fetch_offset_s": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["host", id_col], kind="mergesort")
        seq = (df.groupby("host", sort=False).cumcount().to_numpy() + 1).astype(
            "int64"
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "host": df["host"].to_numpy(),
                "seq": seq,
                "fetch_offset_s": (seq - 1) * int(delay_s),
            }
        )

    return (
        parsed.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(schedule, batch_format="pandas")
    )


def filter_robots(ds, robots_by_host: dict[str, str], *, url_col: str = "url"):
    """Crawl-policy filter: drop URLs whose path a host's robots.txt
    disallows for the ``*`` user-agent (RFC 9309 longest-match). The
    robots corpus is host-cardinality by definition, so the texts parse
    ONCE driver-side into rule lists and the {host: rules} dict broadcasts
    via ``ray.put``; the decision pass is map-only, vectorized per distinct
    host in each batch (sequential only in the per-host rule list). Hosts
    with no robots.txt allow everything."""
    import numpy as np
    import ray

    from docler_ray.functions.robots import parse_robots, robots_allowed_batch
    from docler_ray.stages.joins import _get_broadcast

    rules_ref = ray.put(
        {h: parse_robots(t) for h, t in robots_by_host.items()}
    )

    def keep(batch: pa.Table) -> pa.Table:
        rules_by_host = _get_broadcast(rules_ref)
        parsed = parse_url_batch(batch, url_col)
        hosts = parsed.column("host").to_numpy(zero_copy_only=False)
        paths = parsed.column("path").to_numpy(zero_copy_only=False)
        allowed = np.ones(len(hosts), dtype=bool)
        for h in np.unique(hosts):
            rules = rules_by_host.get(h)
            if not rules:
                continue
            idx = np.nonzero(hosts == h)[0]
            allowed[idx] = robots_allowed_batch(paths[idx], rules)
        return batch.filter(pa.array(allowed))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# --- RFC 3986 §6 URL canonicalization ---------------------------------------
# Crawl frontiers and dedup keys need ONE spelling per resource. This is the
# syntax-based + scheme-based normalization ladder of RFC 3986 §6.2.2-6.2.3
# (case normalization, percent-encoding normalization, dot-segment removal,
# default-port and empty-path rules) plus the crawl-specific fragment strip
# (fragments never reach the server). No reference precedent (docler is
# filesystem-keyed); semantics follow the RFC text directly.

_URL_SPLIT_RE = None  # compiled lazily; module import stays cheap

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = frozenset("0123456789abcdefABCDEF")
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _pct_normalize(s: str) -> str:
    """RFC 3986 §6.2.2.1-2: uppercase the hex of retained escapes, decode
    escapes of unreserved characters. Invalid escapes (bad/short hex) pass
    through literally — a canonicalizer must never corrupt its input."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            ch = chr(int(s[i + 1 : i + 3], 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, transliterated from the RFC's
    buffer algorithm (the five-case loop), not from any library."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            j = inp.find("/", 1)
            if j < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    return "".join(out)


def canonicalize_url(url: str) -> str:
    """One canonical spelling per resource (RFC 3986 §6.2.2-6.2.3 +
    fragment strip). Non-hierarchical / non-URL strings return unchanged —
    canonicalization is total and idempotent, never lossy on garbage."""
    global _URL_SPLIT_RE
    if _URL_SPLIT_RE is None:
        import re

        _URL_SPLIT_RE = re.compile(
            r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
        )
    m = _URL_SPLIT_RE.match(url)
    if not m:
        return url
    scheme = m.group(1).lower()
    authority = m.group(2)
    path = m.group(3)
    query = m.group(4)  # includes the leading '?', or None

    # authority: lowercase host, strip a scheme-default port; userinfo kept
    userinfo = ""
    hostport = authority
    at = authority.rfind("@")
    if at >= 0:
        userinfo = authority[: at + 1]
        hostport = authority[at + 1 :]
    host, port = hostport, None
    colon = hostport.rfind(":")
    if colon >= 0 and hostport.find("]", colon) < 0:  # not inside an IPv6 [..]
        maybe = hostport[colon + 1 :]
        if maybe.isdigit() or maybe == "":
            host, port = hostport[:colon], maybe
    host = host.lower()
    if port is not None and port.lstrip("0") == port and port == _DEFAULT_PORTS.get(scheme):
        port = None
    if port:
        host = f"{host}:{port}"
    authority = userinfo + host

    path = _remove_dot_segments(_pct_normalize(path))
    if not path and scheme in _DEFAULT_PORTS:
        path = "/"
    out = f"{scheme}://{authority}{path}"
    if query is not None:
        out += _pct_normalize(query)
    return out


# conservative vectorized fast path: a URL that matches NONE of these RE2
# patterns is provably already canonical, so the Python machine only runs
# on the violators (a mostly-clean corpus canonicalizes at Arrow speed)
_SUSPECT_PATTERNS = (
    r"[%#A-Z]",          # escapes to normalize, fragment, or uppercase
    r"/\.\.?(/|$)",      # dot segments
    r"://[^/?#]*:",      # any explicit port (or userinfo with ':')
    r"://[^/?#]*@",      # userinfo — rfind('@') cases
    r"^[a-z][a-z0-9+.\-]*://[^/?#]*$",  # empty path -> '/'
)


def canonicalize_urls(ds, *, url_col: str = "url", out_col: str = "url_canon"):
    """Zero-shuffle map pass appending the canonical spelling. One
    vectorized RE2 sweep marks the suspect rows; only those pay the
    per-URL Python machine (setup-free, so a task pool suffices)."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = pc.fill_null(batch.column(url_col), "")
        suspect = pc.match_substring_regex(urls, _SUSPECT_PATTERNS[0])
        for pat in _SUSPECT_PATTERNS[1:]:
            suspect = pc.or_(suspect, pc.match_substring_regex(urls, pat))
        vals = urls.to_pylist()
        mask = suspect.to_numpy(zero_copy_only=False)
        out = [canonicalize_url(u) if m else u for u, m in zip(vals, mask)]
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def parse_sitemaps(ds, *, xml_col: str = "sitemap_xml", id_col: str = "doc_id"):
    """Explode sitemap documents into frontier rows (functions/sitemap.py):
    one zero-shuffle flat-map pass, rows (id, pos, kind, loc, lastmod,
    changefreq, priority) in file order. Non-sitemap payloads contribute
    zero rows — discovery feeds never error the pipeline."""
    from docler_ray.functions.sitemap import parse_sitemap

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        xmls = batch.column(xml_col).to_pylist()
        out_id, pos, kind, loc, lastmod, freq, prio = [], [], [], [], [], [], []
        for i, x in zip(ids, xmls):
            for p, e in enumerate(parse_sitemap(x or "")):
                out_id.append(i)
                pos.append(p)
                kind.append(e["kind"])
                loc.append(e["loc"])
                lastmod.append(e["lastmod"])
                freq.append(e["changefreq"])
                prio.append(e["priority"])
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "kind": pa.array(kind, pa.string()),
                "loc": pa.array(loc, pa.string()),
                "lastmod": pa.array(lastmod, pa.string()),
                "changefreq": pa.array(freq, pa.string()),
                "priority": pa.array(prio, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def registered_domains(
    ds, *, host_col: str = "host", out_col: str = "reg_domain", psl_text: str | None = None
):
    """Append the eTLD+1 registrable domain (functions/psl.py) — the
    per-owner rollup key for crawl quotas. Zero shuffle; the rule table is
    tiny and closes over the tasks; each batch computes once per DISTINCT
    host (web corpora repeat hosts heavily) and scatters via the unique
    inverse."""
    import numpy as np

    from docler_ray.functions.psl import parse_psl_rules, registered_domain

    rules = parse_psl_rules(psl_text) if psl_text is not None else None

    def fn(batch: pa.Table) -> pa.Table:
        hosts = batch.column(host_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(hosts, return_inverse=True)
        mapped = np.array(
            [registered_domain(h or "", rules) for h in uniq], dtype=object
        )
        return batch.append_column(
            out_col, pa.array(mapped[inv], pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_BUDGET_HOST_CAP = 5_000_000  # driver-finish bound: hosts x 3 int64 cols


def allocate_crawl_budget(
    ds,
    budget: int,
    *,
    host_col: str = "host",
    weight_col: str = "weight",
    host_cap: int | None = None,
):
    """Hamilton largest-remainder apportionment of a global fetch budget
    across hosts, weight-proportional and EXACTLY budget-summing: base_h =
    floor(B*w_h / W), then the B - sum(base) leftover slots go +1 each to
    the hosts with the largest remainders (B*w_h mod W), ties broken by
    host ascending. All arithmetic is int64 (B*w_h <= 2^63 is the caller's
    budget*mass headroom contract, documented not checked).

    Plan: map-side per-host weight partials, ONE host-keyed exchange, then
    the host-cardinality quota table finishes on the driver (sorted
    remainder rank) under ``host_cap`` — beyond it the +1 assignment is
    the distributed ordered-rank (docs_global_rank machinery) and this
    raises with that plan named. Returns (host, weight, quota)."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    cap = _BUDGET_HOST_CAP if host_cap is None else host_cap

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([host_col, weight_col])
            .group_by(host_col)
            .aggregate([(weight_col, "sum")])
        )
        return g.rename_columns([host_col, "pw_"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(host_col)
        .aggregate(Sum("pw_", alias_name="weight"))
        .materialize()
    )
    n_hosts = agg.count()
    if n_hosts == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                    "quota": pa.array([], pa.int64()),
                }
            )
        )
    if n_hosts > cap:
        raise NotImplementedError(
            f"allocate_crawl_budget driver finish capped at {cap} hosts "
            f"(measured {n_hosts}); beyond it rank the remainders with the "
            "distributed ordered prefix (docs_global_rank machinery) and "
            "broadcast the cut value"
        )
    df = agg.to_pandas().sort_values(host_col).reset_index(drop=True)
    w = df["weight"].to_numpy(dtype=np.int64)
    total = int(w.sum())
    if total == 0:
        base = np.zeros(len(w), dtype=np.int64)
        rem = np.zeros(len(w), dtype=np.int64)
    else:
        prod = int(budget) * w  # int64; headroom is the caller's contract
        base = prod // total
        rem = prod % total
    extra = int(budget) - int(base.sum())
    # rank by (rem desc, host asc): hosts are already host-ascending, and
    # np.argsort(-rem, kind="stable") preserves that order inside ties
    order = np.argsort(-rem, kind="stable")
    quota = base.copy()
    quota[order[:extra]] += 1
    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(df[host_col].tolist(), pa.string()),
                "weight": pa.array(w),
                "quota": pa.array(quota),
            }
        )
    )


def parse_feeds(ds, *, xml_col: str = "feed_xml", id_col: str = "doc_id"):
    """Explode RSS/Atom feed documents into discovery rows
    (functions/sitemap.py::parse_feed): one zero-shuffle flat-map, rows
    (id, pos, kind, title, link, updated, guid) in file order."""
    from docler_ray.functions.sitemap import parse_feed

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        xmls = batch.column(xml_col).to_pylist()
        out_id, pos, kind, title, link, upd, guid = [], [], [], [], [], [], []
        for i, x in zip(ids, xmls):
            for p, e in enumerate(parse_feed(x or "")):
                out_id.append(i)
                pos.append(p)
                kind.append(e["kind"])
                title.append(e["title"])
                link.append(e["link"])
                upd.append(e["updated"])
                guid.append(e["guid"])
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "kind": pa.array(kind, pa.string()),
                "title": pa.array(title, pa.string()),
                "link": pa.array(link, pa.string()),
                "updated": pa.array(upd, pa.string()),
                "guid": pa.array(guid, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def aligned_url_pairs(
    ds,
    *,
    url_col: str = "url",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    group_cap: int = 64,
):
    """Cross-lingual document alignment by URL pattern (the ParaCrawl /
    WikiMatrix mining recipe's first stage: pages whose URLs differ ONLY
    in the language path segment are translation candidates). The first
    path segment is treated as the site's language slot; the alignment
    key is (host, path-with-that-segment-removed). ONE key exchange;
    in-group emission is all cross-LANGUAGE pairs ordered by id (a < b),
    capped at ``group_cap`` members (a shared tail across hundreds of
    pages is a template, not a translation set). Returns (a, b, lang_a,
    lang_b, host)."""
    import numpy as np

    def keyed(batch: pa.Table) -> pa.Table:
        t = parse_url_batch(batch.select([url_col]), url_col)
        hosts = t.column("host").to_pylist()
        paths = t.column("path").to_pylist()
        tails = []
        for p in paths:
            # strip the first segment: /en/a/b -> /a/b ('' if no 2nd slash)
            j = p.find("/", 1)
            tails.append(p[j:] if j > 0 else "")
        return pa.table(
            {
                id_col: batch.column(id_col),
                lang_col: batch.column(lang_col),
                "host": pa.array(hosts, pa.string()),
                "tail": pa.array(tails, pa.string()),
            }
        )

    def pairs(df):
        import pandas as pd

        cols = {
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "lang_a": pd.Series([], dtype="object"),
            "lang_b": pd.Series([], dtype="object"),
            "host": pd.Series([], dtype="object"),
        }
        if df.empty or len(df) > group_cap or df["tail"].iloc[0] == "":
            return pd.DataFrame(cols)
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy()
        langs = df[lang_col].to_numpy()
        ia, ib = np.triu_indices(len(df), 1)
        keep = langs[ia] != langs[ib]
        if not keep.any():
            return pd.DataFrame(cols)
        return pd.DataFrame(
            {
                "a": ids[ia][keep],
                "b": ids[ib][keep],
                "lang_a": langs[ia][keep],
                "lang_b": langs[ib][keep],
                "host": df["host"].iloc[0],
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["host", "tail"])
        .map_groups(pairs, batch_format="pandas")
    )


def trap_suspect_params(
    ds,
    *,
    url_col: str = "url",
    min_n: int = 50,
    num: int = 9,
    den: int = 10,
):
    """Crawl-trap / session-id detection per (host, param): a parameter
    whose value is distinct on >= num/den of >= min_n sightings is
    URL-space explosion (calendar traps, session ids, per-request
    tokens) — the frontier must strip it or cap the host. Exact integer
    cross-multiply (n_distinct * den >= num * n). Plan: the host rides
    the query_param_profile explode, distinct partials, ONE
    (host, param, value) exchange, then a (host, param) fold. Returns
    flagged rows only: (host, param, n, n_distinct)."""
    from ray.data.aggregate import Count, Sum

    def explode(batch: pa.Table) -> pa.Table:
        from urllib.parse import unquote

        t = parse_url_batch(batch.select([url_col]), url_col)
        hosts = t.column("host").to_pylist()
        urls = pc.fill_null(batch.column(url_col), "").to_pylist()
        oh, op, ov = [], [], []
        for h, u in zip(hosts, urls):
            q = u.find("?")
            if q < 0 or not h:
                continue
            query = u[q + 1 :]
            f = query.find("#")
            if f >= 0:
                query = query[:f]
            for part in query.split("&"):
                if not part:
                    continue
                eq = part.find("=")
                if eq < 0:
                    oh.append(h)
                    op.append(unquote(part))
                    ov.append("")
                else:
                    oh.append(h)
                    op.append(unquote(part[:eq]))
                    ov.append(unquote(part[eq + 1 :]))
        return pa.table(
            {
                "host": pa.array(oh, pa.string()),
                "param": pa.array(op, pa.string()),
                "value": pa.array(ov, pa.string()),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["host", "param", "value"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "param", "value", "pn"])

    per_value = (
        pairs.map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["host", "param", "value"])
        .aggregate(Sum("pn", alias_name="n"))
    )

    def fold_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["host", "param"]).aggregate(
            [("n", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["host", "param", "pn", "pd"])

    agg = (
        per_value.map_batches(
            fold_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["host", "param"])
        .aggregate(Sum("pn", alias_name="n"), Sum("pd", alias_name="n_distinct"))
    )

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(batch.column("n"), min_n),
            pc.greater_equal(
                pc.multiply(batch.column("n_distinct"), den),
                pc.multiply(batch.column("n"), num),
            ),
        )
        return batch.filter(ok)

    return agg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


_BITEXT_PAIR_CAP = 2_000_000  # broadcast bound for the pair list


def bitext_number_overlap(
    docs,
    pairs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_cap: int | None = None,
):
    """Stage 2 of URL-pattern bitext mining (after
    :func:`aligned_url_pairs`): score each candidate pair by its shared
    DIGIT-token overlap — numbers survive translation verbatim, so
    number agreement is the cheap language-independent filter the
    ParaCrawl pipeline applies before any MT model. Returns (a, b,
    n_shared, n_a, n_b) where n_* count distinct digit tokens.

    Plan: the pair list is alignment-bounded (grown from URL tails, not
    the corpus square) — under ``pair_cap`` it broadcasts as a doc ->
    [(pair_id, side)] index via ``ray.put``; the doc pass emits (pid,
    side, digit-hash) postings WITH each side's distinct count as
    payload; one (pid, hash) exchange finds both-side hashes; a pid fold
    counts them. Above the cap raises naming the join plan."""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    cap = _BITEXT_PAIR_CAP if pair_cap is None else pair_cap
    pdf = pairs.materialize()
    n_pairs = pdf.count()
    if n_pairs == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                }
            )
        )
    if n_pairs > cap:
        raise NotImplementedError(
            f"bitext pair broadcast capped at {cap} pairs (measured "
            f"{n_pairs}); beyond it run two copartitioned joins of the "
            "postings with the pair table (on a, then b)"
        )
    pp = pdf.to_pandas()
    index: dict = {}
    pair_ids = {}
    for pid, (a, b) in enumerate(zip(pp["a"], pp["b"])):
        pair_ids[pid] = (int(a), int(b))
        index.setdefault(int(a), []).append((pid, 0))
        index.setdefault(int(b), []).append((pid, 1))
    idx_ref = ray.put(index)

    def postings(batch: pa.Table) -> pa.Table:
        import hashlib

        from docler_ray.functions.tokens import ws_tokens
        from docler_ray.stages.joins import _get_broadcast

        idx = _get_broadcast(idx_ref)
        out_pid, out_side, out_h, out_n = [], [], [], []
        for d, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            entries = idx.get(int(d))
            if not entries:
                continue
            # 52-bit md5 keys (NEVER builtins.hash — PYTHONHASHSEED makes
            # it process-nondeterministic); distinct-count survives keying
            nums = sorted(
                {
                    int(hashlib.md5(tok.encode()).hexdigest()[:13], 16)
                    for tok in ws_tokens(t or "")
                    if tok.isdigit()
                }
            )
            for pid, side in entries:
                for h in nums:
                    out_pid.append(pid)
                    out_side.append(side)
                    out_h.append(h)
                    out_n.append(len(nums))
        return pa.table(
            {
                "pid": pa.array(out_pid, pa.int64()),
                "side": pa.array(out_side, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "nn": pa.array(out_n, pa.int64()),
            }
        )

    post = docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
    per_hash = post.groupby(["pid", "h"]).aggregate(
        Count(alias_name="sides"),
        Min("side", alias_name="smin"),
        Max("side", alias_name="smax"),
        Max("nn", alias_name="nmax"),
        Min("nn", alias_name="nmin"),
    )

    def fold(batch: pa.Table) -> pa.Table:
        both = pc.and_(
            pc.equal(batch.column("smin"), 0), pc.equal(batch.column("smax"), 1)
        )
        shared = pc.cast(both, pa.int64())
        g = (
            pa.table({"pid": batch.column("pid"), "sh": shared})
            .group_by("pid")
            .aggregate([("sh", "sum")])
        )
        return g.rename_columns(["pid", "ps"])

    counts = (
        post.map_batches(
            lambda b: pa.table(
                {
                    "pid": b.column("pid"),
                    "side": b.column("side"),
                    "nn": b.column("nn"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["pid", "side"])
        .aggregate(Max("nn", alias_name="n"))
        .to_pandas()
    )
    shared = (
        per_hash.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pid")
        .aggregate(Sum("ps", alias_name="n_shared"))
        .to_pandas()
    )
    sh = dict(zip(shared["pid"], (int(x) for x in shared["n_shared"])))
    n_by = {}
    for pid, side, n in zip(counts["pid"], counts["side"], counts["n"]):
        n_by[(int(pid), int(side))] = int(n)
    rows_a, rows_b, rows_s, rows_na, rows_nb = [], [], [], [], []
    for pid, (a, b) in pair_ids.items():
        rows_a.append(a)
        rows_b.append(b)
        rows_s.append(sh.get(pid, 0))
        rows_na.append(n_by.get((pid, 0), 0))
        rows_nb.append(n_by.get((pid, 1), 0))
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "n_shared": pa.array(rows_s, pa.int64()),
                "n_a": pa.array(rows_na, pa.int64()),
                "n_b": pa.array(rows_nb, pa.int64()),
            }
        )
    )


def crawl_schedule_per_host(
    ds,
    delays_ms_by_host: dict[str, int],
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    default_delay_ms: int = 1000,
    n_rows: int | None = None,
):
    """Politeness scheduling with PER-HOST delays (the robots Crawl-delay
    integration): queue position as in :func:`crawl_schedule`, but the
    fetch-slot offset is (seq-1) * the host's own delay in integer
    MILLISECONDS (crawl-delays are fractional; ms keeps the arithmetic
    exact). The delay map is host-cardinality and broadcasts once.
    Returns (id, host, seq, fetch_offset_ms)."""
    import ray

    from docler_ray.stages.windows import _make_add_coarse, _session_group_count

    if n_rows is None:
        try:
            n_rows = ds.count()
        except Exception:  # pragma: no cover
            n_rows = None
    delays_ref = ray.put(dict(delays_ms_by_host))
    parsed = parse_urls(ds, url_col).select_columns([id_col, "host"])
    add_coarse = _make_add_coarse("host", _session_group_count(n_rows))

    def schedule(df):
        import numpy as np
        import pandas as pd

        from docler_ray.stages.joins import _get_broadcast

        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "host": pd.Series([], dtype="object"),
                    "seq": pd.Series([], dtype="int64"),
                    "fetch_offset_ms": pd.Series([], dtype="int64"),
                }
            )
        delays = _get_broadcast(delays_ref)
        df = df.sort_values(["host", id_col], kind="mergesort")
        seq = (df.groupby("host", sort=False).cumcount().to_numpy() + 1).astype(
            "int64"
        )
        hosts = df["host"].to_numpy()
        uniq, inv = np.unique(hosts, return_inverse=True)
        dms = np.array(
            [int(delays.get(h, default_delay_ms)) for h in uniq], dtype=np.int64
        )[inv]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "host": hosts,
                "seq": seq,
                "fetch_offset_ms": (seq - 1) * dms,
            }
        )

    return (
        parsed.map_batches(add_coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("coarse")
        .map_groups(schedule, batch_format="pandas")
    )


def decode_idn_hosts(ds, *, host_col: str = "host", out_col: str = "host_unicode"):
    """Decode punycode (xn--) host labels to their unicode form via the
    stdlib IDNA codec — display/clustering normalization for
    internationalized domains (the ASCII form stays the WIRE identity;
    this adds the human/reporting one). Memoized per distinct host like
    :func:`registered_domains`; hosts that fail to decode (malformed
    punycode) pass through unchanged — normalization never corrupts."""
    import numpy as np

    def decode_one(h: str) -> str:
        if "xn--" not in h:
            return h
        try:
            return h.encode("ascii").decode("idna")
        except (UnicodeError, UnicodeDecodeError):
            return h

    def fn(batch: pa.Table) -> pa.Table:
        hosts = batch.column(host_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(hosts, return_inverse=True)
        mapped = np.array([decode_one(h or "") for h in uniq], dtype=object)
        return batch.append_column(out_col, pa.array(mapped[inv], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
