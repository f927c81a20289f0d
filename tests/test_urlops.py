"""URL/host tier: vectorized parse, host profile, blocklist filter.

The parse pattern is RE2-safe and replayed verbatim by the DuckDB oracle,
so these tests pin Python/Arrow-vs-DuckDB equivalence on adversarial URLs
(the redact_pii test strategy) plus the operator-level contracts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

ADVERSARIAL_URLS = [
    "https://host0.example/en/article-1",
    "http://Sub.DOMAIN.Example/path/deep/er?q=1#frag",
    "https://single/",
    "https://no-path.example",  # empty path
    "ftp://files.example/a/b/c",
    "HTTPS://upper.scheme/x",  # scheme regex is lowercase-anchored: no match
    "not a url at all",
    "",
    "https://trail.dot.example./p",
    "https://h.example/p?x=/fake/slashes",  # query slashes must not count
    "https://h.example/p#frag/with/slash",
]


def test_parse_url_batch_fields():
    from docler_ray.stages.urlops import parse_url_batch

    batch = pa.table({"url": pa.array(ADVERSARIAL_URLS + [None])})
    out = parse_url_batch(batch)
    host = out.column("host").to_pylist()
    path = out.column("path").to_pylist()
    depth = out.column("path_depth").to_pylist()
    tld = out.column("tld").to_pylist()
    assert host[0] == "host0.example" and tld[0] == "example"
    assert host[1] == "sub.domain.example"  # lowercased
    assert path[1] == "/path/deep/er" and depth[1] == 3  # query cut
    assert host[2] == "single" and tld[2] == ""  # no dot -> no tld
    assert host[3] == "no-path.example" and path[3] == "" and depth[3] == 0
    assert host[5] == "" and host[6] == "" and host[7] == ""  # non-matches
    assert host[8] == "trail.dot.example." and tld[8] == ""
    assert depth[9] == 1 and depth[10] == 1  # query/fragment excluded
    assert host[-1] == "" and depth[-1] == 0  # null url


def test_parse_matches_duckdb_regex():
    """The SAME pattern string must extract the SAME host/path in DuckDB —
    this is what makes the url_host_profile oracle exact."""
    import duckdb

    from docler_ray.stages.urlops import TLD_PATTERN, URL_PATTERN, parse_url_batch

    out = parse_url_batch(pa.table({"url": pa.array(ADVERSARIAL_URLS)}))
    con = duckdb.connect()
    df = pd.DataFrame({"url": ADVERSARIAL_URLS})
    con.register("u", df)
    sql = con.sql(
        f"SELECT lower(regexp_extract(url, '{URL_PATTERN}', 2)) AS host, "
        f"regexp_extract(url, '{URL_PATTERN}', 3) AS path, "
        f"regexp_extract(lower(regexp_extract(url, '{URL_PATTERN}', 2)), "
        f"'{TLD_PATTERN}', 1) AS tld, "
        f"length(regexp_extract(url, '{URL_PATTERN}', 3)) - "
        f"length(replace(regexp_extract(url, '{URL_PATTERN}', 3), '/', '')) "
        "AS path_depth FROM u"
    ).df()
    assert out.column("host").to_pylist() == sql["host"].tolist()
    assert out.column("path").to_pylist() == sql["path"].tolist()
    assert out.column("tld").to_pylist() == sql["tld"].tolist()
    assert out.column("path_depth").to_pylist() == sql["path_depth"].tolist()


def test_host_profile_counts(ray_session):
    import ray.data

    from docler_ray.stages.urlops import host_profile

    urls = (
        ["https://a.example/x/1"] * 5
        + ["https://b.example/y"] * 3
        + ["https://a.example/x/2/deep"] * 2
    )
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)})).repartition(3)
    out = host_profile(ds).to_pandas().sort_values("host").reset_index(drop=True)
    assert out.host.tolist() == ["a.example", "b.example"]
    assert out.n.tolist() == [7, 3]
    # a: 5 urls at depth 2 + 2 urls at depth 3 = 16; b: 3 at depth 1
    assert out.sum_path_depth.tolist() == [16, 3]
    assert out.tld.tolist() == ["example", "example"]


def test_filter_blocked_hosts(ray_session):
    import ray.data

    from docler_ray.stages.urlops import filter_blocked_hosts

    urls = [
        "https://bad.example/a",
        "https://ok.example/b",
        "https://BAD.example/c",  # case-insensitive host match
        "garbage",  # unparsable -> host '' -> kept
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    out = filter_blocked_hosts(ds, ["bad.example"]).to_pandas()
    assert sorted(out.url.tolist()) == ["garbage", "https://ok.example/b"]


def test_parse_query_params_decode_and_edges(ray_session):
    import pyarrow as pa
    import ray.data

    from docler_ray.stages.urlops import parse_query_params

    urls = [
        "https://h.example/p?a=1&b=two%20words&c=%2Fslash",
        "https://h.example/noquery",
        "https://h.example/p?flag&empty=&a=2#frag=ignored",
        None,
        "https://h.example/p?plus=a+b",  # '+' stays literal (not a form)
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = parse_query_params(ds).to_pandas()
    pairs = set(zip(got["param"], got["value"]))
    assert ("a", "1") in pairs and ("a", "2") in pairs
    assert ("b", "two words") in pairs
    assert ("c", "/slash") in pairs
    assert ("flag", "") in pairs
    assert ("empty", "") in pairs
    assert ("plus", "a+b") in pairs
    # the fragment part never parses as a param
    assert not any(p.startswith("frag") for p in got["param"])


def test_query_param_profile_counts(ray_session):
    import pyarrow as pa
    import ray.data

    from docler_ray.stages.urlops import query_param_profile

    urls = [
        "https://h/p?x=1&y=a",
        "https://h/p?x=2&y=a",
        "https://h/p?x=1",
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = query_param_profile(ds).to_pandas().set_index("param")
    assert got.loc["x"].tolist() == [3, 2, "1"]
    assert got.loc["y"].tolist() == [2, 1, "a"]


# --- RFC 3986 §6 canonicalization -------------------------------------------


@pytest.mark.parametrize(
    "url,want",
    [
        # §6.2.2.1 case normalization: scheme+host only, path case survives
        ("HTTP://Host7.EXAMPLE/A/B", "http://host7.example/A/B"),
        # §6.2.3 default port + §5.2.4 dot segments
        ("http://h.example:80/a/./b/../c", "http://h.example/a/c"),
        ("https://h.example:443/x", "https://h.example/x"),
        ("http://h.example:8080/x", "http://h.example:8080/x"),
        ("http://h.example:/x", "http://h.example/x"),  # empty port drops
        # §6.2.2.2 percent normalization: decode unreserved, uppercase rest
        ("https://h.example/%7euser/%2dx", "https://h.example/~user/-x"),
        ("http://h.example/a%3fb?q=%41%2f", "http://h.example/a%3Fb?q=A%2F"),
        # invalid escapes pass through literally (never corrupt input)
        ("http://h.example/%zz%4", "http://h.example/%zz%4"),
        # fragment strip + empty-path rule
        ("http://h.example/a/b#frag", "http://h.example/a/b"),
        ("http://h.example", "http://h.example/"),
        ("http://h.example?q=1", "http://h.example/?q=1"),
        # leading .. cannot climb above root
        ("http://h.example/../../a", "http://h.example/a"),
        # userinfo kept verbatim, host still lowercases
        ("http://U:p@H.Example/x", "http://U:p@h.example/x"),
        # non-http(s) schemes: no empty-path/default-port rules
        ("ftp://H.example", "ftp://h.example"),
        # non-URLs unchanged
        ("not a url", "not a url"),
        ("", ""),
    ],
)
def test_canonicalize_url(url, want):
    from docler_ray.stages.urlops import canonicalize_url

    assert canonicalize_url(url) == want


def test_canonicalize_idempotent():
    from docler_ray.stages.urlops import canonicalize_url

    urls = [
        "HTTP://Host7.EXAMPLE:80/A/./B/../C%2d?Q=%41#f",
        "https://h.example",
        "http://u@h.example:443/x",
        "garbage",
    ]
    for u in urls:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once


def test_canonicalize_urls_fast_path_and_machine_agree(ray_session):
    """Every row the RE2 suspect sweep skips must already be a fixpoint of
    the Python machine — the vectorized fast path may never change the
    answer, only skip work."""
    import ray.data

    from docler_ray.stages.urlops import canonicalize_url, canonicalize_urls

    urls = [
        "http://h.example/a/c",          # clean: fast path skips it
        "HTTP://H.EXAMPLE/A",            # uppercase
        "http://h.example:80/a",         # default port
        "http://h.example/a/../b",       # dot segments
        "http://h.example/%7ex",         # escape
        "http://h.example",              # empty path
        "http://u@h.example/x",          # userinfo
        "not a url",
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = canonicalize_urls(ds).to_pandas().sort_values("url")["url_canon"].tolist()
    want = sorted(zip(urls, [canonicalize_url(u) for u in urls]))
    assert got == [c for _, c in want]


# --- Hamilton largest-remainder budget allocation ----------------------------


def _budget_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array([h for h, _ in rows], pa.string()),
                "weight": pa.array([w for _, w in rows], pa.int64()),
            }
        )
    )


def test_budget_sums_exactly_and_is_proportional(ray_session):
    from docler_ray.stages.urlops import allocate_crawl_budget

    rows = [("a", 5), ("b", 3), ("c", 2), ("a", 5)]  # a=10, b=3, c=2, W=15
    df = (
        allocate_crawl_budget(_budget_ds(rows), 7)
        .to_pandas()
        .set_index("host")
    )
    # base: a: 70//15=4 rem 10, b: 21//15=1 rem 6, c: 14//15=0 rem 14
    # extra = 7-5 = 2 -> c (rem 14) and a (rem 10) get +1
    assert df["quota"].to_dict() == {"a": 5, "b": 1, "c": 1}
    assert df["quota"].sum() == 7
    assert df["weight"].to_dict() == {"a": 10, "b": 3, "c": 2}


def test_budget_tie_breaks_host_ascending(ray_session):
    from docler_ray.stages.urlops import allocate_crawl_budget

    # equal weights, budget 5 over 3 hosts: base 1 each, rem equal ->
    # extra 2 slots go to the two lexicographically first hosts
    rows = [("x", 1), ("m", 1), ("q", 1)]
    df = (
        allocate_crawl_budget(_budget_ds(rows), 5)
        .to_pandas()
        .set_index("host")
    )
    assert df["quota"].to_dict() == {"m": 2, "q": 2, "x": 1}


def test_budget_empty_and_cap(ray_session):
    import pytest as _pytest

    from docler_ray.stages.urlops import allocate_crawl_budget

    empty = allocate_crawl_budget(_budget_ds([]), 10)
    assert empty.count() == 0
    assert empty.schema().names == ["host", "weight", "quota"]
    with _pytest.raises(NotImplementedError, match="driver finish capped"):
        allocate_crawl_budget(_budget_ds([("a", 1), ("b", 1)]), 3, host_cap=1)


# --- URL-pattern cross-lingual alignment -------------------------------------


def test_aligned_url_pairs_semantics(ray_session):
    import ray.data

    from docler_ray.stages.urlops import aligned_url_pairs

    rows = [
        (0, "en", "https://s.example/en/a/p1"),
        (1, "fr", "https://s.example/fr/a/p1"),  # aligns with 0
        (2, "en", "https://s.example/en/a/p1"),  # same lang as 0: no pair 0-2
        (3, "de", "https://other.example/de/a/p1"),  # different host
        (4, "en", "https://s.example/en"),  # no tail after lang segment
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "url": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    df = aligned_url_pairs(ds).to_pandas()
    got = {(int(r.a), int(r.b)) for r in df.itertuples()}
    assert got == {(0, 1), (1, 2)}  # cross-lang only, a < b


def test_aligned_url_pairs_group_cap(ray_session):
    import ray.data

    from docler_ray.stages.urlops import aligned_url_pairs

    # 5 members of one template group with cap 4: dropped as boilerplate
    rows = [
        (i, "en" if i % 2 else "fr", "https://s.example/x/a/p") for i in range(5)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "url": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    assert aligned_url_pairs(ds, group_cap=4).count() == 0


def test_trap_suspect_params(ray_session):
    import ray.data

    from docler_ray.stages.urlops import trap_suspect_params

    # sid: 60 sightings all distinct -> trap; page: 60 sightings 10 values
    # -> structural; low-volume distinct param stays under min_n
    urls = [f"https://h.example/p?sid=s{i}&page={i % 10}" for i in range(60)]
    urls += [f"https://h.example/p?rare=r{i}" for i in range(5)]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    df = trap_suspect_params(ds, min_n=50).to_pandas()
    assert [(r.host, r.param, int(r.n), int(r.n_distinct)) for r in df.itertuples()] == [
        ("h.example", "sid", 60, 60)
    ]


def test_bitext_number_overlap(ray_session):
    import ray.data

    from docler_ray.stages.urlops import bitext_number_overlap

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "hello 42 world 7 2026",
                        "bonjour 42 monde 7 1999",
                        "unrelated 555",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    pairs = ray.data.from_arrow(
        pa.table(
            {"a": pa.array([0, 0], pa.int64()), "b": pa.array([1, 2], pa.int64())}
        )
    )
    df = (
        bitext_number_overlap(docs, pairs)
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    assert df.loc[0].tolist() == [0, 1, 2, 3, 3]  # shares 42 and 7
    assert df.loc[1].tolist() == [0, 2, 0, 3, 1]  # no shared numbers


def test_bitext_empty_pairs(ray_session):
    import ray.data

    from docler_ray.stages.urlops import bitext_number_overlap

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["x 1"], pa.string()),
            }
        )
    )
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    out = bitext_number_overlap(docs, pairs)
    assert out.count() == 0


def test_crawl_schedule_per_host_delays(ray_session):
    import ray.data

    from docler_ray.stages.urlops import crawl_schedule_per_host

    urls = [
        "https://fast.example/a",
        "https://fast.example/b",
        "https://slow.example/c",
        "https://slow.example/d",
        "https://other.example/e",  # not in the map: default delay
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(5)), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )
    )
    df = (
        crawl_schedule_per_host(
            ds, {"fast.example": 500, "slow.example": 10_000},
            default_delay_ms=1234,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "fetch_offset_ms"] == 500   # 2nd on fast
    assert df.loc[3, "fetch_offset_ms"] == 10_000  # 2nd on slow
    assert df.loc[4, "fetch_offset_ms"] == 0     # 1st on other
    assert df["seq"].tolist() == [1, 2, 1, 2, 1]


def test_decode_idn_hosts(ray_session):
    import ray.data

    from docler_ray.stages.urlops import decode_idn_hosts

    hosts = [
        "xn--bcher-kva.example",
        "xn--fiq228c.cn",
        "plain.example",
        "xn--zzzzzz.bad",  # malformed: pass-through
        "",
    ]
    ds = ray.data.from_arrow(pa.table({"host": pa.array(hosts, pa.string())}))
    df = decode_idn_hosts(ds).to_pandas()
    got = dict(zip(df["host"], df["host_unicode"]))
    assert got["xn--bcher-kva.example"] == "bücher.example"
    assert got["xn--fiq228c.cn"] == "中文.cn"
    assert got["plain.example"] == "plain.example"
    assert got["xn--zzzzzz.bad"] == "xn--zzzzzz.bad"
    assert got[""] == ""
