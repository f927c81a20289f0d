"""eTLD+1 via the publicsuffix.org algorithm: every rule shape (multi-label,
wildcard, exception, implicit default), normalization, and the stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

from docler_ray.functions.psl import (
    parse_psl_rules,
    public_suffix,
    registered_domain,
)


@pytest.mark.parametrize(
    "host,want",
    [
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", ""),  # a bare public suffix is not registrable
        ("x.co.uk", "x.co.uk"),  # multi-label suffix
        ("a.x.co.uk", "x.co.uk"),
        ("x.uk", "x.uk"),  # 'uk' itself is also a listed suffix
        ("sub.blog.github.io", "blog.github.io"),  # private-style entry
        ("github.io", ""),
        ("x.y.ck", "x.y.ck"),  # *.ck wildcard: y.ck is the suffix
        ("a.x.y.ck", "x.y.ck"),
        ("www.ck", "www.ck"),  # !www.ck exception: suffix is just ck
        ("a.www.ck", "www.ck"),
        ("ck", ""),
        ("unknowntld", ""),  # implicit '*' default rule
        ("foo.unknowntld", "foo.unknowntld"),
        ("a.foo.unknowntld", "foo.unknowntld"),
        ("HOST.Example.COM.", "example.com"),  # case + trailing dot
        ("", ""),
    ],
)
def test_registered_domain(host, want):
    assert registered_domain(host) == want


def test_public_suffix_shapes():
    assert public_suffix("a.b.co.uk") == "co.uk"
    assert public_suffix("a.y.ck") == "y.ck"
    assert public_suffix("a.www.ck") == "ck"  # exception carves www.ck out
    assert public_suffix("x.unlisted") == "unlisted"


def test_custom_rules_swap():
    rules = parse_psl_rules("// custom\nfoo\nbar.foo\n")
    assert registered_domain("a.b.bar.foo", rules) == "b.bar.foo"
    assert registered_domain("a.foo", rules) == "a.foo"
    # 'com' is NOT in the custom table -> implicit default
    assert registered_domain("a.b.com", rules) == "b.com"


def test_registered_domains_stage(ray_session):
    import ray.data

    from docler_ray.stages.urlops import registered_domains

    hosts = ["a.example.com", "b.x.co.uk", "com", "a.example.com"]
    ds = ray.data.from_arrow(pa.table({"host": pa.array(hosts, pa.string())}))
    df = registered_domains(ds).to_pandas()
    assert dict(zip(df["host"], df["reg_domain"])) == {
        "a.example.com": "example.com",
        "b.x.co.uk": "x.co.uk",
        "com": "",
    }
