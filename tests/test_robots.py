"""RFC 9309 robots.txt parser + longest-match evaluator unit tests."""

from __future__ import annotations

import numpy as np

from docler_ray.functions.robots import (
    parse_robots,
    robots_allowed,
    robots_allowed_batch,
)

RFC_SAMPLE = """\
# comment line
User-agent: bot-x
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/public  # carve-out
Disallow: /tmp/$
Disallow:
"""


def test_parse_selects_star_group():
    rules = parse_robots(RFC_SAMPLE)
    assert ("/", False) not in rules  # bot-x group not merged into *
    assert ("/private", False) in rules
    assert ("/private/public", True) in rules
    assert ("/tmp/$", False) in rules


def test_parse_specific_agent_group():
    rules = parse_robots(RFC_SAMPLE, user_agent="bot-x")
    assert rules == [("/", False)]


def test_parse_unknown_agent_falls_back_to_star():
    assert parse_robots(RFC_SAMPLE, user_agent="other") == parse_robots(RFC_SAMPLE)


def test_longest_match_precedence():
    rules = parse_robots(RFC_SAMPLE)
    assert not robots_allowed("/private/a", rules)  # disallow /private
    assert robots_allowed("/private/public/x", rules)  # longer allow wins
    assert robots_allowed("/other", rules)  # no match -> allowed


def test_dollar_anchor_exact():
    rules = parse_robots(RFC_SAMPLE)
    assert not robots_allowed("/tmp/", rules)  # exact anchored match
    assert robots_allowed("/tmp/x", rules)  # anchor does NOT prefix-match


def test_empty_disallow_is_no_rule():
    rules = parse_robots("User-agent: *\nDisallow:\n")
    assert rules == []
    assert robots_allowed("/anything", rules)


def test_tie_at_equal_length_allows():
    rules = [("/a", False), ("/a", True)]
    assert robots_allowed("/a/x", rules)


def test_wildcard_specificity_is_literal_prefix():
    rules = [("/a*", False), ("/a/b", True)]
    assert not robots_allowed("/a/c", rules)  # only the wildcard matches
    assert robots_allowed("/a/b/c", rules)  # /a/b (spec 4) beats /a* (spec 2)


def test_multi_agent_header_shares_rules():
    text = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(text, user_agent="a") == [("/x", False)]
    assert parse_robots(text, user_agent="b") == [("/x", False)]


def test_batch_matches_scalar():
    rules = parse_robots(RFC_SAMPLE)
    paths = np.array(
        ["/private/a", "/private/public/x", "/other", "/tmp/", "/tmp/x"],
        dtype=object,
    )
    got = robots_allowed_batch(paths, rules)
    want = [robots_allowed(p, rules) for p in paths]
    assert got.tolist() == want


# --- auxiliary directives (Sitemap / Crawl-delay) ----------------------------


def test_directives_sitemaps_group_independent():
    from docler_ray.functions.robots import parse_robots_directives

    t = (
        "Sitemap: https://h/s1.xml\n"
        "User-agent: bot-x\nCrawl-delay: 10\nDisallow: /\n"
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /tmp\n"
        "Sitemap: https://h/s2.xml\nCrawl-delay: bogus\n"
    )
    d = parse_robots_directives(t)
    # sitemaps collected file-wide in order, regardless of group position
    assert d["sitemaps"] == ["https://h/s1.xml", "https://h/s2.xml"]
    assert d["crawl_delay"] == 2.5  # the '*' group; bogus value ignored
    assert parse_robots_directives(t, user_agent="bot-x")["crawl_delay"] == 10.0


def test_directives_fallbacks():
    from docler_ray.functions.robots import parse_robots_directives

    # UA without its own delay falls back to '*'
    t = "User-agent: *\nCrawl-delay: 3\nDisallow: /x\n"
    assert parse_robots_directives(t, user_agent="someone")["crawl_delay"] == 3.0
    assert parse_robots_directives("")["sitemaps"] == []
    assert parse_robots_directives("")["crawl_delay"] is None
    # delay before any user-agent line: ignored
    assert parse_robots_directives("Crawl-delay: 9\n")["crawl_delay"] is None
