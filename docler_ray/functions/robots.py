"""robots.txt parsing and longest-match evaluation (RFC 9309 subset).

The crawl-policy gate between a frontier and the fetcher: parse each
host's robots.txt into (prefix, allow) rules for one user-agent group,
then decide every URL by the RFC's longest-match rule — the most specific
matching rule wins; on an allow/disallow TIE at equal length, allow wins;
no matching rule means allowed.

Scope: prefix rules plus the ``$`` end anchor and single ``*`` wildcard of
RFC 9309 §2.2.3 are accepted by the parser, but evaluation implements the
prefix + ``$``-anchor subset (a ``*`` pattern's specificity is its literal
prefix length, matching Google's documented tie-breaking); percent-decoding
is NOT applied (paths compare byte-wise, as crawlers do for ASCII rules).

No reference counterpart (docler has no crawl tier); parser grammar from
RFC 9309 and the original 1994 REP draft.
"""

from __future__ import annotations

import fnmatch
import re

_RULE_RE = re.compile(r"^(user-agent|allow|disallow)\s*:\s*(.*?)\s*$", re.I)
# the directive superset: rules plus the group-independent/auxiliary fields
_DIRECTIVE_RE = re.compile(
    r"^(user-agent|allow|disallow|sitemap|crawl-delay)\s*:\s*(.*?)\s*$", re.I
)


def parse_robots(text: str, *, user_agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt text into [(pattern, is_allow), ...] for the group
    matching ``user_agent`` (exact token or the ``*`` group; the last
    matching group wins, per RFC 9309 §2.2.1 merge-then-last semantics
    simplified to last-group-wins for distinct groups)."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    in_group_header = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _RULE_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if not in_group_header:
                current = []
                in_group_header = True
            current.append(value.lower())
            for ua in (value.lower(),):
                groups.setdefault(ua, [])
        else:
            in_group_header = False
            if not current:
                continue  # rule before any user-agent line: ignored
            if value == "" and field == "disallow":
                rule = None  # "Disallow:" empty = allow all (no rule)
            else:
                rule = (value, field == "allow")
            if rule is not None:
                for ua in current:
                    groups.setdefault(ua, []).append(rule)
    ua = user_agent.lower()
    if ua in groups:
        return groups[ua]
    return groups.get("*", [])


def _matches(path: str, pattern: str) -> bool:
    if pattern.endswith("$"):
        body = pattern[:-1]
        if "*" in body:
            return fnmatch.fnmatchcase(path, body)
        return path == body
    if "*" in pattern:
        return fnmatch.fnmatchcase(path, pattern + "*")
    return path.startswith(pattern)


def robots_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """RFC 9309 §2.2.2 longest-match decision: the most specific matching
    rule (longest literal prefix) wins; equal-length tie -> allow; no
    match -> allowed."""
    best_len = -1
    best_allow = True
    for pattern, is_allow in rules:
        if not _matches(path, pattern):
            continue
        spec = len(pattern.split("*", 1)[0].rstrip("$"))
        if spec > best_len or (spec == best_len and is_allow and not best_allow):
            best_len = spec
            best_allow = is_allow
    return best_allow


def robots_allowed_batch(paths, rules: list[tuple[str, bool]]):
    """Vectorized longest-match decision over a numpy array of paths —
    sequential only in the (tiny) rule list, never in rows."""
    import numpy as np

    n = len(paths)
    best_len = np.full(n, -1, dtype=np.int64)
    best_allow = np.ones(n, dtype=bool)
    for pattern, is_allow in rules:
        if pattern.endswith("$") and "*" not in pattern:
            m = paths == pattern[:-1]
        elif "*" in pattern:
            m = np.array([_matches(p, pattern) for p in paths], dtype=bool)
        else:
            m = np.char.startswith(paths.astype(str), pattern)
        spec = len(pattern.split("*", 1)[0].rstrip("$"))
        better = m & (spec > best_len)
        tie_allow = m & (spec == best_len) & is_allow & ~best_allow
        upd = better | tie_allow
        best_len[better] = spec
        best_allow[upd] = is_allow
    return best_allow


def parse_robots_directives(text: str, *, user_agent: str = "*") -> dict:
    """Non-rule robots.txt directives the frontier consumes beyond the
    allow/disallow groups: ``Sitemap:`` lines (RFC 9309 §2.3-adjacent,
    GROUP-INDEPENDENT per the spec — collected from the whole file in
    order) and ``Crawl-delay:`` (non-standard but ubiquitous; scoped to
    the matching user-agent group like the rules, '*' fallback; fractional
    seconds accepted, unparseable values ignored). Returns {sitemaps:
    [urls...], crawl_delay: float | None}."""
    sitemaps: list[str] = []
    delays: dict[str, float] = {}
    current: list[str] = []
    in_group_header = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _DIRECTIVE_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2)
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not in_group_header:
                current = []
                in_group_header = True
            current.append(value.lower())
        else:
            in_group_header = False
            if field == "crawl-delay" and current:
                try:
                    d = float(value)
                except ValueError:
                    continue
                for ua in current:
                    delays.setdefault(ua, d)
    ua = user_agent.lower()
    delay = delays.get(ua, delays.get("*"))
    return {"sitemaps": sitemaps, "crawl_delay": delay}
