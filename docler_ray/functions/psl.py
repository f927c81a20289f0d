"""Registered-domain (eTLD+1) extraction via public-suffix rules.

Implements the publicsuffix.org list ALGORITHM (the spec at
https://publicsuffix.org/list/ — match rules right-to-left against host
labels, '*' matches exactly one label, an exception rule '!' beats every
wildcard and names one label MORE than the suffix it carves out, otherwise
the longest match wins, and the implicit default rule is '*'). The rule
FILE shipped here is a small deterministic subset — the full list is a
runtime input (a ~15k-line public text file fetched out-of-band); swap it
in via ``parse_psl_rules`` without touching the algorithm.

Host-graph grouping by registrable domain is the canonical crawl-corpus
rollup: 'a.example.co.uk' and 'b.example.co.uk' are one owner, and
per-owner quotas/budgets key on exactly this value.
"""

from __future__ import annotations

# Deterministic subset of the public-suffix list: enough shape diversity
# (multi-label suffixes, a wildcard, its exception, a private-domain-style
# entry) to exercise every branch of the algorithm.
DEFAULT_PSL = """\
// mini public-suffix rule set (format: publicsuffix.org/list/)
com
org
net
example
uk
co.uk
ac.uk
jp
io
github.io
// Cook Islands-style wildcard + exception
ck
*.ck
!www.ck
"""


def parse_psl_rules(text: str) -> dict[tuple[str, ...], int]:
    """Rule table: reversed label tuple -> kind (0 normal, 1 exception).

    Comment ('//') and blank lines skipped; rules lowercased. Wildcard
    labels stay as '*' and match any single label during lookup.
    """
    rules: dict[tuple[str, ...], int] = {}
    for line in text.splitlines():
        line = line.strip().lower()
        if not line or line.startswith("//"):
            continue
        kind = 0
        if line.startswith("!"):
            kind = 1
            line = line[1:]
        rules[tuple(reversed(line.split(".")))] = kind
    return rules


_DEFAULT_RULES = parse_psl_rules(DEFAULT_PSL)


def public_suffix(host: str, rules: dict | None = None) -> str:
    """The winning public suffix of ``host`` under the spec's match rules
    (implicit default '*': an unlisted TLD is its own suffix)."""
    rules = _DEFAULT_RULES if rules is None else rules
    labels = host.lower().rstrip(".").split(".")
    rev = list(reversed(labels))
    n = len(rev)
    best = 1  # the implicit '*' default rule
    exception = 0
    for length in range(1, n + 1):
        # try the exact prefix and every single-'*' variant of it: the
        # list's wildcards are single-label, so testing the literal tuple
        # and the tuple with its LAST (leftmost in host order) label
        # wildcarded covers all list shapes
        cand = tuple(rev[:length])
        kind = rules.get(cand)
        if kind is None and length > 1:
            kind = rules.get(cand[:-1] + ("*",))
        if kind == 1:
            # exception: the suffix is one label SHORTER than the rule
            exception = length - 1
            break
        if kind == 0 and length > best:
            best = length
    win = exception if exception else best
    return ".".join(labels[n - win :])


def registered_domain(host: str, rules: dict | None = None) -> str:
    """eTLD+1: the public suffix plus one label; '' when the host IS a
    public suffix (nothing is registrable) or is empty."""
    host = host.lower().rstrip(".")
    if not host:
        return ""
    suffix = public_suffix(host, rules)
    labels = host.split(".")
    ns = suffix.count(".") + 1
    if len(labels) <= ns:
        return ""
    return ".".join(labels[len(labels) - ns - 1 :])
