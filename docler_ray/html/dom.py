"""Minimal DOM built on the stdlib ``html.parser`` tokenizer.

No lxml / bs4 / html5lib in this environment (SURVEY.md constraints), so the
tree is hand-rolled: enough structure for density scoring and markdown
serialization, tolerant of unclosed tags and stray end tags.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Tags whose text content is never document text.
RAW_SKIP_ELEMENTS = frozenset({"script", "style", "noscript", "template", "svg"})

# Elements that implicitly close an open <p> (subset of the HTML5 rules —
# enough for real-world article markup).
_P_CLOSERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "header", "hr", "main", "nav", "ol", "p", "pre", "section", "table", "ul",
    }
)

# Elements whose open tag implicitly closes a same-name ancestor (li in li, etc.)
_SELF_NESTING_CLOSERS = frozenset({"li", "tr", "td", "th", "option", "dd", "dt"})

BLOCK_ELEMENTS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "div", "dl", "dd",
        "dt", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
        "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main", "nav",
        "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
        "thead", "tr", "ul",
    }
)


_NO_ATTRS: dict = {}  # shared read-only attrs for attr-less nodes


class Node:
    """One DOM node. ``tag is None`` => text node (``text`` holds the data)."""

    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(
        self,
        tag: str | None,
        attrs: dict[str, str] | None = None,
        text: str = "",
    ) -> None:
        self.tag = tag
        # attribute dicts are never mutated after construction, so attr-less
        # nodes (every text node) share one empty dict instead of allocating
        self.attrs: dict[str, str] = attrs if attrs else _NO_ATTRS
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text

    def append(self, child: Node) -> None:
        child.parent = self
        self.children.append(child)

    def is_text(self) -> bool:
        return self.tag is None

    def iter(self):
        """Pre-order traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def find_all(self, *tags: str) -> list[Node]:
        wanted = set(tags)
        return [n for n in self.iter() if n.tag in wanted]

    def get_text(self) -> str:
        """Concatenated raw text of the subtree (no normalization)."""
        parts: list[str] = []
        for n in self.iter():
            if n.is_text():
                parts.append(n.text)
        return "".join(parts)

    def attr(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.is_text():
            return f"Text({self.text[:30]!r})"
        return f"<{self.tag} children={len(self.children)}>"


# Open-element depth cap: beyond this, new elements attach as siblings
# instead of nesting deeper. Bounds every downstream recursion (pruning,
# serialization) so an adversarial page can't blow the stack — per-row error
# capture must never come from RecursionError in a hot stage.
MAX_DOM_DEPTH = 256


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack: list[Node] = [self.root]
        self._skip_depth = 0  # inside script/style/etc.

    # -- helpers ----------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _implicit_close(self, tag: str) -> None:
        if tag in _P_CLOSERS:
            # close an open <p> anywhere above (but stop at block boundaries)
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    del self.stack[i:]
                    break
                if t in BLOCK_ELEMENTS and t != "p":
                    break
        if tag in _SELF_NESTING_CLOSERS:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == tag:
                    del self.stack[i:]
                    break
                if t in ("ol", "ul", "table", "tbody", "thead", "tr", "dl"):
                    break

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            if tag in RAW_SKIP_ELEMENTS and tag not in VOID_ELEMENTS:
                self._skip_depth += 1
            return
        if tag in RAW_SKIP_ELEMENTS:
            self._skip_depth = 1
            return
        self._implicit_close(tag)
        node = Node(tag, {k: (v or "") for k, v in attrs})
        self._top().append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < MAX_DOM_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._skip_depth:
            return
        if tag in RAW_SKIP_ELEMENTS:
            return
        node = Node(tag, {k: (v or "") for k, v in attrs})
        self._top().append(node)

    def handle_endtag(self, tag: str) -> None:
        if self._skip_depth:
            if tag in RAW_SKIP_ELEMENTS:
                self._skip_depth -= 1
            return
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        top = self._top()
        if top.children and top.children[-1].is_text():
            top.children[-1].text += data
        else:
            top.append(Node(None, text=data))


def parse_html(html: str, engine: str = "fast") -> Node:
    """Parse an HTML string into a Node tree rooted at ``#document``.

    ``engine="fast"`` uses the regex scanner (docler_ray.html.fast_tokenizer,
    ~3x the stdlib tokenizer's throughput; identical tree semantics, golden
    pinned); on any scanner exception the stdlib path rebuilds from scratch.
    """
    if engine == "fast":
        from docler_ray.html.fast_tokenizer import fast_feed

        builder = _TreeBuilder()
        try:
            fast_feed(builder, html)
        except Exception:
            pass
        else:
            return builder.root
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is already very tolerant; on a genuine tokenizer blowup
        # return whatever partial tree was built (per-row error capture happens
        # one level up, not via task failure — SURVEY.md §7.4).
        pass
    return builder.root
