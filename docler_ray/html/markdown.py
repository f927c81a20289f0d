"""DOM subtree -> markdown serializer (the frozen output conventions).

Every byte this module emits is part of the engine's golden contract
(byte-identical extracted text per url — BASELINE.json north rule), so all
conventions live here and only here:

- blocks joined with a double newline (the reference's ``"\\n\\n".join``
  convention, /root/reference/src/docler/converters/mistral_provider/provider.py:135);
- image references ``![img-i](img-i.EXT)`` with sequential ids per document
  (convention from /root/reference/src/docler/converters/azure_provider/utils.py:15-19);
- inline whitespace collapsed to single spaces; ``<br>`` is the only inline
  line break; ``<pre>`` content is preserved verbatim.
"""

from __future__ import annotations

import re

from docler_ray.html.dom import Node
from docler_ray.markers import create_image_reference

_WS_RE = re.compile(r"[ \t\r\f\v\n]+")
_BR_SENTINEL = "\x00"

_IMAGE_EXTS = frozenset({".png", ".jpg", ".jpeg", ".gif", ".webp", ".bmp", ".tiff", ".svg"})

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

_CONTAINER_TAGS = frozenset(
    {
        "#document", "html", "body", "div", "section", "article", "main",
        "span", "center", "details", "summary", "figure", "fieldset",
    }
)


class _Serializer:
    def __init__(self) -> None:
        self.images: list[dict] = []
        self._img_counter = 0

    # -- images -----------------------------------------------------------
    def _register_image(self, node: Node) -> str:
        src = node.attr("src")
        ext = ".png"
        path = src.split("?", 1)[0].split("#", 1)[0]
        dot = path.rfind(".")
        if dot >= 0 and path[dot:].lower() in _IMAGE_EXTS:
            ext = path[dot:].lower()
        image_id = f"img-{self._img_counter}"
        filename = f"{image_id}{ext}"
        self._img_counter += 1
        self.images.append(
            {
                "id": image_id,
                "filename": filename,
                "mime_type": f"image/{ext.lstrip('.').replace('jpg', 'jpeg')}",
                "content": b"",
                "src": src,
                "alt": node.attr("alt"),
            }
        )
        return create_image_reference(image_id, filename)

    # -- inline -----------------------------------------------------------
    def render_inline(self, node: Node) -> str:
        parts: list[str] = []
        for child in node.children:
            if child.is_text():
                parts.append(child.text)
                continue
            tag = child.tag
            if tag == "br":
                parts.append(_BR_SENTINEL)
            elif tag == "img":
                parts.append(" " + self._register_image(child) + " ")
            elif tag == "a":
                inner = self._collapse(self.render_inline(child))
                href = child.attr("href")
                if inner and href:
                    parts.append(f"[{inner}]({href})")
                elif inner:
                    parts.append(inner)
            elif tag in ("strong", "b"):
                inner = self._collapse(self.render_inline(child))
                parts.append(f"**{inner}**" if inner else "")
            elif tag in ("em", "i"):
                inner = self._collapse(self.render_inline(child))
                parts.append(f"*{inner}*" if inner else "")
            elif tag in ("code", "kbd", "samp"):
                inner = self._collapse(self.render_inline(child))
                parts.append(f"`{inner}`" if inner else "")
            elif tag in ("sub", "sup", "u", "s", "small", "mark", "abbr",
                         "span", "time", "cite", "q", "var", "label"):
                parts.append(self.render_inline(child))
            else:
                # Unknown / block tag in inline position: render its inline text.
                parts.append(self.render_inline(child))
        return "".join(parts)

    @staticmethod
    def _collapse(text: str) -> str:
        # str.split() collapses any unicode whitespace run at C speed; the
        # BR sentinel (\x00) is not whitespace so it survives the collapse.
        collapsed = " ".join(text.split())
        return collapsed.replace(_BR_SENTINEL, "\n").strip()

    def inline_block(self, node: Node) -> str:
        return self._collapse(self.render_inline(node))

    # -- blocks -----------------------------------------------------------
    def render_blocks(self, node: Node) -> list[str]:
        """Render ``node``'s children as a list of markdown blocks."""
        blocks: list[str] = []
        pending_inline: list[str] = []

        def flush() -> None:
            if pending_inline:
                text = self._collapse("".join(pending_inline))
                if text:
                    blocks.append(text)
                pending_inline.clear()

        for child in node.children:
            if child.is_text():
                pending_inline.append(child.text)
                continue
            tag = child.tag
            if tag in HEADING_TAGS:
                flush()
                text = self.inline_block(child)
                if text:
                    blocks.append(f"{'#' * HEADING_TAGS[tag]} {text}")
            elif tag == "p":
                flush()
                text = self.inline_block(child)
                if text:
                    blocks.append(text)
            elif tag in ("ul", "ol"):
                flush()
                rendered = self.render_list(child, indent=0)
                if rendered:
                    blocks.append(rendered)
            elif tag == "blockquote":
                flush()
                inner = "\n\n".join(self.render_blocks(child))
                if inner:
                    blocks.append("\n".join(f"> {line}" if line else ">" for line in inner.split("\n")))
            elif tag == "pre":
                flush()
                raw = child.get_text().strip("\n")
                blocks.append(f"```\n{raw}\n```")
            elif tag == "hr":
                flush()
                blocks.append("---")
            elif tag == "table":
                flush()
                rendered = self.render_table(child)
                if rendered:
                    blocks.append(rendered)
            elif tag == "img":
                flush()
                blocks.append(self._register_image(child).strip())
            elif tag == "figure":
                flush()
                fig_blocks: list[str] = []
                for sub in child.children:
                    if sub.tag == "img":
                        fig_blocks.append(self._register_image(sub).strip())
                    elif sub.tag == "figcaption":
                        cap = self.inline_block(sub)
                        if cap:
                            fig_blocks.append(f"*{cap}*")
                    elif sub.tag is not None:
                        fig_blocks.extend(self.render_blocks_of(sub))
                blocks.extend(fig_blocks)
            elif tag in ("dl",):
                flush()
                lines: list[str] = []
                for sub in child.children:
                    if sub.tag == "dt":
                        text = self.inline_block(sub)
                        if text:
                            lines.append(f"**{text}**")
                    elif sub.tag == "dd":
                        text = self.inline_block(sub)
                        if text:
                            lines.append(f": {text}")
                if lines:
                    blocks.append("\n".join(lines))
            elif tag in _CONTAINER_TAGS:
                flush()
                blocks.extend(self.render_blocks(child))
            else:
                # Inline-level tag at block position: accumulate as inline text.
                pending_inline.append(self._render_inline_tag(child))
        flush()
        return blocks

    def render_blocks_of(self, node: Node) -> list[str]:
        return self.render_blocks(node)

    def _render_inline_tag(self, child: Node) -> str:
        wrapper = Node("#wrap")
        wrapper.children = [child]
        return self.render_inline(wrapper)

    # -- lists ------------------------------------------------------------
    def render_list(self, node: Node, indent: int) -> str:
        lines: list[str] = []
        ordered = node.tag == "ol"
        idx = 0
        prefix_pad = "  " * indent
        for child in node.children:
            if child.tag != "li":
                continue
            idx += 1
            sub_lists = [c for c in child.children if c.tag in ("ul", "ol")]
            own = Node("li")
            own.children = [c for c in child.children if c.tag not in ("ul", "ol")]
            text = self.inline_block(own)
            bullet = f"{idx}." if ordered else "-"
            if text:
                lines.append(f"{prefix_pad}{bullet} {text}")
            for sub in sub_lists:
                rendered = self.render_list(sub, indent + 1)
                if rendered:
                    lines.append(rendered)
        return "\n".join(lines)

    # -- tables -----------------------------------------------------------
    def render_table(self, node: Node) -> str:
        rows: list[list[str]] = []
        header: list[str] | None = None
        for tr in node.find_all("tr"):
            cells = [c for c in tr.children if c.tag in ("td", "th")]
            if not cells:
                continue
            rendered = [self.inline_block(c).replace("|", "\\|").replace("\n", " ") for c in cells]
            if header is None and all(c.tag == "th" for c in cells):
                header = rendered
            else:
                rows.append(rendered)
        if header is None and not rows:
            return ""
        return self._format_table(header, rows)

    @staticmethod
    def _format_table(header: list[str] | None, rows: list[list[str]]) -> str:
        ncols = 0
        if header:
            ncols = len(header)
        for r in rows:
            ncols = max(ncols, len(r))
        if ncols == 0:
            return ""
        if header is None:
            header = [""] * ncols
        header = header + [""] * (ncols - len(header))
        lines = ["| " + " | ".join(header) + " |"]
        lines.append("|" + "|".join([" --- "] * ncols) + "|")
        for r in rows:
            r = r + [""] * (ncols - len(r))
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)


def serialize_to_markdown(node: Node) -> tuple[str, list[dict]]:
    """Serialize a DOM subtree to markdown.

    Returns (markdown, images) where images is a list of dicts matching the
    ``images`` struct column of the docs table (docler_ray.models.IMAGE_STRUCT)
    plus transient ``src``/``alt`` keys consumed by downstream stages.
    """
    ser = _Serializer()
    blocks = ser.render_blocks(node)
    return "\n\n".join(blocks), ser.images
