"""Deterministic, trafilatura-style HTML -> main-text extraction.

The reference has no HTML stage (it reads plain text files,
``main.py:282-284``); the north star adds a deterministic extractor
whose output is byte-identical per ``url`` across runs and parallelism
levels. This module provides both directions:

- ``extract_text(html)`` — stdlib ``html.parser`` based main-content
  extraction: drops ``script/style/nav/header/footer/aside/template``
  subtrees and comments, collects text of block-level elements, emits
  one paragraph per block joined by ``"\\n\\n"``, entities unescaped.
  Pure function of the bytes — no randomness, no wall clock, no
  library-version drift.
- ``wrap_html(text, title)`` — the exact inverse used by fixtures and
  the pages synthesizer: wraps paragraphs (split on ``"\\n\\n"``) in
  ``<p>`` inside ``<main>``, with boilerplate ``<nav>``/``<footer>``
  the extractor must discard. Round trip is byte-identical:
  ``extract_text(wrap_html(t)) == t`` for any text whose paragraphs
  are non-empty after stripping.

EXTRACTOR_VERSION is embedded in lineage metadata; bump it if the
algorithm changes so downstream caches invalidate.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

EXTRACTOR_VERSION = "1"

# Subtrees that never contribute to main text.
_DROP_TAGS = frozenset(
    {"script", "style", "nav", "header", "footer", "aside", "template", "noscript", "svg", "head"}
)
# Elements that delimit paragraphs.
_BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "li",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "blockquote",
        "pre",
        "td",
        "th",
        "tr",
        "br",
    }
)


class _MainTextParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.blocks: list[str] = []
        self.current: list[str] = []

    def _flush(self) -> None:
        if self.current:
            block = "".join(self.current)
            if block.strip():
                self.blocks.append(block)
            self.current = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_TAGS:
            self.drop_depth += 1
            return
        if self.drop_depth == 0 and tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if self.drop_depth == 0 and tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self.drop_depth == 0:
            self.current.append(data)


def extract_text(html: str | bytes) -> str:
    """Deterministic main-content extraction; returns ``""`` for
    pages with no block text."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _MainTextParser()
    parser.feed(html)
    parser.close()
    parser._flush()
    return "\n\n".join(b.strip() for b in parser.blocks if b.strip())


def wrap_html(text: str, title: str = "page", links: tuple[str, ...] = ()) -> bytes:
    """Deterministic inverse of ``extract_text`` for fixture pages.
    ``links`` render as anchors inside the boilerplate ``<nav>`` — a
    DROPPED subtree, so they are visible to :func:`extract_links` but
    can never perturb the extract_text round-trip invariant."""
    paragraphs = [p for p in text.split("\n\n") if p.strip()]
    body = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in paragraphs)
    nav_links = "".join(f'<a href="{u}">l</a>' for u in links)
    doc = (
        "<html><head><title>"
        + _html.escape(title, quote=False)
        + '</title><script>var x=1;</script></head><body>'
        + "<nav>BOILERPLATE NAV"
        + nav_links
        + "</nav>"
        + "<main>"
        + body
        + "</main>"
        + "<footer>BOILERPLATE FOOTER</footer>"
        + "</body></html>"
    )
    return doc.encode("utf-8")


_HREF_RE = None


def extract_links(html: str | bytes) -> list[str]:
    """All ``href="..."`` targets of a page, in document order — the
    web-graph edge extractor (regex, not the DOM parser: hrefs inside
    dropped subtrees like ``<nav>`` ARE links even though their text
    is boilerplate)."""
    global _HREF_RE
    if _HREF_RE is None:
        import re

        _HREF_RE = re.compile(r'href="([^"]*)"')
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _HREF_RE.findall(html)
