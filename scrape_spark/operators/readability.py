"""Readability-style main-content scoring — the extraction fallback cascade
(SURVEY.md §2.9).

The reference runs go-trafilatura with a readability/domdistiller fallback
(fetch/trafilatura/fetcher.go:13-14, EnableFallback): when the fast path
can't locate the article container, a DOM-scoring pass picks the densest
content block. This module is the engine's equivalent behind the same
``extract_pages`` seam: pages WITHOUT an ``<article>`` element get a
text-density / link-density scoring pass (the Arc90-readability shape,
public algorithm) over a lightweight stdlib-``html.parser`` DOM:

- every ``<p>`` contributes ``1 + commas + min(len/100, 3)`` to its parent
  and half to its grandparent (content accrues to containers);
- candidate containers are then ranked by ``score × (1 − link_density)``
  (nav-heavy blocks — high link-text ratio — are punished);
- boilerplate subtrees (script/style/nav/aside/header/footer/form) are
  dropped outright, mirroring the fast path's single-pass strip;
- ties break on document order → fully deterministic, spec-versioned via
  the extraction goldens.

This is the slow path by design: it runs ONLY on the minority of rows with
no ``<article>`` (the fast vectorized regex path handles the rest), exactly
how the reference pays trafilatura's fallback only on fast-path misses.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# subtrees dropped entirely (matches extract_batch's boilerplate alternation)
_SKIP = {"script", "style", "noscript", "nav", "aside", "footer", "header", "form"}
# closing these emits a newline (matches the fast path's block→\n regex)
_NL = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "div", "blockquote"}
# tags that never contain the main content themselves
_NOT_CANDIDATE = {"a", "b", "i", "em", "strong", "span", "html", "head", "title", "br"}

_MIN_TEXT = 25  # a winner must carry at least this much text


class _Node:
    __slots__ = ("tag", "order", "parts", "text_len", "link_len", "score")

    def __init__(self, tag: str, order: int):
        self.tag = tag
        self.order = order
        self.parts: list[str] = []
        self.text_len = 0
        self.link_len = 0
        self.score = 0.0


class _Scorer(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", 0)
        self.stack: list[_Node] = [self.root]
        self.closed: list[tuple[_Node, str]] = []  # (node, subtree_text)
        self.skip_depth = 0
        self.a_depth = 0
        self._order = 0

    # -- tree events ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self.skip_depth or tag in _SKIP:
            if tag in _SKIP:
                self.skip_depth += 1
            return
        if tag == "br":
            self.stack[-1].parts.append("\n")
            return
        if tag == "a":
            self.a_depth += 1
        self._order += 1
        self.stack.append(_Node(tag, self._order))

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self.skip_depth:
            return
        if tag == "br":
            self.stack[-1].parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            if self.skip_depth:
                self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag == "a" and self.a_depth:
            self.a_depth -= 1
        # pop up to the matching open tag (tolerates mis-nesting the way
        # browsers do: unmatched closes are ignored)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                while len(self.stack) > i:
                    self._close(self.stack.pop())
                return

    def handle_data(self, data: str) -> None:
        if self.skip_depth or not data:
            return
        node = self.stack[-1]
        node.parts.append(data)
        stripped_len = len(data.strip())
        node.text_len += stripped_len
        if self.a_depth:
            node.link_len += stripped_len

    # -- scoring --------------------------------------------------------------
    def _close(self, node: _Node) -> None:
        text = "".join(node.parts)
        parent = self.stack[-1]
        if node.tag == "p":
            commas = text.count(",") + text.count("，")
            s = 1.0 + commas + min(node.text_len / 100.0, 3.0)
            parent.score += s
            if len(self.stack) >= 2:
                self.stack[-2].score += s / 2.0
        # bubble subtree totals + text into the parent (scores do NOT bubble:
        # only <p> closes credit ancestors, per the readability shape)
        parent.text_len += node.text_len
        parent.link_len += node.link_len
        parent.parts.append(text + ("\n" if node.tag in _NL else " "))
        if node.tag not in _NOT_CANDIDATE:
            self.closed.append((node, text))

    def finish(self) -> None:
        while len(self.stack) > 1:
            self._close(self.stack.pop())


_WS = re.compile(r"[ \t\r\f\v]+")
_NL_PAD = re.compile(r" ?\n ?")
_NL_RUN = re.compile(r"\n{2,}")


def _clean(text: str) -> str:
    return _NL_RUN.sub("\n", _NL_PAD.sub("\n", _WS.sub(" ", text))).strip()


def score_main_content(html: str) -> str | None:
    """Return the main-content text of an article-less page, or None when no
    container scores (caller keeps its whole-body fallback). Deterministic:
    same bytes in → same text out, ties by document order."""
    try:
        p = _Scorer()
        p.feed(html)
        p.finish()
    except Exception:  # malformed beyond the tolerant parser: let caller fall back
        return None
    best: tuple[float, int] | None = None
    best_text: str | None = None
    for node, text in p.closed:
        if node.score <= 0.0 or node.text_len < _MIN_TEXT:
            continue
        density_penalty = 1.0 - (node.link_len / node.text_len if node.text_len else 1.0)
        final = node.score * density_penalty
        key = (final, -node.order)  # ties → earliest in document
        if best is None or key > best:
            best = key
            best_text = text
    if best is None or best[0] <= 0.0:
        return None
    cleaned = _clean(best_text or "")
    return cleaned if len(cleaned) >= _MIN_TEXT else None
