"""HTML main-content extraction (boilerplate stripping).

A from-scratch readability/trafilatura-style heuristic built on stdlib
``html.parser`` (no lxml/bs4 in this environment; the north-star requires
DOM-tree heuristics — text density, link density, tag depth):

1. parse into a DOM tree, dropping <script>/<style> payloads and the
   structural boilerplate elements <nav>/<header>/<footer>/<aside>
   entirely;
2. every container element (div/article/main/section/body/td/…) is a
   candidate, scored ``(text_len − 2·link_text_len) · 0.95^depth`` —
   link characters count double against a block so link farms score
   negative, and the shallowest subtree wins among equals;
3. the best candidate's text is emitted as block-level lines: text chunks
   are whitespace-normalized, block elements (p/div/h*/li/tr/br/…)
   introduce line breaks, empty lines dropped, joined with "\\n".

Deterministic: ties resolve to the earliest candidate in document order.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

_SKIP_PAYLOADS = frozenset({
    # non-content payloads (never text, in ANY parse mode)
    "script", "style", "noscript", "template", "head",
})
_SKIP_CONTENT = _SKIP_PAYLOADS | {
    # structural boilerplate: navigation chrome never counts as main content
    "nav", "header", "footer", "aside",
}
_CANDIDATE_TAGS = {"div", "article", "main", "section", "body", "td", "html"}
_BLOCK_TAGS = {
    "p", "div", "article", "main", "section", "body", "html", "ul", "ol",
    "li", "table", "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
    "br", "hr", "blockquote", "pre", "header", "footer", "nav", "aside",
    "figure", "figcaption",
}
_VOID_TAGS = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


@dataclass
class _Node:
    tag: str               # element tag, or "" for text nodes
    text: str = ""         # text-node payload
    depth: int = 0
    order: int = 0         # document order of appearance
    children: list = field(default_factory=list)


class _TreeBuilder(HTMLParser):
    def __init__(self, skip: frozenset | set | None = None) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node(tag="#root")
        self.stack = [self.root]
        self.counter = 0
        self._skip_depth = 0
        self._skip_tag = None
        self._skip = _SKIP_CONTENT if skip is None else skip

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag == self._skip_tag:
                self._skip_depth += 1
            return
        if tag in self._skip:
            self._skip_depth = 1
            self._skip_tag = tag
            return
        self.counter += 1
        node = _Node(tag=tag, depth=len(self.stack), order=self.counter)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag == self._skip_tag:
                self._skip_depth -= 1
                if self._skip_depth == 0:
                    self._skip_tag = None
            return
        # close the nearest matching open element (forgiving parser)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self._skip_depth or not data.strip():
            return
        self.counter += 1
        self.stack[-1].children.append(
            _Node(tag="", text=data, depth=len(self.stack), order=self.counter)
        )


def _text_stats(node: _Node, in_link: bool = False) -> tuple[int, int]:
    """(total_text_chars, link_text_chars) over the subtree."""
    total = link = 0
    for child in node.children:
        if child.tag == "":
            n = len(child.text.strip())
            total += n
            if in_link:
                link += n
        else:
            t, l = _text_stats(child, in_link or child.tag == "a")
            total += t
            link += l
    return total, link


def _emit_lines(node: _Node, out: list[str], buf: list[str]) -> None:
    for child in node.children:
        if child.tag == "":
            buf.append(" ".join(child.text.split()))
        else:
            if child.tag in _BLOCK_TAGS:
                _flush(out, buf)
                _emit_lines(child, out, buf)
                _flush(out, buf)
            else:
                _emit_lines(child, out, buf)


def _flush(out: list[str], buf: list[str]) -> None:
    line = " ".join(s for s in buf if s).strip()
    if line:
        out.append(line)
    buf.clear()


def _candidates(node: _Node, acc: list[_Node]) -> None:
    for child in node.children:
        if child.tag in _CANDIDATE_TAGS:
            acc.append(child)
        if child.tag:
            _candidates(child, acc)


def extract_main_text(html: str) -> str:
    """Main-content text of an HTML page, block lines joined with '\\n'.

    Empty string when the page has no scoreable text.
    """
    if not html:
        return ""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()

    cands: list[_Node] = []
    _candidates(builder.root, cands)
    if not cands:
        cands = [builder.root]

    best, best_score = None, -1.0
    for node in sorted(cands, key=lambda n: n.order):
        total, link = _text_stats(node)
        if total == 0:
            continue
        # link chars count double against the block: a link farm scores
        # negative, a mostly-prose block keeps its weight
        score = (total - 2.0 * link) * (0.95 ** node.depth)
        if score > best_score:
            best, best_score = node, score
    if best is None:
        return ""

    out: list[str] = []
    buf: list[str] = []
    _emit_lines(best, out, buf)
    _flush(out, buf)
    return "\n".join(out)


def _norm_text(node: _Node, acc: list[str], stop_tables: bool) -> None:
    for child in node.children:
        if not child.tag:
            acc.append(child.text)
        elif stop_tables and child.tag == "table":
            continue  # nested tables extract separately, never twice
        else:
            _norm_text(child, acc, stop_tables)


def _collect(node: _Node, tag: str, acc: list[_Node],
             stop: frozenset = frozenset()) -> None:
    for child in node.children:
        if child.tag == tag:
            acc.append(child)
        if child.tag and child.tag not in stop:
            _collect(child, tag, acc, stop)


def extract_tables(html: str) -> list[list[list[str]]]:
    """Structured <table> extraction: tables (document order) → rows
    (<tr>) → cells (<td>/<th>, whitespace-normalized text). Nested
    tables are emitted as their own entries and EXCLUDED from the
    enclosing cell's text, so no character is extracted twice — the
    conservation property the span pipeline relies on.
    """
    if not html:
        return []
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    tables: list[_Node] = []
    _collect(builder.root, "table", tables)  # includes nested, doc order
    out = []
    for tbl in sorted(tables, key=lambda n: n.order):
        rows: list[_Node] = []
        _collect(tbl, "tr", rows, stop=frozenset({"table"}))
        t_rows = []
        for tr in sorted(rows, key=lambda n: n.order):
            cells: list[_Node] = []
            for tag in ("td", "th"):
                _collect(tr, tag, cells, stop=frozenset({"table"}))
            row = []
            for cell in sorted(cells, key=lambda n: n.order):
                buf: list[str] = []
                _norm_text(cell, buf, stop_tables=True)
                row.append(" ".join(" ".join(buf).split()))
            t_rows.append(row)
        out.append(t_rows)
    return out


def link_stats(html: str) -> tuple[int, int, int]:
    """(n_links, link_text_chars, total_text_chars) — the raw counts
    behind the link-density heuristic ``extract_main_text`` scores
    with, exposed for per-page quality rollups (a page whose text is
    mostly links is navigation, not content)."""
    if not html:
        return 0, 0, 0
    # parse with structural chrome KEPT (nav/header/footer/aside): the
    # link-density signal exists precisely to FLAG navigation-heavy
    # pages, so their links must count — unlike extract_main_text,
    # which drops them before scoring. Script/style stay excluded.
    builder = _TreeBuilder(skip=_SKIP_PAYLOADS)
    builder.feed(html)
    builder.close()
    links: list[_Node] = []
    _collect(builder.root, "a", links)
    total, link = _text_stats(builder.root)
    return len(links), link, total
