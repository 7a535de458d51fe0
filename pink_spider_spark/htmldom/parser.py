"""Tolerant HTML parser -> Node tree (stdlib ``html.parser`` based).

The reference uses html5ever's WHATWG tree builder
(reference: src/scraper.rs:76-79).  We reproduce the tree shapes the
extraction pipeline observes for the well-formed/synthetic corpus:

- tags/attributes lowercased, char-refs decoded (html.parser does both)
- boolean attributes get value "" (html5ever behaviour)
- void elements never nest; mis-nested end tags close upward tolerantly
- the document always gains the ``html`` > ``head`` + ``body`` scaffold;
  whitespace-only text directly under the document or ``html`` is ignorable
  per the WHATWG "before head"/"before html" insertion modes and dropped;
  head-only elements appearing before any flow content move into ``head``.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .dom import COMMENT, DOCTYPE, DOCUMENT, ELEMENT, TEXT, Node

VOID_ELEMENTS = frozenset({
    "area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
    "hr", "img", "input", "keygen", "link", "meta", "param", "source",
    "track", "wbr",
})

# Elements whose children are raw text (not escaped on serialize).
RAW_TEXT_ELEMENTS = frozenset({
    "style", "script", "xmp", "iframe", "noembed", "noframes", "plaintext",
})

# Elements that belong in <head> when seen before flow content.
_HEAD_CONTENT = frozenset({"title", "meta", "link", "style", "base", "script", "noscript"})

# Elements closed implicitly by an opening <p>-family tag (subset sufficient
# for the corpus; html.parser does no implied end tags itself).
_P_CLOSERS = frozenset({
    "p", "div", "ul", "ol", "li", "dl", "dt", "dd", "h1", "h2", "h3", "h4",
    "h5", "h6", "blockquote", "pre", "table", "form", "section", "article",
    "aside", "header", "footer", "center",
})


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.document = Node(DOCUMENT)
        self.stack: list[Node] = [self.document]

    # -- helpers -------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _open_tags(self) -> list[str]:
        return [n.tag for n in self.stack[1:]]

    # -- handler callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        # implied </p> before block starters (WHATWG "in body" p handling)
        if tag in _P_CLOSERS and self._top().kind == ELEMENT and self._top().tag == "p":
            self.stack.pop()
        # implied </li> before a new <li>
        if tag == "li" and self._top().kind == ELEMENT and self._top().tag == "li":
            self.stack.pop()
        node = Node(ELEMENT, tag, [(n, v if v is not None else "") for n, v in attrs])
        self._top().append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(ELEMENT, tag, [(n, v if v is not None else "") for n, v in attrs])
        self._top().append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # close upward to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].kind == ELEMENT and self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if not data:
            return
        top = self._top()
        # merge adjacent text (html5ever tendril behaviour)
        if top.children and top.children[-1].kind == TEXT:
            top.children[-1].text += data
        else:
            top.append(Node(TEXT, text=data))

    def handle_comment(self, data: str) -> None:
        self._top().append(Node(COMMENT, text=data))

    def handle_decl(self, decl: str) -> None:
        self._top().append(Node(DOCTYPE, text=decl))


def _normalize(document: Node) -> Node:
    """Ensure the html/head/body scaffold html5ever always produces."""
    html = None
    for child in document.children:
        if child.kind == ELEMENT and child.tag == "html":
            html = child
            break

    if html is None:
        html = Node(ELEMENT, "html")
        rest = [c for c in document.children]
        keep: list[Node] = []
        moved: list[Node] = []
        for c in rest:
            if c.kind == DOCTYPE or (c.kind == COMMENT and not moved):
                keep.append(c)
            else:
                moved.append(c)
        document.children = keep
        for c in keep:
            c.parent = document
        document.append(html)
        for c in moved:
            html.append(c)

    head = None
    body = None
    for child in html.children:
        if child.kind == ELEMENT and child.tag == "head" and head is None:
            head = child
        elif child.kind == ELEMENT and child.tag == "body" and body is None:
            body = child

    if head is None:
        head = Node(ELEMENT, "head")
    if body is None:
        body = Node(ELEMENT, "body")

    # Distribute html's loose children: ignorable whitespace dropped
    # ("before head" mode ignores it), head-content before flow -> head,
    # everything else -> body.
    new_children: list[Node] = []
    seen_body = False
    for child in list(html.children):
        if child is head or child is body:
            seen_body = seen_body or child is body
            continue
        if child.kind == TEXT and child.text.strip() == "":
            continue  # ignorable inter-element whitespace
        if child.kind == DOCTYPE:
            continue
        if (not seen_body and child.kind == ELEMENT and child.tag in _HEAD_CONTENT):
            head.append(child)
        elif child.kind == COMMENT and not seen_body and not body.children:
            head.append(child)
        else:
            body.append(child)
    html.children = new_children
    html.append(head)
    html.append(body)
    return document


def parse_html(source) -> Node:
    """Parse HTML (str or utf-8 bytes) into a normalized document Node."""
    if isinstance(source, (bytes, bytearray)):
        source = bytes(source).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(source)
    builder.close()
    return _normalize(builder.document)
