"""Reference-shaped convenience API (SURVEY.md §1.1/§3): thin object
wrappers over the arena engine so code written against the reference's
surface (``createDocument`` → ``querySelector/All`` → ``.text`` /
``.outerHTML`` — src/html/dom.d [recalled]) ports line-for-line:

    from htmld_spark.engine.api import create_document
    doc = create_document(b"<div id=a><p>Hi</p></div>")
    node = doc.query_selector("#a p")
    node.text            # b"Hi"
    node.outer_html      # b"<p>Hi</p>"
    [n.tag for n in doc.query_selector_all("div, p")]

Wrappers are views (doc, node-id) into the arena — allocation-free beyond
the tiny Node objects; all real work stays in the flat-array engine. The
pipeline itself never uses this module (it drives the arena directly);
this is the user-facing parity surface.
"""

from __future__ import annotations

from htmld_spark.engine.dom import (
    CDATA,
    COMMENT,
    ELEM,
    NULL,
    TEXT,
    DOMOptions,
    Document as _ArenaDoc,
    parse_document,
)
from htmld_spark.engine.extract import inner_html, inner_text, outer_html
from htmld_spark.engine.selector import (
    compile_selector,
    matches as _matches,
    query_select,
    query_select_all,
)
from htmld_spark.engine.tokenizer import ParserOptions


class Node:
    """A view of one arena node. Mirrors the reference Node surface:
    kin links, attr get/set, text/html extraction, selector matching."""

    __slots__ = ("_doc", "_nid")

    def __init__(self, doc: _ArenaDoc, nid: int):
        self._doc = doc
        self._nid = nid

    # --- identity / kind -------------------------------------------------
    @property
    def node_id(self) -> int:
        return self._nid

    @property
    def is_element(self) -> bool:
        return self._doc.kind[self._nid] == ELEM

    @property
    def is_text(self) -> bool:
        return self._doc.kind[self._nid] in (TEXT, CDATA)

    @property
    def is_comment(self) -> bool:
        return self._doc.kind[self._nid] == COMMENT

    @property
    def tag(self) -> bytes | None:
        """Lowercased tag name (matching is case-insensitive); None for
        non-elements."""
        return self._doc.tag[self._nid]

    @property
    def tag_raw(self) -> bytes | None:
        """Tag name with original case preserved."""
        return self._doc.tag_raw[self._nid]

    # --- N1-N4 kin links -------------------------------------------------
    def _wrap(self, nid: int):
        return Node(self._doc, nid) if nid != NULL else None

    @property
    def parent(self):
        return self._wrap(self._doc.parent[self._nid])

    @property
    def first_child(self):
        return self._wrap(self._doc.first_child[self._nid])

    @property
    def last_child(self):
        return self._wrap(self._doc.last_child[self._nid])

    @property
    def prev_sibling(self):
        return self._wrap(self._doc.prev_sib[self._nid])

    @property
    def next_sibling(self):
        return self._wrap(self._doc.next_sib[self._nid])

    @property
    def children(self):
        for c in self._doc.children(self._nid):
            yield Node(self._doc, c)

    @property
    def descendants(self):
        for d in self._doc.descendants(self._nid):
            yield Node(self._doc, d)

    @property
    def ancestors(self):
        for a in self._doc.ancestors(self._nid):
            yield Node(self._doc, a)

    # --- N5/N6 attributes -------------------------------------------------
    def attr(self, name: bytes | str) -> bytes | None:
        if isinstance(name, str):
            name = name.encode()
        return self._doc.attr(self._nid, name.lower())

    def has_attr(self, name: bytes | str) -> bool:
        if isinstance(name, str):
            name = name.encode()
        return self._doc.has_attr(self._nid, name.lower())

    def set_attr(self, name: bytes | str, value: bytes | None) -> None:
        if isinstance(name, str):
            name = name.encode()
        self._doc.set_attr(self._nid, name, value)

    def remove_attr(self, name: bytes | str) -> None:
        if isinstance(name, str):
            name = name.encode()
        self._doc.remove_attr(self._nid, name.lower())

    # --- X1-X3 extraction -------------------------------------------------
    @property
    def text(self) -> bytes:
        return inner_text(self._doc, self._nid)

    @property
    def html(self) -> bytes:
        return inner_html(self._doc, self._nid)

    @property
    def outer_html(self) -> bytes:
        return outer_html(self._doc, self._nid)

    # --- S17-S19 selection ------------------------------------------------
    def matches(self, selector) -> bool:
        return _matches(self._doc, self._nid, _compiled(selector))

    def query_selector(self, selector):
        hit = query_select(self._doc, _compiled(selector), root=self._nid)
        return Node(self._doc, hit) if hit != NULL else None

    def query_selector_all(self, selector):
        for nid in query_select_all(self._doc, _compiled(selector), root=self._nid):
            yield Node(self._doc, nid)

    def __repr__(self) -> str:
        t = self.tag
        return f"<Node #{self._nid} {t.decode() if t else self._doc.kind[self._nid]}>"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Node)
            and other._doc is self._doc
            and other._nid == self._nid
        )

    def __hash__(self) -> int:
        return hash((id(self._doc), self._nid))


def _compiled(selector):
    """Accept either a selector string or an already-compiled Selector —
    the compile-once/match-many pattern of the reference (S1)."""
    return compile_selector(selector) if isinstance(selector, str) else selector


class HtmlDocument:
    """The reference-shaped Document: root access + document-wide selection
    + toString (X4)."""

    __slots__ = ("arena",)

    def __init__(self, arena: _ArenaDoc):
        self.arena = arena

    @property
    def root(self) -> Node:
        return Node(self.arena, 0)

    def query_selector(self, selector):
        return self.root.query_selector(selector)

    def query_selector_all(self, selector):
        return self.root.query_selector_all(selector)

    @property
    def text(self) -> bytes:
        return inner_text(self.arena, 0)

    def to_string(self) -> bytes:
        return outer_html(self.arena, 0)

    def create_element(self, tag: bytes | str) -> Node:
        if isinstance(tag, str):
            tag = tag.encode()
        return Node(self.arena, self.arena.create_element(tag))

    def append_child(self, parent: Node, child: Node) -> None:
        self.arena.append_child(parent._nid, child._nid)


def create_document(
    html: bytes | str,
    options: ParserOptions | None = None,
    dom_options: DOMOptions | None = None,
) -> HtmlDocument:
    """The reference's ``createDocument(source)`` [recalled]: parse (never
    raises) and return the wrapped document."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    return HtmlDocument(parse_document(html, options, dom_options))
