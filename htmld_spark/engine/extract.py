"""Serialization & text extraction — engine milestone M4
(SURVEY.md §2.A.5 X1–X6).

X1 inner_text: document-order concatenation of descendant Text/CDATA bytes —
    no whitespace normalization (parity with the reference's ``node.text``
    [recalled], pinned by tests/test_extract.py).
X2/X3 inner_html/outer_html: markup reconstruction with HTML escaping of
    text (``& < >``) and attribute values (``& "``), quoting semantics of the
    reference's writeHTMLEscaped/requiresQuotes (src/html/utils.d [recalled]):
    attribute values are emitted UNQUOTED when legal — non-empty and free of
    whitespace, quotes, ``=``, ``<``, ``>`` and backtick — else double-quoted
    (requiresQuotes); valueless attributes are emitted bare; original tag
    case is preserved. Pinned by tests/test_extract.py and the fixture's
    ``main_outer_html`` golden column.
X5 element_spans: per element node, byte offsets into the raw html
    (raw_start/raw_end) and into the full-document innerText
    (text_start/text_end) — mandated by BASELINE.json "per-node span offsets".
X6 main_text: deterministic main-content extraction (NOT in the reference —
    mandated by BASELINE.json "main-content text ... DOM heuristics,
    boilerplate strip"). Rule stack MAIN_TEXT_RULES_VERSION below; it defines
    the golden ``text`` column of the pages fixture, so any change here is a
    breaking fixture change.
"""

from __future__ import annotations

import re

from htmld_spark.engine.dom import (
    CDATA,
    COMMENT,
    DECL,
    DOCTYPE,
    ELEM,
    NULL,
    PI,
    TEXT,
    VOID_ELEMENTS,
    Document,
)
from htmld_spark.engine.selector import compile_selector, query_select

MAIN_TEXT_RULES_VERSION = "mcx-1"

# --- X1: innerText ------------------------------------------------------------


def inner_text(doc: Document, nid: int = 0) -> bytes:
    """Raw concatenation of all descendant Text/CDATA content, document order.
    Script/style content IS included (they are ordinary Text nodes in
    raw-text mode) — use main_text for boilerplate-stripped output."""
    kind, content = doc.kind, doc.content
    pieces = [
        content[d] for d in doc.descendants(nid) if kind[d] == TEXT or kind[d] == CDATA
    ]
    return b"".join(pieces)


# --- X2/X3: innerHTML / outerHTML ------------------------------------------------


def _escape_text(b: bytes) -> bytes:
    if b"&" in b:
        b = b.replace(b"&", b"&amp;")
    if b"<" in b:
        b = b.replace(b"<", b"&lt;")
    if b">" in b:
        b = b.replace(b">", b"&gt;")
    return b


def _escape_attr(b: bytes) -> bytes:
    if b"&" in b:
        b = b.replace(b"&", b"&amp;")
    if b'"' in b:
        b = b.replace(b'"', b"&quot;")
    return b


# Chars whose presence (or an empty value) forces quoting — the analog of
# the reference's requiresQuotes (src/html/utils.d [recalled]): HTML5
# unquoted attribute values exclude whitespace, quotes, '=', '<', '>', '`'.
_QUOTE_FORCING = frozenset(b"\t\n\f\r \"'=<>`")


def _requires_quotes(value: bytes) -> bool:
    return len(value) == 0 or any(c in _QUOTE_FORCING for c in value)


_NO_ESCAPE_CONTENT = frozenset((b"script", b"style", b"xmp"))


def _serialize(doc: Document, nid: int, out: list[bytes]) -> None:
    # iterative pre-order with explicit close events (deep docs: no recursion)
    stack: list[tuple[int, bool]] = [(nid, False)]
    kind, tag, tag_raw, attrs, content = (
        doc.kind,
        doc.tag,
        doc.tag_raw,
        doc.attrs,
        doc.content,
    )
    while stack:
        cur, closing = stack.pop()
        if closing:
            out.append(b"</" + tag_raw[cur] + b">")
            continue
        k = kind[cur]
        if k == ELEM:
            out.append(b"<" + tag_raw[cur])
            a = attrs[cur]
            last_unquoted = False
            if a:
                for name, value in a.items():
                    if value is None:
                        out.append(b" " + name)
                        last_unquoted = False
                    elif _requires_quotes(value):
                        out.append(b" " + name + b'="' + _escape_attr(value) + b'"')
                        last_unquoted = False
                    else:
                        out.append(b" " + name + b"=" + _escape_attr(value))
                        last_unquoted = True
            t = tag[cur]
            if t in VOID_ELEMENTS and doc.first_child[cur] == NULL:
                # an unquoted value directly followed by "/>" would absorb
                # the "/" into the value on re-parse — separate with a space
                # (serialization fixed point, pinned by the round-trip test)
                out.append(b" />" if last_unquoted else b"/>")
                continue
            out.append(b">")
            stack.append((cur, True))
            if t in _NO_ESCAPE_CONTENT:
                # raw-text content: emit verbatim, no escaping (round-trips
                # the tokenizer's raw-text mode)
                for c in doc.children(cur):
                    if kind[c] == TEXT:
                        out.append(content[c])
            else:
                # push children in reverse via prev_sib links (no list alloc)
                c = doc.last_child[cur]
                while c != NULL:
                    stack.append((c, False))
                    c = doc.prev_sib[c]
        elif k == TEXT:
            out.append(_escape_text(content[cur]))
        elif k == CDATA:
            out.append(b"<![CDATA[" + content[cur] + b"]]>")
        elif k == COMMENT:
            out.append(b"<!--" + content[cur] + b"-->")
        elif k in (DOCTYPE, DECL):
            out.append(b"<!" + content[cur] + b">")
        elif k == PI:
            out.append(b"<?" + content[cur] + b"?>")
        else:  # DOC root
            c = doc.last_child[cur]
            while c != NULL:
                stack.append((c, False))
                c = doc.prev_sib[c]


def inner_html(doc: Document, nid: int = 0) -> bytes:
    out: list[bytes] = []
    for c in doc.children(nid):
        _serialize(doc, c, out)
    return b"".join(out)


def outer_html(doc: Document, nid: int) -> bytes:
    if doc.kind[nid] == 0:  # DOC → X4 Document.toString
        return inner_html(doc, nid)
    out: list[bytes] = []
    _serialize(doc, nid, out)
    return b"".join(out)


# --- X5: element spans ------------------------------------------------------------


def element_spans(doc: Document) -> list[dict]:
    """One row per element node: (node_id, parent_id, tag, start, end,
    text_start, text_end). Invariants (checked in tests + SQL): child span ⊆
    parent span; node_id strictly increasing in document order."""
    kind = doc.kind
    rows = []
    for nid in range(1, len(kind)):
        if kind[nid] == ELEM:
            rows.append(
                {
                    "node_id": nid,
                    "parent_id": doc.parent[nid],
                    "tag": doc.tag[nid].decode("utf-8", "replace"),
                    "start": doc.raw_start[nid],
                    "end": doc.raw_end[nid],
                    "text_start": doc.text_start[nid],
                    "text_end": doc.text_end[nid],
                }
            )
    return rows


class TextSink:
    """DOM-free streaming innerText extractor — an alternate ``TokenSink``
    handler (SURVEY.md §2.A.6): any object with the ``on_*`` protocol can
    consume the tokenizer directly, the analog of the reference's
    ``parseHTML!(MyHandler)`` template handlers [recalled]. Produces the
    same bytes as ``inner_text(parse_document(x))`` without allocating a
    single node."""

    __slots__ = ("pieces", "source")

    def __init__(self, source: bytes):
        self.source = source
        self.pieces: list[bytes] = []

    def on_text(self, s, e):
        self.pieces.append(self.source[s:e])

    def on_entity(self, s, e, decoded):
        self.pieces.append(decoded)

    def on_cdata(self, s, e):
        self.pieces.append(self.source[s:e])

    def on_open(self, name, raw, attrs, s, e, sc):
        pass

    def on_close(self, name, s, e):
        pass

    def on_comment(self, s, e):
        pass

    def on_doctype(self, s, e):
        pass

    def on_decl(self, s, e):
        pass

    def on_pi(self, s, e):
        pass

    def on_done(self, e):
        pass

    def text(self) -> bytes:
        return b"".join(self.pieces)


def fast_inner_text(html: bytes) -> bytes:
    """Single-pass innerText without building a DOM (TextSink handler)."""
    from htmld_spark.engine.tokenizer import tokenize

    sink = TextSink(html)
    tokenize(html, sink)
    return sink.text()


_TAG_STR_MEMO: dict[bytes, str] = {}


def element_span_columns(doc: Document, cols: tuple[list, ...]) -> int:
    """Append this document's element spans into 7 caller-owned column lists
    (node_id, parent_id, tag, start, end, text_start, text_end) — the
    columnar fast path for Arrow batch construction. Returns the number of
    spans appended. Tag-name str decoding is memoized across documents (the
    tag vocabulary is tiny; one decode per distinct tag per worker)."""
    native = _get_native()
    if native is not None and type(doc.kind) is list:
        return native.span_columns(
            doc.kind, doc.tag, doc.parent, doc.raw_start, doc.raw_end,
            doc.text_start, doc.text_end, cols, _TAG_STR_MEMO,
        )
    kind = doc.kind
    c_nid, c_pid, c_tag, c_s, c_e, c_ts, c_te = cols
    tag, parent = doc.tag, doc.parent
    rs, re_, ts, te = doc.raw_start, doc.raw_end, doc.text_start, doc.text_end
    memo = _TAG_STR_MEMO
    n = 0
    for nid in range(1, len(kind)):
        if kind[nid] == ELEM:
            c_nid.append(nid)
            c_pid.append(parent[nid])
            t = tag[nid]
            s = memo.get(t)
            if s is None:
                s = t.decode("utf-8", "replace")
                if len(memo) < 4096:  # adversarial unique-tag soup: no growth
                    memo[t] = s
            c_tag.append(s)
            c_s.append(rs[nid])
            c_e.append(re_[nid])
            c_ts.append(ts[nid])
            c_te.append(te[nid])
            n += 1
    return n


# --- X6: main-content extraction -----------------------------------------------------

# Subtrees never contributing to main content.
STRIP_TAGS = frozenset(
    b"script style noscript template nav header footer aside form iframe svg "
    b"button select option optgroup".split()
)

# Container preference, first match wins (compiled once at import).
_CONTAINER_SELECTORS = [
    compile_selector(s)
    for s in (
        "main",
        "article",
        "[role='main']",
        "#main",
        "#content",
        ".main-content",
        ".post-content",
        ".article-body",
        ".content",
        "body",
    )
]

# Elements that open a new text block.
BLOCK_TAGS = frozenset(
    b"address article aside blockquote body caption dd details div dl dt "
    b"fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html "
    b"li main menu nav ol p pre section table tbody td tfoot th thead tr ul".split()
)

# ASCII whitespace or UTF-8 NBSP — NBSP must match as the full two-byte
# sequence \xc2\xa0, never as a byte class (a class would eat the lead byte
# of other \xc2-prefixed chars like © and corrupt the UTF-8 stream).
_WS_RUN = re.compile(rb"(?:[ \t\n\r\f]|\xc2\xa0)+")


def _collapse(b: bytes) -> bytes:
    return _WS_RUN.sub(b" ", b).strip()


def main_text_node(doc: Document, root: int) -> bytes:
    """Blocked, whitespace-collapsed text of ``root``'s subtree with STRIP_TAGS
    subtrees removed. Blocks are separated by single newlines; runs of
    whitespace inside a block collapse to one space; empty blocks dropped."""
    kind, tag, content = doc.kind, doc.tag, doc.content
    last_child, prev_sib = doc.last_child, doc.prev_sib
    blocks: list[bytes] = []
    buf: list[bytes] = []

    def flush():
        if buf:
            blk = _collapse(b"".join(buf))
            buf.clear()
            if blk:
                blocks.append(blk)

    # iterative pre-order walk with enter/exit events for block flushing;
    # children pushed in reverse via prev_sib links (no per-node list alloc)
    events: list[tuple[int, bool]] = [(root, False)]
    push = events.append
    while events:
        nid, leaving = events.pop()
        if leaving:
            flush()
            continue
        k = kind[nid]
        if k == ELEM:
            t = tag[nid]
            if t in STRIP_TAGS:
                continue
            if t == b"br":
                flush()
                continue
            if t in BLOCK_TAGS:
                flush()
                push((nid, True))  # flush again on exit
            c = last_child[nid]
            while c != NULL:
                push((c, False))
                c = prev_sib[c]
        elif k == TEXT or k == CDATA:
            buf.append(content[nid])
        elif k == 0:  # DOC
            c = last_child[nid]
            while c != NULL:
                push((c, False))
                c = prev_sib[c]
    flush()
    return b"\n".join(blocks)


def _find_container(doc: Document) -> int:
    # NOTE: a fused single-walk rank scan was A/B'd against this and was
    # not faster (the "main" selector early-exits almost immediately on
    # real pages); keeping the selector-engine form.
    for sel in _CONTAINER_SELECTORS:
        hit = query_select(doc, sel)
        if hit != NULL:
            return hit
    return 0  # document root


def main_text(doc: Document) -> bytes:
    """Deterministic main-content text (rule set MAIN_TEXT_RULES_VERSION):
    1. pick container = first match of the priority selector list
       (main, article, [role=main], #main, #content, .main-content,
       .post-content, .article-body, .content, body) else document root;
    2. strip STRIP_TAGS subtrees;
    3. blocked + whitespace-collapsed text per main_text_node.

    Accelerated by the C twin (engine/_native.c main_text — container
    ladder + walk + collapse replicated 1:1, parity-gated by
    tests/test_native_parity.py) whenever the arena is list-backed."""
    native = _get_native()
    if native is not None and type(doc.kind) is list:
        return native.main_text(
            doc.kind, doc.tag, doc.attrs, doc.content, doc.parent,
            doc.first_child, doc.last_child, doc.next_sib, doc.prev_sib,
        )
    return main_text_node(doc, _find_container(doc))


def _get_native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        from htmld_spark.engine.native import get_native

        _NATIVE = get_native()
        _NATIVE_TRIED = True
    return _NATIVE


_NATIVE = None
_NATIVE_TRIED = False
