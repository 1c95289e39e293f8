"""Arena-allocated DOM + forgiving tree builder — engine milestone M3
(SURVEY.md §2.A.2 D1–D8, §2.A.3 N1–N7).

Capability parity with the reference's Document/DOMBuilder (src/html/dom.d
[recalled]: arena-allocated nodes, implied end tags, misnesting recovery).
The arena is a set of flat parallel Python lists indexed by node id — the
idiomatic Python analog of the reference's contiguous node arena; node id 0
is the synthetic document root, and ids double as the stable ``node_id`` in
the exported span table (SURVEY.md §1.2).

Pinned recovery semantics (fixture-defined — FIXTURES.md families 3–4,
tests/test_dom.py; the reference checkout is absent so these rules ARE the
contract):

- D3  void elements never nest children: area base br col embed hr img input
      keygen link meta param source track wbr.
- D5  implied end tags, pop-while-top-matches model: opening tag T pops open
      elements from the top of the stack while the top's tag is in
      ``IMPLIED_END[T]`` (data-driven table below).
- D6  mismatched ``</x>``: walk the open stack top-down for ``x``; if found,
      every element above it is implicitly closed (raw_end = position of the
      ``</``) and ``x`` is closed (raw_end = after ``>``); if not found the
      close tag is ignored.
- D7  EOF implicitly closes all open elements (raw_end = len(input)).
- D8  adjacent text runs and decoded entities fold into ONE Text node.

Span offsets (X5, mandated by BASELINE.json "per-node span offsets"):
``raw_start/raw_end`` are byte offsets into the raw html; ``text_start/
text_end`` are byte offsets into the full-document innerText (the
document-order concatenation of all Text/CDATA node bytes).
"""

from __future__ import annotations

from htmld_spark.engine.tokenizer import tokenize

# Node kinds
DOC = 0
ELEM = 1
TEXT = 2
COMMENT = 3
CDATA = 4
DOCTYPE = 5
PI = 6
DECL = 7

NULL = -1

# D3: HTML5 void-element set [recalled — public HTML5 list].
VOID_ELEMENTS = frozenset(
    b"area base br col embed hr img input keygen link meta param source track wbr".split()
)

# D5: implied-end-tag table — opening <key> pops while stack top ∈ value.
_P_CLOSERS = frozenset(
    b"address article aside blockquote details div dl fieldset figcaption "
    b"figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav "
    b"ol p pre section table ul".split()
)
_CELL = frozenset((b"td", b"th"))
_SECT = frozenset((b"thead", b"tbody", b"tfoot"))
IMPLIED_END: dict[bytes, frozenset[bytes]] = {
    b"li": frozenset((b"li", b"p")),
    b"dt": frozenset((b"dt", b"dd", b"p")),
    b"dd": frozenset((b"dt", b"dd", b"p")),
    b"tr": _CELL | frozenset((b"tr",)),
    b"td": _CELL,
    b"th": _CELL,
    b"thead": _CELL | frozenset((b"tr",)) | _SECT,
    b"tbody": _CELL | frozenset((b"tr",)) | _SECT,
    b"tfoot": _CELL | frozenset((b"tr",)) | _SECT,
    b"option": frozenset((b"option",)),
    b"optgroup": frozenset((b"option", b"optgroup")),
}
for _t in _P_CLOSERS:
    IMPLIED_END.setdefault(_t, frozenset((b"p",)))
_EMPTY: frozenset[bytes] = frozenset()


class DOMOptions:
    """Runtime analog of the reference's compile-time ``DOMCreateOptions``
    template options (``createDocument!(...)``, src/html/dom.d [recalled —
    the exact upstream flag set is unverifiable with the empty reference
    mount; this pins a documented approximation]). Gates what the BUILDER
    keeps/does, independently of the tokenizer's ParserOptions:

    - ``keep_comments``: False → Comment nodes are not allocated (the
      tokenizer still sees them; they simply don't enter the DOM);
    - ``keep_pi_decl``: False → ProcessingInstruction / Declaration /
      DocType nodes are not allocated;
    - ``implied_end_tags``: False → disable the D5 lenient table (strict
      nesting: an open tag never auto-closes a prior element).
    """

    __slots__ = ("keep_comments", "keep_pi_decl", "implied_end_tags")

    def __init__(
        self,
        keep_comments: bool = True,
        keep_pi_decl: bool = True,
        implied_end_tags: bool = True,
    ):
        self.keep_comments = keep_comments
        self.keep_pi_decl = keep_pi_decl
        self.implied_end_tags = implied_end_tags


DEFAULT_DOM_OPTIONS = DOMOptions()


class Document:
    """Arena of nodes in flat parallel lists; id 0 is the synthetic root."""

    __slots__ = (
        "kind",
        "tag",
        "tag_raw",
        "attrs",
        "content",
        "parent",
        "first_child",
        "last_child",
        "next_sib",
        "prev_sib",
        "raw_start",
        "raw_end",
        "text_start",
        "text_end",
        "source",
        "total_text_len",
    )

    def __init__(self, source: bytes = b""):
        self.kind = [DOC]
        self.tag: list[bytes | None] = [None]
        self.tag_raw: list[bytes | None] = [None]
        self.attrs: list[dict[bytes, bytes | None] | None] = [None]
        self.content: list[bytes | None] = [None]
        self.parent = [NULL]
        self.first_child = [NULL]
        self.last_child = [NULL]
        self.next_sib = [NULL]
        self.prev_sib = [NULL]
        self.raw_start = [0]
        self.raw_end = [len(source)]
        self.text_start = [0]
        self.text_end = [0]  # fixed up at end of build
        self.source = source
        self.total_text_len = 0

    # --- D1: node allocation ------------------------------------------------
    def _alloc(self, kind: int, parent: int, raw_s: int, raw_e: int, txt: int) -> int:
        nid = len(self.kind)
        self.kind.append(kind)
        self.tag.append(None)
        self.tag_raw.append(None)
        self.attrs.append(None)
        self.content.append(None)
        self.parent.append(parent)
        self.first_child.append(NULL)
        self.last_child.append(NULL)
        self.next_sib.append(NULL)
        prev = self.last_child[parent]
        self.prev_sib.append(prev)
        if prev != NULL:
            self.next_sib[prev] = nid
        else:
            self.first_child[parent] = nid
        self.last_child[parent] = nid
        self.raw_start.append(raw_s)
        self.raw_end.append(raw_e)
        self.text_start.append(txt)
        self.text_end.append(txt)
        return nid

    # --- N1/N2: kin links & children ------------------------------------------
    def children(self, nid: int):
        c = self.first_child[nid]
        while c != NULL:
            yield c
            c = self.next_sib[c]

    def element_children(self, nid: int):
        kind = self.kind
        c = self.first_child[nid]
        while c != NULL:
            if kind[c] == ELEM:
                yield c
            c = self.next_sib[c]

    # --- N3: descendants (pre-order, iterative — deep docs must not recurse) ---
    def descendants(self, nid: int = 0):
        first_child, next_sib = self.first_child, self.next_sib
        c = first_child[nid]
        while c != NULL:
            yield c
            if first_child[c] != NULL:
                c = first_child[c]
                continue
            while c != nid and next_sib[c] == NULL:
                c = self.parent[c]
            if c == nid:
                return
            c = next_sib[c]

    def descendant_elements(self, nid: int = 0):
        kind = self.kind
        for d in self.descendants(nid):
            if kind[d] == ELEM:
                yield d

    # --- N4: ancestors -----------------------------------------------------------
    def ancestors(self, nid: int):
        p = self.parent[nid]
        while p != NULL:
            yield p
            p = self.parent[p]

    # --- N5/N6: attributes ----------------------------------------------------------
    def attr(self, nid: int, name: bytes) -> bytes | None:
        """Value of attribute ``name`` (lowercase bytes) or None if absent.
        Valueless attributes return b'' (HTML empty-string semantics)."""
        a = self.attrs[nid]
        if not a or name not in a:
            return None
        v = a[name]
        return b"" if v is None else v

    def has_attr(self, nid: int, name: bytes) -> bool:
        a = self.attrs[nid]
        return bool(a) and name in a

    def set_attr(self, nid: int, name: bytes, value: bytes | None) -> None:
        if self.attrs[nid] is None:
            self.attrs[nid] = {}
        self.attrs[nid][name.lower()] = value

    def remove_attr(self, nid: int, name: bytes) -> None:
        a = self.attrs[nid]
        if a is not None:
            a.pop(name, None)

    # --- X7 (minimal mutation API; engine-complete, unused by the pipeline) ----
    def create_element(self, tag: bytes) -> int:
        nid = len(self.kind)
        self.kind.append(ELEM)
        self.tag.append(tag.lower())
        self.tag_raw.append(tag)
        self.attrs.append({})
        self.content.append(None)
        self.parent.append(NULL)
        self.first_child.append(NULL)
        self.last_child.append(NULL)
        self.next_sib.append(NULL)
        self.prev_sib.append(NULL)
        self.raw_start.append(NULL)
        self.raw_end.append(NULL)
        self.text_start.append(NULL)
        self.text_end.append(NULL)
        return nid

    def create_text(self, content: bytes) -> int:
        nid = self.create_element(b"")
        self.kind[nid] = TEXT
        self.tag[nid] = None
        self.tag_raw[nid] = None
        self.attrs[nid] = None
        self.content[nid] = content
        return nid

    def append_child(self, parent: int, child: int) -> None:
        self.detach(child)
        self.parent[child] = parent
        prev = self.last_child[parent]
        self.prev_sib[child] = prev
        self.next_sib[child] = NULL
        if prev != NULL:
            self.next_sib[prev] = child
        else:
            self.first_child[parent] = child
        self.last_child[parent] = child

    def insert_before(self, parent: int, child: int, ref: int) -> None:
        """Insert ``child`` under ``parent`` immediately before ``ref``
        (ref must be a child of parent); X7 mutation API."""
        if ref == NULL or self.parent[ref] != parent:
            self.append_child(parent, child)
            return
        self.detach(child)
        prev = self.prev_sib[ref]
        self.parent[child] = parent
        self.prev_sib[child] = prev
        self.next_sib[child] = ref
        self.prev_sib[ref] = child
        if prev != NULL:
            self.next_sib[prev] = child
        else:
            self.first_child[parent] = child

    def set_text(self, nid: int, content: bytes) -> None:
        """Replace ``nid``'s children with a single Text node (X7
        ``node.text =`` setter)."""
        c = self.first_child[nid]
        while c != NULL:
            nxt = self.next_sib[c]
            self.detach(c)
            c = nxt
        self.append_child(nid, self.create_text(content))

    def set_inner_html(self, nid: int, fragment: bytes) -> None:
        """Replace ``nid``'s children with a re-parsed html fragment (X7
        ``node.html =`` setter — fragment re-parse semantics [recalled])."""
        frag = parse_document(fragment)
        c = self.first_child[nid]
        while c != NULL:
            nxt = self.next_sib[c]
            self.detach(c)
            c = nxt
        # graft the fragment's top-level nodes by deep copy into this arena
        for top in list(frag.children(0)):
            self._graft(frag, top, nid)

    def _graft(self, src: "Document", snid: int, parent: int) -> None:
        k = src.kind[snid]
        if k == ELEM:
            nid = self.create_element(src.tag_raw[snid] or b"")
            if src.attrs[snid]:
                self.attrs[nid] = dict(src.attrs[snid])
        else:
            nid = self.create_text(src.content[snid] or b"")
            self.kind[nid] = k
        self.append_child(parent, nid)
        c = src.first_child[snid]
        while c != NULL:
            self._graft(src, c, nid)
            c = src.next_sib[c]

    def detach(self, nid: int) -> None:
        p = self.parent[nid]
        if p == NULL:
            return
        prev, nxt = self.prev_sib[nid], self.next_sib[nid]
        if prev != NULL:
            self.next_sib[prev] = nxt
        else:
            self.first_child[p] = nxt
        if nxt != NULL:
            self.prev_sib[nxt] = prev
        else:
            self.last_child[p] = prev
        self.parent[nid] = NULL
        self.prev_sib[nid] = NULL
        self.next_sib[nid] = NULL

    def n_nodes(self) -> int:
        return len(self.kind)


class DOMBuilder:
    """TokenSink that assembles a Document — the analog of the reference's
    DOMBuilder struct consuming parser callbacks [recalled]."""

    __slots__ = (
        "doc",
        "stack",
        "_buf",
        "_buf_start",
        "_buf_end",
        "_text_len",
        "_k",
        "_tagl",
        "_tagr",
        "_attrsl",
        "_contentl",
        "_parentl",
        "_fc",
        "_lc",
        "_ns",
        "_ps",
        "_rs",
        "_rel",
        "_tsl",
        "_tel",
        "_keep_comments",
        "_keep_pi_decl",
        "_implied",
    )

    def __init__(self, source: bytes, dom_options: DOMOptions = DEFAULT_DOM_OPTIONS):
        self.doc = Document(source)
        self._keep_comments = dom_options.keep_comments
        self._keep_pi_decl = dom_options.keep_pi_decl
        self._implied = dom_options.implied_end_tags
        self.stack: list[int] = [0]  # open element ids; [0] = root
        self._buf: list[bytes] = []  # pending text pieces (D8 folding)
        self._buf_start = 0
        self._buf_end = 0
        self._text_len = 0
        # hot-path locals: the arena lists, bound once (node allocation is
        # the single most frequent operation — SURVEY.md §4.1 arena analog)
        d = self.doc
        self._k = d.kind
        self._tagl = d.tag
        self._tagr = d.tag_raw
        self._attrsl = d.attrs
        self._contentl = d.content
        self._parentl = d.parent
        self._fc = d.first_child
        self._lc = d.last_child
        self._ns = d.next_sib
        self._ps = d.prev_sib
        self._rs = d.raw_start
        self._rel = d.raw_end
        self._tsl = d.text_start
        self._tel = d.text_end

    def _alloc(self, kind: int, parent: int, raw_s: int, raw_e: int, txt: int) -> int:
        """Builder-side fast allocation (same layout as Document._alloc)."""
        k = self._k
        nid = len(k)
        k.append(kind)
        self._tagl.append(None)
        self._tagr.append(None)
        self._attrsl.append(None)
        self._contentl.append(None)
        self._parentl.append(parent)
        self._fc.append(NULL)
        lc = self._lc
        prev = lc[parent]
        self._ns.append(NULL)
        self._ps.append(prev)
        if prev != NULL:
            self._ns[prev] = nid
        else:
            self._fc[parent] = nid
        lc.append(NULL)
        lc[parent] = nid
        self._rs.append(raw_s)
        self._rel.append(raw_e)
        self._tsl.append(txt)
        self._tel.append(txt)
        return nid

    # --- text folding (D8) -----------------------------------------------------
    def _flush_text(self) -> None:
        if not self._buf:
            return
        content = b"".join(self._buf)
        self._buf.clear()
        nid = self._alloc(
            TEXT, self.stack[-1], self._buf_start, self._buf_end, self._text_len
        )
        self._contentl[nid] = content
        self._text_len += len(content)
        self._tel[nid] = self._text_len

    def on_text(self, s: int, e: int) -> None:
        if not self._buf:
            self._buf_start = s
        self._buf.append(self.doc.source[s:e])
        self._buf_end = e

    def on_entity(self, s: int, e: int, decoded: bytes) -> None:
        if not self._buf:
            self._buf_start = s
        self._buf.append(decoded)
        self._buf_end = e

    # --- elements -------------------------------------------------------------------
    def on_open(self, name, raw_name, attrs, s, e, self_closing) -> None:
        if self._buf:
            self._flush_text()
        stack = self.stack
        tagl = self._tagl
        # D5: implied end tags (gated by DOMOptions.implied_end_tags)
        closes = IMPLIED_END.get(name) if self._implied else None
        if closes:
            while len(stack) > 1 and tagl[stack[-1]] in closes:
                top = stack.pop()
                self._rel[top] = s
                self._tel[top] = self._text_len
        nid = self._alloc(ELEM, stack[-1], s, e, self._text_len)
        tagl[nid] = name
        self._tagr[nid] = raw_name
        if attrs:
            adict: dict[bytes, bytes | None] = {}
            for an, av in attrs:
                if an not in adict:  # duplicate attr names: first wins
                    adict[an] = av
            self._attrsl[nid] = adict
        if not self_closing and name not in VOID_ELEMENTS:
            stack.append(nid)

    def on_close(self, name, s, e) -> None:
        if self._buf:
            self._flush_text()
        stack = self.stack
        tagl = self._tagl
        # D6: find matching open element
        for depth in range(len(stack) - 1, 0, -1):
            if tagl[stack[depth]] == name:
                # implicitly close everything above it
                while len(stack) - 1 > depth:
                    top = stack.pop()
                    self._rel[top] = s
                    self._tel[top] = self._text_len
                top = stack.pop()
                self._rel[top] = e
                self._tel[top] = self._text_len
                return
        # not found → ignore the close tag

    # --- non-element nodes --------------------------------------------------------
    def _simple(self, kind: int, s: int, e: int) -> None:
        self._flush_text()
        d = self.doc
        nid = d._alloc(kind, self.stack[-1], s, e, self._text_len)
        d.content[nid] = d.source[s:e]

    def on_comment(self, s, e):
        if self._keep_comments:
            self._simple(COMMENT, s, e)
        # dropped comment: no flush — adjacent text runs fold together

    def on_cdata(self, s, e):
        # CDATA contributes to innerText (it is character data)
        self._flush_text()
        d = self.doc
        content = d.source[s:e]
        nid = d._alloc(CDATA, self.stack[-1], s, e, self._text_len)
        d.content[nid] = content
        self._text_len += len(content)
        d.text_end[nid] = self._text_len

    def on_doctype(self, s, e):
        if self._keep_pi_decl:
            self._simple(DOCTYPE, s, e)

    def on_decl(self, s, e):
        if self._keep_pi_decl:
            self._simple(DECL, s, e)

    def on_pi(self, s, e):
        if self._keep_pi_decl:
            self._simple(PI, s, e)

    # --- D7: EOF -----------------------------------------------------------------
    def on_done(self, e: int) -> None:
        self._flush_text()
        d = self.doc
        stack = self.stack
        while len(stack) > 1:
            top = stack.pop()
            d.raw_end[top] = e
            d.text_end[top] = self._text_len
        d.text_end[0] = self._text_len
        d.total_text_len = self._text_len


def _parse_document_python(html: bytes, options=None, dom_options=None) -> Document:
    builder = DOMBuilder(html, dom_options or DEFAULT_DOM_OPTIONS)
    if options is None:
        tokenize(html, builder)
    else:
        tokenize(html, builder, options=options)
    return builder.doc


def parse_document(html: bytes, options=None, dom_options=None) -> Document:
    """Parse raw html bytes into a Document. Never raises on malformed input.

    The end-to-end analog of the reference's ``createDocument(source)``
    (src/html/dom.d [recalled]): single pass, tokenizer callbacks feed the
    builder directly — no intermediate token list. ``options`` is a
    tokenizer.ParserOptions (tokenizer-side flags); ``dom_options`` is a
    DOMOptions (builder-side flags — the DOMCreateOptions analog).

    Default-option parses go through the C accelerator when available
    (engine/_native.c — a semantics-identical performance twin, parity-
    gated by tests/test_native_parity.py); non-default options and any
    build/load failure use the pure-Python path."""
    if options is None and dom_options is None:
        native = _get_native()
        if native is not None:
            (
                kind, tag, tag_raw, attrs, content, parent, first_child,
                last_child, next_sib, prev_sib, raw_start, raw_end,
                text_start, text_end, total_text_len,
            ) = native.parse(html, _NAMED_ENTITIES, _MAX_NAME_LEN)
            doc = Document.__new__(Document)
            doc.kind = kind
            doc.tag = tag
            doc.tag_raw = tag_raw
            doc.attrs = attrs
            doc.content = content
            doc.parent = parent
            doc.first_child = first_child
            doc.last_child = last_child
            doc.next_sib = next_sib
            doc.prev_sib = prev_sib
            doc.raw_start = raw_start
            doc.raw_end = raw_end
            doc.text_start = text_start
            doc.text_end = text_end
            doc.source = html
            doc.total_text_len = total_text_len
            return doc
    return _parse_document_python(html, options, dom_options)


_NATIVE = None
_NATIVE_TRIED = False


def _get_native():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        from htmld_spark.engine.native import get_native

        _NATIVE = get_native()
        _NATIVE_TRIED = True
    return _NATIVE


from htmld_spark.engine.entities import (  # noqa: E402  (native-parse args)
    MAX_NAME_LEN as _MAX_NAME_LEN,
    NAMED_ENTITIES as _NAMED_ENTITIES,
)
