"""Forgiving HTML tokenizer — engine milestone M2 (SURVEY.md §2.A.1 T1–T16).

Capability parity with the reference's single-pass SAX-style parser
(src/html/parser.d, ``parseHTML!(Handler,options)`` [recalled]): a
character-level scanner over the raw input that emits handler callbacks and
NEVER raises on malformed input. Tokens are (start, end) byte offsets into
the input — zero-copy, mirroring the reference's slice-based design.

Handler protocol (``TokenSink`` — the analog of the reference's template
handler structs, SURVEY.md §2.A.6). All offsets are byte offsets into the
original input:

    on_text(start, end)                  # raw text run (no entities inside)
    on_entity(start, end, decoded)       # one char-ref; decoded is UTF-8 bytes
    on_open(name, raw_name, attrs, start, end, self_closing)
                                         # attrs: list[(lower_name, value|None)]
    on_close(name, start, end)           # </name ...>
    on_comment(start, end)               # content offsets, excl. <!-- -->
    on_cdata(start, end)                 # content offsets, excl. <![CDATA[ ]]>
    on_doctype(start, end)               # content offsets, excl. <! >
    on_decl(start, end)                  # non-doctype <!...> declaration
    on_pi(start, end)                    # content offsets, excl. <? ?>
    on_done(end)                         # EOF

Pinned "forgiving" decisions (fixture-defined — FIXTURES.md families 2–7,
tests/test_tokenizer.py; these ARE the contract since the reference checkout
is absent, see SURVEY.md provenance warning):

- ``<`` not followed by ``[a-zA-Z]``, ``/``, ``!`` or ``?`` → literal text.
- ``</`` not followed by a letter → bogus comment, skipped to ``>``.
- EOF inside a tag construct → the incomplete tag is silently dropped
  ("flush what's consumable, never throw").
- Unterminated comment / CDATA / doctype / PI → content runs to EOF.
- ``<!-- -- -->`` is tolerated (scan is for the full ``-->``).
- Raw-text elements (``script style xmp``): content is opaque until the
  case-insensitive ``</name`` followed by whitespace, ``/`` or ``>``;
  no tags or entities are parsed inside. RCDATA (``title textarea``):
  entities decoded, tags not parsed.
- Attributes: double/single/unquoted/valueless; unquoted values may contain
  ``/``; duplicate names are kept in emission order (the DOM builder keeps
  the first — D-attr semantics); entity refs inside values are decoded.
- Named entities require the terminating ``;`` (see entities.py).
"""

from __future__ import annotations

import re

from htmld_spark.engine.entities import decode_entities, decode_entity

# One attribute: optional leading ws, name, optional = value (dquoted /
# squoted / unquoted — unquoted may contain '/'). Compiled C-side scanning
# replaces the per-character Python loops in the hot path.
_ATTR_RE = re.compile(
    rb"[ \t\n\r\f]*([^ \t\n\r\f=/>]+)"
    rb"(?:[ \t\n\r\f]*=[ \t\n\r\f]*(\"[^\"]*\"?|'[^']*'?|[^ \t\n\r\f>]*))?"
)
# NOTE: regex fast paths for open/close tags were measured SLOWER than the
# find()-driven manual scanners below (re.match per-call overhead exceeds
# the short byte loops) — don't reintroduce them without a CPU-time A/B.

# --- character classes (as byte sets, for speed) -----------------------------
_WS = frozenset(b" \t\n\r\f")
_LETTERS = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
# Characters that terminate a tag name.
_NAME_END = frozenset(b" \t\n\r\f/>")
# Characters that terminate an attribute name.
_ATTR_NAME_END = frozenset(b" \t\n\r\f=/>")
# Characters that terminate an unquoted attribute value ('/' is allowed).
_UNQUOTED_END = frozenset(b" \t\n\r\f>")

RAW_TEXT_TAGS = frozenset((b"script", b"style", b"xmp"))
RCDATA_TAGS = frozenset((b"title", b"textarea"))
_RAW_OR_RCDATA = RAW_TEXT_TAGS | RCDATA_TAGS


class ParserOptions:
    """Runtime analog of the reference's compile-time ``ParserOptions``
    template flags (src/html/parser.d [recalled]: bit-flags gating
    comments/CDATA/entities/raw-text — SURVEY.md §2.A.1/§4.1). Flags only
    add branches on already-branchy dispatch points, so the default path
    costs nothing extra.

    - ``entities``: decode character references (off → ``&amp;`` stays text)
    - ``comments``: emit on_comment (off → comments silently skipped)
    - ``cdata``: emit on_cdata (off → CDATA sections silently skipped)
    - ``raw_text``: treat script/style/xmp as opaque raw text (off → their
      content is tokenized like normal markup)
    """

    __slots__ = ("entities", "comments", "cdata", "raw_text")

    def __init__(
        self,
        entities: bool = True,
        comments: bool = True,
        cdata: bool = True,
        raw_text: bool = True,
    ):
        self.entities = entities
        self.comments = comments
        self.cdata = cdata
        self.raw_text = raw_text


DEFAULT_OPTIONS = ParserOptions()


def tokenize(
    html: bytes,
    handler,
    low: bytes | None = None,
    options: ParserOptions = DEFAULT_OPTIONS,
) -> None:
    """Single-pass tokenize of ``html``, emitting TokenSink callbacks.

    ``low`` is the pre-lowercased copy of ``html`` (computed once here if not
    supplied); it enables O(1)-allocation case-insensitive tag matching.
    ``options`` gates entities/comments/CDATA/raw-text (ParserOptions).
    Never raises on any input byte string.
    """
    if low is None:
        low = html.lower()
    n = len(html)
    pos = 0
    find = html.find
    on_text = handler.on_text
    on_entity = handler.on_entity
    ent = options.entities

    while pos < n:
        lt = find(b"<", pos)
        if lt < 0:
            _emit_text(html, pos, n, on_text, on_entity, entities=ent)
            pos = n
            break
        if lt > pos:
            _emit_text(html, pos, lt, on_text, on_entity, entities=ent)
        nxt = lt + 1
        if nxt >= n:
            # trailing '<' at EOF → literal text
            on_text(lt, n)
            pos = n
            break
        c = html[nxt]
        if c in _LETTERS:
            pos = _scan_open_tag(html, low, lt, n, handler, options)
        elif c == 0x2F:  # '/'
            if nxt + 1 < n and html[nxt + 1] in _LETTERS:
                pos = _scan_close_tag(html, low, lt, n, handler)
            else:
                # bogus comment: skip to '>'
                gt = find(b">", nxt)
                pos = n if gt < 0 else gt + 1
        elif c == 0x21:  # '!'
            pos = _scan_markup_decl(html, low, lt, n, handler, options)
        elif c == 0x3F:  # '?'
            pos = _scan_pi(html, lt, n, handler)
        else:
            # stray '<' → literal text (merged with neighbors by the builder)
            on_text(lt, nxt)
            pos = nxt
    handler.on_done(n)


def _emit_text(
    html: bytes, start: int, end: int, on_text, on_entity, entities: bool = True
) -> None:
    """Emit a text region [start, end), splitting out decodable char-refs."""
    if not entities:
        if end > start:
            on_text(start, end)
        return
    pos = start
    amp = html.find(b"&", pos, end)
    while amp >= 0:
        hit = decode_entity(html, amp)
        if hit is not None and hit[1] <= end:
            decoded, ent_end = hit
            if amp > pos:
                on_text(pos, amp)
            on_entity(amp, ent_end, decoded)
            pos = ent_end
        # invalid (or crossing the region end) → '&' stays literal text
        amp = html.find(b"&", amp + 1 if hit is None or hit[1] > end else pos, end)
    if end > pos:
        on_text(pos, end)


def _scan_open_tag(
    html: bytes, low: bytes, lt: int, n: int, handler,
    options: ParserOptions = DEFAULT_OPTIONS,
) -> int:
    """Parse ``<name attr=... >`` starting at ``lt``. Returns resume pos.

    On EOF inside the construct the whole tag is dropped (returns n,
    nothing emitted)."""
    i = lt + 1
    while i < n and html[i] not in _NAME_END:
        i += 1
    name = low[lt + 1 : i]
    # fast path: `<name>` with no attributes — the dominant real-page shape
    if i < n and html[i] == 0x3E:
        handler.on_open(name, html[lt + 1 : i], (), lt, i + 1, False)
        if options.raw_text:
            if name in RAW_TEXT_TAGS:
                return _scan_raw_text(html, low, name, i + 1, n, handler, rcdata=False)
            if name in RCDATA_TAGS:
                return _scan_raw_text(
                    html, low, name, i + 1, n, handler, rcdata=options.entities
                )
        return i + 1
    raw_name = html[lt + 1 : i]
    attrs: list[tuple[bytes, bytes | None]] = []
    self_closing = False
    attr_match = _ATTR_RE.match
    while True:
        # skip whitespace
        while i < n and html[i] in _WS:
            i += 1
        if i >= n:
            return n  # EOF in tag → drop
        b = html[i]
        if b == 0x3E:  # '>'
            end = i + 1
            break
        if b == 0x2F:  # '/'
            if i + 1 < n and html[i + 1] == 0x3E:
                self_closing = True
                end = i + 2
                break
            i += 1  # stray '/' inside tag → ignore
            continue
        m = attr_match(html, i)
        if m is None or m.end(1) == i:  # junk byte (e.g. stray '=') → skip
            i += 1
            continue
        attr_name = low[m.start(1) : m.end(1)]
        val = m.group(2)
        if val is None:
            attrs.append((attr_name, None))  # valueless attribute
        else:
            q = val[:1]
            if q == b'"' or q == b"'":
                if len(val) < 2 or not val.endswith(q):
                    return n  # EOF in quoted value → drop tag
                val = val[1:-1]
            attrs.append((attr_name, decode_entities(val)))
        i = m.end()
    handler.on_open(name, raw_name, attrs, lt, end, self_closing)
    if not self_closing and options.raw_text:
        if name in RAW_TEXT_TAGS:
            return _scan_raw_text(html, low, name, end, n, handler, rcdata=False)
        if name in RCDATA_TAGS:
            return _scan_raw_text(
                html, low, name, end, n, handler, rcdata=options.entities
            )
    return end


def _scan_raw_text(
    html: bytes, low: bytes, name: bytes, pos: int, n: int, handler, rcdata: bool
) -> int:
    """Scan opaque content of a raw-text/RCDATA element; stop at the
    case-insensitive ``</name`` followed by ws, '/' or '>'. The close tag
    itself is re-parsed by the main loop (caller resumes at its '<')."""
    needle = b"</" + name
    nl = len(needle)
    search = pos
    while True:
        cand = low.find(needle, search)
        if cand < 0:
            # unterminated → content to EOF
            _emit_text(html, pos, n, handler.on_text, handler.on_entity, entities=rcdata)
            return n
        after = cand + nl
        if after >= n or html[after] in _NAME_END:
            if cand > pos:
                _emit_text(
                    html, pos, cand, handler.on_text, handler.on_entity, entities=rcdata
                )
            return cand  # main loop re-parses the close tag
        search = cand + 1


def _scan_close_tag(html: bytes, low: bytes, lt: int, n: int, handler) -> int:
    i = lt + 2
    while i < n and html[i] not in _NAME_END:
        i += 1
    name = low[lt + 2 : i]
    gt = html.find(b">", i)
    if gt < 0:
        return n  # EOF in close tag → drop
    handler.on_close(name, lt, gt + 1)
    return gt + 1


def _scan_markup_decl(
    html: bytes, low: bytes, lt: int, n: int, handler,
    options: ParserOptions = DEFAULT_OPTIONS,
) -> int:
    """``<!`` constructs: comment, CDATA, doctype, other declarations."""
    if html.startswith(b"--", lt + 2):
        close = html.find(b"-->", lt + 4)
        if close < 0:
            if options.comments:
                handler.on_comment(lt + 4, n)
            return n
        if options.comments:
            handler.on_comment(lt + 4, close)
        return close + 3
    if html.startswith(b"[CDATA[", lt + 2):
        close = html.find(b"]]>", lt + 9)
        if close < 0:
            if options.cdata:
                handler.on_cdata(lt + 9, n)
            return n
        if options.cdata:
            handler.on_cdata(lt + 9, close)
        return close + 3
    gt = html.find(b">", lt + 2)
    end = n if gt < 0 else gt
    if low.startswith(b"doctype", lt + 2):
        handler.on_doctype(lt + 2, end)
    else:
        handler.on_decl(lt + 2, end)
    return n if gt < 0 else gt + 1


def _scan_pi(html: bytes, lt: int, n: int, handler) -> int:
    """``<? ... ?>`` (or ``>`` when no ``?>``): processing instruction."""
    gt = html.find(b">", lt + 2)
    if gt < 0:
        handler.on_pi(lt + 2, n)
        return n
    content_end = gt - 1 if html[gt - 1] == 0x3F else gt
    handler.on_pi(lt + 2, content_end)
    return gt + 1
