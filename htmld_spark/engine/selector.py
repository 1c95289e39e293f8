"""CSS selector engine — engine milestone M5 (SURVEY.md §2.A.4 S1–S19).

Capability parity with the reference's ``struct Selector`` (src/html/dom.d
[recalled]; "CSS-selector engine (descendant/child/attr/class/pseudo
selectors)" per BASELINE.json north_star). Compile once (``compile_selector``)
→ match many (``matches`` / ``query_select_all``), mirroring the reference's
``Selector.parse`` / ``matches`` split.

Supported grammar (the union of the reference's documented set plus the
standard pseudo-classes; pinned by tests/test_selector.py):

    group    := chain ("," chain)*
    chain    := seq ((" " | ">" | "+" | "~") seq)*
    seq      := (tag | "*")? ("#id" | ".class" | "[attr]" | "[attr op val]"
                | ":pseudo" | ":pseudo(arg)")*
    op       := "=" | "~=" | "|=" | "^=" | "$=" | "*="
    pseudo   := first-child last-child only-child empty
                first-of-type last-of-type only-of-type
                nth-child(An+B|odd|even) nth-of-type(An+B|odd|even)
                not(simple-seq)

Matching is right-to-left with backtracking for descendant / general-sibling
combinators (the standard algorithm). Tag matching is ASCII-case-insensitive;
attribute names lowercase; attribute values case-sensitive; class matching is
whitespace-word based.
"""

from __future__ import annotations

from htmld_spark.engine.dom import ELEM, NULL, Document

# simple-selector opcodes (tuple programs — compile once, interpret fast)
_TAG = 0  # (op, tag_bytes)
_ANY = 1  # (op,)
_ID = 2  # (op, value_bytes)
_CLASS = 3  # (op, value_bytes)
_ATTR = 4  # (op, name_bytes, cmp_str, value_bytes|None)
_PSEUDO = 5  # (op, kind_str, arg)

_COMBINATORS = {" ", ">", "+", "~"}


class SelectorError(ValueError):
    """Raised by compile_selector on unparseable input (matching never raises)."""


class Selector:
    __slots__ = ("groups", "source")

    def __init__(self, groups, source: str):
        self.groups = groups  # list[list[(combinator, [parts])]] right-to-left
        self.source = source

    def __repr__(self):
        return f"Selector({self.source!r})"


# --------------------------------------------------------------------------- parse


def compile_selector(text: str) -> Selector:
    """S1: parse a selector-group string into a compiled Selector."""
    groups = []
    for alt in _split_top(text, ","):
        alt = alt.strip()
        if not alt:
            raise SelectorError(f"empty selector in group: {text!r}")
        groups.append(_parse_chain(alt))
    if not groups:
        raise SelectorError(f"empty selector: {text!r}")
    return Selector(groups, text)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside of [] () and quotes."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in "(['\"":
            if c in "'\"":
                j = s.find(c, i + 1)
                i = n if j < 0 else j
            else:
                depth += 1
        elif c in ")]":
            depth = max(0, depth - 1)
        elif c == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return out


def _parse_chain(s: str):
    """Parse one compound chain → [(combinator, parts)] in RIGHT-to-LEFT order;
    the rightmost entry has combinator None."""
    tokens = _tokenize_chain(s)
    chain = []
    comb = None
    for tok in tokens:
        if tok in _COMBINATORS:
            if comb is not None or not chain:
                raise SelectorError(f"misplaced combinator in {s!r}")
            comb = tok
        else:
            parts = _parse_seq(tok, s)
            chain.append((comb, parts))
            comb = None
    if comb is not None or not chain:
        raise SelectorError(f"dangling combinator in {s!r}")
    # Store right-to-left. Each entry keeps the combinator joining it to its
    # LEFT neighbor (the next entry in the reversed list); the leftmost seq's
    # combinator is None and is never consulted.
    return [(c, p) for (c, p) in reversed(chain)]


def _tokenize_chain(s: str) -> list[str]:
    """Split a chain into seq and combinator tokens, collapsing whitespace
    around explicit combinators."""
    out: list[str] = []
    i, n = 0, len(s)
    buf_start = None
    depth = 0
    while i < n:
        c = s[i]
        if c in "'\"" and depth > 0:
            j = s.find(c, i + 1)
            i = n if j < 0 else j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth = max(0, depth - 1)
        if depth == 0 and (c.isspace() or c in ">+~"):
            if buf_start is not None:
                out.append(s[buf_start:i])
                buf_start = None
            if c in ">+~":
                if out and out[-1] == " ":
                    out[-1] = c
                elif out and out[-1] in _COMBINATORS:
                    raise SelectorError(f"double combinator in {s!r}")
                else:
                    out.append(c)
            else:
                if out and out[-1] not in _COMBINATORS:
                    out.append(" ")
        else:
            if buf_start is None:
                buf_start = i
        i += 1
    if buf_start is not None:
        out.append(s[buf_start:])
    while out and out[-1] in _COMBINATORS:
        if out[-1] != " ":
            raise SelectorError(f"trailing combinator in {s!r}")
        out.pop()
    return out


_SIMPLE_STARTS = "#.[:"


def _parse_seq(tok: str, ctx: str):
    """Parse one compound simple-selector sequence into a parts list."""
    parts = []
    i, n = 0, len(tok)
    # leading tag or *
    if i < n and tok[i] not in _SIMPLE_STARTS:
        j = i
        while j < n and tok[j] not in _SIMPLE_STARTS:
            j += 1
        name = tok[i:j]
        if name == "*":
            parts.append((_ANY,))
        else:
            parts.append((_TAG, name.lower().encode()))
        i = j
    while i < n:
        c = tok[i]
        if c == "#":
            j = i + 1
            while j < n and tok[j] not in _SIMPLE_STARTS:
                j += 1
            if j == i + 1:
                raise SelectorError(f"empty #id in {ctx!r}")
            parts.append((_ID, tok[i + 1 : j].encode()))
            i = j
        elif c == ".":
            j = i + 1
            while j < n and tok[j] not in _SIMPLE_STARTS:
                j += 1
            if j == i + 1:
                raise SelectorError(f"empty .class in {ctx!r}")
            parts.append((_CLASS, tok[i + 1 : j].encode()))
            i = j
        elif c == "[":
            j = _find_close(tok, i, "[", "]")
            parts.append(_parse_attr(tok[i + 1 : j], ctx))
            i = j + 1
        elif c == ":":
            j = i + 1
            while j < n and (tok[j].isalnum() or tok[j] == "-"):
                j += 1
            kind = tok[i + 1 : j].lower()
            arg = None
            if j < n and tok[j] == "(":
                k = _find_close(tok, j, "(", ")")
                arg = tok[j + 1 : k]
                j = k + 1
            parts.append(_compile_pseudo(kind, arg, ctx))
            i = j
        else:
            raise SelectorError(f"unexpected {c!r} in {ctx!r}")
    if not parts:
        raise SelectorError(f"empty sequence in {ctx!r}")
    return parts


def _find_close(s: str, start: int, op: str, cl: str) -> int:
    depth = 0
    i, n = start, len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            j = s.find(c, i + 1)
            i = len(s) if j < 0 else j
        elif c == op:
            depth += 1
        elif c == cl:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise SelectorError(f"unclosed {op!r} in {s!r}")


def _parse_attr(body: str, ctx: str):
    """S6–S10: [a], [a=v], [a~=v], [a|=v], [a^=v], [a$=v], [a*=v]."""
    body = body.strip()
    # Operator search must stop at the first quote: in [href="a*=b"] the
    # '*=' inside the quoted value is data, not the comparison operator.
    qpos = len(body)
    for q in "'\"":
        i = body.find(q)
        if 0 <= i < qpos:
            qpos = i
    head = body[:qpos]
    for op in ("~=", "|=", "^=", "$=", "*=", "="):
        idx = head.find(op)
        if idx > 0:
            name = body[:idx].strip().lower()
            val = body[idx + len(op) :].strip()
            if len(val) >= 2 and val[0] in "'\"" and val[-1] == val[0]:
                val = val[1:-1]
            return (_ATTR, name.encode(), op, val.encode())
    if not body or any(c in body for c in "=~|^$*\"'[]"):
        raise SelectorError(f"bad attribute selector [{body}] in {ctx!r}")
    return (_ATTR, body.lower().encode(), None, None)


def _parse_nth(arg: str, ctx: str) -> tuple[int, int]:
    """Parse An+B | odd | even → (a, b)."""
    a = arg.strip().lower().replace(" ", "")
    if a == "odd":
        return (2, 1)
    if a == "even":
        return (2, 0)
    if "n" in a:
        head, _, tail = a.partition("n")
        if head in ("", "+"):
            A = 1
        elif head == "-":
            A = -1
        else:
            A = int(head)
        B = int(tail) if tail else 0
        return (A, B)
    return (0, int(a))


def _compile_pseudo(kind: str, arg, ctx: str):
    if kind in (
        "first-child",
        "last-child",
        "only-child",
        "empty",
        "first-of-type",
        "last-of-type",
        "only-of-type",
        "root",
    ):
        return (_PSEUDO, kind, None)
    if kind in ("nth-child", "nth-of-type", "nth-last-child", "nth-last-of-type"):
        if arg is None:
            raise SelectorError(f":{kind} needs an argument in {ctx!r}")
        return (_PSEUDO, kind, _parse_nth(arg, ctx))
    if kind == "not":
        if not arg:
            raise SelectorError(f":not needs an argument in {ctx!r}")
        return (_PSEUDO, "not", _parse_seq(arg.strip(), ctx))
    raise SelectorError(f"unsupported pseudo-class :{kind} in {ctx!r}")


# --------------------------------------------------------------------------- match


def _class_words(doc: Document, nid: int) -> list[bytes]:
    v = doc.attr(nid, b"class")
    return v.split() if v else []


def _prev_element(doc: Document, nid: int) -> int:
    p = doc.prev_sib[nid]
    while p != NULL and doc.kind[p] != ELEM:
        p = doc.prev_sib[p]
    return p


def _next_element(doc: Document, nid: int) -> int:
    p = doc.next_sib[nid]
    while p != NULL and doc.kind[p] != ELEM:
        p = doc.next_sib[p]
    return p


def _child_index(doc: Document, nid: int) -> int:
    """1-based index among element siblings."""
    i = 1
    p = _prev_element(doc, nid)
    while p != NULL:
        i += 1
        p = _prev_element(doc, p)
    return i


def _of_type_index(doc: Document, nid: int) -> int:
    tag = doc.tag[nid]
    i = 1
    p = _prev_element(doc, nid)
    while p != NULL:
        if doc.tag[p] == tag:
            i += 1
        p = _prev_element(doc, p)
    return i


def _nth_matches(a: int, b: int, idx: int) -> bool:
    if a == 0:
        return idx == b
    k, r = divmod(idx - b, a)
    return r == 0 and k >= 0


def _match_pseudo(doc: Document, nid: int, kind: str, arg) -> bool:
    if kind == "first-child":
        return _prev_element(doc, nid) == NULL
    if kind == "last-child":
        return _next_element(doc, nid) == NULL
    if kind == "only-child":
        return _prev_element(doc, nid) == NULL and _next_element(doc, nid) == NULL
    if kind == "empty":
        # no element children and no non-empty text/cdata children
        c = doc.first_child[nid]
        while c != NULL:
            k = doc.kind[c]
            if k == ELEM:
                return False
            if k in (2, 4) and doc.content[c]:  # TEXT, CDATA
                return False
            c = doc.next_sib[c]
        return True
    if kind == "first-of-type":
        return _of_type_index(doc, nid) == 1
    if kind == "last-of-type":
        tag = doc.tag[nid]
        p = _next_element(doc, nid)
        while p != NULL:
            if doc.tag[p] == tag:
                return False
            p = _next_element(doc, p)
        return True
    if kind == "only-of-type":
        if _of_type_index(doc, nid) != 1:
            return False
        tag = doc.tag[nid]
        p = _next_element(doc, nid)
        while p != NULL:
            if doc.tag[p] == tag:
                return False
            p = _next_element(doc, p)
        return True
    if kind == "nth-child":
        return _nth_matches(arg[0], arg[1], _child_index(doc, nid))
    if kind == "nth-last-child":
        idx = 1
        p = _next_element(doc, nid)
        while p != NULL:
            idx += 1
            p = _next_element(doc, p)
        return _nth_matches(arg[0], arg[1], idx)
    if kind == "nth-of-type":
        return _nth_matches(arg[0], arg[1], _of_type_index(doc, nid))
    if kind == "nth-last-of-type":
        tag = doc.tag[nid]
        idx = 1
        p = _next_element(doc, nid)
        while p != NULL:
            if doc.tag[p] == tag:
                idx += 1
            p = _next_element(doc, p)
        return _nth_matches(arg[0], arg[1], idx)
    if kind == "not":
        return not _match_seq(doc, nid, arg)
    if kind == "root":
        return doc.parent[nid] == 0
    return False


def _match_seq(doc: Document, nid: int, parts) -> bool:
    if doc.kind[nid] != ELEM:
        return False
    for part in parts:
        op = part[0]
        if op == _TAG:
            if doc.tag[nid] != part[1]:
                return False
        elif op == _ANY:
            pass
        elif op == _ID:
            if doc.attr(nid, b"id") != part[1]:
                return False
        elif op == _CLASS:
            if part[1] not in _class_words(doc, nid):
                return False
        elif op == _ATTR:
            _, name, cmp_op, val = part
            v = doc.attr(nid, name)
            if v is None:
                return False
            if cmp_op is None:
                continue
            if cmp_op == "=":
                if v != val:
                    return False
            elif cmp_op == "~=":
                if val not in v.split():
                    return False
            elif cmp_op == "|=":
                if not (v == val or v.startswith(val + b"-")):
                    return False
            elif cmp_op == "^=":
                if not (val and v.startswith(val)):
                    return False
            elif cmp_op == "$=":
                if not (val and v.endswith(val)):
                    return False
            elif cmp_op == "*=":
                if not (val and val in v):
                    return False
        else:  # _PSEUDO
            if not _match_pseudo(doc, nid, part[1], part[2]):
                return False
    return True


def _match_chain(doc: Document, nid: int, chain, idx: int) -> bool:
    comb, parts = chain[idx]
    if not _match_seq(doc, nid, parts):
        return False
    if idx + 1 >= len(chain):
        return True
    # chain[idx][0] is the combinator between this seq and its left neighbor
    # (entry idx+1 in the right-to-left chain).
    comb_between = comb
    if comb_between == ">":
        p = doc.parent[nid]
        return p > 0 and _match_chain(doc, p, chain, idx + 1)
    if comb_between == "+":
        p = _prev_element(doc, nid)
        return p != NULL and _match_chain(doc, p, chain, idx + 1)
    if comb_between == "~":
        p = _prev_element(doc, nid)
        while p != NULL:
            if _match_chain(doc, p, chain, idx + 1):
                return True
            p = _prev_element(doc, p)
        return False
    # descendant (" ") — any ancestor, with backtracking
    p = doc.parent[nid]
    while p > 0:
        if _match_chain(doc, p, chain, idx + 1):
            return True
        p = doc.parent[p]
    return False


def matches(doc: Document, nid: int, selector: Selector) -> bool:
    """S17: does element ``nid`` satisfy the selector (any group)."""
    for chain in selector.groups:
        if _match_chain(doc, nid, chain, 0):
            return True
    return False


def query_select_all(doc: Document, selector: Selector | str, root: int = 0):
    """S18: lazy document-order generator of matching element ids."""
    if isinstance(selector, str):
        selector = compile_selector(selector)
    kind = doc.kind
    for d in doc.descendants(root):
        if kind[d] == ELEM and matches(doc, d, selector):
            yield d


def query_select(doc: Document, selector: Selector | str, root: int = 0) -> int:
    """S19: first match in document order, or -1 (early exit via the lazy
    range, like the reference's querySelector = .front)."""
    return next(query_select_all(doc, selector, root), NULL)
