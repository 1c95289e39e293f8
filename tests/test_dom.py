"""M3 DOM-builder pins (FIXTURES.md families 3–4, 9; SURVEY.md §2.A.2–2.A.3).

These encode the implied-end-tag / misnesting-recovery contract (D5/D6) —
the #1 byte-identity risk per SURVEY.md §7."""

from hypothesis import given, settings, strategies as st

from htmld_spark.engine.dom import ELEM, NULL, TEXT, parse_document
from htmld_spark.engine.extract import inner_text, outer_html


def tags(doc, parent=0):
    return [doc.tag[c] for c in doc.element_children(parent)]


def tree(doc, nid=0, depth=0):
    """Render element tree as nested list of (tag, [children])."""
    out = []
    for c in doc.element_children(nid):
        out.append((doc.tag[c].decode(), tree(doc, c)))
    return out


# --- basic structure -----------------------------------------------------------


def test_simple_nesting():
    d = parse_document(b"<html><body><div><p>hi</p></div></body></html>")
    assert tree(d) == [("html", [("body", [("div", [("p", [])])])])]


def test_text_node_content():
    d = parse_document(b"<p>a&amp;b</p>")
    p = next(d.descendant_elements())
    kids = list(d.children(p))
    assert len(kids) == 1 and d.kind[kids[0]] == TEXT
    assert d.content[kids[0]] == b"a&b"  # D8: entity folded into one text node


def test_adjacent_text_folding():
    # stray '<' emits separate tokenizer events but ONE text node (D8)
    d = parse_document(b"<p>a < b &amp; c</p>")
    p = next(d.descendant_elements())
    kids = list(d.children(p))
    assert len(kids) == 1
    assert d.content[kids[0]] == b"a < b & c"


# --- D3/D4: void and self-closing ---------------------------------------------------


def test_void_elements_no_children():
    d = parse_document(b"<div><br>text<img src=x>more</div>")
    div = next(d.descendant_elements())
    assert tags(d, div) == [b"br", b"img"]
    assert inner_text(d, div) == b"textmore"


def test_self_closing_div():
    d = parse_document(b"<div/><span>x</span>")
    assert tags(d) == [b"div", b"span"]
    assert tree(d)[0] == ("div", [])


# --- D5: implied end tags ---------------------------------------------------------------


def test_li_closes_li():
    d = parse_document(b"<ul><li>a<li>b<li>c</ul>")
    assert tree(d) == [("ul", [("li", []), ("li", []), ("li", [])])]


def test_p_closes_p():
    d = parse_document(b"<p>x<p>y")
    assert tree(d) == [("p", []), ("p", [])]


def test_p_closed_by_div():
    d = parse_document(b"<p>x<div>y</div>")
    assert tree(d) == [("p", []), ("div", [])]


def test_table_cells():
    d = parse_document(b"<table><tr><td>a<td>b<tr><td>c</table>")
    assert tree(d) == [
        (
            "table",
            [
                ("tr", [("td", []), ("td", [])]),
                ("tr", [("td", [])]),
            ],
        )
    ]


def test_dl_dt_dd():
    d = parse_document(b"<dl><dt>t<dd>d<dt>t2</dl>")
    assert tree(d) == [("dl", [("dt", []), ("dd", []), ("dt", [])])]


def test_options():
    d = parse_document(b"<select><option>a<option>b</select>")
    assert tree(d) == [("select", [("option", []), ("option", [])])]


def test_li_nested_list_not_closed():
    # a nested <ul> inside <li> must NOT close the li
    d = parse_document(b"<ul><li>a<ul><li>b</ul></li></ul>")
    assert tree(d) == [("ul", [("li", [("ul", [("li", [])])])])]


# --- D6: misnesting recovery ----------------------------------------------------------------


def test_unclosed_span_closed_by_div():
    d = parse_document(b"<div><span>x</div>y")
    assert tree(d) == [("div", [("span", [])])]
    assert inner_text(d) == b"xy"


def test_stray_close_ignored():
    d = parse_document(b"a</b>c")
    assert tree(d) == []
    assert inner_text(d) == b"ac"


def test_misnested_inline():
    # <b><i>x</b>y</i> → </b> pops i and b; y lands in root; </i> ignored
    d = parse_document(b"<b><i>x</b>y</i>")
    assert tree(d) == [("b", [("i", [])])]
    assert inner_text(d) == b"xy"


def test_eof_auto_close():
    d = parse_document(b"<div><p>open")
    assert tree(d) == [("div", [("p", [])])]
    assert d.raw_end[1] == len(b"<div><p>open")


# --- spans (X5 bookkeeping done during build) ---------------------------------------------------


def test_raw_spans():
    src = b"<div><p>hi</p></div>"
    d = parse_document(src)
    div, p = list(d.descendant_elements())
    assert (d.raw_start[div], d.raw_end[div]) == (0, 20)
    assert (d.raw_start[p], d.raw_end[p]) == (5, 14)
    assert src[d.raw_start[p] : d.raw_end[p]] == b"<p>hi</p>"


def test_text_spans():
    d = parse_document(b"<div>ab<p>cd</p>ef</div>")
    div, p = list(d.descendant_elements())
    assert (d.text_start[div], d.text_end[div]) == (0, 6)
    assert (d.text_start[p], d.text_end[p]) == (2, 4)
    assert inner_text(d)[d.text_start[p] : d.text_end[p]] == b"cd"


def test_span_nesting_invariant():
    src = b"<a><b><c>x</c><d>y</d></b></a><e>z</e>"
    d = parse_document(src)
    for nid in d.descendant_elements():
        par = d.parent[nid]
        if par != 0:
            assert d.raw_start[par] <= d.raw_start[nid]
            assert d.raw_end[nid] <= d.raw_end[par]
            assert d.text_start[par] <= d.text_start[nid]
            assert d.text_end[nid] <= d.text_end[par]


# --- attributes ------------------------------------------------------------------------------------


def test_attr_first_wins():
    d = parse_document(b"<a x=1 x=2>")
    a = next(d.descendant_elements())
    assert d.attr(a, b"x") == b"1"


def test_valueless_attr():
    d = parse_document(b"<input disabled>")
    a = next(d.descendant_elements())
    assert d.has_attr(a, b"disabled")
    assert d.attr(a, b"disabled") == b""
    assert d.attr(a, b"nope") is None


def test_tag_case_preserved_match_lowered():
    d = parse_document(b"<DiV>x</div>")
    a = next(d.descendant_elements())
    assert d.tag[a] == b"div"
    assert d.tag_raw[a] == b"DiV"
    assert outer_html(d, a) == b"<DiV>x</DiV>"


# --- property: build never throws, arena links are consistent ------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_build_never_throws(data):
    d = parse_document(data)
    # link consistency: every child's parent points back
    for nid in range(1, d.n_nodes()):
        p = d.parent[nid]
        assert p != NULL
        assert nid in list(d.children(p))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<div>",
                "</div>",
                "<p>",
                "<li>",
                "<ul>",
                "</ul>",
                "text",
                "<br>",
                "&amp;",
                "<b>",
                "</i>",
                "<td>",
                "<tr>",
                "<table>",
            ]
        ),
        max_size=30,
    ).map(lambda parts: "".join(parts).encode())
)
def test_markup_soup_invariants(data):
    d = parse_document(data)
    n = d.n_nodes()
    for nid in range(1, n):
        if d.kind[nid] == ELEM:
            assert 0 <= d.raw_start[nid] <= d.raw_end[nid] <= len(data)
            assert 0 <= d.text_start[nid] <= d.text_end[nid]


def test_dom_options_analog():
    """DOMOptions — the DOMCreateOptions analog (builder-side gating)."""
    from htmld_spark.engine.dom import COMMENT, DOMOptions, PI, parse_document

    src = b"<div>a<!--c-->b<?pi?><ul><li>x<li>y</ul></div>"
    d = parse_document(src)
    kinds = [d.kind[n] for n in d.descendants(0)]
    assert COMMENT in kinds and PI in kinds
    # drop comments + PI: adjacent text folds, nodes absent
    d2 = parse_document(src, dom_options=DOMOptions(keep_comments=False,
                                                    keep_pi_decl=False))
    kinds2 = [d2.kind[n] for n in d2.descendants(0)]
    assert COMMENT not in kinds2 and PI not in kinds2
    from htmld_spark.engine.extract import inner_text

    assert inner_text(d2, 0) == b"abxy"
    # text folding across the dropped comment: "a" + "b" is ONE text node
    texts = [d2.content[n] for n in d2.descendants(0) if d2.kind[n] == 2]
    assert b"ab" in texts
    # strict nesting: without implied end tags, <li>y nests inside <li>x
    d3 = parse_document(src, dom_options=DOMOptions(implied_end_tags=False))
    lis = [n for n in d3.descendants(0) if d3.kind[n] == 1 and d3.tag[n] == b"li"]
    assert d3.parent[lis[1]] == lis[0]  # nested, not sibling
    d4 = parse_document(src)
    lis4 = [n for n in d4.descendants(0) if d4.kind[n] == 1 and d4.tag[n] == b"li"]
    assert d4.parent[lis4[1]] == d4.parent[lis4[0]]  # default: siblings
