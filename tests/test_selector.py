"""M5 selector-engine pins (FIXTURES.md family 8; SURVEY.md §2.A.4 S1–S19)."""

import pytest

from htmld_spark.engine.dom import parse_document
from htmld_spark.engine.selector import (
    SelectorError,
    compile_selector,
    matches,
    query_select,
    query_select_all,
)

PLAYGROUND = b"""
<html><body>
<div id="a" class="box big">
  <p class="intro">one</p>
  <p>two</p>
  <span data-x="alpha beta">three</span>
  <a href="https://example.com/page" hreflang="en-US">link</a>
</div>
<div id="b">
  <ul>
    <li>l1</li>
    <li class="sel">l2</li>
    <li>l3</li>
    <li>l4</li>
  </ul>
  <p></p>
</div>
<section><article><p id="deep">deep</p></article></section>
</body></html>
"""


@pytest.fixture(scope="module")
def doc():
    return parse_document(PLAYGROUND)


def ids(doc, sel):
    return [
        (doc.tag[n].decode(), (doc.attr(n, b"id") or b"").decode())
        for n in query_select_all(doc, sel)
    ]


def texts(doc, sel):
    from htmld_spark.engine.extract import inner_text

    return [inner_text(doc, n).decode() for n in query_select_all(doc, sel)]


# --- S2/S3: tag & universal ---------------------------------------------------


def test_tag(doc):
    assert texts(doc, "p") == ["one", "two", "", "deep"]


def test_tag_case_insensitive(doc):
    assert texts(doc, "P") == texts(doc, "p")
    assert texts(doc, "SPAN") == ["three"]


def test_universal(doc):
    assert len(list(query_select_all(doc, "*"))) == 17


# --- S4/S5: id & class -----------------------------------------------------------


def test_id(doc):
    assert ids(doc, "#a") == [("div", "a")]
    assert ids(doc, "div#b") == [("div", "b")]
    assert ids(doc, "#nope") == []


def test_class(doc):
    assert ids(doc, ".box") == [("div", "a")]
    assert ids(doc, ".big") == [("div", "a")]  # word-split match
    assert texts(doc, "p.intro") == ["one"]
    assert ids(doc, ".bo") == []  # no prefix matching


# --- S6–S10: attributes -------------------------------------------------------------


def test_attr_presence(doc):
    assert texts(doc, "[href]") == ["link"]
    assert texts(doc, "span[data-x]") == ["three"]


def test_attr_exact(doc):
    assert texts(doc, '[href="https://example.com/page"]') == ["link"]
    assert texts(doc, "[href='nope']") == []


def test_attr_word(doc):
    assert texts(doc, '[data-x~="beta"]') == ["three"]
    assert texts(doc, '[data-x~="bet"]') == []


def test_attr_dash(doc):
    assert texts(doc, '[hreflang|="en"]') == ["link"]
    assert texts(doc, '[hreflang|="en-US"]') == ["link"]
    assert texts(doc, '[hreflang|="e"]') == []


def test_attr_prefix_suffix_substring(doc):
    assert texts(doc, '[href^="https://"]') == ["link"]
    assert texts(doc, '[href$="/page"]') == ["link"]
    assert texts(doc, '[href*="example"]') == ["link"]
    assert texts(doc, '[href^="http://"]') == []


# --- S11–S14: combinators --------------------------------------------------------------


def test_descendant(doc):
    assert texts(doc, "#a p") == ["one", "two"]
    assert texts(doc, "body section p") == ["deep"]


def test_child(doc):
    assert texts(doc, "#a > p") == ["one", "two"]
    assert texts(doc, "section > p") == []
    assert texts(doc, "article > p") == ["deep"]


def test_adjacent_sibling(doc):
    assert texts(doc, "p + p") == ["two"]
    assert texts(doc, "p + span") == ["three"]
    assert texts(doc, "span + p") == []


def test_general_sibling(doc):
    assert texts(doc, "p ~ a") == ["link"]
    assert texts(doc, ".intro ~ span") == ["three"]
    assert texts(doc, "a ~ p") == []


# --- S15: pseudo-classes ------------------------------------------------------------------


def test_first_last_child(doc):
    assert texts(doc, "li:first-child") == ["l1"]
    assert texts(doc, "li:last-child") == ["l4"]
    assert texts(doc, "#a p:first-child") == ["one"]


def test_only_child(doc):
    assert ids(doc, "article:only-child") == [("article", "")]
    assert texts(doc, "li:only-child") == []


def test_empty(doc):
    assert ids(doc, "p:empty") == [("p", "")]


def test_nth_child(doc):
    assert texts(doc, "li:nth-child(2)") == ["l2"]
    assert texts(doc, "li:nth-child(odd)") == ["l1", "l3"]
    assert texts(doc, "li:nth-child(even)") == ["l2", "l4"]
    assert texts(doc, "li:nth-child(2n+1)") == ["l1", "l3"]
    assert texts(doc, "li:nth-child(n+3)") == ["l3", "l4"]
    assert texts(doc, "li:nth-child(-n+2)") == ["l1", "l2"]


def test_of_type(doc):
    assert texts(doc, "#a span:first-of-type") == ["three"]
    assert texts(doc, "#a p:last-of-type") == ["two"]
    assert texts(doc, "#a span:only-of-type") == ["three"]
    assert texts(doc, "#a p:only-of-type") == []


def test_not(doc):
    assert texts(doc, "#a p:not(.intro)") == ["two"]
    assert texts(doc, "li:not(:first-child)") == ["l2", "l3", "l4"]


# --- S16: groups ------------------------------------------------------------------------------


def test_groups(doc):
    assert texts(doc, ".intro, #deep") == ["one", "deep"]
    assert texts(doc, "span, a") == ["three", "link"]


# --- S17/S19 -------------------------------------------------------------------------------------


def test_matches_api(doc):
    sel = compile_selector("div.box")
    hits = [n for n in doc.descendant_elements() if matches(doc, n, sel)]
    assert len(hits) == 1


def test_query_select_first(doc):
    n = query_select(doc, "p")
    from htmld_spark.engine.extract import inner_text

    assert inner_text(doc, n) == b"one"
    assert query_select(doc, "#nope") == -1


# --- parse errors -----------------------------------------------------------------------------------


def test_selector_errors():
    for bad in ["", ",", "div >", "> div", "div >> p", ":bogus-pseudo", "[=x]"]:
        with pytest.raises(SelectorError):
            compile_selector(bad)


def test_attr_operator_inside_quoted_value():
    """Operator search must be quote-aware: in [href="a*=b"] the '*=' is
    data, so the selector is an EXACT match on the literal value
    (ADVICE r01)."""
    d = parse_document(b'<a href="a*=b">x</a><a href="ab">y</a>')
    from htmld_spark.engine.extract import inner_text

    sel = compile_selector('[href="a*=b"]')
    hits = list(query_select_all(d, sel))
    assert [inner_text(d, n) for n in hits] == [b"x"]
    # and a real substring operator still works alongside quoted values
    sel2 = compile_selector('[href*="*="]')
    assert [inner_text(d, n) for n in query_select_all(d, sel2)] == [b"x"]


def test_compile_once_reuse(doc):
    sel = compile_selector("#b li.sel")
    assert [doc.attr(n, b"class") for n in query_select_all(doc, sel)] == [b"sel"]
    # same compiled object works across documents
    d2 = parse_document(b"<ul id=b><li class=sel>z</li></ul>")
    assert len(list(query_select_all(d2, sel))) == 1


def test_nth_last_child_and_of_type(doc):
    assert texts(doc, "li:nth-last-child(1)") == ["l4"]
    assert texts(doc, "li:nth-last-child(odd)") == ["l2", "l4"]
    assert texts(doc, "#a p:nth-last-of-type(1)") == ["two"]
    assert texts(doc, "#a p:nth-last-of-type(2)") == ["one"]


def test_root_pseudo(doc):
    """:root matches exactly the document's top element(s) — html here —
    and composes with combinators and :not."""
    hits = list(query_select_all(doc, compile_selector(":root")))
    assert [doc.tag[n] for n in hits] == [b"html"]
    assert texts(doc, ":root #deep") == ["deep"]
    assert texts(doc, "html:root #deep") == ["deep"]
    assert texts(doc, "div:root") == []  # html is the root, div isn't
    # fragment documents: every top-level element is a root
    frag = parse_document(b"<div>x</div><div>y</div>")
    assert len(list(query_select_all(frag, compile_selector(":root")))) == 2
    # :not(:root) excludes only the root
    non_roots = list(query_select_all(doc, compile_selector("*:not(:root)")))
    assert b"html" not in [doc.tag[n] for n in non_roots]
