"""X7 mutation API and the DOM-free TextSink handler (SURVEY.md §2.A.5 X7,
§2.A.6)."""

from hypothesis import given, settings, strategies as st

from htmld_spark.engine.dom import NULL, parse_document
from htmld_spark.engine.extract import fast_inner_text, inner_text, outer_html


def test_create_and_append():
    d = parse_document(b"<div id=a></div>")
    div = next(d.descendant_elements())
    p = d.create_element(b"p")
    d.append_child(div, p)
    d.append_child(p, d.create_text(b"hi"))
    assert outer_html(d, div) == b"<div id=a><p>hi</p></div>"


def test_insert_before():
    d = parse_document(b"<ul><li>b</li></ul>")
    ul = next(d.descendant_elements())
    first = d.first_child[ul]
    li = d.create_element(b"li")
    d.append_child(li, d.create_text(b"a"))
    d.insert_before(ul, li, first)
    assert inner_text(d, ul) == b"ab"
    d.insert_before(ul, d.create_text(b"!"), NULL)  # null ref → append
    assert inner_text(d, ul) == b"ab!"


def test_detach():
    d = parse_document(b"<div><span>x</span><b>y</b></div>")
    div = next(d.descendant_elements())
    span = d.first_child[div]
    d.detach(span)
    assert outer_html(d, div) == b"<div><b>y</b></div>"


def test_set_text():
    d = parse_document(b"<p><b>old</b> stuff</p>")
    p = next(d.descendant_elements())
    d.set_text(p, b"new")
    assert outer_html(d, p) == b"<p>new</p>"


def test_set_inner_html_fragment_reparse():
    d = parse_document(b"<div>old</div>")
    div = next(d.descendant_elements())
    d.set_inner_html(div, b"<p class=x>a<p>b")  # implied end tags apply
    assert outer_html(d, div) == b"<div><p class=x>a</p><p>b</p></div>"


def test_set_attr_remove_attr():
    d = parse_document(b"<a>t</a>")
    a = next(d.descendant_elements())
    d.set_attr(a, b"HREF", b"/x")  # name lowered
    assert d.attr(a, b"href") == b"/x"
    d.remove_attr(a, b"href")
    assert d.attr(a, b"href") is None


def test_text_sink_equals_dom_inner_text():
    cases = [
        b"<div>a<p>b</p>c</div>",
        b"<script>x<y</script>t",
        b"a &amp; b &#65;",
        b"<title>t &lt; u</title>",
        b"<![CDATA[raw]]>tail",
        b"broken <<< &bogus; </nope> end",
    ]
    for html in cases:
        assert fast_inner_text(html) == inner_text(parse_document(html)), html


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_text_sink_property(data):
    assert fast_inner_text(data) == inner_text(parse_document(data))
