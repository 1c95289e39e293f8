"""Reference-shaped convenience API (engine/api.py): the surface an
upstream htmld user ports to — createDocument → querySelector/All →
.text/.outerHTML — as thin views over the arena engine."""

from htmld_spark.engine.api import create_document
from htmld_spark.engine.selector import SelectorError, compile_selector


def test_reference_workflow():
    doc = create_document(b'<div id="a"><p class="x">Hi</p><p>there</p></div>')
    n = doc.query_selector("#a p.x")
    assert n is not None and n.text == b"Hi"
    assert n.outer_html == b"<p class=x>Hi</p>"
    assert n.tag == b"p"
    assert [m.text for m in doc.query_selector_all("p")] == [b"Hi", b"there"]
    assert doc.query_selector("#nope") is None
    assert doc.text == b"Hithere"


def test_kin_links_and_attrs():
    doc = create_document("<ul><li Data-X='1'>a</li><li>b</li></ul>")
    ul = doc.query_selector("ul")
    li1 = ul.first_child
    assert li1.tag == b"li" and li1.attr("data-x") == b"1"
    assert li1.attr("DATA-X") == b"1"  # ci lookup
    li2 = li1.next_sibling
    assert li2.text == b"b" and li2.prev_sibling == li1
    assert li2.parent == ul and ul.last_child == li2
    assert [c.tag for c in ul.children] == [b"li", b"li"]
    assert ul in list(li2.ancestors)
    li1.set_attr("k", b"v")
    assert li1.attr("k") == b"v"
    li1.remove_attr("k")
    assert not li1.has_attr("k")


def test_compiled_selector_reuse_and_matches():
    sel = compile_selector("li:last-child")
    d1 = create_document("<ul><li>a<li>b</ul>")
    d2 = create_document("<ol><li>z</ol>")
    assert [n.text for n in d1.query_selector_all(sel)] == [b"b"]
    assert next(d2.query_selector_all(sel)).matches(sel)


def test_scoped_selection_and_tostring():
    doc = create_document("<div><span>in</span></div><span>out</span>")
    div = doc.query_selector("div")
    assert [n.text for n in div.query_selector_all("span")] == [b"in"]
    assert doc.to_string() == b"<div><span>in</span></div><span>out</span>"


def test_mutation_via_api():
    doc = create_document("<div id=a></div>")
    div = doc.query_selector("#a")
    p = doc.create_element("p")
    doc.append_child(div, p)
    assert div.html == b"<p></p>"


def test_never_raises_on_garbage():
    import os

    for payload in (b"", b"<<<", os.urandom(512), b"&#xD800;<a<b>"):
        d = create_document(payload)
        list(d.query_selector_all("*"))
        d.text


def test_selector_fuzz_errors_are_typed():
    """Selector compile on junk must raise SelectorError (never a bare
    exception) or succeed — fuzz over byte soup."""
    import random

    rng = random.Random(9)
    chars = "ab .#>[]+~:()*=\"'|$^,"
    for _ in range(300):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(1, 12)))
        try:
            compile_selector(s)
        except SelectorError:
            pass
