"""M4 extraction pins (SURVEY.md §2.A.5 X1–X6; FIXTURES.md families 1, 10)."""

from htmld_spark.engine.dom import parse_document
from htmld_spark.engine.extract import (
    element_spans,
    inner_html,
    inner_text,
    main_text,
    outer_html,
)


# --- X1: innerText (raw concat, no normalization) --------------------------------


def test_inner_text_raw():
    d = parse_document(b"<div> a \n b <b>c</b></div>")
    assert inner_text(d) == b" a \n b c"


def test_inner_text_includes_script():
    # script/style content is ordinary Text in raw-text mode → included in X1
    d = parse_document(b"<p>a</p><script>var x;</script>")
    assert inner_text(d) == b"avar x;"


def test_inner_text_entities_decoded():
    d = parse_document(b"<p>x &amp; y &#228;</p>")
    assert inner_text(d) == "x & y ä".encode()


def test_inner_text_subtree():
    d = parse_document(b"<div>a<p>b</p>c</div>")
    div = next(d.descendant_elements())
    p = next(d.descendant_elements(div))
    assert inner_text(d, p) == b"b"
    assert inner_text(d, div) == b"abc"


# --- X2/X3: innerHTML / outerHTML --------------------------------------------------


def test_outer_html_simple():
    d = parse_document(b'<div id="a"><p>hi</p></div>')
    div = next(d.descendant_elements())
    # safe value -> unquoted on output (requiresQuotes)
    assert outer_html(d, div) == b"<div id=a><p>hi</p></div>"


def test_inner_html():
    d = parse_document(b"<div><p>a</p><p>b</p></div>")
    div = next(d.descendant_elements())
    assert inner_html(d, div) == b"<p>a</p><p>b</p>"


def test_escaping_on_serialize():
    d = parse_document(b"<p>a &amp; b &lt;c&gt;</p>")
    p = next(d.descendant_elements())
    # decoded text re-escapes on output
    assert outer_html(d, p) == b"<p>a &amp; b &lt;c&gt;</p>"


def test_attr_quoting():
    d = parse_document(b"<a href=x title='s\"q'>t</a>")
    a = next(d.descendant_elements())
    # href=x is quote-free -> bare; title contains a quote -> quoted+escaped
    assert outer_html(d, a) == b'<a href=x title="s&quot;q">t</a>'


def test_valueless_attr_serialized_bare():
    d = parse_document(b"<input disabled type=text>")
    a = next(d.descendant_elements())
    assert outer_html(d, a) == b"<input disabled type=text />"


def test_void_serialization():
    d = parse_document(b"<div><br>x<img src=y></div>")
    div = next(d.descendant_elements())
    # unquoted value + void close gets a separating space (fixed point)
    assert outer_html(d, div) == b"<div><br/>x<img src=y /></div>"


def test_requires_quotes_matrix():
    """requiresQuotes (src/html/utils.d [recalled]): quote iff empty or
    contains whitespace, a quote char, '=', '<', '>' or backtick."""
    cases = [
        (b"v", b"<p a=v>x</p>"),
        (b"/deep/path/", b"<p a=/deep/path/>x</p>"),
        (b"", b'<p a="">x</p>'),
        (b"two words", b'<p a="two words">x</p>'),
        (b"a=b", b'<p a="a=b">x</p>'),
        (b"a<b", b'<p a="a<b">x</p>'),
        (b"a>b", b'<p a="a>b">x</p>'),
        (b"a`b", b'<p a="a`b">x</p>'),
        (b"d'q", b"<p a=\"d'q\">x</p>"),
        (b"a&b", b"<p a=a&amp;b>x</p>"),  # & escapes but needs no quotes
    ]
    for val, expected in cases:
        d = parse_document(b"<p>x</p>")
        n = next(d.descendant_elements())
        d.set_attr(n, b"a", val)
        assert outer_html(d, n) == expected, val


def test_requires_quotes_exotic_matrix():
    """VERDICT r03 missing #5: exotic attr values — each quote-forcing
    byte individually, mixed/only quotes, control bytes, multibyte UTF-8,
    NBSP (NOT ascii whitespace → stays unquoted), entity look-alikes,
    trailing slash on a non-void tag, long values. Every case must also be
    a serialization fixed point (parse→serialize→parse→serialize
    byte-identical)."""
    cases = [
        (b"a\tb", b'<p a="a\tb">x</p>'),
        (b"a\nb", b'<p a="a\nb">x</p>'),
        (b"a\fb", b'<p a="a\fb">x</p>'),
        (b"a\rb", b'<p a="a\rb">x</p>'),
        (b"'", b"<p a=\"'\">x</p>"),
        (b'"', b'<p a="&quot;">x</p>'),
        (b"a\"b'c", b'<p a="a&quot;b\'c">x</p>'),
        (b"=", b'<p a="=">x</p>'),
        (b"=v", b'<p a="=v">x</p>'),
        (b"\xc3\xa9t\xc3\xa9", b"<p a=\xc3\xa9t\xc3\xa9>x</p>"),  # été
        (b"\xf0\x9f\x98\x80", b"<p a=\xf0\x9f\x98\x80>x</p>"),  # emoji
        (b"\xa0", b"<p a=\xa0>x</p>"),  # NBSP byte: not ascii ws
        (b"\x01\x02", b"<p a=\x01\x02>x</p>"),  # control bytes ride raw
        (b"&amp;", b"<p a=&amp;amp;>x</p>"),  # pre-escaped stays literal
        (b"&#65;", b"<p a=&amp;#65;>x</p>"),
        (b"trail/", b"<p a=trail/>x</p>"),  # p is non-void: '/' is value
        (b"a" * 4096, b"<p a=" + b"a" * 4096 + b">x</p>"),
    ]
    from htmld_spark.engine.dom import parse_document as P

    for val, expected in cases:
        d = parse_document(b"<p>x</p>")
        n = next(d.descendant_elements())
        d.set_attr(n, b"a", val)
        s1 = outer_html(d, n)
        assert s1 == expected, val
        # fixed point
        d2 = P(s1)
        n2 = next(d2.descendant_elements())
        assert outer_html(d2, n2) == s1, val


def test_raw_text_not_escaped():
    src = b"<script>if(a<b){}</script>"
    d = parse_document(src)
    s = next(d.descendant_elements())
    assert outer_html(d, s) == src


def test_comment_cdata_doctype_roundtrip():
    src = b"<!DOCTYPE html><!--c--><div><![CDATA[x<y]]></div><?pi?>"
    d = parse_document(src)
    assert outer_html(d, 0) == src


def test_tag_case_preserved():
    d = parse_document(b"<DiV CLASS=x>t</dIv>")
    n = next(d.descendant_elements())
    assert outer_html(d, n) == b"<DiV class=x>t</DiV>"


# --- X5: spans ------------------------------------------------------------------------


def test_spans_table():
    src = b"<div><p>hi</p><p>yo</p></div>"
    d = parse_document(src)
    spans = element_spans(d)
    assert [s["tag"] for s in spans] == ["div", "p", "p"]
    by_tag = {(s["tag"], s["node_id"]): s for s in spans}
    root_span = spans[0]
    assert root_span["start"] == 0 and root_span["end"] == len(src)
    # node_id monotone in document order
    assert [s["node_id"] for s in spans] == sorted(s["node_id"] for s in spans)
    # child ⊆ parent
    for s in spans[1:]:
        assert s["start"] >= root_span["start"] and s["end"] <= root_span["end"]
    # text offsets index into innerText
    txt = inner_text(d)
    p1 = spans[1]
    assert txt[p1["text_start"] : p1["text_end"]] == b"hi"


# --- X6: main_text ---------------------------------------------------------------------


def test_main_text_strips_boilerplate():
    src = (
        b"<html><head><title>T</title><script>junk()</script></head>"
        b"<body><nav>menu</nav>"
        b"<main><h1>Head</h1><p>Para one.</p><p>Para two.</p></main>"
        b"<footer>foot</footer></body></html>"
    )
    d = parse_document(src)
    assert main_text(d) == b"Head\nPara one.\nPara two."


def test_main_text_container_priority():
    src = b"<body><div>junk</div><article><p>real</p></article></body>"
    d = parse_document(src)
    assert main_text(d) == b"real"


def test_main_text_id_content():
    src = b"<body><div id=content><p>a</p><p>b</p></div><div>noise</div></body>"
    d = parse_document(src)
    assert main_text(d) == b"a\nb"


def test_main_text_falls_back_to_body():
    src = b"<body><div><p>x y</p></div></body>"
    d = parse_document(src)
    assert main_text(d) == b"x y"


def test_main_text_whitespace_collapse():
    src = b"<main><p>  a \n\n b  </p><p>\t c </p></main>"
    d = parse_document(src)
    assert main_text(d) == b"a b\nc"


def test_main_text_br_splits_blocks():
    src = b"<main>line one<br>line two</main>"
    d = parse_document(src)
    assert main_text(d) == b"line one\nline two"


def test_main_text_inline_merge():
    src = b"<main><p>a <b>bold</b> c</p></main>"
    d = parse_document(src)
    assert main_text(d) == b"a bold c"


def test_main_text_no_body():
    d = parse_document(b"<p>just text</p>")
    assert main_text(d) == b"just text"


def test_main_text_deterministic():
    src = b"<body><main><p>z</p></main></body>" * 1
    assert main_text(parse_document(src)) == main_text(parse_document(src))


def test_main_text_nested_list():
    src = b"<main><ul><li>a</li><li>b<ul><li>b1</li></ul></li></ul></main>"
    d = parse_document(src)
    assert main_text(d) == b"a\nb\nb1"


def test_serializer_fixed_point_on_fixture_corpus():
    """outerHTML is a serialization fixed point: parse→serialize→parse→
    serialize must be byte-identical to the first serialization (the DOM of
    serialized output re-parses to the same DOM). Run over a fixture slice
    covering every template family."""
    import pyarrow.parquet as pq

    from fixtures.gen_pages import ensure_pages

    htmls = (
        pq.read_table(ensure_pages("0.001"), columns=["html"])
        .column("html")
        .to_pylist()[:60]
    )
    for h in htmls:
        once = outer_html(parse_document(h), 0)
        twice = outer_html(parse_document(once), 0)
        assert once == twice


def test_mutation_fuzz_invariants():
    """Seeded mutation fuzz over fixture pages (compact CI version of the
    6000-trial offline run, 0 failures): never-throw, span nesting + offset
    invariants, DOM-walk == TextSink innerText, determinism, serializer
    fixed point."""
    import random

    import pyarrow.parquet as pq

    from fixtures.gen_pages import ensure_pages
    from htmld_spark.engine.extract import (
        element_spans,
        fast_inner_text,
        inner_text,
        main_text,
    )

    htmls = [
        h
        for h in pq.read_table(ensure_pages("0.001"), columns=["html"])
        .column("html")
        .to_pylist()
        if len(h) < 50_000
    ][:120]
    rng = random.Random(1234)
    for trial in range(400):
        base = bytearray(rng.choice(htmls))
        for _ in range(rng.randint(1, 8)):
            op = rng.randrange(3)
            pos = rng.randrange(len(base)) if base else 0
            if op == 0 and base:
                base[pos] = rng.choice(b'<>&"\'/=! -azAZ09')
            elif op == 1 and len(base) > 1:
                del base[pos]
            else:
                base[pos:pos] = bytes([rng.choice(b'<>&"\'/=!')])
        h = bytes(base)
        d = parse_document(h)
        spans = element_spans(d)
        by_id = {s["node_id"]: s for s in spans}
        for s in spans:
            assert s["end"] >= s["start"] and s["text_end"] >= s["text_start"]
            p = s["parent_id"]
            if p in by_id:
                ps = by_id[p]
                assert ps["start"] <= s["start"] and s["end"] <= ps["end"]
                assert ps["text_start"] <= s["text_start"]
                assert s["text_end"] <= ps["text_end"]
        assert inner_text(d, 0) == fast_inner_text(h)
        assert main_text(d) == main_text(parse_document(h))
        once = outer_html(d, 0)
        assert once == outer_html(parse_document(once), 0)
