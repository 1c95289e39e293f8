"""M2 tokenizer pins (FIXTURES.md families 2–7; SURVEY.md §2.A.1 T1–T16).

Uses a recording handler; asserts on the exact event stream, byte offsets,
and the "never throws" property."""

import string

from hypothesis import given, settings, strategies as st

from htmld_spark.engine.tokenizer import tokenize


class Rec:
    def __init__(self, src: bytes):
        self.src = src
        self.events = []

    def on_text(self, s, e):
        self.events.append(("text", self.src[s:e], s, e))

    def on_entity(self, s, e, d):
        self.events.append(("entity", d, s, e))

    def on_open(self, name, raw, attrs, s, e, sc):
        # attrs is a sequence (tuple on the no-attr fast path, list otherwise)
        self.events.append(("open", name, list(attrs), s, e, sc))

    def on_close(self, name, s, e):
        self.events.append(("close", name, s, e))

    def on_comment(self, s, e):
        self.events.append(("comment", self.src[s:e]))

    def on_cdata(self, s, e):
        self.events.append(("cdata", self.src[s:e]))

    def on_doctype(self, s, e):
        self.events.append(("doctype", self.src[s:e]))

    def on_decl(self, s, e):
        self.events.append(("decl", self.src[s:e]))

    def on_pi(self, s, e):
        self.events.append(("pi", self.src[s:e]))

    def on_done(self, e):
        self.events.append(("done", e))


def tok(b: bytes):
    r = Rec(b)
    tokenize(b, r)
    return [ev for ev in r.events if ev[0] != "done"]


def kinds(b: bytes):
    return [ev[0] for ev in tok(b)]


# --- T1/T2/T5: text runs and simple tags -------------------------------------


def test_text_and_tags():
    ev = tok(b"a<b>c</b>d")
    assert ev == [
        ("text", b"a", 0, 1),
        ("open", b"b", [], 1, 4, False),
        ("text", b"c", 4, 5),
        ("close", b"b", 5, 9),
        ("text", b"d", 9, 10),
    ]


def test_tag_case_insensitive_name():
    ev = tok(b"<DiV>x</DIV>")
    assert ev[0][1] == b"div" and ev[2][1] == b"div"


# --- T3/T4: attributes --------------------------------------------------------


def test_attr_quoted():
    ev = tok(b'<a href="x" title=\'y\'>')
    assert ev[0][2] == [(b"href", b"x"), (b"title", b"y")]


def test_attr_unquoted_and_bare():
    ev = tok(b"<input type=text disabled>")
    assert ev[0][2] == [(b"type", b"text"), (b"disabled", None)]


def test_attr_unquoted_with_slash():
    ev = tok(b"<a href=/x/>")
    # '/' allowed in unquoted values → value '/x/', NOT self-closing
    assert ev[0][2] == [(b"href", b"/x/")]
    assert ev[0][5] is False


def test_attr_entities_decoded():
    ev = tok(b'<a title="a&amp;b&lt;">')
    assert ev[0][2] == [(b"title", b"a&b<")]


def test_attr_name_case_lowered():
    ev = tok(b"<a HREF=x ID=Y>")
    assert ev[0][2] == [(b"href", b"x"), (b"id", b"Y")]


def test_attr_weird_spacing():
    ev = tok(b"<a  b = 'c'   d= e f >")
    assert ev[0][2] == [(b"b", b"c"), (b"d", b"e"), (b"f", None)]


# --- T6: self-closing ----------------------------------------------------------


def test_self_closing():
    ev = tok(b"<br/><img src=x />")
    assert ev[0] == ("open", b"br", [], 0, 5, True)
    assert ev[1] == ("open", b"img", [(b"src", b"x")], 5, 18, True)


# --- T7: close-tag junk --------------------------------------------------------


def test_close_with_junk():
    ev = tok(b"</div junk junk>")
    assert ev == [("close", b"div", 0, 16)]


# --- T8-T11: comment/CDATA/doctype/PI -------------------------------------------


def test_comment():
    assert tok(b"<!--hi-->") == [("comment", b"hi")]
    assert tok(b"<!-- -- -->") == [("comment", b" -- ")]


def test_comment_unterminated():
    assert tok(b"x<!--oops") == [("text", b"x", 0, 1), ("comment", b"oops")]


def test_cdata():
    assert tok(b"<![CDATA[a<b]]>") == [("cdata", b"a<b")]
    assert tok(b"<![CDATA[open") == [("cdata", b"open")]


def test_doctype_and_decl():
    assert tok(b"<!DOCTYPE html>") == [("doctype", b"DOCTYPE html")]
    assert tok(b"<!ENTITY x>") == [("decl", b"ENTITY x")]


def test_pi():
    assert tok(b"<?php echo 1 ?>") == [("pi", b"php echo 1 ")]
    assert tok(b"<?xml version='1'?>") == [("pi", b"xml version='1'")]


# --- T12-T14: entities in text ---------------------------------------------------


def test_entities_in_text():
    ev = tok(b"a&amp;b")
    assert ev == [
        ("text", b"a", 0, 1),
        ("entity", b"&", 1, 6),
        ("text", b"b", 6, 7),
    ]


def test_invalid_entity_stays_text():
    ev = tok(b"a&bogus;b &amp c")
    assert ev == [("text", b"a&bogus;b &amp c", 0, 16)]


# --- T15: raw text / RCDATA -------------------------------------------------------


def test_script_raw_text():
    src = b'<script>if(a<b){x="</div>"}</script>'
    ev = tok(src)
    assert ev[0][1] == b"script"
    assert ev[1] == ("text", b'if(a<b){x="</div>"}', 8, 27)
    assert ev[2][0] == "close"


def test_script_close_case_insensitive_with_space():
    ev = tok(b"<SCRIPT>x</SCRIPT >")
    assert ev[1] == ("text", b"x", 8, 9)
    assert ev[2][0] == "close"


def test_script_no_entities():
    ev = tok(b"<script>&amp;</script>")
    assert ev[1] == ("text", b"&amp;", 8, 13)


def test_style_raw():
    ev = tok(b"<style>a>b{}</style>")
    assert ev[1] == ("text", b"a>b{}", 7, 12)


def test_title_rcdata():
    ev = tok(b"<title>a &amp; <b></title>")
    # entities decoded, tags NOT parsed
    assert [e[0] for e in ev] == ["open", "text", "entity", "text", "close"]
    assert ev[3] == ("text", b" <b>", 14, 18)


def test_script_unterminated():
    ev = tok(b"<script>var x=1;")
    assert ev[1] == ("text", b"var x=1;", 8, 16)


def test_script_false_terminator():
    ev = tok(b"<script>a</scriptx</script>")
    assert ev[1] == ("text", b"a</scriptx", 8, 18)


def test_self_closing_script_no_raw_mode():
    ev = tok(b"<script/>text")
    assert ev == [("open", b"script", [], 0, 9, True), ("text", b"text", 9, 13)]


# --- T16: malformed recovery --------------------------------------------------------


def test_stray_lt_is_text():
    ev = tok(b"a < b")
    assert b"".join(e[1] for e in ev if e[0] == "text") == b"a < b"


def test_lt_at_eof():
    ev = tok(b"ab<")
    assert ev == [("text", b"ab", 0, 2), ("text", b"<", 2, 3)]


def test_eof_inside_tag_dropped():
    assert tok(b"ok<div foo") == [("text", b"ok", 0, 2)]
    assert tok(b'ok<a href="x') == [("text", b"ok", 0, 2)]
    assert tok(b"ok</div") == [("text", b"ok", 0, 2)]


def test_bogus_close_skipped():
    assert tok(b"a</>b") == [("text", b"a", 0, 1), ("text", b"b", 4, 5)]
    assert tok(b"a</ div>b") == [("text", b"a", 0, 1), ("text", b"b", 8, 9)]


def test_empty_input():
    assert tok(b"") == []


# --- property: never throws; text offsets are consistent ------------------------------


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_never_throws_on_random_bytes(data):
    r = Rec(data)
    tokenize(data, r)
    assert r.events[-1][0] == "done"


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=string.printable + "<>&;/=\"'", max_size=120).map(
        lambda s: s.encode()
    )
)
def test_never_throws_on_markup_soup(data):
    r = Rec(data)
    tokenize(data, r)
    # every text event's slice must equal src[s:e] (offset integrity)
    for ev in r.events:
        if ev[0] == "text":
            assert ev[1] == data[ev[2] : ev[3]]


# --- ParserOptions (the reference's compile-time flag analog) -----------------


def tok_opts(b: bytes, **kw):
    from htmld_spark.engine.tokenizer import ParserOptions

    r = Rec(b)
    tokenize(b, r, options=ParserOptions(**kw))
    return [ev for ev in r.events if ev[0] != "done"]


def test_options_entities_off():
    ev = tok_opts(b"a&amp;b", entities=False)
    assert ev == [("text", b"a&amp;b", 0, 7)]


def test_options_comments_off():
    assert tok_opts(b"x<!--hidden-->y", comments=False) == [
        ("text", b"x", 0, 1),
        ("text", b"y", 14, 15),
    ]


def test_options_cdata_off():
    assert tok_opts(b"x<![CDATA[gone]]>y", cdata=False) == [
        ("text", b"x", 0, 1),
        ("text", b"y", 17, 18),
    ]


def test_options_raw_text_off():
    # script content tokenized as normal markup when raw_text disabled
    ev = tok_opts(b"<script><b>x</b></script>", raw_text=False)
    assert [e[0] for e in ev] == ["open", "open", "text", "close", "close"]


def test_options_rcdata_entities_follow_entity_flag():
    ev = tok_opts(b"<title>a&amp;b</title>", entities=False)
    assert [e[0] for e in ev] == ["open", "text", "close"]
    assert ev[1][1] == b"a&amp;b"


def test_options_default_unchanged():
    assert tok_opts(b"a&amp;b") == tok(b"a&amp;b")
