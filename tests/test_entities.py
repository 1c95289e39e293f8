"""M1 entity-decoding pins (FIXTURES.md family 2). These cases define the
byte-identity contract for char-refs (SURVEY.md §2.A.1 T12–T14)."""

from htmld_spark.engine.entities import decode_entities, decode_entity


def dec(s: bytes) -> bytes:
    return decode_entities(s)


def test_named_basic():
    assert dec(b"a &amp; b") == b"a & b"
    assert dec(b"&lt;tag&gt;") == b"<tag>"
    assert dec(b"&nbsp;") == "\xa0".encode("utf-8")
    assert dec(b"&Uuml;ber") == "Über".encode("utf-8")


def test_named_requires_semicolon():
    # htmld-pinned semantics: no ';' → literal (stdlib html.unescape would
    # decode these — we must not).
    assert dec(b"a &amp b") == b"a &amp b"
    assert dec(b"&lt") == b"&lt"


def test_unknown_named_literal():
    assert dec(b"&notareal;") == b"&notareal;"
    assert dec(b"&;") == b"&;"
    assert dec(b"& amp;") == b"& amp;"


def test_numeric_decimal():
    assert dec(b"&#65;") == b"A"
    assert dec(b"&#228;") == "ä".encode("utf-8")
    assert dec(b"&#65") == b"&#65"  # no semicolon → literal


def test_numeric_hex():
    assert dec(b"&#x41;") == b"A"
    assert dec(b"&#X41;") == b"A"
    assert dec(b"&#x1F4A9;") == "\U0001f4a9".encode("utf-8")
    assert dec(b"&#x;") == b"&#x;"


def test_numeric_out_of_range_literal():
    assert dec(b"&#0;") == b"&#0;"
    assert dec(b"&#1114112;") == b"&#1114112;"  # > U+10FFFF
    assert dec(b"&#xD800;") == b"&#xD800;"  # surrogate


def test_bare_ampersand():
    assert dec(b"fish & chips") == b"fish & chips"
    assert dec(b"&") == b"&"
    assert dec(b"a&&amp;&b") == b"a&&&b"


def test_decode_entity_offsets():
    assert decode_entity(b"x&amp;y", 1) == (b"&", 6)
    assert decode_entity(b"&#x41;", 0) == (b"A", 6)
    assert decode_entity(b"&bogus;", 0) is None


def test_adjacent_entities():
    assert dec(b"&amp;&amp;") == b"&&"
    assert dec(b"&gt;&#62;&#x3E;") == b">>>"
