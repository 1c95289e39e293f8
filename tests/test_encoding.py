"""Charset sniff + UTF-8 normalization (engine/encoding.py, X11):
WHATWG label registry, BOM/meta-prescan/fallback ladder, the zero-copy
identity fast path, and the never-raise contract. Semantics are pinned
by the multi-charset fixture (fixtures/gen_encodings.py — html bytes
serialized through each codec's own encoder, expected text composed
independently from the logical lines)."""

import codecs
import random

from htmld_spark.engine import main_text, parse_document
from htmld_spark.engine.encoding import _LABELS, sniff_encoding, to_utf8


def test_every_label_resolves():
    """Every registry value must be a real stdlib codec (a typo here
    would turn into a silent fallback at crawl time)."""
    for label, codec in _LABELS.items():
        codecs.lookup(codec)
        assert label == label.strip().lower()


def test_bom_wins():
    assert sniff_encoding(b"\xef\xbb\xbf<meta charset=latin1>") == (
        "utf-8", "bom",
    )
    assert sniff_encoding(b"\xff\xfex\x00") == ("utf-16-le", "bom")
    assert sniff_encoding(b"\xfe\xff\x00x") == ("utf-16-be", "bom")


def test_meta_prescan_forms():
    assert sniff_encoding(b"<meta charset=latin1>") == ("cp1252", "meta")
    assert sniff_encoding(b'<meta charset="Shift_JIS">') == ("cp932", "meta")
    assert sniff_encoding(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=EUC-KR">'
    ) == ("cp949", "meta")
    # first RECOGNIZED label wins; junk labels are skipped
    assert sniff_encoding(
        b"<meta charset=banana><meta charset=koi8-r>"
    ) == ("koi8-r", "meta")
    # a charset= outside a <meta tag is not a declaration
    assert sniff_encoding(b"<p>charset=koi8-r</p>") == ("utf-8", "utf-8")
    # inside the widened 4096-byte batch window: still seen
    late = b"<p>" + b"x" * 1100 + b"</p><meta charset=koi8-r>"
    assert sniff_encoding(late) == ("koi8-r", "meta")
    # beyond the window: not seen
    very_late = b"<p>" + b"x" * 4200 + b"</p><meta charset=koi8-r>"
    assert sniff_encoding(very_late) == ("utf-8", "utf-8")


def test_prescan_edge_rules():
    # declared utf-16 over ASCII-compatible bytes -> read as UTF-8
    assert sniff_encoding(b"<meta charset=utf-16>x") == ("utf-8", "meta")
    # x-user-defined -> windows-1252 (the prescan post-processing rule)
    assert sniff_encoding(b"<meta charset=x-user-defined>") == (
        "cp1252", "meta",
    )


def test_transport_precedence():
    """BOM > transport (HTTP Content-Type) > meta prescan."""
    from htmld_spark.engine.encoding import content_type_charset

    assert sniff_encoding(b"<meta charset=koi8-r>x", "windows-1251") == (
        "cp1251", "transport",
    )
    assert sniff_encoding(b"\xef\xbb\xbfx", "shift_jis") == ("utf-8", "bom")
    # unrecognized transport label falls through to the prescan
    assert sniff_encoding(b"<meta charset=koi8-r>x", "bogus-cs") == (
        "koi8-r", "meta",
    )
    # transport-level utf-16 is authoritative; a PRESCAN utf-16 label is
    # self-refuting and reads as utf-8 (html5 post-processing rule)
    assert sniff_encoding(b"\x00a\x00b", "utf-16be") == (
        "utf-16-be", "transport",
    )
    assert sniff_encoding(b"<meta charset=utf-16be>ab") == ("utf-8", "meta")
    src = "<main><p>données</p></main>"
    assert to_utf8(src.encode("utf-16-be"), "utf-16be")[0] == src.encode()

    assert content_type_charset("text/html; charset=UTF-8") == "utf-8"
    assert content_type_charset('a/b; charset="Shift_JIS"') == "shift_jis"
    assert content_type_charset("text/html") is None
    assert content_type_charset(None) is None
    assert content_type_charset(b"text/html;charset=latin1") == "latin1"
    assert content_type_charset("a/b; boundary=x; charset=koi8-r") == "koi8-r"
    assert content_type_charset("a/b; charset=") is None


def test_bomless_utf16_nul_pattern():
    """BOM-less UTF-16 detection: dense one-sided NULs decide; sparse
    or two-sided NULs fall through to the usual ladder."""
    src = "<html><body><main><p>bomless utf16 page</p></main></body></html>"
    assert sniff_encoding(src.encode("utf-16-le")) == (
        "utf-16-le", "nul-pattern",
    )
    assert sniff_encoding(src.encode("utf-16-be")) == (
        "utf-16-be", "nul-pattern",
    )
    out, codec, source = to_utf8(src.encode("utf-16-le"))
    assert out == src.encode() and source == "nul-pattern"
    # sparse NULs: not utf-16 (NUL is valid UTF-8 — ladder continues)
    assert sniff_encoding(b"<p>x\x00y</p>" + b"z" * 40)[1] == "utf-8"
    # dense one-sided NULs but NON-ascii single-byte content: the
    # pattern needs ≥35% density, this has none
    assert sniff_encoding(b"caf\xe9 " * 30)[1] == "fallback"
    # dense but TWO-SIDED NULs: ambiguous, falls through
    blob = b"\x00\x00ab" * 64
    assert sniff_encoding(blob)[1] in ("fallback", "utf-8")
    # a declared charset still outranks the pattern (meta wins)
    page = "<meta charset=utf-16le><p>x"
    assert sniff_encoding(page.encode("utf-16-le"))[1] == "nul-pattern"


def test_fallback_ladder():
    assert sniff_encoding(b"plain ascii") == ("utf-8", "utf-8")
    assert sniff_encoding("café".encode()) == ("utf-8", "utf-8")
    assert sniff_encoding(b"caf\xe9 undeclared") == ("cp1252", "fallback")
    assert sniff_encoding(b"") == ("utf-8", "utf-8")
    assert sniff_encoding(None) == ("utf-8", "utf-8")


def test_identity_fast_path_returns_same_object():
    b = b"<main><p>ascii page</p></main>"
    out, codec, src = to_utf8(b)
    assert out is b and codec == "utf-8"
    u = "<meta charset=utf-8><p>café".encode()
    assert to_utf8(u)[0] is u


def test_transcode_and_bom_strip():
    assert to_utf8(b"<meta charset=latin1><p>caf\xe9")[0] == (
        "<meta charset=latin1><p>café".encode()
    )
    src = "<main><p>Zürich Ω</p></main>"
    assert to_utf8(b"\xff\xfe" + src.encode("utf-16-le"))[0] == src.encode()
    assert to_utf8(b"\xfe\xff" + src.encode("utf-16-be"))[0] == src.encode()
    assert to_utf8(b"\xef\xbb\xbf" + src.encode())[0] == src.encode()
    jp = "<meta charset=sjis><p>日本語"
    assert to_utf8(jp.encode("cp932"))[0] == jp.encode()
    # declared utf-8 with invalid bytes: U+FFFD replacement, never a raise
    out, _, _ = to_utf8(b"<meta charset=utf-8><p>\xff\xfe\xfa")
    out.decode("utf-8")


def test_fixture_parity():
    """Engine output == the independently composed expectation for every
    fixture row (the same rows the driver contract checks via Spark)."""
    import pyarrow.parquet as pq

    from fixtures.gen_encodings import ensure_encodings

    for r in pq.read_table(ensure_encodings()).to_pylist():
        utf8, codec, source = to_utf8(r["html"])
        assert (codec, source) == (r["encoding"], r["source"]), r["url"]
        txt = main_text(parse_document(utf8)).decode("utf-8", "replace")
        assert txt == r["text"], r["url"]


def test_never_raises_and_deterministic():
    rng = random.Random(0xE11)
    probes = [
        b"", b"\xff\xfe", b"\xfe\xff", b"\xef\xbb\xbf", b"\xff" * 64,
        b"<meta charset=", b"<meta charset=\x00\xff>",
        b"<meta " + b"a" * 4096 + b" charset=koi8-r>",
        bytes(range(256)) * 8,
    ]
    probes += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 600)))
        for _ in range(500)
    ]
    for blob in probes:
        a = to_utf8(blob)
        assert a == to_utf8(blob)  # deterministic
        a[0].decode("utf-8")  # output is ALWAYS valid UTF-8
        sniff_encoding(blob)


from hypothesis import assume, given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048), st.one_of(
    st.none(),
    st.sampled_from(["utf-8", "latin1", "shift_jis", "utf-16le",
                     "banana", "", "x-user-defined"]),
))
def test_to_utf8_properties(blob, label):
    """Property battery: never raises, deterministic, output is always
    valid UTF-8, and pure-ASCII input is byte-identical regardless of
    any transport label that maps to an ASCII-compatible codec."""
    out, codec, source = to_utf8(blob, label)
    assert out == to_utf8(blob, label)[0]
    out.decode("utf-8")  # always valid
    assert isinstance(codec, str) and isinstance(source, str)
    sniff_encoding(blob, label)  # never raises either


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=400))
def test_utf8_text_roundtrips_identically(txt):
    """Any UTF-8-encodable text, serialized as UTF-8 bytes, passes
    through unchanged (the identity fast path) unless it happens to
    start with BOM bytes or declare a charset — neither arises from
    plain text without '<meta'."""
    assume("<meta" not in txt.lower())  # a conjured declaration may differ
    data = txt.lstrip("﻿").encode("utf-8")
    out, codec, _source = to_utf8(data)
    assert out == data and codec == "utf-8"


def test_oversized_blob_bounded_time():
    """A multi-MB page must cost O(n) through the whole ladder — the
    prescan window is fixed-size, validation/transcode are single
    C-speed passes (the r6 adversarial-scale pattern)."""
    import time

    big_ascii = b"<main>" + b"<p>word</p>" * 1_000_000 + b"</main>"
    t0 = time.monotonic()
    out, codec, _ = to_utf8(big_ascii)
    assert out is big_ascii and codec == "utf-8"  # identity, zero copy
    big_1252 = b"<meta charset=latin1>" + b"caf\xe9 " * 2_000_000
    out2, codec2, _ = to_utf8(big_1252)
    assert codec2 == "cp1252" and len(out2) > len(big_1252)
    big_nul = ("<p>" + "word " * 1_000_000).encode("utf-16-le")
    out3, _, src3 = to_utf8(big_nul)
    assert src3 == "nul-pattern"
    assert time.monotonic() - t0 < 20.0  # ~32 MB of input, 3 ladders
