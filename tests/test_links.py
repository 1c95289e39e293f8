"""Outlink extraction (engine/links.py + udfs.extract_links_df): the
crawl-frontier leg. Engine semantics are pinned by the composition-first
fixture (fixtures/gen_links.py — targets chosen first, href forms
derived); this battery covers the contract corners and the never-raise
invariant the fixture can't (corrupt payloads have no composable
expectation)."""

import random

import pytest

from htmld_spark.engine import parse_document
from htmld_spark.engine.links import extract_links, extract_links_with_text


def _links(html: bytes, base: str = "https://h.example/a/b.html"):
    return extract_links(parse_document(html), base)


def _pairs(html: bytes, base: str = "https://h.example/a/b.html"):
    return extract_links_with_text(parse_document(html), base)


def test_fixture_parity():
    """Engine output == the independently composed expectation for every
    fixture page — (link, anchor text) PAIRS, so both the resolver and
    the normalizer are pinned (the same rows the driver contract checks
    via Spark)."""
    from fixtures.gen_links import gen_rows

    urls, _tss, htmls, exp = gen_rows()
    for u, h, e in zip(urls, htmls, exp):
        assert extract_links_with_text(parse_document(h), u) == e


def test_resolution_forms():
    assert _links(b'<a href="c.html">x</a>') == ["https://h.example/a/c.html"]
    assert _links(b'<a href="/r">x</a>') == ["https://h.example/r"]
    assert _links(b'<a href="//o.example/p">x</a>') == ["https://o.example/p"]
    assert _links(b'<a href="../up">x</a>') == ["https://h.example/up"]
    assert _links(b'<a href="?q=1">x</a>') == ["https://h.example/a/b.html?q=1"]
    assert _links(b'<a href="http://p.example/q#f">x</a>') == [
        "http://p.example/q"
    ]


def test_base_href_first_wins_and_rebases():
    h = (
        b'<head><base href="https://b.example/d/"><base href="/ignored/">'
        b'</head><a href="x.html">x</a><a href="/root">r</a>'
    )
    assert _links(h) == ["https://b.example/d/x.html", "https://b.example/root"]
    # relative <base> resolves against the page url first
    h2 = b'<base href="sub/"><a href="y">y</a>'
    assert _links(h2) == ["https://h.example/a/sub/y"]


def test_skipped_forms():
    h = (
        b'<a href="javascript:void(0)">j</a><a href="MAILTO:a@b">m</a>'
        b'<a href="tel:+1">t</a><a href="data:text/plain,x">d</a>'
        b'<a href="#frag">f</a><a href="">e</a><a name=n>plain</a>'
        b'<link href="/style.css"><script src="/s.js"></script>'
    )
    assert _links(h) == []


def test_area_and_order_and_dups():
    h = (
        b'<a href="/1">a</a><map><area href="/2"></map>'
        b'<a href="/1">again</a>'
    )
    assert _links(h) == [
        "https://h.example/1",
        "https://h.example/2",
        "https://h.example/1",
    ]


def test_markup_whitespace_and_entities():
    # tab/CR/LF removed anywhere, ends trimmed; &amp; arrives decoded
    h = b'<a href="  https://w.example/\na?x=1&amp;y=2\t ">x</a>'
    assert _links(h) == ["https://w.example/a?x=1&y=2"]


def test_case_insensitive_scheme_and_upper_tags():
    assert _links(b'<A HREF="HTTP://U.EXAMPLE/P">x</A>') == ["http://U.EXAMPLE/P"]
    assert _links(b'<a href="JavaScript:alert(1)">x</a>') == []


def test_anchor_text_normalization():
    # runs of any ASCII whitespace collapse to one space, ends stripped
    assert _pairs(b'<a href="/1"> a \n\t b  </a>') == [
        ("https://h.example/1", "a b")
    ]
    # nested inline markup contributes its text; entities arrive decoded
    assert _pairs(b'<a href="/2"><b>x</b> <em>y</em> &amp; z</a>') == [
        ("https://h.example/2", "x y & z")
    ]
    # empty anchor → empty string (not None)
    assert _pairs(b'<a href="/3"></a>') == [("https://h.example/3", "")]


def test_area_alt_is_the_anchor_text():
    h = b'<map><area href="/m" alt="go  here"><area href="/n"></map>'
    assert _pairs(h) == [
        ("https://h.example/m", "go here"),
        ("https://h.example/n", ""),
    ]


def test_malformed_base_url_keeps_absolute_links():
    got = extract_links(
        parse_document(b'<a href="rel">r</a><a href="https://ok.example/x">a</a>'),
        "::::not a url::::",
    )
    assert "https://ok.example/x" in got


def test_never_raises_on_adversarial_bytes():
    rng = random.Random(7)
    cases = [
        b"",
        bytes(rng.randrange(256) for _ in range(4096)),
        b"<a href=" * 3000,
        b'<base href="' + b"\xff" * 200 + b'"><a href="x">y</a>',
        b'<a href="' + b"%" * 500 + b'">p</a>',
        b'<a href="http://' + b"[" * 100 + b'">brk</a>',
        b"<a " + b"href=a " * 500 + b">dup</a>",
        '<a href="https://ex.com/ünï/🎉">u</a>'.encode(),
    ]
    for blob in cases:
        for base in ("https://h/x", "", "http://[bad", None and ""):
            out = extract_links(parse_document(blob), base)
            assert isinstance(out, list)
            assert all(u.startswith(("http://", "https://")) for u in out)


def test_spark_extract_links_df(spark):
    """One MapInArrow crossing; array column + n_links agree; plan has
    no BatchEvalPython; warc_ts passthrough works with and without."""
    from fixtures.gen_links import ensure_links
    from htmld_spark.functions.udfs import extract_links_df

    pages_path, exp_path = ensure_links()
    pages = spark.read.parquet(pages_path)
    out = extract_links_df(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1 and "BatchEvalPython" not in plan
    rows = out.collect()
    exp = spark.read.parquet(exp_path).collect()
    by_url: dict[str, list[tuple[int, str, str]]] = {}
    for r in exp:
        by_url.setdefault(r.url, []).append((r.pos, r.link_url, r.anchor_text))
    for r in rows:
        assert r.n_links == len(r.links) == len(r.anchor_texts)
        assert r.parse_ok
        want = sorted(by_url.get(r.url, []))
        assert list(r.links) == [u for _p, u, _t in want]
        assert list(r.anchor_texts) == [t for _p, _u, t in want]
    # no warc_ts column → null passthrough, same links
    out2 = extract_links_df(pages.select("url", "html")).collect()
    assert {r.url: list(r.links) for r in out2} == {
        r.url: list(r.links) for r in rows
    }


@pytest.fixture(scope="module")
def spark():
    from htmld_spark.pipeline.session import get_spark

    s = get_spark(master="local[4]", app_name="pytest_links")
    yield s
    s.stop()
