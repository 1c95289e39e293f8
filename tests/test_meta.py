"""Page-metadata extraction (engine/meta.py + udfs.extract_meta_df):
the head-metadata leg of the extraction tier (X10). Semantics are
pinned by the composition-first fixture (fixtures/gen_meta.py —
expected values chosen first, markup forms derived); this battery
covers the contract corners and the never-raise invariant the fixture
can't (corrupt payloads have no composable expectation)."""

import random

import pytest

from htmld_spark.engine import parse_document
from htmld_spark.engine.meta import extract_meta


def _meta(html: bytes, url: str = "https://h.example/a/b.html"):
    return extract_meta(parse_document(html), url)


def test_fixture_parity():
    """Engine output == the independently composed expectation for every
    fixture page (the same rows the driver contract checks via Spark)."""
    from fixtures.gen_meta import gen_rows

    urls, _tss, htmls, exps = gen_rows()
    for u, h, e in zip(urls, htmls, exps):
        assert extract_meta(parse_document(h), u) == e


def test_title_rules():
    assert _meta(b"<title> a \n b </title>")["title"] == "a b"
    assert _meta(b"<title>x &amp; y</title>")["title"] == "x & y"
    assert _meta(b"<title></title>")["title"] == ""
    assert _meta(b"<p>no title</p>")["title"] is None
    # first wins; later titles (even in body) are ignored
    assert _meta(b"<title>one</title><body><title>two</title>")[
        "title"
    ] == "one"


def test_meta_name_rules():
    m = _meta(
        b'<meta name="DESCRIPTION" content=" d1  x ">'
        b'<meta name="description" content="late">'
        b'<meta name="Robots" content="NoIndex, NoFollow">'
    )
    assert m["description"] == "d1 x"
    assert m["meta_robots"] == "noindex, nofollow"
    # a content-less meta never matches; the next one with content wins
    m2 = _meta(b'<meta name="description"><meta name="description" content="real">')
    assert m2["description"] == "real"


def test_canonical_rules():
    assert _meta(b'<link rel="canonical" href="https://c.example/p#f">')[
        "canonical_url"
    ] == "https://c.example/p"
    # multi-token rel counts; resolution against the page url
    assert _meta(b'<link rel="alternate CANONICAL" href="/c">')[
        "canonical_url"
    ] == "https://h.example/c"
    # <base href> seen before the canonical rebases it
    assert _meta(
        b'<base href="https://b.example/d/"><link rel=canonical href="x">'
    )["canonical_url"] == "https://b.example/d/x"
    # a base AFTER the canonical does not apply
    assert _meta(
        b'<link rel=canonical href="x"><base href="https://b.example/d/">'
    )["canonical_url"] == "https://h.example/a/x"
    # first canonical wins even if unusable; rel decoys are ignored
    m = _meta(
        b'<link rel="stylesheet" href="/s.css">'
        b'<link rel="canonical" href="javascript:void(0)">'
        b'<link rel="canonical" href="https://ok.example/p">'
    )
    assert m["canonical_url"] is None
    assert _meta(b"")["canonical_url"] is None


def test_lang_and_charset_rules():
    assert _meta(b'<html lang=" EN-us ">')["lang"] == "en-us"
    assert _meta(b'<html lang="">')["lang"] is None
    assert _meta(b"<html>")["lang"] is None
    assert _meta(b'<meta charset="UTF-8">')["charset"] == "utf-8"
    m = _meta(
        b'<meta http-equiv="Content-Type" '
        b"content=\"text/html; CharSet='ISO-8859-1'\">"
        b'<meta charset="koi8-r">'
    )
    assert m["charset"] == "iso-8859-1"  # first in document order wins
    assert _meta(b'<meta http-equiv="refresh" content="0">')["charset"] is None


def test_opengraph_rules():
    m = _meta(
        b'<meta property="OG:Title" content=" t1 ">'
        b'<meta property="og:title" content="loser">'
        b'<meta property="og:image" content="https://i.example/x.png">'
        b'<meta property="fb:app_id" content="1">'
        b'<meta name="og:fake" content="n">'
        b'<meta property="og:type">'
    )
    assert m["og_props"] == ["og:image", "og:title"]
    assert m["og_values"] == ["https://i.example/x.png", "t1"]


def test_never_raises_fuzz():
    rng = random.Random(0xE7A)
    from fixtures.gen_meta import gen_rows

    _u, _t, htmls, _e = gen_rows(20)
    for i in range(400):
        if i % 3 == 0:
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        else:
            src = bytearray(rng.choice(htmls))
            for _ in range(rng.randrange(1, 10)):
                if not src:
                    break
                p = rng.randrange(len(src))
                op = rng.randrange(3)
                if op == 0:
                    src[p] = rng.randrange(256)
                elif op == 1:
                    del src[p : p + rng.randrange(1, 30)]
                else:
                    src[p:p] = bytes(
                        rng.randrange(256) for _ in range(rng.randrange(1, 8))
                    )
            b = bytes(src)
        r = extract_meta(parse_document(b), "https://x.example/p?q=1")
        assert isinstance(r["og_props"], list)
        assert len(r["og_props"]) == len(r["og_values"])


def test_spark_extract_meta_df(spark):
    """One MapInArrow crossing, no BatchEvalPython; values match the
    composed expectation row for row; warc_ts passthrough optional."""
    from fixtures.gen_meta import ensure_meta
    from htmld_spark.functions.udfs import extract_meta_df

    pages_path, exp_path = ensure_meta()
    pages = spark.read.parquet(pages_path)
    out = extract_meta_df(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1 and "BatchEvalPython" not in plan
    rows = {r.url: r for r in out.collect()}
    exp = spark.read.parquet(exp_path).collect()
    assert len(rows) == len(exp)
    for e in exp:
        r = rows[e.url]
        assert r.parse_ok
        for f in ("title", "description", "meta_robots", "canonical_url",
                  "lang", "charset"):
            assert getattr(r, f) == getattr(e, f), (e.url, f)
        assert list(r.og_props) == list(e.og_props)
        assert list(r.og_values) == list(e.og_values)
    # no warc_ts column → null passthrough, same values
    out2 = extract_meta_df(pages.select("url", "html")).collect()
    assert {r.url: r.title for r in out2} == {
        u: r.title for u, r in rows.items()
    }


@pytest.fixture(scope="module")
def spark():
    from htmld_spark.pipeline.session import get_spark

    s = get_spark(master="local[4]", app_name="pytest_meta")
    yield s
    s.stop()


def test_meta_robots_allowed(spark):
    """In-page consent Column (sources/robots.meta_robots_allowed):
    noindex/none deny, others allow, NULL allows; row-local (no join,
    no Python crossing)."""
    from htmld_spark.sources.robots import meta_robots_allowed

    df = spark.createDataFrame(
        [
            ("noindex", False),
            ("noindex, nofollow", False),
            ("none", False),
            ("index, follow", True),
            ("nofollow", True),  # follow-consent only: indexing allowed
            (None, True),
            ("", True),
        ],
        "meta_robots string, want boolean",
    )
    out = df.select("want", meta_robots_allowed("meta_robots").alias("got"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
    assert all(r.got == r.want for r in out.collect())
