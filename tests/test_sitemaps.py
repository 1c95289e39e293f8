"""Sitemap parsing (sources/sitemaps.py): the seed-discovery leg of the
crawl on-ramp (sitemaps.org protocol). Semantics are pinned by the
composition-first fixture (fixtures/gen_sitemaps.py); this battery
covers the contract corners and the never-raise invariant."""

import gzip
import random

import pytest

from htmld_spark.sources.sitemaps import parse_sitemap

_URL = "https://h.example/sitemaps/sm.xml"


def test_fixture_parity():
    from fixtures.gen_sitemaps import gen_rows

    urls, bodies, exps = gen_rows()
    for u, b, e in zip(urls, bodies, exps):
        assert parse_sitemap(b, u) == e


def test_urlset_fields():
    body = (
        b'<?xml version="1.0"?><urlset xmlns="x">'
        b"<url><loc> https://h.example/a </loc>"
        b"<lastmod>2026-01-15</lastmod>"
        b"<changefreq>WeekLY</changefreq><priority>0.8</priority></url>"
        b"<url><loc>https://h.example/b?x=1&amp;y=2</loc>"
        b"<changefreq>sometimes</changefreq><priority>1.5</priority></url>"
        b"</urlset>"
    )
    assert parse_sitemap(body, _URL) == [
        ("url", "https://h.example/a", "2026-01-15", "weekly", 0.8),
        ("url", "https://h.example/b?x=1&y=2", None, None, None),
    ]


def test_dropped_and_relative_locs():
    body = (
        b"<urlset>"
        b"<url><lastmod>2026-01-01</lastmod></url>"  # no loc
        b"<url><loc/></url><url><loc>  </loc></url>"  # empty loc
        b"<url><loc>javascript:void(0)</loc></url>"  # non-http(s)
        b"<url><loc>rel/page</loc></url>"  # relative: forgiven
        b"<url><loc>https://h.example/" + b"x" * 2100 + b"</loc></url>"
        b"</urlset>"
    )
    assert parse_sitemap(body, _URL) == [
        ("url", "https://h.example/sitemaps/rel/page", None, None, None)
    ]


def test_first_child_wins_and_nested_decoy():
    body = (
        b"<urlset><url>"
        b"<image:image><loc>https://h.example/img.png</loc></image:image>"
        b"<loc>https://h.example/real</loc>"
        b"<loc>https://h.example/second</loc>"
        b"</url></urlset>"
    )
    assert parse_sitemap(body, _URL) == [
        ("url", "https://h.example/real", None, None, None)
    ]


def test_sitemapindex():
    body = (
        b"<sitemapindex><sitemap><loc>https://h.example/a.xml.gz</loc>"
        b"<lastmod>2026-02-01</lastmod><priority>0.9</priority></sitemap>"
        b"</sitemapindex>"
    )
    assert parse_sitemap(body, _URL) == [
        ("sitemap", "https://h.example/a.xml.gz", "2026-02-01", None, None)
    ]


def test_first_root_wins():
    body = (
        b"<urlset><url><loc>https://h.example/one</loc></url></urlset>"
        b"<urlset><url><loc>https://h.example/two</loc></url></urlset>"
    )
    assert [e[1] for e in parse_sitemap(body, _URL)] == [
        "https://h.example/one"
    ]


def test_plain_text_form():
    body = (
        b"https://h.example/t1\n\n  rel2  \nmailto:x@y\n"
        b"https://h.example/t3 \n"
    )
    assert [e[1] for e in parse_sitemap(body, _URL)] == [
        "https://h.example/t1",
        "https://h.example/sitemaps/rel2",
        "https://h.example/t3",
    ]
    assert all(e[0] == "url" and e[2] is None for e in parse_sitemap(body, _URL))


def test_gzip_and_salvage():
    xml = b"<urlset><url><loc>https://h.example/gz</loc></url></urlset>"
    assert parse_sitemap(gzip.compress(xml, mtime=0), _URL) == [
        ("url", "https://h.example/gz", None, None, None)
    ]
    # corrupt second member: member 1 salvaged
    two = gzip.compress(xml, mtime=0) + b"\x1f\x8b\x08\x00junk"
    assert [e[1] for e in parse_sitemap(two, _URL)] == ["https://h.example/gz"]


def test_never_raises_fuzz():
    rng = random.Random(0x517E)
    from fixtures.gen_sitemaps import gen_rows

    _u, bodies, _e = gen_rows(12)
    for i in range(400):
        if i % 3 == 0:
            b = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        else:
            src = bytearray(rng.choice(bodies))
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
        out = parse_sitemap(b, _URL)
        assert isinstance(out, list)
        for k, loc, _lm, _cf, _pr in out:
            assert k in ("url", "sitemap")
            assert loc.startswith(("http://", "https://"))
    assert parse_sitemap(None, None) == []


def test_spark_sitemap_entries_df(spark):
    """One MapInArrow crossing, no BatchEvalPython; exploded rows match
    the composed expectation."""
    from fixtures.gen_sitemaps import ensure_sitemaps
    from htmld_spark.sources.sitemaps import sitemap_entries_df

    maps_path, exp_path = ensure_sitemaps()
    maps = spark.read.parquet(maps_path)
    out = sitemap_entries_df(maps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1 and "BatchEvalPython" not in plan
    got = sorted(
        (r.sitemap_url, r.pos, r.kind, r.loc, r.lastmod, r.changefreq,
         r.priority)
        for r in out.collect()
    )
    exp = sorted(
        (r.sitemap_url, r.pos, r.kind, r.loc, r.lastmod, r.changefreq,
         r.priority)
        for r in spark.read.parquet(exp_path).collect()
    )
    assert got == exp


@pytest.fixture(scope="module")
def spark():
    from htmld_spark.pipeline.session import get_spark

    s = get_spark(master="local[4]", app_name="pytest_sitemaps")
    yield s
    s.stop()
