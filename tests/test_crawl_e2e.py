"""Crawl on-ramp end-to-end (VERDICT r06 #5): WARC archives → robots
consent filter → curate(), composed exactly as the README quickstart
wires them. Asserts BOTH the values (by-construction blocked set) and
the composed plan shape: ONE extraction MapInArrow, every other Python
crossing (WARC parse, robots verdicts) checkpoint-hidden, no
BatchEvalPython, no reintroduced diamond."""

import pytest
from pyspark.sql import SparkSession

from fixtures.gen_warc import ensure_warc


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


ROBOTS_ROWS = [
    # blanket opt-out: every crawl3.example page blocked
    ("crawl3.example", b"User-agent: *\nDisallow: /"),
    # agent-specific with an Allow exception: /page/5* survives for aibot
    # (longest-match: 'Allow: /page/5' len 7 beats 'Disallow: /page/' len 6)
    ("crawl5.example", b"User-agent: aibot\nDisallow: /page/\nAllow: /page/5"),
    # a different agent's group: no rules select for aibot -> allowed
    ("crawl7.example", b"User-agent: otherbot\nDisallow: /"),
]


def _expected_blocked(urls):
    blocked = set()
    for u in urls:
        host = u.split("://", 1)[-1].split("/", 1)[0]
        path = "/" + u.split("://", 1)[-1].split("/", 1)[-1]
        if host == "crawl3.example":
            blocked.add(u)
        elif host == "crawl5.example" and path.startswith("/page/") and not path.startswith("/page/5"):
            blocked.add(u)
    return blocked


def test_warc_robots_curate_composition(spark):
    from htmld_spark.pipeline.curate import curate
    from htmld_spark.sources.robots import robots_filter
    from htmld_spark.sources.warc import html_pages, warc_pages_df

    arch_dir, _exp = ensure_warc()
    # the on-ramp recipe: mime-filter first (row-local predicate — the
    # png/text-plain responses never reach extraction), then checkpoint:
    # the WARC parse is an EXPENSIVE upstream feeding the robots diamond
    # (slim branch + anti-join) — the robots_filter docstring's contract
    pages = html_pages(warc_pages_df(spark, arch_dir)).localCheckpoint(
        eager=False
    )
    robots = spark.createDataFrame(ROBOTS_ROWS, "host string, robots binary")
    clean = robots_filter(pages, robots, agent="aibot")

    all_urls = {r.url for r in pages.select("url").collect()}
    blocked = _expected_blocked(all_urls)
    assert len(blocked) >= 10  # the fixture really exercises both rules
    kept = {r.url for r in clean.select("url").collect()}
    assert kept == all_urls - blocked

    cur = curate(clean, min_tokens=3, max_per_host=500)
    rows = cur.collect()
    urls = {r.url for r in rows}
    assert urls and urls <= kept
    assert not urls & blocked
    # byte-identity spot check: curated text == engine main_text over
    # the X11-normalized bytes (content_type carries the transport
    # charset for the sjis special)
    from htmld_spark.engine import main_text, parse_document
    from htmld_spark.engine.encoding import content_type_charset, to_utf8

    page_of = {
        r.url: (bytes(r.html), r.content_type) for r in pages.collect()
    }
    for r in rows[:10]:
        raw, ct = page_of[r.url]
        norm = to_utf8(raw, content_type_charset(ct))[0]
        assert r.text == main_text(parse_document(norm)).decode("utf-8")

    # composed plan: AT MOST one visible MapInArrow — the WARC parse and
    # robots verdict crossings sit behind lazy localCheckpoints (Scan
    # ExistingRDD), and since r8 the extraction crossing itself hides
    # under curate's latest-capture checkpoint (slim-proxy shape), so 0
    # visible is the expected steady state; >1 = an upstream re-run
    plan = (
        curate(clean, min_tokens=3, max_per_host=500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInArrow") <= 1, plan[:2000]
    assert "BatchEvalPython" not in plan
    assert "Scan ExistingRDD" in plan  # checkpoint-hidden on-ramp


def test_consent_from_the_crawl_itself(spark):
    """R18c closes the loop: the robots table comes FROM the archives
    (robots_from_pages — /robots.txt captures, latest per host), then
    filters the very pages that rode alongside them. crawl0.example has
    a superseded blanket-disallow capture; only its LATEST rules
    (aibot: Disallow /page/ except /page/9) may apply."""
    from htmld_spark.sources.robots import robots_filter, robots_from_pages
    from htmld_spark.sources.warc import html_pages, warc_pages_df

    arch_dir, _exp = ensure_warc()
    raw = warc_pages_df(spark, arch_dir).localCheckpoint(eager=False)
    robots = robots_from_pages(raw)
    got = {r.host: bytes(r.robots) for r in robots.collect()}
    # crawl-err's 503 capture maps to the RFC synthetic disallow-all;
    # crawl-miss's 404 capture maps to NO row (allowed-by-absence)
    assert set(got) == {
        "crawl-txt.example", "crawl0.example", "crawl-err.example",
    }
    assert got["crawl-err.example"] == b"User-agent: *\nDisallow: /\n"
    assert b"aibot" in got["crawl0.example"]  # latest capture won
    assert b"Disallow: /\n" not in got["crawl0.example"]

    clean = robots_filter(html_pages(raw), robots, agent="aibot")
    kept0 = sorted(
        r.url for r in clean.collect()
        if r.url.startswith("https://crawl0.example/")
    )
    # crawl0 pages are /page/{i} for i % 9 == 0; aibot may fetch only
    # /page/9 (longest-match Allow beats the /page/ Disallow)
    assert kept0 == ["https://crawl0.example/page/9"]
    # other hosts have no harvested robots -> all their pages survive
    assert clean.count() == html_pages(raw).count() - 9  # 10 crawl0 pages - 1
