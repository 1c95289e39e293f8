"""WARC ingest (sources/warc.py): fixture parity, member-salvage,
resync tolerance, never-raise contract, and the Spark binaryFile →
mapInArrow → pages path feeding the extraction engine."""

import gzip
import hashlib
import os
import random

import pytest

from fixtures.gen_warc import ensure_warc
from htmld_spark.pipeline.session import get_spark
from htmld_spark.sources.warc import (
    _gunzip_members,
    iter_warc_records,
    warc_pages,
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="pytest_warc")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s
    s.stop()


def _rec(rtype: str, headers: dict, payload: bytes) -> bytes:
    head = ["WARC/1.0", f"WARC-Type: {rtype}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    head.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_fixture_parity_all_archives():
    """Every expected page lands with exact url/ts/bytes — including the
    archive whose final gzip member is corrupt (prefix salvage)."""
    import pyarrow.parquet as pq

    arch, exp = ensure_warc()
    got = []
    for f in sorted(os.listdir(arch)):
        got.extend(warc_pages(open(os.path.join(arch, f), "rb").read()))
    gm = sorted(
        (u, ts, len(b), hashlib.md5(b).hexdigest(), ct, st, rd)
        for u, ts, b, ct, st, rd in got
    )  # multiset compare: one url carries TWO robots captures
    want = sorted(
        (r["url"], r["warc_ts"], r["n_bytes"], r["html_md5"],
         r["content_type"], r["http_status"], r["redirect_location"])
        for r in pq.read_table(exp).to_pylist()
    )
    assert gm == want


def test_gzip_member_salvage():
    """A corrupt middle member costs itself and everything AFTER it (the
    stream cannot resync mid-gzip), never the members before it."""
    a = gzip.compress(_rec("response", {"WARC-Target-URI": "u1",
                                        "WARC-Date": "2024-01-01T00:00:00Z"},
                           b"HTTP/1.1 200 OK\r\n\r\nbody1"))
    bad = b"\x1f\x8b\x08\x00corruptcorrupt"
    b = gzip.compress(_rec("response", {"WARC-Target-URI": "u2",
                                        "WARC-Date": "2024-01-01T00:00:00Z"},
                           b"HTTP/1.1 200 OK\r\n\r\nbody2"))
    pages = warc_pages(a + bad + b)
    assert [(u, h) for u, _t, h, *_ in pages] == [("u1", b"body1")]
    # uncorrupted concatenation parses both
    both = warc_pages(a + b)
    assert [(u, h) for u, _t, h, *_ in both] == [("u1", b"body1"), ("u2", b"body2")]


def test_bogus_content_length_resyncs():
    """A record with a wrong Content-Length costs its own payload
    boundary; the NEXT record still parses."""
    r1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u1\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 999999\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nshort\r\n\r\n"
    )
    r2 = _rec("response", {"WARC-Target-URI": "u2",
                           "WARC-Date": "2024-01-02T00:00:00Z"},
              b"HTTP/1.1 200 OK\r\n\r\nsecond")
    pages = warc_pages(r1 + r2)
    urls = [u for u, _t, _h, *_ in pages]
    assert urls == ["u1", "u2"]
    assert pages[1][2] == b"second"
    assert pages[0][2].startswith(b"short")  # resynced payload, salvaged


def test_non_response_records_skipped_and_never_raises():
    rng = random.Random(3)
    payloads = [
        b"",
        b"WARC/1.0",
        b"WARC/1.0\r\n\r\n",
        b"\x1f\x8b\x08\x00junk",
        bytes(rng.randrange(256) for _ in range(4096)),
        _rec("request", {"WARC-Target-URI": "u"}, b"GET /"),
        _rec("warcinfo", {}, b"software: x"),
        _rec("response", {}, b"no uri -> skipped"),
    ]
    for p in payloads:
        out = warc_pages(p)
        assert isinstance(out, list) and out == warc_pages(p)
    assert warc_pages(payloads[5] + payloads[6]) == []
    # ts parse tolerance
    r = _rec("response", {"WARC-Target-URI": "u", "WARC-Date": "not-a-date"},
             b"HTTP/1.1 200 OK\r\n\r\nx")
    (u, ts, h, *_), = warc_pages(r)
    assert u == "u" and ts is None and h == b"x"
    assert _gunzip_members(b"plain passthrough") == b"plain passthrough"
    assert len(list(iter_warc_records(b"junk WARC/1.0\r\nA: b\r\n\r\nxy"))) == 1


def test_spark_warc_to_extraction(spark):
    """binaryFile → one MapInArrow → pages → the HTML engine: text
    extracts from every fixture page, plan stays single-crossing."""
    from pyspark.sql import functions as F

    from htmld_spark.functions.udfs import extract_df
    from htmld_spark.sources.warc import warc_pages_df

    import pyarrow.parquet as pq

    from htmld_spark.sources.warc import html_pages

    arch, exp = ensure_warc()
    pages = warc_pages_df(spark, arch)
    p = pages._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInArrow") == 1 and "BatchEvalPython" not in p
    assert pages.count() == 102  # 90 drawn + corrupt-chunked + 11 specials
    kept = html_pages(pages)
    ex = extract_df(
        kept.select("url", "html", "content_type"), with_spans=False
    )
    rows = {r.url: r for r in ex.select("url", "text", "parse_ok").collect()}
    want = {
        r["url"]: r["main_txt"]
        for r in pq.read_table(exp).to_pylist()
        if r["is_html"]
    }
    assert set(rows) == set(want)  # png/text-plain dropped, bare kept
    for u, txt in want.items():
        assert rows[u].parse_ok and rows[u].text == txt, u


# ------------------------------------------------------------------ HTTP body decoding


def test_http_chunked_body_dechunked():
    """Transfer-Encoding: chunked framing (hex size lines, extensions,
    trailers) is removed — the html column is pure body bytes."""
    from htmld_spark.sources.warc import _http_body

    body = b"<p>hello chunked world</p>"
    wire = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"a;ext=1\r\n" + body[:10] + b"\r\n"
            b"10\r\n" + body[10:26] + b"\r\n"
            b"0\r\nX-Trailer: t\r\n\r\n")
    assert _http_body(wire)[0] == body


def test_http_content_encoding_gzip_and_deflate():
    from htmld_spark.sources.warc import _http_body

    body = b"<main>compressed content body</main>" * 10
    gz = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
          + gzip.compress(body, 6))
    assert _http_body(gz)[0] == body
    import zlib
    zl = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
          + zlib.compress(body, 6))
    assert _http_body(zl)[0] == body
    c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw-deflate server bug
    raw = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
           + c.compress(body) + c.flush())
    assert _http_body(raw)[0] == body


def test_http_chunked_then_gzip_stacked():
    """chunked transfer framing OVER a gzip content coding: de-chunk
    first, then inflate."""
    from htmld_spark.sources.warc import _http_body

    body = b"<article>stacked codings</article>"
    gz = gzip.compress(body, 6)
    wire = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            b"%x\r\n%s\r\n%x\r\n%s\r\n0\r\n\r\n"
            % (7, gz[:7], len(gz) - 7, gz[7:]))
    assert _http_body(wire)[0] == body


def test_http_corrupt_codings_salvage_never_raise():
    from htmld_spark.sources.warc import _http_body

    # corrupt chunk-size line: the valid prefix is salvaged
    wire = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\nZZ\r\nlost")
    assert _http_body(wire)[0] == b"hello"
    # truncated final chunk: what arrived is kept
    wire = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"ff\r\nonly this much arrived")
    assert _http_body(wire)[0] == b"only this much arrived"
    # garbage gzip body: raw bytes pass through (never raise)
    wire = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n\x1f\x8bgarbage"
    assert _http_body(wire)[0] == b"\x1f\x8bgarbage"
    # unknown coding (br): raw bytes pass through
    wire = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nrawbr"
    assert _http_body(wire)[0] == b"rawbr"


def test_content_type_extraction():
    """The Content-Type header value rides along with the body; absent
    header or headerless capture → None."""
    from htmld_spark.sources.warc import _http_body

    wire = (b"HTTP/1.1 200 OK\r\ncontent-TYPE:  text/html; charset=SJIS \r\n"
            b"\r\nbody")
    assert _http_body(wire) == (b"body", "text/html; charset=SJIS", 200, None)
    assert _http_body(b"HTTP/1.1 200 OK\r\n\r\nbody")[1] is None
    assert _http_body(b"<p>bare capture") == (b"<p>bare capture", None, None, None)
    # status + Location parsing; garbage status lines yield None
    wire = (b"HTTP/1.1 301 Moved\r\nLocation: /next\r\n\r\nstub")
    assert _http_body(wire) == (b"stub", None, 301, "/next")
    assert _http_body(b"HTTP/1.1 banana\r\n\r\nx")[2] is None


def test_html_pages_mime_filter(spark):
    """html_pages keeps text/html / application/xhtml+xml / NULL and
    drops everything else — as a row-local codegen predicate."""
    from htmld_spark.sources.warc import html_pages

    df = spark.createDataFrame(
        [
            ("a", "text/html"),
            ("b", "text/html; charset=utf-8"),
            ("c", " Application/XHTML+xml ; q=1"),
            ("d", None),
            ("e", "image/png"),
            ("f", "text/plain; charset=utf-8"),
            ("g", "application/pdf"),
        ],
        "url string, content_type string",
    )
    kept = html_pages(df)
    assert sorted(r.url for r in kept.collect()) == ["a", "b", "c", "d"]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


def test_inflate_bomb_capped():
    """A high-ratio flate stream truncates at the body cap instead of
    exhausting executor memory (ADVICE r6)."""
    import zlib

    from htmld_spark.sources import warc as W

    bomb = zlib.compress(b"\x00" * (8 << 20), 9)  # 8 MiB of zeros, ~8 KiB wire
    out, _d = W._bounded_inflate(bomb, 15, 1 << 20)
    assert len(out) == 1 << 20  # truncated AT the cap, prefix salvaged


def test_missing_header_terminator_resyncs():
    """A record whose header block never terminates costs itself, not
    the rest of the archive (ADVICE r6: resync, don't return)."""
    junk = b"WARC/1.0\r\nWARC-Type: response\r\nno-terminator " + b"x" * 100
    good = _rec("response", {"WARC-Target-URI": "u9",
                             "WARC-Date": "2024-01-01T00:00:00Z"},
                b"HTTP/1.1 200 OK\r\n\r\nrescued")
    pages = warc_pages(junk + b"\r\n" + good)
    assert [(u, h) for u, _t, h, *_ in pages] == [("u9", b"rescued")]


def test_wet_export_roundtrip(spark, tmp_path):
    """L66: write→read identity over hostile text (embedded CRLFCRLF,
    a literal WARC/1.0 line, unicode, empty, NULL text); NULL urls are
    skipped; the manifest counts what landed."""
    from htmld_spark.sources.warc import wet_export, wet_pages_df

    rows = [
        ("https://a.example/1", "plain text"),
        ("https://a.example/2", "embedded\r\n\r\nblank CRLF block"),
        ("https://a.example/3", "fake header\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nx"),
        ("https://a.example/4", "unicode 日本語 données Ω"),
        ("https://a.example/5", ""),
        ("https://a.example/6", None),
        (None, "no uri -> skipped"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path / "wet")
    manifest = wet_export(df.repartition(2), out).collect()
    assert sum(m.n_records for m in manifest) == 6
    back = {r.url: r.text for r in wet_pages_df(spark, out).collect()}
    assert len(back) == 6
    for u, t in rows[:6]:
        assert back[u] == (t or ""), u
    # the response-record reader ignores conversion records entirely
    from htmld_spark.sources.warc import warc_pages_df

    assert warc_pages_df(spark, out).count() == 0


def test_redirect_edges_and_status_filter(spark):
    """R17c: 3xx rows become resolved redirect edges; html_pages drops
    error/redirect statuses while keeping statusless captures."""
    from pyspark.sql import functions as F

    from htmld_spark.sources.warc import (
        html_pages,
        redirect_edges,
        warc_pages_df,
    )

    arch, _exp = ensure_warc()
    pages = warc_pages_df(spark, arch)
    edges = {
        r.url: (r.redirect_location, r.http_status)
        for r in redirect_edges(pages).collect()
    }
    assert edges == {
        "https://crawl-301.example/old": ("https://moved.example/new", 301),
        # the RELATIVE Location resolved against the capture url
        "https://crawl5.example/tmp/page": (
            "https://crawl5.example/moved/here?x=1", 302,
        ),
    }
    kept = html_pages(pages)
    urls = {r.url for r in kept.select("url").collect()}
    assert "https://crawl-404.example/missing" not in urls  # error page
    assert "https://crawl-301.example/old" not in urls  # redirect stub
    assert "https://crawl-bare.example/page" in urls  # statusless kept
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "BatchEvalPython" not in plan
