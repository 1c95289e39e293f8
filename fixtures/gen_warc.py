"""Deterministic synthetic WARC fixture with independently composed
expected rows (the gen_pages.py philosophy applied to the crawl
CONTAINER format).

Draws (url, warc_ts, html bytes) pages, then writes them through an
independent ISO 28500 writer the reader must normalize away:

- per-record gzip members (the Common Crawl layout) for ``*.warc.gz``
  archives plus one PLAIN ``*.warc`` archive;
- warcinfo / request / metadata records interleaved between responses
  (the reader must skip them);
- HTTP response payloads with status line + headers; the html column is
  the BODY only — DECODED: responses are written through a rotation of
  transfer/content codings the reader must undo (Transfer-Encoding:
  chunked with varied chunk sizes + one ;extension, Content-Encoding:
  gzip, chunked-then-gzip stacked, zlib-wrapped deflate, raw deflate),
  framed here by an independent writer (gzip.compress / zlib.compress /
  manual hex chunk lines);
- one archive ends with a deliberately CORRUPT gzip member (salvage:
  everything before it must still land);
- one response has CORRUPT chunked framing after two valid chunks: the
  expected html is the two-chunk prefix (salvage, composed here
  independently of the reader).

The EXPECTED table (url, warc_ts, n_bytes, html_md5, content_type,
is_html, main_txt) is composed from the drawn pages directly — binary
html is compared via its md5 so the DuckDB oracle stays
dialect-neutral; main_txt is the independently composed mcx-1
main-content expectation for the html rows (the warc_extract e2e
golden), NULL for the non-html specials.

v3–v5 add SPECIAL responses the envelope plumbing must handle:
- a shift_jis page whose charset arrives ONLY via the HTTP
  Content-Type header (X11 transport step — no meta, no BOM);
- an image/png response (html_pages must drop it);
- robots.txt captures (text/plain — dropped by html_pages, harvested by
  robots_from_pages; one host has TWO captures so latest-wins is
  genuinely exercised);
- a headerless capture (payload with no HTTP status line → body
  passes through whole, content_type/status NULL → html_pages keeps it);
- v5 (R17c): a 301 with an absolute Location and a 302 with a RELATIVE
  one (the parse crossing must resolve it), a 404 html error page
  (html MIME, error STATUS — html_pages must drop it), a 503 robots
  capture (RFC 9309 unreachable → the robots table carries the
  synthetic complete-disallow, recorded as robots_md5) and a 404 robots
  capture (no robots file → allowed-by-absence, NO robots row).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import random
import sys
import zlib
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "warc")
WARC_VERSION = "5"  # v5: + http_status / redirects / robots reachability
N_PAGES = 90  # across 3 archives (one extra corrupt-chunked response on top)

# body-coding rotation, assigned per page index — the writer frames,
# the reader must normalize every one of these back to the raw body
CODINGS = ("plain", "chunked", "gzip", "chunked+gzip", "deflate", "raw-deflate")


def _coding_for(i: int) -> str:
    return CODINGS[i % len(CODINGS)]


def _chunk_frame(body: bytes, rng: random.Random) -> bytes:
    """Independent chunked-transfer writer: varied chunk sizes, one
    ;extension on the first chunk, terminal 0-chunk with a trailer."""
    out = bytearray()
    i = 0
    first = True
    while i < len(body):
        size = min(rng.randint(7, 41), len(body) - i)
        ext = b";synth=1" if first else b""
        out += b"%x%s\r\n%s\r\n" % (size, ext, body[i : i + size])
        i += size
        first = False
    out += b"0\r\nX-Trailer: t\r\n\r\n"
    return bytes(out)


def _http_response(body: bytes, coding: str, rng: random.Random) -> bytes:
    """Compose one HTTP/1.1 response payload with the given coding."""
    headers = [b"HTTP/1.1 200 OK",
               b"Content-Type: text/html; charset=utf-8"]
    wire = body
    if coding in ("gzip", "chunked+gzip"):
        wire = gzip.compress(wire, 6)
        headers.append(b"Content-Encoding: gzip")
    elif coding == "deflate":
        wire = zlib.compress(wire, 6)
        headers.append(b"Content-Encoding: deflate")
    elif coding == "raw-deflate":  # the RFC-noted server bug: no zlib wrapper
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        wire = c.compress(wire) + c.flush()
        headers.append(b"Content-Encoding: deflate")
    if coding in ("chunked", "chunked+gzip"):
        wire = _chunk_frame(wire, rng)
        headers.append(b"Transfer-Encoding: chunked")
    else:
        headers.append(b"Content-Length: %d" % len(wire))
    return b"\r\n".join(headers) + b"\r\n\r\n" + wire


def _corrupt_chunked_response() -> tuple[bytes, bytes]:
    """A response whose chunked framing goes bad after two valid chunks.
    Returns (payload, expected_body) — the expectation (two-chunk
    prefix) is composed HERE, independent of the reader's salvage."""
    c1 = b"<html><body><main><p>salvaged part one "
    c2 = b"and part two</p></main>"
    lost = b"</body></html>"
    wire = (b"%x\r\n%s\r\n%x\r\n%s\r\nZZZ\r\n%s" % (len(c1), c1, len(c2), c2, lost))
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + wire
    )
    return payload, c1 + c2


def _special_records():
    """v3–v5 composed-first specials. Returns rows of (url, ts, payload,
    expected_body, content_type, is_html, main_txt, is_robots, host,
    http_status, redirect_location, robots_body) — every expectation
    chosen FIRST, the wire payload derived from it. is_html means "kept
    by html_pages" (mime AND status); is_robots means "produces a
    robots-table candidate" (so a 404 robots capture is False and a 503
    one is True with the RFC's synthetic disallow-all as robots_body)."""
    out = []

    def http(status_line, headers, body):
        head = [b"HTTP/1.1 " + status_line] + headers
        head.append(b"Content-Length: %d" % len(body))
        return b"\r\n".join(head) + b"\r\n\r\n" + body

    # (a) transport charset: shift_jis announced ONLY by the HTTP header
    # (no meta, no BOM) — X11's transport step must decode it
    line = "日本語 トランスポート charset テスト"
    body = (
        f"<html><body><main><p>{line}</p></main></body></html>"
    ).encode("cp932")
    out.append((
        "https://crawl-sjis.example/page", datetime(2024, 3, 29, 8, 0),
        http(b"200 OK", [b"Content-Type: text/html; charset=shift_jis"], body),
        body, "text/html; charset=shift_jis", True, line,
        False, None, 200, None, None,
    ))
    # (b) an image response: html_pages must drop it, ingest must land it
    png = b"\x89PNG\r\n\x1a\n" + bytes((i * 37 + 11) % 256 for i in range(64))
    out.append((
        "https://crawl-img.example/logo.png", datetime(2024, 3, 29, 9, 0),
        http(b"200 OK", [b"Content-Type: image/png"], png),
        png, "image/png", False, None, False, None, 200, None, None,
    ))
    # (c) robots.txt captures (text/plain — dropped by html_pages,
    # harvested by robots_from_pages). crawl0.example has TWO captures:
    # the LATER one must win (R18c latest-wins rule)
    def robots_rec(host, ts, rules):
        body = rules.encode("utf-8")
        return (
            f"https://{host}/robots.txt", ts,
            http(b"200 OK",
                 [b"Content-Type: text/plain; charset=utf-8"], body),
            body, "text/plain; charset=utf-8", False, None, True, host,
            200, None, body,
        )

    out.append(robots_rec(
        "crawl-txt.example", datetime(2024, 3, 29, 10, 0),
        "User-agent: *\nDisallow: /private/\n",
    ))
    out.append(robots_rec(  # superseded capture — must NOT win
        "crawl0.example", datetime(2024, 3, 10, 10, 0),
        "User-agent: *\nDisallow: /\n",
    ))
    out.append(robots_rec(  # the latest capture — must win
        "crawl0.example", datetime(2024, 3, 20, 10, 0),
        "User-agent: aibot\nDisallow: /page/\nAllow: /page/9\n",
    ))
    # (d) headerless capture: no HTTP status line → the payload IS the
    # body, content_type/status NULL → html_pages keeps it
    line2 = "headerless capture body words"
    body2 = (
        f"<html><body><main><p>{line2}</p></main></body></html>"
    ).encode("utf-8")
    out.append((
        "https://crawl-bare.example/page", datetime(2024, 3, 29, 11, 0),
        body2, body2, None, True, line2, False, None, None, None, None,
    ))
    # (e/f) redirects (R17c): 301 absolute + 302 RELATIVE Location (the
    # parse crossing must resolve it against the capture url); their
    # stub bodies are NOT corpus content (is_html False)
    stub = b"<html><body>Moved</body></html>"
    out.append((
        "https://crawl-301.example/old", datetime(2024, 3, 29, 12, 0),
        http(b"301 Moved Permanently",
             [b"Content-Type: text/html",
              b"Location: https://moved.example/new"], stub),
        stub, "text/html", False, None, False, None, 301,
        "https://moved.example/new", None,
    ))
    out.append((
        "https://crawl5.example/tmp/page", datetime(2024, 3, 29, 12, 30),
        http(b"302 Found",
             [b"Content-Type: text/html",
              b"Location: /moved/here?x=1"], stub),
        stub, "text/html", False, None, False, None, 302,
        "https://crawl5.example/moved/here?x=1", None,
    ))
    # (g) 404 error page: html MIME but error STATUS — html_pages must
    # drop it (its <main> text would otherwise pollute the corpus)
    err = b"<html><body><main><p>not found error page</p></main></body></html>"
    out.append((
        "https://crawl-404.example/missing", datetime(2024, 3, 29, 13, 0),
        http(b"404 Not Found", [b"Content-Type: text/html"], err),
        err, "text/html", False, None, False, None, 404, None, None,
    ))
    # (h) 503 robots capture: RFC 9309 unreachable → the robots table
    # must carry the synthetic complete-disallow, NOT the error body
    unavail = b"<html><body>Service Unavailable</body></html>"
    out.append((
        "https://crawl-err.example/robots.txt", datetime(2024, 3, 29, 14, 0),
        http(b"503 Service Unavailable", [b"Content-Type: text/html"], unavail),
        unavail, "text/html", False, None, True, "crawl-err.example",
        503, None, b"User-agent: *\nDisallow: /\n",
    ))
    # (i) 404 robots capture: "no robots file" → allowed-by-absence, so
    # NO robots-table row (the error body must never be parsed as rules)
    nf = b"robots not found here"
    out.append((
        "https://crawl-miss.example/robots.txt", datetime(2024, 3, 29, 15, 0),
        http(b"404 Not Found", [b"Content-Type: text/plain"], nf),
        nf, "text/plain", False, None, False, None, 404, None, None,
    ))
    return out


def _record(rtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    head.append(f"Content-Length: {len(payload)}")
    return (
        "\r\n".join(head).encode("latin-1")
        + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


def _draw_page(i: int, rng: random.Random):
    url = f"https://crawl{i % 9}.example/page/{i}"
    ts = datetime(2024, 3, 1 + i % 27, i % 24, i % 60)
    # the logical line IS the mcx-1 expectation (single <p> in <main>);
    # the html derives from it — composed independently of the engine
    line = f"página {i} naïve 日本語 " + " ".join(
        ["word"] * rng.randint(3, 30)
    )
    body = (
        f"<html><head><title>p{i}</title></head><body><main>"
        f"<p>{line}</p></main></body></html>"
    ).encode("utf-8")
    return url, ts, body, line


def _archive(pages, rng: random.Random, gz: bool, corrupt_tail: bool,
             extra_payloads=()) -> bytes:
    out = bytearray()

    def emit(rec: bytes):
        out.extend(gzip.compress(rec, 6) if gz else rec)

    emit(_record("warcinfo", {"WARC-Filename": "synth.warc"}, b"software: synth\r\n"))
    for url, ts, body, _line, coding in pages:
        wdate = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        if rng.random() < 0.5:  # interleaved request record (skipped)
            emit(
                _record(
                    "request",
                    {"WARC-Target-URI": url, "WARC-Date": wdate},
                    b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
                )
            )
        emit(
            _record(
                "response",
                {"WARC-Target-URI": url, "WARC-Date": wdate},
                _http_response(body, coding, rng),
            )
        )
    for url, ts, payload in extra_payloads:  # pre-framed (corrupt) responses
        emit(
            _record(
                "response",
                {"WARC-Target-URI": url,
                 "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ")},
                payload,
            )
        )
    if corrupt_tail and gz:
        out.extend(b"\x1f\x8b\x08\x00junkjunkjunk")  # corrupt final member
    return bytes(out)


def ensure_warc() -> tuple[str, str]:
    """Generate + cache the archives and expected parquet. Returns
    (archive glob dir, expected parquet path)."""
    os.makedirs(DATA_DIR, exist_ok=True)
    arch_dir = os.path.join(DATA_DIR, "archives")
    expected = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == WARC_VERSION:
                return arch_dir, expected
    os.makedirs(arch_dir, exist_ok=True)
    rng = random.Random(0x77A2C)
    pages = [(*_draw_page(i, rng), _coding_for(i)) for i in range(N_PAGES)]
    thirds = [pages[0:30], pages[30:60], pages[60:90]]
    # the corrupt-chunked response rides in part-0; its expected body is
    # the two-chunk prefix composed by _corrupt_chunked_response itself
    bad_url = "https://crawl-bad.example/chunked"
    bad_ts = datetime(2024, 3, 28, 12, 30)
    bad_payload, bad_expected = _corrupt_chunked_response()
    specials = _special_records()
    specs = [  # (filename, gz, corrupt_tail, extra_payloads)
        ("part-0.warc.gz", True, False,
         [(bad_url, bad_ts, bad_payload)]
         + [(u, t, p) for u, t, p, *_ in specials[:4]]),
        ("part-1.warc.gz", True, True, []),  # salvage: corrupt member LAST
        ("part-2.warc", False, False,
         [(u, t, p) for u, t, p, *_ in specials[4:]]),
    ]
    for (fname, gz, corrupt, extras), chunk in zip(specs, thirds):
        with open(os.path.join(arch_dir, fname), "wb") as f:
            f.write(_archive(chunk, rng, gz, corrupt, extras))
    std_ct = "text/html; charset=utf-8"  # what _http_response writes
    exp_rows = [
        (u, t, b, std_ct, True, line, False, None, 200, None, None)
        for u, t, b, line, _c in pages
    ]
    exp_rows.append((bad_url, bad_ts, bad_expected, "text/html", True,
                     "salvaged part one and part two", False, None,
                     200, None, None))
    exp_rows += [
        (u, t, b, ct, ih, mt, ir, h, st, rd, rb)
        for u, t, _p, b, ct, ih, mt, ir, h, st, rd, rb in specials
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in exp_rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] for r in exp_rows], pa.timestamp("us")
                ),
                "n_bytes": pa.array(
                    [len(r[2]) for r in exp_rows], pa.int64()
                ),
                "html_md5": pa.array(
                    [hashlib.md5(r[2]).hexdigest() for r in exp_rows],
                    pa.string(),
                ),
                "content_type": pa.array(
                    [r[3] for r in exp_rows], pa.string()
                ),
                "is_html": pa.array([r[4] for r in exp_rows], pa.bool_()),
                "main_txt": pa.array([r[5] for r in exp_rows], pa.string()),
                "is_robots": pa.array([r[6] for r in exp_rows], pa.bool_()),
                "host": pa.array([r[7] for r in exp_rows], pa.string()),
                "http_status": pa.array(
                    [r[8] for r in exp_rows], pa.int32()
                ),
                "redirect_location": pa.array(
                    [r[9] for r in exp_rows], pa.string()
                ),
                "robots_md5": pa.array(
                    [hashlib.md5(r[10]).hexdigest() if r[10] is not None
                     else None for r in exp_rows],
                    pa.string(),
                ),
            }
        ),
        expected,
    )
    with open(marker, "w") as f:
        f.write(WARC_VERSION)
    return arch_dir, expected


if __name__ == "__main__":
    d, e = ensure_warc()
    print(d, os.listdir(d), pq.read_table(e).num_rows, "expected rows")
