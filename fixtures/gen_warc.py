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
  the BODY only;
- one archive ends with a deliberately CORRUPT gzip member (salvage:
  everything before it must still land).

The EXPECTED table (url, warc_ts, n_bytes, html_md5) is composed from
the drawn pages directly — binary html is compared via its md5 so the
DuckDB oracle stays dialect-neutral.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import random
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "warc")
WARC_VERSION = "1"
N_PAGES = 90  # across 3 archives


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
    body = (
        f"<html><head><title>p{i}</title></head><body><main>"
        f"<p>página {i} naïve 日本語 {'word ' * rng.randint(3, 30)}</p>"
        f"</main></body></html>"
    ).encode("utf-8")
    return url, ts, body


def _archive(pages, rng: random.Random, gz: bool, corrupt_tail: bool) -> bytes:
    out = bytearray()

    def emit(rec: bytes):
        out.extend(gzip.compress(rec, 6) if gz else rec)

    emit(_record("warcinfo", {"WARC-Filename": "synth.warc"}, b"software: synth\r\n"))
    for url, ts, body in pages:
        wdate = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        if rng.random() < 0.5:  # interleaved request record (skipped)
            emit(
                _record(
                    "request",
                    {"WARC-Target-URI": url, "WARC-Date": wdate},
                    b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
                )
            )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: %d\r\n\r\n%s" % (len(body), body)
        )
        emit(
            _record(
                "response",
                {"WARC-Target-URI": url, "WARC-Date": wdate},
                http,
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
    pages = [_draw_page(i, rng) for i in range(N_PAGES)]
    thirds = [pages[0:30], pages[30:60], pages[60:90]]
    specs = [  # (filename, gz, corrupt_tail)
        ("part-0.warc.gz", True, False),
        ("part-1.warc.gz", True, True),  # salvage: corrupt member is LAST
        ("part-2.warc", False, False),
    ]
    for (fname, gz, corrupt), chunk in zip(specs, thirds):
        with open(os.path.join(arch_dir, fname), "wb") as f:
            f.write(_archive(chunk, rng, gz, corrupt))
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _t, _b in pages], pa.string()),
                "warc_ts": pa.array([t for _u, t, _b in pages], pa.timestamp("us")),
                "n_bytes": pa.array([len(b) for _u, _t, b in pages], pa.int64()),
                "html_md5": pa.array(
                    [hashlib.md5(b).hexdigest() for _u, _t, b in pages],
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
