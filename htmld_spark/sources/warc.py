"""WARC (ISO 28500 — the Common Crawl container format) → pages rows.

The pipeline's mandated INPUT is the tabular pages schema (url,
warc_ts, html, lang); this module is the on-ramp that lands raw crawl
archives into it, Spark-first: ``spark.read.format("binaryFile")`` over
``*.warc(.gz)`` files → ONE mapInArrow pass parsing each archive's
records → pages rows (no per-row Python, no driver-side file loops —
each executor task parses whole archive files from its scan split).

The record parser follows the public ISO 28500 / WARC 1.1 layout and is
TOLERANT like the HTML/PDF engines — it never raises on any byte input:

- gzip archives are per-record gzip MEMBERS (the Common Crawl layout);
  multi-member streams decompress member-by-member and a corrupt member
  salvages what decoded before it;
- each record: ``WARC/1.x`` version line, CRLF header block,
  ``Content-Length`` payload, CRLF CRLF separator. A wrong or missing
  Content-Length resyncs by scanning for the next ``\\r\\nWARC/`` marker
  (truncated/corrupt records cost themselves, never the archive);
- only ``WARC-Type: response`` records become pages; the HTTP response
  payload is split at its header/body boundary and the BODY is the html
  column (bytes, exactly as the engine wants them); WARC-Target-URI and
  WARC-Date (ISO 8601) become url and warc_ts.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

_MAX_HEADER_BLOCK = 64 << 10  # a sane cap on one record's header block


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; salvage every
    member that decodes before a corrupt one. Non-gzip input passes
    through unchanged."""
    if data[:2] != b"\x1f\x8b":
        return data
    # member-by-member via decompressobj(wbits=31): each call decodes ONE
    # gzip member and leaves the rest in unused_data, so a corrupt member
    # costs itself only. (GzipFile.read spans members internally and
    # discards every already-decoded byte when a later member raises.)
    out = bytearray()
    buf = bytes(data)
    while buf[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(buf)
        except zlib.error:
            break
        if not d.eof:  # truncated final member: prefix already salvaged
            break
        buf = d.unused_data
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def iter_warc_records(data: bytes):
    """Yield (headers: dict[lowercased str, str], payload: bytes) per
    record. Tolerant: bad Content-Length or truncation resyncs at the
    next record marker; never raises."""
    try:
        data = _gunzip_members(bytes(data))
    except Exception:
        return
    i = 0
    n = len(data)
    while i < n:
        start = data.find(b"WARC/", i)
        if start == -1:
            return
        head_end = data.find(b"\r\n\r\n", start, start + _MAX_HEADER_BLOCK)
        if head_end == -1:
            return
        headers = _parse_headers(data[start:head_end])
        body_start = head_end + 4
        length = None
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pass
        if (
            length is not None
            and 0 <= length <= n - body_start
            and (
                data[body_start + length : body_start + length + 2]
                in (b"\r\n", b"")
            )
        ):
            payload = data[body_start : body_start + length]
            i = body_start + length
        else:  # bogus length: resync at the next record marker
            nxt = data.find(b"\r\nWARC/", body_start)
            payload = data[body_start : nxt if nxt != -1 else n]
            i = (nxt + 2) if nxt != -1 else n
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Split an HTTP response payload at the header/body boundary; a
    payload without one (bare content) passes through whole."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep != -1:
            return payload[sep + 4 :]
    return payload


def _warc_ts(value: str):
    """WARC-Date (ISO 8601, e.g. 2024-03-01T12:00:00Z) → naive-UTC
    datetime (TIMESTAMP_NTZ convention of the pages table); None when
    unparseable."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except (ValueError, AttributeError):
        return None


def warc_pages(data: bytes):
    """All response-record pages of one WARC archive:
    (url, warc_ts, html bytes) tuples. Never raises."""
    out = []
    try:
        for headers, payload in iter_warc_records(data):
            if headers.get("warc-type", "").lower() != "response":
                continue
            url = headers.get("warc-target-uri")
            if not url:
                continue
            out.append(
                (url, _warc_ts(headers.get("warc-date", "")), _http_body(payload))
            )
    except Exception:
        pass
    return out


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, warc_file string"


def warc_pages_df(spark, path: str):
    """Read ``*.warc`` / ``*.warc.gz`` archives into the mandated pages
    shape: binaryFile scan (one task per archive file — the scan split IS
    the parallelism unit) → one mapInArrow parse. Shuffle nothing; feed
    the result straight to ``extract_df`` or ``curate()``."""
    import pyarrow as pa

    def parse_batches(batches):
        for batch in batches:
            names = batch.schema.names
            paths = batch.column(names.index("path")).to_pylist()
            contents = batch.column(names.index("content")).to_pylist()
            urls, tss, htmls, files = [], [], [], []
            for p, blob in zip(paths, contents):
                for url, ts, html in warc_pages(blob or b""):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
                    files.append(p)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(tss, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array(files, pa.string()),
                ],
                names=["url", "warc_ts", "html", "warc_file"],
            )

    raw = spark.read.format("binaryFile").load(path)
    return raw.select("path", "content").mapInArrow(parse_batches, PAGES_SCHEMA)
