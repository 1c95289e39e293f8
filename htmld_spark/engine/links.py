"""Outlink extraction — the crawl-frontier leg of the extraction tier.

``extract_links(doc, base_url)`` walks an already-parsed Document in
document order and returns the absolute http(s) URLs referenced by
``<a href>`` / ``<area href>`` elements, the way a crawler's frontier
builder consumes a fetched page (north_rule's Common-Crawl-style
pipeline; the HTML rules are the public WHATWG semantics):

- the FIRST ``<base href>`` element in document order rebases relative
  references (itself resolved against the page URL);
- href values arrive entity-decoded from the tokenizer; ASCII tab/CR/LF
  are removed anywhere and C0/space trimmed at the ends (the URL spec's
  pre-processing of markup whitespace);
- fragment-only refs, empty refs, and non-http(s) schemes
  (``javascript:``, ``mailto:``, ``data:``, ``tel:`` …) are skipped;
- resolution is RFC 3986 reference resolution (stdlib ``urljoin``),
  fragments stripped, queries kept;
- duplicates and self-links are KEPT in document order — frontier
  policy (dedup, politeness, scoping) is downstream's job, exactly like
  the extraction engine leaves dedup to the pipeline operators.

``extract_links_with_text`` additionally carries each link's ANCHOR
TEXT — the (target url, anchor text) pairs that retrieval / query-doc
training sets are built from (anchor text is the public web's labeled
description of the target; e.g. MS-MARCO-style weak supervision):

- ``<a>``: the whitespace-normalized text content of the subtree
  (all descendant text nodes concatenated — entities already decoded
  by the tokenizer — then every run of ASCII whitespace collapsed to
  one space, ends stripped);
- ``<area>``: the ``alt`` attribute (the element has no content), same
  normalization; missing alt → empty string.

Engine invariants hold: no Spark imports, never raises on any input
(a malformed base or href costs only that link).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

from htmld_spark.engine.dom import Document
from htmld_spark.engine.extract import inner_text

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
_MARKUP_WS = dict.fromkeys(b"\t\n\r")  # removed ANYWHERE per the URL spec


def _clean_ref(raw: bytes) -> str:
    """Markup whitespace pre-processing: strip C0/space at both ends,
    delete tab/CR/LF everywhere, decode as UTF-8 (lossy)."""
    b = raw.strip(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\t\n\x0b\x0c\r"
                  b"\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a"
                  b"\x1b\x1c\x1d\x1e\x1f ")
    b = b.translate(None, b"\t\n\r")
    return b.decode("utf-8", "replace")


def _resolve(base: str, ref: str) -> str | None:
    """Resolve ``ref`` against ``base``; None when the result is not a
    fetchable http(s) URL. Fragment stripped, never raises."""
    m = _SCHEME_RE.match(ref)
    if m and m.group(1).lower() not in ("http", "https"):
        return None
    try:
        absu = urljoin(base, ref)
    except ValueError:
        return None
    absu = absu.split("#", 1)[0]
    ms = _SCHEME_RE.match(absu)
    if ms and not ms.group(1).islower():  # scheme normalizes lowercase
        absu = ms.group(1).lower() + absu[ms.end(1):]
    if not (absu.startswith("http://") or absu.startswith("https://")):
        return None
    try:  # reject scheme-only / hostless results ("http://")
        if not urlsplit(absu).netloc:
            return None
    except ValueError:
        return None
    return absu


_WS_RUN = re.compile(rb"[\t\n\x0b\x0c\r ]+")


def _anchor_text(doc: Document, nid: int) -> str:
    """Whitespace-normalized anchor text of an ``<a>``/``<area>`` node
    (see module docstring). Never raises."""
    if doc.tag[nid] == b"area":  # no content model: alt carries the label
        raw = doc.attr(nid, b"alt") or b""
    else:
        raw = inner_text(doc, nid)
    return _WS_RUN.sub(b" ", raw).strip().decode("utf-8", "replace")


def extract_links_with_text(
    doc: Document, base_url: str
) -> list[tuple[str, str]]:
    """Absolute http(s) outlinks of ``doc`` with their anchor text, in
    document order (see module docstring for the exact contract).
    ``base_url`` is the page's own URL; a malformed one still yields the
    page's absolute hrefs."""
    base = base_url or ""
    out: list[tuple[str, str]] = []
    rebased = False
    for nid in doc.descendant_elements(0):
        tag = doc.tag[nid]
        if not rebased and tag == b"base":
            href = doc.attr(nid, b"href")
            if href is not None:
                rebased = True  # first <base href> wins, even if unusable
                ref = _clean_ref(href)
                if ref:
                    try:
                        base = urljoin(base, ref.split("#", 1)[0])
                    except ValueError:
                        pass
            continue
        if tag != b"a" and tag != b"area":
            continue
        href = doc.attr(nid, b"href")
        if href is None:
            continue
        ref = _clean_ref(href)
        if not ref or ref.startswith("#"):
            continue
        absu = _resolve(base, ref)
        if absu is not None:
            out.append((absu, _anchor_text(doc, nid)))
    return out


def extract_links(doc: Document, base_url: str) -> list[str]:
    """Absolute http(s) outlinks only (urls, document order) — the
    frontier-builder view of ``extract_links_with_text``."""
    return [u for u, _ in extract_links_with_text(doc, base_url)]
