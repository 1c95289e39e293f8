"""Deterministic sitemap fixture with independently composed expected
entries (the gen_links philosophy applied to R19).

COMPOSITION-FIRST: every entry picks its EXPECTED (kind, loc, lastmod,
changefreq, priority) record first, then derives the payload form that
must yield it — the generator never resolves a url, decodes an entity,
or validates a token, so the expectation is independent of
sources/sitemaps.py:

- loc forms: plain, entity-encoded ``&amp;`` in the query, CDATA-
  wrapped, whitespace-padded, relative (out-of-spec, forgiven — the
  absolute target is chosen first and the relative form derived);
- dropped entries appear in the payload and not in the expectation:
  missing/empty/self-closed ``<loc>``, ``javascript:`` loc, loc longer
  than 2048 chars;
- ``changefreq``: valid tokens embedded mixed-case (expected
  lowercase); invalid tokens (``sometimes``) → expected None;
- ``priority``: valid values kept; ``1.5`` / ``abc`` → expected None;
- structure mess that must not change the expectation: xml
  declaration, urlset namespace attrs, unknown extension elements
  (``<image:image><loc>…``) whose nested ``loc`` must NOT leak into
  the entry (direct-children rule), trailing garbage after the root,
  a SECOND urlset that must be ignored (first root wins);
- a third of the payloads are gzipped (single member); one payload is
  a two-member gzip whose second member is corrupt — the salvaging
  reader keeps member 1, so the expectation is member 1's entries;
- ``sitemapindex`` payloads yield kind='sitemap' entries (lastmod
  kept, changefreq/priority never);
- plain-TEXT sitemaps: one url per line, blank lines and non-http(s)
  lines skipped, one relative line composed against the sitemap url.

Rows: (url, body binary). Expected parquet twin: exploded
(sitemap_url, pos, kind, loc, lastmod, changefreq, priority).
"""

from __future__ import annotations

import gzip
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "sitemaps"
)
SITEMAPS_VERSION = "1"
N_MAPS = 60

_HOSTS = ["alpha.example", "beta.example", "gamma.example", "delta.example"]
_FREQ = ["always", "hourly", "daily", "weekly", "monthly", "yearly", "never"]


def _mangle(rng: random.Random, s: str) -> str:
    return "".join(c.upper() if rng.random() < 0.5 else c for c in s)


def _url_entry(rng: random.Random, host: str, i: int, map_url: str):
    """Compose one expected urlset entry + its XML form (or a dropped
    decoy: returns (xml, None))."""
    seg = f"p{i}n{rng.randrange(999)}"
    form = rng.randrange(10)
    if form == 0:  # dropped: no loc at all
        return "<url><lastmod>2026-01-02</lastmod></url>", None
    if form == 1:  # dropped: empty / self-closed loc
        inner = rng.choice(["<loc></loc>", "<loc/>", "<loc>   </loc>"])
        return f"<url>{inner}</url>", None
    if form == 2:  # dropped: non-http(s) loc
        return "<url><loc>javascript:void(0)</loc></url>", None
    if form == 3:  # dropped: loc too long (> 2048 post-resolution)
        long = f"https://{host}/" + "x" * 2100
        return f"<url><loc>{long}</loc></url>", None

    # kept entry: expectation first
    loc = f"https://{host}/site/{seg}"
    lastmod = None
    changefreq = None
    priority = None
    parts = []
    if form == 4:  # entity-encoded query
        loc += "?a=1&b=2"
        parts.append(f"<loc>https://{host}/site/{seg}?a=1&amp;b=2</loc>")
    elif form == 5:  # CDATA wrapper
        parts.append(f"<loc><![CDATA[{loc}]]></loc>")
    elif form == 6:  # whitespace padding
        parts.append(f"<loc>\n    {loc}\t </loc>")
    elif form == 7:  # relative form (absolute target chosen first)
        base_dir = map_url.rsplit("/", 1)[0] + "/"
        loc = base_dir + seg
        parts.append(f"<loc>{seg}</loc>")
    else:
        parts.append(f"<loc>{loc}</loc>")
    if rng.random() < 0.6:
        lastmod = rng.choice(
            ["2026-01-15", "2026-02-01T10:30:00+00:00", "2025-12-31"]
        )
        parts.append(f"<lastmod> {lastmod} </lastmod>")
    fr = rng.random()
    if fr < 0.4:
        changefreq = rng.choice(_FREQ)
        parts.append(f"<changefreq>{_mangle(rng, changefreq)}</changefreq>")
    elif fr < 0.55:  # invalid token → None
        parts.append("<changefreq>sometimes</changefreq>")
    pr = rng.random()
    if pr < 0.4:
        priority = rng.choice([0.1, 0.5, 0.8, 1.0])
        parts.append(f"<priority>{priority}</priority>")
    elif pr < 0.55:  # out-of-range / junk → None
        parts.append(f"<priority>{rng.choice(['1.5', '-0.2', 'abc'])}</priority>")
    if rng.random() < 0.2:  # extension decoy: nested loc must not leak
        parts.append(
            f"<image:image><loc>https://{host}/img/{seg}.png</loc>"
            "</image:image>"
        )
    rng.shuffle(parts)
    return "<url>" + "".join(parts) + "</url>", (
        "url", loc, lastmod, changefreq, priority
    )


def _one_sitemap(rng: random.Random, idx: int):
    """Compose one sitemap payload: (url, body bytes, expected entries)."""
    host = _HOSTS[idx % len(_HOSTS)]
    kind = idx % 6  # 0-2 urlset, 3 index, 4 text, 5 gz-urlset (via kind<3 gz)
    map_url = f"https://{host}/sitemaps/sm{idx}.xml"
    expected: list[tuple] = []
    if kind == 3:  # sitemapindex
        parts = ['<?xml version="1.0" encoding="UTF-8"?>',
                 '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
        for j in range(rng.randint(2, 5)):
            loc = f"https://{host}/sitemaps/part{idx}_{j}.xml.gz"
            lastmod = "2026-01-0%d" % (j + 1) if rng.random() < 0.5 else None
            lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
            # changefreq/priority on an index entry must be ignored
            junk = "<priority>0.9</priority>" if rng.random() < 0.3 else ""
            parts.append(f"<sitemap><loc>{loc}</loc>{lm}{junk}</sitemap>")
            expected.append(("sitemap", loc, lastmod, None, None))
        parts.append("</sitemapindex>")
        body = "".join(parts).encode()
        return map_url, body, expected
    if kind == 4:  # plain text
        map_url = f"https://{host}/sitemaps/urls{idx}.txt"
        lines = []
        for j in range(rng.randint(3, 7)):
            r = rng.random()
            if r < 0.15:
                lines.append("")  # blank skipped
            elif r < 0.3:
                lines.append("mailto:x@y.example")  # skipped
            elif r < 0.45:  # relative line resolves against the map url
                seg = f"t{idx}_{j}"
                lines.append(f"  {seg}  ")
                expected.append(
                    ("url", f"https://{host}/sitemaps/{seg}", None, None, None)
                )
            else:
                loc = f"https://{host}/txt/t{idx}_{j}"
                lines.append(loc)
                expected.append(("url", loc, None, None, None))
        body = "\n".join(lines).encode()
        if rng.random() < 0.3:
            body = gzip.compress(body, mtime=0)
        return map_url, body, expected
    # urlset
    parts = []
    if rng.random() < 0.7:
        parts.append('<?xml version="1.0" encoding="UTF-8"?>')
    parts.append(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    )
    for j in range(rng.randint(3, 8)):
        xml, exp = _url_entry(rng, host, j, map_url)
        parts.append(xml)
        if exp is not None:
            expected.append(exp)
    parts.append("</urlset>")
    if rng.random() < 0.25:  # second root must be ignored
        parts.append(
            "<urlset><url><loc>https://ignored.example/x</loc></url></urlset>"
        )
    elif rng.random() < 0.25:
        parts.append("trailing garbage \x01\x02 after the root")
    body = "".join(parts).encode()
    if kind == 2:
        body = gzip.compress(body, mtime=0)
        if idx % 12 == 2:  # corrupt second member: member 1 salvaged
            body += b"\x1f\x8b\x08\x00garbage-not-a-member"
    return map_url, body, expected


def gen_rows(n: int = N_MAPS, seed: int = 0x517E):
    rng = random.Random(seed)
    urls, bodies, exps = [], [], []
    for i in range(n):
        u, b, e = _one_sitemap(rng, i)
        urls.append(u)
        bodies.append(b)
        exps.append(e)
    return urls, bodies, exps


def ensure_sitemaps() -> tuple[str, str]:
    """Generate + cache (sitemaps parquet, expected exploded parquet)."""
    os.makedirs(DATA_DIR, exist_ok=True)
    maps_path = os.path.join(DATA_DIR, "sitemaps.parquet")
    expected_path = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == SITEMAPS_VERSION:
                return maps_path, expected_path
    urls, bodies, exps = gen_rows()
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "body": pa.array(bodies, pa.binary()),
            }
        ),
        maps_path,
    )
    eu, ep, ek, el, em, ec, epr = [], [], [], [], [], [], []
    for u, entries in zip(urls, exps):
        for p, (k, loc, lm, cf, pr) in enumerate(entries):
            eu.append(u)
            ep.append(p)
            ek.append(k)
            el.append(loc)
            em.append(lm)
            ec.append(cf)
            epr.append(pr)
    pq.write_table(
        pa.table(
            {
                "sitemap_url": pa.array(eu, pa.string()),
                "pos": pa.array(ep, pa.int32()),
                "kind": pa.array(ek, pa.string()),
                "loc": pa.array(el, pa.string()),
                "lastmod": pa.array(em, pa.string()),
                "changefreq": pa.array(ec, pa.string()),
                "priority": pa.array(epr, pa.float64()),
            }
        ),
        expected_path,
    )
    with open(marker, "w") as f:
        f.write(SITEMAPS_VERSION)
    return maps_path, expected_path


if __name__ == "__main__":
    p, e = ensure_sitemaps()
    print(p, pq.read_table(p).num_rows, "sitemaps")
    print(e, pq.read_table(e).num_rows, "expected entries")
