"""Deterministic page-metadata fixture with independently composed
expectations (the gen_pages/gen_links philosophy applied to X10).

COMPOSITION-FIRST: every field picks its EXPECTED value first, then
derives the markup form that must yield it — the generator never
normalizes whitespace, decodes an entity, resolves a url, or lowercases
a token, so the expectation is independent of engine/meta.py:

- title: expected normalized string chosen first; embedded form adds
  messy whitespace and/or an ``&amp;`` entity; a SECOND ``<title>`` is
  sometimes emitted and must be ignored; some pages omit it (→ NULL);
- description / robots: expected value first; the ``<meta>`` name
  attribute is case-mangled; a content-LESS ``<meta name=description>``
  decoy sometimes precedes the real one (metas without content never
  match); ``<meta name=keywords>`` decoys throughout; robots expected
  is lowercase while the embedded directives are mixed-case;
- canonical: the absolute target is chosen first; the href form is
  derived (absolute + fragment-to-strip, root-relative, plain relative
  against an explicit ``<base href>`` emitted verbatim); multi-token
  ``rel="alternate canonical"`` counts; ``rel=stylesheet`` decoys are
  ignored; on some pages the FIRST canonical has a ``javascript:`` href
  and a later good canonical exists — expected NULL (first wins, even
  if unusable); some pages omit it (→ NULL);
- lang: expected lowercase tag first, embedded with mixed case;
- charset: expected lowercase token first; embedded as
  ``<meta charset>`` or the ``http-equiv=content-type`` parameter form
  (mixed case, quoted/unquoted); when both appear the FIRST in document
  order is the expectation;
- OpenGraph: expected (sorted property → value) map first; embedded
  metas are order-shuffled and case-mangled, a duplicate og:title that
  must lose first-wins is sometimes added, plus non-og ``property=``
  and ``name="og:fake"`` decoys.

Rows: (url, warc_ts, html binary). Expected parquet twin: one row per
page (url, title, description, meta_robots, canonical_url, lang,
charset, og_props, og_values) for the DuckDB contract oracle.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "meta")
META_VERSION = "1"
N_PAGES = 100
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs

_HOSTS = ["alpha.example", "beta.example", "gamma.example", "delta.example"]
_WORDS = "crawl corpus spark shard parse robot title meta".split()


def _mangle_case(rng: random.Random, s: str) -> str:
    return "".join(
        c.upper() if rng.random() < 0.5 else c.lower() for c in s
    )


def _messy(rng: random.Random, words: list[str]) -> str:
    """Derive a messy embedded form whose normalization is the
    one-space join of ``words`` (expectation chosen by the caller)."""
    seps = [" ", "  ", "\n", "\t ", " \r\n "]
    out = rng.choice(["", " ", "\n  "])
    for i, w in enumerate(words):
        if i:
            out += rng.choice(seps)
        out += w
    return out + rng.choice(["", " ", "\t"])


def _page(rng: random.Random, page_url: str) -> tuple[str, dict]:
    host = page_url.split("/")[2]
    exp: dict = {
        "title": None, "description": None, "meta_robots": None,
        "canonical_url": None, "lang": None, "charset": None,
    }
    og: dict[str, str] = {}

    # --- html/lang -------------------------------------------------------
    if rng.random() < 0.7:
        tag = rng.choice(["en", "en-us", "de", "fr-ca", "pt-br"])
        exp["lang"] = tag
        html_open = f'<html lang="{_mangle_case(rng, tag)}">'
    else:
        html_open = "<html>"
    head: list[str] = []
    body: list[str] = []

    # --- <base href> (emitted verbatim, absolute) -----------------------
    base_dir = f"https://{host}/canon/base/"
    use_base = rng.random() < 0.3
    if use_base:
        head.append(f'<base href="{base_dir}">')

    # --- title -----------------------------------------------------------
    if rng.random() < 0.85:
        w = [rng.choice(_WORDS) for _ in range(rng.randint(1, 3))]
        kind = rng.randrange(3)
        if kind == 0:
            exp["title"] = " ".join(w)
            head.append(f"<title>{_messy(rng, w)}</title>")
        elif kind == 1:  # entity decodes into the expectation
            exp["title"] = f"{w[0]} & co"
            head.append(f"<title>{w[0]} &amp; co</title>")
        else:  # empty title element: present → ""
            exp["title"] = ""
            head.append("<title>   </title>")
        if rng.random() < 0.3:  # second title must be ignored
            body.append("<title>ignored later title</title>")

    # --- description / robots / decoys -----------------------------------
    head.append('<meta name="keywords" content="decoy, words">')
    if rng.random() < 0.75:
        w = [rng.choice(_WORDS) for _ in range(rng.randint(2, 5))]
        if rng.random() < 0.3:  # content-less decoy never matches
            head.append(f'<meta name="{_mangle_case(rng, "description")}">')
        if rng.random() < 0.5:
            exp["description"] = " ".join(w) + " & more"
            form = _messy(rng, w) + " &amp; more"
        else:
            exp["description"] = " ".join(w)
            form = _messy(rng, w)
        head.append(
            f'<meta name="{_mangle_case(rng, "description")}" '
            f'content="{form}">'
        )
        if rng.random() < 0.25:  # later duplicate ignored
            body.append('<meta name="description" content="late decoy">')
    if rng.random() < 0.6:
        directives = rng.choice(
            [["noindex"], ["noindex", "nofollow"], ["index", "follow"],
             ["none"]]
        )
        exp["meta_robots"] = ", ".join(directives)
        head.append(
            '<meta name="ROBOTS" content="'
            + ", ".join(_mangle_case(rng, d) for d in directives)
            + '">'
        )

    # --- canonical --------------------------------------------------------
    head.append(f'<link rel="stylesheet" href="/css/{rng.randrange(9)}.css">')
    r = rng.random()
    if r < 0.25:  # absolute, fragment stripped
        t = f"https://{rng.choice(_HOSTS)}/canon/p{rng.randrange(999)}"
        exp["canonical_url"] = t
        frag = "#top" if rng.random() < 0.5 else ""
        rel = "canonical" if rng.random() < 0.7 else "alternate canonical"
        head.append(f'<link rel="{rel}" href="{t}{frag}">')
    elif r < 0.5:  # root-relative: host from the page (base keeps host too)
        seg = f"c{rng.randrange(999)}"
        exp["canonical_url"] = f"https://{host}/root/{seg}"
        head.append(f'<link rel="canonical" href="/root/{seg}">')
    elif r < 0.7:  # plain relative: dir from the base or the page url
        seg = f"r{rng.randrange(999)}.html"
        eff_dir = base_dir if use_base else page_url.rsplit("/", 1)[0] + "/"
        exp["canonical_url"] = eff_dir + seg
        head.append(f'<link rel="canonical" href="{seg}">')
    elif r < 0.8:  # first canonical unusable → NULL, later one never wins
        head.append('<link rel="canonical" href="javascript:void(0)">')
        body.append(
            f'<link rel="canonical" href="https://{host}/never">'
        )
    # else: no canonical → NULL

    # --- charset -----------------------------------------------------------
    cr = rng.random()
    if cr < 0.35:
        cs = rng.choice(["utf-8", "iso-8859-1", "windows-1251"])
        exp["charset"] = cs
        head.append(f'<meta charset="{_mangle_case(rng, cs)}">')
    elif cr < 0.6:
        cs = rng.choice(["utf-8", "iso-8859-1"])
        exp["charset"] = cs
        q = rng.choice(["'", ""])  # inner quote must not end the attr
        head.append(
            f'<meta http-equiv="{_mangle_case(rng, "Content-Type")}" '
            f'content="text/html; CharSet={q}{_mangle_case(rng, cs)}{q}">'
        )
        if rng.random() < 0.5:  # later charset-attr form loses on order
            head.append('<meta charset="koi8-r">')
    # else: none → NULL

    # --- OpenGraph ----------------------------------------------------------
    if rng.random() < 0.7:
        cand = {
            "og:title": " ".join(
                rng.choice(_WORDS) for _ in range(rng.randint(1, 2))
            ),
            "og:type": rng.choice(["article", "website"]),
            "og:image": f"https://{host}/img/{rng.randrange(99)}.png",
            "og:description": " ".join(
                rng.choice(_WORDS) for _ in range(3)
            ),
        }
        keys = rng.sample(sorted(cand), rng.randint(1, 4))
        og = {k: cand[k] for k in keys}
        metas = [
            f'<meta property="{_mangle_case(rng, k)}" content="{v}">'
            for k, v in og.items()
        ]
        metas.append('<meta property="fb:app_id" content="123">')
        metas.append('<meta name="og:fake" content="not opengraph">')
        metas.append('<meta name="twitter:card" content="summary">')
        rng.shuffle(metas)
        if "og:title" in og and rng.random() < 0.4:
            # first-wins duplicate: must land AFTER the real og:title
            metas.append('<meta property="og:title" content="loser">')
        head.extend(metas)

    props = sorted(og)
    exp["og_props"] = props
    exp["og_values"] = [og[p] for p in props]

    # a third of the pages lose their </head>: metadata still counts
    closer = "" if rng.random() < 0.33 else "</head>"
    html = (
        "<!DOCTYPE html>"
        + html_open
        + "<head>"
        + "".join(head)
        + closer
        + "<body><main><p>"
        + " ".join(rng.choice(_WORDS) for _ in range(6))
        + "</p>"
        + "".join(body)
        + "</main></body></html>"
    )
    return html, exp


def gen_rows(n: int = N_PAGES, seed: int = 0x10E7A):
    rng = random.Random(seed)
    urls, tss, htmls, exps = [], [], [], []
    for i in range(n):
        host = _HOSTS[i % len(_HOSTS)]
        page_url = f"https://{host}/metadocs/page{i}.html"
        html, exp = _page(rng, page_url)
        urls.append(page_url)
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        exps.append(exp)
    return urls, tss, htmls, exps


def ensure_meta() -> tuple[str, str]:
    """Generate + cache (pages parquet, expected parquet)."""
    os.makedirs(DATA_DIR, exist_ok=True)
    pages_path = os.path.join(DATA_DIR, "meta_pages.parquet")
    expected_path = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == META_VERSION:
                return pages_path, expected_path
    urls, tss, htmls, exps = gen_rows()
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        ),
        pages_path,
    )
    cols: dict[str, pa.Array] = {"url": pa.array(urls, pa.string())}
    for f in ("title", "description", "meta_robots", "canonical_url",
              "lang", "charset"):
        cols[f] = pa.array([e[f] for e in exps], pa.string())
    cols["og_props"] = pa.array(
        [e["og_props"] for e in exps], pa.list_(pa.string())
    )
    cols["og_values"] = pa.array(
        [e["og_values"] for e in exps], pa.list_(pa.string())
    )
    pq.write_table(pa.table(cols), expected_path)
    with open(marker, "w") as f:
        f.write(META_VERSION)
    return pages_path, expected_path


if __name__ == "__main__":
    p, e = ensure_meta()
    print(p, pq.read_table(p).num_rows, "pages")
    print(e, pq.read_table(e).num_rows, "expected records")
