"""Deterministic synthetic `pages` fixture generator — build-plan M0
(FIXTURES.md §1; schema mandated by BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

ALL golden columns are composed INDEPENDENTLY of the engine, from the same
template parameters that compose the html (plain string building / hand
arithmetic per the pinned rules) — so fixture tests are not self-confirming:

- ``text``           — mcx-1 main-content output (SURVEY.md §2.A.5 X6);
- ``sel_*``          — match counts for the SELECTOR_BATTERY below
                       (S3/S6/S8–S16 coverage: every attr operator,
                       combinators, pseudo-classes — VERDICT r01 #1);
- ``tc_*``           — per-document element counts for TAG_BATTERY
                       (spans oracle: tc totals == span tag histogram,
                       ``sel_all`` == total element count == n_spans);
- ``se_*``           — querySelectorAll→innerText expectations for the
                       three select_extract selectors;
- ``main_outer_html``— X2/X3 serialization of the <main> element under the
                       pinned rules (requiresQuotes unquoted-when-legal,
                       first duplicate attribute wins, & < > text escaping,
                       void ``/>``, raw-text verbatim, implied end tags
                       written explicitly).

Properties (seed=42, pure, no wall clock):
- every template family (FIXTURES.md §1) appears at every scale;
- host distribution is skewed: ≥30% of rows on one hot host (exercises R4
  salting);
- ~1% duplicated urls with a later warc_ts (exercises R10 dedup-by-latest);
- ~0.2% oversized rows (≈1 MiB html) whose bulk is stripped boilerplate
  (huge <script>/<nav> filler) so the golden text stays small;
- warc_ts = 2026-01-01T00:00:00Z + doc_id seconds (no now()).

Usage:  python fixtures/gen_pages.py [sf ...]   (default: 0.001 0.01 0.1)
        or  ensure_pages(sf) from code — generates once, caches on disk
        (regenerates automatically when FIXTURE_VERSION changes).
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
FIXTURE_VERSION = "3"  # bump on ANY golden-composition change
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
ROWS = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}
DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

HOT_HOST = "hot.example.com"
HOSTS = [
    "alpha.example.org",
    "beta.example.net",
    "gamma.example.io",
    "delta.example.dev",
    "epsilon.example.co",
    "zeta.example.app",
]
LANGS = ["en", "de", "fr", "es", "zh"]

WORDS = (
    "data spark engine crawl web page text extract parse token stream "
    "batch shuffle partition skew salt arrow column row schema byte span "
    "node tree forest query select match block inline anchor table cell "
    "list item head body title script style content article section nav"
).split()

MB_WORDS = ["café", "naïve", "Über", "文字", "données", "señal", "❤", "π"]

# (raw-entity, expected-decoded) pairs for the entities family.
# NB: &nbsp; decodes to U+00A0 which the mcx-1 whitespace collapse treats as
# whitespace — covered separately below.
ENTITY_PAIRS = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&Uuml;", "Ü"),
    ("&eacute;", "é"),
    ("&ndash;", "–"),
    ("&copy;", "©"),
    ("&#65;", "A"),
    ("&#228;", "ä"),
    ("&#x41;", "A"),
    ("&#X42;", "B"),
    ("&#x1F4A9;", "\U0001f4a9"),
    ("&notareal;", "&notareal;"),  # unknown → literal
    ("&amp", "&amp"),  # no semicolon → literal
    ("&#0;", "&#0;"),  # invalid codepoint → literal
    ("&#1114112;", "&#1114112;"),  # out of range → literal
    ("&#xD800;", "&#xD800;"),  # surrogate → literal
]

BOILER_HEAD = (
    "<!DOCTYPE html><html><head><title>{title}</title>"
    '<meta charset="utf-8"><script>var t="</div>"; if(1<2){{x()}}</script>'
    "<style>p>b{{color:red}}</style></head><body>"
    '<nav><ul><li><a href="/">Home</a><li><a href="/x">X</a></ul></nav>'
    "<header><h1>SiteHeader</h1></header>"
)
BOILER_TAIL = (
    '<aside>related junk</aside><footer>&copy; 2026 site <a href="/p">priv</a>'
    "</footer></body></html>"
)

# --------------------------------------------------------------- golden batteries

# CSS-selector battery (key → selector). Counts are composed BY HAND per
# family below + the boiler constants; the driver oracle compares them
# against the engine's select_count_df output per (url, warc_ts).
SELECTOR_BATTERY = [
    ("sel_all", "*"),  # S3 universal
    ("sel_datax", "[data-x]"),  # S6 presence
    ("sel_dataxw", "[data-x~=beta]"),  # S8 word
    ("sel_hlang", "[hreflang|=en]"),  # S9 dash
    ("sel_ahttps", "a[href^=https]"),  # S10 prefix
    ("sel_imgpng", "img[src$=.png]"),  # S10 suffix
    ("sel_adeep", "a[href*=deep]"),  # S10 substring
    ("sel_pp", "p + p"),  # S13 adjacent sibling
    ("sel_h1p", "h1 ~ p"),  # S14 general sibling
    ("sel_lifirst", "li:first-child"),  # S15
    ("sel_tdlast", "td:last-child"),  # S15
    ("sel_empty", ":empty"),  # S15
    ("sel_pnot", "p:not(.first)"),  # S15 :not + S5 class
    ("sel_liodd", "li:nth-child(2n+1)"),  # S15 An+B
    ("sel_p2", "p:nth-child(2)"),  # S15
    ("sel_ponly", "p:only-of-type"),  # S15
    ("sel_pfot", "p:first-of-type"),  # S15
    ("sel_plot", "p:last-of-type"),  # S15
    ("sel_mainchild", "main > p"),  # S12 child
    ("sel_desc", "main p"),  # S11 descendant
    ("sel_group", "h1, td"),  # S16 groups
    ("sel_oc", ":only-child"),  # S15
]
SEL_KEYS = [k for k, _ in SELECTOR_BATTERY]

# Element-tag battery for the spans oracle (boiler/filler contribute ONLY
# via the constants below — nav/script deliberately excluded so the
# oversized filler cannot touch these columns).
TAG_BATTERY = ["p", "li", "td", "a", "h1", "div", "span", "table", "main"]
TAG_KEYS = [f"tc_{t}" for t in TAG_BATTERY]

# select_extract golden: the three contract selectors
SE_KEYS = [
    "se_mainh1_n",
    "se_mainh1_first",
    "se_tabletd_n",
    "se_tabletd_first",
    "se_wrapp_n",
    "se_wrapp_first",
]
SELECT_EXTRACT_SELECTORS = ["main h1", "table td", ".wrap p"]

# Boiler DOM (constant on every page):
#   html > head > (title, meta, script, style)
#   html > body > (nav > ul > (li > a, li > a), header > h1,
#                  [CORE <main>…], aside, footer > a)
# 18 elements. Battery contributions, derived by hand:
#   sel_all=18 · li:first-child: nav li#1 · :empty: <meta> (void, no
#   children) · li:nth-child(2n+1): li#1 · h1,td group: header h1 ·
#   :only-child: html (root's lone element), nav>ul, li>a ×2, header>h1,
#   footer>a = 6.
BOILER_SEL = {
    "sel_all": 18,
    "sel_lifirst": 1,
    "sel_empty": 1,
    "sel_liodd": 1,
    "sel_group": 1,
    "sel_oc": 6,
}
BOILER_TC = {"tc_li": 2, "tc_a": 3, "tc_h1": 1}


def _stats(main_html: str, **kw) -> dict:
    """Core-contribution stats dict: selector-battery counts, tag counts,
    select_extract expectations, and the expected <main> outerHTML."""
    st = {k: 0 for k in SEL_KEYS}
    st.update({k: 0 for k in TAG_KEYS})
    st.update(
        {
            "se_mainh1_n": 0,
            "se_mainh1_first": None,
            "se_tabletd_n": 0,
            "se_tabletd_first": None,
            "se_wrapp_n": 0,
            "se_wrapp_first": None,
        }
    )
    st["main_outer_html"] = main_html
    for k, v in kw.items():
        if k in st:
            st[k] = v
        else:
            raise KeyError(k)
    return st


def _esc(s: str) -> str:
    """Serializer text escaping (& < >, ampersand first) — engine/extract.py
    _escape_text, re-derived here by plain string building."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _w(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


# --- template families ------------------------------------------------------------
# Each returns (html_core, expected_text, stats). html_core goes between
# BOILER_HEAD and BOILER_TAIL; expected_text is the golden mcx-1
# main-content output for the FULL page; stats carries the hand-composed
# golden counts/serialization for the core (boiler constants added later).


def fam_clean_article(rng):
    title = _w(rng, 3)
    paras = [_w(rng, rng.randint(5, 14)) + "." for _ in range(rng.randint(2, 5))]
    n = len(paras)
    body = "<article><h1>" + title + "</h1>"
    for p in paras:
        body += "<p>" + p + "</p>"
    body += "</article>"
    html = "<main>" + body + "</main>"
    st = _stats(
        html,  # input core is already in serialized form
        sel_all=3 + n,
        sel_pp=n - 1,  # article children h1,p×n → n-1 adjacent p pairs
        sel_h1p=n,  # every p follows the h1 among article's children
        sel_pnot=n,
        sel_p2=1,  # article's 2nd element child is the first p
        sel_pfot=1,
        sel_plot=1,
        sel_ponly=1 if n == 1 else 0,
        sel_desc=n,
        sel_group=1,  # the h1
        sel_oc=1,  # article = main's only element child
        tc_p=n,
        tc_h1=1,
        tc_main=1,
        se_mainh1_n=1,
        se_mainh1_first=title,
    )
    return html, "\n".join([title] + paras), st


def fam_entities(rng):
    pairs = rng.sample(ENTITY_PAIRS, k=4)
    w1, w2 = _w(rng, 2), _w(rng, 2)
    segs_html = [f"{w1} {raw} {w2}" for raw, _ in pairs]
    segs_txt = [f"{w1} {dec} {w2}" for _, dec in pairs]
    # serialized form: decoded text re-escaped (& < > only)
    segs_ser = [f"{w1} {_esc(dec)} {w2}" for _, dec in pairs]
    # one nbsp case: collapses to a single space in mcx-1 text; the
    # serializer emits the literal U+00A0 character
    segs_html.append(f"{w1}&nbsp;{w2}")
    segs_txt.append(f"{w1} {w2}")
    segs_ser.append(f"{w1} {w2}")
    html = "<main>" + "".join(f"<p>{s}</p>" for s in segs_html) + "</main>"
    ser = "<main>" + "".join(f"<p>{s}</p>" for s in segs_ser) + "</main>"
    st = _stats(
        ser,
        sel_all=6,
        sel_pp=4,
        sel_pnot=5,
        sel_p2=1,
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=5,
        sel_desc=5,
        tc_p=5,
        tc_main=1,
    )
    return html, "\n".join(segs_txt), st


def fam_implied_end(rng):
    items = [_w(rng, 2) for _ in range(3)]
    p1, p2 = _w(rng, 3), _w(rng, 3)
    cells = [_w(rng, 1), _w(rng, 1), _w(rng, 1)]
    opts = [_w(rng, 1), _w(rng, 1)]
    html = (
        "<main><ul>"
        + "".join(f"<li>{i}" for i in items)
        + f"</ul><p>{p1}<p>{p2}"
        + f"<table><tr><td>{cells[0]}<td>{cells[1]}<tr><td>{cells[2]}</table>"
        + f"<dl><dt>{opts[0]}<dd>{opts[1]}</dl></main>"
    )
    # serialized: implied end tags written explicitly (D5 recovery; no
    # tbody synthesis — htmld-style lenient close-only recovery)
    ser = (
        "<main><ul>"
        + "".join(f"<li>{i}</li>" for i in items)
        + f"</ul><p>{p1}</p><p>{p2}</p>"
        + f"<table><tr><td>{cells[0]}</td><td>{cells[1]}</td></tr>"
        + f"<tr><td>{cells[2]}</td></tr></table>"
        + f"<dl><dt>{opts[0]}</dt><dd>{opts[1]}</dd></dl></main>"
    )
    st = _stats(
        ser,
        # main, ul, li×3, p×2, table, tr×2, td×3, dl, dt, dd = 16
        sel_all=16,
        sel_pp=1,  # main children ul,p,p,table,dl → one adjacent p pair
        sel_lifirst=1,
        sel_tdlast=2,  # td#2 of row 1; the lone td of row 2
        sel_pnot=2,
        sel_liodd=2,  # li positions 1 and 3
        sel_p2=1,  # p at main-child position 2
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=2,
        sel_desc=2,
        sel_group=3,  # the three td
        sel_oc=1,  # row 2's lone td
        tc_p=2,
        tc_li=3,
        tc_td=3,
        tc_table=1,
        tc_main=1,
        se_tabletd_n=3,
        se_tabletd_first=cells[0],
    )
    return html, "\n".join(items + [p1, p2] + cells + opts), st


def fam_misnesting(rng):
    w1, w2, w3, w4 = (_w(rng, 2) for _ in range(4))
    # <span> left open, closed by </div>; <b><i>x</b>y</i> misnest; stray </em>
    html = (
        f"<main><div><span>{w1}</div>"
        f"<p><b><i>{w2}</b> {w3}</em></p>"
        f"<div>{w4}"
        "</main>"
    )
    # D6 recovery: </div> closes span then div; </b> pops through i; </em>
    # ignored; </main> closes the trailing div
    ser = (
        f"<main><div><span>{w1}</span></div>"
        f"<p><b><i>{w2}</i></b> {w3}</p>"
        f"<div>{w4}</div></main>"
    )
    st = _stats(
        ser,
        sel_all=7,  # main, div, span, p, b, i, div
        sel_pnot=1,
        sel_p2=1,  # main children div,p,div
        sel_pfot=1,
        sel_plot=1,
        sel_ponly=1,
        sel_mainchild=1,
        sel_desc=1,
        sel_oc=3,  # div>span, p>b, b>i
        tc_p=1,
        tc_div=2,
        tc_span=1,
        tc_main=1,
    )
    # div blocks: w1 | p block: w2 w3 | w4
    return html, "\n".join([w1, f"{w2} {w3}", w4]), st


def fam_raw_text(rng):
    w1, w2 = _w(rng, 3), _w(rng, 2)
    html = (
        f'<main><p>{w1}</p><script>if(a<b){{s="</p>x"}}</script>'
        f"<style>a>b{{top:0}}</style><p>{w2}</p></main>"
    )
    # raw-text content round-trips verbatim (T15/serializer no-escape)
    st = _stats(
        html,
        sel_all=5,  # main, p, script, style, p
        sel_pnot=2,
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=2,
        sel_desc=2,
        tc_p=2,
        tc_main=1,
        # no sel_pp: script/style sit between the two p elements
        # no sel_p2: main children p(1),script(2),style(3),p(4)
    )
    return html, "\n".join([w1, w2]), st


def fam_attributes(rng):
    w1, w2, w3 = _w(rng, 2), _w(rng, 2), _w(rng, 2)
    cls = rng.choice(WORDS)
    html = (
        f"<main><p class=\"{cls} x\" data-k='v1' bare>{w1}</p>"
        f'<p title="a&amp;b" dup=1 dup=2>{w2}</p>'
        f"<a href=/deep/path/>{w3}</a></main>"
    )
    # serialization: class keeps quotes (space); data-k/title/href/dup go
    # unquoted (requiresQuotes); title decodes then re-escapes the &;
    # FIRST duplicate attribute wins; bare attr stays bare
    ser = (
        f'<main><p class="{cls} x" data-k=v1 bare>{w1}</p>'
        f"<p title=a&amp;b dup=1>{w2}</p>"
        f"<a href=/deep/path/>{w3}</a></main>"
    )
    st = _stats(
        ser,
        sel_all=4,
        sel_adeep=1,
        sel_pp=1,
        sel_pnot=2,
        sel_p2=1,
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=2,
        sel_desc=2,
        tc_p=2,
        tc_a=1,
        tc_main=1,
    )
    return html, "\n".join([w1, w2, w3]), st


def fam_comments(rng):
    w1, w2 = _w(rng, 3), _w(rng, 1)
    html = (
        f"<main><!-- c1 -- inner --><p>{w1}</p>"
        f"<![CDATA[{w2}]]><?pi data?><!-- trailing --></main>"
    )
    # comments/CDATA/PI round-trip verbatim; they are not elements, so the
    # p is main's only element child
    st = _stats(
        html,
        sel_all=2,
        sel_pnot=1,
        sel_pfot=1,
        sel_plot=1,
        sel_ponly=1,
        sel_mainchild=1,
        sel_desc=1,
        sel_oc=1,
        tc_p=1,
        tc_main=1,
    )
    # CDATA is character data → its own trailing block
    return html, "\n".join([w1, w2]), st


def fam_selector_playground(rng):
    w = [_w(rng, 2) for _ in range(4)]
    html = (
        f'<main><div id="pg" class="wrap">'
        f'<p class="first">{w[0]}</p><p>{w[1]}</p>'
        f'<span data-x="alpha beta">{w[2]}</span> '
        f'<a href="https://ex.com/a" hreflang="en-US">{w[3]}</a>'
        f"</div></main>"
    )
    # id/class/href/hreflang values are quote-free → unquoted; data-x has a
    # space → stays quoted; the inter-tag space text node is preserved
    ser = (
        f"<main><div id=pg class=wrap>"
        f"<p class=first>{w[0]}</p><p>{w[1]}</p>"
        f'<span data-x="alpha beta">{w[2]}</span> '
        f"<a href=https://ex.com/a hreflang=en-US>{w[3]}</a>"
        f"</div></main>"
    )
    st = _stats(
        ser,
        sel_all=6,  # main, div, p, p, span, a
        sel_datax=1,
        sel_dataxw=1,  # beta ∈ "alpha beta"
        sel_hlang=1,  # en-US |= en
        sel_ahttps=1,
        sel_pp=1,
        sel_pnot=1,  # second p only (.first excluded)
        sel_p2=1,
        sel_pfot=1,
        sel_plot=1,
        sel_desc=2,
        sel_oc=1,  # main>div
        tc_p=2,
        tc_a=1,
        tc_div=1,
        tc_span=1,
        tc_main=1,
        se_wrapp_n=2,
        se_wrapp_first=w[0],
    )
    # p,p are blocks; span+a inline → merge into the div's trailing block
    return html, "\n".join([w[0], w[1], f"{w[2]} {w[3]}"]), st


def fam_void(rng):
    w1, w2, w3 = _w(rng, 2), _w(rng, 2), _w(rng, 2)
    html = (
        f"<main><p>{w1}<br>{w2}</p><hr>"
        f'<p>{w3}<img src="i.png"><input type=text disabled><wbr></p></main>'
    )
    # voids serialize as <tag …/>; src=i.png loses its quotes; an unquoted
    # value directly before /> gets a separating space (fixed-point rule)
    ser = (
        f"<main><p>{w1}<br/>{w2}</p><hr/>"
        f"<p>{w3}<img src=i.png /><input type=text disabled/><wbr/></p></main>"
    )
    st = _stats(
        ser,
        sel_all=8,  # main, p, br, hr, p, img, input, wbr
        sel_imgpng=1,
        sel_empty=5,  # br, hr, img, input, wbr
        sel_pnot=2,
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=2,
        sel_desc=2,
        sel_oc=1,  # br = first p's only element child
        tc_p=2,
        tc_main=1,
        # no sel_pp / sel_p2: hr sits between the p's at positions 1,2,3
    )
    return html, "\n".join([w1, w2, w3]), st


def fam_encoding(rng):
    mb = rng.sample(MB_WORDS, k=3)
    w = _w(rng, 2)
    html = (
        f'<main><p lang="mixed">{mb[0]} {w} {mb[1]}</p>'
        f"<p>{mb[2]} &#x2603; snow</p></main>"
    )
    ser = (
        f"<main><p lang=mixed>{mb[0]} {w} {mb[1]}</p>"
        f"<p>{mb[2]} ☃ snow</p></main>"
    )
    st = _stats(
        ser,
        sel_all=3,
        sel_pp=1,
        sel_pnot=2,
        sel_p2=1,
        sel_pfot=1,
        sel_plot=1,
        sel_mainchild=2,
        sel_desc=2,
        tc_p=2,
        tc_main=1,
    )
    return html, "\n".join([f"{mb[0]} {w} {mb[1]}", f"{mb[2]} ☃ snow"]), st


FAMILIES = [
    ("clean", fam_clean_article),
    ("entities", fam_entities),
    ("implied", fam_implied_end),
    ("misnest", fam_misnesting),
    ("rawtext", fam_raw_text),
    ("attrs", fam_attributes),
    ("comments", fam_comments),
    ("selector", fam_selector_playground),
    ("void", fam_void),
    ("encoding", fam_encoding),
]

_OVERSIZE_FILLER = (
    "<script>//" + "x" * 120 + "\n</script>" + "<nav>" + "junk " * 24 + "</nav>"
)
_OVERSIZE_REPS = 6500
# The filler lands AFTER </html> → D6 lenient recovery attaches its
# script+nav elements at the document root: +2 elements per repetition,
# and <html> stops being the root's only element child.
_OVERSIZE_EXTRA_ELEMENTS = 2 * _OVERSIZE_REPS


def _final_stats(core_st: dict, oversized: bool) -> dict:
    """Core stats + boiler constants (+ oversized filler adjustment)."""
    st = dict(core_st)
    for k, v in BOILER_SEL.items():
        st[k] += v
    for k, v in BOILER_TC.items():
        st[k] += v
    if oversized:
        st["sel_all"] += _OVERSIZE_EXTRA_ELEMENTS
        st["sel_oc"] -= 1  # html loses :only-child at the root
    return st


def gen_rows(n: int, seed: int = SEED):
    rng = random.Random(seed)
    cols: dict[str, list] = {
        "url": [],
        "warc_ts": [],
        "html": [],
        "text": [],
        "lang": [],
        "main_outer_html": [],
    }
    for k in SEL_KEYS + TAG_KEYS + SE_KEYS:
        cols[k] = []

    def emit(url, ts, html, text, lang, st, oversized):
        fs = _final_stats(st, oversized)
        cols["url"].append(url)
        cols["warc_ts"].append(ts)
        cols["html"].append(html.encode("utf-8"))
        cols["text"].append(text)
        cols["lang"].append(lang)
        cols["main_outer_html"].append(fs["main_outer_html"])
        for k in SEL_KEYS + TAG_KEYS + SE_KEYS:
            cols[k].append(fs[k])

    for doc_id in range(n):
        fam_name, fam = FAMILIES[doc_id % len(FAMILIES)]
        core, expected, st = fam(rng)
        title = _w(rng, 2)
        html = BOILER_HEAD.format(title=title) + core + BOILER_TAIL
        oversized = doc_id % 500 == 137  # ~0.2% oversized (~1 MiB)
        if oversized:
            html += _OVERSIZE_FILLER * _OVERSIZE_REPS
        host = HOT_HOST if rng.random() < 0.35 else rng.choice(HOSTS)
        url = f"https://{host}/{fam_name}/{doc_id}"
        lang = LANGS[doc_id % len(LANGS)]
        emit(url, EPOCH_US + doc_id * 1_000_000, html, expected, lang, st, oversized)
        if doc_id % 100 == 73:  # ~1% duplicated url with later warc_ts
            core2, expected2, st2 = fam(rng)
            emit(
                url,
                EPOCH_US + (doc_id + 10_000_000) * 1_000_000,
                BOILER_HEAD.format(title=title) + core2 + BOILER_TAIL,
                expected2,
                lang,
                st2,
                False,
            )
    return cols


SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("main_outer_html", pa.string()),
    ]
    + [(k, pa.int32()) for k in SEL_KEYS + TAG_KEYS]
    + [
        ("se_mainh1_n", pa.int32()),
        ("se_mainh1_first", pa.string()),
        ("se_tabletd_n", pa.int32()),
        ("se_tabletd_first", pa.string()),
        ("se_wrapp_n", pa.int32()),
        ("se_wrapp_first", pa.string()),
    ]
)


def pages_path(sf: str) -> str:
    """Directory of sharded parquet files (a single file would make the
    scan+shuffle-write stage one task and cap scaling — real tables are
    many-file)."""
    return os.path.join(DATA_DIR, f"sf{sf}", "pages.parquet")


N_SHARDS = 64


def ensure_pages(sf: str) -> str:
    """Generate the pages fixture for scale ``sf`` if missing or stale;
    return path (a directory of N_SHARDS parquet files, readable by
    spark.read.parquet and duckdb read_parquet('<path>/*.parquet'))."""
    path = pages_path(sf)
    done_marker = os.path.join(path, "_DONE")
    if os.path.exists(done_marker):
        with open(done_marker) as f:
            if f.read().strip() == FIXTURE_VERSION:
                return path
    # Known SFs use the pinned row counts; any other sf (e.g. a larger
    # driver-generated scale factor like "1.0") derives rows from the
    # same 1M-rows-per-unit-sf rule the pinned entries follow — without
    # this, a bench run pointed at an unseen sf dies in KeyError.
    n = ROWS.get(sf)
    if n is None:
        n = max(1, round(float(sf) * 1_000_000))
    cols = gen_rows(n)
    arrays = {}
    for field in SCHEMA:
        arrays[field.name] = pa.array(cols[field.name], field.type)
    table = pa.table(arrays, schema=SCHEMA)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    total = table.num_rows
    per = (total + N_SHARDS - 1) // N_SHARDS
    for s in range(N_SHARDS):
        shard = table.slice(s * per, per)
        if shard.num_rows == 0:
            break
        pq.write_table(
            shard,
            os.path.join(tmp, f"part-{s:05d}.parquet"),
            compression="zstd",
            row_group_size=2048,
        )
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(FIXTURE_VERSION)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def main(argv: list[str]) -> None:
    sfs = argv or ["0.001", "0.01", "0.1"]
    for sf in sfs:
        p = ensure_pages(sf)
        t = pq.read_table(p, columns=["url"])
        size = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        print(f"sf{sf}: {t.num_rows} rows, {size/1e6:.1f} MB → {p}")


if __name__ == "__main__":
    main(sys.argv[1:])
