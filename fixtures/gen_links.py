"""Deterministic outlink fixture with independently composed expected
links (the gen_pages.py philosophy applied to frontier extraction).

COMPOSITION-FIRST: every link picks its absolute TARGET URL first, then
derives the href form to embed (absolute, protocol-relative,
root-relative, plain relative, ../ dot-segments, query-only, fragment
to strip, entity-encoded ``&amp;``, unquoted/single-quoted attrs,
``<area>``, markup whitespace inside the href) — the generator NEVER
resolves a reference, so the expectation is independent of
engine/links.py's resolver. Excluded forms (javascript:, mailto:, tel:,
data:, fragment-only, empty href, ``<a>`` without href) appear in the
html and not in the expectation. A third of the pages carry a
``<base href>`` (itself chosen absolute and emitted verbatim) that all
relative derivations on that page use as their base.

Anchor text is composed the same way: each link picks its EXPECTED
normalized text first, then derives the embedded content form (plain,
messy internal whitespace, nested inline markup, &amp; entity, empty;
``<area>`` carries it in ``alt`` or omits it) — collapse-to-one-space +
strip is the documented rule and the generator knows the expectation
without running any normalizer on markup.

Rows: (url, warc_ts, html binary, exp (link,text) pairs in document
order). Expected parquet twin: exploded (url, pos, link_url,
anchor_text) for the DuckDB contract oracle.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "links")
LINKS_VERSION = "5"
N_PAGES = 90
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs

_HOSTS = ["alpha.example", "beta.example", "gamma.example", "delta.example"]
_WORDS = "crawl frontier spark shard corpus parse robot page".split()
# per-page-host TARGET SETS for cross-host links: PageRank runs on the
# DISTINCT host edge list, so frequency skew flattens out — in-degree
# STRUCTURE is what ranks hosts. hub gets in-edges from all four page
# hosts, mids from two, tails from one, and delta receives nothing.
_TARGET_SETS = {
    "alpha.example": ["hub.example", "mid1.example", "tail1.example"],
    "beta.example": ["hub.example", "mid1.example", "mid2.example",
                     "tail2.example"],
    "gamma.example": ["hub.example", "mid2.example", "tail3.example",
                      "alpha.example"],
    "delta.example": ["hub.example", "beta.example"],
}


def _pick_target(rng: random.Random, page_host: str) -> str:
    return rng.choice(_TARGET_SETS[page_host])


def _attr(rng: random.Random, href: str) -> str:
    """Vary the attribute syntax; the VALUE string is emitted verbatim."""
    q = rng.randrange(3)
    if q == 0:
        return f'href="{href}"'
    if q == 1:
        return f"href='{href}'"
    # unquoted only when safe for the tokenizer's unquoted-value rules
    if any(c in href for c in " \"'<>`"):
        return f'href="{href}"'
    return f"href={href}"


def _anchor_content(rng: random.Random) -> tuple[str, str]:
    """Compose (inner-html form, expected normalized text) — expectation
    chosen first; the embedded form is derived, never normalized."""
    w1, w2 = rng.choice(_WORDS), rng.choice(_WORDS)
    kind = rng.randrange(5)
    if kind == 0:  # plain single word
        return w1, w1
    if kind == 1:  # messy internal + edge whitespace collapses
        return f" {w1}\n\t {w2}  ", f"{w1} {w2}"
    if kind == 2:  # nested inline markup contributes its text
        return f"<b>{w1}</b> <em>{w2}</em>", f"{w1} {w2}"
    if kind == 3:  # entity decodes into the text
        return f"{w1} &amp; {w2}", f"{w1} & {w2}"
    return "", ""  # empty anchor


def _page(
    rng: random.Random, page_url: str
) -> tuple[str, list[tuple[str, str]]]:
    """Compose one page's html + expected (absolute link, anchor text)
    pairs (in order)."""
    host = page_url.split("/")[2]
    # effective base: the page url, or an explicit <base href> (absolute,
    # emitted verbatim — no resolution needed to know it)
    base_dir = f"https://{host}/docs/sub/"
    use_base = rng.random() < 0.33
    eff_dir = base_dir if use_base else page_url.rsplit("/", 1)[0] + "/"
    eff_host = host
    parts: list[str] = ["<html><head><title>t</title>"]
    if use_base:
        parts.append(f'<base href="{base_dir}">')
        if rng.random() < 0.5:  # later <base> must be ignored (first wins)
            parts.append('<base href="https://ignored.example/zzz/">')
    parts.append("</head><body><main>")
    expected: list[tuple[str, str]] = []

    def emit(tag: str, href: str, target: str | None):
        if tag == "area":
            # <area> has no content: anchor text rides in alt (or absent)
            if rng.random() < 0.6:
                t1, t2 = rng.choice(_WORDS), rng.choice(_WORDS)
                alt_form, alt_exp = f' alt="{t1}  {t2}"', f"{t1} {t2}"
            else:
                alt_form, alt_exp = "", ""
            parts.append(f"<map><area {_attr(rng, href)}{alt_form}></map>")
            text = alt_exp
        else:
            content, text = _anchor_content(rng)
            parts.append(f"<a {_attr(rng, href)}>{content}</a>")
        if target is not None:
            expected.append((target, text))

    n = rng.randint(4, 9)
    for _ in range(n):
        kind = rng.randrange(10)
        seg = f"{rng.choice(_WORDS)}{rng.randrange(100)}"
        if kind == 0:  # absolute, possibly with query + fragment to strip
            t = f"https://{_pick_target(rng, host)}/p/{seg}"
            if rng.random() < 0.5:
                t += f"?k={rng.randrange(9)}"
            frag = "#sec" if rng.random() < 0.5 else ""
            emit("a", t + frag, t)
        elif kind == 1:  # protocol-relative: scheme comes from the base
            h2 = _pick_target(rng, host)
            t = f"https://{h2}/pr/{seg}"
            emit("a", f"//{h2}/pr/{seg}", t)
        elif kind == 2:  # root-relative: host comes from the base
            t = f"https://{eff_host}/root/{seg}"
            emit("a", f"/root/{seg}", t)
        elif kind == 3:  # plain relative: dir comes from the base
            t = f"{eff_dir}{seg}.html"
            emit("a", f"{seg}.html", t)
        elif kind == 4:  # one ../ level up from the base dir
            up = eff_dir.rstrip("/").rsplit("/", 1)[0] + "/"
            t = f"{up}{seg}"
            emit("a", f"../{seg}", t)
        elif kind == 5:  # query-only: replaces the base's query
            base_no_q = (base_dir if use_base else page_url).split("?", 1)[0]
            t = f"{base_no_q}?q={seg}"
            emit("a", f"?q={seg}", t)
        elif kind == 6:  # entity-encoded & in a query pair
            t = f"https://{_pick_target(rng, host)}/e/{seg}?a=1&b=2"
            emit("a", f"https://{t.split('/', 3)[2]}/e/{seg}?a=1&amp;b=2", t)
        elif kind == 7:  # <area> contributes like <a>
            t = f"https://{eff_host}/map/{seg}"
            emit("area", f"/map/{seg}", t)
        elif kind == 8:  # markup whitespace INSIDE the href (removed)
            t = f"https://{_pick_target(rng, host)}/ws/{seg}"
            mangled = t[:12] + "\n\t" + t[12:]
            emit("a", f"  {mangled} ", t)
        else:  # excluded forms: present in html, absent from expectation
            bad = rng.choice(
                [
                    "javascript:void(0)",
                    "mailto:x@example.com",
                    "tel:+15551234",
                    "data:text/plain,hi",
                    "#local-frag",
                    "",
                ]
            )
            emit("a", bad, None)
            if rng.random() < 0.5:
                parts.append(f"<a name=anch>{rng.choice(_WORDS)}</a>")
    parts.append("</main></body></html>")
    return "".join(parts), expected


def gen_rows(n: int = N_PAGES, seed: int = 0x11D5):
    rng = random.Random(seed)
    urls, tss, htmls, exp = [], [], [], []
    for i in range(n):
        host = _HOSTS[i % len(_HOSTS)]
        page_url = f"https://{host}/docs/page{i}.html"
        html, links = _page(rng, page_url)
        urls.append(page_url)
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        exp.append(links)
    return urls, tss, htmls, exp


def replica_pagerank(
    edges: list[tuple[str, str]],
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> list[tuple[str, int]]:
    """Pure-python replica of functions/graph.pagerank_hosts' documented
    integer spec (distinct edges, self-loops dropped, rank div out_deg
    contributions, base + (damping·Σ) div 100, dangling/remainder mass
    dropped, fixed rounds). Exact int arithmetic — bit-identical to the
    Spark result under any partitioning; imports no engine code."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    if not nodes:
        return []
    out_deg: dict[str, int] = {}
    for s, _ in e:
        out_deg[s] = out_deg.get(s, 0) + 1
    n = len(nodes)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    rank = {h: init for h in nodes}
    for _ in range(n_iter):
        contrib = {h: 0 for h in nodes}
        for s, d in e:
            contrib[d] += rank[s] // out_deg[s]
        rank = {h: base + (damping_pct * contrib[h]) // 100 for h in nodes}
    return [(h, rank[h]) for h in nodes]


def ensure_links() -> tuple[str, str]:
    """Generate + cache (pages parquet, expected exploded parquet).
    Also writes the host-graph PageRank expectation
    (pagerank_expected.parquet) from the composed links via
    ``replica_pagerank`` — host = netloc of the composed urls (all
    fixture urls are clean https://host/…)."""
    os.makedirs(DATA_DIR, exist_ok=True)
    pages_path = os.path.join(DATA_DIR, "link_pages.parquet")
    expected_path = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == LINKS_VERSION:
                return pages_path, expected_path
    urls, tss, htmls, exp = gen_rows()
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
    eu, ep, el, et = [], [], [], []
    for u, links in zip(urls, exp):
        for p, (l, t) in enumerate(links):
            eu.append(u)
            ep.append(p)
            el.append(l)
            et.append(t)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(eu, pa.string()),
                "pos": pa.array(ep, pa.int32()),
                "link_url": pa.array(el, pa.string()),
                "anchor_text": pa.array(et, pa.string()),
            }
        ),
        expected_path,
    )
    pr = replica_pagerank(
        [
            (u.split("/")[2], l.split("/")[2])
            for u, links in zip(urls, exp)
            for l, _t in links
        ]
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([h for h, _ in pr], pa.string()),
                "rank_fp": pa.array([r for _, r in pr], pa.int64()),
            }
        ),
        os.path.join(DATA_DIR, "pagerank_expected.parquet"),
    )
    with open(marker, "w") as f:
        f.write(LINKS_VERSION)
    return pages_path, expected_path


if __name__ == "__main__":
    p, e = ensure_links()
    print(p, pq.read_table(p).num_rows, "pages")
    print(e, pq.read_table(e).num_rows, "expected links")
