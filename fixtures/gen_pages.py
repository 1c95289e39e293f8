"""Deterministic synthetic `pages` fixture generator — build-plan M0
(FIXTURES.md §1; schema mandated by BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

The golden ``text`` column is composed INDEPENDENTLY of the engine, from the
same template parameters that compose the html (plain string building per the
pinned main-content rules, SURVEY.md §2.A.5 X6 / engine/extract.py mcx-1) —
so fixture tests are not self-confirming.

Properties (seed=42, pure, no wall clock):
- every template family (FIXTURES.md §1) appears at every scale;
- host distribution is skewed: ≥30% of rows on one hot host (exercises R4
  salting);
- ~1% duplicated urls with a later warc_ts (exercises R10 dedup-by-latest);
- ~0.2% oversized rows (≈1 MiB html) whose bulk is stripped boilerplate
  (huge <script>/<nav> filler) so the golden text stays small;
- warc_ts = 2026-01-01T00:00:00Z + doc_id seconds (no now()).

Usage:  python fixtures/gen_pages.py [sf ...]   (default: 0.001 0.01 0.1)
        or  ensure_pages(sf) from code — generates once, caches on disk.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
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


def _w(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


# --- template families: each returns (html_core, expected_text) -------------------
# html_core goes between BOILER_HEAD and BOILER_TAIL; expected_text is the
# golden mcx-1 main-content output for the FULL page.


def fam_clean_article(rng):
    title = _w(rng, 3)
    paras = [_w(rng, rng.randint(5, 14)) + "." for _ in range(rng.randint(2, 5))]
    html = "<main><article><h1>" + title + "</h1>"
    for p in paras:
        html += "<p>" + p + "</p>"
    html += "</article></main>"
    return html, "\n".join([title] + paras)


def fam_entities(rng):
    pairs = rng.sample(ENTITY_PAIRS, k=4)
    w1, w2 = _w(rng, 2), _w(rng, 2)
    segs_html = [f"{w1} {raw} {w2}" for raw, _ in pairs]
    segs_txt = [f"{w1} {dec} {w2}" for _, dec in pairs]
    # one nbsp case: collapses to a single space
    segs_html.append(f"{w1}&nbsp;{w2}")
    segs_txt.append(f"{w1} {w2}")
    html = "<main>" + "".join(f"<p>{s}</p>" for s in segs_html) + "</main>"
    return html, "\n".join(segs_txt)


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
    expected = "\n".join(items + [p1, p2] + cells + opts)
    return html, expected


def fam_misnesting(rng):
    w1, w2, w3, w4 = (_w(rng, 2) for _ in range(4))
    # <span> left open, closed by </div>; <b><i>x</b>y</i> misnest; stray </em>
    html = (
        f"<main><div><span>{w1}</div>"
        f"<p><b><i>{w2}</b> {w3}</em></p>"
        f"<div>{w4}"
        "</main>"
    )
    # div blocks: w1 | p block: w2 w3 | w4
    return html, "\n".join([w1, f"{w2} {w3}", w4])


def fam_raw_text(rng):
    w1, w2 = _w(rng, 3), _w(rng, 2)
    html = (
        f'<main><p>{w1}</p><script>if(a<b){{s="</p>x"}}</script>'
        f"<style>a>b{{top:0}}</style><p>{w2}</p></main>"
    )
    return html, "\n".join([w1, w2])


def fam_attributes(rng):
    w1, w2, w3 = _w(rng, 2), _w(rng, 2), _w(rng, 2)
    cls = rng.choice(WORDS)
    html = (
        f"<main><p class=\"{cls} x\" data-k='v1' bare>{w1}</p>"
        f'<p title="a&amp;b" dup=1 dup=2>{w2}</p>'
        f"<a href=/deep/path/>{w3}</a></main>"
    )
    return html, "\n".join([w1, w2, w3])


def fam_comments(rng):
    w1, w2 = _w(rng, 3), _w(rng, 1)
    html = (
        f"<main><!-- c1 -- inner --><p>{w1}</p>"
        f"<![CDATA[{w2}]]><?pi data?><!-- trailing --></main>"
    )
    # CDATA is character data → its own trailing block
    return html, "\n".join([w1, w2])


def fam_selector_playground(rng):
    w = [_w(rng, 2) for _ in range(4)]
    html = (
        f'<main><div id="pg" class="wrap">'
        f'<p class="first">{w[0]}</p><p>{w[1]}</p>'
        f'<span data-x="alpha beta">{w[2]}</span> '
        f'<a href="https://ex.com/a" hreflang="en-US">{w[3]}</a>'
        f"</div></main>"
    )
    # p,p are blocks; span+a inline → merge into the div's trailing block
    return html, "\n".join([w[0], w[1], f"{w[2]} {w[3]}"])


def fam_void(rng):
    w1, w2, w3 = _w(rng, 2), _w(rng, 2), _w(rng, 2)
    html = (
        f"<main><p>{w1}<br>{w2}</p><hr>"
        f'<p>{w3}<img src="i.png"><input type=text disabled><wbr></p></main>'
    )
    return html, "\n".join([w1, w2, w3])


def fam_encoding(rng):
    mb = rng.sample(MB_WORDS, k=3)
    w = _w(rng, 2)
    html = (
        f'<main><p lang="mixed">{mb[0]} {w} {mb[1]}</p>'
        f"<p>{mb[2]} &#x2603; snow</p></main>"
    )
    return html, "\n".join([f"{mb[0]} {w} {mb[1]}", f"{mb[2]} ☃ snow"])


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


def gen_rows(n: int, seed: int = SEED):
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id in range(n):
        fam_name, fam = FAMILIES[doc_id % len(FAMILIES)]
        core, expected = fam(rng)
        title = _w(rng, 2)
        html = BOILER_HEAD.format(title=title) + core + BOILER_TAIL
        if doc_id % 500 == 137:  # ~0.2% oversized rows (~1 MiB, stripped filler)
            html += _OVERSIZE_FILLER * 6500
        host = HOT_HOST if rng.random() < 0.35 else rng.choice(HOSTS)
        url = f"https://{host}/{fam_name}/{doc_id}"
        urls.append(url)
        tss.append(EPOCH_US + doc_id * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(expected)
        langs.append(LANGS[doc_id % len(LANGS)])
        if doc_id % 100 == 73:  # ~1% duplicated url with later warc_ts
            core2, expected2 = fam(rng)
            urls.append(url)
            tss.append(EPOCH_US + (doc_id + 10_000_000) * 1_000_000)
            htmls.append((BOILER_HEAD.format(title=title) + core2 + BOILER_TAIL).encode())
            texts.append(expected2)
            langs.append(LANGS[doc_id % len(LANGS)])
    return urls, tss, htmls, texts, langs


SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_path(sf: str) -> str:
    """Directory of sharded parquet files (a single file would make the
    scan+shuffle-write stage one task and cap scaling — real tables are
    many-file)."""
    return os.path.join(DATA_DIR, f"sf{sf}", "pages.parquet")


N_SHARDS = 64


def ensure_pages(sf: str) -> str:
    """Generate the pages fixture for scale ``sf`` if missing; return path
    (a directory of N_SHARDS parquet files, readable by spark.read.parquet
    and duckdb read_parquet('<path>/*.parquet'))."""
    path = pages_path(sf)
    done_marker = os.path.join(path, "_DONE")
    if os.path.exists(done_marker):
        return path
    n = ROWS[sf]
    urls, tss, htmls, texts, langs = gen_rows(n)
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=SCHEMA,
    )
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
    open(os.path.join(tmp, "_DONE"), "w").close()
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
