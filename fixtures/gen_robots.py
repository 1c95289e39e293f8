"""Deterministic robots.txt fixture with independently composed expected
verdicts (the gen_pages.py philosophy applied to RFC 9309 filtering).

Each host draws a rule TEMPLATE whose url outcomes are known BY
CONSTRUCTION — the urls are generated to sit inside/outside each rule's
intent (a /private/ disallow gets a /private/… url expecting deny and a
/public/… url expecting allow), never by running a matcher. The robots
bytes are then written from the same template through an independent
serializer (comment noise, case variation, blank lines, unknown
directives the parser must skip).

The contract agent is ``aibot`` — one host template disallows
EVERYTHING for the aibot token only (the retroactive AI-opt-out shape),
so agent-group selection (specific token beats ``*``) is exercised, and
one host has NO robots row (the RFC's absent-file default: allowed).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "robots")
ROBOTS_VERSION = "2"


def _compose() -> tuple[
    list[tuple[str, bytes | None]],
    list[tuple[str, bool]],
    list[tuple[str, float | None, list[str]]],
]:
    """Returns (robots rows: (host, robots bytes or None),
    expected: (url, allowed under agent 'aibot'),
    directives expected: (host, crawl_delay under 'aibot', sitemaps) —
    composed BY CONSTRUCTION alongside the robots bytes, never by
    running the parser)."""
    robots: list[tuple[str, bytes | None]] = []
    expected: list[tuple[str, bool]] = []
    directives: list[tuple[str, float | None, list[str]]] = []

    def url(host, path):
        return f"https://{host}{path}"

    # A: classic private-tree disallow with an allow carve-out (under *)
    for i in range(3):
        h = f"a{i}.example"
        robots.append((h, (
            "# synthetic\n"
            "User-Agent: *\n"
            "Disallow: /private/\n"
            "Allow: /private/ok/\n"
            "Crawl-delay: 5\n"  # ignored by the RFC matcher; directives pass reads it
        ).encode()))
        expected += [
            (url(h, f"/private/doc{i}"), False),
            (url(h, f"/private/ok/doc{i}"), True),
            (url(h, f"/public/doc{i}"), True),
            (url(h, "/"), True),
        ]
        # aibot has no own group → falls back to '*': delay 5
        directives.append((h, 5.0, []))
    # B: wildcard + anchor rules (under *)
    for i in range(3):
        h = f"b{i}.example"
        robots.append((h, (
            f"Sitemap: https://{h}/sitemap.xml\n"
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /tmp/*\n"
            "Allow: /tmp/keep$\n"
        ).encode()))
        # no crawl-delay anywhere; one file-wide sitemap (leading line)
        directives.append((h, None, [f"https://{h}/sitemap.xml"]))
        expected += [
            (url(h, f"/doc{i}.pdf"), False),
            (url(h, f"/doc{i}.pdfx"), True),   # $ anchor: suffix only
            (url(h, f"/tmp/scratch{i}"), False),
            (url(h, "/tmp/keep"), True),       # longest match wins
            (url(h, f"/pages/doc{i}.html"), True),
        ]
    # C: aibot-only total opt-out (the retroactive AI-consent shape);
    # other agents would be allowed — the contract agent is aibot
    for i in range(3):
        h = f"c{i}.example"
        robots.append((h, (
            "User-agent: aibot\n"
            "Disallow: /\n"
            "Crawl-delay: 2.5\n"
            "\n"
            "User-agent: *\n"
            "Allow: /\n"
            "Crawl-delay: 10\n"
            f"SITEMAP: https://{h}/s1.xml\n"
            f"sitemap: https://{h}/s2.xml\n"
        ).encode()))
        # aibot's own group wins: 2.5 (never *'s 10); sitemaps are
        # file-wide and case-insensitive, document order
        directives.append(
            (h, 2.5, [f"https://{h}/s1.xml", f"https://{h}/s2.xml"])
        )
        expected += [
            (url(h, f"/article/{i}"), False),
            (url(h, "/"), False),
        ]
    # D: no robots row at all → everything allowed
    for i in range(3):
        h = f"d{i}.example"
        expected += [
            (url(h, f"/anything/{i}"), True),
            (url(h, "/"), True),
        ]
    # E: directive corner cases (no page urls — robots_filter never sees
    # these hosts): aibot group with an INVALID then a NEGATIVE delay →
    # None (no fallback to *'s valid 7: the site addressed aibot
    # explicitly); second e-host: two aibot groups merge to the MINIMUM
    robots.append(("e0.example", (
        "User-agent: aibot\n"
        "Crawl-delay: fast\n"
        "Crawl-delay: -3\n"
        "User-agent: *\n"
        "Crawl-delay: 7\n"
    ).encode()))
    directives.append(("e0.example", None, []))
    robots.append(("e1.example", (
        "User-agent: aibot\n"
        "Crawl-delay: 8\n"
        "Disallow: /x\n"
        "\n"
        "User-agent: aibot\n"
        "Crawl-delay: 3\n"
    ).encode()))
    directives.append(("e1.example", 3.0, []))
    return robots, expected, directives


def ensure_robots() -> tuple[str, str]:
    """Generate + cache (robots parquet, expected parquet) paths. Also
    writes directives_expected.parquet (host, crawl_delay, sitemaps
    space-joined) beside them."""
    os.makedirs(DATA_DIR, exist_ok=True)
    robots_path = os.path.join(DATA_DIR, "robots.parquet")
    expected_path = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == ROBOTS_VERSION:
                return robots_path, expected_path
    robots, expected, directives = _compose()
    pq.write_table(
        pa.table(
            {
                "host": pa.array([h for h, _ in robots], pa.string()),
                "robots": pa.array([b for _, b in robots], pa.binary()),
            }
        ),
        robots_path,
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in expected], pa.string()),
                "allowed": pa.array([a for _, a in expected], pa.bool_()),
            }
        ),
        expected_path,
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([h for h, _, _ in directives], pa.string()),
                "crawl_delay": pa.array(
                    [d for _, d, _ in directives], pa.float64()
                ),
                "sitemaps": pa.array(
                    [" ".join(s) for _, _, s in directives], pa.string()
                ),
            }
        ),
        os.path.join(DATA_DIR, "directives_expected.parquet"),
    )
    with open(marker, "w") as f:
        f.write(ROBOTS_VERSION)
    return robots_path, expected_path


if __name__ == "__main__":
    r, e = ensure_robots()
    print(r, pq.read_table(r).num_rows, "hosts;", e, pq.read_table(e).num_rows, "urls")
