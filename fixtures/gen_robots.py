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
ROBOTS_VERSION = "1"


def _compose() -> tuple[list[tuple[str, bytes | None]], list[tuple[str, bool]]]:
    """Returns (robots rows: (host, robots bytes or None),
    expected: (url, allowed under agent 'aibot'))."""
    robots: list[tuple[str, bytes | None]] = []
    expected: list[tuple[str, bool]] = []

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
            "Crawl-delay: 5\n"  # unknown-to-us directive: skipped
        ).encode()))
        expected += [
            (url(h, f"/private/doc{i}"), False),
            (url(h, f"/private/ok/doc{i}"), True),
            (url(h, f"/public/doc{i}"), True),
            (url(h, "/"), True),
        ]
    # B: wildcard + anchor rules (under *)
    for i in range(3):
        h = f"b{i}.example"
        robots.append((h, (
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /tmp/*\n"
            "Allow: /tmp/keep$\n"
        ).encode()))
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
            "\n"
            "User-agent: *\n"
            "Allow: /\n"
        ).encode()))
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
    return robots, expected


def ensure_robots() -> tuple[str, str]:
    """Generate + cache (robots parquet, expected parquet) paths."""
    os.makedirs(DATA_DIR, exist_ok=True)
    robots_path = os.path.join(DATA_DIR, "robots.parquet")
    expected_path = os.path.join(DATA_DIR, "expected.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == ROBOTS_VERSION:
                return robots_path, expected_path
    robots, expected = _compose()
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
    with open(marker, "w") as f:
        f.write(ROBOTS_VERSION)
    return robots_path, expected_path


if __name__ == "__main__":
    r, e = ensure_robots()
    print(r, pq.read_table(r).num_rows, "hosts;", e, pq.read_table(e).num_rows, "urls")
