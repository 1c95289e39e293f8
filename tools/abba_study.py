#!/usr/bin/env python
"""ABBA paired-attribution study (the BENCH/BASELINE.md methodology).

Single bench snapshots on this VM swing 2-3x with host load, so a
cross-round delta ("query X went from A s to B s") is attributable only
via INTERLEAVED pairs: the current tree and a pinned historical tree run
the same query back to back within one drift window, order alternating
per pair (ABBA), each sample in a fresh subprocess with a rebuilt plan,
and the PAIRED ratio (current/ref) medians are reported — host drift
hits both sides of a pair equally instead of whichever round ran last.

Usage (driver):
    python tools/abba_study.py --ref 8565cc1 --pairs 8 \
        --queries pack_shards chunk_documents incremental_dedup

The historical tree is a detached git worktree under .abba/<ref>
(dot-dir: pytest's default norecursedirs skips it; .gitignored).
Queries must read only $SPARK_GRAFT_SF_DIR tables (no pages fixture —
the worktree has no fixtures/data). Per sample: fresh subprocess, one
untimed warm run (absorbs JVM/Python-worker spawn — the bench's
best-of-2 policy seen from the side), then ONE timed run on a rebuilt
plan. First pair is cold on both sides and reported separately.

Output: one JSON line per query with both trees' samples, warm medians/
spreads, and the paired-ratio median/IQR; appended to
BENCH/abba_history.jsonl for the appendix write-up.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _worker(query: str) -> None:
    sys.path.insert(0, os.getcwd())
    from htmld_spark.pipeline.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name=f"abba_{query}")
    spark.range(1000).count()
    import __spark_entry__ as entry

    q = entry.queries()[query]
    q(spark, SF_DIR).count()  # warm: workers spawned, code JIT'd
    t0 = time.monotonic()
    q(spark, SF_DIR).count()  # timed: plan REBUILT (no shuffle-file reuse)
    t = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"sec": round(t, 3)}))


def _sample(tree: str, query: str) -> float:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", query],
        capture_output=True, text=True, check=True, cwd=tree,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def _ensure_worktree(ref: str) -> str:
    tree = os.path.join(REPO, ".abba", ref)
    if not os.path.isdir(tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree, ref],
            check=True, cwd=REPO, capture_output=True,
        )
    return tree


def _iqr(xs: list[float]) -> tuple[float, float]:
    qs = statistics.quantiles(xs, n=4)
    return round(qs[0], 3), round(qs[2], 3)


def run_study(ref: str, queries: list[str], pairs: int) -> list[dict]:
    tree = _ensure_worktree(ref)
    reports = []
    for query in queries:
        cur: list[float] = []
        old: list[float] = []
        for i in range(pairs):
            # ABBA block order: pair 0 = current-first, pair 1 = ref-first…
            order = (
                [(REPO, cur), (tree, old)]
                if i % 2 == 0
                else [(tree, old), (REPO, cur)]
            )
            for cwd, sink in order:
                sink.append(_sample(cwd, query))
            print(
                f"  pair {i}: current={cur[-1]} ref={old[-1]} "
                f"ratio={round(cur[-1] / old[-1], 3)}",
                file=sys.stderr,
            )
        ratios = [round(c / o, 3) for c, o in zip(cur, old)]
        # all samples are warm (in-process warm run per subprocess); keep
        # the first pair but report it — cold JVM effects are absorbed by
        # the warm run, unlike the bench's cross-subprocess first sample
        rep = {
            "query": query,
            "ref": ref,
            "pairs": pairs,
            "current_samples": cur,
            "ref_samples": old,
            "current_median": round(statistics.median(cur), 3),
            "ref_median": round(statistics.median(old), 3),
            "current_spread": [min(cur), max(cur)],
            "ref_spread": [min(old), max(old)],
            "ratio_median": round(statistics.median(ratios), 3),
            "ratio_iqr": _iqr(ratios) if len(ratios) >= 4 else None,
            "ratios": ratios,
        }
        reports.append(rep)
        print(json.dumps(rep))
    hist = os.path.join(REPO, "BENCH", "abba_history.jsonl")
    os.makedirs(os.path.dirname(hist), exist_ok=True)
    with open(hist, "a") as f:
        for rep in reports:
            f.write(json.dumps(rep) + "\n")
    return reports


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", metavar="QUERY")
    ap.add_argument("--ref")
    ap.add_argument("--queries", nargs="+")
    ap.add_argument("--pairs", type=int, default=8)
    args = ap.parse_args()
    if args.worker:
        _worker(args.worker)
    else:
        if not (args.ref and args.queries):
            ap.error("--ref and --queries required (or --worker)")
        run_study(args.ref, args.queries, args.pairs)


if __name__ == "__main__":
    main()
