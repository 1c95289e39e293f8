#!/usr/bin/env python
"""Round-8 attribution benchmarks (guide §1.4 noop-sink isolation).

Supplementary to the FROZEN ``bench.py`` (which the driver runs): these
probes isolate WHERE extract_full's time goes and time the engine
kernels off-Spark, so OPTIMIZATION_r08.md's attribution claims are
reproducible. Usage:

    python bench_extra.py                # extract attribution @ $SPARK_GRAFT_SF_DIR
    python bench_extra.py --engine       # single-process engine kernels

Prints one JSON line per section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def extract_attribution() -> dict:
    """extract_full cost split: map-only vs +url-hash-shuffle vs no-spans
    (all through the noop sink, warmed, best of 2 rebuilt plans)."""
    from pyspark.sql import functions as F

    from bench import _noop, _spark
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.functions.udfs import extract_df

    sf = os.path.basename(SF_DIR.rstrip("/"))[2:] or "0.1"
    pages_path = ensure_pages(sf)
    spark = _spark(f"local[{CPUS}]", input_path=pages_path)
    spark.range(1000).count()
    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    n_parts = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))

    def timed(label, plan_fn):
        spark.sparkContext.setJobDescription(f"bench_extra: {label}")
        _noop(plan_fn(pages.sample(0.05, seed=1)))
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            _noop(plan_fn(pages))
            t = time.monotonic() - t0
            best = t if best is None else min(best, t)
        spark.sparkContext.setJobDescription(None)
        return round(best, 3)

    out = {
        "sf": sf,
        "map_only_spans": timed(
            "map only", lambda df: extract_df(df, with_spans=True)
        ),
        "map_plus_urlhash_shuffle": timed(
            "map+shuffle",
            lambda df: extract_df(df, with_spans=True).repartition(
                n_parts, F.xxhash64("url")
            ),
        ),
        "map_only_no_spans": timed(
            "map only, no spans", lambda df: extract_df(df, with_spans=False)
        ),
    }
    spark.stop()
    return out


def engine_kernels() -> dict:
    """Single-process engine kernel timings over 8 fixture shards, native
    vs pure-Python paths (the §4.2 evidence)."""
    import glob

    import pyarrow.parquet as pq

    from fixtures.gen_pages import ensure_pages
    from htmld_spark.engine import main_text
    from htmld_spark.engine.dom import _parse_document_python, parse_document
    from htmld_spark.engine.encoding import to_utf8
    from htmld_spark.engine.extract import element_span_columns
    from htmld_spark.engine.native import get_native

    d = ensure_pages("0.1")
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))[:8]
    htmls = []
    for f in files:
        htmls.extend(pq.read_table(f, columns=["html"]).column("html").to_pylist())
    utf8s = [to_utf8(h)[0] for h in htmls]

    def best(fn, n=3):
        b = None
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            t = time.monotonic() - t0
            b = t if b is None else min(b, t)
        return round(b, 3)

    def full(parse):
        sc = ([], [], [], [], [], [], [])
        for u in utf8s:
            doc = parse(u)
            main_text(doc).decode("utf-8", "replace")
            element_span_columns(doc, sc)

    out = {
        "docs": len(htmls),
        "native_available": get_native() is not None,
        "parse_python_s": best(lambda: [_parse_document_python(u) for u in utf8s]),
        "parse_s": best(lambda: [parse_document(u) for u in utf8s]),
        "full_pipeline_s": best(lambda: full(parse_document)),
    }
    out["full_docs_per_sec"] = round(out["docs"] / out["full_pipeline_s"], 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", action="store_true")
    args = ap.parse_args()
    if args.engine:
        print(json.dumps({"engine_kernels": engine_kernels()}))
    else:
        print(json.dumps({"extract_attribution": extract_attribution()}))


if __name__ == "__main__":
    main()
