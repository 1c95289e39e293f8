"""spark-submit entrypoint for the extraction pipeline (BASELINE.json:
"run via spark-submit --py-files on a multi-executor cluster").

Cluster (note ``spark.task.cpus=2``: every extraction task pairs a JVM
feeder thread with a Python worker — slots must be sized at cores/2 or the
two populations oversubscribe the executor; measured 4.1× at 32 cores):
    python tools/package_pyfiles.py                      # → dist/htmld_spark.zip
    spark-submit --py-files dist/htmld_spark.zip --conf spark.task.cpus=2 \\
        htmld_spark/pipeline/main.py \\
        --source iceberg:warehouse.pages --output iceberg:warehouse.extracted \\
        --n-buckets 50000 --buckets-per-round 512

Sandbox smoke:
    spark-submit --master 'local[8]' --py-files dist/htmld_spark.zip \\
        htmld_spark/pipeline/main.py \\
        --source fixtures/data/sf0.001/pages.parquet --output /tmp/out

Re-running the same command resumes from the bucket manifest (R15).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="htmld_spark extraction pipeline")
    p.add_argument("--source", required=True, help="pages parquet path or iceberg:ref")
    p.add_argument("--output", required=True, help="output root (parquet dir or iceberg:ref)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--buckets-per-round", type=int, default=32)
    p.add_argument("--no-spans", action="store_true")
    p.add_argument("--source-format", choices=("html", "pdf"), default="html",
                   help="extraction leg: html (engine/dom) or pdf (engine/pdf)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--dedup-latest", action="store_true",
                   help="keep only the latest warc_ts crawl per url")
    p.add_argument("--lang", action="append", default=None,
                   help="filter to language(s); repeatable")
    p.add_argument("--salt-threshold", type=int, default=256 << 10)
    p.add_argument("--salt-factor", type=int, default=8)
    p.add_argument("--byte-budget", type=int, default=32 << 20)
    p.add_argument("--show-metrics", action="store_true")
    p.add_argument("--enrich", action="store_true",
                   help="append pred_lang/n_tokens/quality_bucket/winnow_fp "
                        "to the written output (one-pass, no extra shuffle)")
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    # import AFTER spark-submit has set up the executor py-files path
    from pyspark.sql import SparkSession

    from htmld_spark.pipeline.job import JobConfig, job_metrics, run_extract_job

    spark = SparkSession.builder.appName("htmld_spark_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = JobConfig(
        source=args.source,
        output=args.output,
        n_buckets=args.n_buckets,
        buckets_per_round=args.buckets_per_round,
        with_spans=not args.no_spans,
        byte_budget=args.byte_budget,
        salt_factor=args.salt_factor,
        salt_threshold=args.salt_threshold,
        dedup_latest=args.dedup_latest,
        lang_filter=args.lang,
        enrich=args.enrich,
        source_format=args.source_format,
    )
    stats = run_extract_job(spark, cfg, resume=not args.no_resume)
    print(json.dumps({"job": "extract", **stats}))
    if args.show_metrics:
        job_metrics(spark, cfg).show(50, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
