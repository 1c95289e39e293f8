"""Quickstart — the three ways to use htmld-spark.

Run:  python examples/quickstart.py
(uses the deterministic sf0.001 fixture corpus; no external data)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def demo_engine_api() -> None:
    """1. Single-document, reference-shaped API (no Spark): port code
    written against the upstream library line-for-line."""
    from htmld_spark.engine.api import create_document

    doc = create_document(
        b'<div id="post"><h1>Title</h1><p class="lead">Hello <b>world</b>.'
        b"<p>Second paragraph</div>"
    )
    lead = doc.query_selector("#post p.lead")
    print("innerText :", lead.text)
    print("outerHTML :", lead.outer_html)
    print("all p     :", [n.text for n in doc.query_selector_all("p")])


def demo_distributed_extraction(spark) -> None:
    """2. Corpus-scale extraction: the same engine inside one mapInArrow
    crossing, DataFrame/Catalyst everywhere else."""
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.functions.udfs import extract_df

    pages = spark.read.parquet(ensure_pages("0.001"))
    extracted = extract_df(pages.select("url", "warc_ts", "html", "lang"))
    extracted.select("url", "text", "n_spans").show(3, truncate=50)


def demo_curation(spark) -> None:
    """3. Training-data curation: extract → enrich → dedup (exact + near)
    → quality gate → host quota → deterministic split, one declarative
    plan."""
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.pipeline.curate import curate, curation_report

    pages = spark.read.parquet(ensure_pages("0.001"))
    curated = curate(pages, min_tokens=3, max_per_host=500)
    curation_report(curated).show(20)


def demo_quality_filters(spark) -> None:
    """4. Web-text quality filtering: Gopher rule gate + n-gram repetition
    signals — row-local JVM expressions, zero shuffle."""
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.functions.text import gopher_rules, ngram_repetition
    from htmld_spark.functions.udfs import extract_df

    pages = spark.read.parquet(ensure_pages("0.001"))
    text = extract_df(pages.select("url", "warc_ts", "html", "lang"))
    gopher_rules(text, id_col="url", text_col="text").show(3, truncate=30)
    ngram_repetition(text, id_col="url", text_col="text").show(3, truncate=30)


def demo_dedup_and_mixing(spark) -> None:
    """5. Corpus-level dedup + mixing (round-4 operators): exact-substring
    dedup (Lee et al. 2021 ExactSubstr), a model-based quality score, and
    deterministic per-language mixture sampling."""
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.functions.text import (
        quality_score,
        remove_duplicate_ngrams,
        stratified_sample,
    )
    from htmld_spark.functions.udfs import extract_df

    pages = spark.read.parquet(ensure_pages("0.001"))
    text = extract_df(pages.select("url", "warc_ts", "html", "lang"))
    remove_duplicate_ngrams(text, id_col="url", text_col="text", n=8).orderBy(
        "n_removed", ascending=False
    ).show(3, truncate=40)
    quality_score(text, id_col="url", text_col="text").show(3, truncate=40)
    mixed = stratified_sample(
        text, rates={"en": 1.0, "de": 0.5}, stratum_col="lang", key_col="url"
    )
    print("mixture kept", mixed.count(), "of", text.count(), "docs")


def demo_pdf_extraction(spark) -> None:
    """PDF leg (engine/pdf.py): the same pipeline over a PDF crawl —
    extract via one MapInArrow, or run the whole curation with
    curate(source='pdf')."""
    from fixtures.gen_pdfs import ensure_pdfs
    from htmld_spark.functions.udfs import extract_pdf_df

    pdfs = spark.read.parquet(ensure_pdfs()).select("pdf_id", "pdf")
    out = extract_pdf_df(pdfs)
    out.select("pdf_id", "n_pages", "parse_ok", "text").show(3, truncate=40)


def main() -> None:
    demo_engine_api()
    from htmld_spark.pipeline.session import get_spark

    spark = get_spark(master="local[4]", app_name="quickstart")
    try:
        demo_distributed_extraction(spark)
        demo_pdf_extraction(spark)
        demo_curation(spark)
        demo_quality_filters(spark)
        demo_dedup_and_mixing(spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
