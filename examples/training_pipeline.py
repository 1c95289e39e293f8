"""Training-data pipeline tour — curation, quality scoring, dedup-on-arrival.

Run:  python examples/training_pipeline.py
(uses the deterministic sf0.001 fixture corpus; no external data)

Shows the round-5 surface on top of the quickstart:
1. curate() end-to-end (both near-dedup policies) + curation_report
2. model-driven quality signals: CCNet-style LM perplexity and DSIR
   importance weights against a "trusted" reference slice
3. streaming dedup-on-arrival with the bucketed kept corpus + band-key
   manifest (what a continuous crawl ingest runs per micro-batch)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def demo_curate(spark) -> None:
    """1. Raw pages → curated, split corpus in one declarative plan."""
    from fixtures.gen_pages import ensure_pages
    from htmld_spark.pipeline.curate import curate, curation_report

    pages = spark.read.parquet(ensure_pages("0.001"))
    from htmld_spark.functions.udfs import extract_df

    # stand-in "target domain": the extracted text of a small page slice
    target = extract_df(pages.limit(60), with_spans=False).select("text")
    curated = curate(
        pages,
        near_dedup="winnow",  # or "minhash" for full clustering
        min_tokens=3,         # fixture docs are short — keep gates loose
        mixture={"en": 1.0, "de": 0.5, "fr": 1.0, "es": 1.0, "zh": 1.0},
        dsir_target=target,   # r6: DSIR importance resampling after the
        dsir_take=400,        # LM-gate slot (Xie et al. 2023), hashed
        dsir_n_buckets=256,   # feature space, one-pass composition
    )
    curation_report(curated).show()


def demo_quality_models(spark) -> None:
    """2. LM perplexity (CCNet), DSIR importance + Gumbel top-k
    resampling, and per-host distribution drift."""
    from pyspark.sql import functions as F

    from htmld_spark.functions.text import (
        dsir_log_weights,
        dsir_select,
        host_term_divergence,
        lm_perplexity,
    )
    from fixtures.gen_pages import ensure_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 10 == 0)  # the "trusted" slice
    ppl = lm_perplexity(docs, ref)
    dsir = dsir_log_weights(docs, ref, n_buckets=4096)  # hashed features
    joined = ppl.join(dsir, "doc_id")
    print("most reference-like (low ppl, high importance):")
    joined.orderBy("bigram_ppl").show(5)
    print("least reference-like:")
    joined.orderBy(F.col("bigram_ppl").desc()).show(5)
    print("DSIR Gumbel top-5 resample (deterministic):")
    dsir_select(docs, ref, n_take=5, n_buckets=4096).show()
    print("per-host KL divergence vs the corpus (drift/spam triage):")
    host_term_divergence(spark.read.parquet(ensure_pages("0.001"))).orderBy(
        F.col("kl_divergence").desc()
    ).show(5)


def demo_streaming_ingest(spark) -> None:
    """3. Dedup-on-arrival epochs: exact dups pruned via content-hash
    buckets, near dups via the per-epoch band-key manifest."""
    from pyspark.sql import functions as F

    from htmld_spark.streaming.stream_job import ingest_epoch, manifest_dir_for

    out = tempfile.mkdtemp(prefix="ingest_demo_")
    data = os.path.join(out, "data")
    try:
        b0 = spark.createDataFrame(
            [("u1", "the quick brown fox jumps over the lazy dog while the "
                    "cat watches from the warm windowsill near the garden"),
             ("u2", "completely different content about spark plans")],
            "url string, text string",
        )
        b1 = spark.createDataFrame(
            [("u3", b0.collect()[0].text),                       # exact dup
             ("u4", b0.collect()[0].text.replace("garden", "meadow")),  # near
             ("u5", "an entirely novel document body")],
            "url string, text string",
        )
        ingest_epoch(spark, b0, 0, data, near=True)
        ingest_epoch(spark, b1, 1, data, near=True)
        kept = spark.read.parquet(data)
        print("kept after 2 epochs (u3/u4 dropped):")
        kept.select("url", "epoch_id", "_bucket").orderBy("url").show()
        print("band-key manifest partitions:",
              sorted(os.listdir(manifest_dir_for(data)))[:4], "...")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    from htmld_spark.pipeline.session import get_spark

    spark = get_spark(master="local[4]", app_name="training_pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    demo_curate(spark)
    demo_quality_models(spark)
    demo_streaming_ingest(spark)
    spark.stop()


if __name__ == "__main__":
    main()
