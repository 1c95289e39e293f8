"""Crawl-to-corpus — the full on-ramp → out-ramp path on raw archives.

Run:  python examples/crawl_to_corpus.py
(uses the deterministic WARC fixture archives; no external data)

WARC archives ──ingest──▶ pages (+HTTP envelope)
  ├─ html_pages: mime + 2xx status gate (error pages/stubs out)
  ├─ redirect_edges: the 3xx map (frontier chasing / link repair)
  ├─ robots_from_pages: per-host consent FROM the crawl itself
  ▼
robots_filter ──▶ curate() ──▶ wet_export (WET-style shards)

Every stage is one scan or one Arrow crossing; the composed plan keeps
exactly ONE extraction MapInArrow (plan-asserted in
tests/test_crawl_e2e.py, which pins this recipe).
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from fixtures.gen_warc import ensure_warc
    from htmld_spark.pipeline.curate import curate
    from htmld_spark.pipeline.session import get_spark
    from htmld_spark.sources.robots import robots_filter, robots_from_pages
    from htmld_spark.sources.warc import (
        html_pages,
        redirect_edges,
        warc_pages_df,
        wet_export,
        wet_pages_df,
    )

    spark = get_spark(master="local[4]", app_name="crawl_to_corpus")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    arch_dir, _ = ensure_warc()

    # 1. ingest: binaryFile scan -> ONE mapInArrow -> pages + envelope.
    #    Checkpoint once: the parsed frame feeds several branches below
    #    (the robots plan diamond, the redirect map, extraction).
    raw = warc_pages_df(spark, arch_dir).localCheckpoint(eager=False)
    print("captures ingested :", raw.count())

    # 2. envelope policy: redirect map + the mime/status gate
    print("redirect edges    :")
    redirect_edges(raw).show(truncate=False)
    pages = html_pages(raw)
    print("extractable pages :", pages.count())

    # 3. consent from the crawl itself (RFC 9309, incl. reachability)
    robots = robots_from_pages(raw)
    print("robots hosts      :", [r.host for r in robots.collect()])
    clean = robots_filter(pages, robots, agent="aibot")
    print("consented pages   :", clean.count())

    # 4. curate: charset-normalized extraction (the content_type column
    #    feeds X11's transport step), dedup, quality, splits
    corpus = curate(clean, min_tokens=3, max_per_host=500)
    n = corpus.count()
    print("curated docs      :", n)

    # 5. out-ramp: WET-style conversion-record shards + read-back check
    out = os.path.join(tempfile.gettempdir(), "crawl_to_corpus_wet")
    shutil.rmtree(out, ignore_errors=True)
    manifest = wet_export(
        corpus.select("url", "warc_ts", "text").repartition(2), out
    )
    print("wet shards        :", [
        (os.path.basename(m.warc_file), m.n_records)
        for m in manifest.collect()
    ])
    assert wet_pages_df(spark, out).count() == n  # round trip holds
    print("round trip        : OK")
    spark.stop()


if __name__ == "__main__":
    main()
