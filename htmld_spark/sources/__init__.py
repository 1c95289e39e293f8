"""Source-format readers that land crawls INTO the pages table the
pipeline mandates (url, warc_ts, html[, lang]) — WARC (ISO 28500) being
the Common-Crawl native container."""
