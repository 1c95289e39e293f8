"""URL canonicalization — the url-level dedup key of a crawl pipeline
(the public Heritrix/Common-Crawl canonicalization practice: the same
page is fetched under many url spellings, and url-key dedup is the
cheapest dedup layer, running BEFORE any content is parsed).

``canonical_url`` is a pure Column expression — whole-stage-codegen
JVM built-ins only (try_parse_url + regexp + array HOFs), zero Python
crossings, row-local (predicate-pushable, partitioning-invariant).

The documented rule set (pinned here AND re-implemented independently
by the DuckDB oracle twin):

- scheme and host lowercased; userinfo stripped from the authority;
- default ports dropped (``:80`` for http, ``:443`` for https — other
  ports kept);
- a leading ``www.`` label dropped from the host;
- empty path → ``/``;
- fragment dropped;
- query: split on ``&``; empty tokens and known TRACKING params dropped
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid``,
  ``ref_src`` — matched as whole param names, with or without ``=``);
  survivors byte-sorted and re-joined (param order never identifies a
  resource in practice); an emptied query drops its ``?``;
- anything try_parse_url can't parse into a scheme+host → NULL (the
  crawl-robustness rule: plain parse_url RAISES on unparseable urls in
  Spark 4), so malformed urls cost themselves, never the job.

Out of scope (documented, deliberate): percent-encoding normalization
and IDN/punycode folding — both need per-byte decode tables that would
drag the expression out of codegen; the fixture contract pins the rule
set above, not those.

``dedup_urls_keep`` applies the key: keep the lowest id per canonical
key — ONE map-side-combinable groupBy (min over a 2-field struct), the
exact-dedup shape that survives 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# whole param names whose presence never identifies a resource
_TRACKING_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|ref_src)(=|$)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` (see module docstring for the pinned
    rule set). NULL for anything without a parseable scheme + host."""
    u = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    host = F.lower(F.regexp_replace(auth, r"^[^@/]*@", ""))
    host = (
        F.when(proto == "http", F.regexp_replace(host, ":80$", ""))
        .when(proto == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qtok = F.filter(
        F.split(F.try_parse_url(u, F.lit("QUERY")), "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_RE),
    )
    qpart = F.when(
        F.size(qtok) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(qtok), "&"))
    ).otherwise(F.lit(""))
    return F.when(
        proto.isNotNull() & (host != ""),
        F.concat(proto, F.lit("://"), host, path, qpart),
    )


def dedup_urls_keep(
    df: DataFrame, url_col: str = "url", id_col: str = "id"
) -> DataFrame:
    """URL-key dedup: (canonical_url, keeper id, n_variants) keeping the
    LOWEST id per canonical key. One map-side-combinable groupBy — the
    partial aggregate collapses each partition's duplicates before the
    shuffle, so skewed popular urls cost their partial rows only.
    Unparseable urls (NULL key) are dropped: they can't collide."""
    return (
        df.select(
            canonical_url(url_col).alias("canon_url"), F.col(id_col).alias("id")
        )
        .filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


def surt_key(url: Column | str) -> Column:
    """SURT-form index key of ``url`` (L62; the public Common-Crawl /
    Heritrix Sort-friendly URI Reordering Transform): the CANONICAL url
    (rule set above) with the scheme dropped and the host labels
    reversed comma-joined, then ``)`` + path + query —
    ``https://news.example.com/a?b=1`` → ``com,example,news)/a?b=1``.
    Keys of one registered domain sort adjacently, which is the whole
    point: a range scan over the sorted index covers a site. Pure
    Column expression (codegen, row-local); NULL when the url has no
    parseable scheme + host."""
    c = canonical_url(url)
    host = F.regexp_extract(c, r"^[a-z]+://([^/]+)", 1)
    rest = F.regexp_replace(c, r"^[a-z]+://[^/]+", "")
    return F.when(
        c.isNotNull(),
        F.concat(
            F.array_join(F.reverse(F.split(host, r"\.")), ","),
            F.lit(")"),
            rest,
        ),
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    payload_col: str = "payload",
    n_shards: int | None = None,
) -> DataFrame:
    """CDX-style capture index (L62; the shape of Common Crawl's public
    url index): one row per capture — (urlkey = SURT key, ts, digest =
    md5 hex of the payload bytes, n_bytes), globally ordered by
    (urlkey, ts) the scalable way: ``repartitionByRange`` on the key +
    ``sortWithinPartitions`` — a distributed range-partitioned sort
    (sampled split points), NEVER a single-partition global sort. Each
    output file is a sorted run and the range partitioning makes file
    boundaries ordered too, so a lookup binary-searches one shard — the
    index survives 10^12 captures. Unparseable urls (NULL key) are
    dropped, the same crawl-robustness rule as url dedup. (Real CC uses
    sha1-base32 digests; md5 is the hash both engines share, and the
    digest's job — revisit/dedup detection — only needs collision
    resistance at corpus scale.)"""
    skinny = df.select(
        surt_key(url_col).alias("urlkey"),
        F.col(ts_col).alias("ts"),
        F.md5(F.col(payload_col).cast("binary")).alias("digest"),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
    ).filter(F.col("urlkey").isNotNull())
    # r8: repartitionByRange runs a SEPARATE sampling job over its child
    # to pick split points, so without this checkpoint the md5-the-payload
    # + SURT-regexp projection executes TWICE (sampling pass + shuffle
    # pass) — measured ~35% of cdx wall at the 10× SF. The lazy
    # localCheckpoint materializes skinny once; the sampled range
    # boundaries only decide row placement, never the row set, and the
    # per-shard sortedness contract is unchanged (plan-asserted in
    # tests/test_urls.py).
    skinny = skinny.localCheckpoint(eager=False)
    parts = [n_shards] if n_shards else []
    return skinny.repartitionByRange(*parts, "urlkey", "ts").sortWithinPartitions(
        "urlkey", "ts"
    )
