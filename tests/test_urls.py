"""URL canonicalization (functions/urls.py): the pinned rule set, the
never-raise posture on junk urls, and the all-JVM plan shape."""

import pytest

from htmld_spark.functions.urls import (
    canonical_url,
    cdx_index,
    dedup_urls_keep,
    surt_key,
)


def _canon(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url("url").alias("c")).collect()]


CASES = [
    # scheme+host lowercased, default port dropped, www dropped
    ("HTTP://WWW.Ex.COM:80/Path", "http://ex.com/Path"),
    ("HTTPS://a.example:443/x", "https://a.example/x"),
    # non-default port kept; path case preserved
    ("http://a.example:8080/P", "http://a.example:8080/P"),
    # userinfo stripped
    ("https://u:pw@h.example/x", "https://h.example/x"),
    # empty path -> /
    ("https://h.example", "https://h.example/"),
    ("https://h.example?a=1", "https://h.example/?a=1"),
    # fragment dropped
    ("https://h.example/p#frag", "https://h.example/p"),
    # query sorted, tracking params dropped, emptied query drops '?'
    ("https://h.example/p?b=2&a=1", "https://h.example/p?a=1&b=2"),
    ("https://h.example/p?utm_source=x&utm_medium=y", "https://h.example/p"),
    ("https://h.example/p?fbclid=z&a=1", "https://h.example/p?a=1"),
    ("https://h.example/p?gclid", "https://h.example/p"),
    # tracking match is whole-param: 'utm=1' and 'ref_srcx=1' survive
    ("https://h.example/p?utm=1", "https://h.example/p?utm=1"),
    ("https://h.example/p?ref_srcx=1", "https://h.example/p?ref_srcx=1"),
    # empty tokens dropped
    ("https://h.example/p?&&a=1&", "https://h.example/p?a=1"),
    # unparseable -> NULL, never a raise
    ("not a url", None),
    ("", None),
    ("/relative/only", None),
    ("mailto:x@y.example", None),
]


def test_rule_set(spark):
    got = _canon(spark, [u for u, _ in CASES])
    assert got == [e for _, e in CASES]


def test_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the key is a fixed point."""
    firsts = [c for c in _canon(spark, [u for u, _ in CASES]) if c is not None]
    assert _canon(spark, firsts) == firsts


def test_all_jvm_plan(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p?b=2&a=1&utm_source=x")).alias("url"),
        F.col("id"),
    )
    out = dedup_urls_keep(df, url_col="url", id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
    rows = {r.canon_url: (r.keep_id, r.n_variants) for r in out.collect()}
    assert len(rows) == 7
    for k, (keep, n) in rows.items():
        assert k.endswith("?a=1&b=2") and n >= 14
    # keeper is the global min id of the group
    assert rows["https://h0.example/p?a=1&b=2"][0] == 0


def test_dedup_drops_null_keys(spark):
    df = spark.createDataFrame(
        [("junk", 1), ("https://h.example/p", 2), ("https://h.example/p#f", 3)],
        "url string, id long",
    )
    rows = dedup_urls_keep(df).collect()
    assert len(rows) == 1
    assert rows[0].keep_id == 2 and rows[0].n_variants == 2


def test_surt_key(spark):
    from pyspark.sql import functions as F

    def surt(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [r.s for r in df.select(surt_key("url").alias("s")).collect()]

    assert surt(
        [
            "https://news.example.com/a?b=1",
            "HTTP://WWW.Ex.COM:80/Path",  # SURT of the CANONICAL form
            "https://h.example",
            "not a url",
        ]
    ) == [
        "com,example,news)/a?b=1",
        "com,ex)/Path",
        "example,h)/",
        None,
    ]
    # keys of one registered domain sort adjacently
    ks = sorted(
        surt(
            [
                "https://a.example.com/x",
                "https://other.org/y",
                "https://b.example.com/z",
            ]
        )
    )
    assert ks[0].startswith("com,example,a") and ks[1].startswith(
        "com,example,b"
    )


def test_cdx_index_shape_and_values(spark):
    """Range-partitioned within-partition sort (never a single-partition
    global sort); digest/length computed JVM-side; NULL keys dropped."""
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 5).cast("string"),
            F.lit(".example/p"), (F.col("id") % 11).cast("string"),
        ).alias("url"),
        (F.lit(1767225600) + F.col("id")).alias("ts"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias(
            "payload"
        ),
    ).union(
        spark.createDataFrame(
            [("junk url", 1, "x")], "url string, ts long, payload string"
        )
    )
    out = cdx_index(df, n_shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
    rows = out.collect()
    assert len(rows) == 200  # junk url dropped
    assert all(r.urlkey.startswith("example,h") for r in rows)
    assert all(len(r.digest) == 32 for r in rows)
    # each output partition is sorted by (urlkey, ts)
    parts = out.withColumn(
        "pid", F.spark_partition_id()
    ).collect()
    by_pid: dict[int, list] = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append((r.urlkey, r.ts))
    for pid, ks in by_pid.items():
        assert ks == sorted(ks)
    # range partitioning: shard key-ranges do not interleave
    bounds = sorted(
        (min(ks), max(ks)) for ks in by_pid.values() if ks
    )
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2


@pytest.fixture(scope="module")
def spark():
    from htmld_spark.pipeline.session import get_spark

    s = get_spark(master="local[4]", app_name="pytest_urls")
    yield s
    s.stop()
