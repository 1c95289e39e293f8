"""Host-graph operators (functions/graph.py): host_link_graph edge
collapse and fixed-point integer PageRank — the crawl-ordering leg.
The headline property is BIT-determinism: integer arithmetic makes the
result invariant to partitioning/aggregation order, which float-sum
PageRank cannot promise."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_links import replica_pagerank
from htmld_spark.functions.graph import (
    frontier_select,
    host_degree_stats,
    host_link_graph,
    pagerank_hosts,
)
from htmld_spark.pipeline.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="pytest_graph")
    yield s
    s.stop()


EDGES = [
    ("a.x", "hub.x"), ("b.x", "hub.x"), ("c.x", "hub.x"),
    ("a.x", "b.x"), ("b.x", "c.x"), ("hub.x", "a.x"),
    ("c.x", "c.x"),          # self-loop: dropped
    ("a.x", "hub.x"),        # duplicate: distinct'd
    ("d.x", "sink.x"),       # sink.x is dangling (no out-edges)
]


def _edges_df(spark, parts):
    return spark.createDataFrame(
        EDGES, "src_host string, dst_host string"
    ).repartition(parts)


def test_pagerank_matches_replica_bit_exact(spark):
    exp = dict(replica_pagerank(EDGES, n_iter=7))
    got = {
        r.host: r.rank_fp
        for r in pagerank_hosts(_edges_df(spark, 3), n_iter=7).collect()
    }
    assert got == exp  # exact int equality, no tolerance


def test_pagerank_partition_invariance(spark):
    a = {
        r.host: r.rank_fp
        for r in pagerank_hosts(_edges_df(spark, 1), n_iter=5).collect()
    }
    b = {
        r.host: r.rank_fp
        for r in pagerank_hosts(_edges_df(spark, 7), n_iter=5).collect()
    }
    assert a == b


def test_pagerank_structure(spark):
    ranks = {
        r.host: r.rank_fp
        for r in pagerank_hosts(_edges_df(spark, 2), n_iter=10).collect()
    }
    # hub has 3 distinct in-hosts — it must outrank everything else
    assert ranks["hub.x"] == max(ranks.values())
    # d.x receives nothing: floor at base mass; sink.x (dangling) still
    # ACCUMULATES rank, it just redistributes none
    assert ranks["d.x"] == min(ranks.values())
    assert ranks["sink.x"] > ranks["d.x"]
    # self-loop dropped: c.x's rank comes only from b.x
    n = len(ranks)
    assert n == 6


def test_pagerank_errors_and_empty(spark):
    df = _edges_df(spark, 1)
    with pytest.raises(ValueError):
        pagerank_hosts(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank_hosts(df, damping_pct=101)
    only_self = spark.createDataFrame(
        [("a.x", "a.x")], "src_host string, dst_host string"
    )
    assert pagerank_hosts(only_self, n_iter=2).count() == 0


def test_host_link_graph_collapse(spark):
    rows = [
        ("https://s1.x/p1", ["https://t1.x/a", "https://t1.x/b",
                             "https://s1.x/self", "not a url"]),
        ("https://s1.x/p2", ["https://t1.x/c", "https://t2.x/a"]),
        ("::bad::", ["https://t1.x/d"]),  # malformed src: dropped
        ("https://s2.x/p", []),
    ]
    df = spark.createDataFrame(rows, "url string, links array<string>")
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(df).collect()
    }
    assert got == {
        ("s1.x", "t1.x"): 3,
        ("s1.x", "s1.x"): 1,  # self-link kept here; PageRank drops it
        ("s1.x", "t2.x"): 1,
    }
    plan = host_link_graph(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


def test_pagerank_no_python_crossing(spark):
    plan = (
        pagerank_hosts(_edges_df(spark, 2), n_iter=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


def _cand(spark, n=60, hosts=6):
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"),
            (F.col("id") % hosts).cast("string"),
            F.lit(".example/p"),
            F.col("id").cast("string"),
        ).alias("url")
    )


def _ranks(spark, hosts=6):
    return spark.range(hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias(
            "host"
        ),
        (F.col("id") * 1000).cast("long").alias("rank_fp"),
    )


def test_frontier_cap_and_order(spark):
    out = frontier_select(
        _cand(spark), _ranks(spark), per_host_cap=3, budget=9
    ).collect()
    assert len(out) == 9
    # the budget fills from the highest-ranked hosts, cap slots each
    hosts = sorted({r.host for r in out})
    assert hosts == ["h3.example", "h4.example", "h5.example"]
    per_host = {}
    for r in out:
        per_host[r.host] = per_host.get(r.host, 0) + 1
        assert 1 <= r.slot <= 3
    assert all(v == 3 for v in per_host.values())
    # slot order within a host follows url byte order
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append((r.slot, r.url))
    for pairs in by_host.values():
        urls = [u for _s, u in sorted(pairs)]
        assert urls == sorted(urls)


def test_frontier_unknown_host_rank_zero_and_dups(spark):
    cand = _cand(spark, n=10, hosts=2).union(
        spark.createDataFrame(
            [("https://new.example/x",), ("https://new.example/x",),
             ("::junk::",)],
            "url string",
        )
    )
    out = {
        r.url: r
        for r in frontier_select(cand, _ranks(spark, 2), per_host_cap=99).collect()
    }
    assert out["https://new.example/x"].rank_fp == 0  # crawlable, lowest prio
    assert "::junk::" not in out  # malformed candidate dropped
    assert len([u for u in out if "new.example" in u]) == 1  # deduped


def test_frontier_shuffles_and_takeordered(spark):
    import re

    out = frontier_select(_cand(spark), _ranks(spark), per_host_cap=2, budget=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r8 skew-safe shape: exchange 1 on (host, salt) serves the distinct
    # AND the salted pre-prune window; exchange 2 on host carries only the
    # pre-pruned (≤ n_salts·cap per host) frame into the politeness
    # window; the budget cut is TakeOrdered, never a global sort
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "pre_slot" in plan  # the salted pre-prune window survived
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan


def test_frontier_salted_preprune_identical_on_skew(spark):
    """A mega-host with heavy url duplication: the salted pre-prune must
    not change the selected batch (global per-host top-cap by url order,
    over DISTINCT urls), for several salt counts."""
    from pyspark.sql import functions as F

    rows = (
        [(f"https://mega.example/p{i:04d}",) for i in range(300)] * 3
        + [(f"https://tiny.example/q{i}",) for i in range(5)]
    )
    cand = spark.createDataFrame(rows, "url string")
    ranks = spark.createDataFrame(
        [("mega.example", 100), ("tiny.example", 50)], "host string, rank_fp long"
    ).select("host", F.col("rank_fp").cast("long"))
    expect = sorted(
        [(f"https://mega.example/p{i:04d}", "mega.example", 100, i + 1)
         for i in range(7)]
        + [(f"https://tiny.example/q{i}", "tiny.example", 50, i + 1)
           for i in range(5)]
    )
    for n_salts in (1, 4, 16):
        got = sorted(
            map(
                tuple,
                frontier_select(
                    cand, ranks, per_host_cap=7, n_salts=n_salts
                ).collect(),
            )
        )
        assert got == expect, n_salts


def test_frontier_deterministic_across_partitionings(spark):
    a = sorted(
        map(tuple, frontier_select(
            _cand(spark).repartition(1), _ranks(spark), 2, 8
        ).collect())
    )
    b = sorted(
        map(tuple, frontier_select(
            _cand(spark).repartition(13), _ranks(spark), 2, 8
        ).collect())
    )
    assert a == b and len(a) == 8


def test_host_degree_stats(spark):
    """Degrees/volumes/self-links against a hand-computed edge list;
    hosts absent from one side get zeros; no Python crossing."""
    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("a", "c", 1), ("a", "a", 5),
            ("b", "a", 2), ("c", "a", 1), ("d", "a", 1),
        ],
        "src_host string, dst_host string, n_links int",
    )
    out = host_degree_stats(edges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInArrow" not in plan
    rows = {r.host: r for r in out.collect()}
    a = rows["a"]
    assert (a.out_deg, a.in_deg, a.out_links, a.in_links, a.self_links) == (
        3, 4, 9, 9, 5
    )
    b = rows["b"]
    assert (b.out_deg, b.in_deg, b.out_links, b.in_links, b.self_links) == (
        1, 1, 2, 3, 0
    )
    d = rows["d"]  # no in-edges: in side zeroed by the outer join
    assert (d.out_deg, d.in_deg, d.out_links, d.in_links, d.self_links) == (
        1, 0, 1, 0, 0
    )
