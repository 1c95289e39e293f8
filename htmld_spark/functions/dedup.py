"""Deduplication operators for training-data pipelines (task mandate:
exact, MinHash+LSH, SimHash, n-gram Jaccard).

Design for 100 TB:
- exact dedup is a hash-groupBy (one shuffle on a 16-byte key, map-side
  partial agg);
- MinHash and SimHash signatures are ROW-LOCAL array folds (r5): k
  array_min(transform) passes over the staged shingle array / a 64-lane
  bit-count aggregate over token hashes — the signature stages have ZERO
  shuffle; only (id, signature) rows ever leave the scan;
- LSH banding turns the O(n²) pair search into b self-joins on band keys —
  each join is an equi-join Catalyst can shuffle-hash, and candidate
  verification joins token sets only for candidate pairs — all JVM-side,
  no Python.

The banding/blocking shape follows the public LSH-blocking literature for
distributed entity resolution (cf. "SparkER: Scaling Entity Resolution in
Spark", EDBT 2019 — PAPERS.md); the implementation here is written from
scratch against the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from htmld_spark.functions.text import TOKEN_SPLIT


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """md5-hash groups: one row per distinct content hash with multiplicity
    and the keeper (min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keeper"))
    )


def exact_dedup_keep(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Ids that survive exact dedup (min id per content hash)."""
    return exact_dedup_groups(df, id_col, text_col).select(
        F.col("keeper").alias(id_col)
    )


def _stage_tokens(df: DataFrame, keep_cols: list, text_col: str) -> DataFrame:
    """Project the token array ONCE into a bound column before any
    higher-order function touches it. HOF lambdas are interpreted and an
    inline expression referenced inside one re-evaluates PER ELEMENT —
    the inline-split shingle builder re-split the whole doc for every
    shingle position, O(tokens²) per doc (measured 280× at 30k tokens,
    r5). A bound column stays bound because it is multi-referenced in the
    consuming projection (CollapseProject only inlines single-use or
    cheap aliases)."""
    toks = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    return df.select(*keep_cols, F.col(text_col), toks.alias("_toks"))


def _shingles_staged(text_col: str, n: int = 3):
    """Word n-gram shingles over a ``_stage_tokens`` frame (whole trimmed
    text if < n tokens). Lambda touches only the bound ``_toks`` column."""
    tk = F.col("_toks")
    k = F.size(tk) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
    )
    return F.when(k >= 1, grams).otherwise(F.array(F.trim(F.col(text_col))))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per doc with columns mh0..mh{k-1}: min over shingles of
    xxhash64(shingle, perm_seed).

    ROW-LOCAL since r5: k ``array_min(transform(...))`` passes over the
    staged shingle array (bound column, k-way multi-referenced — the HOF
    rule) — ZERO SHUFFLE for the signature stage, vs the former
    explode → groupBy(k min-aggs) whose map-side-combined shuffle still
    carried one k-long row per doc per map partition. Measured 2.0 →
    0.53 s on sf0.1, byte-identical output (golden-verified).
    NOTE (r3, measured, still holds): a hash-once-then-derive-k variant
    (xxhash64(xxhash64(shingle), i)) was ABBA-benchmarked at +18% — the
    extra hash LAYER costs more than hashing the short shingle string k
    times (xxh64 call overhead dominates below ~32 bytes). Kept direct."""
    staged = _stage_tokens(df, [F.col(id_col)], text_col).select(
        F.col(id_col), _shingles_staged(text_col, shingle_n).alias("_sh")
    )
    sh = F.col("_sh")

    def min_hash(perm: int):
        # single-param lambda ONLY: pyspark treats a two-param lambda as
        # (element, index) — a `lambda s, _p=perm:` default-arg form fed
        # the ARRAY INDEX into the seed (caught by the goldens, r5). The
        # plain closure is safe: F.transform builds the expression
        # eagerly, so late binding never fires.
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(perm))))

    return staged.select(
        F.col(id_col),
        *[min_hash(i).alias(f"mh{i}") for i in range(num_perms)],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    # ALL band keys in one projection + one explode — NOT a bands-way union:
    # each union branch is its own subplan, so at scale the expensive
    # shingle-explode aggregation would run `bands` times per join side
    # (measured: 15 scans / 32 aggregates in the post-AQE plan of the union
    # form vs one sig pass here; exchange reuse only partially rescued it).
    # The projection itself is shared with the incremental/streaming paths.
    banded = minhash_band_keys(df, id_col, text_col, num_perms, bands, shingle_n)
    # lazy localCheckpoint: the candidate self-join references `banded` on
    # both sides and ReuseExchange does not fire for them (r4, plan-
    # verified on the simhash twin) — without it the shingle+signature
    # aggregation executes twice. ABBA at sf0.1: median ratio 0.95 (under
    # the VM floor locally; structural 2x-stage saving at crawl scale).
    # Skinny (id, band, band_key) rows only.
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    bb = banded.alias("b")
    cand = (
        a.join(
            bb,
            (F.col(f"a.band_key") == F.col(f"b.band_key"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # exact verification on shingle sets, computed ONLY for candidate docs
    # (semi-join first: candidates ≪ corpus, so the second tokenize +
    # array_distinct pass never touches non-candidate rows).
    # localCheckpoint materializes the (tiny) candidate set once — without
    # it the signature-agg + banded-join subplan executes twice (once under
    # cand_ids, once under the verify join). eager=False (ADVICE r03):
    # building this DataFrame must not trigger Spark jobs at plan-
    # construction time; materialization happens at the first action and
    # is reused after. Checkpoint blocks are freed by the ContextCleaner
    # when the plan is garbage-collected (repeated calls don't accumulate
    # live blocks), at the cost of lineage truncation: on executor loss
    # the result is recomputed from the checkpoint's parent, not source.
    cand = cand.localCheckpoint(eager=False)
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    sets_df = _stage_tokens(
        df.join(cand_ids, id_col, "left_semi"), [F.col(id_col)], text_col
    ).select(
        F.col(id_col),
        F.array_distinct(_shingles_staged(text_col, shingle_n)).alias("sset"),
    )
    sa = sets_df.alias("sa")
    sb = sets_df.alias("sb")
    verified = (
        cand.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sa.sset", "sb.sset"))
                / F.size(F.array_union("sa.sset", "sb.sset")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, band_key) rows — the single-pass LSH banding projection
    shared by ``minhash_lsh_pairs`` and the incremental/streaming dedup
    paths. Skinny (~20 B/row × bands), which is what makes persisting it
    as a per-epoch MANIFEST viable: a streaming ingest can anti-join new
    band keys against stored reference keys without re-tokenizing the
    accumulated corpus every epoch."""
    rows_per_band = num_perms // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perms, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)],
                    F.lit(b),
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col,
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def dedup_against_reference(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near: bool = True,
    num_perms: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    ref_band_keys: DataFrame | None = None,
    new_band_keys: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL crawl dedup: keep rows of ``new_df`` that duplicate
    nothing in the (already-kept) ``ref_df`` — the production shape for
    successive snapshot ingests, where deduping new×reference avoids
    re-clustering the full corpus every crawl. Two stages, both
    anti-joins (never a self-join over new ∪ ref):

    1. EXACT: drop new rows whose md5(text) appears in the reference —
       one anti-join on a 16-byte key (shuffle or broadcast per AQE).
    2. NEAR (``near=True``): drop new rows sharing ≥1 MinHash LSH band
       key with any reference row — the same single-pass banding as
       ``minhash_lsh_pairs``, but joined new-vs-ref (each side's
       signature aggregation runs once; the anti-join carries only
       (id, band, band_key)). Band-collision near-dedup is the standard
       recall/precision trade at ingest; run the exact-Jaccard verify
       variant (``minhash_lsh_pairs`` on survivors ∪ ref sample) where
       precision matters more than one pass. Pass ``ref_band_keys`` (a
       (band, band_key)-bearing frame, e.g. a persisted manifest from
       ``minhash_band_keys``) to skip re-computing reference signatures
       from text — the streaming-ingest shape, where the reference corpus
       grows every epoch but its keys were already computed on arrival.
       Pass ``new_band_keys`` (an (id, band, band_key) frame over
       ``new_df``, ideally checkpointed) to skip re-computing the NEW
       side's signatures too — the streaming epoch computes the batch's
       keys once and reuses them here, for its bucket-prune set, and for
       the manifest write. Keys of rows the exact stage already dropped
       are harmless: the resulting ids are anti-joined against the
       exact-stage survivors, where those rows no longer exist.

    Returns the surviving rows of ``new_df`` (all original columns)."""
    ref_hashes = ref_df.select(F.md5(F.col(text_col)).alias("content_hash"))
    survivors = (
        new_df.withColumn("content_hash", F.md5(F.col(text_col)))
        .join(ref_hashes, "content_hash", "left_anti")
        .drop("content_hash")
    )
    if not near:
        return survivors

    if ref_band_keys is None:
        ref_band_keys = minhash_band_keys(
            ref_df, id_col, text_col, num_perms, bands, shingle_n
        )
    ref_keys = ref_band_keys.select("band", "band_key").distinct()
    if new_band_keys is None:
        new_band_keys = minhash_band_keys(
            survivors, id_col, text_col, num_perms, bands, shingle_n
        )
    hit_ids = (
        new_band_keys.join(ref_keys, ["band", "band_key"], "left_semi")
        .select(id_col)
        .distinct()
    )
    return survivors.join(hit_ids, id_col, "left_anti")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected pair graph via iterative
    hash-min label propagation (each node repeatedly adopts the minimum
    component id among itself and its neighbors) — the standard
    DataFrame-only approach for the short, dense clusters near-dup graphs
    produce (cliques/stars converge in 2-3 rounds; the driver loop only
    checks a scalar convergence count per round). Returns (node, component)
    where component = min node id in the component.

    At 100 TB: each round is one groupBy-min over the edge list; for
    adversarial long-chain graphs switch to the large-star/small-star
    variant (same primitive, provably O(log n) rounds)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)  # re-joined every round
    )
    # localCheckpoint (executor-side materialization + lineage truncation)
    # after every round — without it the k-th round re-executes all k-1
    # previous rounds (iterative-DataFrame lineage blowup, O(k²) work),
    # and nothing is ever collected to the driver beyond the scalar
    # convergence count. LAZY checkpoints (r8): the per-round ``changed``
    # count is the action that materializes that round's new_comp (and,
    # in round 1, sym+comp), so each round runs ONE job instead of two —
    # same blocks, same truncation, half the job-scheduling overhead.
    comp = (
        sym.select("u").distinct().withColumn("c", F.col("u"))
        .localCheckpoint(eager=False)
    )
    changed = None
    for _ in range(max_iter):
        # candidate label per node: min over self and neighbors' labels
        neigh = sym.join(comp.withColumnRenamed("u", "v"), "v").select("u", "c")
        new_comp = (
            comp.unionByName(neigh)
            .groupBy("u")
            .agg(F.min("c").alias("c"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "u")
            .filter(F.col("n.c") != F.col("o.c"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    if changed:
        # r4: silent non-convergence returned WRONG labels for graphs
        # whose diameter exceeds max_iter (hash-min moves labels one hop
        # per round). Near-dup graphs are short/dense and converge in 2-3
        # rounds; anything else must fail loudly.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
            " (graph diameter > max_iter); raise max_iter or use"
            " connected_components_star (O(log n) rounds on any shape)"
        )
    return comp.select(F.col("u").alias("node"), F.col("c").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): provably O(log² n) rounds (O(log n) in practice) on ANY
    graph shape — the variant ``connected_components``'s docstring
    defers to for adversarial long chains, where plain hash-min label
    propagation needs O(diameter) rounds.

    large-star: for each node u, connect every strictly-LARGER neighbor
    to u's minimum neighborhood label m(u) (self included);
    small-star: connect every ≤-neighbor to m(u). Both are one
    groupBy-min + one join per round, same primitives as hash-min; edges
    monotonically point toward component minima and the algorithm
    converges when the edge set is a star forest (fixed point). Returns
    (node, component) with component = min node id, exactly matching
    ``connected_components``."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=False)
    )

    def _sym(df):
        return df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _min_label(df):
        """m(u) = min over u's listed neighbors and u itself — one
        map-side-combinable groupBy."""
        return (
            df.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )

    def _large_star(df):
        sym = _sym(df)
        m = _min_label(sym)
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(df):
        # orient edges small→large, then hook every neighbor ≤ u to m(u)
        oriented = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = _min_label(oriented)
        return (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    cur = e
    converged = False
    for _ in range(max_iter):
        prev = cur
        mid = _large_star(cur).localCheckpoint(eager=False)
        cur = _small_star(mid).localCheckpoint(eager=False)
        # converged when a FULL large+small round is a fixed point (star
        # forest). Comparing small-star's output against the same round's
        # large-star output stops early on chains: small-star can be the
        # identity while the next large-star still re-roots (measured on
        # a 4-node path — (3,1) only becomes (3,0) one round later).
        if cur.exceptAll(prev).isEmpty() and prev.exceptAll(cur).isEmpty():
            converged = True
            break
    if not converged:
        # ADVICE r04: labels from a partially-converged edge set are the
        # same silent-wrong-labels failure the hash-min variant raises on.
        raise RuntimeError(
            f"connected_components_star did not reach its star-forest"
            f" fixed point in {max_iter} large+small rounds (O(log² n)"
            " expected — raise max_iter)"
        )
    comp = _sym(cur).groupBy("u").agg(F.min("v").alias("c"))
    comp = comp.select("u", F.least("c", "u").alias("c"))
    # isolated self-loop-only inputs and single-edge stars resolve above;
    # nodes appearing only as minima keep themselves
    nodes = (
        edges.select(F.col(src).alias("u"))
        .unionByName(edges.select(F.col(dst).alias("u")))
        .distinct()
    )
    return (
        nodes.join(comp, "u", "left")
        .select(
            F.col("u").alias("node"),
            F.coalesce(F.col("c"), F.col("u")).alias("component"),
        )
    )


def near_dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    cc: str = "hashmin",
) -> DataFrame:
    """Near-duplicate KEEP set: cluster the pair graph into components and
    keep the minimum id per component, plus every document that appears in
    no pair. The composition ``minhash_lsh_pairs → near_dedup_keep`` is the
    full dedup policy (pairs alone under-specify which copies to drop when
    clusters overlap transitively). ``cc`` picks the clustering:
    ``'hashmin'`` (default — O(diameter) rounds, right for the short dense
    clusters near-dup graphs produce) or ``'star'`` (Kiveris
    large/small-star, O(log n) rounds on ANY shape — the at-scale choice
    when the graph might contain long chains). Both yield component = min
    id, so the keep set is identical."""
    if cc not in ("hashmin", "star"):
        raise ValueError(f"cc must be 'hashmin' or 'star', got {cc!r}")
    cc_fn = connected_components if cc == "hashmin" else connected_components_star
    comps = cc_fn(pairs, src, dst)
    keepers = comps.groupBy("component").agg(F.min("node").alias(id_col)).select(id_col)
    unpaired = df.select(id_col).join(
        comps.select(F.col("node").alias(id_col)), id_col, "left_anti"
    )
    return keepers.unionByName(unpaired)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs — the quadratic baseline that
    validates the LSH path at small scale (gate the input size upstream)."""
    sets_df = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)).alias("tset"),
    )
    a = sets_df.alias("a")
    b = sets_df.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.tset", "b.tset"))
                / F.size(F.array_union("a.tset", "b.tset")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sign of the sum of
    (+1/-1) votes from each token's xxhash64 bit (bit i set iff
    2·count_i > n_tokens — algebraically identical to the ±1-vote sign).
    Returns (id, simhash:bigint).

    ROW-LOCAL since r5: one array fold per document — token hashes via a
    bound-column transform, a 64-lane bit-count accumulator
    (aggregate + zip_with + bit_get, lambda-vars only per the HOF rule),
    and a powers-array XOR pack. ZERO SHUFFLE for the signature stage: the
    former explode → groupBy(64 sums) shuffled every token hash
    (~12 bytes × tokens, corpus-wide); now only (id, simhash) leaves the
    scan. Measured 2.7 s → 0.35 s on sf0.1 (7.7×), byte-identical output
    (golden-verified). Historical notes: a packed-lane agg variant (r3)
    and a hash-derive-k variant were each ABBA-measured slower than the
    branch-free 64-sum agg this replaces; the row-local fold beats all
    three AND drops the shuffle."""
    staged = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), TOKEN_SPLIT).alias("_toks")
    ).filter(F.col("_toks").isNotNull())  # null text: parity with the old
    # explode form, which emitted no row for it
    tk = F.col("_toks")
    hashes = F.transform(tk, lambda t: F.xxhash64(t))
    bitseq = F.sequence(F.lit(0), F.lit(63))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bitseq, lambda j: F.bit_get(h, j).cast("long")),
            lambda a, b: a + b,
        ),
    )
    # 1<<63 overflows signed long — the sign-bit power is its own literal
    powers = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
            for j in range(64)
        ]
    )
    n = F.size(tk).cast("long")
    terms = F.zip_with(
        counts,
        powers,
        lambda c, p: F.when(c * 2 > n, p).otherwise(F.lit(0).cast("long")),
    )
    sim = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseXOR(v))
    return staged.select(F.col(id_col), sim.alias("simhash"))


def hash_block_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    n_blocks: int = 4,
    blocks_per_key: int = 1,
) -> DataFrame:
    """Near-pair candidates over ANY 64-bit hash column via the block
    trick (shared by text SimHash and perceptual image aHash): split the
    hash into ``n_blocks`` chunks; a pair within ``max_hamming`` differs
    in at most ``max_hamming`` chunks, so it AGREES on ≥ n_blocks −
    max_hamming → equi-join per chunk key, then exact popcount filter.
    Returns (id_a, id_b, hamming) with id_a < id_b.

    KEY-WIDTH / TABLE-COUNT TRADE (VERDICT r03 #8, Manku-Jain-Sarma
    WWW'07 §3): with ``blocks_per_key = t`` each join key concatenates t
    chunks (width t·64/n_blocks bits) and ALL C(n_blocks, t) t-subsets
    become tables — a pair agreeing on ≥ n_blocks − max_hamming chunks is
    guaranteed to share at least one t-subset whenever ``t ≤ n_blocks −
    max_hamming`` (enforced). Defaults (4 blocks × 1 = 16-bit keys, ~65k
    buckets) are fine to ~10^8 docs; at 10^10..10^12 docs use wider keys
    so buckets stay small, e.g. n_blocks=8, blocks_per_key=4, max_hamming
    ≤ 4 → C(8,4)=70 tables of 32-bit keys (~4×10^9 buckets) — the
    explode factor buys bucket selectivity, the same rule as
    ``similarity.sized_rows_per_band``."""
    from itertools import combinations

    # blocks_per_key=1 stays permissive for max_hamming ≥ n_blocks (legacy
    # best-effort recall, e.g. exploratory wide-radius probes); the wider
    # keys are opt-in and opting in asserts the guarantee.
    if blocks_per_key > 1 and not blocks_per_key <= n_blocks - max_hamming:
        raise ValueError(
            f"blocks_per_key={blocks_per_key} must be ≤ n_blocks -"
            f" max_hamming = {n_blocks - max_hamming} for the agreement"
            " guarantee to hold (Manku-style tables)"
        )
    if blocks_per_key < 1:
        raise ValueError("blocks_per_key must be ≥ 1")
    sims = hashed.select(
        F.col(id_col), F.col(hash_col).alias("simhash")
    )
    width = 64 // n_blocks
    # one projection + one explode (see minhash_lsh_pairs: an n_blocks-way
    # union would recompute the 64-vote aggregation per branch at scale)
    def key_of(combo):
        key = None
        for j, c in enumerate(combo):
            part = (
                F.shiftrightunsigned(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
            )
            part = F.shiftleft(part, j * width)
            key = part if key is None else key.bitwiseXOR(part)
        return key

    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(ci).alias("chunk_id"),
                key_of(combo).alias("chunk"),
            )
            for ci, combo in enumerate(
                combinations(range(n_blocks), blocks_per_key)
            )
        ]
    )
    all_chunks = sims.select(
        F.col(id_col), F.col("simhash"), F.explode(chunk_structs).alias("ck")
    ).select(
        id_col,
        "simhash",
        F.col("ck.chunk").alias("chunk"),
        F.col("ck.chunk_id").alias("chunk_id"),
    )
    # lazy localCheckpoint: both self-join sides reference this frame and
    # ReuseExchange does NOT fire for them (r4: plan showed the 64-sum
    # aggregation twice, zero ReusedExchange). ABBA at sf0.1: median
    # ratio 0.94 — under the VM's 10% floor locally, but at crawl scale
    # re-running the tokenize+signature pass is 2x a major stage; the
    # checkpointed projection is ~24 B/row x tables (at ingest the hash
    # column is precomputed and this IS the skinny chunk table).
    all_chunks = all_chunks.localCheckpoint(eager=False)
    a = all_chunks.alias("a")
    b = all_chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    blocks_per_key: int = 1,
) -> DataFrame:
    """Near-dup TEXT pairs by SimHash: ``simhash64`` over tokens, then the
    shared block-trick join (see ``hash_block_pairs`` for the key-width /
    table-count sizing rule)."""
    return hash_block_pairs(
        simhash64(df, id_col, text_col),
        id_col=id_col,
        hash_col="simhash",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        blocks_per_key=blocks_per_key,
    )
