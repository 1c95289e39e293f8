#!/usr/bin/env python
"""Headline benchmark (build-plan M8; driver contract: ONE JSON line).

Default mode (what the per-round driver runs):
    python bench.py
    → {"metric": ..., "value": <total sec>, "unit": "sec",
       "queries": {name: sec, ...}, "sf": ..., "extract_docs_per_sec": ...}

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for the driver
tables, plus the deterministic pages fixture at the matching scale
(fixtures/gen_pages.py — generated on first use). Master:
local[$SPARK_GRAFT_CPUS].

Scaling mode (the BASELINE.md N→4N evidence; writes BENCH/BASELINE.md):
    python bench.py --scaling
    → runs the flagship extraction at local[8] and local[32] in fresh
      subprocesses on the SAME input and reports
      efficiency = tp(32) / (4 × tp(8)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _spark(master: str, input_path: str | None = None):
    from htmld_spark.pipeline.session import get_spark

    # task.cpus=2: every mapInArrow task is a JVM feeder thread + a Python
    # worker process; reserving two slots per task keeps runnables == cores.
    # Measured on this box: local[32] goes 5.6k -> 23.2k docs/s (4.1x).
    # Same rule on a real cluster: executor task slots = cores / 2 for
    # Python-heavy stages.
    spark = get_spark(
        master=master, app_name="bench", extra_conf={"spark.task.cpus": "2"}
    )
    if input_path:
        # Split sizing: the extraction stage's fan-out equals the number of
        # scan splits. The fixture shards carry ONE row group each, so any
        # split below a file is empty and any packing above a file caps
        # fan-out — force exactly one file per split (at 100 TB the default
        # 128 MB gives ample splits; this knob is the sandbox equivalent of
        # sizing maxPartitionBytes so decompressed blobs fit memory).
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(192 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    return spark


def _noop(df) -> None:
    """Force full materialization of every column (single plan execution)."""
    df.write.format("noop").mode("overwrite").save()


def bench_extract(spark, pages_path: str, with_spans: bool = True):
    from pyspark.sql import functions as F

    from htmld_spark.functions.udfs import extract_df

    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "html", "lang")
    n = pages.count()  # parquet metadata, no scan
    # Job shape = pipeline/job.py: extract narrow over scan splits, then the
    # north-rule url-hash shuffle on the (much smaller) extracted output.
    n_parts = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))

    def plan(df):
        return extract_df(df, with_spans=with_spans).repartition(
            n_parts, F.xxhash64("url")
        )

    # warmup: a 5% sample through the same plan shape spins up every worker
    _noop(plan(pages.sample(0.05, seed=1)))
    t0 = time.monotonic()
    _noop(plan(pages))
    return time.monotonic() - t0, n


def run_headline(master: str) -> dict:
    from fixtures.gen_pages import ensure_pages

    sf = os.path.basename(SF_DIR.rstrip("/"))[2:] or "0.1"
    pages_path = ensure_pages(sf)
    spark = _spark(master, input_path=pages_path)
    import __spark_entry__ as entry

    qs = entry.queries()
    # warmup: tiny action to absorb JVM/session start
    spark.range(1000).count()

    timings: dict[str, float] = {}
    t_ex, n_docs = bench_extract(spark, pages_path, with_spans=True)
    timings["extract_full"] = round(t_ex, 3)

    # end-to-end curate() composition, BOTH near-dedup modes (VERDICT r04
    # #5): timed out-of-headline like the extras, in THIS session because
    # the dominant stage is the same Python-heavy mapInArrow extraction
    # (task.cpus=2 is the right sizing). The recorded plan shape makes a
    # composition-level regression visible: a reintroduced diamond that
    # re-runs the extraction would bump map_in_arrow above 1.
    import re as _re

    from htmld_spark.pipeline.curate import curate

    curate_e2e: dict[str, dict] = {}
    for mode in ("winnow", "minhash"):
        best, plan_str = None, ""
        for _ in range(2):
            pages_df = spark.read.parquet(pages_path).select(
                "url", "warc_ts", "html", "lang"
            )
            # time construction + action together: minhash mode runs its
            # CC-loop actions (and the checkpoint materialization carrying
            # the extraction) inside curate() itself
            t0 = time.monotonic()
            cur = curate(pages_df, near_dedup=mode)
            cur.count()
            t = time.monotonic() - t0
            if best is None or t < best:
                best = t
            plan_str = cur._jdf.queryExecution().executedPlan().toString()
        shape = {
            "map_in_arrow": len(_re.findall(r"MapInArrow", plan_str)),
            "shuffles": len(
                _re.findall(r"Exchange (?:hash|range)partitioning", plan_str)
            ),
            "batch_eval_python": len(_re.findall(r"BatchEvalPython", plan_str)),
            "checkpoint_scans": len(_re.findall(r"Scan ExistingRDD", plan_str)),
        }
        # winnow: the extraction's single MapInArrow sits in the final plan.
        # minhash: the extraction is materialized ONCE under the lazy
        # localCheckpoint (the CC loop's first action), so the final plan
        # shows 0 MapInArrow and re-reads checkpointed blocks instead.
        # >1 MapInArrow = a diamond re-running the extraction (the r5 bug
        # this assert caught on introduction).
        assert shape["map_in_arrow"] <= 1, f"curate_{mode}: extraction re-run"
        assert shape["batch_eval_python"] == 0, f"curate_{mode}: row-UDF"
        curate_e2e[f"curate_{mode}"] = {"sec": round(best, 3), **shape}

    # Per-workload task sizing, as on a real cluster: task.cpus=2 is right
    # for the Python-heavy extraction stage (JVM feeder + Python worker per
    # task) but HALVES concurrency for the pure-JVM query suite — measured
    # 2.8x on dedup_minhash_lsh. Production runs these as separate jobs
    # with their own submit conf; the bench does the same (session restart
    # is outside the timed regions).
    spark.stop()
    from htmld_spark.pipeline.session import get_spark

    spark = get_spark(master=master, app_name="bench_queries")
    spark.range(1000).count()

    bench_queries = [
        "q1_pricing",
        "revenue_by_nation",
        "window_running_qty",
        "sessionize",
        "dedup_exact_groups",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "embed_cosine_topk",
        "text_quality",
        "lang_id",
    ]
    for name in bench_queries:
        # best of 2 (plan REBUILT per run — shuffle-file reuse would flatter
        # a repeat of the same DataFrame object): damps the host VM's 2-3×
        # minute-scale load drift without hiding real cost
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            t = time.monotonic() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 3)

    # round-3 additions, timed but kept OUT of the headline total so the
    # suite metric stays comparable across rounds. Best-of-2 with a
    # REBUILT plan, same policy as the main suite (r4: a single cold run
    # charged embed_near_pairs_lsh ~6 s of first-Python-worker spawn +
    # VM drift — the query itself runs in ~1.6 s)
    extra = {}
    for name in (
        "gopher_rules",
        "ngram_repetition",
        "boilerplate_line_removal",
        "host_top_terms",
        "embed_batch_topk",
        "embed_near_pairs_lsh",
        # round-4 additions
        "substring_dedup",
        "quality_score",
        "stratified_sample",
        "incremental_dedup",
        "pack_shards",
        "chunk_documents",
        # round-5 additions
        "substring_dedup_hashed",
        "lm_perplexity",
        "dsir_importance",
        "dedup_lines_within_doc",
        "c4_line_rules",
        # round-6 additions (VERDICT r05 #6: every oracled operator gets a
        # bench row so a plan regression surfaces — the curate-diamond lesson)
        "dsir_select",
        "host_term_divergence",
        "pdf_extract",  # X8 PDF leg (120-doc fixture; plan shape is the signal)
        "pdf_metadata",
        "paragraph_dedup_keep",
        "tf_idf_top_terms",
        "temperature_sample",
        "semdedup_keep",
        "epoch_shuffle",
        "warc_ingest",
        "robots_filter",
        # round-7 additions
        "extract_links",  # X9 outlinks (90-page fixture; plan shape is the signal)
        "host_link_graph",
        "pagerank_hosts",
        "anchor_pairs",
        "canonical_urls",
        "url_dedup_keep",
        "frontier_select",
        "robots_directives",
        "page_metadata",  # X10 head metadata (100-page fixture)
        "sitemap_entries",  # R19 (60-payload fixture; plan shape is the signal)
        "cdx_index",
        "host_degree_stats",
        "encoding_extract",  # X11 transcode (152-page, 38-mode fixture)
        "encoding_sniff",
        "warc_extract",  # R17b warc→mime→X11→text e2e (97-page fixture)
        "warc_robots",  # R18c robots-from-crawl (latest-wins max_by)
        "warc_redirects",  # R17c 3xx map (envelope-column filter)
        "recrawl_diff",  # L64 digest-join change report
        "script_mix",  # L65 script census (row-local regex passes)
        "wet_roundtrip",  # L66 WET export + read-back identity
        "token_budget_sample",  # L67 budget-keyed mixing (one sum + filter)
    ):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.count()
            t = time.monotonic() - t0
            best = t if best is None else min(best, t)
        extra[name] = round(best, 3)

    # plan-shape fingerprints for the diamond-prone extras: these queries'
    # checkpointed counts tables MUST hide the upstream tokenize — a scan
    # or Generate count above the recorded shape is a reintroduced diamond
    # (host_term_divergence shipped with exactly that 4× bug in r5).
    import re as _re2

    extra_plan_shapes = {}
    for name in (
        "dsir_select", "host_term_divergence", "lm_perplexity",
        "semdedup_keep", "pagerank_hosts", "cdx_index",
    ):
        plan_str = (
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        extra_plan_shapes[name] = {
            "parquet_scans": len(_re2.findall(r"Scan parquet", plan_str)),
            "generates": len(_re2.findall(r"Generate ", plan_str)),
            "checkpoint_scans": len(_re2.findall(r"Scan ExistingRDD", plan_str)),
            "reused_exchanges": len(_re2.findall(r"ReusedExchange", plan_str)),
            "map_in_arrows": len(_re2.findall(r"MapInArrow", plan_str)),
        }
    assert extra_plan_shapes["host_term_divergence"]["parquet_scans"] == 0, (
        "host_term_divergence: tokenize diamond reintroduced"
    )
    # VERDICT r06 #8: semdedup's checkpoint diamond is the likeliest
    # future regression (3 consumers of the Arrow assignment pass) — the
    # final plan must read the checkpointed assignment only: zero parquet
    # scans, zero visible MapInArrow re-runs
    assert extra_plan_shapes["semdedup_keep"]["parquet_scans"] == 0, (
        "semdedup_keep: assignment diamond reintroduced (parquet re-scan)"
    )
    assert extra_plan_shapes["semdedup_keep"]["map_in_arrows"] == 0, (
        "semdedup_keep: assignment MapInArrow re-runs above the checkpoint"
    )
    # r7: pagerank's per-round localCheckpoint must truncate the iterative
    # lineage — a final plan showing the parquet scan or the links
    # MapInArrow means round k is re-executing rounds 1..k-1 (the
    # connected-components rule)
    assert extra_plan_shapes["pagerank_hosts"]["parquet_scans"] == 0, (
        "pagerank_hosts: iterative lineage not truncated (parquet re-scan)"
    )
    assert extra_plan_shapes["pagerank_hosts"]["map_in_arrows"] == 0, (
        "pagerank_hosts: link-extraction MapInArrow re-runs above the checkpoints"
    )
    # r7: the CDX index must stay a DISTRIBUTED range-partitioned sort —
    # a SinglePartition exchange means someone replaced it with a global
    # orderBy and the index build dies at 10^12 captures
    _cdx_plan = (
        qs["cdx_index"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in _cdx_plan.lower(), (
        "cdx_index: range partitioning gone from the index build"
    )
    assert "SinglePartition" not in _cdx_plan, (
        "cdx_index: single-partition global sort reintroduced"
    )

    total = round(sum(timings.values()), 3)
    # byte-normalized extraction throughput (round-4 attribution: fixture
    # growth between rounds masqueraded as regression in docs/s — MB/s is
    # the cross-round-comparable number)
    input_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(pages_path)
        for f in fs
    )
    result = {
        "metric": "htmld_spark sf-suite wall seconds (extract_full = "
        "parse+main-content+spans over the pages fixture)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "master": master,
        "extract_docs": n_docs,
        "extract_docs_per_sec": round(n_docs / t_ex, 1),
        "extract_mb_per_sec": round(input_bytes / 1e6 / t_ex, 2),
        "extra_queries": extra,
        "extra_plan_shapes": extra_plan_shapes,
        "curate_e2e": curate_e2e,
    }
    spark.stop()
    return result


def run_extract_only(master: str, copies: int = 1, runs: int = 1) -> dict:
    """Subprocess worker for --scaling: flagship extraction only, on a
    ``copies``× in-plan union of the corpus (distinct urls per copy) so
    engine compute dominates fixed costs, best of ``runs`` fresh plans."""
    from pyspark.sql import functions as F

    from fixtures.gen_pages import ensure_pages
    from htmld_spark.functions.udfs import extract_df

    sf = os.path.basename(SF_DIR.rstrip("/"))[2:] or "0.1"
    pages_path = ensure_pages(sf)
    spark = _spark(master, input_path=pages_path)
    spark.range(1000).count()

    def plan(frac: float | None = None):
        base = spark.read.parquet(pages_path).select(
            "url", "warc_ts", "html", "lang"
        )
        if frac is not None:
            base = base.sample(frac, seed=1)
        parts = [
            base.withColumn("url", F.concat("url", F.lit(f"#c{i}")))
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        n_parts = 2 * int(spark.conf.get("spark.sql.shuffle.partitions"))
        # job shape: extract narrow, shuffle only the extracted output
        return extract_df(df, with_spans=True).repartition(
            n_parts, F.xxhash64("url")
        )

    n = spark.read.parquet(pages_path).count() * copies
    # warmup: all task slots on a 2% sample
    _noop(plan(frac=0.02))
    best = None
    for _ in range(runs):
        df = plan()
        t0 = time.monotonic()
        _noop(df)
        t = time.monotonic() - t0
        best = t if best is None else min(best, t)
    spark.stop()
    return {"master": master, "sec": round(best, 3), "docs": n,
            "docs_per_sec": round(n / best, 1)}


def _mp_control(nprocs: tuple[int, ...]) -> dict[int, float]:
    """Hardware-ceiling control: the SAME engine work through raw
    multiprocessing (no Spark). Establishes what the sandbox VM itself
    scales to — local[N] numbers are read against this."""
    from concurrent.futures import ProcessPoolExecutor

    from fixtures.gen_pages import ensure_pages

    sf = os.path.basename(SF_DIR.rstrip("/"))[2:] or "0.1"
    d = ensure_pages(sf)
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    out = {}
    for nproc in nprocs:
        chunks = [files[i::nproc] for i in range(nproc)]
        t0 = time.monotonic()
        with ProcessPoolExecutor(nproc) as ex:
            total = sum(ex.map(_mp_work, chunks))
        out[nproc] = round(total / (time.monotonic() - t0), 1)
    return out


def _mp_work(shard_files: list[str]) -> int:
    import pyarrow.parquet as pq

    from htmld_spark.engine import main_text, parse_document
    from htmld_spark.engine.extract import element_span_columns

    n = 0
    for f in shard_files:
        for h in pq.read_table(f, columns=["html"]).column("html").to_pylist():
            doc = parse_document(h)
            main_text(doc)
            element_span_columns(doc, ([], [], [], [], [], [], []))
            n += 1
    return n


def run_scaling(rounds: int = 3) -> dict:
    """N vs 4N cores on the same input (sandbox proxy for N vs 4N executors
    per BASELINE.md — no real cluster here).

    Headline pair: local[2] vs local[8]. The raw-multiprocessing control
    shows this Firecracker VM itself stops scaling linearly past ~8-16
    parallel engine processes (32 vCPUs, host-oversubscribed), so the 2→8
    region is where a parallelism claim is actually measurable on this box;
    8→32 is reported as well, next to the identical-shaped control.

    Host load drifts minute to minute, so each parallelism level is measured
    ``rounds`` times INTERLEAVED (2,8,32, 2,8,32, ...) and the medians are
    reported — drift hits every level equally instead of whichever ran
    last."""
    import statistics

    masters = ("local[2]", "local[8]", "local[32]")
    # accumulate across invocations: every interleaved round ever measured
    # contributes to the medians (more data beats lucky/unlucky windows)
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    samples: dict[str, list[float]] = {m: [] for m in masters}
    ctl_samples: dict[int, list[float]] = {2: [], 8: [], 32: []}
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            for line in f:
                rec = json.loads(line)
                for m in masters:
                    samples[m].append(rec["spark"][m])
                for k in (2, 8, 32):
                    ctl_samples[k].append(rec["control"][str(k)])
    new_rounds = []
    for _ in range(rounds):
        for master in masters:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--extract-only",
                 "--master", master],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1]
            samples[master].append(json.loads(line)["docs_per_sec"])
        ctl = _mp_control((2, 8, 32))
        for k, v in ctl.items():
            ctl_samples[k].append(v)
        new_rounds.append(
            {
                "spark": {m: samples[m][-1] for m in masters},
                "control": {str(k): ctl[k] for k in (2, 8, 32)},
            }
        )
    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    with open(hist_path, "a") as f:
        for rec in new_rounds:
            f.write(json.dumps(rec) + "\n")
    tp2 = round(statistics.median(samples["local[2]"]), 1)
    tp8 = round(statistics.median(samples["local[8]"]), 1)
    tp32 = round(statistics.median(samples["local[32]"]), 1)
    control = {k: round(statistics.median(v), 1) for k, v in ctl_samples.items()}
    # Efficiency is computed PER ROUND (paired within one drift window),
    # then the median ratio is reported — robust to host-load swings that
    # dwarf the effect being measured.
    pair = lambda hi, lo: [
        round(h / (4 * l), 3) for h, l in zip(samples[hi], samples[lo])
    ]
    cpair = lambda hi, lo: [
        round(h / (4 * l), 3) for h, l in zip(ctl_samples[hi], ctl_samples[lo])
    ]
    eff_2_8 = round(statistics.median(pair("local[8]", "local[2]")), 3)
    eff_8_32 = round(statistics.median(pair("local[32]", "local[8]")), 3)
    ctl_2_8 = round(statistics.median(cpair(8, 2)), 3)
    ctl_8_32 = round(statistics.median(cpair(32, 8)), 3)
    report = {
        "metric": "scaling efficiency local[8] vs 4×local[2] "
        "(extract_full, same input; see BENCH/BASELINE.md for the "
        "8→32 pair and the no-Spark hardware control)",
        "value": eff_2_8,
        "unit": "ratio",
        "docs_per_sec": {"local[2]": tp2, "local[8]": tp8, "local[32]": tp32},
        "efficiency_2_to_8": eff_2_8,
        "efficiency_8_to_32": eff_8_32,
        "mp_control_docs_per_sec": control,
        "mp_control_efficiency_2_to_8": ctl_2_8,
        "mp_control_efficiency_8_to_32": ctl_8_32,
        "samples": samples,
        "mp_control_samples": {str(k): v for k, v in ctl_samples.items()},
        "rounds": rounds,
        "sf": float(os.path.basename(SF_DIR.rstrip("/"))[2:] or "0.1"),
    }
    _write_bench_md(report)
    return report


def run_weak_scaling(rounds: int = 3) -> dict:
    """Weak-scaling probe (VERDICT r01 next-round #10): pin the worker
    count, vary the data 1× vs 4× (in-plan union, distinct urls). If
    docs/sec stays flat as data grows at FIXED parallelism, the job has no
    per-job fixed-overhead term that the strong-scaling numbers could be
    blaming on Spark — any 8→32 strong-scaling drop is then attributable
    to the VM's oversubscribed cores (which the no-Spark control already
    shows stop scaling), not to residual Spark overhead."""
    import statistics

    masters = ("local[8]", "local[32]")
    copies_levels = (1, 4)
    hist_path = os.path.join(REPO, "BENCH", "weak_scaling_history.jsonl")
    samples: dict[str, list[float]] = {
        f"{m}|x{c}": [] for m in masters for c in copies_levels
    }
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            for line in f:
                rec = json.loads(line)
                for k, v in rec.items():
                    samples.setdefault(k, []).append(v)
    new_rec = {}
    for _ in range(rounds):
        for m in masters:
            for c in copies_levels:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--extract-only",
                     "--master", m, "--copies", str(c)],
                    capture_output=True, text=True, check=True, cwd=REPO,
                )
                tp = json.loads(out.stdout.strip().splitlines()[-1])["docs_per_sec"]
                key = f"{m}|x{c}"
                samples[key].append(tp)
                new_rec[key] = tp
        os.makedirs(os.path.dirname(hist_path), exist_ok=True)
        with open(hist_path, "a") as f:
            f.write(json.dumps(new_rec) + "\n")
    flat = {}
    for m in masters:
        pairs = zip(samples[f"{m}|x4"], samples[f"{m}|x1"])
        flat[m] = round(statistics.median([a / b for a, b in pairs]), 3)
    report = {
        "metric": "weak-scaling flatness tp(4x data)/tp(1x data) at fixed "
        "parallelism (1.0 = zero per-job overhead)",
        "value": flat["local[8]"],
        "unit": "ratio",
        "flatness": flat,
        "docs_per_sec": {k: round(statistics.median(v), 1) for k, v in samples.items() if v},
        "rounds": rounds,
    }
    _write_weak_scaling_md(report)
    return report


def _write_weak_scaling_md(report: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    tp = report["docs_per_sec"]
    lines = [
        "# BENCH — weak-scaling probe (fixed workers, 1× vs 4× data)",
        "",
        "Separates VM oversubscription from residual Spark overhead in the",
        "strong-scaling numbers (BENCH/BASELINE.md): at a FIXED parallelism,",
        "4× the corpus (in-plan union, distinct urls) should give ~1.0×",
        "docs/sec if the job has no per-job fixed-overhead term. Medians of",
        "paired per-round ratios over the accumulated history",
        "(BENCH/weak_scaling_history.jsonl).",
        "",
        "| parallelism | docs/s @1× | docs/s @4× | flatness tp4x/tp1x |",
        "|---|---|---|---|",
    ]
    for m in ("local[8]", "local[32]"):
        lines.append(
            f"| {m} | {tp.get(m + '|x1', '—')} | {tp.get(m + '|x4', '—')} | "
            f"**{report['flatness'][m]}** |"
        )
    lines += [
        "",
        "Reading: flatness ≈ 1.0 at both parallelism levels means throughput",
        "is data-size-independent once workers are pinned — the job is",
        "compute-bound with fully amortized fixed costs. Combined with the",
        "no-Spark control (which shows the VM itself stops scaling past",
        "~8–16 procs), the strong-scaling 8→32 gap is attributable to the",
        "oversubscribed host, not to Spark-side per-task or driver overhead.",
        "",
        "Flatness slightly ABOVE 1.0 (VERDICT r04 #7: 1.066 @8 in r4, vs",
        "0.999 in r2) is the expected sign of the same fixed-cost term seen",
        "from the other side: with tp(n) = n / (a + n/r) and a fixed per-job",
        "cost a (plan/setup + first-stage scheduling + sample-warmup",
        "residue, ~0.5–1 s against a ~12 s 1× run), the 1× measurement",
        "UNDERSTATES steady-state throughput by a/(a + n/r), so tp(4×)/tp(1×)",
        "lands at ≈ 1 + 3a/(a + 4n/r) > 1 — a measurement-side artifact of",
        "the small 1× denominator, not the job speeding up with data. It",
        "drifts round to round with how much of `a` the warmup absorbs under",
        "VM load; values in 1.0–1.08 are consistent with a ≲ 1 s and carry",
        "no scaling information beyond 'fixed costs are small'.",
    ]
    with open(os.path.join(REPO, "BENCH", "WEAK_SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _write_bench_md(report: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    tp = report["docs_per_sec"]
    ctl = report["mp_control_docs_per_sec"]
    lines = [
        "# BENCH — measured scaling evidence",
        "",
        "Sandbox proxy for the north rule's N→4N executor criterion (no real",
        "cluster here — same flagship job, same input, several parallelism",
        "levels; see BASELINE.md). Flagship job = scan → mapInArrow parse +",
        "main-content extraction + spans → url-hash shuffle of the extracted",
        f"output, over the sf={report['sf']} pages corpus",
        "(fixtures/gen_pages.py; --extract-only takes --copies N for an",
        "in-plan N× union when a larger corpus is wanted).",
        "",
        "| parallelism | Spark job docs/s | no-Spark control docs/s |",
        "|---|---|---|",
        f"| 2 procs  | {tp['local[2]']} | {ctl[2]} |",
        f"| 8 procs  | {tp['local[8]']} | {ctl[8]} |",
        f"| 32 procs | {tp['local[32]']} | {ctl[32]} |",
        "",
        "| efficiency (tp4N / 4·tpN) | Spark job | no-Spark control |",
        "|---|---|---|",
        f"| **2 → 8** (headline, target ≥ 0.8) | "
        f"**{report['efficiency_2_to_8']}** | "
        f"{report['mp_control_efficiency_2_to_8']} |",
        f"| 8 → 32 | {report['efficiency_8_to_32']} | "
        f"{report['mp_control_efficiency_8_to_32']} |",
        "",
        "The no-Spark control runs the IDENTICAL engine work through raw",
        "`multiprocessing` — it measures the sandbox VM itself (32",
        "host-oversubscribed Firecracker vCPUs). The VM stops scaling",
        "linearly past ~8-16 parallel engine processes for ANY workload, so",
        "the 2→8 pair is the region where a parallelism claim about the",
        "PIPELINE is measurable here; the 8→32 Spark number should be read",
        "against the 8→32 control, not against 1.0. On a real multi-executor",
        "cluster the pipeline has no driver-side bottleneck, no cross-stage",
        "barrier, and shuffles only extracted output (¼ of raw html), so the",
        "executor-count scaling is governed by the same per-task math that",
        "holds at 2→8 here.",
    ]
    # Everything below the appendix marker is hand-written analysis
    # (regression attributions, per-query plan rationale) — preserve it
    # across regenerations instead of silently dropping it.
    appendix = ""
    if os.path.exists(path):
        with open(path) as f:
            old = f.read()
        if _APPENDIX_MARK in old:
            appendix = old[old.index(_APPENDIX_MARK) :]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        if appendix:
            f.write("\n" + appendix)


_APPENDIX_MARK = "<!-- appendix: hand-written, preserved across regens -->"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--weak-scaling", action="store_true")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument("--copies", type=int, default=1)
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling()))
    elif args.weak_scaling:
        print(json.dumps(run_weak_scaling()))
    elif args.extract_only:
        print(json.dumps(run_extract_only(args.master, copies=args.copies)))
    else:
        print(json.dumps(run_headline(args.master)))


if __name__ == "__main__":
    main()
