"""Multimodal plumbing (stubbed codecs, real Spark shapes) and the
Structured Streaming extraction variant (R16)."""

import pytest
from pyspark.sql import functions as F

from fixtures.gen_pages import ensure_pages
from htmld_spark.functions import multimodal as MM
from htmld_spark.pipeline.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="pytest_mm_stream")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def media(spark):
    rows = MM.gen_media_rows(60)
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media):
    a = {r.media_id: r for r in MM.image_features_df(media).collect()}
    b = {r.media_id: r for r in MM.image_features_df(media).collect()}
    assert len(a) == 20  # every 3rd row is an image
    assert all(r.decoder == "stub" for r in a.values())
    for k in a:
        assert (a[k].mean_r, a[k].phash) == (b[k].mean_r, b[k].phash)
    # width/height surfaced from typed meta
    assert all(r.width > 0 and r.height > 0 for r in a.values())


def test_frame_sampling_explodes_rows(spark, media):
    frames = MM.frame_sample_df(media, every_n=10).collect()
    vids = {r.media_id for r in frames}
    assert vids  # video rows exist
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.media_id, []).append(r)
    metas = {r.media_id: r.meta.n_frames for r in media.filter("kind='video'").collect()}
    for vid, rows in by_vid.items():
        assert len(rows) == (metas[vid] + 9) // 10
        assert [r.frame_idx for r in sorted(rows, key=lambda x: x.frame_idx)] == list(
            range(0, metas[vid], 10)
        )
        assert all(len(r.frame) > 0 for r in rows)


def test_media_kind_filter_pushdown(spark, media):
    plan = MM.image_features_df(media)._jdf.queryExecution().executedPlan().toString()
    assert "image" in plan  # kind filter present below the UDF


def test_streaming_extraction_matches_batch(spark, tmp_path_factory):
    from htmld_spark.streaming.stream_job import (
        streaming_extract,
        read_pages_stream,
        windowed_lang_counts,
    )

    src = ensure_pages("0.001")
    stream = read_pages_stream(spark, src, max_files=16)
    # fixture re-crawls jump warc_ts by ~115 days; keep them in-watermark
    counts = windowed_lang_counts(streaming_extract(stream, watermark="3650 days"))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_counts_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("stream_counts_test")
    # all 1010 docs pass through extraction (dedup drops none: url+warc_ts unique)
    assert got.agg(F.sum("n_docs")).collect()[0][0] == 1010
    assert got.select("lang").distinct().count() == 5
    # chars agree with the golden text column
    golden = (
        spark.read.parquet(src)
        .groupBy("lang")
        .agg(F.sum(F.length("text")).alias("expected_chars"))
    )
    j = (
        got.groupBy("lang")
        .agg(F.sum("total_chars").alias("got_chars"))
        .join(golden, "lang")
    )
    assert j.filter(F.col("got_chars") != F.col("expected_chars")).count() == 0


def test_streaming_parquet_sink_and_restart(spark, tmp_path_factory):
    from htmld_spark.streaming.stream_job import run_stream_to_parquet

    src = ensure_pages("0.001")
    out = str(tmp_path_factory.mktemp("stream_out"))
    q = run_stream_to_parquet(spark, src, out, watermark="3650 days")
    q.processAllAvailable()
    q.stop()
    data = spark.read.parquet(out + "/data")
    n1 = data.count()
    assert n1 == 1010
    # restart with same checkpoint: no new files → no duplicates
    q2 = run_stream_to_parquet(spark, src, out, watermark="3650 days")
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out + "/data").count() == n1


def test_epoch_write_is_idempotent_on_replay(spark, tmp_path_factory):
    """Crash-replay of an epoch (foreachBatch re-invoked with the same
    epoch_id after the parquet write but before the checkpoint commit)
    must not duplicate rows: write_epoch overwrites its own epoch_id
    partition (ADVICE r01)."""
    from htmld_spark.streaming.stream_job import write_epoch

    out = str(tmp_path_factory.mktemp("epoch_sink")) + "/data"
    df = spark.range(100).withColumnRenamed("id", "v")
    write_epoch(df, 0, out)
    write_epoch(df, 1, out)
    assert spark.read.parquet(out).count() == 200
    # replay epoch 1 (same rows) — count unchanged
    write_epoch(df, 1, out)
    assert spark.read.parquet(out).count() == 200
    # replay epoch 1 with FEWER rows (e.g. source trimmed): replaces, not appends
    write_epoch(df.limit(40), 1, out)
    got = spark.read.parquet(out)
    assert got.count() == 140
    assert got.filter("epoch_id = 1").count() == 40


def test_stateful_host_stats_accumulates_across_batches(spark):
    """applyInPandasWithState: state carries per-host totals across
    micro-batches; final totals equal the batch ground truth."""
    from htmld_spark.streaming.stateful import stateful_host_stats

    src = ensure_pages("0.001")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(src)
    )
    out = stateful_host_stats(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("host_state_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("host_state_test")
    # multiple triggers → multiple rows per host, totals strictly increasing
    per_host_rows = got.groupBy("host").count().collect()
    assert any(r["count"] > 1 for r in per_host_rows)  # state spanned batches
    # last (max) running total per host == batch-mode ground truth
    final = {
        r.host: (r.total_docs, r.total_bytes)
        for r in got.orderBy("total_docs").collect()
    }
    truth = {
        r.host: (r.n, r.b)
        for r in spark.read.parquet(src)
        .groupBy(F.parse_url("url", F.lit("HOST")).alias("host"))
        .agg(F.count("*").alias("n"), F.sum(F.length("html")).alias("b"))
        .collect()
    }
    assert final == truth
    # batch deltas sum to totals
    sums = {
        r.host: (r.sd, r.sb)
        for r in got.groupBy("host")
        .agg(F.sum("batch_docs").alias("sd"), F.sum("batch_bytes").alias("sb"))
        .collect()
    }
    assert sums == truth
