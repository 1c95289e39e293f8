"""Streaming extraction + windowed metrics — R16 (SURVEY.md §2.B).

The batch engine is reused unchanged: ``mapInArrow`` works on streaming
DataFrames, so the §2.A engine runs per micro-batch. Late data is governed
by a watermark on ``warc_ts``; duplicate crawls within the watermark are
dropped with ``dropDuplicatesWithinWatermark``; tumbling-window per-language
counts aggregate the extracted output. The parquet sink goes through
``foreachBatch`` writing each epoch into its own ``epoch_id=N`` partition
with dynamic partition overwrite: a re-executed epoch (crash between the
parquet write and the checkpoint commit) overwrites its own partition
instead of appending duplicates — idempotent, exactly-once per epoch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from htmld_spark.functions.udfs import extract_df


def read_pages_stream(
    spark: SparkSession, source_dir: str, schema=None, max_files: int = 8
) -> DataFrame:
    """File-source stream over a directory of pages parquet shards."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(source_dir)
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )


def streaming_extract(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Extraction over a stream, late-data bounded, re-crawl dups dropped."""
    deduped = pages_stream.select("url", "warc_ts", "html", "lang").withWatermark(
        "warc_ts", watermark
    )
    deduped = deduped.dropDuplicatesWithinWatermark(["url", "warc_ts"])
    return extract_df(deduped, with_spans=False)


def windowed_lang_counts(
    extracted: DataFrame, window: str = "10 minutes", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window per-language doc/char counts over extracted output.
    Pass ``watermark`` only when the input does not already carry one
    (streaming_extract's watermark survives through mapInArrow)."""
    if watermark is not None:
        extracted = extracted.withWatermark("warc_ts", watermark)
    return (
        extracted
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("ws"),
            "lang",
            "n_docs",
            "total_chars",
        )
    )


def session_window_counts(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """R16 session windows: ``F.session_window`` groups per-key events into
    dynamic sessions — a new event extends the session while it starts
    strictly before previous_ts + gap; window end = last_ts + gap. Works on
    batch AND streaming inputs (streaming requires the watermark).
    Returns (key, ss, se, n) with unix-epoch session bounds."""
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap), key)
        .agg(F.count("*").alias("n"))
        .select(
            F.col(key),
            F.unix_timestamp(F.col("session_window.start")).alias("ss"),
            F.unix_timestamp(F.col("session_window.end")).alias("se"),
            "n",
        )
    )


def write_epoch(batch_df: DataFrame, epoch_id: int, data_dir: str) -> None:
    """Idempotent epoch write: partition by epoch_id + dynamic partition
    overwrite, so a replayed epoch (crash between parquet write and
    checkpoint commit) replaces its own partition instead of appending
    duplicates — exactly-once per epoch."""
    (
        batch_df.withColumn("epoch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(data_dir)
    )


def run_stream_to_parquet(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    watermark: str = "1 hour",
):
    """Full streaming job: extract → append parquet via foreachBatch.
    Returns the started StreamingQuery (caller stops it / awaits)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    extracted = streaming_extract(read_pages_stream(spark, source_dir), watermark)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch(batch_df, epoch_id, os.path.join(out_dir, "data"))

    return (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def run_ingest_with_dedup(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "url",
    text_col: str = "text",
    near: bool = False,
    watermark: str = "1 hour",
):
    """Streaming crawl ingest with DEDUP-ON-ARRIVAL: every micro-batch is
    extracted, exact-deduped WITHIN the batch (keep min id per md5), then
    deduped AGAINST the accumulated kept corpus
    (``dedup.dedup_against_reference`` — exact md5 anti-join; ``near=True``
    adds the MinHash band-key anti-join) before appending to it. The kept
    corpus only ever grows by batch survivors, so nothing is re-clustered
    — the incremental shape, applied per trigger.

    Epoch writes are partition-overwritten (``write_epoch``), so a
    replayed epoch after a crash replaces itself: reprocessing batch N
    against a corpus that already contains batch N's survivors would drop
    them as self-duplicates and LOSE data with a plain append — the
    epoch_id partition scheme makes the replay overwrite exactly its own
    rows instead. Returns the started StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    data_dir = os.path.join(out_dir, "data")
    extracted = streaming_extract(read_pages_stream(spark, source_dir), watermark)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_epoch(
            spark, batch_df, epoch_id, data_dir, id_col, text_col, near
        )

    return (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def ingest_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    data_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    near: bool = False,
) -> None:
    """One dedup-on-arrival epoch (the foreachBatch body of
    ``run_ingest_with_dedup``, exposed for direct crash-replay testing):
    within-batch exact dedup, then anti-join against every OTHER epoch's
    survivors, then partition-overwrite this epoch."""
    from pyspark.sql.window import Window

    from htmld_spark.functions.dedup import dedup_against_reference

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    batch_unique = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    try:
        # reference = every OTHER epoch's survivors: a replayed epoch must
        # not see its own previously-written rows, or it would drop its
        # whole batch as self-duplicates and overwrite its partition with
        # nothing (data loss on crash-replay).
        kept = (
            spark.read.parquet(data_dir)
            .filter(F.col("epoch_id") != epoch_id)
            .drop("epoch_id")
        )
        survivors = dedup_against_reference(
            batch_unique, kept, id_col=id_col, text_col=text_col, near=near
        )
    except Exception:  # first epoch: no corpus yet
        survivors = batch_unique
    write_epoch(survivors, epoch_id, data_dir)
