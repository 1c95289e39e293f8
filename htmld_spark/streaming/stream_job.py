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


def write_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    data_dir: str,
    extra_partition_cols: tuple[str, ...] = (),
) -> None:
    """Idempotent epoch write: partition by epoch_id + dynamic partition
    overwrite, so a replayed epoch (crash between parquet write and
    checkpoint commit) replaces its own partition instead of appending
    duplicates — exactly-once per epoch. ``extra_partition_cols`` adds
    sub-partitioning under the epoch (the ingest path's content-hash
    bucket), preserving idempotence: dynamic overwrite replaces every
    (epoch_id=N, …) partition the replay writes, and a replay writes the
    same buckets for the same rows."""
    (
        batch_df.withColumn("epoch_id", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id", *extra_partition_cols)
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
    n_buckets: int = 16,
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
    rows instead.

    The kept corpus is sub-partitioned by a content-hash bucket and (for
    ``near=True``) mirrored by a skinny per-epoch band-key MANIFEST, so
    each epoch's anti-joins PRUNE to the batch's buckets instead of
    scanning every prior epoch (see ``ingest_epoch``). Returns the
    started StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    data_dir = os.path.join(out_dir, "data")
    extracted = streaming_extract(read_pages_stream(spark, source_dir), watermark)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_epoch(
            spark, batch_df, epoch_id, data_dir, id_col, text_col, near,
            n_buckets=n_buckets,
        )

    return (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def manifest_dir_for(data_dir: str) -> str:
    """Band-key manifest location paired with a kept-corpus data dir."""
    return data_dir.rstrip("/") + "_bandkeys"


def _bucket_of(text_col: str, n_buckets: int):
    """Content-hash bucket: equal texts land in equal buckets, so the
    exact-dedup anti-join only ever needs the batch's own buckets."""
    return F.pmod(F.xxhash64(F.md5(F.col(text_col))), F.lit(n_buckets)).cast("int")


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet dataset, returning None ONLY when the path does not
    exist yet (first epoch). Every other failure — corrupt footer,
    transient FS/permission error, schema drift — PROPAGATES so the
    streaming query fails loudly instead of silently skipping dedup and
    appending duplicates (ADVICE r04: the former bare ``except Exception``
    treated all of those as 'no corpus yet')."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise


def ingest_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    data_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    near: bool = False,
    n_buckets: int = 16,
) -> None:
    """One dedup-on-arrival epoch (the foreachBatch body of
    ``run_ingest_with_dedup``, exposed for direct crash-replay testing):
    within-batch exact dedup, then anti-join against every OTHER epoch's
    survivors, then partition-overwrite this epoch.

    REFERENCE-CORPUS MANAGEMENT (VERDICT r04 #3 — the at-crawl-scale
    shape): the kept corpus is partitioned by (epoch_id, _bucket) with
    ``_bucket = pmod(xxhash64(md5(text)), n_buckets)``, and the exact
    anti-join filters the reference scan to the BATCH's bucket set (a
    bounded ≤ n_buckets driver collect) — an exact duplicate has the same
    md5, hence the same bucket, so pruning loses nothing and the epoch
    reads |batch buckets| / n_buckets of the corpus instead of all of it.
    For ``near=True`` the band-key anti-join cannot prune on the content
    bucket (a near-dup's md5 differs), so each epoch also writes a skinny
    (band, band_key) MANIFEST partitioned by (epoch_id, _bkb =
    pmod(band_key, n_buckets)); subsequent epochs anti-join against the
    manifest pruned to the batch's band-key buckets — never re-tokenizing
    the accumulated text corpus. Epochs ingested BEFORE the manifest
    existed (e.g. a near=False history switched to near=True) are
    BACKFILLED on first need: any data epoch missing from the manifest
    gets its band keys computed from its stored survivors and written as
    that epoch's manifest partition, a one-time cost per legacy epoch —
    without it those epochs' near-duplicates would be silently admitted
    forever (ADVICE r05). The batch's own band keys are computed ONCE per
    epoch (lazy localCheckpoint) and shared by the bucket-prune set, the
    anti-join, and the manifest write (ADVICE r05 — they were previously
    recomputed up to three times). Size n_buckets so one bucket of the
    mature corpus ≈ one batch (e.g. 4096 at crawl scale); 16 keeps the
    fixture partition count sane."""
    from pyspark.sql.window import Window

    from htmld_spark.functions.dedup import (
        dedup_against_reference,
        minhash_band_keys,
    )

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    # lazy localCheckpoint: the epoch takes several actions over the batch
    # (bucket collect, band-key collect, anti-joins, final write) and in
    # foreachBatch each would otherwise re-run the batch's extraction —
    # the per-epoch instance of the extraction-diamond rule. Materializes
    # once at the first action.
    batch_unique = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )
    man_dir = manifest_dir_for(data_dir)
    kept_all = _read_or_none(spark, data_dir)
    batch_keys = None
    if near:
        # ONE signature pass over the batch, shared by the bucket-prune
        # collect, the anti-join inside dedup_against_reference, and the
        # manifest write below (each is a separate action; without the
        # checkpoint the shingle/minhash work would re-run per consumer)
        batch_keys = minhash_band_keys(
            batch_unique, id_col, text_col
        ).localCheckpoint(eager=False)
    # layout follows the existing corpus: appending bucketed partitions
    # into a pre-bucketing corpus would leave MIXED directory depths,
    # which parquet partition discovery rejects on the next epoch's read
    bucketed_layout = kept_all is None or "_bucket" in kept_all.columns
    if kept_all is None:
        survivors = batch_unique
    else:
        # reference = every OTHER epoch's survivors: a replayed epoch must
        # not see its own previously-written rows, or it would drop its
        # whole batch as self-duplicates and overwrite its partition with
        # nothing (data loss on crash-replay).
        ref = kept_all.filter(F.col("epoch_id") != epoch_id)
        if bucketed_layout:
            batch_buckets = [
                r[0]
                for r in batch_unique.select(
                    _bucket_of(text_col, n_buckets).alias("_b")
                )
                .distinct()
                .collect()  # bounded by n_buckets
            ]
            kept = (
                ref.filter(F.col("_bucket").isin(batch_buckets))
                .drop("epoch_id", "_bucket")
            )
        else:
            # corpus written before bucketing existed (uniform old
            # layout): full reference scan, and this epoch writes
            # un-bucketed too — bucket pruning starts with a fresh
            # corpus (or after rewriting old epochs); a mixed layout
            # would fail parquet partition discovery outright.
            kept = ref.drop("epoch_id")
        ref_keys = None
        if near:
            man_all = _read_or_none(spark, man_dir)
            # BACKFILL (ADVICE r05): every reference epoch must have
            # manifest coverage, or near-duplicates of pre-manifest
            # epochs (e.g. a near=False history) are admitted forever.
            # One-time cost per legacy epoch; both collects are bounded
            # by the epoch count (ints only).
            ref_epochs = {
                r[0] for r in ref.select("epoch_id").distinct().collect()
            }
            man_epochs = (
                set()
                if man_all is None
                else {
                    r[0]
                    for r in man_all.select("epoch_id").distinct().collect()
                }
            )
            drop_cols = [
                c for c in ("epoch_id", "_bucket") if c in kept_all.columns
            ]
            for e in sorted(ref_epochs - man_epochs):
                write_epoch(
                    minhash_band_keys(
                        kept_all.filter(F.col("epoch_id") == e).drop(*drop_cols),
                        id_col,
                        text_col,
                    )
                    .withColumn(
                        "_bkb",
                        F.pmod("band_key", F.lit(n_buckets)).cast("int"),
                    )
                    .select("band", "band_key", "_bkb"),
                    e,
                    man_dir,
                    extra_partition_cols=("_bkb",),
                )
            if ref_epochs - man_epochs:
                man_all = _read_or_none(spark, man_dir)
            if man_all is not None:
                bkb = [
                    r[0]
                    for r in batch_keys
                    .select(F.pmod("band_key", F.lit(n_buckets)).alias("_b"))
                    .distinct()
                    .collect()  # bounded by n_buckets
                ]
                ref_keys = (
                    man_all.filter(F.col("epoch_id") != epoch_id)
                    .filter(F.col("_bkb").isin(bkb))
                    .select("band", "band_key")
                )
            # man_all can only still be None when the reference has zero
            # epochs of its own (a pure replay of the one existing epoch):
            # ref is empty, so the empty-manifest fallback inside
            # dedup_against_reference sees an empty ref too — no keys lost.
        survivors = dedup_against_reference(
            batch_unique, kept, id_col=id_col, text_col=text_col, near=near,
            ref_band_keys=ref_keys, new_band_keys=batch_keys,
        )
    if bucketed_layout:
        write_epoch(
            survivors.withColumn("_bucket", _bucket_of(text_col, n_buckets)),
            epoch_id,
            data_dir,
            extra_partition_cols=("_bucket",),
        )
    else:
        write_epoch(survivors, epoch_id, data_dir)
    if near:
        # reuse the checkpointed batch keys: semi-join down to the epoch's
        # survivors instead of recomputing signatures a second time
        write_epoch(
            batch_keys.join(survivors.select(id_col), id_col, "left_semi")
            .withColumn("_bkb", F.pmod("band_key", F.lit(n_buckets)).cast("int"))
            .select("band", "band_key", "_bkb"),
            epoch_id,
            man_dir,
            extra_partition_cols=("_bkb",),
        )
