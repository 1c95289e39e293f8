"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md R16 "stateful"; task brief: applyInPandasWithState for custom
stateful operators).

``stateful_host_stats``: per-host cumulative crawl statistics maintained as
explicit group state across micro-batches — the streaming analog of the
pipeline's per-bucket lineage. Each trigger emits one row per host seen in
that batch with BOTH the batch delta and the running totals, so a monitor
can watch crawl progress without re-aggregating history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "host string, batch_docs long, batch_bytes long, "
    "total_docs long, total_bytes long"
)
STATE_SCHEMA = "total_docs long, total_bytes long"


def _update_host_stats(key, pdfs, state: GroupState):
    batch_docs = 0
    batch_bytes = 0
    for pdf in pdfs:
        batch_docs += len(pdf)
        batch_bytes += int(pdf["n_bytes"].sum())
    if state.exists:
        (total_docs, total_bytes) = state.get
    else:
        total_docs, total_bytes = 0, 0
    total_docs += batch_docs
    total_bytes += batch_bytes
    state.update((total_docs, total_bytes))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "batch_docs": [batch_docs],
            "batch_bytes": [batch_bytes],
            "total_docs": [total_docs],
            "total_bytes": [total_bytes],
        }
    )


def stateful_host_stats(pages_stream: DataFrame) -> DataFrame:
    """Streaming per-host running totals with explicit group state.

    Input: a streaming pages DataFrame with at least (url, html).
    Output (append mode): one row per (host, trigger) with batch deltas and
    cumulative totals carried in state across micro-batches. Host
    extraction uses try_parse_url (plain parse_url RAISES on unparseable
    urls in Spark 4 — one malformed crawl URL would kill the stream);
    unparseable urls share the '' state group."""
    by_host = pages_stream.select(
        F.coalesce(
            F.try_parse_url("url", F.lit("HOST")), F.lit("")
        ).alias("host"),
        F.length("html").alias("n_bytes"),
    )
    return by_host.groupBy("host").applyInPandasWithState(
        _update_host_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
