"""Structured Streaming sink: exactly-once streaming appends into a table.

The reference has no streaming surface (SURVEY.md §2.6); this is
beyond-reference Spark-native capability. The sink is ``foreachBatch`` over
any streaming DataFrame: each micro-batch becomes one fast-append snapshot
whose summary records ``(streaming-query-id, streaming-batch-id)``. On
restart, Structured Streaming replays the last un-checkpointed batch; the
sink consults the snapshot log and skips batch ids it has already committed —
snapshot atomicity (catalog CAS) turns Spark's at-least-once replay into
exactly-once table commits, the same idempotent-commit trick Iceberg's real
Spark connector uses.

Watermarked windowed aggregation (late-data handling) composes upstream::

    agged = windowed_counts(stream_df, ts_col="ts", window="10 minutes",
                            watermark="30 minutes", keys=["event_type"])
    q = append_stream(table, agged.writeStream is handled inside, ...)
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.table import Table

SUMMARY_QUERY_KEY = "streaming-query-id"
SUMMARY_BATCH_KEY = "streaming-batch-id"


def committed_batch_ids(table: Table, query_id: str) -> set:
    """Batch ids already committed for ``query_id`` (snapshot-summary scan —
    metadata only, no data IO)."""
    table.refresh()
    return {int(s.summary[SUMMARY_BATCH_KEY])
            for s in table.metadata.snapshots
            if s.summary.get(SUMMARY_QUERY_KEY) == query_id
            and SUMMARY_BATCH_KEY in s.summary}


def append_stream(table: Table, stream_df: DataFrame, checkpoint_dir: str,
                  query_id: str, available_now: bool = True,
                  processing_time: Optional[str] = None) -> StreamingQuery:
    """Start a streaming append of ``stream_df`` into ``table``.

    Exactly-once: batch ids live in snapshot summaries; replayed batches are
    skipped before any data is written. ``available_now=True`` drains the
    source and stops (the Trigger.AvailableNow backfill shape); pass
    ``processing_time='10 seconds'`` instead for a continuous micro-batch
    cadence.
    """
    seen = committed_batch_ids(table, query_id)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in seen or batch_id in committed_batch_ids(table, query_id):
            return
        table.refresh()
        table.append(batch_df.sparkSession, batch_df,
                     extra_summary={SUMMARY_QUERY_KEY: query_id,
                                    SUMMARY_BATCH_KEY: str(batch_id)})
        seen.add(batch_id)

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def merge_stream(table: Table, stream_df: DataFrame, keys: List[str],
                 checkpoint_dir: str, query_id: str,
                 available_now: bool = True,
                 processing_time: Optional[str] = None,
                 sequence_col: Optional[str] = None) -> StreamingQuery:
    """Streaming UPSERT: each micro-batch is MERGEd into ``table`` on
    ``keys`` (one snapshot: eq-deletes for matched keys + new data files) —
    the CDC-apply shape that keeps a table in sync with a change feed.
    Exactly-once via the same snapshot-summary batch-id dedup as
    append_stream.

    When a micro-batch carries several versions of one key, pass
    ``sequence_col`` (an event-sequence / version column): the row with the
    HIGHEST sequence wins deterministically. Without it, dropDuplicates keeps
    an ARBITRARY row per key — fine for at-most-one-version-per-batch feeds,
    not for multi-version CDC batches."""
    seen = committed_batch_ids(table, query_id)

    def reduce_per_key(batch_df: DataFrame) -> DataFrame:
        if sequence_col is None:
            return batch_df.dropDuplicates(keys)
        w = Window.partitionBy(*keys).orderBy(F.col(sequence_col).desc())
        return (batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn"))

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in seen or batch_id in committed_batch_ids(table, query_id):
            return
        table.refresh()
        table.merge(batch_df.sparkSession,
                    reduce_per_key(batch_df), keys,
                    extra_summary={SUMMARY_QUERY_KEY: query_id,
                                   SUMMARY_BATCH_KEY: str(batch_id)})
        seen.add(batch_id)

    writer = (stream_df.writeStream
              .foreachBatch(commit_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_counts(stream_df: DataFrame, ts_col: str, window: str,
                    watermark: str, keys: Optional[List[str]] = None,
                    value_col: Optional[str] = None) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming DataFrame.

    Late rows beyond ``watermark`` are dropped by Spark's state store; each
    window finalizes exactly once in append mode, so downstream
    ``append_stream`` writes one immutable row per closed window — the
    standard streaming-rollup shape (hypertable-style) at any scale.
    """
    keys = keys or []
    agg_cols = [F.count("*").alias("n")]
    if value_col is not None:
        agg_cols.append(F.sum(value_col).alias(f"sum_{value_col}"))
    out = (stream_df
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(F.col(ts_col), window).alias("w"),
                    *[F.col(k) for k in keys])
           .agg(*agg_cols))
    return out.select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      *keys, "n",
                      *([f"sum_{value_col}"] if value_col else []))
