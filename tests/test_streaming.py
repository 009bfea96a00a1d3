"""Structured Streaming sink: exactly-once appends, watermarked windows."""

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.types import schema_from_spark
from iceberg_rust_spark.streaming.sink import (append_stream,
                                               committed_batch_ids,
                                               windowed_counts)

EVENTS_SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(path)


def test_stream_append_exactly_once(spark, warehouse, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    _write_batch(spark, src, [(1, t0, "click", 1.0), (2, t0, "view", 2.0)])

    empty = spark.createDataFrame([], EVENTS_SCHEMA)
    table = Table.create(warehouse, "db.stream_events",
                         schema_from_spark(empty.schema))

    stream = spark.readStream.schema(empty.schema).parquet(src)
    q = append_stream(table, stream, ckpt, query_id="q1")
    q.awaitTermination(60)
    table = table.refresh()
    assert table.to_df(spark).count() == 2
    assert committed_batch_ids(table, "q1") == {0}

    # second run: new file appears; only it should be appended
    _write_batch(spark, src, [(3, t0, "click", 3.0)])
    stream = spark.readStream.schema(empty.schema).parquet(src)
    q = append_stream(table, stream, ckpt, query_id="q1")
    q.awaitTermination(60)
    table = table.refresh()
    assert table.to_df(spark).count() == 3

    # replay simulation: wipe the Spark checkpoint so batch ids restart at 0;
    # snapshot-summary bookkeeping must suppress the duplicate commit
    import shutil
    shutil.rmtree(ckpt)
    stream = spark.readStream.schema(empty.schema).parquet(src)
    q = append_stream(table, stream, ckpt, query_id="q1")
    q.awaitTermination(60)
    table = table.refresh()
    assert table.to_df(spark).count() == 3  # no duplicates


def test_windowed_counts_watermark(spark, warehouse, tmp_path):
    src = str(tmp_path / "wsrc")
    ckpt = str(tmp_path / "wckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [(i, t0 + dt.timedelta(minutes=m), et, 1.0)
            for i, (m, et) in enumerate([(0, "click"), (3, "click"), (7, "view"),
                                         (12, "click"), (18, "view")])]
    _write_batch(spark, src, rows)
    # a much-later event in a second file advances the watermark far past the
    # first file's windows, so they finalize and emit (append mode only emits
    # closed windows)
    late_ts = t0 + dt.timedelta(hours=2)
    _write_batch(spark, src, [(99, late_ts, "click", 1.0)])

    empty = spark.createDataFrame([], EVENTS_SCHEMA)
    out_schema = ("window_start timestamp, window_end timestamp, "
                  "event_type string, n long, sum_value double")
    out_empty = spark.createDataFrame([], out_schema)
    table = Table.create(warehouse, "db.rollup",
                         schema_from_spark(out_empty.schema))

    stream = (spark.readStream.schema(empty.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agged = windowed_counts(stream, ts_col="ts", window="10 minutes",
                            watermark="5 minutes", keys=["event_type"],
                            value_col="value")
    q = append_stream(table, agged, ckpt, query_id="rollup")
    q.awaitTermination(120)
    table = table.refresh()
    got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in table.to_df(spark).collect()}
    assert got[(t0, "click")] == (2, 2.0)
    assert got[(t0, "view")] == (1, 1.0)
    assert got[(t0.replace(minute=10), "click")] == (1, 1.0)
    assert got[(t0.replace(minute=10), "view")] == (1, 1.0)
    # the late event's own window never closed -> not emitted
    assert (late_ts, "click") not in got


def test_stateful_sessionize_stream(spark, tmp_path):
    from iceberg_rust_spark.streaming.stateful import sessionize_stream
    src = str(tmp_path / "ssrc")
    ckpt = str(tmp_path / "sckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    # user 1: two sessions split by a 2-hour gap; user 2: one session
    rows = [(1, t0, "a", 1.0), (2, t0 + dt.timedelta(minutes=5), "a", 1.0),
            (3, t0 + dt.timedelta(minutes=10), "a", 1.0),
            (4, t0 + dt.timedelta(hours=2), "a", 1.0),
            (5, t0, "b", 1.0)]
    ev = [(eid, ts, et, v) for eid, ts, et, v in rows]
    df_rows = [(eid, ts, 1 if et == "a" else 2, et, v)
               for eid, ts, et, v in ev]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(df_rows, schema).coalesce(1) \
        .write.parquet(src)

    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=1800)
    q = (sessions.writeStream.format("memory").queryName("sess_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start"]): r["n_events"]
           for r in spark.sql("select * from sess_out").collect()}
    # only user 1's FIRST session closed (the 2h-later event exceeded the
    # gap); the trailing sessions stay open in state awaiting timeout
    assert got == {(1, t0): 3}


def test_stream_dedup_within_watermark(spark, tmp_path):
    from iceberg_rust_spark.streaming.stateful import dedup_stream
    src = str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "dckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    schema = "event_id long, ts timestamp, user_id long"
    rows = [(1, t0, 10), (1, t0, 10),                       # exact dup
            (2, t0 + dt.timedelta(minutes=1), 11),
            (1, t0 + dt.timedelta(minutes=2), 10),          # dup within delay
            (3, t0 + dt.timedelta(minutes=3), 12)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        spark.createDataFrame([], schema).schema).parquet(src)
    out = dedup_stream(stream, ["event_id"], delay="10 minutes")
    q = (out.writeStream.format("memory").queryName("dd_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql("select * from dd_out").collect())
    assert got == [1, 2, 3]


def test_stream_stream_interval_join(spark, tmp_path):
    """Two event streams joined on key within an event-time interval —
    watermarks bound both join-state buffers (the 100 TB-safe shape)."""
    imps = str(tmp_path / "imps")
    clicks = str(tmp_path / "clicks")
    ckpt = str(tmp_path / "jckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    ischema = "ad_id long, imp_ts timestamp"
    cschema = "ad_id long, click_ts timestamp"
    spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(minutes=1)), (3, t0)],
        ischema).coalesce(1).write.parquet(imps)
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5)),          # within the hour -> match
         (2, t0 + dt.timedelta(hours=2)),            # too late -> no match
         (4, t0 + dt.timedelta(minutes=2))],         # no impression
        cschema).coalesce(1).write.parquet(clicks)

    si = (spark.readStream.schema(spark.createDataFrame([], ischema).schema)
          .parquet(imps).withWatermark("imp_ts", "10 minutes"))
    sc = (spark.readStream.schema(spark.createDataFrame([], cschema).schema)
          .parquet(clicks).withWatermark("click_ts", "10 minutes"))
    j = si.join(
        sc, (si.ad_id == sc.ad_id) &
            (sc.click_ts >= si.imp_ts) &
            (sc.click_ts <= si.imp_ts + F.expr("INTERVAL 1 HOUR"))
    ).select(si.ad_id, "imp_ts", "click_ts")
    q = (j.writeStream.format("memory").queryName("ssj_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["ad_id"]) for r in spark.sql("select * from ssj_out").collect()}
    assert got == {1}


def test_iceberg_to_iceberg_pipeline(spark, warehouse, tmp_path):
    """End-to-end composition: iceberg source table -> incremental reader ->
    aggregation -> exactly-once iceberg sink table; a second pass with no
    new snapshots appends nothing."""
    from iceberg_rust_spark.streaming.incremental import IncrementalReader
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    src = Table.create(warehouse, "db.pipe_src", schema_from_spark(
        spark.createDataFrame([], EVENTS_SCHEMA).schema))
    src = src.append(spark, spark.createDataFrame(
        [(1, t0, "click", 1.0), (2, t0, "view", 2.0)], EVENTS_SCHEMA))
    src = src.append(spark, spark.createDataFrame(
        [(3, t0, "click", 5.0)], EVENTS_SCHEMA))

    agg_schema = "event_type string, n long, sum_value double"
    dst = Table.create(warehouse, "db.pipe_dst", schema_from_spark(
        spark.createDataFrame([], agg_schema).schema))
    rd = IncrementalReader(src, str(tmp_path / "pipe.ckpt"))

    def run_once():
        nonlocal dst
        for snap_id, batch in rd.micro_batches(spark):
            out = (batch.groupBy("event_type")
                   .agg(F.count("*").alias("n"),
                        F.sum("value").alias("sum_value")))
            dst = dst.append(spark, out,
                             extra_summary={"src-snapshot": str(snap_id)})

    run_once()
    got = {(r["event_type"], r["n"], r["sum_value"])
           for r in dst.to_df(spark).collect()}
    assert got == {("click", 1, 1.0), ("view", 1, 2.0), ("click", 1, 5.0)}
    n_snaps = len(dst.metadata.snapshots)
    run_once()  # no new source snapshots -> no new sink snapshots
    assert len(dst.refresh().metadata.snapshots) == n_snaps


def test_merge_stream_upserts_exactly_once(spark, warehouse, tmp_path):
    """merge_stream: each micro-batch MERGEs on the key; replays with the
    same checkpoint commit nothing new; last state per key wins."""
    from iceberg_rust_spark.streaming.sink import merge_stream
    import pyspark.sql.functions as F
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.types import schema_from_spark

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, k string, v long")
    t = Table.create(warehouse, "db.merge_sink", schema_from_spark(base.schema))
    t = t.append(spark, base)

    src_dir = str(tmp_path / "msrc")
    ckpt = str(tmp_path / "mckpt")
    # change feed: update id 2, insert id 4
    spark.createDataFrame([(2, "B", 200), (4, "d", 40)],
                          "id long, k string, v long").write.parquet(src_dir)

    def run_pass():
        q = merge_stream(t, spark.readStream.schema("id long, k string, v long")
                         .parquet(src_dir), ["id"], ckpt, "q-merge")
        q.awaitTermination(120)

    run_pass()
    t = t.refresh()
    got = {r["id"]: (r["k"], r["v"]) for r in t.to_df(spark).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}
    n_snaps = len(t.metadata.snapshots)
    run_pass()  # replay: checkpoint drained, nothing new
    t = t.refresh()
    assert len(t.metadata.snapshots) == n_snaps
    assert t.to_df(spark).count() == 4


def test_merge_stream_sequence_col_picks_highest_version(spark, warehouse,
                                                         tmp_path):
    """Multi-version CDC batch: sequence_col makes the HIGHEST-sequence row
    win deterministically (without it, dropDuplicates keeps an arbitrary
    one)."""
    from iceberg_rust_spark.streaming.sink import merge_stream
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.types import schema_from_spark

    base = spark.createDataFrame([(1, 0, 100)], "id long, seq long, v long")
    t = Table.create(warehouse, "db.merge_seq", schema_from_spark(base.schema))
    t = t.append(spark, base)

    src_dir = str(tmp_path / "seqsrc")
    ckpt = str(tmp_path / "seqckpt")
    # one batch, THREE versions of key 1 (out of order) + a new key
    spark.createDataFrame([(1, 3, 303), (1, 5, 505), (1, 4, 404),
                           (2, 1, 21)],
                          "id long, seq long, v long").coalesce(1) \
        .write.parquet(src_dir)
    q = merge_stream(t, spark.readStream.schema("id long, seq long, v long")
                     .parquet(src_dir), ["id"], ckpt, "q-seq",
                     sequence_col="seq")
    q.awaitTermination(120)
    t = t.refresh()
    got = {r["id"]: (r["seq"], r["v"]) for r in t.to_df(spark).collect()}
    assert got == {1: (5, 505), 2: (1, 21)}


def test_incremental_reader_survives_expire_and_skips_wap(spark, warehouse,
                                                          tmp_path):
    """IncrementalReader mirrors the ChangesReader hardening: main-ancestry
    walk (no WAP batches), seq-carrying checkpoint (expiry can't force a
    replay), delta batches even when the parent snapshot was expired."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.metadata import now_ms
    from iceberg_rust_spark.sources.types import schema_from_spark
    from iceberg_rust_spark.streaming.incremental import IncrementalReader

    df = spark.range(0, 12).select(F.col("id"), (F.col("id") % 3).alias("g"))
    t = Table.create(warehouse, "db.increxp", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("g") == 0))    # A: 4 rows
    t = t.append(spark, df.where(F.col("g") == 1))    # B: 4 rows
    t = t.append(spark, df.where(F.col("g") == 2)
                 .select(F.col("id") + 900, F.col("g"))
                 .toDF("id", "g"), branch="wap")         # staged: not main

    cp = str(tmp_path / "inc_ckpt.json")
    got = [(sid, b.count()) for sid, b in
           IncrementalReader(t, cp).micro_batches(spark)]
    assert [n for _, n in got] == [4, 4]              # WAP batch absent

    t = t.append(spark, df.where(F.col("g") == 2))    # C: 4 rows
    t = t.expire_snapshots(older_than_ms=now_ms() + 10**9, retain_last=1)
    more = [(sid, b.count()) for sid, b in
            IncrementalReader(t, cp).micro_batches(spark)]
    assert [n for _, n in more] == [4]                # delta only, no replay
