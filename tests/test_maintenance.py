"""Maintenance: snapshot expiry + orphan-file GC + concurrent commit retry."""

import os
import time

import pyspark.sql.functions as F

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.types import schema_from_spark


def _mk(spark, warehouse, name="db.maint"):
    df = spark.range(0, 50).select(F.col("id"), (F.col("id") % 5).alias("g"))
    t = Table.create(warehouse, name, schema_from_spark(df.schema))
    return t.append(spark, df), df


def test_expire_then_gc_removes_unreachable_files(spark, warehouse):
    t, df = _mk(spark, warehouse)
    # overwrite-all makes the v1 data files unreachable once v1 expires
    t = t.overwrite_all(spark, df.where(F.col("g") != 0))
    assert len(t.metadata.snapshots) == 2

    # nothing is orphaned while the old snapshot is retained
    assert t.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 1000,
                                 dry_run=True) == []

    t = t.expire_snapshots(older_than_ms=int(time.time() * 1000) + 1000,
                           retain_last=1)
    assert len(t.metadata.snapshots) == 1

    removed = t.remove_orphan_files(
        older_than_ms=int(time.time() * 1000) + 1000)
    assert removed, "expired snapshot's files should be orphaned"
    for p in removed:
        assert not os.path.exists(p)
    # table still reads correctly after GC
    assert t.to_df(spark).count() == 40
    # GC is idempotent
    assert t.remove_orphan_files(
        older_than_ms=int(time.time() * 1000) + 1000) == []


def test_orphan_gc_respects_cutoff(spark, warehouse):
    t, _ = _mk(spark, warehouse, "db.maint2")
    # drop a stray uncommitted file; a cutoff in the past must protect it
    stray = os.path.join(t.location, "data", "in-flight.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"x")
    assert t.remove_orphan_files(older_than_ms=0, dry_run=True) == []
    got = t.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 1000)
    assert [os.path.basename(p) for p in got] == ["in-flight.parquet"]


def test_concurrent_appends_both_land(spark, warehouse):
    """Two stale handles appending: the second commit hits a version conflict
    and must refresh-and-reapply (transaction/mod.rs:175-229 semantics)."""
    df = spark.createDataFrame([(1,)], "id long")
    t0 = Table.create(warehouse, "db.conc", schema_from_spark(df.schema))
    h1 = Table.load(warehouse, "db.conc")
    h2 = Table.load(warehouse, "db.conc")  # same base version as h1
    h1.append(spark, spark.createDataFrame([(10,)], "id long"))
    h2.append(spark, spark.createDataFrame([(20,)], "id long"))
    final = Table.load(warehouse, "db.conc")
    got = sorted(r["id"] for r in final.to_df(spark).collect())
    assert got == [10, 20]
    assert len(final.metadata.snapshots) == 2
