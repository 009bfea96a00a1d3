"""Concurrent-writer conflict matrix (transaction/snapshot.rs:139-163,
conflict_commit_test.rs analog).

Each scenario gives a writer a STALE table handle (another writer commits
in between), so the commit-retry loop re-applies captured files against a
refreshed base. Without validation those re-applies silently corrupt:
a copy-on-write rewrite resurrects concurrently-deleted rows, a positional
delete dangles against compacted-away files. With it, the losing writer
gets ValidationConflict, refreshes, re-plans — and the final table equals
the serial schedule.

The property test drives seeded random interleavings of
append/cow-delete/mor-delete/dv-delete/compact across three stale handles
against a python dict oracle with snapshot-isolation semantics (an op
applies to the state its handle captured), and asserts final rows AND a
strictly linear snapshot lineage.
"""

import random

import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.catalog import ValidationConflict
from iceberg_rust_spark.sources.types import schema_from_spark


def _mk(spark, warehouse, name, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    t = Table.create(warehouse, name, schema_from_spark(df.schema))
    return t.append(spark, df)


def _rows(spark, warehouse, name):
    t = Table.load(warehouse, name)
    return {(r["k"], r["v"]) for r in t.to_df(spark).collect()}


def test_stale_cow_rewrite_conflicts_then_replans(spark, warehouse):
    """COW delete vs COW delete: writer A's captured rewrite files were
    removed by B's rewrite — blind re-apply would resurrect B's deleted
    rows. Must raise; a fresh re-plan lands the serial result."""
    base = [(i, i % 4) for i in range(40)]
    a = _mk(spark, warehouse, "db.c1", base)
    b = Table.load(warehouse, "db.c1")
    b.delete_where(spark, E.col("v") == 1, mode="cow")
    with pytest.raises(ValidationConflict):
        a.delete_where(spark, E.col("v") == 2, mode="cow")
    Table.load(warehouse, "db.c1").delete_where(
        spark, E.col("v") == 2, mode="cow")
    assert _rows(spark, warehouse, "db.c1") == \
        {(k, v) for k, v in base if v not in (1, 2)}


@pytest.mark.parametrize("mode", ["mor", "dv"])
def test_stale_mor_delete_vs_compaction_conflicts(spark, warehouse, mode):
    """Positional delete referencing files a concurrent compaction
    rewrote: the positions would dangle (lost delete). Must raise; the
    re-planned delete applies to the compacted files."""
    name = f"db.c2{mode}"
    df = [(i, i % 4) for i in range(60)]
    a = _mk(spark, warehouse, name, df[:20])
    for lo in (20, 40):
        a.append(spark, spark.createDataFrame(df[lo:lo + 20],
                                              "k long, v long"))
    stale = Table.load(warehouse, name)
    Table.load(warehouse, name).compact(spark, small_file_bytes=1 << 30)
    with pytest.raises(ValidationConflict):
        stale.delete_where(spark, E.col("v") == 0, mode=mode)
    Table.load(warehouse, name).delete_where(spark, E.col("v") == 0,
                                             mode=mode)
    assert _rows(spark, warehouse, name) == \
        {(k, v) for k, v in df if v != 0}


def test_stale_compaction_vs_new_mor_delete_conflicts(spark, warehouse):
    """Compaction captured its inputs, then a MOR delete landed on them:
    the stale rewrite would re-add the deleted rows WITHOUT the new delete
    file (un-delete). Must raise; the re-planned compaction reads through
    the delete and preserves the delete's effect."""
    name = "db.c3"
    df = [(i, i % 4) for i in range(60)]
    a = _mk(spark, warehouse, name, df[:20])
    for lo in (20, 40):
        a.append(spark, spark.createDataFrame(df[lo:lo + 20],
                                              "k long, v long"))
    stale = Table.load(warehouse, name)
    Table.load(warehouse, name).delete_where(spark, E.col("v") == 3,
                                             mode="mor")
    with pytest.raises(ValidationConflict):
        stale.compact(spark, small_file_bytes=1 << 30)
    Table.load(warehouse, name).compact(spark, small_file_bytes=1 << 30)
    assert _rows(spark, warehouse, name) == \
        {(k, v) for k, v in df if v != 3}


def test_stale_appends_never_conflict(spark, warehouse):
    """Appends add files only: two stale handles both land through the CAS
    retry, no validation involved."""
    a = _mk(spark, warehouse, "db.c4", [(0, 0)])
    b = Table.load(warehouse, "db.c4")
    a.append(spark, spark.createDataFrame([(1, 1)], "k long, v long"))
    b.append(spark, spark.createDataFrame([(2, 2)], "k long, v long"))
    assert _rows(spark, warehouse, "db.c4") == {(0, 0), (1, 1), (2, 2)}


def test_interleaved_schedule_property(spark, warehouse):
    """Seeded random interleavings vs a snapshot-isolation oracle: an op
    applies to the state its handle last captured; a ValidationConflict
    refreshes the handle and re-plans. Final rows and linear lineage must
    match exactly."""
    for seed in (7, 23):
        name = f"db.p{seed}"
        rng = random.Random(seed)
        next_k = 100
        base = [(i, i % 4) for i in range(24)]
        t0 = _mk(spark, warehouse, name, base)
        current = dict(base)                      # k -> v (live truth)
        handles = [t0] + [Table.load(warehouse, name) for _ in range(2)]
        captures = [dict(current) for _ in range(3)]
        commits = 1                                # the seeding append

        for _step in range(10):
            i = rng.randrange(3)
            h = handles[i]
            op = rng.choice(["append", "cow", "mor", "dv", "compact"])
            pred_v = rng.randrange(4)
            for _attempt in range(4):
                ver_before = h.version
                try:
                    if op == "append":
                        batch = [(next_k + j, (next_k + j) % 4)
                                 for j in range(4)]
                        h.append(spark, spark.createDataFrame(
                            batch, "k long, v long"))
                    elif op == "compact":
                        h.compact(spark, small_file_bytes=1 << 30)
                    else:
                        h.delete_where(spark, E.col("v") == pred_v,
                                       mode=op if op != "cow" else "cow")
                    break
                except ValidationConflict:
                    handles[i] = h = Table.load(warehouse, name)
                    captures[i] = dict(current)
            else:
                pytest.fail("op kept conflicting after refresh re-plans")
            if h.version != ver_before:            # a commit landed
                commits += 1
                if op == "append":
                    current.update(batch)
                    next_k += 4
                elif op in ("cow", "mor", "dv"):
                    # snapshot isolation: the delete removes rows matching
                    # the predicate AS OF the handle's captured state
                    for k, v in list(captures[i].items()):
                        if v == pred_v:
                            current.pop(k, None)
                # compact: never changes rows
                captures[i] = dict(current)

        assert _rows(spark, warehouse, name) == set(current.items())
        # lineage: strictly linear parent chain, one snapshot per commit
        md = Table.load(warehouse, name).metadata
        chain = []
        head = md.current_snapshot_id
        while head is not None:
            s = md.snapshot_by_id(head)
            chain.append(s.snapshot_id)
            head = s.parent_snapshot_id
        assert len(chain) == commits
        assert len(set(chain)) == len(chain)
