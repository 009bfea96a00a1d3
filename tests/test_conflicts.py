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
            op = rng.choice(["append", "cow", "mor", "dv", "compact",
                             "evolve"])
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
                    elif op == "evolve":
                        # metadata arm: schema evolution must commute with
                        # every data op (ids are append-only); rename flips
                        # an extra column back and forth so repeated arms
                        # stay valid. Row oracle is unaffected.
                        cols = {f.name for f in
                                h.metadata.schema().fields}
                        if "w" not in cols and "w2" not in cols:
                            h.update_schema().add_column("w", "long") \
                                .commit()
                        elif "w" in cols:
                            h.update_schema().rename_column("w", "w2") \
                                .commit()
                        else:
                            h.update_schema().rename_column("w2", "w") \
                                .commit()
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
                if op == "evolve":
                    # schema commits don't add snapshots; refresh so later
                    # data ops on this handle see the evolved schema
                    handles[i] = Table.load(warehouse, name)
                    captures[i] = dict(captures[i])
                    continue
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


# ---------------------------------------------------------------------------
# Scoped delete-race validation: a concurrent ref-less delete file that
# PROVABLY cannot touch the rewrite's inputs (disjoint partition, or
# file_path bounds excluding every removed file) must NOT abort the rewrite;
# only genuinely overlapping deletes raise. (Iceberg's own
# validateNoNewDeleteFiles is partition/bounds-scoped; blanket-raising on
# every concurrent eq-delete made unrelated compactions unretryable.)
# ---------------------------------------------------------------------------

def _commit_eq_delete(spark, t, keys, partition):
    """A REAL eq-delete parquet (key column k) committed with an explicit
    partition scope — the shape a partition-aware external writer produces
    (this repo's own delete_by_equality writes global eq-deletes)."""
    import os
    import uuid as _uuid

    from iceberg_rust_spark.sources.manifest import (
        CONTENT_EQUALITY_DELETES, DataFile)
    from iceberg_rust_spark.sources.write import write_parquet_listing
    out = os.path.join(t.location, "data", f"eq-x-{_uuid.uuid4().hex[:8]}")
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    entries = write_parquet_listing(spark, kdf.coalesce(1), out)
    schema = t.metadata.schema()
    fid = schema.field_by_name("k").field_id
    dels = [DataFile(file_path=p, content=CONTENT_EQUALITY_DELETES,
                     record_count=st["num_rows"],
                     file_size_in_bytes=st["size"], equality_ids=[fid],
                     partition=dict(partition),
                     schema_id=schema.schema_id,
                     spec_id=t.metadata.default_spec_id)
            for p, st in entries]
    return t._commit_retry(lambda m: t._snapshot_update(
        m, "delete", added_deletes=dels))


def _mk_partitioned(spark, warehouse, name, rows):
    from iceberg_rust_spark import PartitionField, PartitionSpec
    from iceberg_rust_spark.functions.transforms import parse_transform
    df = spark.createDataFrame(rows, "k long, p long, v long")
    schema = schema_from_spark(df.schema)
    fid = schema.field_by_name("p").field_id
    spec = PartitionSpec(0, [PartitionField(fid, 1000, "p",
                                            parse_transform("identity"))])
    t = Table.create(warehouse, name, schema, partition_spec=spec)
    return t.append(spark, df)


def test_disjoint_partition_eq_delete_does_not_conflict(spark, warehouse):
    """Concurrent eq-delete scoped to partition p=1 vs a COW rewrite whose
    inputs are all in p=0: provably disjoint, must commit cleanly."""
    rows = [(i, i % 2, i % 4) for i in range(40)]
    _mk_partitioned(spark, warehouse, "db.sc1", rows)
    stale = Table.load(warehouse, "db.sc1")
    # concurrent: delete k=1 (lives in p=1) scoped to partition p=1
    _commit_eq_delete(spark, Table.load(warehouse, "db.sc1"),
                      keys=[1], partition={"p": 1})
    # stale rewrite touches ONLY p=0 files — no conflict
    stale.delete_where(spark, (E.col("p") == 0) & (E.col("v") == 2),
                       mode="cow")
    got = {(r["k"], r["p"], r["v"]) for r in
           Table.load(warehouse, "db.sc1").to_df(spark).collect()}
    assert got == {(k, p, v) for k, p, v in rows
                   if not (p == 0 and v == 2) and k != 1}


def test_same_partition_eq_delete_still_conflicts(spark, warehouse):
    """Concurrent eq-delete in the SAME partition the rewrite touches:
    the stale rewrite would re-add rows the delete targets — must raise."""
    rows = [(i, i % 2, i % 4) for i in range(40)]
    _mk_partitioned(spark, warehouse, "db.sc2", rows)
    stale = Table.load(warehouse, "db.sc2")
    _commit_eq_delete(spark, Table.load(warehouse, "db.sc2"),
                      keys=[2], partition={"p": 0})
    with pytest.raises(ValidationConflict):
        stale.delete_where(spark, (E.col("p") == 0) & (E.col("v") == 2),
                           mode="cow")


def test_unscoped_eq_delete_stays_conservative(spark, warehouse):
    """A GLOBAL (partition-less, ref-less) concurrent eq-delete carries no
    scoping evidence — the rewrite must still raise (conservative)."""
    base = [(i, i % 4) for i in range(40)]
    _mk(spark, warehouse, "db.sc3", base)
    stale = Table.load(warehouse, "db.sc3")
    Table.load(warehouse, "db.sc3").delete_by_equality(
        spark, spark.createDataFrame([(1,)], "k long"), ["k"])
    with pytest.raises(ValidationConflict):
        stale.delete_where(spark, E.col("v") == 2, mode="cow")


def test_pos_delete_file_path_bounds_scope_conflict(spark, warehouse):
    """Ref-less pos-delete whose file_path bounds exclude every file the
    rewrite removes: disjoint, no conflict; bounds that include a removed
    file: conflict."""
    import os
    import uuid as _uuid

    from iceberg_rust_spark.sources.manifest import (
        CONTENT_POSITION_DELETES, DataFile)
    from iceberg_rust_spark.sources.write import write_parquet_listing
    df = [(i, i % 4) for i in range(30)]
    t = _mk(spark, warehouse, "db.sc4", df[:10])          # file(s) A: k 0-9
    t.append(spark, spark.createDataFrame(df[10:20], "k long, v long"))
    t.append(spark, spark.createDataFrame(df[20:], "k long, v long"))

    plan = Table.load(warehouse, "db.sc4").scan().plan_files()
    file_a = next(x.data_file.file_path for x in plan.tasks
                  if x.data_file.lower_bounds.get("k") == 0)

    def commit_pos_delete(handle, target_path):
        out = os.path.join(handle.location, "data",
                           f"pos-x-{_uuid.uuid4().hex[:8]}")
        pdf = spark.createDataFrame([(target_path, 0)],
                                    "file_path string, pos long")
        entries = write_parquet_listing(spark, pdf.coalesce(1), out)
        dels = [DataFile(
            file_path=p, content=CONTENT_POSITION_DELETES,
            record_count=st["num_rows"], file_size_in_bytes=st["size"],
            lower_bounds={"file_path": target_path},
            upper_bounds={"file_path": target_path},
            referenced_data_file=None,          # truncated-stat shape
            schema_id=handle.metadata.schema().schema_id,
            spec_id=handle.metadata.default_spec_id)
            for p, st in entries]
        return handle._commit_retry(lambda m: handle._snapshot_update(
            m, "delete", added_deletes=dels))

    # disjoint: concurrent pos-delete bounded to file A, rewrite removes
    # only the k>=20 file — must commit cleanly
    stale = Table.load(warehouse, "db.sc4")
    commit_pos_delete(Table.load(warehouse, "db.sc4"), file_a)
    stale.delete_where(spark, E.col("k") == 25, mode="cow")
    # row 0 of file A is MOR-deleted, k=25 COW-deleted
    assert Table.load(warehouse, "db.sc4").to_df(spark).count() == 28

    # overlapping: pos-delete bounded to A file the k==27 rewrite removes —
    # any live file whose k-bounds bracket 27 is in that rewrite's plan
    plan2 = Table.load(warehouse, "db.sc4").scan().plan_files()
    file_c = next(x.data_file.file_path for x in plan2.tasks
                  if x.data_file.lower_bounds.get("k") <= 27
                  <= x.data_file.upper_bounds.get("k"))
    stale2 = Table.load(warehouse, "db.sc4")
    commit_pos_delete(Table.load(warehouse, "db.sc4"), file_c)
    with pytest.raises(ValidationConflict):
        stale2.delete_where(spark, E.col("k") == 27, mode="cow")

    # URI-spelled bounds (foreign writer): "file:/..." sorts lexically
    # below every normalized "/..." path, so an unnormalized range compare
    # would silently SKIP this genuinely overlapping conflict
    plan3 = Table.load(warehouse, "db.sc4").scan().plan_files()
    file_d = next(x.data_file.file_path for x in plan3.tasks
                  if x.data_file.lower_bounds.get("k", 99) <= 13
                  <= x.data_file.upper_bounds.get("k", -1))
    stale3 = Table.load(warehouse, "db.sc4")
    commit_pos_delete(Table.load(warehouse, "db.sc4"),
                      "file:" + file_d)
    with pytest.raises(ValidationConflict):
        stale3.delete_where(spark, E.col("k") == 13, mode="cow")


# ----------------------------------------------------- metadata races
# The reference's TableRequirement set (catalog/mod.rs:443-495) also guards
# schema/spec/ref races, not just data-file races. Our retry loop re-applies
# captured DataFiles against the refreshed base, so the matrix must decide
# per scenario: commute cleanly (ids still resolvable) or ValidationConflict
# (captured files bind metadata a concurrent commit removed).

def test_stale_append_vs_schema_evolution_commutes(spark, warehouse):
    """Concurrent UpdateSchema(add column) vs an append captured under the
    old schema: schema ids are append-only, so the retry lands cleanly and
    the old-schema files read back NULL-padded under the new current
    schema — no conflict, both orders give the same table."""
    a = _mk(spark, warehouse, "db.m1", [(1, 10)])
    # B evolves the schema while A holds a stale handle
    Table.load(warehouse, "db.m1").update_schema() \
        .add_column("w", "long").commit()
    df = spark.createDataFrame([(2, 20)], "k long, v long")
    a2 = a.append(spark, df)          # stale handle, retries internally
    got = {tuple(r) for r in Table.load(warehouse, "db.m1")
           .to_df(spark).select("k", "v", "w").collect()}
    assert got == {(1, 10, None), (2, 20, None)}
    # linear lineage: every snapshot's parent is the previous snapshot
    snaps = Table.load(warehouse, "db.m1").metadata.snapshots
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur.parent_snapshot_id == prev.snapshot_id


def test_stale_branch_append_vs_ref_move_lands_on_moved_head(spark, warehouse):
    """SetSnapshotRef moves a branch while a branch append is in flight:
    the retry re-parents the append onto the MOVED head (appends commute),
    so the branch ends with both the moved-to state and the new rows."""
    t = _mk(spark, warehouse, "db.m2", [(1, 10)])
    base_id = t.metadata.current_snapshot().snapshot_id
    t = t.append(spark, spark.createDataFrame([(2, 20)], "k long, v long"))
    second_id = t.metadata.current_snapshot().snapshot_id
    t = t.set_ref("dev", base_id)                      # branch at snap 1
    stale = Table.load(warehouse, "db.m2")
    # B moves dev forward to snap 2
    Table.load(warehouse, "db.m2").set_ref("dev", second_id)
    # A appends to dev from the stale handle
    stale.append(spark, spark.createDataFrame([(3, 30)], "k long, v long"),
                 branch="dev")
    t3 = Table.load(warehouse, "db.m2")
    dev_rows = {tuple(r) for r in
                t3.scan(ref="dev").to_df(spark).select("k", "v").collect()}
    assert dev_rows == {(1, 10), (2, 20), (3, 30)}
    # dev's head parents onto the moved-to snapshot, not the stale base
    head = t3.metadata.snapshot_by_id(t3.metadata.refs["dev"].snapshot_id)
    assert head.parent_snapshot_id == second_id


def test_stale_partitioned_write_vs_spec_removal_conflicts(spark, warehouse):
    """RemovePartitionSpecs (via commit_updates) races a write whose files
    were laid out under the removed spec: committing them would produce
    lineage whose spec-id no longer resolves — must ValidationConflict."""
    t = _mk_partitioned(spark, warehouse, "db.m3",
                        [(1, 0, 10), (2, 1, 20)])
    # evolve to a NEW default spec (unpartitioned), orphaning spec 0…
    t2 = Table.load(warehouse, "db.m3")
    md = t2.metadata
    new_spec = {"spec-id": 1, "fields": []}
    t2 = t2.commit_updates([
        {"action": "add-spec", "spec": new_spec},
        {"action": "set-default-spec", "spec-id": 1},
    ])
    # A captures a handle that still writes under spec 0
    stale = Table.load(warehouse, "db.m3")
    assert stale.metadata.default_spec_id == 1
    # hand-stage the race: files bound to spec 0, spec 0 removed after the
    # old snapshots expire (expire first so remove-partition-specs passes
    # its own in-use guard in a REAL sequence: compact-to-spec1 + expire)
    from iceberg_rust_spark.sources.manifest import DataFile
    captured = DataFile(file_path="/tmp/nonexistent-spec0.parquet",
                        record_count=1, file_size_in_bytes=10,
                        partition={"p": 0}, schema_id=0, spec_id=0)
    Table.load(warehouse, "db.m3").commit_updates(
        [{"action": "remove-partition-specs", "spec-ids": [0]}])
    with pytest.raises(ValidationConflict, match="partition spec 0"):
        stale._commit_retry(lambda m, fs=[captured]: stale._snapshot_update(
            m, "append", added=fs))


def test_stale_append_vs_schema_removal_conflicts(spark, warehouse):
    """remove-schemas drops an old schema id while a writer holds files
    bound to it: the commit must ValidationConflict, not produce files
    whose schema-id no longer resolves."""
    t = _mk(spark, warehouse, "db.m4", [(1, 10)])
    from iceberg_rust_spark.sources.manifest import DataFile
    captured = DataFile(file_path="/tmp/nonexistent-schema0.parquet",
                        record_count=1, file_size_in_bytes=10,
                        schema_id=0, spec_id=0)
    # B evolves the schema, expires the only snapshot written with schema
    # 0, then garbage-collects the schema id
    t2 = Table.load(warehouse, "db.m4").update_schema() \
        .add_column("w", "long").commit()
    t2 = t2.delete_where(spark, E.col("k") >= 0, mode="cow")
    t2 = t2.expire_snapshots(older_than_ms=now_plus_hour(),
                             retain_last=1, clean_expired_metadata=True)
    assert 0 not in {s.schema_id for s in t2.metadata.schemas}
    stale = Table.load(warehouse, "db.m4")
    with pytest.raises(ValidationConflict, match="schema 0"):
        stale._commit_retry(lambda m, fs=[captured]: stale._snapshot_update(
            m, "append", added=fs))


def now_plus_hour():
    import time
    return int(time.time() * 1000) + 3_600_000
