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


def test_zorder_rewrite_prunes_both_dimensions(spark, warehouse):
    from iceberg_rust_spark import expr as E
    # two independent-ish dimensions, written in random order across 8 files
    df = (spark.range(0, 40_000)
          .select(F.col("id").alias("a"),
                  ((F.col("id") * 2654435761) % 40_000).alias("b"),
                  F.rand(7).alias("shuffle_key"))
          .repartition(8, "shuffle_key").drop("shuffle_key"))
    t = Table.create(warehouse, "db.zord",
                     schema_from_spark(df.select("a", "b").schema))
    t = t.append(spark, df.select("a", "b"))

    def skipped(table, pred):
        plan = table.scan(row_filter=pred).plan_files()
        return plan.skipped_by_metrics, plan.total_data_files

    pred_a = (E.col("a") >= 1000) & (E.col("a") < 2000)
    pred_b = (E.col("b") >= 1000) & (E.col("b") < 2000)
    sk_a0, n0 = skipped(t, pred_a)
    sk_b0, _ = skipped(t, pred_b)
    assert sk_a0 == 0 and sk_b0 == 0  # random layout: nothing prunable

    t = t.rewrite_zorder(spark, ["a", "b"], n_files=16)
    sk_a1, n1 = skipped(t, pred_a)
    sk_b1, _ = skipped(t, pred_b)
    assert n1 == 16
    # z-order gives BOTH columns file-level locality
    assert sk_a1 >= n1 // 2, f"a-pruning weak: {sk_a1}/{n1}"
    assert sk_b1 >= n1 // 2, f"b-pruning weak: {sk_b1}/{n1}"
    # data intact
    assert t.to_df(spark).count() == 40_000
    got = t.scan(row_filter=pred_a).to_df(spark) \
        .where("a >= 1000 and a < 2000").count()
    assert got == 1000


def test_zorder_rewrite_partitioned_table(spark, warehouse):
    from iceberg_rust_spark import PartitionField, PartitionSpec, expr as E
    from iceberg_rust_spark.functions.transforms import parse_transform
    df = (spark.range(0, 20_000)
          .select((F.col("id") % 4).alias("g"),
                  F.col("id").alias("a"),
                  ((F.col("id") * 2654435761) % 20_000).alias("b"),
                  F.rand(3).alias("sk"))
          .repartition(8, "sk").drop("sk"))
    schema = schema_from_spark(df.schema)
    fid = schema.field_by_name("g").field_id
    spec = PartitionSpec(0, [PartitionField(fid, 1000, "g",
                                            parse_transform("identity"))])
    t = Table.create(warehouse, "db.zordp", schema, spec)
    t = t.append(spark, df)

    t = t.rewrite_zorder(spark, ["a", "b"], n_files=16)
    assert t.to_df(spark).count() == 20_000
    # partition pruning still works after the rewrite
    plan_g = t.scan(row_filter=E.col("g") == 1).plan_files()
    assert plan_g.skipped_by_partition > 0
    # and both z columns prune within the kept files
    pa_ = (E.col("a") >= 1000) & (E.col("a") < 1500)
    pb = (E.col("b") >= 1000) & (E.col("b") < 1500)
    pl_a = t.scan(row_filter=pa_).plan_files()
    pl_b = t.scan(row_filter=pb).plan_files()
    # range-shuffle sampling makes exact file boundaries run-dependent;
    # a 1/16-range predicate must still skip a meaningful share of files
    assert pl_a.skipped_by_metrics >= pl_a.total_data_files // 4
    assert pl_b.skipped_by_metrics >= pl_b.total_data_files // 4
    got = t.scan(row_filter=pa_).to_df(spark) \
        .where("a >= 1000 and a < 1500").count()
    assert got == 500


def test_expire_snapshots_property_defaults(spark, warehouse):
    """history.expire.{max-snapshot-age-ms,min-snapshots-to-keep} drive
    no-arg expire_snapshots (standard Iceberg retention properties)."""
    df = spark.range(0, 10).select(F.col("id"))
    t = Table.create(warehouse, "db.expprops", schema_from_spark(df.schema),
                     properties={
                         "history.expire.max-snapshot-age-ms": "86400000",
                         "history.expire.min-snapshots-to-keep": "3"})
    for lo in range(0, 10, 2):
        t = t.append(spark, df.where((F.col("id") >= lo)
                                     & (F.col("id") < lo + 2)))
    assert len(t.metadata.snapshots) == 5
    # every snapshot is younger than 1 day -> age keeps all of them
    t = t.expire_snapshots()
    assert len(t.metadata.snapshots) == 5
    # explicit now-cutoff overrides the age property; min-keep property holds 3
    from iceberg_rust_spark.sources.metadata import now_ms
    t = t.expire_snapshots(older_than_ms=now_ms() + 1000)
    assert len(t.metadata.snapshots) == 3


def test_expire_honors_per_ref_retention(spark, warehouse):
    """Spec SnapshotRetention: a non-main ref past its max-ref-age-ms is
    dropped; a branch's min-snapshots-to-keep protects its ancestors even
    when globally aged out; main never expires."""
    from iceberg_rust_spark.sources.metadata import now_ms

    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(warehouse, "db.refret", schema_from_spark(df.schema))
    t = t.append(spark, df)                        # s1
    t = t.append(spark, df)                        # s2
    t = t.append(spark, df)                        # s3 (main head)
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    s1, s2, s3 = [s.snapshot_id for s in snaps]

    # an old tag with max-ref-age-ms=0 ages out immediately; a branch on s2
    # with min-snapshots-to-keep=2 protects s2 AND its parent s1
    t = t.set_ref("oldtag", s1, ref_type="tag", max_ref_age_ms=0)
    t = t.set_ref("keeper", s2, ref_type="branch", min_snapshots_to_keep=2)
    t = t.expire_snapshots(older_than_ms=now_ms() + 10**9, retain_last=1)

    assert "oldtag" not in t.metadata.refs          # aged-out ref dropped
    assert "keeper" in t.metadata.refs
    alive = {s.snapshot_id for s in t.metadata.snapshots}
    assert s3 in alive                              # main head
    assert s2 in alive and s1 in alive              # branch min-keep chain

    # without the branch, the same expiry keeps only the head
    t2 = Table.create(warehouse, "db.refret2", schema_from_spark(df.schema))
    t2 = t2.append(spark, df).append(spark, df).append(spark, df)
    t2 = t2.expire_snapshots(older_than_ms=now_ms() + 10**9, retain_last=1)
    assert len(t2.metadata.snapshots) == 1


def test_ref_retention_roundtrips_metadata_and_wire(spark, warehouse):
    """Retention fields survive JSON serde and the REST diff->apply wire."""
    from iceberg_rust_spark.sources.metadata import TableMetadata
    from iceberg_rust_spark.sources.rest import diff_metadata
    from iceberg_rust_spark.sources.updates import apply_updates

    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(warehouse, "db.refwire", schema_from_spark(df.schema))
    t = t.append(spark, df)
    base = t.metadata
    t = t.set_ref("audit", t.metadata.current_snapshot_id,
                  ref_type="branch", min_snapshots_to_keep=3,
                  max_snapshot_age_ms=86400000, max_ref_age_ms=604800000)
    md2 = TableMetadata.from_json(t.metadata.to_json())
    r = md2.refs["audit"]
    assert (r.min_snapshots_to_keep, r.max_snapshot_age_ms,
            r.max_ref_age_ms) == (3, 86400000, 604800000)

    upds = diff_metadata(base, t.metadata)
    replayed = apply_updates(base, upds)
    assert replayed.refs["audit"] == t.metadata.refs["audit"]


def test_rewrite_manifests_merges_without_changing_results(spark, warehouse):
    """r5: manifest compaction is metadata-only — fewer manifests, same
    rows, same time travel, deletes still applied (entries keep original
    sequence numbers)."""
    from iceberg_rust_spark import expr as E
    from iceberg_rust_spark.sources.scan import load_manifest_list
    from iceberg_rust_spark.sources.sql import run_sql

    df = spark.range(0, 60).selectExpr("id", "id % 3 AS g")
    t = Table.create(warehouse, "db.rwm", schema_from_spark(df.schema))
    for k in range(4):                       # 4 appends -> >=4 manifests
        t = t.append(spark, df.where(F.col("id") % 4 == k))
    t = t.delete_where(spark, E.col("g") == 1, mode="mor")
    before_rows = {r["id"] for r in t.to_df(spark).collect()}
    n_manifests = len(load_manifest_list(
        t.metadata.current_snapshot().manifest_list))
    assert n_manifests >= 5                  # 4 data + 1 delete manifest

    out = run_sql(spark, warehouse,
                  "CALL system.rewrite_manifests('db.rwm')").collect()[0]
    assert out["rewritten_manifests_count"] == n_manifests
    assert out["added_manifests_count"] == 2  # one data + one delete group

    t = Table.load(warehouse, "db.rwm")
    assert {r["id"] for r in t.to_df(spark).collect()} == before_rows
    # scan planning (incl. delete application by seq-number) is unchanged
    assert t.to_df(spark).count() == 40
    # old snapshots still readable (time travel intact)
    snaps = t.metadata.snapshots
    assert t.scan(snapshot_id=snaps[-2].snapshot_id).to_df(spark) \
        .count() == 40


def test_rewrite_position_deletes_compacts_and_drops_dangling(spark,
                                                              warehouse):
    """r5: several pos-delete parquet files compact to one; positions
    pointing at data files removed by compaction are dropped."""
    from iceberg_rust_spark import expr as E
    from iceberg_rust_spark.sources.sql import run_sql

    df = spark.range(0, 80).selectExpr("id", "id % 8 AS g")
    t = Table.create(warehouse, "db.rwpd", schema_from_spark(df.schema))
    t = t.append(spark, df)
    for gv in (1, 2, 3):                      # three delete snapshots
        t = t.delete_where(spark, E.col("g") == gv, mode="mor")
    assert t.to_df(spark).count() == 50
    n_before = t.delete_files_df(spark) \
        .where("content = 1 AND file_format <> 'puffin'").count()
    assert n_before >= 3

    out = run_sql(
        spark, warehouse,
        "CALL system.rewrite_position_delete_files('db.rwpd')").collect()[0]
    assert out["rewritten_delete_files_count"] == n_before
    assert out["added_delete_files_count"] < n_before

    t = Table.load(warehouse, "db.rwpd")
    assert t.to_df(spark).count() == 50       # results unchanged
    # position_deletes rows survive the rewrite verbatim
    pos = t.position_deletes_df(spark).count()
    assert pos == 30


def test_convert_equality_deletes_to_positional(spark, warehouse):
    """r5: eq-deletes rewrite to pos-deletes with identical visible rows;
    later appends are unaffected (converted deletes name exact files)."""
    from iceberg_rust_spark.sources.sql import run_sql

    df = spark.range(0, 60).selectExpr("id", "id % 6 AS g")
    t = Table.create(warehouse, "db.cveq", schema_from_spark(df.schema))
    t = t.append(spark, df)
    keys = spark.createDataFrame([(1,), (4,)], "g long")
    t = t.delete_by_equality(spark, keys, ["g"])
    assert t.to_df(spark).count() == 40
    before = {r["id"] for r in t.to_df(spark).collect()}

    out = run_sql(spark, warehouse,
                  "CALL system.convert_equality_deletes('db.cveq')") \
        .collect()[0]
    assert out["converted_equality_files_count"] >= 1
    assert out["position_delete_files_count"] >= 1
    t = Table.load(warehouse, "db.cveq")
    assert t.delete_files_df(spark).where("content = 2").count() == 0
    assert {r["id"] for r in t.to_df(spark).collect()} == before
    # rows appended AFTER conversion with previously-deleted key values
    # stay visible (a pos-delete names files, an eq-delete named values)
    t = t.append(spark, spark.createDataFrame([(100, 1)], "id long, g long"))
    assert t.to_df(spark).where("id = 100").count() == 1
    assert t.to_df(spark).count() == 41


def test_publish_changes_wap_id(spark, warehouse):
    """r5: wap.id staging — the staged snapshot moves no ref until
    publish_changes cherry-picks it by id."""
    import pytest

    from iceberg_rust_spark.sources.sql import run_sql

    df = spark.range(0, 10).selectExpr("id")
    t = Table.create(warehouse, "db.wapid", schema_from_spark(df.schema))
    t = t.append(spark, df)
    base = t.metadata.current_snapshot_id
    t = t.append(spark, spark.range(10, 20).selectExpr("id"),
                 wap_id="audit-123")
    # staged: main unmoved, snapshot present with wap.id in its summary
    assert t.metadata.current_snapshot_id == base
    staged = [s for s in t.metadata.snapshots
              if s.summary.get("wap.id") == "audit-123"]
    assert len(staged) == 1
    assert t.to_df(spark).count() == 10      # reads don't see staged rows

    with pytest.raises(ValueError, match="no staged snapshot"):
        run_sql(spark, warehouse,
                "CALL system.publish_changes('db.wapid', 'nope')")
    out = run_sql(spark, warehouse,
                  "CALL system.publish_changes('db.wapid', 'audit-123')") \
        .collect()[0]
    assert out["current_snapshot_id"] == staged[0].snapshot_id
    t = Table.load(warehouse, "db.wapid")
    assert t.to_df(spark).count() == 20


def test_rewrite_table_path_full_relocation(spark, warehouse, tmp_path):
    """rewrite_table_path stages a path-rewritten metadata tree + a copy
    file list; executing the copies (stand-in for DistCp) yields a fully
    self-consistent table at the TARGET prefix — current reads, pruning,
    deletes, and time travel all work from the relocated tree."""
    import os
    import shutil

    from iceberg_rust_spark import Table, expr as E
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, i % 5, float(i)) for i in range(100)],
                               "id long, g long, v double")
    t = Table.create(warehouse, "db.mv", schema_from_spark(df.schema))
    t = t.append(spark, df)
    first_snap = t.metadata.current_snapshot_id
    t = t.append(spark, df.where("id >= 90"))   # second snapshot (110 rows)
    t = t.delete_where(spark, E.col("id") < 10, mode="mor")  # pos deletes

    target_root = str(tmp_path / "relocated")
    out = run_sql(spark, warehouse,
                  f"CALL system.rewrite_table_path('db.mv', "
                  f"'{warehouse.warehouse}', '{target_root}')").collect()[0]
    assert out["latest_version"].endswith(".metadata.json")

    # stand-in for the bulk copy: execute the emitted file list
    pairs = [line.split(",") for line in
             open(out["file_list_location"]).read().strip().splitlines()]
    assert pairs and all(dst.startswith(target_root) for _, dst in pairs)
    for src, dst in pairs:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)

    relocated = Table.from_metadata_path(
        os.path.join(target_root, "db", "mv", "metadata",
                     out["latest_version"]))
    # nothing in the relocated tree points back at the source
    assert relocated.metadata.location.startswith(target_root)
    got = relocated.to_df(spark)
    assert got.count() == 100  # 110 appended - 10 MOR-deleted
    assert got.agg(F.min("id")).collect()[0][0] == 10
    # every planned file path lives under the target
    for task in relocated.scan().plan_files().tasks:
        assert task.data_file.file_path.startswith(target_root)
    # time travel from the relocated tree
    old = relocated.scan(snapshot_id=first_snap).to_df(spark)
    assert old.count() == 100
    assert old.agg(F.min("id")).collect()[0][0] == 0


def test_rewrite_table_path_with_deletion_vectors(spark, warehouse,
                                                  tmp_path):
    """DV variant: puffin deletion vectors' referenced-data-file blob
    properties rewrite with the tree (blob offsets stay valid), so the
    relocated table still applies its vectors."""
    import os
    import shutil

    from iceberg_rust_spark import Table, expr as E
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, i % 4) for i in range(80)],
                               "id long, g long")
    t = Table.create(warehouse, "db.mvdv", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="dv")  # 20 rows out

    target_root = str(tmp_path / "dv_target")
    out = t.rewrite_table_path(warehouse.warehouse, target_root)
    for line in open(out["file_list_location"]).read().strip().splitlines():
        src, dst = line.split(",")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
    relocated = Table.from_metadata_path(os.path.join(
        target_root, "db", "mvdv", "metadata", out["latest_version"]))
    got = relocated.to_df(spark)
    assert got.count() == 60
    assert got.where("g = 1").count() == 0


def test_remove_dangling_deletes(spark, warehouse):
    """After compaction rewrites data files past the delete sequence
    numbers, the old delete FILES reference nothing: the metadata-only
    sweep drops them; results unchanged; a second run is a no-op."""
    from iceberg_rust_spark import Table, expr as E
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, i % 4) for i in range(80)],
                               "id long, g long")
    t = Table.create(warehouse, "db.dangling", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="mor")
    assert t.to_df(spark).count() == 60

    def n_delete_entries(tb):
        plan = tb.scan().plan_files()
        return len({d.file_path for task in plan.tasks
                    for d in task.pos_deletes + task.eq_deletes})

    assert n_delete_entries(t) >= 1
    t = t.compact(spark)          # rewritten data files outrun the deletes
    assert n_delete_entries(t) == 0  # nothing applies anymore...
    out = run_sql(spark, warehouse,
                  "CALL system.remove_dangling_deletes('db.dangling')")
    assert out.collect()[0]["removed_delete_files_count"] >= 1
    t = Table.load(warehouse, "db.dangling")
    assert t.to_df(spark).count() == 60
    # ...and the manifests carry no delete entries at all now
    from iceberg_rust_spark.sources.scan import load_manifest_list
    assert all(mf.content == 0 for mf in
               load_manifest_list(t.metadata.current_snapshot()
                                  .manifest_list))
    # idempotent
    out2 = run_sql(spark, warehouse,
                   "CALL system.remove_dangling_deletes('db.dangling')")
    assert out2.collect()[0]["removed_delete_files_count"] == 0


def test_expire_snapshots_clean_expired_metadata(spark, warehouse):
    """cleanExpiredMetadata parity: after expiry, schemas no surviving
    snapshot wrote with and specs no surviving manifest references are
    pruned; current schema / default spec always stay."""
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t = Table.create(warehouse, "db.cem", schema_from_spark(df.schema))
    t = t.append(spark, df)                     # schema 0
    run_sql(spark, warehouse, "ALTER TABLE db.cem ADD COLUMN v double")
    t = Table.load(warehouse, "db.cem")
    t = t.append(spark, spark.createDataFrame(
        [(2, "b", 1.5)], "id long, s string, v double"))  # schema 1
    assert len(t.metadata.schemas) == 2

    t = t.expire_snapshots(older_than_ms=2**62, retain_last=1,
                           clean_expired_metadata=True)
    assert len(t.metadata.snapshots) == 1
    assert [s.schema_id for s in t.metadata.schemas] == \
        [t.metadata.current_schema_id]
    assert [p.spec_id for p in t.metadata.partition_specs] == \
        [t.metadata.default_spec_id]
    assert Table.load(warehouse, "db.cem").to_df(spark).count() == 2


def test_rewrite_table_path_avro_manifest_format(spark, warehouse, tmp_path):
    """Regression (r5 advice): the avro branch of rewrite_table_path passed
    a ``format_version`` kwarg that write_avro_manifest_list doesn't take —
    TypeError on any table with write.metadata.manifest-format=avro. It now
    passes ``schema=`` like the other call sites; the relocated avro
    metadata tree reads back end to end."""
    import shutil

    df = spark.range(0, 50).select(F.col("id").alias("k"),
                                   (F.col("id") % 3).alias("g"))
    t = Table.create(warehouse, "db.mvavro", schema_from_spark(df.schema),
                     properties={"write.metadata.manifest-format": "avro"})
    t = t.append(spark, df)

    target_root = str(tmp_path / "avro_target")
    out = t.rewrite_table_path(warehouse.warehouse, target_root)
    for line in open(out["file_list_location"]).read().strip().splitlines():
        src, dst = line.split(",")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
    relocated = Table.from_metadata_path(os.path.join(
        target_root, "db", "mvavro", "metadata", out["latest_version"]))
    snap = relocated.metadata.current_snapshot()
    assert snap.manifest_list.endswith(".avro")
    assert snap.manifest_list.startswith(target_root)
    assert relocated.to_df(spark).count() == 50


def test_rewrite_table_path_leaves_source_table_intact(spark, warehouse,
                                                       tmp_path):
    """Review r10 regression: staging rewrites must DEEP-COPY manifest
    entries — load_manifest hands out the planner cache's own objects,
    and mutating them in place corrupted the SOURCE table's cached
    metadata (scans after a rewrite_table_path planned dst-prefixed
    paths that don't exist yet)."""
    from iceberg_rust_spark import Table, expr as E
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               "id long, v double")
    t = Table.create(warehouse, "db.srcstay", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("id") < 5, mode="mor")

    target_root = str(tmp_path / "reloc2")
    run_sql(spark, warehouse,
            f"CALL system.rewrite_table_path('db.srcstay', "
            f"'{warehouse.warehouse}', '{target_root}')")

    # the SOURCE table must still plan source-prefixed paths and read
    src = Table.load(warehouse, "db.srcstay")
    plan = src.scan().plan_files()
    for task in plan.tasks:
        assert not task.data_file.file_path.startswith(target_root), \
            task.data_file.file_path
        for d in task.pos_deletes:
            assert not d.file_path.startswith(target_root)
    assert src.to_df(spark).count() == 45
