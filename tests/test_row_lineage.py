import pyspark.sql.functions as F
from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.types import schema_from_spark

def test_row_lineage(spark, warehouse):
    df = spark.range(0, 30).select(F.col("id"))
    t = Table.create(warehouse, "db.rl", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("id") < 20))
    t = t.append(spark, df.where(F.col("id") >= 20))
    assert t.metadata.next_row_id == 30
    out = t.scan(include_metadata_columns=True).to_df(spark)
    rows = out.select("id", "_row_id").collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(30))          # dense, unique, stable
    # _row_id survives metadata round-trip
    t2 = Table.load(warehouse, "db.rl")
    ids2 = sorted(r["_row_id"] for r in
                  t2.scan(include_metadata_columns=True).to_df(spark).collect())
    assert ids2 == ids


def test_row_ids_survive_rewrites(spark, warehouse):
    """v3 row lineage across rewrites: compaction, COW delete, and UPDATE
    rewrite files but must keep each surviving row's _row_id (materialized
    `_row_id` column in the rewritten parquet beats first_row_id+position
    inheritance on read)."""
    from iceberg_rust_spark import expr as E

    df = spark.range(0, 40).select(F.col("id"))
    t = Table.create(warehouse, "db.rlrw", schema_from_spark(df.schema))
    # many small files so compaction has work
    t = t.append(spark, df.where(F.col("id") < 20).repartition(4))
    t = t.append(spark, df.where(F.col("id") >= 20).repartition(4))
    before = {r["id"]: r["_row_id"] for r in
              t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert sorted(before.values()) == list(range(40))

    t = t.compact(spark, small_file_bytes=10**9)
    after = {r["id"]: r["_row_id"] for r in
             t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert after == before                       # compaction preserves ids

    t = t.delete_where(spark, E.col("id") < 10, mode="cow")
    after_del = {r["id"]: r["_row_id"] for r in
                 t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert after_del == {k: v for k, v in before.items() if k >= 10}

    t = t.update_where(spark, E.col("id") == 11, {"id": 1001})
    after_upd = {r["id"]: r["_row_id"] for r in
                 t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert after_upd[1001] == before[11]         # updated row keeps its id
    assert after_upd[13] == before[13]


def test_v3_snapshots_carry_row_range(spark, warehouse):
    """v3 snapshots record (first-row-id, added-rows) like the reference's
    SnapshotRowRange (snapshot.rs:76-121, assignment semantics proven by
    table_metadata_builder.rs test_row_lineage_addition): consecutive
    appends get contiguous ranges and the fields survive the metadata
    JSON round-trip; v2 snapshots carry neither."""
    df = spark.range(0, 30).select(F.col("id"))
    t = Table.create(warehouse, "db.rl3", schema_from_spark(df.schema))
    t = t.upgrade_format_version(3)
    t = t.append(spark, df.where(F.col("id") < 20))
    t = t.append(spark, df.where(F.col("id") >= 20))
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.sequence_number)
    assert (snaps[0].first_row_id, snaps[0].added_rows) == (0, 20)
    assert (snaps[1].first_row_id, snaps[1].added_rows) == (20, 10)
    assert t.metadata.next_row_id == 30
    # round-trip through the on-disk metadata JSON
    t2 = Table.load(warehouse, "db.rl3")
    s2 = sorted(t2.metadata.snapshots, key=lambda s: s.sequence_number)
    assert [(s.first_row_id, s.added_rows) for s in s2] == [(0, 20), (20, 10)]

    # v2 table: snapshot row range absent from the JSON
    tv2 = Table.create(warehouse, "db.rl2", schema_from_spark(df.schema))
    tv2 = tv2.append(spark, df)
    assert tv2.metadata.current_snapshot().first_row_id is None
    assert "first-row-id" not in tv2.metadata.current_snapshot().to_json()


def test_last_updated_sequence_number(spark, warehouse):
    """Reserved _last_updated_sequence_number (metadata_columns.rs:62-66):
    rows inherit their data file's sequence number; compaction preserves
    the materialized value; an UPDATE bumps it for changed rows only."""
    from iceberg_rust_spark import expr as E

    df = spark.range(0, 20).select(F.col("id"))
    t = Table.create(warehouse, "db.lusn", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("id") < 10))    # seq 1
    t = t.append(spark, df.where(F.col("id") >= 10))   # seq 2
    seqs = {r["id"]: r["_last_updated_sequence_number"] for r in
            t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert all(v == 1 for k, v in seqs.items() if k < 10)
    assert all(v == 2 for k, v in seqs.items() if k >= 10)

    # compaction rewrites files but rows were NOT updated: values persist
    t = t.compact(spark, small_file_bytes=10**9)
    after = {r["id"]: r["_last_updated_sequence_number"] for r in
             t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert after == seqs

    # UPDATE: the changed row takes the new snapshot's sequence number,
    # untouched rows keep theirs
    t = t.update_where(spark, E.col("id") == 3, {"id": 1003})
    upd_seq = t.metadata.last_sequence_number
    after_upd = {r["id"]: r["_last_updated_sequence_number"] for r in
                 t.scan(include_metadata_columns=True).to_df(spark).collect()}
    assert after_upd[1003] == upd_seq
    assert after_upd[5] == seqs[5]
    assert after_upd[15] == seqs[15]


def test_row_lineage_through_fast_array_plan(spark, warehouse):
    """include_row_lineage WITHOUT metadata columns rides the r11 array
    fast plan (ScanPlan._fast): per-file first_row_id/sequence bases come
    from manifest arrays, no task objects — and must equal the object
    path exactly."""
    from iceberg_rust_spark.sources.scan import TableScan

    df = spark.range(0, 300, 1, 4).select(F.col("id").alias("k"))
    t = Table.create(warehouse, "db.rlf", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.append(spark, df.select((F.col("k") + 1000).alias("k")))

    scan = TableScan(t.metadata, include_row_lineage=True)
    plan = scan.plan_files()
    assert plan._fast is not None and plan._tasks is None
    ids = sorted(r["_row_id"] for r in
                 scan.to_df(spark).select("_row_id").collect())
    assert ids == list(range(600))         # dense, unique, inherited
    # object-path twin (forced through _tasks) must agree exactly
    ids2 = sorted(r["_row_id"] for r in
                  scan.to_df(spark, _tasks=scan.plan_files().tasks)
                  .select("_row_id").collect())
    assert ids2 == ids


def test_row_lineage_through_fast_plan_with_deletes(spark, warehouse):
    """r12: include_row_lineage over a MOR table rides the array fast plan
    WITH bulk-attached deletes — per-file first_row_id bases still apply
    and deleted rows' ids disappear with them (no id reuse)."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark import Table, expr as E
    from iceberg_rust_spark.sources.scan import TableScan
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.range(0, 300).select(F.col("id").alias("k"),
                                    (F.col("id") % 5).alias("v"))
    t = Table.create(warehouse, "db.lineage_mor", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("v") == 2, mode="mor")
    plan = t.scan().plan_files()
    assert plan._fast is not None
    assert any(s is not None for _, _, s in plan._fast)
    out = TableScan(t.metadata, include_row_lineage=True).to_df(spark)
    rows = out.select("k", "_row_id").collect()
    assert len(rows) == 240
    assert len({r["_row_id"] for r in rows}) == 240
    assert all(r["_row_id"] is not None for r in rows)
