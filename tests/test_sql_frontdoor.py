"""SQL front door (catalog-provider shim) + partition spec evolution."""

import datetime as dt

import pyspark.sql.functions as F

from iceberg_rust_spark import (PartitionField, PartitionSpec, Table,
                                expr as E)
from iceberg_rust_spark.functions.transforms import parse_transform
from iceberg_rust_spark.sources.sql import run_sql
from iceberg_rust_spark.sources.types import schema_from_spark


def test_run_sql_resolves_tables_and_filters(spark, warehouse):
    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(100)],
        "id long, cat string, amount double")
    t = Table.create(warehouse, "db.sales", schema_from_spark(df.schema))
    t.append(spark, df)

    out = run_sql(spark, warehouse,
                  "SELECT cat, count(*) AS n, sum(amount) AS s "
                  "FROM db.sales WHERE id < 10 GROUP BY cat ORDER BY cat")
    rows = [(r["cat"], r["n"]) for r in out.collect()]
    assert rows == [("c0", 4), ("c1", 3), ("c2", 3)]

    # scan_filters pushes file-level pruning; SQL WHERE still re-applies
    out2 = run_sql(spark, warehouse,
                   "SELECT count(*) AS n FROM db.sales WHERE id < 10",
                   scan_filters={"db.sales": E.col("id") < 10})
    assert out2.collect()[0]["n"] == 10


def test_run_sql_joins_two_tables(spark, warehouse):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, w double")
    Table.create(warehouse, "db.ta", schema_from_spark(a.schema)).append(spark, a)
    Table.create(warehouse, "db.tb", schema_from_spark(b.schema)).append(spark, b)
    out = run_sql(spark, warehouse,
                  "SELECT ta.v, tb.w FROM db.ta ta JOIN db.tb tb ON ta.k = tb.k "
                  "ORDER BY ta.v")
    assert [(r["v"], r["w"]) for r in out.collect()] == [("x", 10.0), ("y", 20.0)]


def test_partition_spec_evolution_end_to_end(spark, warehouse):
    """Write under month(ts) spec, evolve to identity(cat), write again;
    scans prune correctly across both specs and values stay correct."""
    rows = [(i, dt.datetime(2024, 1 + (i % 3), 5), f"c{i % 2}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, cat string")
    schema = schema_from_spark(df.schema)
    spec_a = PartitionSpec(0, [PartitionField(
        schema.field_by_name("ts").field_id, 1000, "ts_month",
        parse_transform("month"))])
    t = Table.create(warehouse, "db.evo", schema, spec_a)
    t = t.append(spark, df.where(F.col("id") < 30))

    spec_b = PartitionSpec(1, [PartitionField(
        schema.field_by_name("cat").field_id, 1001, "cat",
        parse_transform("identity"))])
    t = t.commit_updates(updates=[
        {"action": "add-spec", "spec": spec_b},
        {"action": "set-default-spec", "spec-id": -1},
    ])
    assert t.metadata.default_spec_id == 1
    t = t.append(spark, df.where(F.col("id") >= 30))

    # full read across both specs
    assert t.to_df(spark).count() == 60

    # time-based predicate prunes spec-A files (month transform)
    scan = t.scan(row_filter=E.col("ts") >= dt.datetime(2024, 3, 1))
    plan = scan.plan_files()
    assert plan.skipped_by_partition > 0
    got = scan.to_df(spark).count()
    want = df.where(F.col("ts") >= dt.datetime(2024, 3, 1)).count()
    assert got == want

    # category predicate prunes spec-B files (identity transform)
    scan2 = t.scan(row_filter=E.col("cat") == "c0")
    got2 = scan2.to_df(spark).count()
    want2 = df.where(F.col("cat") == "c0").count()
    assert got2 == want2


def test_run_sql_metadata_tables(spark, warehouse):
    df = spark.createDataFrame([(i, i % 4) for i in range(40)],
                               "id long, g long")
    t = Table.create(warehouse, "db.mt", schema_from_spark(df.schema))
    t = t.append(spark, df).append(spark, df)

    snaps = run_sql(spark, warehouse,
                    "SELECT count(*) AS n FROM db.mt.snapshots").collect()
    assert snaps[0]["n"] == 2
    # metadata table joined against the data table in one statement
    out = run_sql(spark, warehouse, """
        SELECT s.snapshot_id, d.total
        FROM (SELECT max(snapshot_id) AS snapshot_id FROM db.mt.snapshots) s
        CROSS JOIN (SELECT count(*) AS total FROM db.mt) d""").collect()
    assert out[0]["total"] == 80
    files = run_sql(spark, warehouse,
                    "SELECT sum(record_count) AS rc FROM db.mt.files").collect()
    assert files[0]["rc"] == 80
    refs = run_sql(spark, warehouse,
                   "SELECT name, type FROM db.mt.refs").collect()
    assert [(r["name"], r["type"]) for r in refs] == [("main", "branch")]


def test_run_sql_insert_into_and_ctas(spark, warehouse):
    df = spark.createDataFrame([(i, i % 3, float(i)) for i in range(60)],
                               "id long, g long, v double")
    Table.create(warehouse, "db.sqldml",
                 schema_from_spark(df.schema)).append(spark, df)

    # CTAS from a query over the iceberg table
    run_sql(spark, warehouse, """
        CREATE TABLE db.sqlagg AS
        SELECT g, count(*) AS n, sum(v) AS sum_v FROM db.sqldml GROUP BY g""")
    t = Table.load(warehouse, "db.sqlagg")
    assert {(r["g"], r["n"]) for r in t.to_df(spark).collect()} == \
        {(0, 20), (1, 20), (2, 20)}

    # INSERT INTO appends one snapshot
    run_sql(spark, warehouse, """
        INSERT INTO db.sqlagg
        SELECT g + 100 AS g, count(*) AS n, sum(v) AS sum_v
        FROM db.sqldml GROUP BY g""")
    t = t.refresh()
    assert t.to_df(spark).count() == 6
    assert len(t.metadata.snapshots) == 2
    got = run_sql(spark, warehouse,
                  "SELECT count(*) AS n FROM db.sqlagg WHERE g >= 100") \
        .collect()[0]["n"]
    assert got == 3


def test_sql_predicate_parser_roundtrip(spark):
    import datetime as _dt
    from iceberg_rust_spark.plans.sql_pred import sql_to_predicate
    p = sql_to_predicate(
        "a > 5 AND (b = 'x''y' OR c IN (1, 2, 3)) AND d IS NOT NULL "
        "AND e BETWEEN 1.5 AND 2.5 AND f LIKE 'pre%' "
        "AND ts >= TIMESTAMP '2024-01-02T03:04:05' AND NOT g < 0")
    s = repr(p)
    assert "starts_with" in s or "pre" in s
    ts = sql_to_predicate("ts >= TIMESTAMP '2024-01-02T03:04:05'")
    # unsupported constructs raise (fail-safe), never mis-parse
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sql_to_predicate("a LIKE '%infix%'")
    with _pytest.raises(ValueError):
        sql_to_predicate("lower(a) = 'x'")


def test_run_sql_delete_from(spark, warehouse):
    df = spark.createDataFrame([(i, "keep" if i % 3 else "drop", float(i))
                                for i in range(90)],
                               "id long, tag string, v double")
    Table.create(warehouse, "db.sqldel",
                 schema_from_spark(df.schema)).append(spark, df)
    out = run_sql(spark, warehouse,
                  "DELETE FROM db.sqldel WHERE tag = 'drop' AND id < 60")
    assert out.collect()[0]["deleted_rows"] == 20
    t = Table.load(warehouse, "db.sqldel")
    left = t.to_df(spark)
    assert left.count() == 70
    assert left.where("tag = 'drop' and id < 60").count() == 0
    assert left.where("tag = 'drop'").count() == 10  # ids 60..89 %3==0


def test_auto_scan_filter_extraction(spark, warehouse):
    import datetime as _dt
    from iceberg_rust_spark.sources.sql import _auto_scan_filters
    got = _auto_scan_filters(
        "SELECT a, count(*) FROM db.t WHERE a > 5 AND b = 'x' GROUP BY a")
    assert set(got) == {"db.t"}
    # joins now capture per-alias conjuncts (see the join tests below)
    jg = _auto_scan_filters(
        "SELECT * FROM db.a a JOIN db.b b ON a.k = b.k WHERE a.x > 1")
    assert set(jg) == {"db.a"}
    assert _auto_scan_filters(
        "SELECT * FROM db.t WHERE lower(a) = 'x'") == {}  # unparsable -> skip

    # end-to-end: partitioned table, WHERE prunes files yet results are exact
    df = spark.createDataFrame(
        [(i, _dt.datetime(2024, 1 + i % 6, 1), float(i)) for i in range(600)],
        "id long, d timestamp, v double")
    schema = schema_from_spark(df.schema)
    fid = schema.field_by_name("d").field_id
    spec = PartitionSpec(0, [PartitionField(fid, 1000, "d_month",
                                            parse_transform("month"))])
    Table.create(warehouse, "db.sqlprune", schema, spec).append(spark, df)
    out = run_sql(spark, warehouse, """
        SELECT count(*) AS n FROM db.sqlprune
        WHERE d >= TIMESTAMP '2024-03-01' AND d < TIMESTAMP '2024-04-01'""")
    assert out.collect()[0]["n"] == 100


def test_update_where_and_sql_update(spark, warehouse):
    from iceberg_rust_spark import expr as E2
    df = spark.createDataFrame([(i, "open" if i % 2 else "closed", float(i))
                                for i in range(80)],
                               "id long, status string, v double")
    t = Table.create(warehouse, "db.upd", schema_from_spark(df.schema))
    t = t.append(spark, df)

    # programmatic UPDATE: files without matches are not rewritten
    t = t.update_where(spark, E2.col("id") < 10,
                       {"status": "'archived'", "v": "v * 100"})
    got = {r["id"]: (r["status"], r["v"]) for r in t.to_df(spark).collect()}
    assert got[3] == ("archived", 300.0)
    assert got[50] == ("closed", 50.0)
    assert len(got) == 80

    # SQL UPDATE via the front door
    out = run_sql(spark, warehouse,
                  "UPDATE db.upd SET v = v + 0.5 WHERE status = 'archived'")
    assert out.collect()[0]["updated_rows"] == 10
    t = t.refresh()
    assert t.to_df(spark).where("id = 3").collect()[0]["v"] == 300.5
    # snapshot history preserved (time travel to pre-update)
    first = t.metadata.snapshots[0].snapshot_id
    old = t.scan(snapshot_id=first).to_df(spark)
    assert old.where("id = 3").collect()[0]["status"] == "open"


def test_run_sql_merge_into(spark, warehouse):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)],
                               "id long, name string")
    Table.create(warehouse, "db.sqlmerge",
                 schema_from_spark(df.schema)).append(spark, df)
    run_sql(spark, warehouse, """
        MERGE INTO db.sqlmerge USING (
          SELECT id, 'MERGED' AS name FROM db.sqlmerge WHERE id < 3
        ) ON id""")
    t = Table.load(warehouse, "db.sqlmerge")
    got = {r["id"]: r["name"] for r in t.to_df(spark).collect()}
    assert len(got) == 20
    assert got[1] == "MERGED" and got[10] == "v10"


def test_insert_overwrite_and_truncate(spark, warehouse):
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("g"))
    t = Table.create(warehouse, "db.sql_ow", schema_from_spark(df.schema))
    t.append(spark, df)
    run_sql(spark, warehouse,
            "INSERT OVERWRITE db.sql_ow SELECT id + 100 AS id, g FROM db.sql_ow")
    t = t.refresh()
    got = t.to_df(spark)
    assert got.count() == 10
    assert got.agg(F.min("id")).collect()[0][0] == 100
    # previous contents still time-travelable (overwrite = one new snapshot)
    first = t.metadata.snapshots[0].snapshot_id
    assert t.to_df(spark, snapshot_id=first).agg(F.min("id")).collect()[0][0] == 0
    out = run_sql(spark, warehouse, "TRUNCATE TABLE db.sql_ow")
    assert out.collect()[0][0] == 10
    assert t.refresh().to_df(spark).count() == 0


def test_create_drop_show_tables_sql(spark, warehouse):
    out = run_sql(spark, warehouse, """
        CREATE TABLE db.ddl_t (id BIGINT, cat STRING, ts TIMESTAMP_NTZ)
        PARTITIONED BY (month(ts), bucket(4, id))""")
    assert out.collect()[0]["created"]
    t = Table.load(warehouse, "db.ddl_t")
    spec = t.metadata.spec()
    assert [repr(f.transform) for f in spec.fields] == ["month", "bucket[4]"]
    # IF NOT EXISTS is a no-op on an existing table
    out = run_sql(spark, warehouse,
                  "CREATE TABLE IF NOT EXISTS db.ddl_t (id BIGINT)")
    assert not out.collect()[0]["created"]
    # write through SQL, list it, drop it
    run_sql(spark, warehouse, "INSERT INTO db.ddl_t SELECT CAST(7 AS BIGINT)"
            " AS id, 'a' AS cat, TIMESTAMP_NTZ '2024-03-05 00:00:00' AS ts")
    shown = {(r["namespace"], r["tableName"])
             for r in run_sql(spark, warehouse, "SHOW TABLES IN db").collect()}
    assert ("db", "ddl_t") in shown
    out = run_sql(spark, warehouse, "DROP TABLE db.ddl_t")
    assert out.collect()[0]["dropped"]
    assert not run_sql(spark, warehouse,
                       "DROP TABLE IF EXISTS db.ddl_t").collect()[0]["dropped"]
    import pytest
    from iceberg_rust_spark.sources.catalog import NoSuchTable
    with pytest.raises(NoSuchTable):
        run_sql(spark, warehouse, "DROP TABLE db.ddl_t")


def test_sql_time_travel(spark, warehouse):
    df = spark.range(5).select(F.col("id"))
    t = Table.create(warehouse, "db.tt_sql", schema_from_spark(df.schema))
    t = t.append(spark, df)
    v1 = t.metadata.current_snapshot_id
    t = t.append(spark, spark.range(100, 103).select(F.col("id")))
    n_now = run_sql(spark, warehouse,
                    "SELECT COUNT(*) AS n FROM db.tt_sql").collect()[0]["n"]
    n_v1 = run_sql(spark, warehouse,
                   f"SELECT COUNT(*) AS n FROM db.tt_sql FOR VERSION AS OF {v1}"
                   ).collect()[0]["n"]
    assert (n_now, n_v1) == (8, 5)
    ts = t.metadata.snapshot_by_id(v1).timestamp_ms
    import datetime as dt
    iso = dt.datetime.fromtimestamp(ts / 1000, dt.timezone.utc) \
        .strftime("%Y-%m-%d %H:%M:%S.%f")
    n_ts = run_sql(spark, warehouse,
                   f"SELECT COUNT(*) AS n FROM db.tt_sql FOR TIMESTAMP AS OF '{iso}'"
                   ).collect()[0]["n"]
    assert n_ts == 5


def test_alter_table_schema_evolution_sql(spark, warehouse):
    """ALTER TABLE ADD/RENAME/ALTER/DROP COLUMN drive SchemaUpdate; data
    written before the evolution reads back under the new schema."""
    df = spark.createDataFrame([(1, "a", 5), (2, "b", 7)],
                               "id long, name string, qty int")
    Table.create(warehouse, "db.alt", schema_from_spark(df.schema)) \
        .append(spark, df)

    run_sql(spark, warehouse,
            "ALTER TABLE db.alt ADD COLUMN region varchar DEFAULT 'emea'")
    run_sql(spark, warehouse, "ALTER TABLE db.alt RENAME COLUMN name TO label")
    run_sql(spark, warehouse, "ALTER TABLE db.alt ALTER COLUMN qty TYPE bigint")
    got = run_sql(spark, warehouse,
                  "SELECT id, label, qty, region FROM db.alt ORDER BY id")
    assert dict(got.dtypes)["qty"] == "bigint"
    assert [tuple(r) for r in got.collect()] == [
        (1, "a", 5, "emea"), (2, "b", 7, "emea")]

    # new writes carry the evolved schema; old column name is gone
    run_sql(spark, warehouse,
            "INSERT INTO db.alt SELECT 3 AS id, 'c' AS label, "
            "CAST(9 AS BIGINT) AS qty, 'apac' AS region")
    run_sql(spark, warehouse, "ALTER TABLE db.alt DROP COLUMN label")
    t = Table.load(warehouse, "db.alt")
    cols = [f.name for f in t.metadata.schema().fields]
    assert cols == ["id", "qty", "region"]
    rows = sorted(tuple(r) for r in t.to_df(spark).collect())
    assert rows == [(1, 5, "emea"), (2, 7, "emea"), (3, 9, "apac")]


def test_alter_table_partition_and_properties_sql(spark, warehouse):
    """ADD/DROP PARTITION FIELD evolve the default spec through SQL;
    SET TBLPROPERTIES lands in table metadata."""
    rows = [(i, dt.datetime(2024, 1 + (i % 3), 5), f"c{i % 2}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, cat string")
    t = Table.create(warehouse, "db.pevo", schema_from_spark(df.schema))
    t.append(spark, df.where(F.col("id") < 20))

    run_sql(spark, warehouse, "ALTER TABLE db.pevo ADD PARTITION FIELD month(ts)")
    t = Table.load(warehouse, "db.pevo")
    assert [f.name for f in t.metadata.spec().fields] == ["ts_month"]
    assert t.metadata.default_spec_id == 1
    t.append(spark, df.where(F.col("id") >= 20))

    # reads span both specs; month predicate prunes the partitioned files
    assert t.to_df(spark).count() == 40
    plan = t.scan(row_filter=E.col("ts") >= dt.datetime(2024, 3, 1)).plan_files()
    assert plan.skipped_by_partition > 0

    run_sql(spark, warehouse, "ALTER TABLE db.pevo DROP PARTITION FIELD ts_month")
    t = Table.load(warehouse, "db.pevo")
    assert t.metadata.spec().is_unpartitioned

    run_sql(spark, warehouse,
            "ALTER TABLE db.pevo SET TBLPROPERTIES ("
            "'write.target-file-size-bytes'='1048576', 'owner'='pipeline')")
    t = Table.load(warehouse, "db.pevo")
    assert t.metadata.properties["owner"] == "pipeline"
    assert t.metadata.properties["write.target-file-size-bytes"] == "1048576"


def test_call_system_procedures(spark, warehouse):
    """CALL system.* maintenance procedures (Spark-Iceberg procedure
    surface over our Table maintenance actions)."""
    df = spark.createDataFrame([(i, i % 5) for i in range(200)],
                               "id long, g long")
    t = Table.create(warehouse, "db.maint", schema_from_spark(df.schema))
    # several small appends -> compactable
    for lo in range(0, 200, 50):
        t = t.append(spark, df.where((F.col("id") >= lo)
                                     & (F.col("id") < lo + 50)))
    first_snap = t.metadata.snapshots[0].snapshot_id

    out = run_sql(spark, warehouse,
                  "CALL system.rewrite_data_files('db.maint')").collect()[0]
    assert out["rewritten_data_files_count"] >= out["added_data_files_count"]
    t = Table.load(warehouse, "db.maint")
    assert t.to_df(spark).count() == 200

    out = run_sql(spark, warehouse,
                  "CALL system.rewrite_data_files('db.maint', 'zorder(id,g)')"
                  ).collect()[0]
    assert out["added_data_files_count"] >= 1

    # rollback via procedure, then roll forward again
    cur = Table.load(warehouse, "db.maint").metadata.current_snapshot_id
    out = run_sql(spark, warehouse,
                  f"CALL system.rollback_to_snapshot('db.maint', {first_snap})"
                  ).collect()[0]
    assert out["current_snapshot_id"] == first_snap
    assert Table.load(warehouse, "db.maint").to_df(spark).count() == 50
    run_sql(spark, warehouse,
            f"CALL system.set_current_snapshot('db.maint', {cur})")

    out = run_sql(spark, warehouse,
                  "CALL system.expire_snapshots('db.maint')").collect()[0]
    assert out["deleted_snapshots_count"] >= 0
    out = run_sql(spark, warehouse,
                  "CALL system.remove_orphan_files('db.maint')").collect()[0]
    assert out["orphan_file_count"] >= 0
    t = Table.load(warehouse, "db.maint")
    assert t.to_df(spark).count() == 200

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown procedure"):
        run_sql(spark, warehouse, "CALL system.nope('db.maint')")


def test_all_metadata_tables(spark, warehouse):
    """all_manifests / all_files / all_entries inspect tables: cross-
    snapshot metadata addressable from SQL."""
    df = spark.range(0, 30).select(F.col("id"))
    t = Table.create(warehouse, "db.allmeta", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("id") < 15))
    t = t.append(spark, df.where(F.col("id") >= 15))

    am = run_sql(spark, warehouse,
                 "SELECT * FROM db.allmeta.all_manifests").collect()
    assert {r["snapshot_id"] for r in am} == \
        {s.snapshot_id for s in t.metadata.snapshots}
    n_live = t.files_df(spark).count()
    af = run_sql(spark, warehouse,
                 "SELECT count(*) AS n FROM db.allmeta.all_files"
                 ).collect()[0]["n"]
    # nothing was removed: cross-snapshot dedup >= the live scan set (the
    # scan may additionally skip zero-row files the metadata still lists)
    distinct_paths = run_sql(
        spark, warehouse,
        "SELECT count(DISTINCT file_path) AS n FROM db.allmeta.all_entries"
        ).collect()[0]["n"]
    assert af == distinct_paths >= n_live
    ae = run_sql(spark, warehouse,
                 "SELECT as_of_snapshot_id, count(*) AS n "
                 "FROM db.allmeta.all_entries GROUP BY 1").collect()
    # snapshot 2 carries snapshot 1's files forward plus its own; snapshot
    # ids are random so compare the count MULTISET, not id order
    counts = sorted(r["n"] for r in ae)
    assert len(counts) == 2 and counts[1] == n_live
    assert counts[0] < counts[1]


def test_version_as_of_branch_name(spark, warehouse):
    """FOR VERSION AS OF '<ref>' resolves branch/tag names (Spark-Iceberg
    semantics), alongside numeric snapshot ids."""
    df = spark.range(0, 10).select(F.col("id"))
    t = Table.create(warehouse, "db.reft", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.append(spark, df.select((F.col("id") + 100).alias("id")),
                 branch="audit")
    t.refresh()

    main_n = run_sql(spark, warehouse,
                     "SELECT count(*) AS n FROM db.reft").collect()[0]["n"]
    br_n = run_sql(spark, warehouse,
                   "SELECT count(*) AS n FROM db.reft "
                   "FOR VERSION AS OF 'audit'").collect()[0]["n"]
    assert main_n == 10 and br_n == 20
    first = t.metadata.snapshots[0].snapshot_id
    n0 = run_sql(spark, warehouse,
                 f"SELECT count(*) AS n FROM db.reft "
                 f"FOR VERSION AS OF {first}").collect()[0]["n"]
    assert n0 == 10


def test_files_table_carries_column_stats(spark, warehouse):
    df = spark.range(0, 50).select(F.col("id"), (F.col("id") % 5).alias("g"))
    t = Table.create(warehouse, "db.fstats", schema_from_spark(df.schema))
    t = t.append(spark, df)
    rows = run_sql(spark, warehouse,
                   "SELECT file_path, value_counts, lower_bounds, "
                   "upper_bounds FROM db.fstats.files").collect()
    assert rows
    total = sum(r["value_counts"]["id"] for r in rows)
    assert total == 50
    los = [int(r["lower_bounds"]["id"]) for r in rows]
    his = [int(r["upper_bounds"]["id"]) for r in rows]
    assert min(los) == 0 and max(his) == 49
    # readable_metrics (Spark files-table parity): per-column struct view
    rm_rows = run_sql(spark, warehouse,
                      "SELECT readable_metrics FROM db.fstats.files") \
        .collect()
    rms = [r["readable_metrics"]["id"] for r in rm_rows]
    assert sum(m["value_count"] for m in rms) == 50
    assert min(int(m["lower_bound"]) for m in rms) == 0
    assert max(int(m["upper_bound"]) for m in rms) == 49
    assert all(m["null_value_count"] == 0 for m in rms)


def test_sql_view_ddl_and_add_files(spark, warehouse, tmp_path):
    """CREATE [OR REPLACE] VIEW / DROP VIEW through run_sql, plus the
    CALL system.add_files import procedure."""
    import pytest as _pytest

    df = spark.createDataFrame([(i, i * 2) for i in range(20)],
                               "id long, v long")
    t = Table.create(warehouse, "db.vsrc", schema_from_spark(df.schema))
    t = t.append(spark, df)

    run_sql(spark, warehouse,
            "CREATE VIEW db.big_v AS SELECT id, v FROM vsrc WHERE v >= 20")
    out = run_sql(spark, warehouse, "SELECT count(*) AS n FROM db.big_v")
    assert out.collect()[0]["n"] == 10
    with _pytest.raises(ValueError, match="exists"):
        run_sql(spark, warehouse, "CREATE VIEW db.big_v AS SELECT 1 AS x")
    run_sql(spark, warehouse,
            "CREATE OR REPLACE VIEW db.big_v AS "
            "SELECT id FROM vsrc WHERE v >= 30")
    assert run_sql(spark, warehouse,
                   "SELECT count(*) AS n FROM db.big_v").collect()[0]["n"] == 5
    run_sql(spark, warehouse, "DROP VIEW db.big_v")
    run_sql(spark, warehouse, "DROP VIEW IF EXISTS db.big_v")

    # add_files: import loose parquet by glob, no rewrite
    ext = str(tmp_path / "ext")
    spark.createDataFrame([(100 + i, i) for i in range(7)],
                          "id long, v long").coalesce(1) \
        .write.parquet(ext)
    out = run_sql(spark, warehouse,
                  f"CALL system.add_files('db.vsrc', '{ext}/*.parquet')"
                  ).collect()[0]
    assert out["added_files_count"] >= 1
    assert Table.load(warehouse, "db.vsrc").to_df(spark).count() == 27


def test_describe_show_create_and_branch_ddl(spark, warehouse):
    """DESCRIBE / SHOW CREATE TABLE / ALTER TABLE CREATE|DROP BRANCH/TAG."""
    import datetime as dt

    import pytest as _pytest

    from iceberg_rust_spark import PartitionField, PartitionSpec
    from iceberg_rust_spark.functions.transforms import parse_transform

    df = spark.createDataFrame(
        [(1, "x", dt.datetime(2024, 1, 1))], "id long, s string, ts timestamp")
    sch = schema_from_spark(df.schema)
    spec = PartitionSpec(0, [PartitionField(
        sch.field_by_name("ts").field_id, 1000, "ts_month",
        parse_transform("month"))])
    t = Table.create(warehouse, "db.ddlinfo", sch, spec,
                     properties={"write.target-file-size-bytes": "1048576"})
    t = t.append(spark, df)

    desc = {r["col_name"]: r for r in
            run_sql(spark, warehouse, "DESCRIBE db.ddlinfo").collect()}
    assert desc["id"]["data_type"] == "long"
    assert desc["ts"]["partition_transform"] == "month"
    assert desc["s"]["partition_transform"] is None

    ddl = run_sql(spark, warehouse, "SHOW CREATE TABLE db.ddlinfo") \
        .collect()[0]["createtab_stmt"]
    assert "PARTITIONED BY (month(ts))" in ddl
    assert "'write.target-file-size-bytes' = '1048576'" in ddl

    run_sql(spark, warehouse, "ALTER TABLE db.ddlinfo CREATE BRANCH audit")
    snap = t.refresh().metadata.current_snapshot_id
    run_sql(spark, warehouse,
            f"ALTER TABLE db.ddlinfo CREATE TAG v1 AS OF VERSION {snap}")
    t = Table.load(warehouse, "db.ddlinfo")
    assert t.metadata.refs["audit"].type == "branch"
    assert t.metadata.refs["v1"].type == "tag"
    # branch readable through the ref-name time travel
    n = run_sql(spark, warehouse,
                "SELECT count(*) AS n FROM db.ddlinfo "
                "FOR VERSION AS OF 'audit'").collect()[0]["n"]
    assert n == 1
    run_sql(spark, warehouse, "ALTER TABLE db.ddlinfo DROP TAG v1")
    assert "v1" not in Table.load(warehouse, "db.ddlinfo").metadata.refs
    with _pytest.raises(ValueError, match="no tag"):
        run_sql(spark, warehouse, "ALTER TABLE db.ddlinfo DROP TAG nope")


def test_merge_with_when_clauses(spark, warehouse):
    """Full-clause MERGE: conditional DELETE, conditional UPDATE with
    source-referencing assignments, NOT MATCHED INSERT * — first match
    wins, one snapshot."""
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id long, k string, v long")
    t = Table.create(warehouse, "db.mw", schema_from_spark(base.schema))
    t = t.append(spark, base)
    # source: id1 flagged for delete (v<0), id2 update, id9 new, id3 update
    src = spark.createDataFrame(
        [(1, "x", -1), (2, "B", 200), (3, "C", 300), (9, "n", 90)],
        "id long, k string, v long")
    src.createOrReplaceTempView("mw_src")

    out = run_sql(spark, warehouse, """
        MERGE INTO db.mw AS t USING (SELECT * FROM mw_src) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v + t.v
        WHEN NOT MATCHED THEN INSERT *""").collect()[0]
    assert out["touched_keys"] == 3   # ids 1 (delete), 2, 3 (update)

    got = {r["id"]: (r["k"], r["v"]) for r in
           Table.load(warehouse, "db.mw").to_df(spark).collect()}
    assert got == {2: ("B", 220), 3: ("C", 330),
                   4: ("d", 40), 9: ("n", 90)}   # 1 deleted, 4 untouched

    # snapshot count: exactly one commit for the whole MERGE
    assert len(Table.load(warehouse, "db.mw").metadata.snapshots) == 2


def test_merge_not_matched_by_source(spark, warehouse):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: full-sync MERGE removes
    target rows absent from the source."""
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, v long")
    t = Table.create(warehouse, "db.msync", schema_from_spark(base.schema))
    t = t.append(spark, base)
    spark.createDataFrame([(2, 200), (4, 40)], "id long, v long") \
        .createOrReplaceTempView("msync_src")

    run_sql(spark, warehouse, """
        MERGE INTO db.msync AS t USING (SELECT * FROM msync_src) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    got = {r["id"]: r["v"] for r in
           Table.load(warehouse, "db.msync").to_df(spark).collect()}
    assert got == {2: 200, 4: 40}  # 1 and 3 deleted, 2 updated, 4 inserted


def test_delete_and_update_without_where(spark, warehouse):
    df = spark.createDataFrame([(i, i * 2) for i in range(10)],
                               "id long, v long")
    t = Table.create(warehouse, "db.nowhere", schema_from_spark(df.schema))
    t = t.append(spark, df)
    out = run_sql(spark, warehouse,
                  "UPDATE db.nowhere SET v = v + 1").collect()[0]
    assert out["updated_rows"] == 10
    got = {r["id"]: r["v"] for r in
           Table.load(warehouse, "db.nowhere").to_df(spark).collect()}
    assert got == {i: i * 2 + 1 for i in range(10)}
    out = run_sql(spark, warehouse, "DELETE FROM db.nowhere").collect()[0]
    assert out["deleted_rows"] == 10
    assert Table.load(warehouse, "db.nowhere").to_df(spark).count() == 0


def test_merge_cardinality_violation(spark, warehouse):
    import pytest as _pytest
    base = spark.createDataFrame([(1, 10)], "id long, v long")
    t = Table.create(warehouse, "db.mcard", schema_from_spark(base.schema))
    t.append(spark, base)
    spark.createDataFrame([(1, 1), (1, 2)], "id long, v long") \
        .createOrReplaceTempView("mcard_src")
    with _pytest.raises(ValueError, match="cardinality"):
        run_sql(spark, warehouse, """
            MERGE INTO db.mcard AS t USING (SELECT * FROM mcard_src) AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v""")


def test_merge_duplicate_source_keys_ok_when_unmatched_or_insert_only(
        spark, warehouse):
    """Cardinality guard only fires when duplicated source keys actually
    match a target row AND a WHEN MATCHED clause exists (Spark semantics) —
    not on any duplicate in the raw source."""
    base = spark.createDataFrame([(1, 10)], "id long, v long")
    t = Table.create(warehouse, "db.mcard2", schema_from_spark(base.schema))
    t.append(spark, base)
    # duplicates on id=2 match NO target row: valid, both insert
    spark.createDataFrame([(2, 1), (2, 2)], "id long, v long") \
        .createOrReplaceTempView("mcard2_src")
    run_sql(spark, warehouse, """
        MERGE INTO db.mcard2 AS t USING (SELECT * FROM mcard2_src) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *""")
    assert Table.load(warehouse, "db.mcard2").to_df(spark).count() == 3

    # insert-only MERGE: duplicates that DO match a target row are still
    # valid (nothing is updated) and are not inserted
    spark.createDataFrame([(1, 7), (1, 8)], "id long, v long") \
        .createOrReplaceTempView("mcard3_src")
    run_sql(spark, warehouse, """
        MERGE INTO db.mcard2 AS t USING (SELECT * FROM mcard3_src) AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT *""")
    got = Table.load(warehouse, "db.mcard2").to_df(spark)
    assert got.count() == 3
    assert got.where("id = 1").collect()[0]["v"] == 10  # untouched


def test_describe_falls_through_to_spark_for_views(spark, warehouse):
    """DESCRIBE on a temp view (not an Iceberg table) defers to spark.sql
    instead of raising NoSuchTable."""
    spark.createDataFrame([(1, "a")], "x long, s string") \
        .createOrReplaceTempView("dsc_tmp")
    out = run_sql(spark, warehouse, "DESCRIBE dsc_tmp")
    names = {r["col_name"] for r in out.collect()}
    assert {"x", "s"} <= names
    # SHOW CREATE on a temp view falls through too: Spark raises its own
    # (accurate) AnalysisException, not our NoSuchTable
    from pyspark.errors.exceptions.captured import AnalysisException
    import pytest as _pytest
    with _pytest.raises(AnalysisException):
        run_sql(spark, warehouse, "SHOW CREATE TABLE dsc_tmp")


def test_auto_scan_filters_join_capture():
    """Per-alias WHERE conjuncts on an inner join map to per-table
    predicates; outer joins, subqueries and cross-table conjuncts are
    conservatively skipped."""
    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    got = _auto_scan_filters("""
        SELECT * FROM db.lineitem l JOIN db.orders o
        ON l.l_orderkey = o.o_orderkey
        WHERE l.l_ship >= 5 AND o.o_total > 100 AND l.l_qty < 3
          AND l.l_orderkey = o.o_orderkey""")
    assert set(got) == {"db.lineitem", "db.orders"}
    assert "l_ship gt_eq 5" in repr(got["db.lineitem"])
    assert "l_qty lt 3" in repr(got["db.lineitem"])
    assert "o_total gt 100" in repr(got["db.orders"])
    # outer join: no capture (IS NULL on the null side isn't prunable)
    assert _auto_scan_filters(
        "SELECT * FROM a x LEFT JOIN b y ON x.k = y.k "
        "WHERE y.v IS NULL") == {}
    # subquery: bail
    assert _auto_scan_filters(
        "SELECT * FROM a x JOIN (SELECT * FROM b) y ON x.k = y.k "
        "WHERE x.v = 1") == {}
    # single-table path unchanged
    one = _auto_scan_filters("SELECT * FROM db.t WHERE v = 1")
    assert set(one) == {"db.t"}


def test_auto_scan_filters_between_or_and_quoted_literals():
    """r5: BETWEEN's inner AND is not a conjunct split point; a
    single-alias OR group is captured; alias-stripping never rewrites
    string-literal bodies (ADVICE r4 medium)."""
    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    got = _auto_scan_filters("""
        SELECT * FROM db.lineitem l JOIN db.orders o
        ON l.l_orderkey = o.o_orderkey
        WHERE l.l_ship BETWEEN DATE '1997-06-01' AND DATE '1997-07-01'
          AND o.o_total > 100""")
    r = repr(got["db.lineitem"])
    assert "gt_eq datetime.date(1997, 6, 1)" in r
    assert "lt_eq datetime.date(1997, 7, 1)" in r
    assert "o_total gt 100" in repr(got["db.orders"])

    got = _auto_scan_filters("""
        SELECT * FROM db.lineitem l JOIN db.orders o
        ON l.l_orderkey = o.o_orderkey
        WHERE (l.l_flag = 'A' OR l.l_flag = 'R') AND o.o_total > 1""")
    r = repr(got["db.lineitem"])
    assert "l_flag eq 'A'" in r and "l_flag eq 'R'" in r and " OR " in r

    # a literal containing '<alias>.' text must survive verbatim
    got = _auto_scan_filters("""
        SELECT * FROM db.documents d JOIN db.orders o
        ON d.doc_id = o.o_orderkey
        WHERE d.lang = 'x d.b y' AND o.o_total > 1""")
    assert "lang eq 'x d.b y'" in repr(got["db.documents"])


def test_run_sql_join_prunes_both_scans(spark, warehouse):
    """The joined front-door query passes each captured predicate to the
    matching table's scan (observed via a scan spy) and returns the same
    rows as plain Spark SQL over full reads."""
    from iceberg_rust_spark.sources.sql import run_sql

    li = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "k long, g long, v double")
    od = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(30)], "k long, s string")
    t1 = Table.create(warehouse, "db.jp_l", schema_from_spark(li.schema))
    t1.append(spark, li)
    t2 = Table.create(warehouse, "db.jp_o", schema_from_spark(od.schema))
    t2.append(spark, od)

    captured = {}
    orig_scan = Table.scan

    def spy(self, *a, **kw):
        if kw.get("row_filter") is not None:
            captured[self.identifier] = repr(kw["row_filter"])
        return orig_scan(self, *a, **kw)

    Table.scan = spy
    try:
        out = run_sql(spark, warehouse, """
            SELECT l.k AS k, l.v AS v, o.s AS s
            FROM db.jp_l l JOIN db.jp_o o ON l.k = o.k
            WHERE l.g = 1 AND o.s = 's1'""").collect()
    finally:
        Table.scan = orig_scan
    assert any("g eq 1" in v for v in captured.values())
    assert any("s eq" in v and "s1" in v for v in captured.values())
    exp = {(r["k"], r["v"], r["s"]) for r in
           li.join(od, "k").where("g = 1 AND s = 's1'").collect()}
    assert {(r["k"], r["v"], r["s"]) for r in out} == exp


def test_branch_ddl_with_retention_clauses(spark, warehouse):
    """ALTER TABLE ... CREATE BRANCH with RETAIN / WITH SNAPSHOT RETENTION
    stores the spec's per-ref retention fields."""
    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(warehouse, "db.br_ret", schema_from_spark(df.schema))
    t.append(spark, df)
    run_sql(spark, warehouse,
            "ALTER TABLE db.br_ret CREATE BRANCH audit RETAIN 7 DAYS "
            "WITH SNAPSHOT RETENTION 5 SNAPSHOTS 2 DAYS")
    ref = Table.load(warehouse, "db.br_ret").metadata.refs["audit"]
    assert ref.type == "branch"
    assert ref.max_ref_age_ms == 7 * 86_400_000
    assert ref.min_snapshots_to_keep == 5
    assert ref.max_snapshot_age_ms == 2 * 86_400_000
    # plain form still works
    run_sql(spark, warehouse, "ALTER TABLE db.br_ret CREATE TAG snap1")
    assert Table.load(warehouse, "db.br_ret").metadata.refs["snap1"].type == "tag"


def test_call_wap_and_changelog_procedures(spark, warehouse):
    """fast_forward / cherrypick_snapshot publish staged WAP branches;
    ancestors_of walks main ancestry; create_changelog_view registers the
    CDC feed as a queryable temp view."""
    df = spark.createDataFrame([(i, i % 2) for i in range(10)],
                               "id long, g long")
    t = Table.create(warehouse, "db.wapproc", schema_from_spark(df.schema))
    t = t.append(spark, df)

    # stage on a branch, then publish via fast_forward
    staged = df.select(F.col("id") + 100, F.col("g")).toDF("id", "g")
    t = t.append(spark, staged, branch="audit")
    out = run_sql(spark, warehouse,
                  "CALL system.fast_forward('db.wapproc', 'main', 'audit')")
    assert out.collect()[0]["branch"] == "main"
    t = Table.load(warehouse, "db.wapproc")
    assert t.to_df(spark).count() == 20

    anc = run_sql(spark, warehouse,
                  "CALL system.ancestors_of('db.wapproc')").collect()
    assert len(anc) == 2 and anc[0]["snapshot_id"] == \
        t.metadata.current_snapshot_id

    # cherry-pick: stage another branch commit based on the current head
    t = t.append(spark, df.select(F.col("id") + 500, F.col("g"))
                 .toDF("id", "g"), branch="wap2")
    sid = t.metadata.refs["wap2"].snapshot_id
    run_sql(spark, warehouse,
            f"CALL system.cherrypick_snapshot('db.wapproc', {sid})")
    t = Table.load(warehouse, "db.wapproc")
    assert t.metadata.current_snapshot_id == sid
    assert t.to_df(spark).count() == 30
    # non-head-based pick is refused
    import pytest as _pytest
    old = anc[-1]["snapshot_id"]
    with _pytest.raises(ValueError, match="cherry-pick"):
        run_sql(spark, warehouse,
                f"CALL system.cherrypick_snapshot('db.wapproc', {old})")

    out = run_sql(spark, warehouse,
                  "CALL system.create_changelog_view('db.wapproc', 'wap_ch')")
    assert out.collect()[0]["changelog_view"] == "wap_ch"
    ch = spark.sql("SELECT _change_type, count(*) AS n FROM wap_ch "
                   "GROUP BY _change_type").collect()
    assert {r["_change_type"]: r["n"] for r in ch} == {"insert": 30}


def test_call_fast_forward_refuses_rewind_and_divergence(spark, warehouse):
    """ADVICE r4 (low): fast_forward must only move a branch to a
    DESCENDANT of its current head — rewinding main to an ancestor or
    jumping it onto a diverged branch history is refused."""
    import pytest as _pytest
    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(warehouse, "db.ffguard", schema_from_spark(df.schema))
    t = t.append(spark, df)
    first = t.metadata.current_snapshot_id
    t = t.append(spark, spark.createDataFrame([(2,)], "id long"))
    # 'old' tags the ancestor; moving main there would rewind
    t.set_ref("old", first)
    with _pytest.raises(ValueError, match="not a descendant"):
        run_sql(spark, warehouse,
                "CALL system.fast_forward('db.ffguard', 'main', 'old')")
    # a branch forked from the ancestor diverges: also refused
    t = Table.load(warehouse, "db.ffguard")
    t.set_ref("fork", first)
    t = Table.load(warehouse, "db.ffguard")
    t = t.append(spark, spark.createDataFrame([(3,)], "id long"),
                 branch="fork")
    with _pytest.raises(ValueError, match="not a descendant"):
        run_sql(spark, warehouse,
                "CALL system.fast_forward('db.ffguard', 'main', 'fork')")
    # a true descendant still fast-forwards
    t = Table.load(warehouse, "db.ffguard")
    t = t.append(spark, spark.createDataFrame([(4,)], "id long"),
                 branch="ahead")
    out = run_sql(spark, warehouse,
                  "CALL system.fast_forward('db.ffguard', 'main', 'ahead')")
    assert out.collect()[0]["branch"] == "main"
    assert Table.load(warehouse, "db.ffguard").to_df(spark).count() == 3


def test_delete_files_and_metadata_log_meta_tables(spark, warehouse):
    df = spark.createDataFrame([(i, i % 3) for i in range(12)],
                               "id long, g long")
    t = Table.create(warehouse, "db.mtabs", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="dv")
    out = run_sql(spark, warehouse,
                  "SELECT content, file_format, referenced_data_file "
                  "FROM db.mtabs.delete_files").collect()
    assert len(out) >= 1
    assert all(r["file_format"] == "puffin" and r["referenced_data_file"]
               for r in out)
    log = run_sql(spark, warehouse,
                  "SELECT * FROM db.mtabs$metadata_log_entries").collect()
    assert len(log) == 3  # create + append + delete
    assert log[-1]["file"].endswith("v3.metadata.json")


def test_position_deletes_meta_table(spark, warehouse):
    """r5: position_deletes exposes every (data file, pos) delete row —
    parquet pos-delete files via the distributed reader, DV puffin blobs
    via executor-side decode — and matches the live-row arithmetic."""
    df = spark.createDataFrame([(i, i % 4) for i in range(40)],
                               "id long, g long")
    t = Table.create(warehouse, "db.posdel", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="mor")
    t = t.delete_where(spark, E.col("g") == 2, mode="dv")
    rows = run_sql(spark, warehouse,
                   "SELECT file_format, count(*) AS n "
                   "FROM db.posdel.position_deletes "
                   "GROUP BY file_format").collect()
    counts = {r["file_format"]: r["n"] for r in rows}
    assert counts == {"parquet": 10, "puffin": 10}
    # every deleted position references a real data file of the table
    files = {r["file_path"] for r in run_sql(
        spark, warehouse,
        "SELECT DISTINCT file_path FROM db.posdel$position_deletes")
        .collect()}
    data_files = {r["file_path"] for r in run_sql(
        spark, warehouse, "SELECT file_path FROM db.posdel.files").collect()}
    assert files <= data_files
    assert t.to_df(spark).count() == 20


def test_spark_style_file_meta_table_aliases(spark, warehouse):
    """r5: data_files / all_data_files / all_delete_files naming parity
    with Spark's inspect tables."""
    df = spark.createDataFrame([(i, i % 2) for i in range(20)],
                               "id long, g long")
    t = Table.create(warehouse, "db.falias", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="mor")
    n_data = run_sql(spark, warehouse,
                     "SELECT count(*) AS n FROM db.falias.data_files") \
        .collect()[0]["n"]
    assert n_data >= 1
    alln = run_sql(spark, warehouse,
                   "SELECT content, count(*) AS n "
                   "FROM db.falias$all_data_files GROUP BY content").collect()
    assert all(r["content"] == 0 for r in alln)
    deln = run_sql(spark, warehouse,
                   "SELECT content FROM db.falias.all_delete_files").collect()
    assert len(deln) >= 1 and all(r["content"] != 0 for r in deln)


def test_write_ordered_by_ddl(spark, warehouse):
    """r5: WRITE ORDERED BY installs a default SortOrder (identity +
    transform fields, direction, null order); subsequent writes sort
    within partitions; WRITE UNORDERED restores order 0."""
    df = spark.createDataFrame(
        [(3, "cc", 1.0), (1, "aa", 2.0), (2, "bb", 3.0)],
        "id long, s string, v double")
    Table.create(warehouse, "db.wob", schema_from_spark(df.schema))
    out = run_sql(spark, warehouse,
                  "ALTER TABLE db.wob WRITE ORDERED BY "
                  "(id DESC NULLS FIRST, truncate(1, s))").collect()[0]
    assert out["sort_order_id"] == 1
    t = Table.load(warehouse, "db.wob")
    order = next(o for o in t.metadata.sort_orders if o.order_id == 1)
    assert t.metadata.default_sort_order_id == 1
    assert [(f.direction, f.null_order, repr(f.transform))
            for f in order.fields] == \
        [("desc", "nulls-first", "identity"), ("asc", "nulls-last",
                                               "truncate[1]")]
    # writes honor the order: rows land id-descending inside the file
    t = t.append(spark, df.coalesce(1))
    import pyarrow.parquet as pq
    path = list(t.scan().plan_files().tasks)[0].data_file.file_path
    assert pq.read_table(path).column("id").to_pylist() == [3, 2, 1]
    # unknown column / inapplicable transform are rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no column"):
        run_sql(spark, warehouse,
                "ALTER TABLE db.wob WRITE ORDERED BY (nope)")
    with _pytest.raises(ValueError, match="cannot apply"):
        run_sql(spark, warehouse,
                "ALTER TABLE db.wob WRITE ORDERED BY (year(s))")
    out = run_sql(spark, warehouse,
                  "ALTER TABLE db.wob WRITE UNORDERED").collect()[0]
    assert out["sort_order_id"] == 0
    assert Table.load(warehouse, "db.wob").metadata \
        .default_sort_order_id == 0


def test_show_namespaces_and_views(spark, warehouse):
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(1,)], "id long")
    Table.create(warehouse, "db.t1", schema_from_spark(df.schema))
    run_sql(spark, warehouse, "CREATE VIEW db.v1 AS SELECT id FROM db.t1")
    assert [r["namespace"] for r in
            run_sql(spark, warehouse, "SHOW NAMESPACES").collect()] == ["db"]
    assert [(r["namespace"], r["viewName"]) for r in
            run_sql(spark, warehouse, "SHOW VIEWS IN db").collect()] == \
        [("db", "v1")]
    assert run_sql(spark, warehouse, "SHOW VIEWS IN nope").count() == 0


def test_snapshot_and_compute_table_stats_procedures(spark, warehouse,
                                                     tmp_path):
    """CALL system.snapshot adopts existing parquet as a new table (no
    copy; name-mapping import) and compute_table_stats writes + commits a
    Puffin NDV statistics file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql

    ext = tmp_path / "ext"
    ext.mkdir()
    pq.write_table(pa.table({"id": list(range(50)),
                             "g": [i % 5 for i in range(50)]}),
                   str(ext / "a.parquet"))
    pq.write_table(pa.table({"id": list(range(50, 80)),
                             "g": [i % 5 for i in range(30)]}),
                   str(ext / "b.parquet"))
    out = run_sql(spark, warehouse,
                  f"CALL system.snapshot('{ext}/*.parquet', 'db.adopted')") \
        .collect()[0]
    assert (out["imported_files_count"], out["imported_rows"]) == (2, 80)
    n = run_sql(spark, warehouse,
                "SELECT count(*) AS n FROM db.adopted WHERE g = 3") \
        .collect()[0]["n"]
    assert n == 16
    # files were adopted in place, not copied
    t = Table.load(warehouse, "db.adopted")
    assert all(task.data_file.file_path.startswith(str(ext))
               for task in t.scan().plan_files().tasks)

    st = run_sql(spark, warehouse,
                 "CALL system.compute_table_stats('db.adopted')") \
        .collect()[0]
    assert st["statistics_file"].endswith(".puffin")
    assert Table.load(warehouse, "db.adopted").metadata.statistics


def test_show_partitions_and_rollback_to_timestamp(spark, warehouse):
    import time

    from iceberg_rust_spark import PartitionField, PartitionSpec, Table
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, "a" if i < 6 else "b")
                                for i in range(10)], "id long, g string")
    schema = schema_from_spark(df.schema)
    spec = PartitionSpec(0, [PartitionField(
        schema.field_id_for_name("g"), 1000, "g",
        parse_transform("identity"))])
    t = Table.create(warehouse, "db.sp", schema, partition_spec=spec)
    t = t.append(spark, df)
    parts = {r["partition"]: r["record_count"] for r in
             run_sql(spark, warehouse, "SHOW PARTITIONS db.sp").collect()}
    assert sum(parts.values()) == 10 and len(parts) == 2

    cut_ms = t.metadata.current_snapshot().timestamp_ms
    time.sleep(0.01)
    t = t.refresh().append(spark, df)          # second snapshot
    assert Table.load(warehouse, "db.sp").to_df(spark).count() == 20
    out = run_sql(spark, warehouse,
                  f"CALL system.rollback_to_timestamp('db.sp', {cut_ms})") \
        .collect()[0]
    assert out["current_snapshot_id"] != out["previous_snapshot_id"]
    assert Table.load(warehouse, "db.sp").to_df(spark).count() == 10


def test_procedure_named_arguments(spark, warehouse):
    """Spark-style `name => value` procedure arguments re-order onto the
    positional signature; unknown names raise with the signature."""
    import pytest as _pytest

    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(1,)], "id long")
    t = Table.create(warehouse, "db.na", schema_from_spark(df.schema))
    for _ in range(3):
        t = t.refresh().append(spark, df)
    out = run_sql(spark, warehouse,
                  "CALL system.expire_snapshots(retain_last => 1, "
                  "table => 'db.na')").collect()[0]
    assert out["deleted_snapshots_count"] == 2
    # mixed positional + named
    out2 = run_sql(spark, warehouse,
                   "CALL system.rollback_to_snapshot('db.na', "
                   "snapshot_id => %d)" % Table.load(
                       warehouse, "db.na").metadata.current_snapshot_id)
    assert out2.collect()
    with _pytest.raises(ValueError, match="unknown argument"):
        run_sql(spark, warehouse,
                "CALL system.expire_snapshots(table => 'db.na', "
                "bogus => 1)")


def test_show_tblproperties(spark, warehouse):
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(1,)], "id long")
    Table.create(warehouse, "db.tp", schema_from_spark(df.schema),
                 properties={"write.target-file-size-bytes": "1048576",
                             "owner": "pipeline"})
    got = {r["key"]: r["value"] for r in
           run_sql(spark, warehouse,
                   "SHOW TBLPROPERTIES db.tp").collect()}
    assert got["owner"] == "pipeline"
    one = run_sql(spark, warehouse,
                  "SHOW TBLPROPERTIES db.tp ('owner')").collect()
    assert [(r["key"], r["value"]) for r in one] == [("owner", "pipeline")]


def test_partitions_table_unified_across_specs(spark, warehouse):
    """partitioning.rs compute_unified_partition_type parity: after spec
    evolution adds a field, the partitions table presents ONE struct —
    newest-spec field names, null for files written before the field
    existed — instead of splitting per spec."""
    from iceberg_rust_spark import PartitionField, PartitionSpec, Table
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.createDataFrame([(i, "a" if i % 2 else "b", i % 3)
                                for i in range(30)],
                               "id long, g string, h long")
    schema = schema_from_spark(df.schema)
    spec = PartitionSpec(0, [PartitionField(
        schema.field_id_for_name("g"), 1000, "g",
        parse_transform("identity"))])
    t = Table.create(warehouse, "db.uni", schema, partition_spec=spec)
    t = t.append(spark, df)
    # evolve: add a second partition field, write more data under spec 1
    run_sql(spark, warehouse,
            "ALTER TABLE db.uni ADD PARTITION FIELD h")
    t = Table.load(warehouse, "db.uni").append(spark, df)

    rows = run_sql(spark, warehouse, "SHOW PARTITIONS db.uni").collect()
    # one unified struct: old-spec files have h null, new-spec files set
    assert set(rows[0]["partition"].__fields__) == {"g", "h"}
    old_spec = [r for r in rows if r["partition"]["h"] is None]
    new_spec = [r for r in rows if r["partition"]["h"] is not None]
    assert {r["partition"]["g"] for r in old_spec} == {"a", "b"}
    assert len(new_spec) == 6  # 2 g-values x 3 h-values
    assert sum(r["record_count"] for r in rows) == 60


def test_show_partitions_with_null_partition_value(spark, warehouse):
    """Regression (r5 advice): a null identity-partition value is stored as
    None (HIVE_NULL path), and partitions_df sorted mixed None/str keys —
    TypeError. The sort key is None-safe now (nulls last per field);
    SHOW PARTITIONS and the partitions metadata table both work."""
    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, None), (4, None)],
        "id long, g string")
    schema = schema_from_spark(df.schema)
    spec = PartitionSpec(0, [PartitionField(
        schema.field_id_for_name("g"), 1000, "g",
        parse_transform("identity"))])
    t = Table.create(warehouse, "db.sp_null", schema, partition_spec=spec)
    t = t.append(spark, df)

    rows = run_sql(spark, warehouse,
                   "SHOW PARTITIONS db.sp_null").collect()
    counts = {r["partition"]["g"]: r["record_count"] for r in rows}
    assert counts == {"a": 2, "b": 1, None: 2}
    # null partition sorts after the concrete values
    assert [r["partition"]["g"] for r in rows] == ["a", "b", None]
    # reading the null partition back works too
    assert t.to_df(spark).where("g IS NULL").count() == 2


def test_auto_scan_filters_outer_join_preserved_side():
    """Outer joins prune the PRESERVED side only (standard pushdown rule):
    a conjunct on the null-supplying side would change which rows find
    matches (IS NULL) and is skipped; FULL joins capture nothing."""
    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    # LEFT: left table preserved, right not
    got = _auto_scan_filters(
        "SELECT * FROM db.orders o LEFT JOIN db.lineitem l "
        "ON o.o_orderkey = l.l_orderkey "
        "WHERE o.o_total > 100 AND l.l_qty < 3")
    assert set(got) == {"db.orders"}
    assert "o_total gt 100" in repr(got["db.orders"])

    # RIGHT: right table preserved, left not
    got = _auto_scan_filters(
        "SELECT * FROM db.orders o RIGHT OUTER JOIN db.lineitem l "
        "ON o.o_orderkey = l.l_orderkey "
        "WHERE o.o_total > 100 AND l.l_qty < 3")
    assert set(got) == {"db.lineitem"}

    # INNER after LEFT: the inner-joined table is preserved too
    got = _auto_scan_filters(
        "SELECT * FROM db.a x LEFT JOIN db.b y ON x.k = y.k "
        "JOIN db.c z ON x.k = z.k "
        "WHERE x.v = 1 AND y.w = 2 AND z.u = 3")
    assert set(got) == {"db.a", "db.c"}

    # FULL: nothing is preserved
    assert _auto_scan_filters(
        "SELECT * FROM db.a x FULL OUTER JOIN db.b y ON x.k = y.k "
        "WHERE x.v = 1") == {}


def test_run_sql_left_join_prunes_preserved_scan(spark, warehouse):
    """End-to-end: a LEFT-join front-door query file-prunes the preserved
    side's scan and returns the same rows as the equivalent DataFrame
    query (null-extension rows included)."""
    import pyspark.sql.functions as F
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    od = spark.createDataFrame([(k, k % 3) for k in range(30)],
                               "k long, g long")
    li = spark.createDataFrame([(k, f"s{k % 2}") for k in range(0, 30, 2)],
                               "k long, s string")
    for name, df in (("db.lo", od), ("db.ll", li)):
        Table.create(warehouse, name, schema_from_spark(df.schema)) \
            .append(spark, df)
    got = run_sql(spark, warehouse, """
        SELECT o.k AS k, o.g AS g, l.s AS s
        FROM db.lo o LEFT JOIN db.ll l ON o.k = l.k
        WHERE o.g = 1""")
    want = od.filter(F.col("g") == 1).alias("o") \
        .join(li.alias("l"), on="k", how="left") \
        .select("k", "g", "s")
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in want.collect()}


def test_auto_scan_filters_on_clause_null_supplying_side():
    """ON-clause conjuncts prune the NULL-SUPPLYING side (complement of
    the WHERE rule): rows failing the ON predicate never match, and the
    preserved side null-extends regardless — so pruning those files is
    result-preserving. ON conjuncts on the preserved side must NOT prune
    (its rows are emitted via null-extension even when ON fails)."""
    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    # LEFT: ON prunes the right (null-supplying) table only
    got = _auto_scan_filters(
        "SELECT * FROM db.o o LEFT JOIN db.l l "
        "ON o.k = l.k AND l.qty > 5 AND o.total > 10 "
        "WHERE o.g = 1")
    assert set(got) == {"db.o", "db.l"}
    assert "qty gt 5" in repr(got["db.l"])
    assert "total" not in repr(got["db.o"])      # ON conjunct on preserved
    assert "g eq 1" in repr(got["db.o"])         # WHERE conjunct preserved

    # RIGHT: ON prunes the prior (left, null-supplying) side only
    got = _auto_scan_filters(
        "SELECT * FROM db.o o RIGHT JOIN db.l l "
        "ON o.k = l.k AND o.total > 10 AND l.qty > 5 "
        "WHERE l.g = 2")
    assert set(got) == {"db.o", "db.l"}
    assert "total gt 10" in repr(got["db.o"])
    assert "qty" not in repr(got["db.l"])
    assert "g eq 2" in repr(got["db.l"])

    # INNER: ON is conjunctive with WHERE — either side prunes
    got = _auto_scan_filters(
        "SELECT * FROM db.a x JOIN db.b y "
        "ON x.k = y.k AND x.v = 1 AND y.w = 2 WHERE y.u > 0")
    assert "v eq 1" in repr(got["db.a"])
    assert "w eq 2" in repr(got["db.b"]) and "u gt 0" in repr(got["db.b"])


def test_run_sql_left_join_on_prunes_right_scan(spark, warehouse):
    """End-to-end: LEFT-join ON conjunct prunes the right scan while
    null-extension rows survive — equals the DataFrame twin."""
    import pyspark.sql.functions as F
    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.sql import run_sql
    from iceberg_rust_spark.sources.types import schema_from_spark

    od = spark.createDataFrame([(k,) for k in range(10)], "k long")
    li = spark.createDataFrame([(k, k * 10) for k in range(0, 10, 2)],
                               "k long, qty long")
    for name, df in (("db.oo", od), ("db.ol", li)):
        Table.create(warehouse, name, schema_from_spark(df.schema)) \
            .append(spark, df)
    got = run_sql(spark, warehouse, """
        SELECT o.k AS k, l.qty AS qty
        FROM db.oo o LEFT JOIN db.ol l ON o.k = l.k AND l.qty >= 40""")
    want = od.alias("o").join(
        li.filter(F.col("qty") >= 40).alias("l"), on="k", how="left") \
        .select("k", "qty")
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in want.collect()}


def test_auto_capture_fuzz_join_pruning_is_result_preserving(spark, warehouse):
    """Randomized soundness check of the WHERE/ON auto-capture rules over
    inner/left/right join chains on PARTITIONED tables (including null
    partition values and IS NULL probes on null-supplying sides): for every
    generated query, run_sql with file-level auto-pruning must return
    exactly what plain Spark SQL returns on unpruned views of the same
    rows. Any unsound capture (pruning a null-supplying side on a WHERE
    conjunct, or a preserved side on an ON conjunct) shows up as missing
    null-extended rows."""
    import random

    da = spark.createDataFrame(
        [(i, ["red", "blue", "green", None][i % 4], float(i % 7))
         for i in range(60)],
        "id long, cat string, amount double")
    db = spark.createDataFrame(
        [(i * 2, ["red", "blue", None][i % 3], i % 5) for i in range(40)],
        "id long, grp string, score long")

    def make(name, df, part_col):
        s = schema_from_spark(df.schema)
        fid = s.field_by_name(part_col).field_id
        spec = PartitionSpec(0, [PartitionField(
            fid, 1000, part_col, parse_transform("identity"))])
        t = Table.create(warehouse, name, s, spec)
        t.append(spark, df)

    make("db.fa", da, "cat")
    make("db.fb", db, "grp")
    da.createOrReplaceTempView("fa_raw")
    db.createOrReplaceTempView("fb_raw")

    conj_a = ["a.cat = 'red'", "a.cat IS NULL", "a.cat IS NOT NULL",
              "a.id < 30", "a.amount > 3.0",
              "a.cat IN ('red', 'blue')", "a.id >= 10 AND a.id < 50"]
    conj_b = ["b.grp = 'blue'", "b.grp IS NULL", "b.score >= 2",
              "b.id < 40", "b.grp IN ('red',)".replace(",)", ")"),
              "b.grp <> 'red'"]
    rng = random.Random(20260816)
    for trial in range(24):
        jt = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN"])
        on = ["a.id = b.id"]
        if rng.random() < 0.5:
            on.append(rng.choice(conj_a if rng.random() < 0.5 else conj_b))
        where = []
        for pool in (conj_a, conj_b):
            if rng.random() < 0.7:
                where.append(rng.choice(pool))
        body = (f"FROM {{A}} a {jt} {{B}} b ON {' AND '.join(on)}"
                + (f" WHERE {' AND '.join(where)}" if where else ""))
        sel = ("SELECT a.id AS aid, a.cat, a.amount, "
               "b.id AS bid, b.grp, b.score ")
        got = run_sql(spark, warehouse,
                      sel + body.format(A="db.fa", B="db.fb"))
        want = spark.sql(sel + body.format(A="fa_raw", B="fb_raw"))
        def key(t):
            return tuple((v is None, v) for v in t)
        g = sorted((tuple(r) for r in got.collect()), key=key)
        w = sorted((tuple(r) for r in want.collect()), key=key)
        assert g == w, (trial, jt, on, where,
                        len(g), len(w))


def test_auto_scan_filters_skip_subquery_conjuncts_only():
    """ADVICE r9 task: a WHERE containing correlated EXISTS / IN-subqueries
    must not kill auto-capture — subquery conjuncts stay uncaptured
    (conservative), plain single-alias/single-table conjuncts still prune."""
    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    # TPC-H Q4 shape: single table + EXISTS — the date range captures;
    # r12: the EXISTS block's own plain conjunct now ALSO captures for
    # lineitem (sound: lineitem is referenced only there, and the
    # subquery's WHERE re-applies the conjunct)
    got = _auto_scan_filters(
        "SELECT o_orderpriority, count(*) AS n FROM db.orders "
        "WHERE o_orderdate >= timestamp '1996-01-01 00:00:00' "
        "AND o_orderdate < timestamp '1996-04-01 00:00:00' "
        "AND EXISTS (SELECT * FROM db.lineitem "
        "WHERE l_orderkey = o_orderkey AND l_discount > 0.05) "
        "GROUP BY o_orderpriority")
    assert set(got) == {"db.orders", "db.lineitem"}
    assert "o_orderdate" in repr(got["db.orders"])
    assert "l_discount" not in repr(got["db.orders"])
    assert "l_discount gt 0.05" in repr(got["db.lineitem"])
    # the correlated conjunct (col vs col) must NOT be captured
    assert "o_orderkey" not in repr(got["db.lineitem"])

    # join + EXISTS in WHERE: plain conjuncts still capture per alias
    got = _auto_scan_filters(
        "SELECT * FROM db.orders o JOIN db.customer c "
        "ON o.o_custkey = c.c_custkey "
        "WHERE o.o_totalprice > 100 "
        "AND EXISTS (SELECT 1 FROM db.lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey) "
        "AND c.c_acctbal < 0")
    assert "o_totalprice gt 100" in repr(got["db.orders"])
    assert "c_acctbal lt 0" in repr(got["db.customer"])
    assert "l_orderkey" not in repr(got.get("db.lineitem", ""))

    # IN-subquery conjunct: uncaptured, sibling conjunct captured
    got = _auto_scan_filters(
        "SELECT * FROM db.orders WHERE o_orderstatus = 'F' "
        "AND o_custkey IN (SELECT c_custkey FROM db.customer "
        "WHERE c_acctbal > 0 GROUP BY c_custkey)")
    # the lazy WHERE regex stops at the inner GROUP BY -> unbalanced
    # parens -> conservative bail is also acceptable; if captured, it
    # must be exactly the plain conjunct
    if got:
        assert "o_orderstatus" in repr(got["db.orders"])
        assert "c_acctbal" not in repr(got["db.orders"])

    # derived-table FROM (Q22 shape): r12 scans INNER blocks too — the
    # derived body's plain conjunct captures for its single-referenced
    # table; the correlated NOT EXISTS stays uncaptured
    got = _auto_scan_filters(
        "SELECT cc, count(*) FROM (SELECT substring(c_name,1,1) AS cc "
        "FROM db.customer WHERE c_acctbal > 0 "
        "AND NOT EXISTS (SELECT * FROM db.orders "
        "WHERE o_custkey = c_custkey)) AS s GROUP BY cc")
    assert set(got) == {"db.customer"}
    assert "c_acctbal gt 0" in repr(got["db.customer"])


def _tpch_tables(spark, warehouse, names):
    import os
    from iceberg_rust_spark.session import read_table
    sf = "/root/testdata/sf0.001"
    for n in names:
        df = spark.read.parquet(os.path.join(sf, f"{n}.parquet"))
        Table.create(warehouse, f"db.{n}",
                     schema_from_spark(df.schema)).append(spark, df)
        df.createOrReplaceTempView(f"{n}_raw")


def test_run_sql_tpch_subquery_shapes_match_oracle(spark, warehouse):
    """TPC-H Q4/Q21/Q22 shapes (correlated EXISTS, comma joins with
    EXISTS + NOT EXISTS, derived table with a scalar subquery) through
    run_sql on Iceberg tables must match plain Spark SQL on raw views of
    the same parquet. Columns adapted to the testdata's slim TPC-H schema;
    the sub-SELECT shapes are the test."""
    from iceberg_rust_spark.sources.sql import run_sql

    _tpch_tables(spark, warehouse,
                 ["orders", "lineitem", "customer", "supplier", "nation"])

    q4 = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM {o}
        WHERE o_orderdate >= timestamp '1996-01-01 00:00:00'
          AND o_orderdate < timestamp '1996-07-01 00:00:00'
          AND EXISTS (SELECT * FROM {l}
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    q21 = """
        SELECT s_name, count(*) AS numwait
        FROM {s}, {l} l1, {o}, {n}
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_discount > 0.02
          AND EXISTS (SELECT * FROM {l} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM {l} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_discount > 0.08)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        GROUP BY s_name ORDER BY numwait DESC, s_name"""
    q22 = """
        SELECT cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (SELECT substring(c_name, 1, 6) AS cntrycode, c_acctbal
              FROM {c}
              WHERE c_acctbal > (SELECT avg(c_acctbal) FROM {c}
                                 WHERE c_acctbal > 0.0)
                AND NOT EXISTS (SELECT * FROM {o}
                                WHERE o_custkey = c_custkey
                                  AND o_totalprice > 400000)) AS custsale
        GROUP BY cntrycode ORDER BY cntrycode"""
    ice = {"o": "db.orders", "l": "db.lineitem", "c": "db.customer",
           "s": "db.supplier", "n": "db.nation"}
    raw = {"o": "orders_raw", "l": "lineitem_raw", "c": "customer_raw",
           "s": "supplier_raw", "n": "nation_raw"}
    for name, q in (("q4", q4), ("q21", q21), ("q22", q22)):
        got = [tuple(r) for r in
               run_sql(spark, warehouse, q.format(**ice)).collect()]
        want = [tuple(r) for r in spark.sql(q.format(**raw)).collect()]
        assert got == want and len(want) > 0, (name, got[:5], want[:5])


def test_run_sql_tpch_core_texts_match_oracle(spark, warehouse):
    """A broader TPC-H sweep through the SQL front door: aggregation,
    multi-join, date-range, LEFT JOIN and CASE shapes as SQL TEXT (the
    auto-capture path active throughout) must match plain Spark SQL on
    raw views of the same parquet. Columns adapted to the slim testdata
    schema; the statement SHAPES are the test."""
    from iceberg_rust_spark.sources.sql import run_sql

    _tpch_tables(spark, warehouse,
                 ["orders", "lineitem", "customer", "supplier", "nation"])

    q1 = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
               count(*) AS count_order
        FROM {l}
        WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""
    q3 = """
        SELECT l.l_orderkey AS okey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev,
               o.o_orderdate AS odate
        FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey
                   JOIN {l} l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < timestamp '1996-03-15 00:00:00'
          AND l.l_shipdate > timestamp '1996-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY rev DESC, okey LIMIT 10"""
    q10 = """
        SELECT c.c_custkey AS ck, c.c_name AS cn,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
        FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey
                   JOIN {l} l ON l.l_orderkey = o.o_orderkey
                   JOIN {n} n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= timestamp '1996-10-01 00:00:00'
          AND o.o_orderdate < timestamp '1997-01-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY rev DESC, ck LIMIT 20"""
    q12 = """
        SELECT l.l_linestatus AS ls,
               sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_count,
               sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_count
        FROM {o} o JOIN {l} l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= timestamp '1996-01-01 00:00:00'
          AND l.l_shipdate < timestamp '1997-01-01 00:00:00'
        GROUP BY l.l_linestatus ORDER BY ls"""
    q13 = """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
              FROM {c} c LEFT JOIN {o} o
                ON c.c_custkey = o.o_custkey
                   AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey) AS c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
    ice = {"o": "db.orders", "l": "db.lineitem", "c": "db.customer",
           "s": "db.supplier", "n": "db.nation"}
    raw = {"o": "orders_raw", "l": "lineitem_raw", "c": "customer_raw",
           "s": "supplier_raw", "n": "nation_raw"}
    for name, q in (("q1", q1), ("q3", q3), ("q10", q10), ("q12", q12),
                    ("q13", q13)):
        got = [tuple(r) for r in
               run_sql(spark, warehouse, q.format(**ice)).collect()]
        want = [tuple(r) for r in spark.sql(q.format(**raw)).collect()]
        assert got == want and len(want) > 0, (name, got[:3], want[:3])


def test_self_join_aliases_never_share_captured_filters(spark, warehouse):
    """r12 regression (found by the FRONTDOOR_AUDIT work): a self join with
    per-alias conjuncts used to capture BOTH conjuncts onto the one shared
    scan view — n1.n_name='A' AND n2.n_name='B' became a contradictory
    filter and silently dropped every row. A table referenced more than
    once must not be captured at all."""
    import os

    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    q = """SELECT n1.n_name, n2.n_name FROM db.nation n1
           JOIN db.nation n2 ON n1.n_regionkey = n2.n_regionkey
           WHERE n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8'"""
    assert _auto_scan_filters(q) == {}

    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Table.create(warehouse, "db.nation",
                 schema_from_spark(n.schema)).append(spark, n)
    n.createOrReplaceTempView("nation_raw_sj")
    got = run_sql(spark, warehouse, q).count()
    want = spark.sql(q.replace("db.nation", "nation_raw_sj")).count()
    assert got == want == 1


def test_comma_join_unqualified_capture_with_catalog(spark, warehouse):
    """r12: TPC-H-style comma joins with UNQUALIFIED single-table conjuncts
    capture via catalog schema resolution — and results stay exact."""
    import os

    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    sf = "/root/testdata/sf0.001"
    for name in ("region", "nation", "supplier"):
        df = spark.read.parquet(os.path.join(sf, f"{name}.parquet"))
        Table.create(warehouse, f"db.{name}",
                     schema_from_spark(df.schema)).append(spark, df)
        df.createOrReplaceTempView(f"{name}_rawc")

    q = """SELECT s_name, n_name
           FROM db.supplier, db.nation, db.region
           WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'ASIA' AND s_acctbal > 0"""
    got = _auto_scan_filters(q, warehouse)
    assert "r_name eq 'ASIA'" in repr(got.get("db.region"))
    assert "s_acctbal gt 0" in repr(got.get("db.supplier"))
    # the join conjuncts (col vs col, cross-table) are never captured
    assert "db.nation" not in got

    res = [tuple(r) for r in run_sql(spark, warehouse, q).collect()]
    want = [tuple(r) for r in spark.sql(
        q.replace("db.supplier", "supplier_rawc")
         .replace("db.nation", "nation_rawc")
         .replace("db.region", "region_rawc")).collect()]
    assert sorted(res) == sorted(want) and len(want) > 0

    # without a catalog, unqualified multi-ref conjuncts stay uncaptured
    assert _auto_scan_filters(q) == {}

    # CTE in FROM with parseable output columns: a colliding unqualified
    # name must not attribute to the base table when the CTE provides it
    q2 = """WITH agg AS (SELECT n_regionkey AS rk, count(*) AS r_name
                         FROM db.nation GROUP BY n_regionkey)
            SELECT * FROM db.region, agg
            WHERE r_regionkey = rk AND r_name > 3"""
    got2 = _auto_scan_filters(q2, warehouse)
    # 'r_name' is provided by BOTH region and the CTE -> ambiguous -> skip
    assert "db.region" not in got2


def test_or_of_and_projection_capture(spark, warehouse):
    """r12: TPC-H Q19's cross-table OR-of-AND WHERE distributes per table —
    each table captures OR over branches of its own sub-conjuncts
    (cross-table join conjuncts drop out: widening, sound); a table
    missing from any branch is unbounded and uncaptured. Results match
    plain Spark."""
    import os

    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    q = """SELECT round(sum(l.l_extendedprice), 2) AS revenue
           FROM db.lineitem l, db.part p
           WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
                  AND l.l_quantity >= 1 AND l.l_quantity <= 30)
              OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
                  AND l.l_quantity >= 10 AND l.l_quantity <= 40)"""
    got = _auto_scan_filters(q)
    assert "Brand#12" in repr(got["db.part"]) \
        and "Brand#23" in repr(got["db.part"]) and " OR " in repr(got["db.part"])
    assert "l_quantity" in repr(got["db.lineitem"])
    # a table absent from one branch is unbounded -> no capture
    q2 = """SELECT 1 FROM db.lineitem l, db.part p
            WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
                   AND l.l_quantity < 5)
               OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23')"""
    got2 = _auto_scan_filters(q2)
    assert "db.lineitem" not in got2
    assert "db.part" in got2

    # end-to-end vs plain Spark
    sf = "/root/testdata/sf0.001"
    for name in ("lineitem", "part"):
        df = spark.read.parquet(os.path.join(sf, f"{name}.parquet"))
        Table.create(warehouse, f"db.{name}",
                     schema_from_spark(df.schema)).append(spark, df)
        df.createOrReplaceTempView(f"{name}_rawor")
    res = run_sql(spark, warehouse, q).collect()[0]["revenue"]
    want = spark.sql(q.replace("db.lineitem", "lineitem_rawor")
                      .replace("db.part", "part_rawor")).collect()[0]["revenue"]
    assert res == want is not None


def test_top_level_or_never_and_split(spark, warehouse):
    """r12 review fix: `a = 1 OR b = 2 AND c = 3` means a=1 OR (b=2 AND
    c=3) — AND-splitting it into (a=1 OR b=2) AND c=3 fabricated an
    over-restrictive capture that silently dropped rows. A top-level OR
    text flows through as ONE disjunction (correct precedence via
    sql_to_predicate) or the per-table OR projection."""
    import os

    from iceberg_rust_spark.sources.sql import _auto_scan_filters

    got = _auto_scan_filters(
        "SELECT * FROM db.t WHERE a = 1 OR b = 2 AND c = 3")
    r = repr(got["db.t"])
    assert "(a eq 1 OR (b eq 2 AND c eq 3))" in r

    # end-to-end: the row (a=1, c=99) satisfies the real WHERE and must
    # survive the captured filter
    df = spark.createDataFrame(
        [(1, 0, 99), (0, 2, 3), (0, 2, 99), (5, 5, 5)], "a long, b long, c long")
    Table.create(warehouse, "db.orprec",
                 schema_from_spark(df.schema)).append(spark, df)
    got_rows = sorted(tuple(r) for r in run_sql(
        spark, warehouse,
        "SELECT * FROM db.orprec WHERE a = 1 OR b = 2 AND c = 3").collect())
    assert got_rows == [(0, 2, 3), (1, 0, 99)]

    # join shape: the OR projection must keep both of x's branch pieces
    jq = ("SELECT * FROM db.a x JOIN db.b y ON x.k = y.k "
          "WHERE x.p = 1 OR y.q = 2 AND x.r = 3")
    jg = _auto_scan_filters(jq)
    assert "(p eq 1 OR r eq 3)" in repr(jg["db.a"])
    assert "db.b" not in jg      # unbounded in the first branch


def test_per_reference_views_prune_self_join(spark, warehouse):
    """r13: a table referenced twice gets a DISTINCT pruned view per
    reference (the once-only rule only surrenders the SHARED view) —
    each reference prunes with its own captured conjunct, rows match
    plain Spark exactly, and the audit shows per-reference scans."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources import sql as sqlmod
    from iceberg_rust_spark.sources.metadata import (PartitionField,
                                                     PartitionSpec)

    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 8).alias("g"),
        (F.col("id") * 3).alias("v"))
    schema = schema_from_spark(df.schema)
    spec = PartitionSpec(0, [PartitionField(
        schema.field_by_name("g").field_id, 1000, "g",
        parse_transform("identity"))])
    t = Table.create(warehouse, "db.sj", schema, spec)
    t.append(spark, df)
    df.createOrReplaceTempView("sj_raw")

    q = ("SELECT a.k, a.v, b.v AS bv FROM db.sj a JOIN db.sj b "
         "ON a.k = b.k + 7 WHERE a.g = 1 AND b.g = 2 ORDER BY a.k")
    sqlmod.AUDIT_SCANS = []
    try:
        got = [tuple(r) for r in run_sql(spark, warehouse, q).collect()]
        recs = sqlmod.AUDIT_SCANS
    finally:
        sqlmod.AUDIT_SCANS = None
    want = [tuple(r) for r in
            spark.sql(q.replace("db.sj", "sj_raw")).collect()]
    assert got == want and got
    # two per-reference scans, each pruned by ITS OWN conjunct
    filt = [r for r in recs if r["table"] == "db.sj" and r["filter"] != "None"]
    assert len(filt) == 2
    assert {f["filter"] for f in filt} == {"g eq 1", "g eq 2"}
    assert all(f["skipped_by_partition"] > 0 for f in filt)


def test_per_reference_views_prune_in_subquery(spark, warehouse):
    """q18 shape: the same table in the main FROM and in an IN-subquery —
    the subquery reference's conjunct prunes that reference only."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark.sources import sql as sqlmod

    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("qty"))
    t = Table.create(warehouse, "db.li18", schema_from_spark(df.schema))
    t.append(spark, df)
    df.createOrReplaceTempView("li18_raw")

    q = ("SELECT o.k, o.qty FROM db.li18 o WHERE o.k IN "
         "(SELECT i.k FROM db.li18 i WHERE i.qty > 90) ORDER BY o.k")
    sqlmod.AUDIT_SCANS = []
    try:
        got = [tuple(r) for r in run_sql(spark, warehouse, q).collect()]
        recs = sqlmod.AUDIT_SCANS
    finally:
        sqlmod.AUDIT_SCANS = None
    want = [tuple(r) for r in
            spark.sql(q.replace("db.li18", "li18_raw")).collect()]
    assert got == want and got
    filt = [r for r in recs if r["filter"] != "None"]
    assert len(filt) == 1 and "qty gt 90" in filt[0]["filter"]


def test_per_reference_views_user_filter_composes(spark, warehouse):
    """An explicit scan_filters entry for a multi-referenced table must
    still apply to EVERY reference — AND-composed with the captured
    conjunct on spliced references, alone on the shared view."""
    import pyspark.sql.functions as F

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g"))
    Table.create(warehouse, "db.uf", schema_from_spark(df.schema)) \
        .append(spark, df)
    df.createOrReplaceTempView("uf_raw")

    q = ("SELECT a.k FROM db.uf a JOIN db.uf b ON a.k = b.k "
         "WHERE a.g = 3 ORDER BY a.k")
    got = [r["k"] for r in run_sql(
        spark, warehouse, q, scan_filters={"db.uf": E.col("k") < 50}
    ).collect()]
    want = [r["k"] for r in spark.sql(
        "SELECT a.k FROM uf_raw a JOIN uf_raw b ON a.k = b.k "
        "WHERE a.g = 3 AND a.k < 50 AND b.k < 50 ORDER BY a.k").collect()]
    assert got == want and got
