"""Views, static tables, add_files, sort orders, metadata-only DDL actions."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.types import schema_from_spark
from iceberg_rust_spark.sources.views import ViewCatalog


@pytest.fixture()
def orders_table(spark, warehouse):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0), (4, 20, 9.0)],
        "ok long, ck long, price double")
    t = Table.create(warehouse, "db.orders", schema_from_spark(df.schema))
    t.append(spark, df)
    return t


def test_view_lifecycle(spark, warehouse, orders_table):
    vc = ViewCatalog(warehouse)
    vc.create_view("db.big_orders", "SELECT ok, price FROM orders WHERE price > 4")
    got = sorted(r["ok"] for r in vc.read_view(spark, "db.big_orders").collect())
    assert got == [1, 2, 4]
    # replace creates a new version; old version still readable
    vc.replace_view("db.big_orders", "SELECT ok FROM orders WHERE price > 8")
    assert [r["ok"] for r in vc.read_view(spark, "db.big_orders").collect()] == [4]
    assert sorted(r["ok"] for r in
                  vc.read_view(spark, "db.big_orders", version_id=1).collect()) == [1, 2, 4]
    assert vc.list_views("db") == ["big_orders"]
    vc.drop_view("db.big_orders")
    assert vc.list_views("db") == []


def test_view_metadata_roundtrip(warehouse):
    from iceberg_rust_spark.sources.views import ViewMetadata
    vc = ViewCatalog(warehouse)
    md = vc.create_view("db.v1", "SELECT 1 AS x")
    md2 = ViewMetadata.from_json(md.to_json())
    assert md2.current_version().sql == "SELECT 1 AS x"
    assert md2.view_uuid == md.view_uuid


def test_static_table_read_only(spark, warehouse, orders_table):
    import glob
    import os
    md_dir = os.path.join(orders_table.location, "metadata")
    latest = sorted(glob.glob(os.path.join(md_dir, "v*.metadata.json")))[-1]
    st = Table.from_metadata_path(latest)
    assert st.to_df(spark).count() == 4
    with pytest.raises(RuntimeError, match="read-only"):
        st.update_properties({"a": "b"})


def test_add_files_import(spark, warehouse, orders_table):
    assert orders_table.to_df(spark).count() == 4
    # import the raw testdata parquet into a fresh table without rewrite
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    t = Table.create(warehouse, "db.ext", schema_from_spark(df.schema))
    t.add_files(spark, ["/root/testdata/sf0.001/orders.parquet"])
    assert t.to_df(spark).count() == df.count()
    # metrics pruning works on imported stats
    plan = t.scan(row_filter=E.col("o_orderkey") == -1).plan_files()
    assert len(plan.tasks) == 0


def test_add_files_name_mapping_validates(spark, warehouse):
    from iceberg_rust_spark.sources.types import LONG, NestedField, Schema
    s = Schema([NestedField(1, "nope", LONG, required=True)])
    t = Table.create(warehouse, "db.ext2", s)
    with pytest.raises(ValueError, match="required"):
        t.add_files(spark, ["/root/testdata/sf0.001/orders.parquet"])


def test_replace_sort_order_and_sorted_write(spark, warehouse):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "id long, s string")
    t = Table.create(warehouse, "db.sorted", schema_from_spark(df.schema))
    t.replace_sort_order(("id", "desc"))
    assert t.metadata.default_sort_order_id == 1
    t.append(spark, df.coalesce(1))
    # rows inside the single written file are sorted desc by id
    path = t.scan().plan_files().tasks[0].data_file.file_path
    got = [r["id"] for r in spark.read.parquet(path).collect()]
    assert got == [3, 2, 1]
    with pytest.raises(ValueError):
        t.replace_sort_order(("missing", "asc"))


def test_update_location_and_upgrade(spark, warehouse, orders_table):
    t = orders_table.upgrade_format_version(3)
    assert t.metadata.format_version == 3
    with pytest.raises(ValueError, match="downgrade"):
        t.upgrade_format_version(2)


def test_asof_join_semantics(spark):
    from iceberg_rust_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, 10, dt.datetime(2020, 1, 5)), (2, 10, dt.datetime(2020, 1, 1)),
         (3, 20, dt.datetime(2020, 1, 9)), (4, 30, dt.datetime(2020, 1, 2))],
        "eid long, k long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(10, dt.datetime(2020, 1, 2), "a"), (10, dt.datetime(2020, 1, 4), "b"),
         (20, dt.datetime(2020, 1, 9), "c")],
        "k long, rts timestamp_ntz, tag string")
    out = {r["eid"]: r["tag"] for r in
           asof_join(left, right, ["k"], "ts", "rts", how="left").collect()}
    assert out == {1: "b",      # latest right <= 2020-01-05
                   2: None,     # no right before 2020-01-01
                   3: "c",      # boundary equality included
                   4: None}     # key with no right rows
    inner = {r["eid"] for r in
             asof_join(left, right, ["k"], "ts", "rts", how="inner").collect()}
    assert inner == {1, 3}


def test_rename_table_keeps_location_and_data(spark, warehouse):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               "id long, v double")
    t = Table.create(warehouse, "db.old_name", schema_from_spark(df.schema))
    t = t.append(spark, df).append(spark, df)  # 2 snapshots, metadata-log
    old_location = t.location

    warehouse.rename_table("db.old_name", "db.new_name")
    assert warehouse.table_exists("db.new_name")
    assert not warehouse.table_exists("db.old_name")
    assert "new_name" in warehouse.list_tables("db")
    assert "old_name" not in warehouse.list_tables("db")

    t2 = Table.load(warehouse, "db.new_name")
    assert t2.location == old_location           # location unchanged
    assert t2.to_df(spark).count() == 100        # data + manifests readable
    # further commits work at the new identifier
    t2 = t2.append(spark, df)
    assert t2.to_df(spark).count() == 150
    import pytest as _pytest
    from iceberg_rust_spark.sources.catalog import NoSuchTable
    with _pytest.raises(NoSuchTable):
        warehouse.rename_table("db.old_name", "db.third")


def test_view_builder_rules(spark, warehouse):
    """view_metadata_builder.rs behaviors: dialect-drop guard, version
    dedup, history expiration."""
    import pytest as _pytest

    from iceberg_rust_spark.sources.views import (PROP_DROP_DIALECT_ALLOWED,
                                                  PROP_VERSION_HISTORY_SIZE,
                                                  ViewCatalog)
    vc = ViewCatalog(warehouse)
    vc.create_view("db.rules", "SELECT 1 AS x")
    # multi-dialect replacement keeps both dialects
    md = vc.replace_view("db.rules", "SELECT 2 AS x", representations=[
        {"type": "sql", "sql": "SELECT 2 AS x", "dialect": "spark"},
        {"type": "sql", "sql": "SELECT 2 AS x", "dialect": "trino"}])
    assert md.current_version().dialects() == {"spark", "trino"}
    # dropping trino now fails by default (test_dropping_dialect_fails_by_default)
    with _pytest.raises(ValueError, match="dialect"):
        vc.replace_view("db.rules", "SELECT 3 AS x")
    # ...unless the property allows it (test_dropping_dialects_does_not_fail_when_allowed)
    md.properties[PROP_DROP_DIALECT_ALLOWED] = "true"
    vc._io.write_text(vc._view_path("db.rules"), md.to_json())
    md = vc.replace_view("db.rules", "SELECT 3 AS x")
    assert md.current_version().dialects() == {"spark"}
    # duplicate dialect in one version rejected (require_unique_dialects)
    with _pytest.raises(ValueError, match="dialect"):
        vc.replace_view("db.rules", "SELECT 4 AS x", representations=[
            {"type": "sql", "sql": "a", "dialect": "spark"},
            {"type": "sql", "sql": "b", "dialect": "SPARK"}])
    # identical content re-points, adds no version (test_view_version_deduplication)
    n_before = len(md.versions)
    md = vc.replace_view("db.rules", "SELECT 3 AS x")
    assert len(md.versions) == n_before
    # history expiration: cap at 2 entries (test_version_expiration)
    md.properties[PROP_VERSION_HISTORY_SIZE] = "2"
    vc._io.write_text(vc._view_path("db.rules"), md.to_json())
    for i in range(5):
        md = vc.replace_view("db.rules", f"SELECT {10 + i} AS x")
    assert len(md.versions) == 2
    assert md.current_version().sql == "SELECT 14 AS x"
    # non-positive retention rejected (test_error_when_setting_negative_...)
    md.properties[PROP_VERSION_HISTORY_SIZE] = "0"
    vc._io.write_text(vc._view_path("db.rules"), md.to_json())
    with _pytest.raises(ValueError, match="positive"):
        vc.replace_view("db.rules", "SELECT 99 AS x")
