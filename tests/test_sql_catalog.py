"""SqlCatalog (sqlite3-backed, reference catalog/sql semantics): the
FileSystemCatalog behavior matrix must hold identically, plus the SQL-
specific pointer-CAS and namespace-properties surface."""

import threading
import uuid

import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import FileSystemCatalog, SqlCatalog, Table, expr as E
from iceberg_rust_spark.sources.catalog import (CommitConflict, NoSuchTable,
                                                TableAlreadyExists)
from iceberg_rust_spark.sources.types import schema_from_spark


@pytest.fixture(params=["fs", "sql"])
def any_catalog(request, tmp_path):
    wh = tmp_path / f"wh_{uuid.uuid4().hex[:6]}"
    if request.param == "fs":
        yield FileSystemCatalog(str(wh))
    else:
        yield SqlCatalog(str(tmp_path / "catalog.db"), str(wh))


def test_catalog_matrix_crud_and_cas(spark, any_catalog):
    """Same behavior matrix on both catalogs: create/load/list/exists,
    stale-version commit conflict, rename, drop."""
    cat = any_catalog
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = Table.create(cat, "db.m1", schema_from_spark(df.schema))
    with pytest.raises(TableAlreadyExists):
        Table.create(cat, "db.m1", schema_from_spark(df.schema))
    t = t.append(spark, df)
    assert cat.table_exists("db.m1")
    assert cat.list_tables("db") == ["m1"]
    got = Table.load(cat, "db.m1").to_df(spark)
    assert {r["id"] for r in got.collect()} == {1, 2}

    # CAS: a commit from a stale version conflicts...
    stale = Table.load(cat, "db.m1")
    fresh = Table.load(cat, "db.m1")
    fresh.append(spark, df.select(F.col("id") + 10, F.col("s"))
                 .toDF("id", "s"))
    with pytest.raises(CommitConflict):
        cat.commit_table("db.m1", stale.version, stale.metadata)
    # ...but Table's retry loop refreshes and lands it
    retried = stale.append(spark, df.select(F.col("id") + 20, F.col("s"))
                           .toDF("id", "s"))
    assert retried.to_df(spark).count() == 6

    # rename keeps data readable; old name gone
    cat.rename_table("db.m1", "db.m2")
    assert not cat.table_exists("db.m1")
    t2 = Table.load(cat, "db.m2")
    assert t2.to_df(spark).count() == 6
    # commits keep working after rename
    t2 = t2.append(spark, df)
    assert t2.to_df(spark).count() == 8

    cat.drop_table("db.m2")
    assert not cat.table_exists("db.m2")
    with pytest.raises(NoSuchTable):
        cat.drop_table("db.m2")


def test_catalog_matrix_dml(spark, any_catalog):
    """MOR delete + merge run identically against both catalogs."""
    cat = any_catalog
    df = spark.range(0, 20).select(F.col("id"), (F.col("id") % 4).alias("g"))
    t = Table.create(cat, "db.dml", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("g") == 1, mode="mor")
    assert t.to_df(spark).count() == 15
    src = spark.createDataFrame([(2, 99), (100, 0)], "id long, g long")
    t = t.merge(spark, src, ["id"])
    rows = {r["id"]: r["g"] for r in t.to_df(spark).collect()}
    assert rows[2] == 99 and rows[100] == 0 and len(rows) == 16


def test_sql_catalog_schema_matches_reference(tmp_path):
    """The sqlite layout is the reference's DDL column-for-column
    (catalog.rs:321-341)."""
    import sqlite3

    cat = SqlCatalog(str(tmp_path / "c.db"), str(tmp_path / "wh"))
    con = sqlite3.connect(cat.db_path)
    cols = [r[1] for r in con.execute("PRAGMA table_info(iceberg_tables)")]
    assert cols == ["catalog_name", "table_namespace", "table_name",
                    "metadata_location", "previous_metadata_location",
                    "iceberg_type"]
    cols = [r[1] for r in con.execute(
        "PRAGMA table_info(iceberg_namespace_properties)")]
    assert cols == ["catalog_name", "namespace", "property_key",
                    "property_value"]


def test_sql_catalog_namespaces_and_pointer_cas(spark, tmp_path):
    cat = SqlCatalog(str(tmp_path / "c.db"), str(tmp_path / "wh"))
    cat.create_namespace("db", {"owner": "me"})
    assert cat.namespace_properties("db")["owner"] == "me"
    assert "db" in cat.list_namespaces()
    with pytest.raises(ValueError):
        # not empty once a table exists
        df = spark.createDataFrame([(1,)], "id long")
        Table.create(cat, "db.t", schema_from_spark(df.schema))
        cat.drop_namespace("db")
    # pointer moves with previous_metadata_location recorded
    t = Table.load(cat, "db.t")
    t.append(spark, spark.createDataFrame([(2,)], "id long"))
    import sqlite3
    con = sqlite3.connect(cat.db_path)
    ptr, prev = con.execute(
        "SELECT metadata_location, previous_metadata_location "
        "FROM iceberg_tables WHERE table_name = 't'").fetchone()
    assert ptr.endswith("v2.metadata.json")
    assert prev.endswith("v1.metadata.json")


def test_sql_catalog_concurrent_commits_serialize(spark, tmp_path):
    """Two racing committers: sqlite's pointer-CAS lets exactly one UPDATE
    land per version; Table's retry loop makes both appends stick."""
    cat = SqlCatalog(str(tmp_path / "c.db"), str(tmp_path / "wh"))
    df = spark.createDataFrame([(0,)], "id long")
    Table.create(cat, "db.race", schema_from_spark(df.schema)) \
        .append(spark, df)
    errs = []

    def worker(k):
        try:
            t = Table.load(cat, "db.race")
            t.append(spark, spark.createDataFrame([(k,)], "id long"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in (1, 2, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    final = Table.load(cat, "db.race")
    assert final.to_df(spark).count() == 4
    assert final.version == 5  # create + 4 appends, each one CAS step
