"""GlueCatalog over AWS JSON 1.1 + SigV4 against an in-process endpoint.

Catalog behavior matrix (as test_sql_catalog / test_hms_catalog) plus the
Glue specifics: signed requests (the fake re-derives and enforces the
signature), VersionId optimistic locking on UpdateTable, iceberg.field.*
column parameters, and the create+delete rename dance
(reference crates/catalog/glue/src/catalog.rs:759-961)."""

import threading

import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.catalog import (CommitConflict, NoSuchTable,
                                                TableAlreadyExists)
from iceberg_rust_spark.sources.glue import GlueCatalog
from iceberg_rust_spark.sources.types import schema_from_spark
from tests.fake_aws import ACCESS, SECRET, FakeGlue


@pytest.fixture
def glue_catalog(tmp_path):
    server = FakeGlue()
    endpoint = server.start()
    cat = GlueCatalog(endpoint, str(tmp_path / "wh"), region="us-west-2",
                      access_key=ACCESS, secret_key=SECRET)
    cat.create_namespace("db")
    yield cat
    server.stop()


def test_glue_rejects_bad_signature(tmp_path):
    server = FakeGlue()
    endpoint = server.start()
    try:
        bad = GlueCatalog(endpoint, str(tmp_path / "wh"),
                          access_key=ACCESS, secret_key="wrong-secret")
        from iceberg_rust_spark.sources.glue import GlueError
        with pytest.raises(GlueError, match="Signature|signature"):
            bad.list_namespaces()
    finally:
        server.stop()


def test_glue_catalog_matrix_crud_and_cas(spark, glue_catalog):
    cat = glue_catalog
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = Table.create(cat, "db.m1", schema_from_spark(df.schema))
    with pytest.raises(TableAlreadyExists):
        Table.create(cat, "db.m1", schema_from_spark(df.schema))
    t = t.append(spark, df)
    assert cat.table_exists("db.m1")
    assert cat.list_tables("db") == ["m1"]
    got = Table.load(cat, "db.m1").to_df(spark)
    assert {r["id"] for r in got.collect()} == {1, 2}

    stale = Table.load(cat, "db.m1")
    fresh = Table.load(cat, "db.m1")
    fresh.append(spark, df.select(F.col("id") + 10, F.col("s"))
                 .toDF("id", "s"))
    with pytest.raises(CommitConflict):
        cat.commit_table("db.m1", stale.version, stale.metadata)
    retried = stale.append(spark, df.select(F.col("id") + 20, F.col("s"))
                           .toDF("id", "s"))
    assert retried.to_df(spark).count() == 6

    cat.rename_table("db.m1", "db.m2")
    assert not cat.table_exists("db.m1")
    t2 = Table.load(cat, "db.m2")
    assert t2.to_df(spark).count() == 6
    t2.append(spark, df)
    assert Table.load(cat, "db.m2").to_df(spark).count() == 8

    cat.drop_table("db.m2")
    with pytest.raises(NoSuchTable):
        cat.load_table("db.m2")


def test_glue_version_id_cas_under_race(spark, glue_catalog):
    """The VersionId mismatch surfaces when two committers read the same
    glue table version: loser's UpdateTable is refused server-side even
    though its metadata_location check passed."""
    cat = glue_catalog
    df = spark.createDataFrame([(0, "seed")], "id long, s string")
    Table.create(cat, "db.race", schema_from_spark(df.schema)) \
        .append(spark, df)
    errors = []

    def worker(i: int) -> None:
        try:
            Table.load(cat, "db.race").append(
                spark, spark.createDataFrame([(i + 1, f"w{i}")],
                                             "id long, s string"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    final = Table.load(cat, "db.race")
    assert final.to_df(spark).count() == 7
    assert len(final.metadata.snapshots) == 7


def test_glue_table_input_shape(spark, glue_catalog):
    """Registered TableInput mirrors the reference: EXTERNAL_TABLE,
    table_type=ICEBERG, metadata_location(+previous), iceberg.field.*
    column parameters with Hive type strings."""
    cat = glue_catalog
    df = spark.createDataFrame([(1, "x", 2.5)], "id long, s string, v double")
    t = Table.create(cat, "db.shape", schema_from_spark(df.schema))
    raw = cat._get_table("db.shape")
    assert raw["TableType"] == "EXTERNAL_TABLE"
    assert raw["Parameters"]["table_type"] == "ICEBERG"
    first = raw["Parameters"]["metadata_location"]
    cols = raw["StorageDescriptor"]["Columns"]
    assert [(c["Name"], c["Type"]) for c in cols] == \
        [("id", "bigint"), ("s", "string"), ("v", "double")]
    assert cols[0]["Parameters"]["iceberg.field.id"] == "1"
    assert cols[0]["Parameters"]["iceberg.field.optional"] in ("true", "false")

    t.append(spark, df)
    raw2 = cat._get_table("db.shape")
    assert raw2["Parameters"]["previous_metadata_location"] == first
    assert raw2["VersionId"] != raw["VersionId"]


def test_glue_namespace_surface(glue_catalog):
    cat = glue_catalog
    cat.create_namespace("other", {"description": "scratch", "k": "v"})
    assert "other" in cat.list_namespaces()
    props = cat.namespace_properties("other")
    assert props["description"] == "scratch"
    assert props["k"] == "v"
    cat.drop_namespace("other")
    assert not cat.namespace_exists("other")


def test_glue_through_loader_and_sql_front_door(spark, tmp_path):
    from iceberg_rust_spark import load_catalog
    from iceberg_rust_spark.sources.sql import run_sql

    server = FakeGlue()
    endpoint = server.start()
    try:
        cat = load_catalog("glue", uri=endpoint,
                           warehouse=str(tmp_path / "wh"),
                           region_name="eu-west-1",
                           aws_access_key_id=ACCESS,
                           aws_secret_access_key=SECRET)
        cat.create_namespace("db")
        df = spark.createDataFrame([(i, i % 3, float(i)) for i in range(30)],
                                   "id long, g long, v double")
        Table.create(cat, "db.fd", schema_from_spark(df.schema)) \
            .append(spark, df)
        run_sql(spark, cat, """
            CREATE TABLE db.fd_agg AS
            SELECT g, count(*) AS n, sum(v) AS sum_v FROM db.fd GROUP BY g""")
        got = run_sql(spark, cat, "SELECT count(*) AS n FROM db.fd_agg") \
            .collect()[0]["n"]
        assert got == 3
        snaps = run_sql(spark, cat,
                        "SELECT * FROM db.fd.snapshots").collect()
        assert len(snaps) == 1
    finally:
        server.stop()


def test_glue_register_table(spark, glue_catalog, tmp_path):
    """register_table (reference glue catalog.rs:844-898): CreateTable at
    the existing metadata location, immediately readable + committable."""
    import glob

    from iceberg_rust_spark import FileSystemCatalog

    src = FileSystemCatalog(str(tmp_path / "src_wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    Table.create(src, "db.orig", schema_from_spark(df.schema)) \
        .append(spark, df)
    md_file = sorted(glob.glob(
        str(tmp_path / "src_wh/db/orig/metadata/v*.metadata.json")))[-1]
    cat = glue_catalog
    cat.register_table("db.ext", md_file)
    assert Table.load(cat, "db.ext").to_df(spark).count() == 2
    with pytest.raises(TableAlreadyExists):
        cat.register_table("db.ext", md_file)
