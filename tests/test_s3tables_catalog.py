"""S3TablesCatalog over the public rest-json protocol + SigV4.

Behavior matrix plus the S3Tables specifics: service-generated table
locations (user locations rejected, reference
crates/catalog/s3tables/src/catalog.rs:527-534), versionToken CAS on
UpdateTableMetadataLocation (catalog.rs:702-748), and the rename route."""

import threading

import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.catalog import (CommitConflict, NoSuchTable,
                                                TableAlreadyExists)
from iceberg_rust_spark.sources.s3tables import S3TablesCatalog
from iceberg_rust_spark.sources.types import schema_from_spark
from tests.fake_aws import ACCESS, SECRET, FakeS3Tables

ARN = "arn:aws:s3tables:us-east-1:111122223333:bucket/test-bucket"


@pytest.fixture
def s3t_catalog(tmp_path):
    server = FakeS3Tables(str(tmp_path / "buckets"))
    endpoint = server.start()
    cat = S3TablesCatalog(endpoint, ARN, access_key=ACCESS,
                          secret_key=SECRET)
    cat.create_namespace("db")
    yield cat
    server.stop()


def test_s3tables_catalog_matrix_crud_and_cas(spark, s3t_catalog):
    cat = s3t_catalog
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = Table.create(cat, "db.m1", schema_from_spark(df.schema))
    # service generated the location
    assert t.metadata.location.endswith("/db/m1")
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


def test_s3tables_version_token_race(spark, s3t_catalog):
    cat = s3t_catalog
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


def test_s3tables_namespaces_and_loader(spark, tmp_path):
    from iceberg_rust_spark import load_catalog
    from iceberg_rust_spark.sources.sql import run_sql

    server = FakeS3Tables(str(tmp_path / "buckets"))
    endpoint = server.start()
    try:
        cat = load_catalog("s3tables", table_bucket_arn=ARN,
                           endpoint_url=endpoint,
                           aws_access_key_id=ACCESS,
                           aws_secret_access_key=SECRET)
        cat.create_namespace("db")
        assert cat.namespace_exists("db")
        assert cat.list_namespaces() == ["db"]
        # non-empty namespace refuses to drop (ConflictException)
        df = spark.createDataFrame([(1,)], "id long")
        Table.create(cat, "db.t", schema_from_spark(df.schema)) \
            .append(spark, df)
        from iceberg_rust_spark.sources.catalog import NamespaceNotEmpty
        with pytest.raises(NamespaceNotEmpty):
            cat.drop_namespace("db")
        # front door runs over s3tables too
        n = run_sql(spark, cat, "SELECT count(*) AS n FROM db.t") \
            .collect()[0]["n"]
        assert n == 1
        cat.drop_table("db.t")
        cat.drop_namespace("db")
        assert not cat.namespace_exists("db")
    finally:
        server.stop()
