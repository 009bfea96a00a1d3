"""Namespace surface parity across every catalog backend
(catalog/mod.rs:58 Catalog trait: get_namespace / namespace_exists /
update_namespace / drop_namespace; REST routes per the public Iceberg REST
spec, catalog/rest/src/catalog.rs:661-740; refusal semantics from
catalog/sql/src/catalog.rs:681-695 — non-empty namespaces don't drop, and
dropping a parent never cascades into nested namespaces)."""

import uuid

import pytest

from iceberg_rust_spark import FileSystemCatalog, SqlCatalog, Table
from iceberg_rust_spark.sources.catalog import (NamespaceNotEmpty,
                                                NoSuchNamespace)
from iceberg_rust_spark.sources.rest import (MemoryCatalog, RestCatalog,
                                             RestCatalogServer)
from iceberg_rust_spark.sources.types import schema_from_spark

BACKENDS = ["fs", "memory", "sql", "rest"]


def make_catalog(kind: str, tmp_path):
    wh = str(tmp_path / f"wh_{kind}_{uuid.uuid4().hex[:6]}")
    if kind == "fs":
        return FileSystemCatalog(wh)
    if kind == "memory":
        return MemoryCatalog(wh)
    if kind == "sql":
        return SqlCatalog(str(tmp_path / f"{uuid.uuid4().hex[:6]}.db"), wh)
    server = RestCatalogServer(MemoryCatalog(wh))
    return RestCatalog(transport=server)


@pytest.mark.parametrize("kind", BACKENDS)
def test_namespace_lifecycle(kind, tmp_path):
    cat = make_catalog(kind, tmp_path)
    assert not cat.namespace_exists("db")
    with pytest.raises(NoSuchNamespace):
        cat.namespace_properties("db")
    with pytest.raises(NoSuchNamespace):
        cat.drop_namespace("db")

    cat.create_namespace("db", {"owner": "me", "stale": "x"})
    assert cat.namespace_exists("db")
    assert cat.namespace_properties("db") == {"owner": "me", "stale": "x"}
    assert "db" in cat.list_namespaces()

    cat.update_namespace("db", updates={"owner": "you", "new": "1"},
                         removals=["stale", "never-there"])
    assert cat.namespace_properties("db") == {"owner": "you", "new": "1"}

    cat.drop_namespace("db")
    assert not cat.namespace_exists("db")
    assert "db" not in cat.list_namespaces()


@pytest.mark.parametrize("kind", BACKENDS)
def test_drop_namespace_refuses_non_empty(kind, spark, tmp_path):
    cat = make_catalog(kind, tmp_path)
    cat.create_namespace("db")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    Table.create(cat, "db.t", schema_from_spark(df.schema))
    with pytest.raises(NamespaceNotEmpty):
        cat.drop_namespace("db")
    cat.drop_table("db.t")
    cat.drop_namespace("db")
    assert not cat.namespace_exists("db")


@pytest.mark.parametrize("kind", BACKENDS)
def test_drop_parent_never_cascades(kind, tmp_path):
    """sql/catalog.rs test_dropping_a_namespace_does_not_drop_namespaces_
    nested_under_that_one — we go further and refuse the drop outright."""
    cat = make_catalog(kind, tmp_path)
    cat.create_namespace("a")
    cat.create_namespace("a.b", {"k": "v"})
    with pytest.raises(NamespaceNotEmpty):
        cat.drop_namespace("a")
    assert cat.namespace_exists("a.b")
    assert cat.namespace_properties("a.b") == {"k": "v"}
    cat.drop_namespace("a.b")
    cat.drop_namespace("a")


def test_rest_update_namespace_response(tmp_path):
    """The REST body is the spec's {updated, removed, missing} triple."""
    cat = make_catalog("rest", tmp_path)
    cat.create_namespace("db", {"a": "1", "b": "2"})
    props = cat.update_namespace("db", updates={"a": "9", "c": "3"},
                                 removals=["b", "ghost"])
    # cross-catalog parity: the merged property map comes back ...
    assert props == {"a": "9", "c": "3"}
    # ... and the spec's wire reply stays inspectable
    assert cat.last_update_namespace_response == {
        "updated": ["a", "c"], "removed": ["b"], "missing": ["ghost"]}
    assert cat.namespace_properties("db") == {"a": "9", "c": "3"}


def test_namespace_ddl_through_sql_front_door(spark, tmp_path):
    """CREATE/ALTER/DESCRIBE/DROP NAMESPACE run through run_sql against any
    catalog (Spark SQL database-DDL surface over the Catalog trait)."""
    from iceberg_rust_spark.sources.sql import run_sql

    cat = make_catalog("fs", tmp_path)
    out = run_sql(spark, cat,
                  "CREATE NAMESPACE db WITH PROPERTIES ('owner'='me')")
    assert out.collect()[0]["created"] is True
    # idempotent via IF NOT EXISTS; plain re-create raises
    assert run_sql(spark, cat, "CREATE NAMESPACE IF NOT EXISTS db") \
        .collect()[0]["created"] is False
    with pytest.raises(ValueError):
        run_sql(spark, cat, "CREATE NAMESPACE db")

    run_sql(spark, cat,
            "ALTER NAMESPACE db SET PROPERTIES ('owner'='you', 'tier'='2')")
    run_sql(spark, cat, "ALTER NAMESPACE db UNSET PROPERTIES ('tier')")
    desc = {r["info_name"]: r["info_value"] for r in
            run_sql(spark, cat, "DESCRIBE NAMESPACE db").collect()}
    assert desc == {"namespace": "db", "owner": "you"}

    assert [r["namespace"] for r in
            run_sql(spark, cat, "SHOW NAMESPACES").collect()] == ["db"]
    assert run_sql(spark, cat, "DROP NAMESPACE db") \
        .collect()[0]["dropped"] is True
    assert run_sql(spark, cat, "DROP SCHEMA IF EXISTS db") \
        .collect()[0]["dropped"] is False
    with pytest.raises(NoSuchNamespace):
        run_sql(spark, cat, "DROP DATABASE db")


@pytest.fixture
def remote_catalogs(tmp_path):
    """Glue / HMS / S3Tables over their in-process wire-protocol fakes
    (single-level namespaces; S3Tables carries no namespace properties)."""
    from iceberg_rust_spark.sources.glue import GlueCatalog
    from iceberg_rust_spark.sources.hms import HmsCatalog
    from iceberg_rust_spark.sources.s3tables import S3TablesCatalog
    from tests.fake_aws import ACCESS, SECRET, FakeGlue, FakeS3Tables
    from tests.fake_hms import FakeHms

    servers = []
    glue = FakeGlue(); servers.append(glue)
    cats = {"glue": GlueCatalog(glue.start(), str(tmp_path / "wh_glue"),
                                region="us-west-2", access_key=ACCESS,
                                secret_key=SECRET)}
    hms = FakeHms(); servers.append(hms)
    cats["hms"] = HmsCatalog(hms.start(), str(tmp_path / "wh_hms"))
    s3t = FakeS3Tables(str(tmp_path / "buckets")); servers.append(s3t)
    cats["s3tables"] = S3TablesCatalog(
        s3t.start(),
        "arn:aws:s3tables:us-east-1:111122223333:bucket/test-bucket",
        access_key=ACCESS, secret_key=SECRET)
    yield cats
    cats["hms"].close()
    for s in servers:
        s.stop()


def test_remote_catalog_namespace_lifecycle(remote_catalogs):
    for kind, cat in remote_catalogs.items():
        assert not cat.namespace_exists("nsx"), kind
        with pytest.raises(NoSuchNamespace):
            cat.namespace_properties("nsx")
        with pytest.raises(NoSuchNamespace):
            cat.drop_namespace("nsx")
        cat.create_namespace("nsx", {} if kind == "s3tables"
                             else {"owner": "me", "stale": "x"})
        assert cat.namespace_exists("nsx"), kind
        assert "nsx" in cat.list_namespaces(), kind
        if kind == "s3tables":
            assert cat.namespace_properties("nsx") == {}
            with pytest.raises(NotImplementedError):
                cat.update_namespace("nsx", updates={"a": "1"})
        else:
            props = cat.namespace_properties("nsx")
            assert props["owner"] == "me" and props["stale"] == "x", kind
            cat.update_namespace("nsx", updates={"owner": "you"},
                                 removals=["stale"])
            props = cat.namespace_properties("nsx")
            assert props["owner"] == "you" and "stale" not in props, kind
        cat.drop_namespace("nsx")
        assert not cat.namespace_exists("nsx"), kind


def test_remote_catalog_drop_refuses_non_empty(remote_catalogs, spark):
    from iceberg_rust_spark import Table
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    for kind, cat in remote_catalogs.items():
        cat.create_namespace("db2")
        Table.create(cat, "db2.t", schema_from_spark(df.schema))
        with pytest.raises(NamespaceNotEmpty):
            cat.drop_namespace("db2")
        cat.drop_table("db2.t")
        cat.drop_namespace("db2")
        assert not cat.namespace_exists("db2"), kind
