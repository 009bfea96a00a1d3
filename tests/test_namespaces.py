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
    resp = cat.update_namespace("db", updates={"a": "9", "c": "3"},
                                removals=["b", "ghost"])
    assert resp == {"updated": ["a", "c"], "removed": ["b"],
                    "missing": ["ghost"]}
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
