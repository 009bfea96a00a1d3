"""REST catalog protocol (sources/rest.py, counterpart of
catalog/rest/src/catalog.rs + catalog/memory/src/catalog.rs): the full Table
write/read workflow runs over the wire protocol — create/load travel as
LoadTableResult JSON, commits as {"requirements", "updates"} applied
server-side through updates.apply_updates — plus the diff→apply identity
invariant and optimistic-concurrency conflict mapping."""

import json
import uuid

import pyspark.sql.functions as F
import pytest

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.catalog import (CommitConflict, NoSuchTable,
                                                TableAlreadyExists)
from iceberg_rust_spark.sources.metadata import TableMetadata
from iceberg_rust_spark.sources.rest import (MemoryCatalog, RestCatalog,
                                             RestCatalogServer, diff_metadata,
                                             guard_requirements,
                                             apply_updates_ext)
from iceberg_rust_spark.sources.types import schema_from_spark


@pytest.fixture()
def rest(tmp_path):
    backing = MemoryCatalog(str(tmp_path / f"wh_{uuid.uuid4().hex[:6]}"))
    server = RestCatalogServer(backing)
    return RestCatalog(transport=server), backing


def _canon(md: TableMetadata) -> dict:
    d = json.loads(md.to_json())
    # server-managed fields excluded from the diff protocol by design
    d.pop("last-updated-ms", None)
    d.pop("metadata-log", None)
    return d


def _make_table(spark, catalog, ident="db.t"):
    catalog.create_namespace("db")
    df = spark.range(10).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 3).cast("int").alias("grp"),
        F.concat(F.lit("row-"), F.col("id")).alias("name"))
    t = Table.create(catalog, ident, schema_from_spark(df.schema))
    return t, df


# ------------------------------------------------------------ diff identity
def test_diff_apply_identity_append(spark, rest, tmp_path):
    cat, backing = rest
    t, df = _make_table(spark, cat)
    base, _ = backing.load_table("db.t")
    t.append(spark, df)
    new, _ = backing.load_table("db.t")
    updates = diff_metadata(base, new)
    assert {"add-snapshot", "set-snapshot-ref"} <= {u["action"] for u in updates}
    replayed = apply_updates_ext(base, updates)
    assert _canon(replayed) == _canon(new)


def test_diff_apply_identity_schema_and_props(spark, rest):
    cat, backing = rest
    t, df = _make_table(spark, cat)
    base, _ = backing.load_table("db.t")
    t = t.update_schema().add_column("extra", "double").commit()
    t = t.update_properties({"owner": "tests",
                             "write.target-file-size-bytes": "1048576"})
    new, _ = backing.load_table("db.t")
    replayed = apply_updates_ext(base, diff_metadata(base, new))
    assert _canon(replayed) == _canon(new)


def test_guard_requirements_pin_branch(spark, rest):
    cat, backing = rest
    t, df = _make_table(spark, cat)
    t.append(spark, df)
    base, _ = backing.load_table("db.t")
    t.append(spark, df)
    new, _ = backing.load_table("db.t")
    updates = diff_metadata(base, new)
    reqs = guard_requirements(base, updates)
    by_type = {r["type"]: r for r in reqs}
    assert by_type["assert-table-uuid"]["uuid"] == base.table_uuid
    assert by_type["assert-ref-snapshot-id"]["snapshot-id"] == \
        base.current_snapshot_id


# ------------------------------------------------------- end-to-end workflow
def test_workflow_over_rest(spark, rest):
    cat, _ = rest
    t, df = _make_table(spark, cat)
    t = t.append(spark, df)
    got = t.to_df(spark)
    assert got.count() == 10
    # second append + read back
    t = t.append(spark, df.where(F.col("id") < 3))
    assert t.to_df(spark).count() == 13
    # COW delete over the wire
    t = t.delete_where(spark, E.col("grp") == 1, mode="cow")
    remaining = t.to_df(spark)
    assert remaining.where(F.col("grp") == 1).count() == 0
    # time travel to the first snapshot still works (snapshots carried in
    # metadata round-tripped through wire JSON)
    first = t.metadata.snapshots[0].snapshot_id
    assert t.to_df(spark, snapshot_id=first).count() == 10


def test_table_crud_over_rest(spark, rest):
    cat, _ = rest
    t, df = _make_table(spark, cat)
    assert cat.list_namespaces() == ["db"]
    assert cat.list_tables("db") == ["t"]
    assert cat.table_exists("db.t") and not cat.table_exists("db.nope")
    with pytest.raises(TableAlreadyExists):
        _make_table(spark, cat)
    cat.rename_table("db.t", "db.t2")
    assert cat.list_tables("db") == ["t2"]
    md, v = cat.load_table("db.t2")
    assert md.table_uuid == t.metadata.table_uuid
    cat.drop_table("db.t2")
    with pytest.raises(NoSuchTable):
        cat.load_table("db.t2")


def test_conflict_retry_over_rest(spark, rest, tmp_path):
    """Two clients race on one table: the loser's requirements fail with 409,
    Table._commit_retry refreshes through the REST client and lands both."""
    cat, backing = rest
    t1, df = _make_table(spark, cat)
    t1 = t1.append(spark, df)
    # a second, independent client with its own base cache
    cat2 = RestCatalog(transport=RestCatalogServer(backing))
    t2 = Table.load(cat2, "db.t")
    t1 = t1.append(spark, df.where(F.col("id") < 2))   # moves the branch head
    t2 = t2.append(spark, df.where(F.col("id") >= 8))  # stale base -> retry
    final = Table.load(cat, "db.t").to_df(spark)
    assert final.count() == 10 + 2 + 2


def test_conflict_without_retry_raises(spark, rest):
    cat, backing = rest
    t, df = _make_table(spark, cat)
    base, version = backing.load_table("db.t")
    t = t.append(spark, df)
    # replay a commit against the stale version directly at the server
    server = RestCatalogServer(backing)
    new = apply_updates_ext(base, [{"action": "set-properties",
                                    "updates": {"x": "1"}}])
    status, body = server("POST", "v1/namespaces/db/tables/t", {
        "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main"}],
        "updates": [{"action": "set-properties", "updates": {"x": "1"}}]})
    assert status == 409  # main exists now; requirement said it must not


def test_next_row_id_extension(spark, rest):
    cat, backing = rest
    t, df = _make_table(spark, cat, "db.v3t")
    base, _ = backing.load_table("db.v3t")
    new = apply_updates_ext(base, [{"action": "set-next-row-id",
                                    "next-row-id": 42}])
    assert new.next_row_id == 42
    from iceberg_rust_spark.sources.updates import RequirementFailed
    with pytest.raises(RequirementFailed):
        apply_updates_ext(new, [{"action": "set-next-row-id",
                                 "next-row-id": 7}])


def _loopback_available() -> bool:
    import socket
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.bind(("127.0.0.1", 0))
        s.close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _loopback_available(),
                    reason="no loopback socket in this sandbox")
def test_workflow_over_real_http(spark, tmp_path):
    """End-to-end over a REAL HTTP socket: RestCatalog(uri=...) -> urllib
    transport -> ThreadingHTTPServer -> RestCatalogServer. Exercises the
    deployment binding (catalog.rs:372 equivalent), not just the in-process
    transport duck-typing."""
    from iceberg_rust_spark.sources.rest import serve_http

    backing = MemoryCatalog(str(tmp_path / f"wh_{uuid.uuid4().hex[:6]}"))
    uri, shutdown = serve_http(RestCatalogServer(backing))
    try:
        cat = RestCatalog(uri=uri)
        t, df = _make_table(spark, cat, ident="db.http_t")
        t = t.append(spark, df)
        assert t.to_df(spark).count() == 10
        t = t.delete_where(spark, E.col("grp") == 1, mode="cow")
        assert t.to_df(spark).where(F.col("grp") == 1).count() == 0
        # catalog surface over HTTP, including the HEAD-based existence probe
        assert cat.table_exists("db.http_t")
        assert not cat.table_exists("db.nope")
        assert "db" in cat.list_namespaces()
        # conflict surfaces as CommitFailedException -> CommitConflict
        cat2 = RestCatalog(uri=uri)
        t2 = Table(cat2, "db.http_t", *cat2.load_table("db.http_t"))
        t2.append(spark, df.where(F.col("id") < 2))
        t.refresh()
        assert t.to_df(spark).count() == t2.to_df(spark).count()
    finally:
        shutdown()


def test_register_table_over_rest(spark, tmp_path):
    """REST register route (reference catalog.rs:997-1050): adopt an
    existing table by metadata path over the wire; reads and commits work
    and the load result reports the EXTERNAL metadata location."""
    import glob

    from iceberg_rust_spark import FileSystemCatalog
    from iceberg_rust_spark.sources.catalog import TableAlreadyExists
    from iceberg_rust_spark.sources.types import schema_from_spark

    src = FileSystemCatalog(str(tmp_path / "src_wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    Table.create(src, "db.orig", schema_from_spark(df.schema)) \
        .append(spark, df)
    md_file = sorted(glob.glob(
        str(tmp_path / "src_wh/db/orig/metadata/v*.metadata.json")))[-1]

    backing = MemoryCatalog(str(tmp_path / "wh"))
    backing.create_namespace("db")
    cat = RestCatalog(transport=RestCatalogServer(backing))
    md = cat.register_table("db.ext", md_file)
    assert md.current_snapshot() is not None
    t = Table.load(cat, "db.ext")
    assert t.to_df(spark).count() == 2
    t.append(spark, df)
    assert Table.load(cat, "db.ext").to_df(spark).count() == 4
    with pytest.raises(Exception):
        cat.register_table("db.ext", md_file)


def test_rest_client_retries_transient_503(spark, tmp_path):
    """502/503/504 retry with backoff; the request succeeds once the
    gateway recovers. Registering a SqlCatalog-style uuid-named pointer
    also parses (shared pointer-version parser)."""
    import glob

    from iceberg_rust_spark import FileSystemCatalog, SqlCatalog
    from iceberg_rust_spark.sources.types import schema_from_spark

    backing = MemoryCatalog(str(tmp_path / "wh"))
    backing.create_namespace("db")
    real = RestCatalogServer(backing)
    flaky = {"n": 0}

    def transport(method, path, body):
        flaky["n"] += 1
        if flaky["n"] <= 2:
            return 503, {"error": {"message": "gateway warming",
                                   "type": "ServiceUnavailable"}}
        return real(method, path, body)

    cat = RestCatalog(transport=transport)
    assert cat.list_namespaces() == ["db"]   # survived two 503s
    # call 1-2: 503s eaten by the retry loop (inside the lazy /v1/config
    # bootstrap), call 3: config succeeds, call 4: the list itself
    assert flaky["n"] == 4

    # uuid-named external pointer registers and version-parses
    sq = SqlCatalog(str(tmp_path / "c.db"), str(tmp_path / "wh_sql"))
    df = spark.createDataFrame([(1,)], "id long")
    Table.create(sq, "db.src", schema_from_spark(df.schema)).append(spark, df)
    ptr = sq._pointer("db.src")
    md = cat.register_table("db.linked", ptr)
    assert md.current_snapshot() is not None
    assert Table.load(cat, "db.linked").to_df(spark).count() == 1


def test_oauth2_client_credentials_over_real_http(spark, tmp_path):
    """OAuth2 client-credentials flow (client.rs:33-65 / REST spec
    POST /v1/oauth/tokens): the client fetches a bearer token lazily,
    sends it on every route (incl. the HEAD existence probe), re-auths
    once on 401, and bad credentials / missing tokens are rejected."""
    from iceberg_rust_spark.sources.rest import serve_http

    backing = MemoryCatalog(str(tmp_path / f"wh_{uuid.uuid4().hex[:6]}"))
    uri, shutdown = serve_http(RestCatalogServer(backing),
                               oauth_credential=("svc", "s3cret"))
    try:
        # unauthenticated client: every call 401s
        anon = RestCatalog(uri=uri)
        with pytest.raises(PermissionError):
            anon.create_namespace("db")
        # bad secret: token fetch itself fails
        bad = RestCatalog(uri=uri, credential="svc:wrong")
        with pytest.raises(PermissionError):
            bad.list_namespaces()
        # good credential: full table workflow
        cat = RestCatalog(uri=uri, credential="svc:s3cret")
        t, df = _make_table(spark, cat, ident="db.oauth_t")
        t = t.append(spark, df)
        assert t.to_df(spark).count() == 10
        assert cat.table_exists("db.oauth_t")
        # token revocation mid-session: client re-auths once and succeeds
        cat._token = "revoked-token"
        assert "db" in cat.list_namespaces()
        # static pre-issued token path: server only accepts ISSUED tokens
        static = RestCatalog(uri=uri, token=cat._token)
        assert static.table_exists("db.oauth_t")
    finally:
        shutdown()


def test_config_prefix_and_paginated_lists(spark, tmp_path):
    """GET /v1/config bootstrap (catalog.rs:458): overrides carry a
    `prefix` that re-roots every catalog route at v1/{prefix}/..., and
    list routes paginate via pageToken / next-page-token (catalog.rs:588)
    — the client drains all pages transparently."""
    from iceberg_rust_spark.sources.rest import serve_http

    backing = MemoryCatalog(str(tmp_path / f"wh_{uuid.uuid4().hex[:6]}"))
    server = RestCatalogServer(backing, prefix="prod-catalog", page_size=3)
    uri, shutdown = serve_http(server)
    try:
        cat = RestCatalog(uri=uri, warehouse="prod")
        cat.create_namespace("db")
        t, df = _make_table(spark, cat, ident="db.t0")
        t.append(spark, df)
        for i in range(1, 8):   # 8 tables total: 3 pages at page_size=3
            _make_table(spark, cat, ident=f"db.t{i}")
        assert cat._prefix == "prod-catalog"
        assert cat.list_tables("db") == [f"t{i}" for i in range(8)]
        assert cat.list_namespaces() == ["db"]
        # loads/commits work through the prefixed routes too
        assert cat.table_exists("db.t0")
        got = Table(cat, "db.t0", *cat.load_table("db.t0")).to_df(spark)
        assert got.count() == 10
        # an unprefixed client is rejected by a prefix-requiring server
        status, _ = server("GET", "v1/namespaces", None)
        assert status == 404
    finally:
        shutdown()
