"""ViewMetadataBuilder validation parity.

Table-driven mirrors of the reference's in-file builder tests
(crates/iceberg/src/spec/view_metadata_builder.rs:680-1480): same base
fixture shape (ViewMetadataV1Valid.json), same expected ids, changes, and
rejections. No Spark session needed — pure metadata state machine.
"""

import pytest

from iceberg_rust_spark.sources.view_builder import (
    EMPTY_SCHEMA, INITIAL_VIEW_VERSION_ID, LAST_ADDED,
    PROP_DROP_DIALECT_ALLOWED, PROP_VERSION_HISTORY_SIZE, ViewBuildError,
    ViewMetadataBuilder)
from iceberg_rust_spark.sources.views import ViewMetadata, ViewVersion

TS = 1573518431300

BASE_JSON = """{
  "view-uuid": "fa6506c3-7681-40c8-86dc-e36561f83385",
  "format-version": 1,
  "location": "s3://bucket/warehouse/default.db/event_agg",
  "current-version-id": 1,
  "properties": {"comment": "Daily event counts"},
  "versions": [{
      "version-id": 1, "timestamp-ms": 1573518431292, "schema-id": 1,
      "default-catalog": "prod", "default-namespace": ["default"],
      "summary": {"engine-name": "Spark"},
      "representations": [{"type": "sql",
        "sql": "SELECT COUNT(1) FROM events", "dialect": "spark"}]}],
  "schemas": [{"schema-id": 1, "type": "struct", "fields": [
      {"id": 1, "name": "event_count", "required": false, "type": "int"},
      {"id": 2, "name": "event_date", "required": false, "type": "date"}]}],
  "version-log": [{"timestamp-ms": 1573518431292, "version-id": 1}]
}"""


def base_metadata() -> ViewMetadata:
    return ViewMetadata.from_json(BASE_JSON)


def builder_without_changes() -> ViewMetadataBuilder:
    # builder_without_changes (:677)
    return ViewMetadataBuilder(base_metadata())


def new_view_version(vid, schema_id, sql, dialects=("spark",)):
    # new_view_version_with_dialect (:647)
    return ViewVersion(
        vid, TS, sql, dialects[0], "default",
        summary={"user": "some-user"},
        representations=[{"type": "sql", "sql": sql, "dialect": d}
                         for d in dialects],
        schema_id=schema_id, default_catalog="prod")


def actions(changes):
    return [c["action"] for c in changes]


def test_minimal_builder():
    # :682 — version and schema ids are reassigned; 5 changes
    schema = {"schema-id": 1, "type": "struct", "fields": []}
    version = new_view_version(20, 21, "select 1 as count")
    builder = ViewMetadataBuilder.new("s3://bucket/table", schema, version,
                                      {"key": "value"})
    md, changes = builder.build()
    assert md.location == "s3://bucket/table"
    assert md.current_version_id == INITIAL_VIEW_VERSION_ID
    assert md.properties == {"key": "value"}
    assert len(md.versions) == 1 and len(md.schemas) == 1
    assert len(md.version_log) == 1
    stored = md.version_by_id(INITIAL_VIEW_VERSION_ID)
    assert stored.version_id == 1 and stored.schema_id == 0
    assert len(changes) == 5
    assert {"action": "set-location",
            "location": "s3://bucket/table"} in changes
    added = next(c for c in changes if c["action"] == "add-view-version")
    assert added["view-version"]["version-id"] == 1
    assert added["view-version"]["schema-id"] == LAST_ADDED
    assert {"action": "set-current-view-version",
            "view-version-id": LAST_ADDED} in changes
    schema_change = next(c for c in changes if c["action"] == "add-schema")
    assert schema_change["schema"]["schema-id"] == 0
    assert schema_change["last-column-id"] == 0
    assert {"action": "set-properties",
            "updates": {"key": "value"}} in changes


def test_version_expiration():
    # :744 — versions added by THIS builder are never expired; a rebuilt
    # (change-free) builder trims to the limit, always keeping current
    v1 = new_view_version(0, 1, "select 1 as count")
    v2 = new_view_version(0, 1, "select count(1) as count from t2")
    v3 = new_view_version(0, 1, "select count from t1")

    def fresh():
        return (builder_without_changes()
                .add_version(v1).add_version(v2).add_version(v3))

    md_no_limit, _ = fresh().build()
    assert {v.version_id for v in md_no_limit.versions} == {1, 2, 3, 4}

    b = fresh().set_properties({PROP_VERSION_HISTORY_SIZE: "2"})
    md, _ = b.build()
    # 3 added in this build + current are all kept despite limit 2
    assert {v.version_id for v in md.versions} == {1, 2, 3, 4}
    assert len(md.version_log) == 1

    # a new builder over the built metadata has no in-flight additions
    b2 = ViewMetadataBuilder(md_no_limit).set_properties(
        {PROP_VERSION_HISTORY_SIZE: "2"})
    md2, _ = b2.build()
    # newest two would be {3, 4} but current (1) displaces the lowest kept
    assert {v.version_id for v in md2.versions} == {1, 4}

    b3 = ViewMetadataBuilder(md_no_limit).set_properties(
        {PROP_VERSION_HISTORY_SIZE: "0"})
    md3, _ = b3.build()
    # keep >= 1, and that one is the current version
    assert {v.version_id for v in md3.versions} == {1}


def test_negative_history_size_rejected():
    # :420-443 — parseable negatives rejected at set_properties time
    with pytest.raises(ViewBuildError, match="positive"):
        builder_without_changes().set_properties(
            {PROP_VERSION_HISTORY_SIZE: "-3"})
    # unparseable values fall back to the default silently
    md, _ = (builder_without_changes()
             .set_properties({PROP_VERSION_HISTORY_SIZE: "not-a-number"})
             .build())
    assert md.properties[PROP_VERSION_HISTORY_SIZE] == "not-a-number"


def test_update_version_log_truncates_at_gaps():
    # :818 — an expired id in the log drops everything up to and incl. it
    def run(log_ids, keep_ids):
        md = base_metadata()
        md.versions = [new_view_version(i, 1, f"q{i}").replaced(version_id=i)
                       for i in keep_ids]
        md.current_version_id = md.versions[0].version_id
        md.version_log = [{"version-id": i, "timestamp-ms": TS + i}
                          for i in log_ids]
        b = ViewMetadataBuilder(md)
        b._update_version_log()
        return [e["version-id"] for e in b.metadata.version_log]

    assert run([1, 2, 3], [1, 2, 3]) == [1, 2, 3]
    # 1 expired: all previous entries removed
    assert run([3, 2, 1, 2, 3], [2, 3]) == [2, 3]
    # 2 expired: suffix after its last occurrence survives
    assert run([1, 2, 3, 1, 3], [1, 3]) == [3, 1, 3]


def test_use_previously_added_version():
    # :867 — log uses the version's own timestamp when added in the same
    # change set, a fresh timestamp when re-pointing to an old version
    v2 = new_view_version(2, 1, "select 1 as count")
    v3 = new_view_version(3, 1, "select count(1) as count from t2")
    schema = dict(EMPTY_SCHEMA)

    md_v2, _ = (builder_without_changes()
                .set_current_version(v2, schema).build())
    assert md_v2.version_log[-1] == {"version-id": 2, "timestamp-ms": TS}

    md_v3, _ = (ViewMetadataBuilder(md_v2)
                .set_current_version(v3, schema).build())
    assert md_v3.version_log[1:] == [
        {"version-id": 2, "timestamp-ms": TS},
        {"version-id": 3, "timestamp-ms": TS}]

    md_v4, _ = (ViewMetadataBuilder(md_v3)
                .set_current_version_id(2).build())
    entry = md_v4.version_log[-1]
    assert entry["version-id"] == 2 and entry["timestamp-ms"] > TS


def test_assign_uuid():
    # :915
    md, changes = builder_without_changes().assign_uuid("new-uuid").build()
    assert md.view_uuid == "new-uuid"
    assert changes == [{"action": "assign-uuid", "uuid": "new-uuid"}]


def test_set_location_strips_trailing_slash():
    # :924 + set_location (:166)
    md, changes = (builder_without_changes()
                   .set_location("s3://bucket/table///").build())
    assert md.location == "s3://bucket/table"
    assert changes == [{"action": "set-location",
                        "location": "s3://bucket/table"}]


def test_set_and_remove_properties():
    # :939 — removals of absent keys are recorded but harmless
    md, changes = (builder_without_changes()
                   .set_properties({"key1": "value1", "key2": "value2"})
                   .remove_properties(["key2", "key3"]).build())
    assert md.properties.get("key1") == "value1"
    assert "key2" not in md.properties
    assert changes == [
        {"action": "set-properties",
         "updates": {"key1": "value1", "key2": "value2"}},
        {"action": "remove-properties", "removals": ["key2", "key3"]}]


def test_add_schema_assigns_and_reuses_ids():
    # :968 — new empty schema gets id 2 (highest existing is 1); adding
    # the same schema again reuses the id and adds nothing
    schema = {"schema-id": 1, "type": "struct", "fields": []}
    md, changes = builder_without_changes().add_schema(schema).build()
    assert len(md.schemas) == 2
    assert changes == [{"action": "add-schema",
                        "schema": {"type": "struct", "fields": [],
                                   "schema-id": 2},
                        "last-column-id": 0}]
    md2, _ = ViewMetadataBuilder(md).add_schema(schema).build()
    assert len(md2.schemas) == 2


def test_add_and_set_current_version():
    # :992 — explicit ids are reassigned; the second version's schema-id
    # is emitted as -1 (references the schema added in the same change set)
    v1 = new_view_version(2, 1, "select 1 as count")
    v2 = new_view_version(3, 2, "select count(1) as count from t2")
    v2_schema = {"schema-id": 2, "type": "struct", "fields": []}
    md, changes = (builder_without_changes()
                   .add_version(v1)
                   .add_schema(v2_schema)
                   .add_version(v2)
                   .set_current_version_id(3).build())
    assert md.current_version_id == 3
    assert len(md.versions) == 3 and len(md.schemas) == 2
    assert len(md.version_log) == 2
    assert md.version_by_id(2).schema_id == 1
    assert md.version_by_id(3).schema_id == 2
    assert actions(changes) == ["add-view-version", "add-schema",
                                "add-view-version",
                                "set-current-view-version"]
    assert changes[0]["view-version"]["schema-id"] == 1
    assert changes[2]["view-version"]["schema-id"] == LAST_ADDED
    assert changes[3]["view-version-id"] == LAST_ADDED
    assert [e["version-id"] for e in md.version_log] == [1, 3]


def test_schema_and_version_id_reassignment():
    # :1054 — same outcome when set_current_version adds both at once
    v1 = new_view_version(0, 1, "select 1 as count")
    v2 = new_view_version(0, 2, "select count(1) as count from t2")
    v2_schema = {"schema-id": 0, "type": "struct", "fields": []}
    md, changes = (builder_without_changes()
                   .add_version(v1)
                   .set_current_version(v2, v2_schema).build())
    assert md.current_version_id == 3
    assert len(md.versions) == 3 and len(md.schemas) == 2
    assert md.version_by_id(2).schema_id == 1
    assert md.version_by_id(3).schema_id == 2
    assert actions(changes) == ["add-view-version", "add-schema",
                                "add-view-version",
                                "set-current-view-version"]
    assert [e["version-id"] for e in md.version_log] == [1, 3]


def test_view_version_deduplication():
    # :1113 — adding identical content twice creates one version
    v1 = new_view_version(0, 1, "select * from ns.tbl")
    md, _ = (builder_without_changes()
             .add_version(v1).add_version(v1).build())
    assert len(md.versions) == 2 and len(md.schemas) == 1


def test_version_and_schema_dedup_roundtrip():
    # :1129 — cycling through three (version, schema) pairs twice reuses
    # every id instead of minting new ones
    schemas = [{"schema-id": sid, "type": "struct",
                "fields": [{"id": 1, "name": n, "required": True,
                            "type": "long"}]}
               for sid, n in ((5, "x"), (7, "y"), (9, "z"))]
    versions = [new_view_version(1, s["schema-id"], q) for s, q in
                zip(schemas, ("select * from ns.tbl",
                              "select count(*) from ns.tbl",
                              "select count(*) as count from ns.tbl"))]
    b = builder_without_changes()
    for s in schemas:
        b = b.add_schema(s)
    for v, s in list(zip(versions, schemas)) + list(
            zip(versions[::-1], schemas[::-1])):
        b = b.set_current_version(v, s)
    md, _ = b.build()
    assert md.current_version_id == 2  # v1 got id 2 on first add
    assert len(md.versions) == 4      # base + three distinct
    assert len(md.schemas) == 4       # base + three distinct


def test_add_version_unknown_schema_rejected():
    # :294-300
    v = new_view_version(0, 99, "select 1")
    with pytest.raises(ViewBuildError, match="unknown schema: 99"):
        builder_without_changes().add_version(v)


def test_add_version_last_added_schema_without_add_rejected():
    # :283-289
    v = new_view_version(0, LAST_ADDED, "select 1")
    with pytest.raises(ViewBuildError, match="no schema has been added"):
        builder_without_changes().add_version(v)


def test_set_current_version_id_validations():
    # :183-206
    with pytest.raises(ViewBuildError, match="no version has been added"):
        builder_without_changes().set_current_version_id(LAST_ADDED)
    with pytest.raises(ViewBuildError, match="unknown version"):
        builder_without_changes().set_current_version_id(42)


def test_duplicate_dialects_rejected():
    # :614-631 — dialect uniqueness is case-insensitive
    v = ViewVersion(0, TS, "select 1", "spark", "default",
                    representations=[
                        {"type": "sql", "sql": "a", "dialect": "spark"},
                        {"type": "sql", "sql": "b", "dialect": "SPARK"}],
                    schema_id=1)
    with pytest.raises(ViewBuildError, match="multiple queries"):
        builder_without_changes().add_version(v)


def test_timestamp_clock_skew_guard():
    # :304-323 — more than a minute before the last log entry is invalid;
    # within a minute is tolerated
    base_ts = base_metadata().version_log[-1]["timestamp-ms"]
    too_old = new_view_version(0, 1, "select 1")
    too_old.timestamp_ms = base_ts - 61_000
    with pytest.raises(ViewBuildError, match="before last snapshot"):
        builder_without_changes().add_version(too_old)
    ok = new_view_version(0, 1, "select 1")
    ok.timestamp_ms = base_ts - 59_000
    builder_without_changes().add_version(ok)  # no raise


def test_dialect_drop_guard_on_build():
    # :576-602 — replacement must keep every previous dialect unless the
    # property allows dropping
    multi = new_view_version(0, 1, "select 1", dialects=("spark", "trino"))
    md, _ = (builder_without_changes()
             .set_current_version(multi, dict(EMPTY_SCHEMA)).build())
    spark_only = new_view_version(0, 1, "select 2")
    with pytest.raises(ViewBuildError, match="loss of view dialects"):
        ViewMetadataBuilder(md).set_current_version(
            spark_only, dict(EMPTY_SCHEMA)).build()
    md.properties[PROP_DROP_DIALECT_ALLOWED] = "true"
    md2, _ = ViewMetadataBuilder(md).set_current_version(
        spark_only, dict(EMPTY_SCHEMA)).build()
    assert md2.current_version().dialects() == {"spark"}


def test_format_version_downgrade_rejected():
    # :143
    with pytest.raises(ViewBuildError, match="Cannot downgrade"):
        builder_without_changes().upgrade_format_version(0)
    b = builder_without_changes().upgrade_format_version(1)  # no-op
    assert b.changes == []


def test_build_validates_current_version_and_schema():
    # view_metadata.rs:165 validate()
    md = base_metadata()
    md.current_version_id = 5
    with pytest.raises(ViewBuildError, match="current version id 5"):
        ViewMetadataBuilder(md).build()
    md2 = base_metadata()
    md2.schemas = []
    with pytest.raises(ViewBuildError, match="schema id 1"):
        ViewMetadataBuilder(md2).build()


def test_metadata_json_roundtrip_spec_shape():
    # the fixture shape survives a load -> store -> load cycle
    md = base_metadata()
    again = ViewMetadata.from_json(md.to_json())
    assert again.current_version().default_namespace == "default"
    assert again.current_version().default_catalog == "prod"
    assert again.current_version().schema_id == 1
    assert again.schemas == md.schemas
    assert again.version_log == md.version_log
