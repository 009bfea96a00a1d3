"""Commit-protocol IR: TableUpdate appliers, TableRequirement checks,
and the end-to-end REST-shape commit through the catalog CAS."""

import pytest

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.metadata import (PartitionSpec, Snapshot,
                                                 TableMetadata)
from iceberg_rust_spark.sources.types import LONG, STRING, NestedField, Schema
from iceberg_rust_spark.sources.updates import (InvalidUpdate,
                                                RequirementFailed,
                                                apply_updates,
                                                check_requirement)


def _md() -> TableMetadata:
    schema = Schema([NestedField(1, "id", LONG, True),
                     NestedField(2, "name", STRING, False)], schema_id=0)
    return TableMetadata(location="/tmp/t", schemas=[schema],
                         current_schema_id=0,
                         partition_specs=[PartitionSpec(0, [])],
                         default_spec_id=0, last_column_id=2)


def test_requirements_pass_and_fail():
    md = _md()
    check_requirement(md, {"type": "assert-table-uuid", "uuid": md.table_uuid})
    check_requirement(md, {"type": "assert-current-schema-id",
                           "current-schema-id": 0})
    check_requirement(md, {"type": "assert-last-assigned-field-id",
                           "last-assigned-field-id": 2})
    check_requirement(None, {"type": "assert-create"})
    with pytest.raises(RequirementFailed):
        check_requirement(md, {"type": "assert-create"})
    with pytest.raises(RequirementFailed):
        check_requirement(md, {"type": "assert-table-uuid", "uuid": "nope"})
    with pytest.raises(RequirementFailed):
        check_requirement(None, {"type": "assert-table-uuid", "uuid": "x"})
    # ref requirement: absent ref asserted absent passes; asserted present fails
    check_requirement(md, {"type": "assert-ref-snapshot-id", "ref": "main",
                           "snapshot-id": None})
    with pytest.raises(RequirementFailed):
        check_requirement(md, {"type": "assert-ref-snapshot-id", "ref": "main",
                               "snapshot-id": 42})


def test_schema_updates_with_last_added_sentinel():
    md = _md()
    new_schema = Schema([NestedField(1, "id", LONG, True),
                         NestedField(2, "name", STRING, False),
                         NestedField(3, "extra", STRING, False)], schema_id=1)
    out = apply_updates(md, [
        {"action": "add-schema", "schema": new_schema},
        {"action": "set-current-schema", "schema-id": -1},
    ])
    assert out.current_schema_id == 1
    assert out.last_column_id == 3
    assert md.current_schema_id == 0  # original untouched
    with pytest.raises(InvalidUpdate):
        apply_updates(out, [{"action": "add-schema", "schema": new_schema}])
    with pytest.raises(InvalidUpdate):
        apply_updates(md, [{"action": "set-current-schema", "schema-id": -1}])


def test_snapshot_ref_and_remove_protection():
    md = _md()
    snap = Snapshot(snapshot_id=101, sequence_number=1, timestamp_ms=1000,
                    manifest_list="/tmp/t/metadata/ml.parquet",
                    summary={"operation": "append"}, schema_id=0)
    out = apply_updates(md, [
        {"action": "add-snapshot", "snapshot": snap},
        {"action": "set-snapshot-ref", "ref-name": "main",
         "snapshot-id": 101, "type": "branch"},
    ])
    assert out.current_snapshot_id == 101
    assert out.refs["main"].snapshot_id == 101
    # reference semantics (remove_snapshots:487-511): removing a referenced
    # snapshot drops the now-dangling ref with it; main's drop also clears
    # current_snapshot_id
    out2 = apply_updates(out, [{"action": "remove-snapshots",
                                "snapshot-ids": [101]}])
    assert out2.snapshots == [] and out2.refs == {}
    assert out2.current_snapshot_id is None
    # explicit ref removal also works, keeping the snapshot itself
    out3 = apply_updates(out, [
        {"action": "remove-snapshot-ref", "ref-name": "main"},
    ])
    assert out3.refs == {} and len(out3.snapshots) == 1


def test_properties_specs_and_guards():
    md = _md()
    out = apply_updates(md, [
        {"action": "set-properties", "updates": {"a": "1", "b": "2"}},
        {"action": "remove-properties", "removals": ["a", "zz"]},
        {"action": "upgrade-format-version", "format-version": 3},
        {"action": "set-location", "location": "/tmp/t2"},
    ])
    assert out.properties == {"b": "2"}
    assert out.format_version == 3 and out.location == "/tmp/t2"
    with pytest.raises(InvalidUpdate):
        apply_updates(out, [{"action": "upgrade-format-version",
                             "format-version": 2}])
    with pytest.raises(InvalidUpdate):
        apply_updates(md, [{"action": "remove-partition-specs", "spec-ids": [0]}])
    with pytest.raises(InvalidUpdate):
        apply_updates(md, [{"action": "remove-schemas", "schema-ids": [0]}])
    with pytest.raises(InvalidUpdate):
        apply_updates(md, [{"action": "frobnicate"}])


def test_statistics_and_encryption_keys_roundtrip():
    md = _md()
    out = apply_updates(md, [
        {"action": "set-statistics",
         "statistics": {"snapshot-id": 7, "statistics-path": "/s.puffin",
                        "file-size-in-bytes": 10}},
        {"action": "add-encryption-key",
         "encryption-key": {"key-id": "k1", "encrypted-key-metadata": "AAAA"}},
    ])
    assert out.statistics[0]["snapshot-id"] == 7
    assert out.encryption_keys[0]["key-id"] == "k1"
    # serde roundtrip keeps them
    back = TableMetadata.from_json(out.to_json())
    assert back.statistics == out.statistics
    assert back.encryption_keys == out.encryption_keys
    out2 = apply_updates(out, [
        {"action": "remove-statistics", "snapshot-id": 7},
        {"action": "remove-encryption-key", "key-id": "k1"},
    ])
    assert out2.statistics == [] and out2.encryption_keys == []


def test_commit_updates_through_catalog(spark, warehouse):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    from iceberg_rust_spark.sources.types import schema_from_spark
    t = Table.create(warehouse, "db.proto", schema_from_spark(df.schema))
    t = t.append(spark, df)
    uuid = t.metadata.table_uuid
    t = t.commit_updates(
        updates=[{"action": "set-properties", "updates": {"owner": "etl"}}],
        requirements=[{"type": "assert-table-uuid", "uuid": uuid}])
    assert t.metadata.properties["owner"] == "etl"
    # stale requirement aborts without committing
    with pytest.raises(RequirementFailed):
        t.commit_updates(
            updates=[{"action": "set-properties", "updates": {"x": "1"}}],
            requirements=[{"type": "assert-current-schema-id",
                           "current-schema-id": 99}])
    assert "x" not in t.refresh().metadata.properties


def test_builder_validation_rules():
    """Metadata-builder validation parity (table_metadata_builder.rs rules):
    transform/source-type compatibility, duplicate partition names, reserved
    properties, format-version cap, snapshot schema-id cross-ref."""
    md = _md()
    # incompatible transform: year() on a string column
    with pytest.raises(InvalidUpdate, match="cannot apply"):
        apply_updates(md, [{"action": "add-spec", "spec": {
            "spec-id": 1, "fields": [
                {"source-id": 2, "field-id": 1000, "name": "y",
                 "transform": "year"}]}}])
    # bucket on string IS allowed
    out = apply_updates(md, [{"action": "add-spec", "spec": {
        "spec-id": 1, "fields": [
            {"source-id": 2, "field-id": 1000, "name": "b",
             "transform": "bucket[4]"}]}}])
    assert len(out.partition_specs) == 2
    # duplicate partition field names
    with pytest.raises(InvalidUpdate, match="duplicate partition field"):
        apply_updates(md, [{"action": "add-spec", "spec": {
            "spec-id": 1, "fields": [
                {"source-id": 1, "field-id": 1000, "name": "x",
                 "transform": "identity"},
                {"source-id": 2, "field-id": 1001, "name": "x",
                 "transform": "identity"}]}}])
    # sort order: truncate on long OK, hour on string rejected
    with pytest.raises(InvalidUpdate, match="sort transform"):
        apply_updates(md, [{"action": "add-sort-order", "sort-order": {
            "order-id": 1, "fields": [
                {"source-id": 2, "transform": "hour",
                 "direction": "asc", "null-order": "nulls-last"}]}}])
    # reserved properties
    with pytest.raises(InvalidUpdate, match="reserved"):
        apply_updates(md, [{"action": "set-properties",
                            "updates": {"format-version": "3"}}])
    # format-version cap
    with pytest.raises(InvalidUpdate, match="unsupported format version"):
        apply_updates(md, [{"action": "upgrade-format-version",
                            "format-version": 4}])
    # snapshot referencing an unknown schema id
    snap = Snapshot(snapshot_id=10, sequence_number=1, timestamp_ms=1,
                    manifest_list="/tmp/ml.avro", schema_id=42,
                    summary={"operation": "append"})
    with pytest.raises(InvalidUpdate, match="unknown schema id"):
        apply_updates(md, [{"action": "add-snapshot",
                            "snapshot": snap.to_json()}])


# ---------------------------------------------------------------------------
# builder-rejection truth tables ported from the reference
# (spec/table_metadata_builder.rs tests, r3: the evolution cross-checks)
# ---------------------------------------------------------------------------

def _bucket_md(format_version: int = 2) -> TableMetadata:
    from iceberg_rust_spark.functions.transforms import BucketTransform
    from iceberg_rust_spark.sources.metadata import PartitionField
    schema = Schema([NestedField(1, "data", STRING, True),
                     NestedField(2, "existing_field", LONG, True)], schema_id=0)
    spec = PartitionSpec(0, [PartitionField(1, 1000, "bucket_data",
                                            BucketTransform(16))])
    return TableMetadata(location="/tmp/t", schemas=[schema],
                         current_schema_id=0, partition_specs=[spec],
                         default_spec_id=0, last_column_id=2,
                         last_partition_id=1000,
                         format_version=format_version)


def test_schema_evolution_validates_partition_field_name_conflicts():
    """test_schema_evolution_now_correctly_validates_partition_field_name
    _conflicts: a new schema field named like an existing partition field
    (and absent from every historical schema) is rejected."""
    md = _bucket_md()
    bad = Schema([NestedField(1, "data", STRING, True),
                  NestedField(2, "existing_field", LONG, True),
                  NestedField(3, "bucket_data", LONG, True)], schema_id=1)
    with pytest.raises(InvalidUpdate, match="bucket_data"):
        apply_updates(md, [{"action": "add-schema", "schema": bad}])
    # non-conflicting evolution still succeeds
    # (test_schema_evolution_should_validate_on_schema_add_not_metadata_build)
    ok = Schema([NestedField(1, "data", STRING, True),
                 NestedField(2, "existing_field", LONG, True),
                 NestedField(3, "new_field", LONG, True)], schema_id=1)
    out = apply_updates(md, [{"action": "add-schema", "schema": ok},
                             {"action": "set-current-schema", "schema-id": -1}])
    assert out.current_schema_id == 1


def test_schema_evolution_allows_partition_name_in_historical_schema():
    """test_schema_evolution_allows_existing_partition_field_if_exists_in
    _historical_schema: re-adding a name that some historical schema already
    carries is fine (identity partitions named after their source)."""
    from iceberg_rust_spark.functions.transforms import IdentityTransform
    from iceberg_rust_spark.sources.metadata import PartitionField
    schema = Schema([NestedField(1, "partition_data", STRING, True),
                     NestedField(2, "v", LONG, True)], schema_id=0)
    spec = PartitionSpec(0, [PartitionField(1, 1000, "partition_data",
                                            IdentityTransform())])
    md = TableMetadata(location="/tmp/t", schemas=[schema],
                       current_schema_id=0, partition_specs=[spec],
                       default_spec_id=0, last_column_id=2,
                       last_partition_id=1000)
    evolved = Schema([NestedField(1, "partition_data", STRING, True),
                      NestedField(2, "v", LONG, True),
                      NestedField(3, "extra", LONG, True)], schema_id=1)
    out = apply_updates(md, [{"action": "add-schema", "schema": evolved},
                             {"action": "set-current-schema", "schema-id": -1}])
    assert out.current_schema_id == 1


def test_set_incompatible_current_schema_fails():
    """test_add_incompatible_current_schema_fails: a current schema missing
    the default spec's partition source field is rejected."""
    md = _bucket_md()
    # drops field id 1, the bucket source
    narrow = Schema([NestedField(2, "existing_field", LONG, True)], schema_id=1)
    with pytest.raises(InvalidUpdate, match="partition source field"):
        apply_updates(md, [{"action": "add-schema", "schema": narrow},
                           {"action": "set-current-schema", "schema-id": -1}])


def test_set_current_schema_validates_default_sort_order():
    """Builder sort-order/schema cross-validation: the default sort order's
    source fields must survive schema evolution."""
    from iceberg_rust_spark.functions.transforms import IdentityTransform
    from iceberg_rust_spark.sources.metadata import SortField, SortOrder
    md = _bucket_md()
    md.sort_orders = [SortOrder(1, [SortField(2, IdentityTransform())])]
    md.default_sort_order_id = 1
    # keeps the partition source (id 1) but drops the sort source (id 2)
    no_sort_src = Schema([NestedField(1, "data", STRING, True)], schema_id=1)
    with pytest.raises(InvalidUpdate, match="sort source field"):
        apply_updates(md, [{"action": "add-schema", "schema": no_sort_src},
                           {"action": "set-current-schema", "schema-id": -1}])


def test_set_default_spec_binds_to_current_schema():
    """set_default_partition_spec recomputes partition_type against the
    CURRENT schema (table_metadata_builder.rs:959-961): promoting a spec
    whose source field the current schema no longer carries is rejected."""
    from iceberg_rust_spark.functions.transforms import IdentityTransform
    from iceberg_rust_spark.sources.metadata import PartitionField
    md = _bucket_md()
    # a second spec over field id 2
    sp2 = PartitionSpec(1, [PartitionField(2, 1001, "ef_part",
                                           IdentityTransform())])
    md = apply_updates(md, [{"action": "add-spec", "spec": sp2}])
    # evolve the current schema to one WITHOUT field id 2 (keeps id 1, the
    # default spec's source, so the evolution itself is legal)
    narrow = Schema([NestedField(1, "data", STRING, True)], schema_id=1)
    md = apply_updates(md, [{"action": "add-schema", "schema": narrow},
                            {"action": "set-current-schema", "schema-id": -1}])
    with pytest.raises(InvalidUpdate, match="missing from current schema"):
        apply_updates(md, [{"action": "set-default-spec", "spec-id": 1}])
    # the still-compatible spec 0 can be promoted (idempotent here)
    out = apply_updates(md, [{"action": "set-default-spec", "spec-id": 0}])
    assert out.default_spec_id == 0


def test_partition_spec_evolution_validates_schema_name_conflicts():
    """test_partition_spec_evolution_validates_schema_field_name_conflicts:
    a partition field named like a schema field is rejected unless it is the
    identity transform OF that field."""
    from iceberg_rust_spark.functions.transforms import (BucketTransform,
                                                         IdentityTransform)
    from iceberg_rust_spark.sources.metadata import PartitionField
    md = _bucket_md()
    clash = PartitionSpec(1, [PartitionField(1, 1001, "existing_field",
                                             BucketTransform(8))])
    with pytest.raises(InvalidUpdate, match="identity"):
        apply_updates(md, [{"action": "add-spec", "spec": clash}])
    # identity of the SAME field may reuse the name
    # (test_partition_spec_evolution_allows_non_conflicting_names)
    ok = PartitionSpec(1, [PartitionField(2, 1001, "existing_field",
                                          IdentityTransform())])
    out = apply_updates(md, [{"action": "add-spec", "spec": ok}])
    assert len(out.partition_specs) == 2


def test_add_partition_spec_v1_requires_sequential_ids():
    """test_add_partition_spec_for_v1_requires_sequential_ids."""
    from iceberg_rust_spark.functions.transforms import IdentityTransform
    from iceberg_rust_spark.sources.metadata import PartitionField
    md = _bucket_md(format_version=1)
    gap = PartitionSpec(1, [
        PartitionField(1, 1000, "p1", IdentityTransform()),
        PartitionField(2, 1002, "p2", IdentityTransform())])
    with pytest.raises(InvalidUpdate, match="non-sequential"):
        apply_updates(md, [{"action": "add-spec", "spec": gap}])
    # non-sequential ids are legal on a v2 table (fresh ids: the
    # cross-spec id-compat rule forbids redefining 1000)
    from iceberg_rust_spark.functions.transforms import IdentityTransform as _I
    gap2 = PartitionSpec(1, [
        PartitionField(1, 1001, "p1", _I()),
        PartitionField(2, 1003, "p2", _I())])
    md2 = _bucket_md(format_version=2)
    out = apply_updates(md2, [{"action": "add-spec", "spec": gap2}])
    assert len(out.partition_specs) == 2


def test_snapshot_log_tracks_main_only():
    """Branch-targeted commits must NOT enter the snapshot log; main
    re-points do (builder set_branch_snapshot semantics)."""
    md = _md()
    s1 = Snapshot(snapshot_id=11, sequence_number=1, timestamp_ms=1000,
                  manifest_list="ml1", summary={"operation": "append"})
    s2 = Snapshot(snapshot_id=22, sequence_number=2, timestamp_ms=2000,
                  manifest_list="ml2", summary={"operation": "append"},
                  parent_snapshot_id=11)
    out = apply_updates(md, [
        {"action": "add-snapshot", "snapshot": s1},
        {"action": "set-snapshot-ref", "ref-name": "main",
         "snapshot-id": 11},
        {"action": "add-snapshot", "snapshot": s2},
        {"action": "set-snapshot-ref", "ref-name": "audit",
         "snapshot-id": 22, "type": "branch"},
    ])
    assert [e["snapshot-id"] for e in out.snapshot_log] == [11]
    assert out.current_snapshot_id == 11
    assert out.refs["audit"].snapshot_id == 22
    # fast-forwarding main to the branch head logs it
    out2 = apply_updates(out, [{"action": "set-snapshot-ref",
                                "ref-name": "main", "snapshot-id": 22}])
    assert [e["snapshot-id"] for e in out2.snapshot_log] == [11, 22]
    assert out2.snapshot_log[-1]["timestamp-ms"] == 2000


def test_set_ref_idempotent_and_remove_main_semantics():
    """set-snapshot-ref to the identical target is a no-op (no duplicate
    snapshot-log entry on commit retries); removing the main ref clears
    current_snapshot_id but KEEPS the snapshot log
    (table_metadata_builder.rs set_ref:518-525,
    test_remove_main_ref_keeps_snapshot_log)."""
    md = _md()
    snap = Snapshot(snapshot_id=7, sequence_number=1, timestamp_ms=1000,
                    manifest_list="/tmp/t/metadata/ml.parquet",
                    summary={"operation": "append"}, schema_id=0)
    out = apply_updates(md, [
        {"action": "add-snapshot", "snapshot": snap},
        {"action": "set-snapshot-ref", "ref-name": "main",
         "snapshot-id": 7, "type": "branch"},
    ])
    assert [e["snapshot-id"] for e in out.snapshot_log] == [7]
    # identical re-set: no new log entry
    again = apply_updates(out, [
        {"action": "set-snapshot-ref", "ref-name": "main",
         "snapshot-id": 7, "type": "branch"}])
    assert [e["snapshot-id"] for e in again.snapshot_log] == [7]
    # remove main: current cleared, log kept, snapshot kept
    removed = apply_updates(out, [
        {"action": "remove-snapshot-ref", "ref-name": "main"}])
    assert removed.current_snapshot_id is None
    assert [e["snapshot-id"] for e in removed.snapshot_log] == [7]
    assert len(removed.snapshots) == 1


def test_partition_field_id_reuse_and_compat():
    """A re-added (source, transform) pair reuses its historical field id;
    redefining an existing field id with a different source/transform is
    rejected (test_partition_field_id_reuse_across_specs +
    partitioning.rs compatibility)."""
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.metadata import (PartitionField,
                                                     PartitionSpec)
    md = _md()
    f_id = md.schema().fields[0].field_id
    spec1 = PartitionSpec(1, [PartitionField(f_id, 1000, "p1",
                                             parse_transform("identity"))])
    out = apply_updates(md, [{"action": "add-spec", "spec": spec1}])
    # same id, same source+transform: compatible re-declaration OK
    spec2 = PartitionSpec(2, [PartitionField(f_id, 1000, "p1",
                                             parse_transform("identity"))])
    apply_updates(out, [{"action": "add-spec", "spec": spec2}])
    # same id, different transform: rejected
    bad = PartitionSpec(3, [PartitionField(f_id, 1000, "pb",
                                           parse_transform("bucket[4]"))])
    with pytest.raises(InvalidUpdate, match="already maps"):
        apply_updates(out, [{"action": "add-spec", "spec": bad}])


def test_v3_add_snapshot_validates_row_range():
    """Row-lineage snapshot validation, ported from the reference
    (table_metadata_builder.rs:401-436 + test_row_lineage_invalid_snapshot):
    v3 snapshots must carry first-row-id; a first-row-id behind the table's
    next-row-id is rejected (would hand out duplicate row ids); a valid
    add advances next-row-id by added-rows."""
    md = _md()
    md.format_version = 3
    md.next_row_id = 30

    def snap(sid, first, added, seq):
        return Snapshot(snapshot_id=sid, sequence_number=seq, timestamp_ms=1,
                        manifest_list="/tmp/ml.avro",
                        summary={"operation": "append"},
                        first_row_id=first, added_rows=added)

    # missing first-row-id
    with pytest.raises(InvalidUpdate, match="first-row-id must be set"):
        apply_updates(md, [{"action": "add-snapshot",
                            "snapshot": snap(10, None, None, 1)}])
    # behind next-row-id
    with pytest.raises(InvalidUpdate, match="behind table next-row-id"):
        apply_updates(md, [{"action": "add-snapshot",
                            "snapshot": snap(10, 29, 5, 1)}])
    # valid: next-row-id += added-rows (builder semantics)
    out = apply_updates(md, [{"action": "add-snapshot",
                              "snapshot": snap(10, 30, 28, 1)}])
    assert out.next_row_id == 58
    # serde round-trip keeps the row range
    j = out.snapshot_by_id(10).to_json()
    assert j["first-row-id"] == 30 and j["added-rows"] == 28
    back = Snapshot.from_json(j)
    assert back.first_row_id == 30 and back.added_rows == 28
    # v2 metadata: no row-range requirement (lineage is v3-only)
    md2 = _md()
    apply_updates(md2, [{"action": "add-snapshot",
                         "snapshot": snap(11, None, None, 1)}])


def test_v3_next_row_id_advances_past_gapped_claims():
    """next-row-id must land at first-row-id + added-rows, not advance BY
    added-rows: a client that assigned its range ahead of the counter must
    not leave the counter inside its own claim (a later snapshot could
    then pass the >= guard while overlapping the first one's rows)."""
    md = _md()
    md.format_version = 3
    md.next_row_id = 0

    def snap(sid, first, added, seq):
        return Snapshot(snapshot_id=sid, sequence_number=seq, timestamp_ms=1,
                        manifest_list="/tmp/ml.avro",
                        summary={"operation": "append"},
                        first_row_id=first, added_rows=added)

    # claim rows 100-149 while the counter sits at 0 (gap is legal)
    out = apply_updates(md, [{"action": "add-snapshot",
                              "snapshot": snap(20, 100, 50, 1)}])
    assert out.next_row_id == 150          # NOT 50
    # a snapshot trying to start inside the claimed range is rejected
    with pytest.raises(InvalidUpdate, match="behind table next-row-id"):
        apply_updates(out, [{"action": "add-snapshot",
                             "snapshot": snap(21, 120, 10, 2)}])
