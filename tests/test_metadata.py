"""Metadata serde: roundtrips + parsing the reference's public golden fixture
(crates/iceberg/testdata/example_table_metadata_v2.json — an Apache-licensed
spec example we consume as DATA, per FIXTURES.md §7)."""

import datetime as dt
import json
import math
import os
from decimal import Decimal

from iceberg_rust_spark.functions.transforms import parse_transform
from iceberg_rust_spark.sources import types as ice
from iceberg_rust_spark.sources.manifest import (DataFile, ManifestEntry,
                                                 ManifestFile, FieldSummaryRec,
                                                 STATUS_ADDED, read_manifest,
                                                 read_manifest_list,
                                                 write_manifest,
                                                 write_manifest_list)
from iceberg_rust_spark.sources.metadata import (PartitionField, PartitionSpec,
                                                 Snapshot, TableMetadata)

REF_FIXTURE = "/root/reference/crates/iceberg/testdata/example_table_metadata_v2.json"


def _schema():
    return ice.Schema([
        ice.NestedField(1, "id", ice.LONG, required=True),
        ice.NestedField(2, "name", ice.STRING),
        ice.NestedField(3, "price", ice.decimal(12, 2)),
        ice.NestedField(4, "day", ice.DATE),
        ice.NestedField(5, "tags", ice.ListType(6, ice.STRING)),
        ice.NestedField(7, "meta", ice.StructType((
            ice.NestedField(8, "k", ice.STRING),
            ice.NestedField(9, "v", ice.DOUBLE),
        ))),
    ], schema_id=0)


def test_schema_json_roundtrip():
    s = _schema()
    s2 = ice.Schema.from_json_dict(json.loads(json.dumps(s.to_json_dict())))
    assert s2 == s
    assert s2.field_by_name("meta.v").field_id == 9


def test_schema_spark_roundtrip():
    s = _schema()
    spark_schema = s.to_spark()
    back = ice.schema_from_spark(spark_schema)
    assert [f.field_id for f in back.fields] == [f.field_id for f in s.fields]
    assert back.field_by_name("id").required


def test_table_metadata_roundtrip():
    md = TableMetadata(
        location="/tmp/t", schemas=[_schema()], current_schema_id=0,
        partition_specs=[PartitionSpec(0, [
            PartitionField(4, 1000, "day_day", parse_transform("day")),
            PartitionField(1, 1001, "id_bucket", parse_transform("bucket[16]"))])],
        default_spec_id=0)
    md.snapshots.append(Snapshot(1, 1, 123, "/tmp/ml.parquet",
                                 {"operation": "append"}, schema_id=0))
    md.current_snapshot_id = 1
    md2 = TableMetadata.from_json(md.to_json())
    assert md2.table_uuid == md.table_uuid
    assert md2.spec().fields[1].transform == parse_transform("bucket[16]")
    assert md2.current_snapshot().snapshot_id == 1
    assert md2.schema() == md.schema()


def test_parse_reference_golden_fixture():
    if not os.path.isfile(REF_FIXTURE):
        return
    md = TableMetadata.from_json(open(REF_FIXTURE).read())
    assert md.format_version == 2
    assert md.table_uuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1"
    assert md.last_sequence_number == 34
    assert len(md.schemas) == 2 and md.current_schema_id == 1
    assert md.schema().field_by_name("x").field_id == 1
    assert md.spec().fields[0].name == "x"
    assert repr(md.spec().fields[0].transform) == "identity"
    assert len(md.snapshots) == 2
    assert md.current_snapshot().snapshot_id == 3055729675574597004
    # snapshot log + sort orders survive
    assert md.snapshot_log and md.sort_orders[0].order_id == 3


def test_manifest_roundtrip(tmp_path):
    df = DataFile(
        file_path="/data/f1.parquet", record_count=100, file_size_in_bytes=2048,
        partition={"day_day": 18262, "id_bucket": 3},
        value_counts={"id": 100, "price": 100},
        null_value_counts={"id": 0, "price": 5},
        nan_value_counts={}, column_sizes={"id": 800},
        lower_bounds={"id": 1, "price": Decimal("0.99"),
                      "day": dt.date(2020, 1, 1),
                      "ts": dt.datetime(2020, 1, 1, 12, 30),
                      "f": float("nan"), "b": b"\x00\x01"},
        upper_bounds={"id": 100}, split_offsets=[4, 1000],
        equality_ids=[2], sort_order_id=1, schema_id=0, spec_id=0)
    path = str(tmp_path / "m.parquet")
    write_manifest(path, [ManifestEntry(STATUS_ADDED, 7, 3, 3, df)])
    [e] = read_manifest(path)
    assert e.snapshot_id == 7 and e.sequence_number == 3
    f = e.data_file
    assert f.partition == {"day_day": 18262, "id_bucket": 3}
    assert f.lower_bounds["price"] == Decimal("0.99")
    assert f.lower_bounds["day"] == dt.date(2020, 1, 1)
    assert f.lower_bounds["ts"] == dt.datetime(2020, 1, 1, 12, 30)
    assert math.isnan(f.lower_bounds["f"])
    assert f.lower_bounds["b"] == b"\x00\x01"
    assert f.equality_ids == [2] and f.sort_order_id == 1


def test_manifest_list_roundtrip(tmp_path):
    mf = ManifestFile(
        manifest_path="/meta/m1.parquet", manifest_length=333,
        partition_spec_id=0, content=0, sequence_number=5,
        min_sequence_number=5, added_snapshot_id=9,
        added_files_count=2, added_rows_count=200,
        partitions={"day_day": FieldSummaryRec(
            contains_null=False, lower=18000, upper=18100)})
    path = str(tmp_path / "ml.parquet")
    write_manifest_list(path, [mf])
    [m2] = read_manifest_list(path)
    assert m2.manifest_path == mf.manifest_path
    assert m2.partitions["day_day"].upper == 18100
    assert m2.partitions["day_day"].contains_null is False


def test_schema_invariants():
    """Schema construction rules (spec/schema builder parity): duplicate
    field ids anywhere in the tree raise; name index covers nested paths."""
    import pytest

    from iceberg_rust_spark.sources.types import (INT, LONG, STRING,
                                                  NestedField, Schema,
                                                  StructType)
    with pytest.raises(ValueError, match="duplicate"):
        Schema([NestedField(1, "a", LONG), NestedField(1, "b", STRING)])
    # nested id collision with a top-level id
    with pytest.raises(ValueError, match="duplicate"):
        Schema([NestedField(1, "a", LONG),
                NestedField(2, "s", StructType((NestedField(1, "x", INT),)))])
    s = Schema([NestedField(1, "a", LONG),
                NestedField(2, "s", StructType((NestedField(3, "x", INT),)))])
    assert s.field_by_id(3).name == "x"
    assert s.highest_field_id >= 3
