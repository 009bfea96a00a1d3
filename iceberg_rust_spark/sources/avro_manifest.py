"""Spec-layout Avro manifest interop: read manifests/manifest-lists written
by real Apache Iceberg implementations, and export ours in the same layout.

The reference serializes manifests with `apache-avro`
(spec/manifest_list/mod.rs:54, spec/manifest/mod.rs:41); the Avro record
shapes and field-ids below follow the public Iceberg table spec (Appendix C
"Avro manifest schema", Appendix D "single-value binary serialization").
Our native manifests stay Parquet (columnar pruning reads, see
ARCHITECTURE.md); this module is the interop bridge:

- ``read_avro_manifest(path)`` is self-contained — Iceberg manifests embed
  the table ``schema`` and ``partition-spec`` JSON in the container
  metadata, which provides the field-id->name mapping for stats maps and
  the types for bounds/partition decoding.
- ``read_avro_manifest_list(path)`` maps manifest_file records; partition
  FieldSummaries need the spec (names come from table metadata), so callers
  may pass it — without it summaries are skipped (pruning stays safe,
  merely less aggressive).
- ``write_avro_manifest`` / ``write_avro_manifest_list`` export our
  dataclasses so external readers (pyiceberg, Spark-Iceberg, DuckDB-Iceberg)
  can verify tables we write. Verified against the reference's golden files
  in tests/test_avro.py.
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from decimal import Decimal
from typing import Any, Dict, List, Optional

from .avro import read_container, write_container
from .datum import date_from_days, days_from_date, micros_from_ts, ts_from_micros
from .io import file_io_for
from .manifest import (DataFile, FieldSummaryRec, ManifestEntry, ManifestFile,
                       STATUS_ADDED)
from .types import IcebergType, PrimitiveType, Schema

# ---------------------------------------------------------------------------
# single-value binary serialization (spec Appendix D)
# ---------------------------------------------------------------------------


def encode_single_value(t: Optional[IcebergType], v: Any) -> Optional[bytes]:
    if v is None:
        return None
    name = getattr(t, "name", None) or _infer_type_name(v)
    if name == "boolean":
        return b"\x01" if v else b"\x00"
    if name == "int":
        return struct.pack("<i", int(v))
    if name in ("long", "time"):
        return struct.pack("<q", int(v))
    if name == "float":
        return struct.pack("<f", float(v))
    if name == "double":
        return struct.pack("<d", float(v))
    if name == "date":
        days = days_from_date(v) if isinstance(v, dt.date) else int(v)
        return struct.pack("<i", days)
    if name in ("timestamp", "timestamptz"):
        us = micros_from_ts(v) if isinstance(v, dt.datetime) else int(v)
        return struct.pack("<q", us)
    if name == "string":
        return str(v).encode("utf-8")
    if name and name.startswith("decimal"):
        unscaled = int(Decimal(v).scaleb(_decimal_scale(name)))
        length = max((unscaled.bit_length() + 8) // 8, 1)
        return unscaled.to_bytes(length, "big", signed=True)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode("utf-8")


def decode_single_value(t: Optional[IcebergType], b: Optional[bytes]) -> Any:
    if b is None:
        return None
    name = getattr(t, "name", None)
    if name == "boolean":
        return b == b"\x01"
    if name == "int":
        return struct.unpack("<i", b)[0]
    if name in ("long", "time"):
        return struct.unpack("<q", b)[0]
    if name == "float":
        return struct.unpack("<f", b)[0]
    if name == "double":
        return struct.unpack("<d", b)[0]
    if name == "date":
        return date_from_days(struct.unpack("<i", b)[0])
    if name in ("timestamp", "timestamptz"):
        return ts_from_micros(struct.unpack("<q", b)[0])
    if name == "string":
        return b.decode("utf-8")
    if name and name.startswith("decimal"):
        return Decimal(int.from_bytes(b, "big", signed=True)).scaleb(
            -_decimal_scale(name))
    return bytes(b)


def _decimal_scale(name: str) -> int:
    #  decimal(P, S)
    inner = name[name.index("(") + 1:name.index(")")]
    return int(inner.split(",")[1])


def _infer_type_name(v: Any) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, dt.datetime):
        return "timestamp"
    if isinstance(v, dt.date):
        return "date"
    if isinstance(v, Decimal):
        return "string"  # no scale info — stringly-typed fallback
    return "string"


# ---------------------------------------------------------------------------
# Avro schemas (spec Appendix C, with Iceberg field-id annotations)
# ---------------------------------------------------------------------------

def _opt(t: Any) -> List[Any]:
    return ["null", t]


def _kv_array(key_id: int, val_id: int, val_type: str, name: str) -> dict:
    return {"type": "array", "items": {
        "type": "record", "name": name, "fields": [
            {"name": "key", "type": "int", "field-id": key_id},
            {"name": "value", "type": val_type, "field-id": val_id}]}}


_FIELD_SUMMARY = {"type": "record", "name": "r508", "fields": [
    {"name": "contains_null", "type": "boolean", "field-id": 509},
    {"name": "contains_nan", "type": _opt("boolean"), "field-id": 518},
    {"name": "lower_bound", "type": _opt("bytes"), "field-id": 510},
    {"name": "upper_bound", "type": _opt("bytes"), "field-id": 511}]}

MANIFEST_LIST_SCHEMA = {"type": "record", "name": "manifest_file", "fields": [
    {"name": "manifest_path", "type": "string", "field-id": 500},
    {"name": "manifest_length", "type": "long", "field-id": 501},
    {"name": "partition_spec_id", "type": "int", "field-id": 502},
    {"name": "content", "type": "int", "field-id": 517},
    {"name": "sequence_number", "type": "long", "field-id": 515},
    {"name": "min_sequence_number", "type": "long", "field-id": 516},
    {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    {"name": "added_data_files_count", "type": "int", "field-id": 504},
    {"name": "existing_data_files_count", "type": "int", "field-id": 505},
    {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
    {"name": "added_rows_count", "type": "long", "field-id": 512},
    {"name": "existing_rows_count", "type": "long", "field-id": 513},
    {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    {"name": "partitions",
     "type": _opt({"type": "array", "items": _FIELD_SUMMARY}),
     "field-id": 507},
    {"name": "key_metadata", "type": _opt("bytes"), "field-id": 519}]}

# v1 manifest-list layout (reference golden:
# crates/iceberg/testdata/avro_schema_manifest_file_v1.json): no
# content/sequence fields, snapshot id + counts optional
MANIFEST_LIST_SCHEMA_V1 = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": _opt("long"), "field-id": 503},
        {"name": "added_data_files_count", "type": _opt("int"),
         "field-id": 504},
        {"name": "existing_data_files_count", "type": _opt("int"),
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": _opt("int"),
         "field-id": 506},
        {"name": "partitions",
         "type": _opt({"type": "array", "items": _FIELD_SUMMARY}),
         "field-id": 507},
        {"name": "added_rows_count", "type": _opt("long"), "field-id": 512},
        {"name": "existing_rows_count", "type": _opt("long"),
         "field-id": 513},
        {"name": "deleted_rows_count", "type": _opt("long"),
         "field-id": 514}]}


def _avro_type_for(t: IcebergType) -> Any:
    name = getattr(t, "name", "string")
    if name == "boolean":
        return "boolean"
    if name == "int":
        return "int"
    if name == "long":
        return "long"
    if name == "float":
        return "float"
    if name == "double":
        return "double"
    if name == "date":
        return {"type": "int", "logicalType": "date"}
    if name in ("timestamp", "timestamptz"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if name == "time":
        return {"type": "long", "logicalType": "time-micros"}
    return "string"  # string / uuid / decimal-as-string fallback for export


def _partition_record_schema(schema: Schema, spec_fields) -> dict:
    fields = []
    for pf in spec_fields:
        src = schema.field_by_id(pf.source_id)
        src_type = src.field_type if src else None
        rt = pf.transform.result_type(src_type) if src_type is not None else None
        at = _avro_type_for(rt) if rt is not None else "string"
        fields.append({"name": pf.name, "type": _opt(at),
                       "field-id": pf.field_id})
    return {"type": "record", "name": "r102", "fields": fields}


def manifest_entry_schema(schema: Schema, spec_fields,
                          format_version: int = 2) -> dict:
    """v2 (default) or v1 manifest_entry Avro schema. v1 (spec Appendix C /
    the reference's v1 golden layout): no content/sequence/equality/DV
    fields, snapshot_id required, and the required legacy
    block_size_in_bytes (field-id 105)."""
    v1 = format_version < 2
    head = ([] if v1 else
            [{"name": "content", "type": "int", "field-id": 134}])
    data_file = {"type": "record", "name": "r2", "fields": head + [
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition",
         "type": _partition_record_schema(schema, spec_fields),
         "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104}] + ([
        {"name": "block_size_in_bytes", "type": "long", "field-id": 105}]
        if v1 else []) + [
        {"name": "column_sizes",
         "type": _opt(_kv_array(117, 118, "long", "k117_v118")), "field-id": 108},
        {"name": "value_counts",
         "type": _opt(_kv_array(119, 120, "long", "k119_v120")), "field-id": 109},
        {"name": "null_value_counts",
         "type": _opt(_kv_array(121, 122, "long", "k121_v122")), "field-id": 110},
        {"name": "nan_value_counts",
         "type": _opt(_kv_array(138, 139, "long", "k138_v139")), "field-id": 137},
        {"name": "lower_bounds",
         "type": _opt(_kv_array(126, 127, "bytes", "k126_v127")), "field-id": 125},
        {"name": "upper_bounds",
         "type": _opt(_kv_array(129, 130, "bytes", "k129_v130")), "field-id": 128},
        {"name": "key_metadata", "type": _opt("bytes"), "field-id": 131},
        {"name": "split_offsets",
         "type": _opt({"type": "array", "items": "long"}), "field-id": 132}] + ([
        {"name": "sort_order_id", "type": _opt("int"), "field-id": 140}]
        if v1 else [
        {"name": "equality_ids",
         "type": _opt({"type": "array", "items": "int"}), "field-id": 135},
        {"name": "sort_order_id", "type": _opt("int"), "field-id": 140},
        {"name": "referenced_data_file", "type": _opt("string"), "field-id": 143},
        {"name": "content_offset", "type": _opt("long"), "field-id": 144},
        {"name": "content_size_in_bytes", "type": _opt("long"), "field-id": 145}])}
    if v1:
        return {"type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": "long", "field-id": 1},
            {"name": "data_file", "type": data_file, "field-id": 2}]}
    return {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": _opt("long"), "field-id": 1},
        {"name": "sequence_number", "type": _opt("long"), "field-id": 3},
        {"name": "file_sequence_number", "type": _opt("long"), "field-id": 4},
        {"name": "data_file", "type": data_file, "field-id": 2}]}


# ---------------------------------------------------------------------------
# write (export our dataclasses in spec layout)
# ---------------------------------------------------------------------------


def write_avro_manifest_list(path: str, manifests: List[ManifestFile],
                             spec_fields=(), schema: Optional[Schema] = None,
                             format_version: int = 2) -> int:
    recs = []
    for m in manifests:
        parts = None
        if m.partitions and spec_fields:
            parts = []
            for pf in spec_fields:
                fs = m.partitions.get(pf.name)
                src = schema.field_by_id(pf.source_id) if schema else None
                rt = (pf.transform.result_type(src.field_type)
                      if src is not None else None)
                if fs is None:
                    parts.append({"contains_null": True, "contains_nan": None,
                                  "lower_bound": None, "upper_bound": None})
                else:
                    parts.append({
                        "contains_null": bool(fs.contains_null),
                        "contains_nan": fs.contains_nan,
                        "lower_bound": encode_single_value(rt, fs.lower),
                        "upper_bound": encode_single_value(rt, fs.upper)})
        rec = {
            "manifest_path": m.manifest_path,
            "manifest_length": m.manifest_length,
            "partition_spec_id": m.partition_spec_id,
            "added_snapshot_id": m.added_snapshot_id,
            "added_data_files_count": m.added_files_count,
            "existing_data_files_count": m.existing_files_count,
            "deleted_data_files_count": m.deleted_files_count,
            "added_rows_count": m.added_rows_count,
            "existing_rows_count": m.existing_rows_count,
            "deleted_rows_count": m.deleted_rows_count,
            "partitions": parts}
        if format_version >= 2:
            rec.update({"content": m.content,
                        "sequence_number": m.sequence_number,
                        "min_sequence_number": m.min_sequence_number,
                        "key_metadata": None})
        recs.append(rec)
    data = write_container(MANIFEST_LIST_SCHEMA if format_version >= 2
                           else MANIFEST_LIST_SCHEMA_V1, recs)
    file_io_for(path).write_bytes(path, data)
    return len(data)


# reserved delete-file column ids (spec: positional delete files carry
# stats for file_path / pos under these, outside any table schema)
DELETE_FILE_PATH_ID = 2147483546
DELETE_FILE_POS_ID = 2147483545


def write_avro_manifest(path: str, entries: List[ManifestEntry],
                        schema: Schema, spec, format_version: int = 2) -> int:
    """``spec`` is a PartitionSpec (fields give the r102 partition record).
    ``format_version=1`` writes the v1 entry layout (no content/sequence/
    equality/DV fields, required snapshot_id + block_size_in_bytes) —
    data-content entries only, since v1 tables have no delete files."""
    v1 = format_version < 2
    if v1 and any(e.data_file.content != 0 for e in entries):
        raise ValueError("format_version=1 manifests cannot hold delete files")
    aschema = manifest_entry_schema(schema, spec.fields, format_version)
    name_to_id = {f.name: f.field_id for f in schema.fields}
    type_by_name = {f.name: f.field_type for f in schema.fields}
    # positional-delete stats (file_path bounds drive the reader's
    # interval-stabbed delete index) export under the spec's RESERVED ids —
    # unconditionally for position-delete entries: a table column literally
    # named "file_path"/"pos" must not shadow them (that would mis-attribute
    # the delete stats to the data column's id and break readback routing)
    _pos_del_ids = {"file_path": DELETE_FILE_PATH_ID,
                    "pos": DELETE_FILE_POS_ID}
    _pos_del_types = {"file_path": PrimitiveType("string"),
                      "pos": PrimitiveType("long")}

    def ids(d: Dict[str, int], pos_delete: bool) -> Optional[List[dict]]:
        out = []
        for k, v in d.items():
            fid = _pos_del_ids.get(k) if pos_delete else None
            if fid is None:
                fid = name_to_id.get(k)
            if fid is None:
                continue
            out.append({"key": fid, "value": v})
        return out or None

    def bounds(d: Dict[str, Any], pos_delete: bool) -> Optional[List[dict]]:
        out = []
        for k, v in d.items():
            if pos_delete and k in _pos_del_ids:
                fid, typ = _pos_del_ids[k], _pos_del_types[k]
            elif k in name_to_id:
                fid, typ = name_to_id[k], type_by_name[k]
            else:
                continue
            out.append({"key": fid, "value": encode_single_value(typ, v)})
        return out or None

    recs = []
    for e in entries:
        f = e.data_file
        posd = f.content == 1            # CONTENT_POSITION_DELETES
        part = {}
        for pf in spec.fields:
            part[pf.name] = _export_partition_value(f.partition.get(pf.name))
        dfrec = {
            "file_path": f.file_path,
            "file_format": f.file_format.upper(),
            "partition": part,
            "record_count": f.record_count,
            "file_size_in_bytes": f.file_size_in_bytes,
            "column_sizes": ids(f.column_sizes, posd),
            "value_counts": ids(f.value_counts, posd),
            "null_value_counts": ids(f.null_value_counts, posd),
            "nan_value_counts": ids(f.nan_value_counts, posd),
            "lower_bounds": bounds(f.lower_bounds, posd),
            "upper_bounds": bounds(f.upper_bounds, posd),
            "key_metadata": None,
            "split_offsets": f.split_offsets or None,
            "sort_order_id": f.sort_order_id}
        if v1:
            dfrec["block_size_in_bytes"] = 64 * 1024 * 1024  # legacy required
            # v1's snapshot_id is a REQUIRED long (no null branch in the
            # golden schema, testdata/avro_schema_manifest_file_v1.json):
            # an entry whose snapshot id was inherited-at-read (v2
            # semantics) exports as 0 — readers treat it as "unknown
            # ancestor", never a live snapshot id, since 0 is not a
            # valid generated snapshot id
            recs.append({"status": e.status,
                         "snapshot_id": e.snapshot_id or 0,
                         "data_file": dfrec})
            continue
        dfrec.update({
            "content": f.content,
            "equality_ids": f.equality_ids or None,
            "referenced_data_file": f.referenced_data_file,
            "content_offset": f.content_offset,
            "content_size_in_bytes": f.content_size_in_bytes})
        recs.append({
            "status": e.status, "snapshot_id": e.snapshot_id,
            "sequence_number": e.sequence_number,
            "file_sequence_number": e.file_sequence_number,
            "data_file": dfrec})
    meta = {
        "schema": json.dumps(schema.to_json_dict()).encode(),
        "schema-id": str(schema.schema_id).encode(),
        "partition-spec": json.dumps(
            [pf.to_json() for pf in spec.fields]).encode(),
        "partition-spec-id": str(spec.spec_id).encode(),
        "format-version": str(format_version).encode(),
        "content": (b"deletes" if any(e.data_file.content != 0 for e in entries)
                    else b"data"),
    }
    data = write_container(aschema, recs, metadata=meta)
    file_io_for(path).write_bytes(path, data)
    return len(data)


def _export_partition_value(v: Any) -> Any:
    if isinstance(v, dt.datetime):
        return micros_from_ts(v)
    if isinstance(v, dt.date):
        return days_from_date(v)
    if isinstance(v, Decimal):
        return str(v)
    return v


# ---------------------------------------------------------------------------
# read (interop with real Iceberg tables)
# ---------------------------------------------------------------------------


def read_avro_manifest_list(path: str, specs_by_id: Optional[dict] = None,
                            schema: Optional[Schema] = None) -> List[ManifestFile]:
    _s, recs, _m = read_container(file_io_for(path).read_bytes(path))
    out = []
    for r in recs:
        partitions: Dict[str, FieldSummaryRec] = {}
        spec = (specs_by_id or {}).get(r.get("partition_spec_id", 0))
        summaries = r.get("partitions") or []
        if spec is not None and summaries:
            for pf, fs in zip(spec.fields, summaries):
                src = schema.field_by_id(pf.source_id) if schema else None
                rt = (pf.transform.result_type(src.field_type)
                      if src is not None else None)
                partitions[pf.name] = FieldSummaryRec(
                    contains_null=fs.get("contains_null", False),
                    contains_nan=fs.get("contains_nan"),
                    lower=decode_single_value(rt, fs.get("lower_bound")),
                    upper=decode_single_value(rt, fs.get("upper_bound")))
        out.append(ManifestFile(
            manifest_path=r["manifest_path"],
            manifest_length=r["manifest_length"],
            partition_spec_id=r.get("partition_spec_id", 0),
            content=r.get("content", 0),
            sequence_number=r.get("sequence_number", 0),
            min_sequence_number=r.get("min_sequence_number", 0),
            added_snapshot_id=r.get("added_snapshot_id", 0),
            # older writers spell these without "data_" (golden v2-2 file)
            added_files_count=(r.get("added_data_files_count")
                               or r.get("added_files_count") or 0),
            existing_files_count=(r.get("existing_data_files_count")
                                  or r.get("existing_files_count") or 0),
            deleted_files_count=(r.get("deleted_data_files_count")
                                 or r.get("deleted_files_count") or 0),
            added_rows_count=r.get("added_rows_count") or 0,
            existing_rows_count=r.get("existing_rows_count") or 0,
            deleted_rows_count=r.get("deleted_rows_count") or 0,
            partitions=partitions))
    return out


def read_avro_manifest(path: str) -> List[ManifestEntry]:
    """Self-contained spec-manifest read: field-id maps and bound types come
    from the embedded schema/partition-spec container metadata."""
    _s, recs, meta = read_container(file_io_for(path).read_bytes(path))
    schema = None
    if "schema" in meta:
        schema = Schema.from_json_dict(json.loads(meta["schema"].decode()))
    try:
        schema_id = int(meta.get("schema-id", b"0"))
    except ValueError:
        schema_id = 0
    id_to_name: Dict[int, str] = {}
    id_to_type: Dict[int, IcebergType] = {}
    if schema is not None:
        for f in schema.fields:
            id_to_name[f.field_id] = f.name
            id_to_type[f.field_id] = f.field_type
    # reserved delete-file stat columns (file_path bounds feed the
    # delete index's interval stabbing)
    id_to_name.setdefault(DELETE_FILE_PATH_ID, "file_path")
    id_to_type.setdefault(DELETE_FILE_PATH_ID, PrimitiveType("string"))
    id_to_name.setdefault(DELETE_FILE_POS_ID, "pos")
    id_to_type.setdefault(DELETE_FILE_POS_ID, PrimitiveType("long"))

    def named(kvs) -> Dict[str, Any]:
        return {id_to_name.get(kv["key"], str(kv["key"])): kv["value"]
                for kv in (kvs or [])}

    def named_bounds(kvs) -> Dict[str, Any]:
        out = {}
        for kv in (kvs or []):
            fid = kv["key"]
            out[id_to_name.get(fid, str(fid))] = decode_single_value(
                id_to_type.get(fid), kv["value"])
        return out

    try:
        spec_id = int(meta.get("partition-spec-id", b"0"))
    except ValueError:
        spec_id = 0

    out = []
    for r in recs:
        df = r["data_file"]
        out.append(ManifestEntry(
            status=r.get("status", STATUS_ADDED),
            snapshot_id=r.get("snapshot_id") or 0,
            sequence_number=r.get("sequence_number") or 0,
            file_sequence_number=(r.get("file_sequence_number")
                                  or r.get("sequence_number") or 0),
            data_file=DataFile(
                file_path=df["file_path"],
                file_format=df.get("file_format", "PARQUET").lower(),
                content=df.get("content", 0),
                partition=df.get("partition") or {},
                record_count=df.get("record_count", 0),
                file_size_in_bytes=df.get("file_size_in_bytes", 0),
                column_sizes=named(df.get("column_sizes")),
                value_counts=named(df.get("value_counts")),
                null_value_counts=named(df.get("null_value_counts")),
                nan_value_counts=named(df.get("nan_value_counts")),
                lower_bounds=named_bounds(df.get("lower_bounds")),
                upper_bounds=named_bounds(df.get("upper_bounds")),
                split_offsets=df.get("split_offsets") or [],
                equality_ids=df.get("equality_ids") or [],
                sort_order_id=df.get("sort_order_id"),
                schema_id=schema_id, spec_id=spec_id,
                referenced_data_file=df.get("referenced_data_file"),
                content_offset=df.get("content_offset"),
                content_size_in_bytes=df.get("content_size_in_bytes"))))
    return out
