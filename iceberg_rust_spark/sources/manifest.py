"""Manifests & manifest lists: DataFile / ManifestEntry / ManifestFile + IO.

Model parity with the reference's Avro manifests
(/root/reference/crates/iceberg/src/spec/manifest/entry.rs:39,
spec/manifest/data_file.rs:36, spec/manifest_list/manifest_file.rs:31), stored
as **Parquet** via pyarrow (no Avro lib in this env; columnar metadata also
lets the planner read just the pruning columns). Per-file column metrics
(record_count, value/null/nan counts, lower/upper bounds) are the fuel for all
file-level pruning; bounds serialize as type-tagged JSON keyed by column name.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .datum import de_value, ser_value

# DataContentType (spec/manifest/data_file.rs)
CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2

# ManifestEntry status
STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


@dataclass
class DataFile:
    file_path: str
    file_format: str = "parquet"
    content: int = CONTENT_DATA
    partition: Dict[str, Any] = dc_field(default_factory=dict)  # partition col name -> value
    record_count: int = 0
    file_size_in_bytes: int = 0
    column_sizes: Dict[str, int] = dc_field(default_factory=dict)
    value_counts: Dict[str, int] = dc_field(default_factory=dict)
    null_value_counts: Dict[str, int] = dc_field(default_factory=dict)
    nan_value_counts: Dict[str, int] = dc_field(default_factory=dict)
    lower_bounds: Dict[str, Any] = dc_field(default_factory=dict)
    upper_bounds: Dict[str, Any] = dc_field(default_factory=dict)
    split_offsets: List[int] = dc_field(default_factory=list)
    equality_ids: List[int] = dc_field(default_factory=list)  # column names resolved via schema ids
    sort_order_id: Optional[int] = None
    schema_id: Optional[int] = None  # schema under which this file was written
    spec_id: int = 0
    # deletion-vector support (v3; data_file.rs:171-179): a DV "file" is a
    # blob inside a Puffin file scoped to ONE data file
    referenced_data_file: Optional[str] = None
    content_offset: Optional[int] = None
    content_size_in_bytes: Optional[int] = None
    # v3 row lineage (scan/task.rs:70-76): _row_id = first_row_id + position
    first_row_id: Optional[int] = None


@dataclass
class ManifestEntry:
    status: int
    snapshot_id: int
    sequence_number: int
    file_sequence_number: int
    data_file: DataFile


@dataclass
class FieldSummaryRec:
    contains_null: bool = False
    contains_nan: Optional[bool] = None
    lower: Any = None
    upper: Any = None


@dataclass
class ManifestFile:
    manifest_path: str
    manifest_length: int
    partition_spec_id: int
    content: int  # 0 data, 1 deletes
    sequence_number: int
    min_sequence_number: int
    added_snapshot_id: int
    added_files_count: int = 0
    existing_files_count: int = 0
    deleted_files_count: int = 0
    added_rows_count: int = 0
    existing_rows_count: int = 0
    deleted_rows_count: int = 0
    partitions: Dict[str, FieldSummaryRec] = dc_field(default_factory=dict)


# ---------------------------------------------------------------------------
# Manifest file IO (one parquet per manifest; rows = entries)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = pa.schema([
    ("status", pa.int32()),
    ("snapshot_id", pa.int64()),
    ("sequence_number", pa.int64()),
    ("file_sequence_number", pa.int64()),
    ("content", pa.int32()),
    ("file_path", pa.string()),
    ("file_format", pa.string()),
    ("spec_id", pa.int32()),
    ("schema_id", pa.int32()),
    ("partition_json", pa.string()),
    ("record_count", pa.int64()),
    ("file_size_in_bytes", pa.int64()),
    ("column_sizes_json", pa.string()),
    ("value_counts_json", pa.string()),
    ("null_value_counts_json", pa.string()),
    ("nan_value_counts_json", pa.string()),
    ("lower_bounds_json", pa.string()),
    ("upper_bounds_json", pa.string()),
    ("split_offsets_json", pa.string()),
    ("equality_ids_json", pa.string()),
    ("sort_order_id", pa.int32()),
    ("referenced_data_file", pa.string()),
    ("content_offset", pa.int64()),
    ("content_size_in_bytes", pa.int64()),
    ("first_row_id", pa.int64()),
])


def _ser_map(d: Dict[str, Any]) -> str:
    return json.dumps({k: ser_value(v) for k, v in d.items()})


def _de_map(s: Optional[str]) -> Dict[str, Any]:
    if not s or s == "{}":
        return {}
    return {k: de_value(v) for k, v in json.loads(s).items()}


def _write_pq_via_io(table: "pa.Table", path: str) -> int:
    """Serialize a metadata parquet through FileIO (any backend)."""
    import io as _io

    from .io import file_io_for
    buf = _io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    data = buf.getvalue()
    file_io_for(path).write_bytes(path, data)
    return len(data)


def _read_pq_via_io(path: str) -> "pa.Table":
    import io as _io

    from .io import file_io_for
    return pq.read_table(_io.BytesIO(file_io_for(path).read_bytes(path)))


def write_manifest(path: str, entries: List[ManifestEntry]) -> int:
    rows: Dict[str, list] = {name: [] for name in _MANIFEST_SCHEMA.names}
    for e in entries:
        f = e.data_file
        rows["status"].append(e.status)
        rows["snapshot_id"].append(e.snapshot_id)
        rows["sequence_number"].append(e.sequence_number)
        rows["file_sequence_number"].append(e.file_sequence_number)
        rows["content"].append(f.content)
        rows["file_path"].append(f.file_path)
        rows["file_format"].append(f.file_format)
        rows["spec_id"].append(f.spec_id)
        rows["schema_id"].append(f.schema_id if f.schema_id is not None else -1)
        rows["partition_json"].append(_ser_map(f.partition))
        rows["record_count"].append(f.record_count)
        rows["file_size_in_bytes"].append(f.file_size_in_bytes)
        rows["column_sizes_json"].append(json.dumps(f.column_sizes))
        rows["value_counts_json"].append(json.dumps(f.value_counts))
        rows["null_value_counts_json"].append(json.dumps(f.null_value_counts))
        rows["nan_value_counts_json"].append(json.dumps(f.nan_value_counts))
        rows["lower_bounds_json"].append(_ser_map(f.lower_bounds))
        rows["upper_bounds_json"].append(_ser_map(f.upper_bounds))
        rows["split_offsets_json"].append(json.dumps(f.split_offsets))
        rows["equality_ids_json"].append(json.dumps(f.equality_ids))
        rows["sort_order_id"].append(f.sort_order_id if f.sort_order_id is not None else -1)
        rows["referenced_data_file"].append(f.referenced_data_file)
        rows["content_offset"].append(f.content_offset)
        rows["content_size_in_bytes"].append(f.content_size_in_bytes)
        rows["first_row_id"].append(f.first_row_id)
    table = pa.table(rows, schema=_MANIFEST_SCHEMA)
    return _write_pq_via_io(table, path)


def _jd(s: Optional[str]) -> dict:
    """json.loads with an empty fast path: at 100k-file scale the decode
    runs once per entry per json column, and nan-counts/column-sizes are
    '{}' for most writers — skipping the parser there is ~25% of cold
    manifest-decode wall (measured: loads('{}') 1.4us, 8-key dict 3.8us)."""
    if not s or s == "{}":
        return {}
    return json.loads(s)


def _jl(s: Optional[str]) -> list:
    if not s or s == "[]":
        return []
    return json.loads(s)


def read_manifest(path: str) -> List[ManifestEntry]:
    t = _read_pq_via_io(path)
    out: List[ManifestEntry] = []
    cols = {name: t.column(name).to_pylist() for name in t.schema.names}
    n = t.num_rows
    # columns added after a manifest was written read as all-None
    for name in ("referenced_data_file", "content_offset",
                 "content_size_in_bytes", "first_row_id"):
        cols.setdefault(name, [None] * n)
    for i in range(n):
        df = DataFile(
            file_path=cols["file_path"][i],
            file_format=cols["file_format"][i],
            content=cols["content"][i],
            partition=_de_map(cols["partition_json"][i]),
            record_count=cols["record_count"][i],
            file_size_in_bytes=cols["file_size_in_bytes"][i],
            column_sizes=_jd(cols["column_sizes_json"][i]),
            value_counts=_jd(cols["value_counts_json"][i]),
            null_value_counts=_jd(cols["null_value_counts_json"][i]),
            nan_value_counts=_jd(cols["nan_value_counts_json"][i]),
            lower_bounds=_de_map(cols["lower_bounds_json"][i]),
            upper_bounds=_de_map(cols["upper_bounds_json"][i]),
            split_offsets=_jl(cols["split_offsets_json"][i]),
            equality_ids=_jl(cols["equality_ids_json"][i]),
            sort_order_id=None if cols["sort_order_id"][i] == -1 else cols["sort_order_id"][i],
            schema_id=None if cols["schema_id"][i] == -1 else cols["schema_id"][i],
            spec_id=cols["spec_id"][i],
            referenced_data_file=cols["referenced_data_file"][i],
            content_offset=cols["content_offset"][i],
            content_size_in_bytes=cols["content_size_in_bytes"][i],
            first_row_id=cols["first_row_id"][i],
        )
        out.append(ManifestEntry(
            status=cols["status"][i], snapshot_id=cols["snapshot_id"][i],
            sequence_number=cols["sequence_number"][i],
            file_sequence_number=cols["file_sequence_number"][i], data_file=df))
    return out


# ---------------------------------------------------------------------------
# Manifest list IO
# ---------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA = pa.schema([
    ("manifest_path", pa.string()),
    ("manifest_length", pa.int64()),
    ("partition_spec_id", pa.int32()),
    ("content", pa.int32()),
    ("sequence_number", pa.int64()),
    ("min_sequence_number", pa.int64()),
    ("added_snapshot_id", pa.int64()),
    ("added_files_count", pa.int32()),
    ("existing_files_count", pa.int32()),
    ("deleted_files_count", pa.int32()),
    ("added_rows_count", pa.int64()),
    ("existing_rows_count", pa.int64()),
    ("deleted_rows_count", pa.int64()),
    ("partitions_json", pa.string()),
])


def write_manifest_list(path: str, manifests: List[ManifestFile]) -> int:
    rows: Dict[str, list] = {name: [] for name in _MANIFEST_LIST_SCHEMA.names}
    for m in manifests:
        rows["manifest_path"].append(m.manifest_path)
        rows["manifest_length"].append(m.manifest_length)
        rows["partition_spec_id"].append(m.partition_spec_id)
        rows["content"].append(m.content)
        rows["sequence_number"].append(m.sequence_number)
        rows["min_sequence_number"].append(m.min_sequence_number)
        rows["added_snapshot_id"].append(m.added_snapshot_id)
        rows["added_files_count"].append(m.added_files_count)
        rows["existing_files_count"].append(m.existing_files_count)
        rows["deleted_files_count"].append(m.deleted_files_count)
        rows["added_rows_count"].append(m.added_rows_count)
        rows["existing_rows_count"].append(m.existing_rows_count)
        rows["deleted_rows_count"].append(m.deleted_rows_count)
        rows["partitions_json"].append(json.dumps({
            name: {"contains_null": fs.contains_null, "contains_nan": fs.contains_nan,
                   "lower": ser_value(fs.lower), "upper": ser_value(fs.upper)}
            for name, fs in m.partitions.items()}))
    table = pa.table(rows, schema=_MANIFEST_LIST_SCHEMA)
    return _write_pq_via_io(table, path)


def read_manifest_list(path: str) -> List[ManifestFile]:
    t = _read_pq_via_io(path)
    cols = {name: t.column(name).to_pylist() for name in t.schema.names}
    out: List[ManifestFile] = []
    for i in range(t.num_rows):
        parts = {}
        for name, d in json.loads(cols["partitions_json"][i] or "{}").items():
            parts[name] = FieldSummaryRec(
                contains_null=d.get("contains_null", False),
                contains_nan=d.get("contains_nan"),
                lower=de_value(d.get("lower")), upper=de_value(d.get("upper")))
        out.append(ManifestFile(
            manifest_path=cols["manifest_path"][i],
            manifest_length=cols["manifest_length"][i],
            partition_spec_id=cols["partition_spec_id"][i],
            content=cols["content"][i],
            sequence_number=cols["sequence_number"][i],
            min_sequence_number=cols["min_sequence_number"][i],
            added_snapshot_id=cols["added_snapshot_id"][i],
            added_files_count=cols["added_files_count"][i],
            existing_files_count=cols["existing_files_count"][i],
            deleted_files_count=cols["deleted_files_count"][i],
            added_rows_count=cols["added_rows_count"][i],
            existing_rows_count=cols["existing_rows_count"][i],
            deleted_rows_count=cols["deleted_rows_count"][i],
            partitions=parts))
    return out
