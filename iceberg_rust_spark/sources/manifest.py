"""Manifests & manifest lists: DataFile / ManifestEntry / ManifestFile + IO.

Model parity with the reference's Avro manifests
(/root/reference/crates/iceberg/src/spec/manifest/entry.rs:39,
spec/manifest/data_file.rs:36, spec/manifest_list/manifest_file.rs:31), stored
as **Parquet** via pyarrow (no Avro lib in this env; columnar metadata also
lets the planner read just the pruning columns). Per-file column metrics
(record_count, value/null/nan counts, lower/upper bounds) are the fuel for all
file-level pruning. Layout v2: counts as native map<string,int64>, bounds and
partition values as map<string,string> with a one-character tag-scalar
encoding (datum.ser_scalar) — the flat child arrays decode C-side, and
ManifestColumns lets the planner evaluate without building per-entry objects.
v1 files (per-cell type-tagged JSON) stay readable.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .datum import de_value, ser_scalar, ser_value

# DataContentType (spec/manifest/data_file.rs)
CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2

# ManifestEntry status
STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


@dataclass(slots=True)
class DataFile:
    # slots: 100k+ cached entries per large table — the per-instance dict
    # was ~40% of entry RSS and ~half of construction time
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


@dataclass(slots=True)
class ManifestEntry:
    status: int
    snapshot_id: int
    sequence_number: int
    file_sequence_number: int
    data_file: DataFile


@dataclass(slots=True)
class FieldSummaryRec:
    contains_null: bool = False
    contains_nan: Optional[bool] = None
    lower: Any = None
    upper: Any = None


@dataclass(slots=True)
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

# v2 columnar layout: counts/sizes as native map<string,int64>, bounds and
# partition values as map<string,string> with the tag-scalar encoding
# (datum.ser_scalar), lists as native lists. The v1 layout packed these as
# per-cell JSON strings; decoding them was ~65% of cold 100k-file planning
# wall (json.loads is GIL-bound Python), while the flat child arrays of
# map/list columns decode C-side. v1 files remain readable (read_manifest
# dispatches on column names).
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
    ("partition", pa.map_(pa.string(), pa.string())),
    ("record_count", pa.int64()),
    ("file_size_in_bytes", pa.int64()),
    ("column_sizes", pa.map_(pa.string(), pa.int64())),
    ("value_counts", pa.map_(pa.string(), pa.int64())),
    ("null_value_counts", pa.map_(pa.string(), pa.int64())),
    ("nan_value_counts", pa.map_(pa.string(), pa.int64())),
    ("lower_bounds", pa.map_(pa.string(), pa.string())),
    ("upper_bounds", pa.map_(pa.string(), pa.string())),
    ("split_offsets", pa.list_(pa.int64())),
    ("equality_ids", pa.list_(pa.int64())),
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
        rows["partition"].append(
            [(k, ser_scalar(v)) for k, v in f.partition.items()])
        rows["record_count"].append(f.record_count)
        rows["file_size_in_bytes"].append(f.file_size_in_bytes)
        rows["column_sizes"].append(list(f.column_sizes.items()))
        rows["value_counts"].append(list(f.value_counts.items()))
        rows["null_value_counts"].append(list(f.null_value_counts.items()))
        rows["nan_value_counts"].append(list(f.nan_value_counts.items()))
        rows["lower_bounds"].append(
            [(k, ser_scalar(v)) for k, v in f.lower_bounds.items()])
        rows["upper_bounds"].append(
            [(k, ser_scalar(v)) for k, v in f.upper_bounds.items()])
        rows["split_offsets"].append(f.split_offsets)
        rows["equality_ids"].append(f.equality_ids)
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


def _read_manifest_v1(t: "pa.Table") -> List[ManifestEntry]:
    """Legacy JSON-cell layout (kept readable for tables written before the
    columnar v2 layout)."""
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


class ManifestColumns:
    """Columnar view of one manifest for O(metadata) planning (counterpart
    of the reference streaming Avro entries through the evaluator without
    materializing them, scan/mod.rs:420-499): the planner filters on flat
    numpy/Arrow arrays and builds per-entry Python objects ONLY for
    survivors — at 100k files a metrics-selective scan constructs a
    handful of DataFiles instead of 100k (measured ~8us per entry+file
    pair, ~0.8s avoided per cold plan).

    Eager: the five per-row primitives planning always touches, as numpy.
    Lazy (built on first touch, memoized): per-column metric arrays
    (``metric_arrays``), partition dicts, full entry objects."""

    __slots__ = ("n", "status", "content", "spec_id", "schema_id_raw",
                 "record_count", "sequence_number", "_tab", "_cols",
                 "_metrics", "_partitions", "_entries", "_entry_memo")

    def __getstate__(self):
        """Disk-cache serialization (scan._disk_cache): persist the Arrow
        table + every DERIVED extract already computed (metric vectors,
        partition dicts, map parts resolve to Arrow arrays — all
        picklable), but NOT the entry objects — they rebuild lazily and
        would double the blob for state a selective plan never touches."""
        drop = (("_entries", "_entry_memo") if self._tab is not None
                else ("_entry_memo",))     # object-backed: entries ARE the data
        return {s: getattr(self, s) for s in self.__slots__
                if s not in drop}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)
        if self._tab is not None:
            self._entries = None
        self._entry_memo = {}

    def __init__(self, table: Optional["pa.Table"],
                 entries: Optional[List[ManifestEntry]] = None):
        import numpy as np
        self._metrics: Dict[str, tuple] = {}
        self._partitions: Optional[list] = None
        self._entries = entries
        self._entry_memo: Dict[int, ManifestEntry] = {}
        self._cols: Dict[str, Any] = {}
        if table is None:
            # object-backed (v1 / spec-avro interop): same API, arrays
            # derived from the already-built entries
            self._tab = None
            self.n = len(entries)
            self.status = np.fromiter((e.status for e in entries),
                                      dtype="int32", count=self.n)
            self.content = np.fromiter(
                (e.data_file.content for e in entries),
                dtype="int32", count=self.n)
            self.spec_id = np.fromiter(
                (e.data_file.spec_id for e in entries),
                dtype="int32", count=self.n)
            self.schema_id_raw = np.fromiter(
                (-1 if e.data_file.schema_id is None else e.data_file.schema_id
                 for e in entries), dtype="int32", count=self.n)
            self.record_count = np.fromiter(
                (e.data_file.record_count for e in entries),
                dtype="int64", count=self.n)
            self.sequence_number = np.fromiter(
                (e.sequence_number for e in entries),
                dtype="int64", count=self.n)
            return
        self._tab = table.combine_chunks()
        self.n = table.num_rows

        def npcol(name):
            return self._tab.column(name).to_numpy(zero_copy_only=False)

        self.status = npcol("status")
        self.content = npcol("content")
        self.spec_id = npcol("spec_id")
        self.schema_id_raw = npcol("schema_id")
        self.record_count = npcol("record_count")
        self.sequence_number = npcol("sequence_number")

    @classmethod
    def from_entries(cls, entries: List[ManifestEntry]) -> "ManifestColumns":
        return cls(None, list(entries))

    # -- lazy column access ------------------------------------------------
    def _chunk(self, name: str) -> "pa.Array":
        arr = self._tab.column(name)
        if arr.num_chunks:
            return arr.chunk(0)     # combine_chunks() left exactly one
        return pa.array([], type=arr.type)   # 0-row parquet: no chunks

    def _col(self, name: str) -> list:
        got = self._cols.get(name)
        if got is None:
            got = self._cols[name] = self._chunk(name).to_pylist()
        return got

    def _obj_col(self, name: str, attr) -> list:
        """Per-row column as a plain list, working for BOTH backings
        (Arrow table or pre-built entry objects) — the fast-plan path
        (scan.ScanPlan._fast) reads these instead of building entries."""
        if self._tab is None:
            return [attr(e) for e in self._entries]
        return self._col(name)

    def file_paths(self) -> list:
        return self._obj_col("file_path", lambda e: e.data_file.file_path)

    def file_sizes(self) -> list:
        return self._obj_col("file_size_in_bytes",
                             lambda e: e.data_file.file_size_in_bytes)

    def first_row_ids(self) -> list:
        return self._obj_col("first_row_id",
                             lambda e: e.data_file.first_row_id)

    def _map_parts(self, name: str):
        """(offsets numpy, keys flat Arrow, items flat Arrow) of a map
        column — the C-decoded raw parts every per-key extraction slices.
        MapArray.to_pylist() is ~13us/row; the flat parts are ~0.3us."""
        key = "__parts__" + name
        got = self._cols.get(key)
        if got is None:
            arr = self._chunk(name)
            got = self._cols[key] = (
                arr.offsets.to_numpy(zero_copy_only=False),
                arr.keys, arr.items)
        return got

    def metric_arrays(self, file_name: str) -> tuple:
        """Per-row (value_count, null_count, nan_count, lower, upper) for
        ONE file-local column name, aligned to rows (None where absent);
        bounds are de_scalar-decoded then comparison-normalized
        (datum.to_comparable), ready for _eval_bounds. Extraction is one
        C-side equality scan + numpy scatter per (manifest, column),
        memoized — the planner touches only the predicate's referenced
        columns."""
        got = self._metrics.get(file_name)
        if got is not None:
            return got
        import numpy as np
        from .datum import de_scalar, to_comparable
        if self._tab is None:
            es = self._entries
            vc = [e.data_file.value_counts.get(file_name) for e in es]
            nc = [e.data_file.null_value_counts.get(file_name) for e in es]
            nanc = [e.data_file.nan_value_counts.get(file_name) for e in es]
            lo = [to_comparable(e.data_file.lower_bounds.get(file_name))
                  for e in es]
            hi = [to_comparable(e.data_file.upper_bounds.get(file_name))
                  for e in es]
            got = self._metrics[file_name] = (vc, nc, nanc, lo, hi)
            return got
        import pyarrow.compute as pc

        def extract(col, decode):
            offs, keys, items = self._map_parts(col)
            mask = pc.equal(keys, file_name).to_numpy(zero_copy_only=False)
            idx = np.nonzero(mask)[0]
            out = np.full(self.n, None, dtype=object)
            if len(idx):
                rows = np.searchsorted(offs, idx, side="right") - 1
                vals = items.take(pa.array(idx, type=pa.int64())).to_pylist()
                if decode is not None:
                    vals = [decode(v) for v in vals]
                out[rows] = vals
            return out

        def debound(v):
            return to_comparable(de_scalar(v))

        got = self._metrics[file_name] = (
            extract("value_counts", None),
            extract("null_value_counts", None),
            extract("nan_value_counts", None),
            extract("lower_bounds", debound),
            extract("upper_bounds", debound))
        return got

    def metric_vectors(self, file_name: str) -> tuple:
        """Vector-friendly derivation of ``metric_arrays`` for ONE file
        column, memoized: counts as exact int64 PLUS a presence bool mask
        (a NaN-sentinel float64 encoding would silently lose precision
        above 2^53 and could read ``vc == nc`` spuriously true — a prune,
        not a conservative keep), bounds as object arrays with
        NaN-poisoned values nulled at build plus presence masks. Returns
        ``(vc, vc_p, nc, nc_p, nanc, nanc_p, lo, lo_p, hi, hi_p)``. These
        feed the numpy-vectorized metrics matcher (scan._vector_matcher);
        the per-row walker keeps reading metric_arrays directly."""
        key = "__vec__" + file_name
        got = self._metrics.get(key)
        if got is not None:
            return got
        import math

        import numpy as np
        vc, nc, nanc, lo, hi = self.metric_arrays(file_name)

        def counts(a):
            vals = np.array([0 if v is None else int(v) for v in a],
                            dtype="int64")
            present = np.array([v is not None for v in a], dtype=bool)
            return vals, present

        def bounds(a):
            vals = np.array(
                [None if (v is None or (isinstance(v, float)
                                        and math.isnan(v))) else v
                 for v in a], dtype=object)
            present = np.array([v is not None for v in vals], dtype=bool)
            return vals, present

        vc_v, vc_p = counts(vc)
        nc_v, nc_p = counts(nc)
        nanc_v, nanc_p = counts(nanc)
        lo_v, lo_p = bounds(lo)
        hi_v, hi_p = bounds(hi)
        got = self._metrics[key] = (
            vc_v, vc_p, nc_v, nc_p, nanc_v, nanc_p, lo_v, lo_p, hi_v, hi_p)
        return got

    def _map_row(self, name: str, i: int, decode=None) -> Dict[str, Any]:
        offs, keys, items = self._map_parts(name)
        lo, hi = int(offs[i]), int(offs[i + 1])
        if lo == hi:
            return {}
        ks = keys.slice(lo, hi - lo).to_pylist()
        vs = items.slice(lo, hi - lo).to_pylist()
        if decode is not None:
            vs = [decode(v) for v in vs]
        return dict(zip(ks, vs))

    def partition(self, i: int) -> Dict[str, Any]:
        if self._tab is None:
            return self._entries[i].data_file.partition
        return self._partitions_all()[i]

    def _list_row(self, name: str, i: int) -> list:
        arr = self._chunk(name)
        offs = self._cols.get("__loffs__" + name)
        if offs is None:
            offs = self._cols["__loffs__" + name] = \
                arr.offsets.to_numpy(zero_copy_only=False)
        lo, hi = int(offs[i]), int(offs[i + 1])
        return arr.values.slice(lo, hi - lo).to_pylist() if hi > lo else []

    def data_file_lite(self, i: int) -> DataFile:
        """DataFile WITHOUT the six per-column stat/bound map decodes —
        the shape survivor-MATCHED delete files take. The read path
        consumes only path/format/content/offsets/equality_ids from a
        task's attached deletes, and the delete file's stats were already
        consumed from the flat arrays during index routing; decoding the
        maps anyway was 7.7s of a 16s cold full-scan MOR plan at 100k
        files (100k DV materializations x six _map_row decodes each)."""
        if self._entries is not None:
            return self._entries[i].data_file
        key = ("lite", i)
        got = self._entry_memo.get(key)
        if got is not None:
            return got
        c = self._col
        sort_order = c("sort_order_id")[i]
        schema_id = int(self.schema_id_raw[i])
        content = int(self.content[i])
        df = DataFile(
            file_path=c("file_path")[i],
            file_format=c("file_format")[i],
            content=content,
            partition=self.partition(i),
            record_count=int(self.record_count[i]),
            file_size_in_bytes=c("file_size_in_bytes")[i],
            # only equality deletes carry ids; pos deletes skip the
            # list-offset decode (100k DV rows per cold full-scan plan)
            equality_ids=(self._list_row("equality_ids", i)
                          if content == CONTENT_EQUALITY_DELETES else []),
            sort_order_id=None if sort_order == -1 else sort_order,
            schema_id=None if schema_id == -1 else schema_id,
            spec_id=int(self.spec_id[i]),
            referenced_data_file=c("referenced_data_file")[i],
            content_offset=c("content_offset")[i],
            content_size_in_bytes=c("content_size_in_bytes")[i],
            first_row_id=c("first_row_id")[i],
        )
        self._entry_memo[key] = df
        return df

    def entry(self, i: int) -> ManifestEntry:
        if self._entries is not None:
            return self._entries[i]
        got = self._entry_memo.get(i)
        if got is not None:
            return got
        from .datum import de_scalar
        c = self._col
        sort_order = c("sort_order_id")[i]
        schema_id = int(self.schema_id_raw[i])
        df = DataFile(
            file_path=c("file_path")[i],
            file_format=c("file_format")[i],
            content=int(self.content[i]),
            partition=self.partition(i),
            record_count=int(self.record_count[i]),
            file_size_in_bytes=c("file_size_in_bytes")[i],
            column_sizes=self._map_row("column_sizes", i),
            value_counts=self._map_row("value_counts", i),
            null_value_counts=self._map_row("null_value_counts", i),
            nan_value_counts=self._map_row("nan_value_counts", i),
            lower_bounds=self._map_row("lower_bounds", i, de_scalar),
            upper_bounds=self._map_row("upper_bounds", i, de_scalar),
            split_offsets=self._list_row("split_offsets", i),
            equality_ids=self._list_row("equality_ids", i),
            sort_order_id=None if sort_order == -1 else sort_order,
            schema_id=None if schema_id == -1 else schema_id,
            spec_id=int(self.spec_id[i]),
            referenced_data_file=c("referenced_data_file")[i],
            content_offset=c("content_offset")[i],
            content_size_in_bytes=c("content_size_in_bytes")[i],
            first_row_id=c("first_row_id")[i],
        )
        got = self._entry_memo[i] = ManifestEntry(
            status=int(self.status[i]),
            snapshot_id=c("snapshot_id")[i],
            sequence_number=int(self.sequence_number[i]),
            file_sequence_number=c("file_sequence_number")[i],
            data_file=df)
        return got

    def _map_dicts(self, name: str, decode=None) -> list:
        """All rows of a map column as dicts: one flat C decode + a
        zip/dict loop (~2.5us/row vs ~30us/row of per-row slices)."""
        offs, keys, items = self._map_parts(name)
        ks = keys.to_pylist()
        vs = items.to_pylist()
        if decode is not None:
            vs = [decode(v) for v in vs]
        out, lo = [], int(offs[0]) if len(offs) else 0
        for hi in offs[1:]:
            hi = int(hi)
            out.append(dict(zip(ks[lo:hi], vs[lo:hi])))
            lo = hi
        return out

    def _list_rows(self, name: str) -> list:
        arr = self._chunk(name)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        flat = arr.values.to_pylist()
        out, lo = [], int(offs[0]) if len(offs) else 0
        for hi in offs[1:]:
            hi = int(hi)
            out.append(flat[lo:hi])
            lo = hi
        return out

    def entries(self) -> List[ManifestEntry]:
        """All entry objects, built in ONE columnar pass (full-scan plans
        and maintenance walks); per-row ``entry(i)`` stays for the sparse
        survivor case."""
        if self._entries is not None:
            return self._entries
        if self.n == 0:
            self._entries = []
            return self._entries
        from .datum import de_scalar
        c = self._col
        it = zip(range(self.n), c("file_path"), c("file_format"),
                 self._partitions_all(), c("file_size_in_bytes"),
                 self._map_dicts("column_sizes"),
                 self._map_dicts("value_counts"),
                 self._map_dicts("null_value_counts"),
                 self._map_dicts("nan_value_counts"),
                 self._map_dicts("lower_bounds", de_scalar),
                 self._map_dicts("upper_bounds", de_scalar),
                 self._list_rows("split_offsets"),
                 self._list_rows("equality_ids"),
                 c("sort_order_id"), c("referenced_data_file"),
                 c("content_offset"), c("content_size_in_bytes"),
                 c("first_row_id"), c("snapshot_id"),
                 c("file_sequence_number"))
        status, content = self.status, self.content
        spec_id, schema_raw = self.spec_id, self.schema_id_raw
        rec, seq = self.record_count, self.sequence_number
        out: List[ManifestEntry] = []
        for (i, fp, fmt, part, fsz, csz, vcnt, ncnt, nancnt, lob, upb,
             splits, eqids, soid, refd, coff, clen, frid, snap,
             fseq) in it:
            out.append(ManifestEntry(
                status=int(status[i]), snapshot_id=snap,
                sequence_number=int(seq[i]), file_sequence_number=fseq,
                data_file=DataFile(
                    file_path=fp, file_format=fmt,
                    content=int(content[i]), partition=part,
                    record_count=int(rec[i]), file_size_in_bytes=fsz,
                    column_sizes=csz, value_counts=vcnt,
                    null_value_counts=ncnt, nan_value_counts=nancnt,
                    lower_bounds=lob, upper_bounds=upb,
                    split_offsets=splits, equality_ids=eqids,
                    sort_order_id=None if soid == -1 else soid,
                    schema_id=(None if schema_raw[i] == -1
                               else int(schema_raw[i])),
                    spec_id=int(spec_id[i]), referenced_data_file=refd,
                    content_offset=coff, content_size_in_bytes=clen,
                    first_row_id=frid)))
        self._entries = out
        self._entry_memo = {}
        return self._entries

    def _partitions_all(self) -> list:
        if self._partitions is None:
            from .datum import de_scalar
            self._partitions = self._map_dicts("partition", de_scalar)
        return self._partitions

    def partition_groups(self) -> tuple:
        """(codes int64 array aligned to rows, parts list): one DECODED
        partition dict per distinct raw partition tuple; ``parts[codes[i]]``
        is row i's partition. Decode cost is per DISTINCT value, not per
        row — clustered writers repeat one partition across a whole
        manifest, so the delete-index routing pass and the fast-plan bulk
        matcher pay O(distinct partitions) instead of O(rows) dict builds
        (the per-row decode was ~2.5us x 110k delete rows per cold 100k-file
        MOR plan). Fixed-width maps (one partition spec — the common case)
        group via vectorized numpy run detection over the flat key/value
        arrays; ragged maps fall back to a per-row memoized loop."""
        import numpy as np
        got = self._cols.get("__pgroups__")
        if got is not None:
            return got
        from .datum import de_scalar
        n = self.n
        if n == 0:
            got = (np.zeros(0, dtype=np.int64), [])
            self._cols["__pgroups__"] = got
            return got
        if self._tab is None:
            parts, codes, memo = [], np.empty(n, dtype=np.int64), {}
            for i, e in enumerate(self._entries):
                raw = tuple(sorted(e.data_file.partition.items(),
                                   key=lambda kv: kv[0]))
                c = memo.get(raw)
                if c is None:
                    c = memo[raw] = len(parts)
                    parts.append(e.data_file.partition)
                codes[i] = c
            got = (codes, parts)
            self._cols["__pgroups__"] = got
            return got
        offs, keys, items = self._map_parts("partition")
        lengths = np.diff(offs)
        if not lengths.any():                 # unpartitioned manifest
            got = (np.zeros(n, dtype=np.int64), [{}])
            self._cols["__pgroups__"] = got
            return got
        ks = np.asarray(keys.to_pylist(), dtype=object)
        vs = np.asarray(items.to_pylist(), dtype=object)
        codes = np.empty(n, dtype=np.int64)
        parts: list = []
        memo: dict = {}

        def decode(raw_ks, raw_vs):
            key = (tuple(raw_ks), tuple(raw_vs))
            c = memo.get(key)
            if c is None:
                c = memo[key] = len(parts)
                parts.append({k: de_scalar(v)
                              for k, v in zip(raw_ks, raw_vs)})
            return c

        L = int(lengths[0])
        off0 = int(offs[0])                   # chunk offsets may not be 0-based
        if L > 0 and (lengths == L).all():
            # fixed width: reshape flat arrays to (n, L); a row differs
            # from its predecessor iff any of its L cells differ — one
            # vectorized object-compare pass finds run boundaries, then
            # one decode per run start (deduped across runs by raw value)
            K = ks[off0:off0 + n * L].reshape(n, L)
            V = vs[off0:off0 + n * L].reshape(n, L)
            if n > 1:
                change = ((K[1:] != K[:-1]) | (V[1:] != V[:-1])).any(axis=1)
                starts = np.concatenate(
                    ([0], np.nonzero(change)[0] + 1, [n]))
            else:
                starts = np.array([0, n])
            for s, e_ in zip(starts[:-1], starts[1:]):
                codes[s:e_] = decode(K[s].tolist(), V[s].tolist())
        else:
            for i in range(n):
                lo, hi = int(offs[i]), int(offs[i + 1])
                codes[i] = decode(ks[lo:hi].tolist(), vs[lo:hi].tolist())
        got = (codes, parts)
        self._cols["__pgroups__"] = got
        return got


def read_manifest_columns(path: str) -> ManifestColumns:
    t = _read_pq_via_io(path)
    if "partition" in t.schema.names:
        return ManifestColumns(t)
    return ManifestColumns.from_entries(_read_manifest_v1(t))


def read_manifest(path: str) -> List[ManifestEntry]:
    return read_manifest_columns(path).entries()


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
