"""Scan planning + distributed read: the reference's killer feature, Spark-first.

Planning (driver-side, O(metadata) — never lists the object store; counterpart
of /root/reference/crates/iceberg/src/scan/mod.rs:381-499):
  manifest list -> [ManifestEvaluator over partition FieldSummaries]
  -> manifests  -> [ExpressionEvaluator on exact partition values]
                   [InclusiveMetricsEvaluator on file column metrics]
  -> FileScanTasks (+ matched delete files via sequence-number rules,
     delete_file_index.rs:84-168: pos-delete applies when delete.seq >=
     data.seq, eq-delete when delete.seq > data.seq).

Execution (cluster-side): ``spark.read.schema(...).parquet(*files)`` per
schema-/delete-group; schema evolution resolves columns BY FIELD ID with
type promotion + initial_default (the 4-rule projection of
arrow/record_batch_transformer.rs:347-351); deletes become anti-joins; the
full row predicate is re-applied on top (Inexact-pushdown fail-safe), which
Catalyst pushes into the Parquet reader for row-group/page pruning — the two
pruning levels we deliberately delegate to Spark.
"""

from __future__ import annotations

import functools
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import expr as E
from ..plans.evaluators import (ColumnMetrics, FieldSummary, PartitionFieldInfo,
                                file_might_match, inclusive_projection,
                                manifest_might_match, partition_might_match)
from .io import (file_io_for, localize_paths, mirror_remap_pattern,
                 spark_native_path)
from .manifest import (CONTENT_DATA, CONTENT_EQUALITY_DELETES,
                       CONTENT_POSITION_DELETES, STATUS_DELETED, DataFile,
                       ManifestColumns, ManifestEntry, ManifestFile,
                       read_manifest_list)
from .metadata import Snapshot, TableMetadata
from .types import Schema, type_to_spark


class _ManifestCache:
    """ENTRY-weighted LRU over parsed manifests (the reference's
    byte-weighted object cache, io/object_cache.rs:22-60). Manifests vary
    1..10k+ entries, so a count-capped lru_cache retains O(files) driver
    memory in the worst case (4096 manifests x 1000 entries ~ 9 GB);
    weighting by len() bounds retained ManifestEntry objects (~2.3 KB
    each measured) regardless of manifest shape. Default budget 512k
    entries (~1.2 GB), env ICEBERG_SPARK_MANIFEST_CACHE_ENTRIES.
    Thread-safe for the planner's pool: lookups/inserts lock, the decode
    itself runs unlocked (a concurrent miss may decode twice — benign,
    manifests are immutable)."""

    def __init__(self, max_entries: Optional[int] = None):
        import threading
        if max_entries is None:
            max_entries = int(os.environ.get(
                "ICEBERG_SPARK_MANIFEST_CACHE_ENTRIES", str(512 * 1024)))
        self.max_entries = max_entries
        self._lock = threading.Lock()
        self._data: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._weight = 0

    def get(self, path: str, mtime_ns: int) -> "ManifestColumns":
        key = (path, mtime_ns)
        with self._lock:
            got = self._data.get(key)
            if got is not None:
                self._data.move_to_end(key)
                return got
        got = _disk_cache_load(path, mtime_ns)
        if got is not None:
            with self._lock:
                if key not in self._data:
                    self._data[key] = got
                    self._weight += max(1, got.n)
                    while (self._weight > self.max_entries
                           and len(self._data) > 1):
                        _, old = self._data.popitem(last=False)
                        self._weight -= max(1, old.n)
            return got
        if path.endswith(".avro"):
            # spec-layout manifest written by a real Iceberg implementation
            # (interop path); self-decoding via embedded schema
            from .avro_manifest import read_avro_manifest
            from .manifest import ManifestColumns
            val = ManifestColumns.from_entries(read_avro_manifest(path))
        else:
            from .manifest import read_manifest_columns
            val = read_manifest_columns(path)
        with self._lock:
            if key not in self._data:
                self._data[key] = val
                self._weight += max(1, val.n)
                while self._weight > self.max_entries and len(self._data) > 1:
                    _, old = self._data.popitem(last=False)
                    self._weight -= max(1, old.n)
        return val

    def cache_clear(self) -> None:
        with self._lock:
            self._data.clear()
            self._weight = 0
        # indexes reference cached views; same locking discipline as the
        # get/popitem sections (a bare clear is GIL-safe today but torn
        # under free-threaded builds)
        with _delete_index_lock:
            _delete_index_cache.clear()
            _fast_match_cache.clear()
            global _fast_match_cache_rows
            _fast_match_cache_rows = 0


_manifest_cache = _ManifestCache()


# ----------------------------------------------------------------------
# opt-in persistent manifest cache (env ICEBERG_SPARK_MANIFEST_DISK_CACHE
# = a TRUSTED local directory): decoded columnar views pickle to
# {sha1(path)}-{mtime}.pkl so a RESTARTED driver plans warm. Measured
# 0.2ms/manifest to load vs 7.9ms to decode+derive — cold
# metrics-selective planning at 100k files drops from ~1s to warm-like
# figures. Keyed by (path, mtime) like the in-memory caches, so a
# rewritten manifest naturally misses; stale keys are harmless garbage.
# Corrupt/unreadable blobs fall back to a normal decode. Stores happen
# at the END of plan_files (after the plan touched metric vectors /
# partitions), so the persisted state includes the derived extracts.
#
# Layout version: blobs are pickles of ManifestColumns INTERNALS (slots,
# memo tuple shapes). (path, mtime) keying cannot invalidate on a code
# upgrade — a stale blob from an older build can unpickle cleanly into
# the new class and fail at USE time (tuple-unpack in _vector_matcher),
# outside the load-time catch. Bump whenever ManifestColumns slots or
# memo shapes change so stale blobs miss cleanly.
_DISK_CACHE_LAYOUT = 3


def _disk_cache_dir() -> Optional[str]:
    d = os.environ.get("ICEBERG_SPARK_MANIFEST_DISK_CACHE") or None
    if d is None:
        return None
    return d if _disk_cache_dir_safe(d) else None


@functools.lru_cache(maxsize=8)
def _disk_cache_dir_safe(d: str) -> bool:
    """pickle.load from this directory is arbitrary code execution if other
    users can write to it. Refuse (fall back to normal decode) unless the
    directory is owned by the current user and not group/world-writable;
    create it 0700 when absent. Checked once per dir per process."""
    import stat
    try:
        try:
            st = os.stat(d)
        except FileNotFoundError:
            os.makedirs(d, mode=0o700, exist_ok=True)
            st = os.stat(d)
        if not stat.S_ISDIR(st.st_mode):
            return False
        if hasattr(os, "geteuid") and st.st_uid != os.geteuid():
            return False
        if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
            return False
        return True
    except Exception:
        return False


def _disk_cache_path(cache_dir: str, path: str, mtime_ns: int) -> str:
    import hashlib
    h = hashlib.sha1(path.encode()).hexdigest()[:24]
    return os.path.join(cache_dir,
                        f"{h}-{mtime_ns}-v{_DISK_CACHE_LAYOUT}.pkl")


def _disk_cache_load(path: str, mtime_ns: int) -> Optional["ManifestColumns"]:
    d = _disk_cache_dir()
    if d is None:
        return None
    import pickle
    try:
        with open(_disk_cache_path(d, path, mtime_ns), "rb") as fh:
            return pickle.load(fh)
    except Exception:
        return None                     # miss or corrupt: decode normally


def _disk_cache_store(path: str, mtime_ns: int, cols: "ManifestColumns") -> None:
    d = _disk_cache_dir()
    if d is None or cols._tab is None:  # object-backed views stay in-memory
        return
    import pickle
    target = _disk_cache_path(d, path, mtime_ns)
    if os.path.exists(target):
        return
    try:
        import threading
        import uuid
        # dir exists (created 0700 by _disk_cache_dir_safe)
        # pid alone is NOT unique here: concurrent plan_files callers in
        # one process would interleave writes into the same tmp file and
        # publish a corrupt blob (load falls back to decode, but the
        # cache would be poisoned until the mtime changes)
        tmp = (target + f".tmp{os.getpid()}-{threading.get_ident()}"
               f"-{uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as fh:
            pickle.dump(cols, fh, protocol=5)
        os.replace(tmp, target)         # atomic publish
    except Exception:
        pass                            # best-effort: never fail a plan

# built _DeleteFileIndex per surviving-delete-manifest set; entries are
# (index, stray_data_entries). Small LRU: an index references the cols
# views already held by the manifest cache, adding only routing dicts.
# Lock shared with nothing else: plan_files may run on caller threads
# concurrently (the manifest cache above locks for the same reason);
# a benign double-build on a concurrent miss is fine, a torn OrderedDict
# is not.
_delete_index_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
# bulk delete-attachment memo for the array fast plan: (manifest path,
# mtime, delete-manifest-set key) -> (survivor idx array, per-survivor
# interned delete sets). Entries reference cols views the manifest cache
# already holds plus small rec tuples; capped LRU, same lock.
_fast_match_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
# retained-size bound for _fast_match_cache (ADVICE r12): an entry's
# weight is its survivor count — each survivor holds an interned delete
# set slot, so weight tracks the real retained footprint where a bare
# entry cap would not (a churning MOR table mints a NEW delete-set key
# per snapshot, and 4096 × 100k-survivor lists is hundreds of MB).
_fast_match_cache_rows = 0
_FAST_MATCH_MAX_ENTRIES = 256
_FAST_MATCH_MAX_ROWS = 2_000_000
_delete_index_lock = __import__("threading").Lock()


def load_manifest(path: str) -> Sequence[ManifestEntry]:
    """Manifests are immutable once written; cache keyed by (path, mtime).
    Entry objects materialize lazily from the cached columnar view (and
    memoize inside it), so maintenance/metadata callers see the old list
    API while the planner never pays for objects it prunes."""
    from .io import file_io_for
    return _manifest_cache.get(path, file_io_for(path).mtime_ns(path)).entries()


def load_manifest_columns(path: str) -> "ManifestColumns":
    """Columnar view for the planner (same cache as load_manifest)."""
    from .io import file_io_for
    return _manifest_cache.get(path, file_io_for(path).mtime_ns(path))


@functools.lru_cache(maxsize=1024)
def _cached_manifest_list(path: str, mtime_ns: int) -> tuple:
    if path.endswith(".avro"):
        from .avro_manifest import read_avro_manifest_list
        return tuple(read_avro_manifest_list(path))
    return tuple(read_manifest_list(path))


def load_manifest_list(path: str) -> Sequence[ManifestFile]:
    """Manifest lists are immutable too (io/object_cache.rs:49 counterpart)."""
    from .io import file_io_for
    return _cached_manifest_list(path, file_io_for(path).mtime_ns(path))


def _lite_file(memo: Dict[int, "DataFile"], src) -> "DataFile":
    """id-memoized LITE materialization of a matched delete-file source
    (shared by ScanPlan.tasks, count_rows and to_df — interned fast-plan
    delete sets reference each src many times)."""
    k = id(src)
    f = memo.get(k)
    if f is None:
        f = memo[k] = _DeleteFileIndex._file(src)
    return f


@dataclass
class FileScanTask:
    """Unit of read work (counterpart of scan/task.rs:55-118).

    Note (r11+): DataFiles in ``pos_deletes``/``eq_deletes`` are LITE —
    their per-column stat/bound maps are empty (matching the reference's
    minimal FileScanTaskDeleteFile shape, scan/task.rs:120-140). The read
    path consumes only path/format/content/offsets/equality_ids from
    attached deletes; consumers needing delete-file stats should read the
    manifest entries instead."""
    data_file: DataFile
    sequence_number: int
    pos_deletes: List[DataFile] = dc_field(default_factory=list)
    eq_deletes: List[DataFile] = dc_field(default_factory=list)


class ScanPlan:
    """Planned scan: tasks + planning observability counters
    (scan_metrics.rs counterpart).

    ``tasks`` is a lazy property: an AlwaysTrue scan with no applicable
    deletes plans into ``_fast`` — per-manifest ``(ManifestColumns,
    survivor-index-array)`` pairs — and entry/FileScanTask objects
    materialize only if a consumer actually touches ``.tasks`` (to_df
    and count_rows read the arrays directly, so a 100k-file full scan
    never builds 100k task objects)."""

    __slots__ = ("_tasks", "_fast", "snapshot", "total_manifests",
                 "skipped_manifests", "total_data_files",
                 "skipped_by_partition", "skipped_by_metrics")

    def __init__(self, tasks: Optional[List[FileScanTask]] = None,
                 snapshot: Optional[Snapshot] = None,
                 total_manifests: int = 0, skipped_manifests: int = 0,
                 total_data_files: int = 0, skipped_by_partition: int = 0,
                 skipped_by_metrics: int = 0):
        self._tasks = tasks
        self._fast: Optional[list] = None
        self.snapshot = snapshot
        self.total_manifests = total_manifests
        self.skipped_manifests = skipped_manifests
        self.total_data_files = total_data_files
        self.skipped_by_partition = skipped_by_partition
        self.skipped_by_metrics = skipped_by_metrics

    @property
    def tasks(self) -> List[FileScanTask]:
        if self._tasks is None:
            ts: List[FileScanTask] = []
            file_memo: Dict[int, DataFile] = {}
            for cols, idx, sets in (self._fast or ()):
                for j, i in enumerate(idx):
                    e = cols.entry(int(i))
                    t = FileScanTask(data_file=e.data_file,
                                     sequence_number=e.sequence_number)
                    s = sets[j] if sets is not None else None
                    if s is not None:
                        t.pos_deletes.extend(_lite_file(file_memo, x)
                                             for x in s[0])
                        t.eq_deletes.extend(_lite_file(file_memo, x)
                                            for x in s[1])
                    ts.append(t)
            self._tasks = ts
        return self._tasks

    @tasks.setter
    def tasks(self, v: List[FileScanTask]) -> None:
        self._tasks = v


class TableScan:
    def __init__(self, metadata: TableMetadata,
                 row_filter: Optional[E.Predicate] = None,
                 selected_columns: Optional[List[str]] = None,
                 snapshot_id: Optional[int] = None,
                 as_of_timestamp_ms: Optional[int] = None,
                 case_sensitive: bool = True,
                 include_metadata_columns: bool = False,
                 include_row_lineage: bool = False,
                 include_deleted: bool = False):
        self.metadata = metadata
        self.row_filter = row_filter or E.ALWAYS_TRUE
        self.selected_columns = selected_columns
        self.snapshot_id = snapshot_id
        self.as_of_timestamp_ms = as_of_timestamp_ms
        self.case_sensitive = case_sensitive
        self.include_metadata_columns = include_metadata_columns
        # reserved `_deleted` column (metadata_columns.rs:39,75): keep the
        # rows MOR deletes would remove, flagged true, instead of dropping
        # them — the primitive changelog/audit reads build on
        self.include_deleted = include_deleted
        # lineage-only mode: adds _file/_pos/_row_id WITHOUT the per-(spec,
        # partition) group split the full metadata columns need — rewrites
        # on partitioned tables read one group per delete-set, not one per
        # partition value
        self.include_row_lineage = include_row_lineage or include_metadata_columns

    # -- snapshot resolution ----------------------------------------------
    def _resolve_snapshot(self) -> Optional[Snapshot]:
        md = self.metadata
        if self.snapshot_id is not None:
            snap = md.snapshot_by_id(self.snapshot_id)
            if snap is None:
                raise ValueError(f"no snapshot {self.snapshot_id}")
            return snap
        if self.as_of_timestamp_ms is not None:
            snap = md.snapshot_as_of(self.as_of_timestamp_ms)
            if snap is None:
                raise ValueError(f"no snapshot at or before {self.as_of_timestamp_ms}")
            return snap
        return md.current_snapshot()

    def _scan_schema(self, md: TableMetadata, snap) -> "Schema":
        """Current-state scans read with the table's CURRENT schema, so a
        metadata-only evolution (e.g. ALTER TABLE with no new snapshot) is
        visible immediately; only explicit time travel pins the snapshot's
        schema-id (snapshot.rs schema resolution: spec 'Scan Planning')."""
        traveling = (self.snapshot_id is not None
                     or self.as_of_timestamp_ms is not None)
        if traveling and snap is not None and snap.schema_id is not None:
            return md.schema(snap.schema_id)
        return md.schema()

    # -- planning ----------------------------------------------------------
    def plan_files(self) -> ScanPlan:
        """O(metadata) planning, concurrent per manifest (counterpart of the
        reference's 4-stage concurrent pipeline, scan/mod.rs:381-499):

          manifest list -> FieldSummary pruning (driver, O(manifests))
          -> per-manifest [fetch + decode + per-entry evaluation] on a
             thread pool: the parquet/avro decode releases the GIL, so
             fetch/decode of manifest N overlaps the pure-Python entry
             evaluation of manifest N-1
          -> delete-index match over SURVIVORS only.

        Delete manifests stream first (the index must be complete before
        matching); data manifests then evaluate independently, so peak
        intermediate state is per-manifest entry tuples + survivors —
        never an all-files list for selective predicates. Per-entry cost
        is minimized by an AlwaysTrue fast path and by building metrics
        only for the predicate's referenced columns (missing metrics are
        conservative might-match, so the restriction cannot over-prune)."""
        md = self.metadata
        snap = self._resolve_snapshot()
        if snap is None:
            return ScanPlan(tasks=[], snapshot=None)
        schema = self._scan_schema(md, snap)
        bound = E.bind(self.row_filter, schema, self.case_sensitive)
        always_true = isinstance(bound, E.AlwaysTrue)

        manifest_list_path = snap.manifest_list
        manifests = load_manifest_list(manifest_list_path)
        plan = ScanPlan(tasks=[], snapshot=snap, total_manifests=len(manifests))

        # partition predicate per spec id (cached like scan/cache.rs:31);
        # benign-race safe under the GIL: concurrent misses recompute the
        # same immutable value
        part_pred_cache: Dict[int, E.Predicate] = {}

        def partition_pred(spec_id: int) -> E.Predicate:
            got = part_pred_cache.get(spec_id)
            if got is None:
                spec = md.spec(spec_id)
                infos = []
                for pf in spec.fields:
                    src = schema.field_by_id(pf.source_id)
                    if src is None:
                        continue
                    infos.append(PartitionFieldInfo(src.name, pf.name,
                                                    pf.transform, src.field_type))
                got = part_pred_cache[spec_id] = inclusive_projection(bound, infos)
            return got

        # manifest-level pruning (both content kinds: a delete manifest
        # whose partitions cannot match the query prunes safely — its
        # deletes could only apply to data files that are pruned too)
        surviving_data: List[ManifestFile] = []
        surviving_dels: List[ManifestFile] = []
        for mf in manifests:
            if not always_true and mf.partitions:
                ppred = partition_pred(mf.partition_spec_id)
                if not manifest_might_match(
                        ppred, {k: FieldSummary(v.contains_null, v.contains_nan,
                                                _cmp(v.lower), _cmp(v.upper))
                                for k, v in mf.partitions.items()}):
                    plan.skipped_manifests += 1
                    continue
            (surviving_dels if mf.content else surviving_data).append(mf)

        ref_names = _pred_columns(bound)
        vectorizable = _pred_vector_ok(bound)

        def eval_cols(cols: ManifestColumns):
            """(survivors, n_data, skipped_part, skipped_metrics, strays):
            the per-manifest evaluation unit run on the pool, COLUMNAR —
            status/content route on numpy masks, metrics evaluate off
            per-column flat extracts, and entry objects are built only
            for survivors/strays (the numpy + Arrow steps release the
            GIL, so the pool overlaps manifests for real). ``strays``
            are delete entries found in a data manifest (defensive —
            external writers could mix content within one manifest)."""
            import numpy as np
            live = cols.status != STATUS_DELETED
            data_mask = live & (cols.content == CONTENT_DATA)
            stray_idx = np.nonzero(live & (cols.content != CONTENT_DATA))[0]
            strays = [cols.entry(int(i)) for i in stray_idx]
            n = int(data_mask.sum())
            if always_true:
                if len(strays) == 0 and bool(data_mask.all()):
                    return cols.entries(), n, 0, 0, strays
                return ([cols.entry(int(i))
                         for i in np.nonzero(data_mask)[0]],
                        n, 0, 0, strays)
            spec_arr, schema_raw = cols.spec_id, cols.schema_id_raw
            # decode partition dicts only when some spec's projection can
            # actually prune (a metrics-only predicate projects to
            # AlwaysTrue on every spec)
            check_part = n > 0 and any(
                not isinstance(partition_pred(int(s)), E.AlwaysTrue)
                for s in np.unique(spec_arr[data_mask]))
            # vectorized metrics mask per schema group: when every group
            # compiles, the Python loop below touches ONLY survivors
            vec = np.zeros(cols.n, dtype=bool)
            vec_ok = n > 0 and vectorizable
            for raw in (np.unique(schema_raw[data_mask])
                        if vec_ok else ()):
                raw = int(raw)
                vm = self._vector_matcher(
                    bound, schema, None if raw == -1 else raw,
                    cols, ref_names)
                if vm is None:
                    vec_ok = False
                    break
                grp = data_mask & (schema_raw == raw)
                vec[grp] = vm[grp]
            matchers: Dict[int, Any] = {}
            survivors: List[ManifestEntry] = []
            sp = sm = 0
            if vec_ok and not check_part:
                idx = np.nonzero(data_mask & vec)[0]
                sm = n - len(idx)
                survivors = [cols.entry(int(i)) for i in idx]
                return survivors, n, 0, sm, strays
            for i in np.nonzero(data_mask)[0]:
                i = int(i)
                if check_part:
                    part = cols.partition(i)
                    if part and not partition_might_match(
                            partition_pred(int(spec_arr[i])), part):
                        sp += 1
                        continue
                if vec_ok:
                    if not vec[i]:
                        sm += 1
                        continue
                    survivors.append(cols.entry(i))
                    continue
                raw = int(schema_raw[i])
                m = matchers.get(raw)
                if m is None:
                    m = matchers[raw] = self._columnar_matcher(
                        bound, schema, None if raw == -1 else raw,
                        cols, ref_names)
                if not m(i):
                    sm += 1
                    continue
                survivors.append(cols.entry(i))
            return survivors, n, sp, sm, strays

        # phases A+B share ONE decode pool: delete manifests and data
        # manifests decode CONCURRENTLY (the reference routes both kinds
        # through one concurrent pipeline, scan/mod.rs:420-465). The
        # delete index must be complete only before survivor MATCHING —
        # which runs after data evaluation anyway — so only the routing
        # pass (pure Python, main thread) orders after delete decode,
        # and it overlaps the pool's data-manifest decode instead of
        # serializing in front of it. The built index is memoized on the
        # surviving delete-manifest set: manifests are immutable, so
        # repeated plans over the same MOR table skip the
        # O(delete files) routing pass entirely.
        # mtimes captured ONCE per manifest, at LOAD time, and reused for
        # BOTH the cache key and the disk-cache store: re-fetching mtime
        # at store time could publish old decoded content under a NEW
        # mtime if the manifest were replaced in place mid-plan
        # (permanent poisoning). Data-manifest mtimes are fetched INSIDE
        # the decode pool (one serial stat per remote manifest here would
        # add O(manifests) blocking round-trips before any decode starts);
        # delete-manifest mtimes are needed NOW for the index cache key —
        # pooled when the set is large or remote.
        mtime_of: Dict[str, int] = {}
        # pool workers insert concurrently (submit_all lambdas): guard the
        # dict like the module's other shared state so free-threaded
        # builds can't tear it (benign under the GIL, ADVICE r12). The
        # stat itself runs OUTSIDE the lock — only the memo is serialized.
        _mt_lock = threading.Lock()

        def _mt(path: str) -> int:
            with _mt_lock:
                got = mtime_of.get(path)
            if got is None:
                got = file_io_for(path).mtime_ns(path)
                with _mt_lock:
                    got = mtime_of.setdefault(path, got)
            return got

        if len(surviving_dels) > 4 and any(
                not spark_native_path(m.manifest_path)
                for m in surviving_dels):
            from concurrent.futures import ThreadPoolExecutor as _TPE
            with _TPE(max_workers=min(16, len(surviving_dels))) as mpool:
                list(mpool.map(_mt, [m.manifest_path
                                     for m in surviving_dels]))
        dkey = tuple((m.manifest_path, _mt(m.manifest_path))
                     for m in surviving_dels)
        with _delete_index_lock:
            cached = _delete_index_cache.get(dkey)
            if cached is not None:
                _delete_index_cache.move_to_end(dkey)

        # AlwaysTrue plans into survivor-index ARRAYS (plan._fast):
        # FileScanTask/entry objects materialize only if a consumer touches
        # plan.tasks — to_df and count_rows read the arrays directly, so a
        # full scan never builds per-file objects. With delete manifests
        # (r12) deletes attach in BULK off the flat arrays
        # (_DeleteFileIndex.match_arrays), memoized per
        # (manifest, delete-set), so warm full-scan-with-deletes replans
        # without rebuilding 100k entry/task objects.
        maybe_fast = always_true

        def prepare(cols: ManifestColumns) -> ManifestColumns:
            """Pool stage: manifest decode + the C-side metric/partition
            extracts (Arrow compute releases the GIL, so manifests overlap
            for real). The pure-Python eval loop then runs SERIALLY on the
            driver over prepared columns — measured faster than running it
            on the pool, where 16 interpreter loops just fight the GIL."""
            if always_true and cols._tab is not None:
                if maybe_fast:
                    cols._col("file_path")  # the one column to_df reads
                else:
                    cols.entries()
                return cols
            if cols.n:
                import numpy as np
                dm = ((cols.status != STATUS_DELETED)
                      & (cols.content == CONTENT_DATA))
                if dm.any():
                    sids = {int(s) for s in np.unique(cols.spec_id[dm])}
                    if any(not isinstance(partition_pred(s), E.AlwaysTrue)
                           for s in sids) and cols._tab is not None:
                        cols._partitions_all()
                    for raw in np.unique(cols.schema_id_raw[dm]):
                        name_map = self._name_mapping(
                            None if raw == -1 else int(raw), schema)
                        for nm in ref_names:
                            fn = name_map.get(nm)
                            if fn is not None:
                                if vectorizable:
                                    cols.metric_vectors(fn)
                                else:
                                    cols.metric_arrays(fn)
            return cols

        to_decode = (surviving_data if cached is not None
                     else surviving_dels + surviving_data)
        pool = None
        if len(to_decode) > 4:
            # pool width follows the bottleneck: remote FileIO decode is
            # fetch-latency-bound (wide pool overlaps round-trips), local
            # decode is CPU-bound with GIL-holding stretches — measured
            # fastest at 2-4 workers, SLOWER at 16 (the interpreter
            # segments convoy on the GIL). ANY remote manifest in the set
            # widens the pool: a mixed local/remote manifest list must
            # not let element 0 alone pick the width.
            from concurrent.futures import ThreadPoolExecutor
            any_remote = any(not spark_native_path(m.manifest_path)
                             for m in to_decode)
            pool = ThreadPoolExecutor(
                max_workers=min(16 if any_remote else 2, len(to_decode)))

        class _Now:
            """Serial stand-in for a Future (small manifest sets)."""
            __slots__ = ("_fn", "_m")

            def __init__(self, fn, m):
                self._fn, self._m = fn, m

            def result(self):
                return self._fn(_manifest_cache.get(
                    self._m.manifest_path, _mt(self._m.manifest_path)))

        def submit_all(mfs, fn):
            if pool is not None:
                # _mt runs on the pool worker: the stat overlaps across
                # manifests and is pinned for _persist afterwards
                return [pool.submit(
                    lambda m=m: fn(_manifest_cache.get(
                        m.manifest_path, _mt(m.manifest_path))))
                    for m in mfs]
            return [_Now(fn, m) for m in mfs]

        try:
            # BOTH manifest kinds decode on the one pool (the overlap the
            # reference gets from its single concurrent pipeline); the
            # serial pure-Python stages (index routing, entry eval) run
            # only after the pool drains — running them concurrently with
            # pool decode measured ~2x SLOWER at 100k files (three
            # interpreter threads convoy on the GIL)
            del_futs = ([] if cached is not None
                        else submit_all(surviving_dels, lambda c: c))
            data_futs = submit_all(surviving_data, prepare)
        finally:
            if pool is not None:
                pool.shutdown(wait=True)
        def _persist(mfs, cols_list):
            """Opt-in disk cache write-back (post-enrichment, best-effort);
            keyed by the mtime captured at plan START (see mtime_of)."""
            if _disk_cache_dir() is not None:
                for m, c in zip(mfs, cols_list):
                    _disk_cache_store(m.manifest_path,
                                      mtime_of[m.manifest_path], c)

        if cached is None:
            # build unlocked (routing may take a while; concurrent misses
            # may build twice — benign, manifests are immutable)
            delete_index = _DeleteFileIndex()
            stray_data: List[ManifestEntry] = []
            del_cols = [f.result() for f in del_futs]
            for cols in del_cols:
                stray_data.extend(delete_index.add_columns(cols))
            _persist(surviving_dels, del_cols)
            with _delete_index_lock:
                if dkey not in _delete_index_cache:
                    _delete_index_cache[dkey] = (delete_index, stray_data)
                    while len(_delete_index_cache) > 8:
                        _delete_index_cache.popitem(last=False)
        else:
            delete_index, stray_data = cached
        loaded = [f.result() for f in data_futs]
        _persist(surviving_data, loaded)

        # stray DELETE entries inside data manifests (rare, external
        # writers) overlay per plan so the cached index stays immutable
        overlay_index: Optional[_DeleteFileIndex] = None

        if maybe_fast and not stray_data:
            import numpy as np
            fast_groups, clean = [], True
            for mfm, cols in zip(surviving_data, loaded):
                live = cols.status != STATUS_DELETED
                dmask = live & (cols.content == CONTENT_DATA)
                if bool((live & ~dmask).any()):
                    clean = False   # stray deletes: object path handles
                    break
                fast_groups.append((mfm, cols, np.nonzero(dmask)[0]))
            if clean:
                fast = []
                for mfm, cols, ix in fast_groups:
                    sets = None
                    if surviving_dels and len(ix):
                        # bulk delete attachment, memoized per
                        # (manifest, delete-manifest set): manifests are
                        # immutable, so a warm replan of a live MOR table
                        # reuses the matched sets outright
                        fkey = (mfm.manifest_path,
                                mtime_of[mfm.manifest_path], dkey)
                        with _delete_index_lock:
                            hit = _fast_match_cache.get(fkey)
                            if hit is not None:
                                _fast_match_cache.move_to_end(fkey)
                        if hit is not None:
                            ix, sets = hit
                        else:
                            sets = delete_index.match_arrays(cols, ix)
                            global _fast_match_cache_rows
                            with _delete_index_lock:
                                if fkey not in _fast_match_cache:
                                    _fast_match_cache[fkey] = (ix, sets)
                                    _fast_match_cache_rows += len(ix)
                                    while (len(_fast_match_cache)
                                           > _FAST_MATCH_MAX_ENTRIES
                                           or _fast_match_cache_rows
                                           > _FAST_MATCH_MAX_ROWS):
                                        _, (oix, _s) = \
                                            _fast_match_cache.popitem(
                                                last=False)
                                        _fast_match_cache_rows -= len(oix)
                    fast.append((cols, ix, sets))
                plan._fast = fast
                plan._tasks = None   # materialize lazily on .tasks touch
                plan.total_data_files = int(
                    sum(len(ix) for _, ix, _ in fast))
                return plan

        results = [eval_cols(c) for c in loaded]
        if stray_data:
            results.append(eval_cols(ManifestColumns.from_entries(stray_data)))
        survivors: List[ManifestEntry] = []
        for part, n, sp, sm, strays in results:
            survivors.extend(part)
            for e in strays:        # delete entries inside data manifests
                if overlay_index is None:
                    overlay_index = _DeleteFileIndex()
                overlay_index.add_entry(e)
            plan.total_data_files += n
            plan.skipped_by_partition += sp
            plan.skipped_by_metrics += sm

        for entry in survivors:
            task = FileScanTask(data_file=entry.data_file,
                                sequence_number=entry.sequence_number)
            delete_index.match(entry, task)
            if overlay_index is not None:
                overlay_index.match(entry, task)
            plan.tasks.append(task)
        return plan

    def _columnar_matcher(self, bound: E.Predicate, current_schema: Schema,
                          schema_id: Optional[int], cols: ManifestColumns,
                          ref_names: frozenset):
        """Columnar twin of ``_compiled_file_matcher``: same ``_eval_bounds``
        truth-table walker (semantics cannot drift), but stats come from
        the manifest's flat metric extracts instead of per-entry dicts —
        no DataFile object exists for a file that gets pruned. One matcher
        per (manifest, schema-id); the extracts memoize in ``cols``."""
        from ..plans.evaluators import _eval_bounds
        name_map = self._name_mapping(schema_id, current_schema)
        arrs = {name: (None if name_map.get(name) is None
                       else cols.metric_arrays(name_map[name]))
                for name in ref_names}
        record_count = cols.record_count

        def match(i: int) -> bool:
            if record_count[i] == 0:
                return False

            def lookup(name: str) -> Optional[FieldSummary]:
                a = arrs.get(name)
                if a is None:
                    return None
                vc_, nc_, nanc_, lo_, hi_ = a
                vc, nc, nanc = vc_[i], nc_[i], nanc_[i]
                s = FieldSummary(
                    contains_null=not (nc == 0),
                    contains_nan=None if nanc is None else nanc > 0,
                    lower=lo_[i], upper=hi_[i])
                s._all_null = (vc is not None and nc is not None
                               and vc == nc)  # type: ignore[attr-defined]
                s._all_nan = (nanc is not None and vc is not None
                              and nanc == vc)  # type: ignore[attr-defined]
                s._null_count = nc  # type: ignore[attr-defined]
                s._value_count = vc  # type: ignore[attr-defined]
                return s

            return _eval_bounds(bound, lookup)

        return match

    def _vector_matcher(self, bound: E.Predicate, current_schema: Schema,
                        schema_id: Optional[int], cols: ManifestColumns,
                        ref_names: frozenset):
        """Numpy-vectorized twin of the metrics matcher: ONE boolean
        might-match array for a whole manifest, mirroring _eval_bounds'
        truth tables node by node (property-tested equal on random
        predicate x stats combinations). Returns None when the predicate
        contains a node shape the vector form doesn't cover
        (starts_with/not_starts_with, unknown ops) — the caller falls
        back to the per-row walker, so coverage gaps cost speed, never
        correctness. The payoff is iterating ONLY survivors afterwards:
        a selective predicate over a 100k-file manifest set runs the
        Python loop 9 times, not 100k."""
        import numpy as np
        from .datum import to_comparable
        name_map = self._name_mapping(schema_id, current_schema)
        n = cols.n
        ones = np.ones(n, dtype=bool)
        zeros = np.zeros(n, dtype=bool)

        class _Unsupported(Exception):
            pass

        vecs: Dict[str, Optional[tuple]] = {}
        for nm in ref_names:
            fn = name_map.get(nm)
            vecs[nm] = None if fn is None else cols.metric_vectors(fn)

        def ev(p: E.Predicate) -> np.ndarray:
            if isinstance(p, E.AlwaysTrue):
                return ones
            if isinstance(p, E.AlwaysFalse):
                return zeros
            if isinstance(p, E.And):
                return ev(p.left) & ev(p.right)
            if isinstance(p, E.Or):
                return ev(p.left) | ev(p.right)
            if isinstance(p, E.Not):
                return ones          # NOT is conservative, like _eval_bounds
            name = p.field.name if hasattr(p, "field") else p.term
            v = vecs.get(name)
            if v is None:
                return ones          # unmapped column: might match
            vc, vc_p, nc, nc_p, nanc, nanc_p, lo, lo_p, hi, hi_p = v
            # absent counts (presence mask False) read conservatively in
            # every mask below: an absent count can never prove a prune
            contains_null = ~(nc_p & (nc == 0))
            all_null = vc_p & nc_p & (vc == nc)
            all_nan = vc_p & nanc_p & (nanc == vc)

            if isinstance(p, (E.UnaryPred, E.BoundUnaryPred)):
                if p.op == E.IS_NULL:
                    return contains_null
                if p.op == E.NOT_NULL:
                    return ~all_null
                if p.op == E.IS_NAN:
                    return ~((nanc_p & (nanc == 0)) | all_null)
                if p.op == E.NOT_NAN:
                    return ~all_nan
                return ones

            if isinstance(p, (E.BinaryPred, E.BoundBinaryPred)):
                op = p.op
                if op in (E.STARTS_WITH, E.NOT_STARTS_WITH):
                    raise _Unsupported()      # per-row walker handles
                lit = to_comparable(p.literal)

                def cmp(vals, present, kind):
                    out = np.zeros(n, dtype=bool)
                    if present.any():
                        sub = vals[present]
                        if kind == "ge":
                            r = sub >= lit
                        elif kind == "gt":
                            r = sub > lit
                        elif kind == "le":
                            r = sub <= lit
                        else:
                            r = sub < lit
                        out[present] = np.asarray(r, dtype=bool)
                    return out

                if op == E.LT:
                    res = ~cmp(lo, lo_p, "ge")
                elif op == E.LT_EQ:
                    res = ~cmp(lo, lo_p, "gt")
                elif op == E.GT:
                    res = ~cmp(hi, hi_p, "le")
                elif op == E.GT_EQ:
                    res = ~cmp(hi, hi_p, "lt")
                elif op == E.EQ:
                    res = ~(cmp(lo, lo_p, "gt") | cmp(hi, hi_p, "lt"))
                elif op == E.NOT_EQ:
                    res = ones.copy()
                else:
                    raise _Unsupported()
                return res & ~all_null   # ordered ops: all-null cannot

            if isinstance(p, (E.SetPred, E.BoundSetPred)):
                if p.op != E.IN:
                    # NOT_IN is conservative might-match, but the walker's
                    # all-null cutoff runs before every set op
                    return ~all_null
                cannot = ones.copy()
                for raw_lit in p.literals:
                    lit = to_comparable(raw_lit)
                    out_lo = np.zeros(n, dtype=bool)
                    if lo_p.any():
                        out_lo[lo_p] = np.asarray(lo[lo_p] > lit, dtype=bool)
                    out_hi = np.zeros(n, dtype=bool)
                    if hi_p.any():
                        out_hi[hi_p] = np.asarray(hi[hi_p] < lit, dtype=bool)
                    cannot &= (out_lo | out_hi)
                return ~cannot & ~all_null

            return ones

        try:
            res = ev(bound)
        except (_Unsupported, TypeError):
            # TypeError = literal/bound type mismatch somewhere in the
            # manifest: the per-row walker resolves it row by row
            return None
        return res & (cols.record_count != 0)

    def _compiled_file_matcher(self, bound: E.Predicate,
                               current_schema: Schema,
                               schema_id: Optional[int]):
        """Hot-loop twin of ``_metrics_for_file`` + ``file_might_match``:
        resolves the field-id name mapping ONCE per (plan, schema-id) and
        feeds ``_eval_bounds`` — the single shared truth-table walker, so
        semantics cannot drift — a lookup that reads the DataFile's stat
        dicts directly, skipping the per-entry ColumnMetrics dict (measured
        ~35% of per-entry planning cost at 100k files). Missing stats stay
        conservative might-match exactly as before."""
        from ..plans.evaluators import _eval_bounds
        from .datum import to_comparable
        name_map = self._name_mapping(schema_id, current_schema)

        def match(df_: DataFile) -> bool:
            if df_.record_count == 0:
                return False
            value_counts = df_.value_counts
            null_counts = df_.null_value_counts
            nan_counts = df_.nan_value_counts
            lowers = df_.lower_bounds
            uppers = df_.upper_bounds

            def lookup(name: str) -> Optional[FieldSummary]:
                fn = name_map.get(name)
                if fn is None:
                    return None
                vc = value_counts.get(fn)
                nc = null_counts.get(fn)
                nanc = nan_counts.get(fn)
                s = FieldSummary(
                    contains_null=not (nc == 0),
                    contains_nan=None if nanc is None else nanc > 0,
                    lower=to_comparable(lowers.get(fn)),
                    upper=to_comparable(uppers.get(fn)))
                s._all_null = (vc is not None and nc is not None
                               and vc == nc)  # type: ignore[attr-defined]
                s._all_nan = (nanc is not None and vc is not None
                              and nanc == vc)  # type: ignore[attr-defined]
                s._null_count = nc  # type: ignore[attr-defined]
                s._value_count = vc  # type: ignore[attr-defined]
                return s

            return _eval_bounds(bound, lookup)

        return match

    def _metrics_for_file(self, df_: DataFile, current_schema: Schema,
                          ref_cols: Optional[frozenset] = None,
                          _map_cache: Optional[dict] = None
                          ) -> Dict[str, ColumnMetrics]:
        """Map file-local column stats to CURRENT schema names via field
        ids. ``ref_cols`` restricts the work to the predicate's referenced
        columns (sound: missing metrics evaluate as might-match); the
        optional ``_map_cache`` memoizes the per-schema-id name mapping
        across a plan's files."""
        if _map_cache is not None:
            name_map = _map_cache.get(df_.schema_id)
            if name_map is None:
                name_map = _map_cache[df_.schema_id] = \
                    self._name_mapping(df_.schema_id, current_schema)
        else:
            name_map = self._name_mapping(df_.schema_id, current_schema)
        out: Dict[str, ColumnMetrics] = {}
        names = name_map if ref_cols is None else ref_cols
        for cur_name in names:
            file_name = name_map.get(cur_name)
            if file_name is None:
                continue
            out[cur_name] = ColumnMetrics(
                value_count=df_.value_counts.get(file_name),
                null_count=df_.null_value_counts.get(file_name),
                nan_count=df_.nan_value_counts.get(file_name),
                lower=df_.lower_bounds.get(file_name),
                upper=df_.upper_bounds.get(file_name))
        return out

    def _name_mapping(self, file_schema_id: Optional[int],
                      current_schema: Schema) -> Dict[str, str]:
        """current column name -> file column name (by field id)."""
        if file_schema_id is None or file_schema_id == current_schema.schema_id:
            return {f.name: f.name for f in current_schema.fields}
        try:
            file_schema = self.metadata.schema(file_schema_id)
        except KeyError:
            return {f.name: f.name for f in current_schema.fields}
        out = {}
        for f in current_schema.fields:
            old = file_schema.field_by_id(f.field_id)
            if old is not None:
                out[f.name] = old.name
        return out

    # -- execution ---------------------------------------------------------
    def to_arrow(self, spark: SparkSession) -> "pyarrow.Table":
        """Materialize the scan as a pyarrow Table — the reference's primary
        read output (scan/mod.rs:192 to_arrow / ArrowRecordBatchStream).
        Streams Arrow batches executor->driver (no Row round-trip); use for
        driver-side handoff to pandas/duckdb/ML tooling, not as a
        distributed path."""
        import pyarrow as pa

        df = self.to_df(spark)
        batches = df._collect_as_arrow()
        if batches:
            return pa.Table.from_batches(batches)
        return pa.Schema.from_pandas(df.limit(0).toPandas()).empty_table()

    def count_rows(self, spark: Optional[SparkSession] = None) -> int:
        """Metadata-only COUNT(*) pushdown: files whose manifest stats PROVE
        every row matches the filter (StrictMetricsEvaluator) and that carry
        no deletes contribute their manifest `record_count` without any data
        read; only the residual files are scanned. At 100 TB a
        partition-aligned count touches zero data bytes — the planner reads
        manifests, not parquet (the same trick Spark's Iceberg source uses
        for SELECT COUNT(*)). Raises if residual files need reading and no
        SparkSession was passed."""
        from ..plans.evaluators import file_must_match
        md = self.metadata
        plan = self.plan_files()
        if plan.snapshot is None:
            return 0
        schema = self._scan_schema(md, plan.snapshot)
        bound = E.bind(self.row_filter, schema, self.case_sensitive)
        if plan._fast is not None and plan._tasks is None \
                and isinstance(bound, E.AlwaysTrue):
            # fast plan: record_count sums straight off the manifest
            # arrays for files with NO applicable deletes; only
            # delete-bearing files materialize tasks for a data read
            total = 0
            residual: List[FileScanTask] = []
            fmemo: Dict[int, DataFile] = {}
            for c, ix, sets in plan._fast:
                if sets is None:
                    total += int(c.record_count[ix].sum())
                    continue
                rc = c.record_count
                for j, i in enumerate(ix):
                    s = sets[j]
                    if s is None:
                        total += int(rc[int(i)])
                        continue
                    if not s[1] and len(s[0]) == 1:
                        # v3 deletion vector: exact count is metadata-only.
                        # A DV's record_count IS its cardinality, and the
                        # spec requires a DV to supersede (contain) every
                        # earlier positional delete of its file — so for a
                        # file whose sole attached delete is its DV,
                        # live rows = record_count - cardinality, no data
                        # read. Files with eq deletes or multiple pos
                        # sources stay residual.
                        d = _lite_file(fmemo, s[0][0])
                        if (d.file_format == "puffin"
                                and d.referenced_data_file is not None):
                            total += int(rc[int(i)]) - d.record_count
                            continue
                    e = c.entry(int(i))
                    task = FileScanTask(data_file=e.data_file,
                                        sequence_number=e.sequence_number)
                    task.pos_deletes.extend(_lite_file(fmemo, x)
                                            for x in s[0])
                    task.eq_deletes.extend(_lite_file(fmemo, x)
                                           for x in s[1])
                    residual.append(task)
            self.last_count_residual_files = len(residual)
            if residual:
                if spark is None:
                    raise ValueError(
                        f"{len(residual)} files need a data read to count "
                        "exactly; pass a SparkSession")
                total += self.to_df(spark, _tasks=residual).count()
            return int(total)
        total, residual = 0, []
        for task in plan.tasks:
            df_ = task.data_file
            dv_only = (not task.eq_deletes and len(task.pos_deletes) == 1
                       and task.pos_deletes[0].file_format == "puffin"
                       and task.pos_deletes[0].referenced_data_file
                       is not None)
            if (task.pos_deletes and not dv_only) or task.eq_deletes:
                residual.append(task)
            elif isinstance(bound, E.AlwaysTrue) or file_must_match(
                    bound, self._metrics_for_file(df_, schema),
                    df_.record_count):
                # stats prove every row matches; a sole DV subtracts its
                # cardinality (v3: the DV supersedes all earlier pos
                # deletes of the file), still metadata-only
                total += df_.record_count
                if dv_only:
                    total -= task.pos_deletes[0].record_count
            else:
                residual.append(task)
        self.last_count_residual_files = len(residual)
        if residual:
            if spark is None:
                raise ValueError(
                    f"{len(residual)} files need a data read to count "
                    "exactly; pass a SparkSession")
            total += self.to_df(spark, _tasks=residual).count()
        return total

    def to_df(self, spark: SparkSession,
              _tasks: Optional[List[FileScanTask]] = None) -> DataFrame:
        md = self.metadata
        plan = (self.plan_files() if _tasks is None
                else ScanPlan(tasks=_tasks, snapshot=self._resolve_snapshot()))
        snap = plan.snapshot
        schema = self._scan_schema(md, snap) if snap else md.schema()
        spark_schema = schema.to_spark()

        # fast plan (AlwaysTrue): group file-path ARRAYS by (write-schema
        # id, applicable-delete-set signature) — the same group key the
        # object path computes — without materializing per-file entry/task
        # objects. Delete files materialize LITE, once per distinct set.
        # include_metadata_columns needs a per-(spec, partition) split, so
        # it takes the object path.
        fast = (plan._fast if _tasks is None and plan._tasks is None
                and not self.include_metadata_columns else None)
        group_list: List[dict] = []
        if fast is not None:
            import numpy as np
            by_key: Dict[tuple, dict] = {}
            src_memo: Dict[int, DataFile] = {}
            _mat = functools.partial(_lite_file, src_memo)
            sig_memo: Dict[int, tuple] = {}   # id(set) -> (pos_sig, eq_sig)

            def _sig(s):
                got = sig_memo.get(id(s))
                if got is None:
                    got = sig_memo[id(s)] = (
                        tuple(sorted(_mat(x).file_path for x in s[0])),
                        tuple(sorted(_mat(x).file_path for x in s[1])))
                return got

            def _group(key):
                g = by_key.get(key)
                if g is None:
                    g = by_key[key] = {"files": [], "srcs": [],
                                       "pos_dels": {}, "eq_files": [],
                                       "eq_seen": set(), "set_seen": set()}
                return g

            for cols, idx, sets in fast:
                if not len(idx):
                    continue
                fps = cols.file_paths()
                raws = cols.schema_id_raw
                if sets is None:
                    for raw in np.unique(raws[idx]):
                        raw = int(raw)
                        sel = idx[raws[idx] == raw]
                        g = _group((None if raw == -1 else raw, (), ()))
                        g["files"].extend(fps[int(i)] for i in sel)
                        g["srcs"].append((cols, sel))
                    continue
                per_group_sel: Dict[tuple, list] = {}
                for j, i in enumerate(idx):
                    i = int(i)
                    raw = int(raws[i])
                    s = sets[j]
                    psig, esig = _sig(s) if s is not None else ((), ())
                    key = (None if raw == -1 else raw, psig, esig)
                    per_group_sel.setdefault(key, []).append(i)
                    if s is not None:
                        g = _group(key)
                        if id(s) not in g["set_seen"]:
                            g["set_seen"].add(id(s))
                            for x in s[0]:
                                d = _mat(x)
                                g["pos_dels"].setdefault(
                                    (d.file_path, d.referenced_data_file), d)
                            for x in s[1]:
                                d = _mat(x)
                                if id(d) not in g["eq_seen"]:
                                    g["eq_seen"].add(id(d))
                                    g["eq_files"].append(d)
                for key, rows in per_group_sel.items():
                    g = _group(key)
                    g["files"].extend(fps[i] for i in rows)
                    g["srcs"].append((cols, np.asarray(rows)))
            if not by_key:
                return spark.createDataFrame([], spark_schema)

            def _fast_sizes(srcs):
                out = {}
                for cols, sel in srcs:
                    fps, szs = cols.file_paths(), cols.file_sizes()
                    for i in sel:
                        out[fps[int(i)]] = szs[int(i)]
                return out

            def _fast_frids(srcs):
                out = []
                for cols, sel in srcs:
                    fps, frs = cols.file_paths(), cols.first_row_ids()
                    seqs = cols.sequence_number
                    for i in sel:
                        i = int(i)
                        out.append((_norm_path_py(fps[i]), frs[i],
                                    int(seqs[i])))
                return out

            for (schema_id, _psig, _esig), g in by_key.items():
                group_list.append(dict(
                    schema_id=schema_id, files=g["files"],
                    sizes=functools.partial(_fast_sizes, g["srcs"]),
                    frids=functools.partial(_fast_frids, g["srcs"]),
                    pos_dels=g["pos_dels"], eq_files=g["eq_files"],
                    first=None))
        else:
            if not plan.tasks:
                return spark.createDataFrame([], spark_schema)

            # group: same write-schema + same applicable delete sets +
            # same (spec, partition) read together — the last so the
            # reserved _spec_id/_partition columns
            # (metadata_columns.rs:33-66) are constant per group
            groups: Dict[Tuple, List[FileScanTask]] = {}
            for t in plan.tasks:
                sig = (t.data_file.schema_id,
                       tuple(sorted(d.file_path for d in t.pos_deletes)),
                       tuple(sorted(d.file_path for d in t.eq_deletes)))
                if self.include_metadata_columns:
                    sig = sig + (t.data_file.spec_id,
                                 tuple(sorted((k, str(v)) for k, v in
                                              t.data_file.partition.items())))
                groups.setdefault(sig, []).append(t)

            def _task_sizes(tasks):
                return {t.data_file.file_path:
                        t.data_file.file_size_in_bytes for t in tasks}

            def _task_frids(tasks):
                return [(_norm_path_py(t.data_file.file_path),
                         t.data_file.first_row_id,
                         t.sequence_number) for t in tasks]

            for sig, tasks in groups.items():
                group_list.append(dict(
                    schema_id=sig[0],
                    files=[t.data_file.file_path for t in tasks],
                    sizes=functools.partial(_task_sizes, tasks),
                    frids=functools.partial(_task_frids, tasks),
                    pos_dels={(d.file_path, d.referenced_data_file): d
                              for t in tasks for d in t.pos_deletes},
                    eq_files=[d for t in tasks for d in t.eq_deletes],
                    first=tasks[0].data_file))

        parts: List[DataFrame] = []
        del_cache = _DeleteDFCache()
        for g in group_list:
            schema_id = g["schema_id"]
            pos_dels, eq_files = g["pos_dels"], g["eq_files"]
            files = g["files"]
            # FileIO data plane (io.py spark_native): executor_reads
            # backends ship the (picklable) FileIO into the tasks and GET
            # object bytes cluster-side; others localize to the driver
            # mirror cache with the _file metadata column remapped back to
            # manifest-recorded URIs so delete joins and lineage lookups
            # still match
            remap = None
            exec_io = None
            if not spark_native_path(files[0]):
                io_impl = file_io_for(files[0])
                if getattr(io_impl, "executor_reads", False):
                    exec_io = io_impl
                else:
                    files = localize_paths(files)
                    remap = mirror_remap_pattern()
            elif (len(files) >= _executor_read_threshold(spark)
                  and self.selected_columns is None
                  and schema_id is not None
                  and all(p.startswith("/") or p.startswith("file:")
                          for p in files)):
                # many-small-files escape hatch for the ONE cost Python
                # cannot remove from Spark's native reader: handing it an
                # explicit N-file list still pays an InMemoryFileIndex
                # listing pass (plus a distributed listing job) that the
                # manifests already answered. Route the group through the
                # executor-side FileIO plane instead — split planning uses
                # manifest-recorded sizes (zero listing IO), executors GET
                # bytes and decode via Arrow. Measured at 20k small local
                # files: 35.0s native (10k-task listing job + scan) vs
                # 5.6s through this path, same rows. Auto-enabled only on
                # local[*] masters (executors provably share the
                # filesystem) above 10k files; elsewhere opt-in via
                # ICEBERG_SPARK_EXECUTOR_READ_FILES (0 disables). Groups
                # with many over-split-size files stay native — their
                # per-file footer reads would pay back the listing — and
                # explicit column selections stay native too (mapInPandas
                # blocks Catalyst column pruning; the native scan's
                # ReadSchema pruning wins for narrow projections over
                # wide tables). Guards (review r12): every file in the
                # group must be a LOCAL path (files[0] alone must not turn
                # a mixed-backend group into an all-local assumption), and
                # id-less external groups (add_files; schema_id None) stay
                # native — FOREIGN parquet may carry INT96/legacy-rebase
                # timestamps whose pyarrow decode differs from Spark's
                # datetimeRebaseModeInRead handling; files our own writer
                # produced are arrow-standard by construction.
                from .io import LocalFileIO
                io_impl = file_io_for(files[0])
                if isinstance(io_impl, LocalFileIO):
                    from .executor_io import _max_split_bytes
                    szs = g["sizes"]()
                    g["sizes"] = lambda _s=szs: _s   # computed once; reuse
                    cap = _max_split_bytes(spark)
                    oversized = sum(1 for s in szs.values()
                                    if s and s > cap)
                    if oversized <= 256:
                        exec_io = io_impl
            file_schema = self._file_schema(schema_id, schema)
            need_meta = (bool(pos_dels) or self.include_row_lineage
                         or self.include_deleted)
            if schema_id is None:
                # external id-less files (add_files): infer the physical
                # schema, then rename aliases -> canonical via name mapping
                # (spec/name_mapping fallback, arrow/reader/pipeline.rs:160-196)
                if exec_io is not None:
                    from .executor_io import fileio_parquet_df
                    gdf = fileio_parquet_df(
                        spark, files, None, exec_io, with_meta=need_meta,
                        file_sizes=g["sizes"]())
                else:
                    gdf = cached_parquet_relation(spark, files)
                alias_map = self._alias_map(schema)
                for alias, canonical in alias_map.items():
                    if alias in gdf.columns and alias != canonical:
                        gdf = gdf.withColumnRenamed(alias, canonical)
            else:
                read_schema = file_schema.to_spark()
                if self.include_row_lineage:
                    # v3 row lineage: REWRITTEN files materialize `_row_id`
                    # as a physical column (write.py keep_extra); reading it
                    # schema-on-read yields NULL for files that rely on
                    # first_row_id + position inheritance instead
                    from pyspark.sql.types import LongType, StructField
                    read_schema = read_schema.add(
                        StructField("_row_id", LongType(), True))
                    read_schema = read_schema.add(StructField(
                        "_last_updated_sequence_number", LongType(), True))
                if exec_io is not None:
                    from .executor_io import fileio_parquet_df
                    gdf = fileio_parquet_df(
                        spark, files, read_schema, exec_io,
                        with_meta=need_meta,
                        file_sizes=g["sizes"]())
                else:
                    gdf = cached_parquet_relation(spark, files, read_schema)
            if need_meta and exec_io is None:
                fcol = F.col("_metadata.file_path")
                if _paths_need_decode(files):
                    fcol = _decode_file_uri(fcol)
                if remap is not None:
                    fcol = F.regexp_replace(fcol, remap[0], remap[1])
                gdf = gdf.withColumn("_file", fcol) \
                         .withColumn("_pos", F.col("_metadata.row_index"))
            if self.include_metadata_columns:
                # reserved _spec_id/_partition (metadata_columns.rs:33-66);
                # _partition is rendered as a canonical JSON string so groups
                # from different partition specs still union cleanly
                first = g["first"]
                gdf = gdf.withColumn("_spec_id", F.lit(first.spec_id)) \
                         .withColumn("_partition", F.lit(_part_json(first.partition)))
            if self.include_row_lineage:
                # v3 row lineage: materialized `_row_id` wins; NULL entries
                # inherit first_row_id + position (scan/task.rs:70-76);
                # per-file base joined in via a tiny broadcast map
                for lineage_col in ("_row_id",
                                    "_last_updated_sequence_number"):
                    if lineage_col not in gdf.columns:  # external id-less
                        gdf = gdf.withColumn(lineage_col,
                                             F.lit(None).cast("long"))
                # per-file lineage bases: first_row_id for _row_id, the
                # file's data sequence number for
                # _last_updated_sequence_number (metadata_columns.rs:62-66 —
                # rows not rewritten since the file was added inherit it)
                frids = g["frids"]()
                if len(frids) <= 256:
                    # pure-projection map lookup: stays inside the scan
                    # stage, no broadcast-join stage on the hot path
                    nf = _norm_path(F.col("_file"))
                    seq_map = F.create_map(
                        *[x for f, _, s in frids
                          for x in (F.lit(f), F.lit(s))])
                    gdf = gdf.withColumn(
                        "_last_updated_sequence_number",
                        F.coalesce(F.col("_last_updated_sequence_number"),
                                   seq_map[nf]))
                    frid_items = [x for f, fr, _ in frids if fr is not None
                                  for x in (F.lit(f), F.lit(fr))]
                    if frid_items:
                        gdf = gdf.withColumn("_row_id", F.coalesce(
                            F.col("_row_id"),
                            F.create_map(*frid_items)[nf] + F.col("_pos")))
                else:
                    # wide plans: tiny broadcast join instead of a huge
                    # map literal in the projection
                    from ..session import local_df
                    frid_df = local_df(
                        spark, frids,
                        "_frid_file string, _frid long, _fseq long", parts=1)
                    gdf = gdf.join(
                        F.broadcast(frid_df),
                        _norm_path(gdf["_file"]) == F.col("_frid_file"),
                        "left") \
                        .withColumn("_row_id", F.coalesce(
                            F.col("_row_id"),
                            F.col("_frid") + F.col("_pos"))) \
                        .withColumn("_last_updated_sequence_number",
                                    F.coalesce(
                                        F.col("_last_updated_sequence_number"),
                                        F.col("_fseq"))) \
                        .drop("_frid_file", "_frid", "_fseq")
            if pos_dels:
                if self.include_deleted:
                    gdf = _flag_pos_deletes(spark, gdf,
                                            list(pos_dels.values()), del_cache)
                else:
                    gdf = _apply_pos_deletes(spark, gdf,
                                             list(pos_dels.values()), del_cache)
            if self.include_deleted and "_deleted" not in gdf.columns:
                gdf = gdf.withColumn("_deleted", F.lit(False))
            # project file schema -> current schema by field id
            gdf = _project_to_schema(gdf, file_schema, schema,
                                     keep_meta=self.include_row_lineage,
                                     keep_deleted=self.include_deleted)
            if eq_files:
                if self.include_deleted:
                    gdf = _flag_eq_deletes(spark, gdf, eq_files, schema,
                                           del_cache)
                else:
                    gdf = _apply_eq_deletes(spark, gdf, eq_files, schema,
                                            del_cache)
            parts.append(gdf)

        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)

        bound = E.bind(self.row_filter, schema, self.case_sensitive)
        if not isinstance(bound, E.AlwaysTrue):
            out = out.filter(E.to_spark_column(bound))
        if self.selected_columns is not None:
            out = out.select(*self.selected_columns)
        return out

    def _alias_map(self, schema: Schema) -> Dict[str, str]:
        """alias -> canonical name from the persisted name mapping."""
        from .name_mapping import NAME_MAPPING_PROPERTY, NameMapping
        text = self.metadata.properties.get(NAME_MAPPING_PROPERTY)
        if not text:
            return {}
        return NameMapping.from_json(text).alias_to_canonical(schema)

    def _file_schema(self, schema_id: Optional[int], current: Schema) -> Schema:
        if schema_id is None:
            return current
        try:
            return self.metadata.schema(schema_id)
        except KeyError:
            return current


def _cmp(v: Any) -> Any:
    from .datum import to_comparable
    return to_comparable(v)


def _part_json(part: Dict[str, Any]) -> Optional[str]:
    """Canonical JSON rendering of a partition tuple (sorted keys, values
    stringified) for the reserved _partition column."""
    import json
    if not part:
        return None
    return json.dumps({k: str(v) for k, v in sorted(part.items())})


def _pred_vector_ok(pred: E.Predicate) -> bool:
    """True when every node shape is one the vectorized matcher covers —
    known statically from the bound predicate, so prepare() can skip
    deriving metric VECTORS a per-row fallback would never read."""
    if isinstance(pred, (E.And, E.Or)):
        return _pred_vector_ok(pred.left) and _pred_vector_ok(pred.right)
    if isinstance(pred, (E.BinaryPred, E.BoundBinaryPred)):
        return pred.op not in (E.STARTS_WITH, E.NOT_STARTS_WITH)
    return True


def _pred_columns(pred: E.Predicate) -> frozenset:
    """Column names a bound predicate references — the only columns whose
    metric extracts the columnar matcher needs (same name rule as
    _eval_bounds: bound nodes carry .field, unbound .term)."""
    out: set = set()

    def walk(p):
        if isinstance(p, (E.And, E.Or)):
            walk(p.left)
            walk(p.right)
        elif isinstance(p, E.Not):
            walk(p.child)
        elif hasattr(p, "field"):
            out.add(p.field.name)
        elif hasattr(p, "term"):
            out.add(p.term)

    walk(pred)
    return frozenset(out)


def _part_key(part: Dict[str, Any]) -> Tuple:
    """Hashable canonical key for a partition tuple."""
    return tuple(sorted((k, _cmp(v)) for k, v in part.items()))


class _BoundedDeletes:
    """file_path-bounded positional deletes of one scope, stabbed by data
    path: sorted by lower bound with a running max of upper bounds, a stab
    binary-searches the lows and scans back only while the prefix max says
    a cover is still possible. Real writers emit near-disjoint path ranges
    per snapshot (delete rows sorted by file_path, rolled into files), so
    the scan-back is O(matches + snapshots), not O(deletes) — the walk
    that made 100k partition-scoped deletes quadratic against 100k files."""

    __slots__ = ("_rows", "_built")

    def __init__(self):
        self._rows: list = []
        self._built = None

    def add(self, lo: str, hi: str, rec: tuple) -> None:
        self._rows.append((lo, hi, rec))
        self._built = None                   # invalidate the built form

    def stab(self, p: str) -> list:
        # the built form is assembled LOCALLY and published in one
        # attribute assignment: stab may run from concurrent plan_files
        # callers against a cached index, and a half-built sorted view
        # would silently skip applicable deletes (row resurrection).
        # A concurrent double-build is benign; sorted() leaves _rows
        # untouched.
        built = self._built
        if built is None:
            rows = sorted(self._rows, key=lambda r: r[0])
            los = [r[0] for r in rows]
            his = [r[1] for r in rows]
            recs = [r[2] for r in rows]
            m, run = [], ""
            for h in his:
                run = h if h > run else run
                m.append(run)
            built = self._built = (los, his, m, recs)
        los, his, maxhi, recs = built
        import bisect
        j = bisect.bisect_right(los, p) - 1
        out = []
        while j >= 0 and maxhi[j] >= p:
            if his[j] >= p:
                out.append(recs[j])
            j -= 1
        return out


class _DeleteScope:
    """Recs of one scope (a partition key, or the global scope), split by
    how they match: eq/pos lists apply to every file in scope (seq-gated),
    bounded pos deletes stab by path."""

    __slots__ = ("eq", "pos", "bounded")

    def __init__(self):
        self.eq: list = []
        self.pos: list = []
        self.bounded = None


class _DeleteFileIndex:
    """Partition-keyed delete index (counterpart of the reference's
    delete_file_index.rs:84-168). Matching a data file is O(deletes applying
    to IT), not O(all deletes): deletion vectors / path-scoped deletes live
    in an exact map on ``referenced_data_file``; partition-scoped deletes in
    a dict on the canonical partition key, with file_path-bounded positional
    deletes further indexed for interval stabbing; global (unpartitioned)
    deletes in one shared scope. Sequence-number visibility applies at match
    time: pos-delete when delete.seq >= data.seq, eq-delete when > (spec
    rule, delete_file_index.rs).

    Recs carry ``(seq, content, DataFile | (cols, row))``: built from a
    columnar manifest view, the DataFile object materializes only when a
    survivor actually matches — a selective scan over a 100k-delete table
    builds a handful of delete objects, not 100k."""

    def __init__(self, delete_entries: Sequence[ManifestEntry] = ()):
        self.by_path: Dict[str, list] = {}
        self.by_partition: Dict[Tuple, _DeleteScope] = {}
        self.global_scope = _DeleteScope()
        # raw-items -> canonical _part_key memo: partition dicts repeat
        # heavily (constant per manifest for clustered writers), so the
        # sorted+normalized key computes once per DISTINCT tuple instead
        # of once per row on both the routing and the match side. Keyed
        # by the UNSORTED items tuple — two insertion orders of the same
        # dict just make two memo entries with equal values. Bounded by
        # distinct partition tuples, same as by_partition itself.
        self._pk_memo: Dict[tuple, Tuple] = {}
        for de in delete_entries:
            self.add_entry(de)

    def _route(self, seq: int, content: int, ref: Optional[str],
               part_key: Optional[Tuple], lo: Optional[str],
               hi: Optional[str], src) -> None:
        rec = (seq, content, src)
        if ref is not None:
            # normalized keys: referenced paths come from the read side's
            # normalized _file column, manifest data paths from the
            # writer — file:-scheme spelling must not split them
            self.by_path.setdefault(_norm_path_py(ref), []).append(rec)
            return
        scope = self.global_scope if part_key is None else \
            self.by_partition.get(part_key)
        if scope is None:
            scope = self.by_partition[part_key] = _DeleteScope()
        if content == CONTENT_EQUALITY_DELETES:
            scope.eq.append(rec)
        elif content != CONTENT_POSITION_DELETES:
            return                  # unknown content kind: never matches
        elif lo is not None and hi is not None:
            # bounds normalized into the same spelling as the data path:
            # a foreign writer's URI-spelled bounds would otherwise sort
            # below every normalized path and SKIP a delete that applies —
            # silent row resurrection. The scheme strip is order-preserving
            # within one table (shared prefix survives truncation). Bounds
            # are format-contract bounds, so truncated stats stay sound.
            if scope.bounded is None:
                scope.bounded = _BoundedDeletes()
            scope.bounded.add(_norm_path_py(lo), _norm_path_py(hi), rec)
        else:
            scope.pos.append(rec)

    def _pk(self, part: Dict[str, Any]) -> Tuple:
        raw = tuple(part.items())
        try:
            got = self._pk_memo.get(raw)
        except TypeError:                   # unhashable value: no memo
            return _part_key(part)
        if got is None:
            got = self._pk_memo[raw] = _part_key(part)
        return got

    def add_entry(self, de: ManifestEntry) -> None:
        d = de.data_file
        self._route(de.sequence_number, d.content, d.referenced_data_file,
                    (d.spec_id, self._pk(d.partition)) if d.partition
                    else None,
                    d.lower_bounds.get("file_path"),
                    d.upper_bounds.get("file_path"), d)

    def add_columns(self, cols: ManifestColumns) -> List[ManifestEntry]:
        """Route every live delete entry of a columnar manifest view;
        returns stray DATA entries found in the delete manifest (external
        writers could mix content). Touches only flat arrays — per-row
        delete objects stay unbuilt until a survivor matches."""
        import numpy as np
        if cols._tab is None:
            strays = []
            for e in cols.entries():
                if e.status == STATUS_DELETED:
                    continue
                if e.data_file.content == CONTENT_DATA:
                    strays.append(e)
                else:
                    self.add_entry(e)
            return strays
        live = cols.status != STATUS_DELETED
        strays = [cols.entry(int(i)) for i in
                  np.nonzero(live & (cols.content == CONTENT_DATA))[0]]
        del_rows = np.nonzero(live & (cols.content != CONTENT_DATA))[0]
        if not len(del_rows):
            return strays
        refs = cols._col("referenced_data_file")
        _vc, _nc, _nanc, los, his = cols.metric_arrays("file_path")
        # bulk numpy->py conversions (tolist) instead of per-element int():
        # routing runs once per delete row per cold plan — 110k rows at
        # 100k-file scale — so per-row overhead is the whole cost here
        idx_l = del_rows.tolist()
        seq_l = cols.sequence_number[del_rows].tolist()
        con_l = cols.content[del_rows].tolist()
        spec_l = cols.spec_id[del_rows].tolist()
        by_path = self.by_path
        pcodes = pparts = None              # lazy: DV-only manifests skip it
        pk_by_code: dict = {}
        for j, i in enumerate(idx_l):
            ref = refs[i]
            if ref is not None:
                # path-scoped (the DV common case), inlined _route:
                # normalized key — see _route for the spelling rule
                by_path.setdefault(_norm_path_py(ref), []).append(
                    (seq_l[j], con_l[j], (cols, i)))
                continue
            if pcodes is None:
                # partition dicts decode once per DISTINCT raw value
                # (vectorized run detection), not once per delete row
                pcodes, pparts = cols.partition_groups()
            code = int(pcodes[i])
            pk = pk_by_code.get(code)
            if pk is None:
                part = pparts[code]
                pk = pk_by_code[code] = (self._pk(part) if part else False)
            self._route(seq_l[j], con_l[j], None,
                        (spec_l[j], pk) if pk is not False else None,
                        los[i], his[i], (cols, i))
        return strays

    @staticmethod
    def _file(src) -> DataFile:
        # lite: matched delete files skip the six stat-map decodes the
        # read path never consults (their bounds/counts were already
        # used from flat arrays during routing)
        if type(src) is tuple:
            return src[0].data_file_lite(src[1])
        return src

    def match(self, entry: ManifestEntry, task: "FileScanTask") -> None:
        df_ = entry.data_file
        seq = entry.sequence_number
        p = _norm_path_py(df_.file_path)
        scoped = self.by_path.get(p)
        if scoped:
            for dseq, content, src in scoped:
                if content == CONTENT_POSITION_DELETES and dseq >= seq:
                    task.pos_deletes.append(self._file(src))
                elif content == CONTENT_EQUALITY_DELETES and dseq > seq:
                    task.eq_deletes.append(self._file(src))
        # partition-scoped deletes match only files of the SAME spec
        # (delete_file_index.rs:194,211): a partition-key name/value
        # collision across evolved specs must not attach foreign deletes
        # (eq-deletes are not self-limiting at read time)
        scopes = (self.global_scope,) if not df_.partition else \
            (self.global_scope,
             self.by_partition.get((df_.spec_id,
                                    self._pk(df_.partition))))
        for scope in scopes:
            if scope is None:
                continue
            for dseq, _content, src in scope.pos:
                if dseq >= seq:
                    task.pos_deletes.append(self._file(src))
            if scope.bounded is not None:
                for dseq, _content, src in scope.bounded.stab(p):
                    if dseq >= seq:
                        task.pos_deletes.append(self._file(src))
            for dseq, _content, src in scope.eq:
                if dseq > seq:
                    task.eq_deletes.append(self._file(src))

    @property
    def empty(self) -> bool:
        g = self.global_scope
        return not (self.by_path or self.by_partition
                    or g.pos or g.eq or g.bounded)

    def match_arrays(self, cols: "ManifestColumns", idx) -> Optional[list]:
        """Bulk twin of ``match`` for the AlwaysTrue array fast plan: one
        pass over the survivor-index array of a DATA manifest, returning a
        list aligned with ``idx`` whose elements are None (no applicable
        deletes) or an INTERNED ``(pos_srcs, eq_srcs)`` tuple of rec
        sources (materialize via ``_file`` only when a consumer builds
        tasks/DataFrames). Same seq-visibility and (spec_id, partition)
        scoping rules as ``match`` — the per-survivor work is dict lookups
        against pre-grouped state: scope delete lists memoize per
        (scope, data seq), partition keys come from the run-deduplicated
        ``partition_groups`` codes, and partition dicts never decode at
        all when only path-scoped deletes exist (the DV common case).
        Returns None when the index is empty."""
        import numpy as np
        n = len(idx)
        if n == 0 or self.empty:
            return None
        fps = cols.file_paths()
        seqs = cols.sequence_number
        specs = cols.spec_id
        by_path = self.by_path
        gscope = self.global_scope
        need_part = bool(self.by_partition)
        pcodes = pparts = None
        if need_part:
            pcodes, pparts = cols.partition_groups()
        scope_memo: dict = {}               # (id(scope), seq) -> (pos, eq)
        scope_by_code: dict = {}            # (code, spec) -> scope | None
        set_memo: dict = {}                 # id-tuples -> interned sets
        out = [None] * n
        idx_l = idx.tolist() if hasattr(idx, "tolist") else list(idx)
        for j, i in enumerate(idx_l):
            seq = int(seqs[i])
            p = _norm_path_py(fps[i])
            pos_parts: list = []
            eq_parts: list = []
            rl = by_path.get(p)
            if rl:
                for dseq, content, src in rl:
                    if content == CONTENT_POSITION_DELETES and dseq >= seq:
                        pos_parts.append(src)
                    elif content == CONTENT_EQUALITY_DELETES and dseq > seq:
                        eq_parts.append(src)
            pscope = None
            if need_part:
                code = int(pcodes[i])
                skey = (code, int(specs[i]))
                pscope = scope_by_code.get(skey, False)
                if pscope is False:
                    part = pparts[code]
                    pscope = (self.by_partition.get(
                        (skey[1], self._pk(part))) if part else None)
                    scope_by_code[skey] = pscope
            for scope in (gscope, pscope):
                if scope is None:
                    continue
                mkey = (id(scope), seq)
                got = scope_memo.get(mkey)
                if got is None:
                    got = scope_memo[mkey] = (
                        tuple(src for dseq, _c, src in scope.pos
                              if dseq >= seq),
                        tuple(src for dseq, _c, src in scope.eq
                              if dseq > seq))
                pos_parts.extend(got[0])
                eq_parts.extend(got[1])
                if scope.bounded is not None:
                    for dseq, _c, src in scope.bounded.stab(p):
                        if dseq >= seq:
                            pos_parts.append(src)
            if not pos_parts and not eq_parts:
                continue
            ikey = (tuple(map(id, pos_parts)), tuple(map(id, eq_parts)))
            interned = set_memo.get(ikey)
            if interned is None:
                interned = set_memo[ikey] = (tuple(pos_parts),
                                             tuple(eq_parts))
            out[j] = interned
        if not any(x is not None for x in out):
            return None
        return out


def _delete_set_bytes(deletes: List["DataFile"]) -> int:
    """On-disk size of a delete set — known from the manifests, no IO."""
    total = 0
    for d in deletes:
        if d.file_format == "puffin" and d.content_size_in_bytes:
            total += d.content_size_in_bytes
        else:
            total += d.file_size_in_bytes or 0
    return total


def _executor_read_threshold(spark: SparkSession) -> int:
    """File count above which a spark-native group routes through the
    executor-side FileIO read plane (see to_df). Env
    ICEBERG_SPARK_EXECUTOR_READ_FILES overrides (0 disables); the default
    auto-enables at 10k files ONLY on local[*] masters, where executor
    and driver provably share the filesystem — on a real cluster the
    operator must opt in (shared FS / NFS mounts)."""
    env = os.environ.get("ICEBERG_SPARK_EXECUTOR_READ_FILES")
    if env is not None:
        try:
            n = int(env)
            return n if n > 0 else (1 << 62)
        except ValueError:
            pass
    try:
        if spark.sparkContext.master.startswith("local"):
            return 10000
    except Exception:
        pass
    return 1 << 62


def _broadcast_threshold(spark: SparkSession) -> int:
    try:
        # conf may carry a unit suffix (e.g. "10m"); fall back on parse issues
        s = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")).lower()
        if s.endswith("k"):
            n = int(s[:-1]) * 1024
        elif s.endswith("m"):
            n = int(s[:-1]) * 1024 * 1024
        elif s.endswith("g"):
            n = int(s[:-1]) * 1024 * 1024 * 1024
        else:
            n = int(s.rstrip("b"))
        return n if n > 0 else 32 * 1024 * 1024
    except Exception:
        return 32 * 1024 * 1024


def _maybe_broadcast(spark: SparkSession, df: DataFrame, on_disk_bytes: int):
    """Broadcast iff the delete set is provably small. Parquet delete files
    expand in memory (dictionary/RLE undone), so gate at threshold/4 of the
    on-disk bytes we already know from the manifests. A merge-heavy table can
    accumulate delete files past the 8 GB broadcast hard limit — those take
    the shuffle anti-join path (AQE may still pick a broadcast after its own
    runtime size estimate, which is the right call to delegate)."""
    if on_disk_bytes * 4 <= _broadcast_threshold(spark):
        return F.broadcast(df)
    return df


class _DeleteDFCache:
    """Per-scan delete-DataFrame memo (counterpart of the reference's
    CachingDeleteFileLoader, arrow/caching_delete_file_loader.rs:265): each
    distinct delete file set becomes a DataFrame once per scan; when a second
    task group references the same set, the DF is persisted so executors read
    the (small) delete files once instead of once per union branch."""

    def __init__(self):
        self._memo: Dict[Tuple, DataFrame] = {}
        self._cached: set = set()

    def get(self, key: Tuple, build) -> DataFrame:
        df = self._memo.get(key)
        if df is None:
            df = build()
            self._memo[key] = df
        elif key not in self._cached:
            df.cache()   # marks the shared plan; first action materializes
            self._cached.add(key)
        return df


# decoded deletion-vector positions, cached ACROSS scans (the per-scan
# _DeleteDFCache can't help a second query on the same table): keyed by
# (path, offset, length, mtime) like the manifest caches, so a rewritten
# puffin file naturally invalidates. Values are numpy arrays — bounded by
# the referenced file's row count, i.e. metadata-sized.
@functools.lru_cache(maxsize=512)
def _dv_positions(path: str, offset: int, length: int, mtime_ns: int):
    from .puffin import BlobMetadata, deserialize_dv, read_blob
    blob = read_blob(path, BlobMetadata(
        type="deletion-vector-v1", fields=[], snapshot_id=0,
        sequence_number=0, offset=offset, length=length))
    return deserialize_dv(blob)


_DV_DRIVER_DECODE_BYTES = 1 << 20  # 1 MiB of blobs ≈ a few hundred k positions


def _dv_mtime(path: str) -> int:
    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return 0


def dv_pairs_df(spark: SparkSession, dv_files: List["DataFile"]) -> DataFrame:
    """Puffin deletion-vector entries -> (_del_file, _del_pos) DataFrame.

    Small blob total: decode on the driver through the cross-scan LRU and
    ship via Arrow (fast path for interactive reads). Large: ship only the
    blob DESCRIPTORS and decode inside mapInPandas — positions never touch
    the driver, and decode parallelism scales with executors (the shape a
    1000-executor cluster needs when thousands of files carry DVs)."""
    total = sum(d.content_size_in_bytes or 0 for d in dv_files)
    # non-spark_native stores always decode on the driver: executor Python
    # workers can't resolve dynamically registered FileIO backends
    if (total <= _DV_DRIVER_DECODE_BYTES
            or not spark_native_path(dv_files[0].file_path)):
        import numpy as np
        import pandas as pd
        refs, parts = [], []
        for d in dv_files:
            pos = _dv_positions(d.file_path, d.content_offset,
                                d.content_size_in_bytes,
                                _dv_mtime(d.file_path))
            refs.extend([d.referenced_data_file] * len(pos))
            parts.append(pos)
        allpos = np.concatenate(parts) if parts else np.array([], dtype="int64")
        return spark.createDataFrame(
            pd.DataFrame({"_del_file": pd.Series(refs, dtype="object"),
                          "_del_pos": allpos.astype("int64")}),
            schema="_del_file string, _del_pos long")

    desc = spark.createDataFrame(
        [(d.file_path, int(d.content_offset), int(d.content_size_in_bytes),
          d.referenced_data_file) for d in dv_files],
        "p string, o long, l long, ref string").repartition(
            min(len(dv_files), 64))

    def decode(batches):
        import pandas as pd
        from iceberg_rust_spark.sources.puffin import (BlobMetadata,
                                                       deserialize_dv,
                                                       read_blob)
        for pdf in batches:
            for p, o, l, ref in pdf.itertuples(index=False):
                blob = read_blob(p, BlobMetadata(
                    type="deletion-vector-v1", fields=[], snapshot_id=0,
                    sequence_number=0, offset=o, length=l))
                pos = deserialize_dv(blob)
                yield pd.DataFrame({"_del_file": [ref] * len(pos),
                                    "_del_pos": pos.astype("int64")})

    return desc.mapInPandas(decode, "_del_file string, _del_pos long")


def cached_parquet_relation(spark: SparkSession, files: Sequence[str],
                            read_schema=None) -> DataFrame:
    """Memoized ``spark.read[.schema].parquet(*files)`` per session.

    DataFrameReader.parquet resolves the relation EAGERLY (file-status
    listing + source resolution in the JVM) — measured ~0.25 s of driver
    wall for an 83-file group on this box, repeated identically on every
    scan of the same file set. Iceberg data/delete files are immutable and
    never reused at the same path (UUID names), so the analyzed relation is
    content-addressed by its path list: memoize it, LRU-capped, exactly
    like _pos_parquet_pairs_df's delete-relation cache. The cache lives on
    the session wrapper (dies with the session) and holds lazy PLANS, never
    results — every action still reads the parquet inputs."""
    cache = getattr(spark, "_irs_parquet_rel_cache", None)
    if cache is None:
        cache = OrderedDict()
        spark._irs_parquet_rel_cache = cache
    if read_schema is None:
        skey = None
    elif isinstance(read_schema, str):
        skey = read_schema
    else:
        skey = read_schema.json()
    key = (tuple(files), skey)
    got = cache.get(key)
    if got is not None:
        cache.move_to_end(key)
        return got
    reader = spark.read if read_schema is None \
        else spark.read.schema(read_schema)
    df = reader.parquet(*files)
    cache[key] = df
    while len(cache) > 256:
        cache.popitem(last=False)
    return df


# spec-fixed layout of positional-delete parquet files (field ids
# 2147483546/2147483545); passing it explicitly skips Spark's per-read
# footer schema inference, and delete files never carry other columns we
# read (the optional `row` struct is projected away regardless)
_POS_DELETE_READ_SCHEMA = "file_path string, pos bigint"


def _pos_parquet_pairs_df(spark: SparkSession,
                          paths: Sequence[str]) -> DataFrame:
    """(_del_file, _del_pos) DataFrame over parquet pos-delete files,
    memoized per session keyed by (paths, mtimes): delete files are
    immutable once written (a rewrite changes mtime, like the manifest
    caches), so re-resolving the relation on every scan of the same table
    only repeated driver-side source resolution (~60ms of py4j per scan)."""
    cache = getattr(spark, "_irs_pos_delete_cache", None)
    if cache is None:
        cache = OrderedDict()
        spark._irs_pos_delete_cache = cache
    key = (tuple(paths),
           tuple(file_io_for(p).mtime_ns(p) for p in paths))
    localized = bool(paths) and not spark_native_path(paths[0])
    got = cache.get(key)
    if got is not None:
        cache.move_to_end(key)
        if localized:
            # the memoized relation reads local mirror copies, and the
            # mirror is LRU-capped: re-run localize_paths on every hit so
            # an evicted copy is re-fetched (and recency refreshed) before
            # the relation's next action — a no-op when the files are
            # still present (stat per file), a re-download when not
            localize_paths(list(paths))
        return got
    read_paths = list(paths)
    if localized:
        read_paths = localize_paths(read_paths)
    df = (spark.read.schema(_POS_DELETE_READ_SCHEMA).parquet(*read_paths)
          .select(F.col("file_path").alias("_del_file"),
                  F.col("pos").alias("_del_pos")))
    cache[key] = df
    # LRU cap: a long session over many delete rewrites would otherwise
    # pin every historical relation (each holds a JVM logical plan)
    while len(cache) > 256:
        cache.popitem(last=False)
    return df


def _pos_delete_df(spark: SparkSession, pos_deletes: List["DataFile"],
                   del_cache: _DeleteDFCache) -> Tuple[DataFrame, int]:
    """Shared (file, pos) delete-set builder for the drop and flag paths:
    parquet delete files carry (file_path string, pos long) rows per the
    spec; Puffin deletion-vector blobs decode through dv_pairs_df
    (size-gated driver LRU vs executor-side). Returns (df, on-disk bytes)
    so callers can size the broadcast decision identically."""
    parquet_paths = sorted({d.file_path for d in pos_deletes
                            if d.file_format == "parquet"})
    dv_files = sorted((d for d in pos_deletes if d.file_format == "puffin"),
                      key=lambda d: (d.file_path, d.content_offset or 0))

    def build() -> DataFrame:
        parts = []
        if parquet_paths:
            parts.append(_pos_parquet_pairs_df(spark, parquet_paths))
        if dv_files:
            parts.append(dv_pairs_df(spark, dv_files))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    key = ("pos", tuple(parquet_paths),
           tuple((d.file_path, d.content_offset) for d in dv_files))
    return del_cache.get(key, build), _delete_set_bytes(pos_deletes)


def _apply_pos_deletes(spark: SparkSession, gdf: DataFrame,
                       pos_deletes: List["DataFile"],
                       del_cache: _DeleteDFCache) -> DataFrame:
    """Positional deletes: anti-join on (file, pos). Broadcast only when
    the manifests prove the set is small."""
    del_df, nbytes = _pos_delete_df(spark, pos_deletes, del_cache)
    del_df = _maybe_broadcast(spark, del_df, nbytes)
    return gdf.join(
        del_df,
        on=[_norm_path(gdf["_file"]) == _norm_path(del_df["_del_file"]),
            gdf["_pos"] == del_df["_del_pos"]],
        how="left_anti")


def _flag_pos_deletes(spark: SparkSession, gdf: DataFrame,
                      pos_deletes: List["DataFile"],
                      del_cache: _DeleteDFCache) -> DataFrame:
    """`_deleted`-mode twin of _apply_pos_deletes: a left OUTER join marks
    hit rows true instead of dropping them (metadata_columns.rs:39 — the
    reserved _deleted column). The delete set is deduped on (file, pos)
    first so the outer join cannot fan rows out when the same position is
    deleted by several delete files."""
    del_df, nbytes = _pos_delete_df(spark, pos_deletes, del_cache)
    del_df = del_df.dropDuplicates(["_del_file", "_del_pos"]) \
        .withColumn("_del_hit", F.lit(True))
    del_df = _maybe_broadcast(spark, del_df, nbytes)
    joined = gdf.join(
        del_df,
        on=[_norm_path(gdf["_file"]) == _norm_path(del_df["_del_file"]),
            gdf["_pos"] == del_df["_del_pos"]],
        how="left")
    return joined.withColumn(
        "_deleted", F.coalesce(F.col("_del_hit"), F.lit(False))) \
        .drop("_del_file", "_del_pos", "_del_hit")


def _flag_eq_deletes(spark: SparkSession, gdf: DataFrame,
                     eq_deletes: List["DataFile"], schema: Schema,
                     del_cache: _DeleteDFCache) -> DataFrame:
    """`_deleted`-mode twin of _apply_eq_deletes: OR each equality-column
    group's hits into the existing _deleted flag via left outer joins.
    Null-unsafe join keys preserve Iceberg's null-keep semantics — a data
    row with NULL in an equality column never matches, so it stays
    _deleted=false (caching_delete_file_loader.rs:422-426)."""
    out = gdf
    for cols, del_df in _eq_delete_groups(spark, eq_deletes, schema,
                                          del_cache):
        del_df = del_df.withColumn("_eq_hit", F.lit(True))
        out = out.join(del_df, on=list(cols), how="left") \
            .withColumn("_deleted",
                        F.col("_deleted")
                        | F.coalesce(F.col("_eq_hit"), F.lit(False))) \
            .drop("_eq_hit")
    return out


def _eq_delete_groups(spark: SparkSession, eq_deletes: List["DataFile"],
                      schema: Schema, del_cache: _DeleteDFCache):
    """Shared per-equality-column-group delete sets for the drop and flag
    paths: distinct key tuples per group, broadcast when the manifests
    prove them small. Yields (cols, del_df)."""
    by_cols: Dict[Tuple[str, ...], List["DataFile"]] = {}
    for d in eq_deletes:
        cols = tuple(sorted(_eq_cols(d, schema)))
        by_cols.setdefault(cols, []).append(d)
    for cols, dfiles in by_cols.items():
        paths = tuple(sorted({d.file_path for d in dfiles}))
        read_paths = (paths if spark_native_path(paths[0])
                      else tuple(localize_paths(list(paths))))
        del_df = del_cache.get(
            ("eq", cols, paths),
            lambda rp=read_paths: spark.read.parquet(*rp)
            .select(*cols).dropDuplicates())
        yield cols, _maybe_broadcast(spark, del_df, _delete_set_bytes(dfiles))


def scan_execution_metrics(df: DataFrame) -> Dict[str, int]:
    """Execution-side scan metrics, the counterpart of the reference's
    ScanMetrics/CountingFileRead (arrow/scan_metrics.rs:30-73 wraps every
    FileRead to count bytes fetched): Spark's FileSourceScanExec publishes
    the same observability as SQLMetrics, so after an action this walks
    the executed plan (descending into AQE re-plans) and aggregates every
    scan node into {bytes_scanned, files_scanned, rows_scanned,
    scan_time_ms}. Call AFTER an action that ran THIS DataFrame's own plan
    (collect/write/toPandas) — derived plans like df.count() execute a new
    queryExecution and leave this one's metrics at zero. Driver-side plan
    traversal only; nothing touches executors."""
    totals = {"bytes_scanned": 0, "files_scanned": 0,
              "rows_scanned": 0, "scan_time_ms": 0}
    seen = set()

    def metric_map(node):
        out = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
        return out

    def walk(node):
        oid = node.id() if hasattr(node, "id") else id(node)
        if oid in seen:
            return
        seen.add(oid)
        cls = node.getClass().getSimpleName()
        if cls in ("FileSourceScanExec", "BatchScanExec"):
            m = metric_map(node)
            totals["bytes_scanned"] += int(m.get("filesSize", 0))
            totals["files_scanned"] += int(m.get("numFiles", 0))
            totals["rows_scanned"] += int(m.get("numOutputRows", 0))
            totals["scan_time_ms"] += int(m.get("scanTime", 0))
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def _norm_path(c):
    return F.regexp_replace(c, "^file:/*", "/")


# characters that provably round-trip Spark's URI spelling unchanged
# (RFC 3986 unreserved + the path/scheme chars Hadoop leaves literal —
# '=' and '~' verified empirically against _metadata.file_path)
_URI_PLAIN = None


def _paths_need_decode(paths) -> bool:
    """True if ANY path could be spelled differently by Spark's URI
    encoding. When all of a scan's file paths are plain (our own writer's
    layout unless a partition VALUE carries special characters), the
    per-row url_decode is an identity and is skipped — it measured ~0.2-0.4s
    per MOR query at sf0.1 because _file feeds the delete anti-join key."""
    global _URI_PLAIN
    if _URI_PLAIN is None:
        import re
        _URI_PLAIN = re.compile(r"^[A-Za-z0-9/:=.\-_~]*$")
    return not all(_URI_PLAIN.match(p) for p in paths)


def _decode_file_uri(c):
    """Spark's ``_metadata.file_path`` / ``input_file_name()`` return the
    URI spelling of a path (space -> %20, %% -> %25, ...); manifests store
    RAW paths. Every `_file` value is decoded back to the raw spelling at
    its production site so path equality against manifest-derived strings
    (delete-index bounds, referenced_data_file maps, row-lineage bases,
    commit validation targets) holds for paths with special characters.
    ``+`` is URI-path-legal and arrives literal, so it is pre-escaped to
    survive url_decode's form-decoding (+ -> space)."""
    return F.url_decode(F.regexp_replace(c, r"\+", "%2B"))


def _decode_file_uri_py(p: str) -> str:
    """Driver twin of _decode_file_uri (unquote leaves ``+`` alone)."""
    from urllib.parse import unquote
    return unquote(p)


_FILE_SCHEME_RE = __import__("re").compile(r"^file:/*")


def _norm_path_py(p: str) -> str:
    """Python twin of _norm_path for driver-side map keys. The startswith
    guard matters: delete-index routing + survivor matching call this once
    per path (O(files + deletes) calls per cold plan), and plain paths —
    the overwhelming case — must not pay a regex sub (measured 0.65s of a
    2.3s cold 100k-file MOR plan before the guard)."""
    if p.startswith("file:"):
        return _FILE_SCHEME_RE.sub("/", p)
    return p


def _apply_eq_deletes(spark: SparkSession, gdf: DataFrame,
                      eq_deletes: List[DataFile], schema: Schema,
                      del_cache: _DeleteDFCache) -> DataFrame:
    """Equality deletes as left_anti joins. Spark's null-unsafe join keys keep
    data rows whose equality column is NULL — exactly Iceberg's null-keep
    semantics (caching_delete_file_loader.rs:422-426)."""
    out = gdf
    for cols, del_df in _eq_delete_groups(spark, eq_deletes, schema,
                                          del_cache):
        out = out.join(del_df, on=list(cols), how="left_anti")
    return out


def _eq_cols(d: DataFile, schema: Schema) -> List[str]:
    names = []
    for fid in d.equality_ids:
        f = schema.field_by_id(fid)
        if f is not None:
            names.append(f.name)
    return names


def _project_nested(expr, old_type, new_type, path: str):
    """Recursive field-id projection INSIDE nested types
    (record_batch_transformer.rs handles nesting the same way): struct
    children are matched by field id — renamed/promoted/added/dropped nested
    fields resolve correctly where a bare Spark struct cast would match by
    POSITION. Lists/maps recurse through transform()/map lambdas (codegen'd,
    no Python)."""
    from .types import ListType, MapType, StructType as IceStruct
    if isinstance(new_type, IceStruct):
        old_by_id = ({f.field_id: f for f in old_type.fields}
                     if isinstance(old_type, IceStruct) else {})
        children = []
        for nf in new_type.fields:
            of = old_by_id.get(nf.field_id)
            tgt = type_to_spark(nf.field_type)
            if of is not None:
                children.append(_project_nested(
                    expr.getField(of.name), of.field_type, nf.field_type,
                    f"{path}.{nf.name}").alias(nf.name))
            elif nf.initial_default is not None:
                children.append(F.lit(nf.initial_default).cast(tgt)
                                .alias(nf.name))
            elif nf.required:
                raise ValueError(
                    f"required nested field {path}.{nf.name} absent from "
                    f"file schema and has no default")
            else:
                children.append(F.lit(None).cast(tgt).alias(nf.name))
        # a NULL struct must stay NULL, not become a struct of NULLs
        return F.when(expr.isNull(), F.lit(None).cast(type_to_spark(new_type))) \
            .otherwise(F.struct(*children))
    if isinstance(new_type, ListType) and isinstance(old_type, ListType):
        return F.transform(expr, lambda x: _project_nested(
            x, old_type.element_type, new_type.element_type, f"{path}[]"))
    if isinstance(new_type, MapType) and isinstance(old_type, MapType):
        return F.map_from_arrays(
            F.transform(F.map_keys(expr), lambda k: _project_nested(
                k, old_type.key_type, new_type.key_type, f"{path}{{k}}")),
            F.transform(F.map_values(expr), lambda v: _project_nested(
                v, old_type.value_type, new_type.value_type, f"{path}{{v}}")))
    return expr.cast(type_to_spark(new_type))


def _project_to_schema(gdf: DataFrame, file_schema: Schema, current: Schema,
                       keep_meta: bool = False,
                       keep_deleted: bool = False) -> DataFrame:
    """4-rule field-id projection: same id present -> use (rename+promote);
    promotable -> cast; initial_default -> constant; else NULL (error if
    required). Recurses into structs/lists/maps by field id. Mirrors
    record_batch_transformer.rs:697-749 behavior.

    Fast path: when every current field resolves to a same-name, same-type
    file column (no evolution — the overwhelmingly common scan), the
    projection is a plain name select. That's ONE py4j call instead of a
    per-column expression-tree build, which otherwise dominates driver-side
    planning wall (hundreds of gateway round-trips per scan)."""
    gcols = set(gdf.columns)
    identity = True
    for f in current.fields:
        old = file_schema.field_by_id(f.field_id)
        if (old is None or old.name != f.name or old.name not in gcols
                or old.field_type != f.field_type):
            identity = False
            break
    if identity:
        names = [f.name for f in current.fields]
        if keep_meta:
            names += ["_file", "_pos"]
            names += [x for x in ("_spec_id", "_partition", "_row_id",
                                  "_last_updated_sequence_number")
                      if x in gcols]
        if keep_deleted and "_deleted" in gcols:
            names.append("_deleted")
        return gdf.select(*names)
    cols = []
    for f in current.fields:
        old = file_schema.field_by_id(f.field_id)
        tgt = type_to_spark(f.field_type)
        if old is not None and old.name in gdf.columns:
            cols.append(_project_nested(F.col(old.name), old.field_type,
                                        f.field_type, f.name).alias(f.name))
        elif f.initial_default is not None:
            cols.append(F.lit(f.initial_default).cast(tgt).alias(f.name))
        elif f.required:
            raise ValueError(f"required field {f.name} absent from file schema "
                             f"{file_schema.schema_id} and has no default")
        else:
            cols.append(F.lit(None).cast(tgt).alias(f.name))
    if keep_meta:
        cols += [F.col("_file"), F.col("_pos")]
        for extra in ("_spec_id", "_partition", "_row_id",
                      "_last_updated_sequence_number"):
            if extra in gdf.columns:
                cols.append(F.col(extra))
    if keep_deleted and "_deleted" in gdf.columns:
        cols.append(F.col("_deleted"))
    return gdf.select(*cols)
