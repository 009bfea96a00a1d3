"""FileIO: pluggable storage for the METADATA path (catalog, manifests,
puffin, view/metadata JSON, checkpoints).

Counterpart of the reference's FileIO trait
(/root/reference/crates/iceberg/src/io/file_io.rs:63,170) with its opendal
backends (crates/storage/opendal/src/{fs,memory,s3,...}.rs). Spark itself
reads/writes the DATA files through its own Hadoop connectors (s3a:// etc.),
so this abstraction only needs to cover driver-side metadata IO:

- ``LocalFileIO``   — plain/``file://`` paths (default);
- ``MemoryFileIO``  — ``memory://bucket/...`` in-process store (tests; the
                      reference's memory backend);
- ``FsspecFileIO``  — any scheme fsspec can mount (s3/gcs/abfs), gated
                      behind an import-try since the lib may be absent.

All paths flow through ``file_io_for(path)``; callers never touch ``os.*``
for metadata. Joins stay string-based (``posix_join``) so URIs survive.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

__all__ = ["FileIO", "LocalFileIO", "MemoryFileIO", "file_io_for",
           "posix_join", "strip_scheme"]


def posix_join(*parts: str) -> str:
    """Join path segments without mangling URI schemes."""
    out = parts[0]
    for p in parts[1:]:
        out = out.rstrip("/") + "/" + p.lstrip("/")
    return out


def strip_scheme(path: str) -> str:
    """file:///x -> /x (for handing to local-FS libraries / executors)."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        return rest if rest.startswith("/") else "/" + rest
    return path


class FileIO:
    """Abstract storage interface; see module docstring."""

    #: True when Spark's own (Hadoop) IO layer can read/write this
    #: backend's paths directly — the distributed fast path. False routes
    #: the engine through the FileIO data plane instead: staged writes
    #: uploaded via write_bytes, scans localized via read_bytes, and
    #: delete/DV assembly kept driver-side (executor Python workers can't
    #: see dynamically registered backends). Real clusters configure the
    #: Hadoop connector (s3a://...) and stay on the native path; this
    #: fallback is for FileIO-only stores (memory://, registered shims).
    spark_native = True

    #: True when instances of this FileIO are PICKLABLE and remain valid
    #: inside executor Python workers (the client carries its own
    #: credentials/endpoint state, no process-local registry needed).
    #: Non-spark_native backends that set this read data files
    #: EXECUTOR-SIDE through executor_io.fileio_parquet_df — whole-object
    #: GET + pyarrow decode per task — instead of the driver localize
    #: mirror. memory:// must stay False (its store is a driver-process
    #: dict); real object-store clients (boto-style) can be True.
    executor_reads = False

    def read_bytes(self, path: str, offset: Optional[int] = None,
                   length: Optional[int] = None) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def create_exclusive(self, path: str, data: bytes) -> None:
        """CAS primitive: create iff absent, else FileExistsError.
        (Local: O_EXCL; object stores: conditional PUT / If-None-Match.)"""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Atomic replace (metadata-sized objects only)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_file(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime_ns(self, path: str) -> int:
        """Version stamp for immutable-object caches (object_cache.rs:49)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> List[str]:
        """Immediate child NAMES (files and dirs)."""
        raise NotImplementedError

    def list_files(self, prefix: str) -> List[str]:
        """All file PATHS under prefix, recursively."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    # convenience ----------------------------------------------------------
    def read_text(self, path: str) -> str:
        """UTF-8 text; gzip decompresses transparently — detected by the
        1f8b magic, not the filename, because writers disagree on naming
        (`v3.metadata.json.gz` here, `v3-uuid.gz.metadata.json` in
        Java/the reference's metadata_location.rs:93) and Iceberg metadata
        JSON may be gzip-compressed regardless
        (write.metadata.compression-codec, reference compression.rs)."""
        data = self.read_bytes(path)
        if data[:2] == b"\x1f\x8b":
            import gzip
            data = gzip.decompress(data)
        return data.decode("utf-8")

    def write_text(self, path: str, text: str) -> None:
        data = text.encode("utf-8")
        if path.endswith(".gz"):
            import gzip
            # mtime=0: deterministic bytes for identical content
            data = gzip.compress(data, mtime=0)
        self.write_bytes(path, data)


class LocalFileIO(FileIO):
    """Posix FS; accepts bare paths and file:// URIs interchangeably."""

    @staticmethod
    def local_path(path):
        """Real filesystem path (executor_io opens it directly so pyarrow
        reads only the projected column chunks from disk)."""
        return strip_scheme(path)

    def read_bytes(self, path, offset=None, length=None):
        with open(strip_scheme(path), "rb") as fh:
            if offset is not None:
                fh.seek(offset)
                return fh.read(length) if length is not None else fh.read()
            return fh.read()

    def write_bytes(self, path, data):
        p = strip_scheme(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(data)

    def create_exclusive(self, path, data):
        p = strip_scheme(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)

    def rename(self, src, dst):
        os.replace(strip_scheme(src), strip_scheme(dst))

    def exists(self, path):
        return os.path.exists(strip_scheme(path))

    def is_file(self, path):
        return os.path.isfile(strip_scheme(path))

    def is_dir(self, path):
        return os.path.isdir(strip_scheme(path))

    def size(self, path):
        return os.path.getsize(strip_scheme(path))

    def mtime_ns(self, path):
        return os.stat(strip_scheme(path)).st_mtime_ns

    def delete(self, path):
        os.remove(strip_scheme(path))

    def delete_prefix(self, prefix):
        import shutil
        shutil.rmtree(strip_scheme(prefix), ignore_errors=True)

    def list_dir(self, path):
        p = strip_scheme(path)
        return sorted(os.listdir(p)) if os.path.isdir(p) else []

    def list_files(self, prefix):
        root = strip_scheme(prefix)
        out = []
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                out.append(os.path.join(dirpath, n))
        return sorted(out)

    def makedirs(self, path):
        os.makedirs(strip_scheme(path), exist_ok=True)


# one store per memory://BUCKET, shared process-wide like the reference's
# memory backend (crates/storage/opendal/src/memory.rs)
_MEM_STORES: Dict[str, Dict[str, Tuple[bytes, int]]] = {}
_MEM_LOCK = threading.Lock()


class MemoryFileIO(FileIO):
    spark_native = False

    def __init__(self, bucket: str):
        self.bucket = bucket
        with _MEM_LOCK:
            self.store = _MEM_STORES.setdefault(bucket, {})

    @staticmethod
    def _key(path: str) -> str:
        u = urlparse(path)
        return u.path.lstrip("/")

    def read_bytes(self, path, offset=None, length=None):
        data, _ = self.store[self._key(path)]
        if offset is not None:
            end = offset + length if length is not None else None
            return data[offset:end]
        return data

    def write_bytes(self, path, data):
        with _MEM_LOCK:
            self.store[self._key(path)] = (bytes(data), time.time_ns())

    def create_exclusive(self, path, data):
        with _MEM_LOCK:
            k = self._key(path)
            if k in self.store:
                raise FileExistsError(path)
            self.store[k] = (bytes(data), time.time_ns())

    def rename(self, src, dst):
        with _MEM_LOCK:
            self.store[self._key(dst)] = self.store.pop(self._key(src))

    def exists(self, path):
        return self.is_file(path) or self.is_dir(path)

    def is_file(self, path):
        return self._key(path) in self.store

    def is_dir(self, path):
        k = self._key(path).rstrip("/") + "/"
        return any(x.startswith(k) for x in self.store)

    def size(self, path):
        return len(self.store[self._key(path)][0])

    def mtime_ns(self, path):
        return self.store[self._key(path)][1]

    def delete(self, path):
        with _MEM_LOCK:
            self.store.pop(self._key(path), None)

    def delete_prefix(self, prefix):
        k = self._key(prefix).rstrip("/") + "/"
        with _MEM_LOCK:
            for x in [x for x in self.store if x.startswith(k)]:
                del self.store[x]

    def list_dir(self, path):
        k = self._key(path).rstrip("/")
        k = k + "/" if k else ""
        names = set()
        for x in self.store:
            if x.startswith(k):
                names.add(x[len(k):].split("/", 1)[0])
        return sorted(names)

    def list_files(self, prefix):
        u = urlparse(prefix)
        base = f"{u.scheme}://{u.netloc}"
        k = self._key(prefix).rstrip("/") + "/"
        return sorted(f"{base}/{x}" for x in self.store if x.startswith(k))

    def makedirs(self, path):
        pass  # directories are implicit


class FsspecFileIO(FileIO):
    """Bridge to fsspec for object-store schemes (s3://, gs://, abfs://...).
    Import-gated: absent in this container, present on real deployments.
    spark_native=False: a scheme reached via fsspec has, by definition, no
    Hadoop connector configured in this session (else file_io_for callers
    would be using s3a://-style paths Spark reads itself)."""

    spark_native = False

    def __init__(self, scheme: str):
        import fsspec  # noqa: gated import — raises if unavailable
        self.fs = fsspec.filesystem(scheme)

    def read_bytes(self, path, offset=None, length=None):
        with self.fs.open(path, "rb") as fh:
            if offset is not None:
                fh.seek(offset)
                return fh.read(length) if length is not None else fh.read()
            return fh.read()

    def write_bytes(self, path, data):
        with self.fs.open(path, "wb") as fh:
            fh.write(data)

    def create_exclusive(self, path, data):
        # object stores: best effort (S3 would use If-None-Match: *)
        if self.fs.exists(path):
            raise FileExistsError(path)
        self.write_bytes(path, data)

    def rename(self, src, dst):
        self.fs.mv(src, dst)

    def exists(self, path):
        return self.fs.exists(path)

    def is_file(self, path):
        return self.fs.isfile(path)

    def is_dir(self, path):
        return self.fs.isdir(path)

    def size(self, path):
        return self.fs.size(path)

    def mtime_ns(self, path):
        try:
            return int(self.fs.modified(path).timestamp() * 1e9)
        except Exception:
            return 0

    def delete(self, path):
        self.fs.rm_file(path)

    def delete_prefix(self, prefix):
        self.fs.rm(prefix, recursive=True)

    def list_dir(self, path):
        return sorted(p.rstrip("/").rsplit("/", 1)[-1]
                      for p in self.fs.ls(path, detail=False))

    def list_files(self, prefix):
        return sorted(self.fs.find(prefix))

    def makedirs(self, path):
        self.fs.makedirs(path, exist_ok=True)


_LOCAL = LocalFileIO()

# scheme -> factory(path) -> FileIO. Pluggable backends, the counterpart of
# the reference's FileIOBuilder / storage resolver (io/file_io.rs:63,
# crates/storage/opendal/src/resolving.rs): deployments register their own
# s3/gcs/... implementations; tests register in-process shims.
_IO_REGISTRY: Dict[str, "callable"] = {}


def register_file_io(scheme: str, factory) -> None:
    """Register ``factory(path) -> FileIO`` for a URI scheme. Takes
    precedence over the fsspec fallback (but not the file/memory
    builtins). Registration is process-local: executor Python workers do
    NOT inherit it, which is why non-spark_native backends keep data-plane
    assembly on the driver."""
    _IO_REGISTRY[scheme] = factory


def unregister_file_io(scheme: str) -> None:
    _IO_REGISTRY.pop(scheme, None)


def file_io_for(path: str) -> FileIO:
    """Scheme-dispatched FileIO (io/file_io.rs:63 `FileIO::from_path`)."""
    scheme = urlparse(path).scheme if "://" in path else ""
    if scheme in ("", "file"):
        return _LOCAL
    if scheme == "memory":
        return MemoryFileIO(urlparse(path).netloc)
    if scheme in _IO_REGISTRY:
        return _IO_REGISTRY[scheme](path)
    try:
        return FsspecFileIO(scheme)
    except ImportError as exc:
        raise ValueError(
            f"no FileIO backend for scheme {scheme!r} (fsspec missing)") from exc


# ---------------------------------------------------------------- data plane
# FileIO-backed data plane for non-spark_native schemes: Spark itself reads
# and writes only local staging paths; bytes move through FileIO. The
# localize cache mirrors remote objects under a deterministic local tree so
# repeated scans of immutable Iceberg files hit disk, not the store.

IO_CACHE_ROOT = os.environ.get("SPARK_GRAFT_IO_CACHE",
                               "/tmp/iceberg_rust_spark_iocache")


def mirror_local_path(path: str) -> str:
    """s3://bucket/a/b -> <cache>/s3/bucket/a/b (scheme + netloc kept so
    the inverse mapping in mirror_remap_pattern is mechanical)."""
    u = urlparse(path)
    return os.path.join(IO_CACHE_ROOT, u.scheme, u.netloc,
                        u.path.lstrip("/"))


def mirror_remap_pattern() -> Tuple[str, str]:
    """(regex, replacement) turning a localized file's Spark metadata path
    (file:///<cache>/<scheme>/<netloc>/rest) back into the remote URI —
    keeps the `_file` metadata column truthful so positional-delete joins
    match the paths stored in manifests."""
    import re as _re
    pat = ("^file:/*" + _re.escape(IO_CACHE_ROOT.lstrip("/"))
           + "/([^/]+)/([^/]+)")
    return pat, "$1://$2"


IO_CACHE_CAP_BYTES = int(os.environ.get("SPARK_GRAFT_IO_CACHE_CAP",
                                        str(8 * 1024 ** 3)))

# every mirror path handed out this session: Spark scans are LAZY, so a
# DataFrame planned over localized files may execute long after a later
# localize batch — evicting anything a live plan might still reference
# would fail its action with FileNotFoundException. Unbounded only in
# paths (strings), not bytes; a session that legitimately cycles > cap
# bytes of DISTINCT files keeps them all pinned — crossing the cap then
# means the cap is undersized for the workload, not that deleting live
# inputs becomes OK. Cleared only by process exit (the cache root is
# /tmp-backed).
_SESSION_MIRROR_PATHS: set = set()
_TMP_STAGING_RE = None  # compiled lazily (avoid import-time re dependency)


def _evict_mirror_cache(protect: set) -> None:
    """LRU-evict the localize mirror down to IO_CACHE_CAP_BYTES (mtime is
    the recency signal — refreshed on every cache hit, so relatime mounts
    don't matter). Never evicts: ``protect`` (the batch just localized),
    any path handed out earlier THIS session (lazy Spark plans may still
    read them), or in-flight ``.tmp<pid>`` staging files of a concurrent
    localize (deleting one makes its os.replace raise). Keeps repeated
    scans against non-spark_native stores from growing driver temp disk
    without bound across sessions."""
    global _TMP_STAGING_RE
    if _TMP_STAGING_RE is None:
        import re as _re
        _TMP_STAGING_RE = _re.compile(r"\.tmp\d+$")
    entries = []
    total = 0
    for root, _dirs, names in os.walk(IO_CACHE_ROOT):
        for n in names:
            fp = os.path.join(root, n)
            try:
                st = os.stat(fp)
            except OSError:
                continue
            total += st.st_size
            entries.append((st.st_mtime, st.st_size, fp))
    if total <= IO_CACHE_CAP_BYTES:
        return
    for _mt, sz, fp in sorted(entries):
        if (fp in protect or fp in _SESSION_MIRROR_PATHS
                or _TMP_STAGING_RE.search(fp)):
            continue
        try:
            os.remove(fp)
        except OSError:
            continue
        total -= sz
        if total <= IO_CACHE_CAP_BYTES:
            break


def localize_paths(paths: List[str]) -> List[str]:
    """Download remote immutable objects into the local mirror (skipped
    when a same-size copy is already cached) and return the local paths.
    Driver-side by design — see FileIO.spark_native. The mirror is
    LRU-capped at SPARK_GRAFT_IO_CACHE_CAP bytes (default 8 GiB)."""
    out = []
    fetched = False
    for p in paths:
        io = file_io_for(p)
        lp = mirror_local_path(p)
        if not os.path.isfile(lp) or os.path.getsize(lp) != io.size(p):
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            tmp = lp + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(io.read_bytes(p))
            os.replace(tmp, lp)
            fetched = True
        else:
            # refresh recency so the LRU eviction below sees live files
            try:
                os.utime(lp, None)
            except OSError:
                pass
        out.append(lp)
    _SESSION_MIRROR_PATHS.update(out)
    if fetched:
        _evict_mirror_cache(protect=set(out))
    return out


def spark_native_path(path: str) -> bool:
    return file_io_for(path).spark_native
