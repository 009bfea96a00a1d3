"""End-to-end s3:// FileIO round-trip.

The reference ships executor-native object-store backends
(crates/storage/opendal/src/s3.rs, resolved via resolving.rs from the
FileIO trait at crates/iceberg/src/io/file_io.rs:63). This repo's
counterpart is the pluggable FileIO registry (sources/io.py
register_file_io) plus the FileIO data plane for non-spark_native schemes:
staged writes published through write_bytes, scans localized through
read_bytes with the `_file` column remapped to manifest URIs.

No S3 endpoint exists in this container (no MinIO, no moto, no fsspec), so
the s3:// backend here is an in-process shim with OBJECT-STORE semantics —
flat keys under a bucket, conditional create (If-None-Match) as the CAS
primitive, copy+delete rename, prefix listing — backed by a local
directory. Everything above the FileIO interface (catalog commits,
manifests, data plane, delete paths, GC) runs exactly the code a real
s3 deployment would run.
"""

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.catalog import (CommitConflict,
                                                FileSystemCatalog)
from iceberg_rust_spark.sources.io import (FileIO, file_io_for,
                                           register_file_io,
                                           unregister_file_io)
from iceberg_rust_spark.sources.types import schema_from_spark


class S3ShimFileIO(FileIO):
    """s3:// with object-store semantics over a local backing directory.

    - keys are flat: directories are implicit (list/exists by prefix)
    - create_exclusive models a conditional PUT (If-None-Match: *)
    - rename is copy+delete (object stores have no atomic rename; the
      catalog's CAS safety comes from create_exclusive, not rename)
    """

    spark_native = False

    def __init__(self, root: str):
        self.root = root

    def _local(self, path: str) -> str:
        from urllib.parse import urlparse
        u = urlparse(path)
        return os.path.join(self.root, u.netloc, u.path.lstrip("/"))

    def _remote(self, local: str) -> str:
        rel = os.path.relpath(local, self.root)
        bucket, _, key = rel.partition(os.sep)
        return f"s3://{bucket}/{key.replace(os.sep, '/')}"

    def read_bytes(self, path, offset=None, length=None):
        with open(self._local(path), "rb") as fh:
            if offset is not None:
                fh.seek(offset)
                return fh.read(length) if length is not None else fh.read()
            return fh.read()

    def write_bytes(self, path, data):
        p = self._local(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + f".upload{os.getpid()}"
        with open(tmp, "wb") as fh:     # whole-object PUT: no partial reads
            fh.write(data)
        os.replace(tmp, p)

    def create_exclusive(self, path, data):
        p = self._local(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)

    def rename(self, src, dst):
        self.write_bytes(dst, self.read_bytes(src))
        self.delete(src)

    def exists(self, path):
        return self.is_file(path) or self.is_dir(path)

    def is_file(self, path):
        return os.path.isfile(self._local(path))

    def is_dir(self, path):
        return os.path.isdir(self._local(path))

    def size(self, path):
        return os.path.getsize(self._local(path))

    def mtime_ns(self, path):
        return os.stat(self._local(path)).st_mtime_ns

    def delete(self, path):
        try:
            os.remove(self._local(path))
        except FileNotFoundError:
            pass

    def delete_prefix(self, prefix):
        shutil.rmtree(self._local(prefix), ignore_errors=True)

    def list_dir(self, path):
        p = self._local(path)
        return sorted(os.listdir(p)) if os.path.isdir(p) else []

    def list_files(self, prefix):
        root = self._local(prefix)
        out = []
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                out.append(self._remote(os.path.join(dirpath, n)))
        return sorted(out)

    def makedirs(self, path):
        pass  # object stores have no directories


@pytest.fixture()
def s3(tmp_path):
    root = str(tmp_path / "s3store")
    register_file_io("s3", lambda path: S3ShimFileIO(root))
    yield root
    unregister_file_io("s3")


def test_scheme_resolves_through_registry(s3):
    io = file_io_for("s3://bkt/a/b")
    assert isinstance(io, S3ShimFileIO)
    assert io.spark_native is False
    io.write_bytes("s3://bkt/a/b.txt", b"x")
    assert io.list_files("s3://bkt/a") == ["s3://bkt/a/b.txt"]
    with pytest.raises(FileExistsError):
        io.create_exclusive("s3://bkt/a/b.txt", b"y")


def test_s3_table_lifecycle_end_to_end(spark, s3):
    """create -> append -> filtered scan -> MOR delete -> DV delete ->
    eq delete -> time travel -> expire + orphan GC, all on s3:// URIs."""
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    t = Table.create(cat, "db.t", schema_from_spark(df.schema))
    assert t.location.startswith("s3://")

    # append through the FileIO data plane (staged write + publish)
    t = t.append(spark, df)
    snap1 = t.metadata.current_snapshot().snapshot_id
    assert t.to_df(spark).count() == 1000
    for f in t.scan().plan_files().tasks:
        assert f.data_file.file_path.startswith("s3://")

    # filtered scan: values must equal the predicate applied to the input
    got = sorted(r["k"] for r in
                 t.scan(row_filter=E.col("k") < 10).to_df(spark).collect())
    assert got == list(range(10))

    # MOR positional delete: pos-delete parquet on s3://, anti-join read
    t = t.delete_where(spark, E.col("v") == 0, mode="mor")
    assert t.to_df(spark).count() == 800
    assert t.to_df(spark).where(F.col("v") == 0).count() == 0

    # deletion-vector delete (puffin written via FileIO, driver assembly)
    t = t.delete_where(spark, E.col("v") == 1, mode="dv")
    assert t.to_df(spark).count() == 600

    # equality delete
    keys = spark.createDataFrame([(2,)], "v long")
    t = t.delete_by_equality(spark, keys, ["v"])
    assert t.to_df(spark).count() == 400

    # _file metadata column reports the MANIFEST path, not the local mirror
    files_seen = {r["_file"] for r in
                  t.scan(include_metadata_columns=True).to_df(spark)
                  .select("_file").distinct().collect()}
    assert files_seen and all(p.startswith("s3://") for p in files_seen)

    # time travel back to the first append
    assert t.scan(snapshot_id=snap1).to_df(spark).count() == 1000

    # expire + orphan listing walk the store through FileIO
    t = t.expire_snapshots(older_than_ms=None, retain_last=1)
    removed = t.remove_orphan_files(older_than_ms=2**62, dry_run=True)
    assert isinstance(removed, list)
    assert t.to_df(spark).count() == 400

    # CAS: a stale commit loses the conditional-PUT race
    with pytest.raises(CommitConflict):
        cat.commit_table("db.t", 1, t.metadata)


def test_s3_cow_delete_and_compaction(spark, s3):
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    t = Table.create(cat, "db.c", schema_from_spark(df.schema))
    for lo in (0, 100, 200, 300, 400):   # 5 small appends -> 5+ files
        t = t.append(spark, df.where((F.col("k") >= lo)
                                     & (F.col("k") < lo + 100)))
    t = t.delete_where(spark, E.col("v") == 3, mode="cow")
    assert t.to_df(spark).count() == 375
    t = t.compact(spark)
    assert t.to_df(spark).count() == 375
    assert sorted(r["k"] for r in
                  t.to_df(spark).where(F.col("k") < 8).collect()) == \
        [0, 1, 2, 4, 5, 6]


def test_s3_changes_df_with_mor_and_eq_deletes(spark, s3):
    """CDC over a non-spark_native store: the delete-side reads
    (pos-delete parquet pairs, referenced-target listing, eq-delete keys)
    must route through the FileIO data plane like data reads do.
    Regression: they called spark.read.parquet on s3:// URIs directly and
    threw 'No FileSystem for scheme'."""
    from iceberg_rust_spark.streaming.changes import changes_df
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    t = Table.create(cat, "db.cdc", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("v") == 1, mode="mor")
    keys = spark.createDataFrame([(2,)], "v long")
    t = t.delete_by_equality(spark, keys, ["v"])

    ch = changes_df(spark, t)
    counts = {(r["_change_type"], r["_change_ordinal"]): r["n"]
              for r in ch.groupBy("_change_type", "_change_ordinal")
              .agg(F.count("*").alias("n")).collect()}
    assert counts == {("insert", 0): 100,
                      ("delete", 1): 25,   # MOR pos-delete: v==1
                      ("delete", 2): 25}   # eq delete: v==2


def test_s3_staging_dirs_cleaned_up(spark, s3):
    """Staged FileIO writes must remove their driver temp dirs after
    publish — repeated appends leaked tempdir disk before r8."""
    import glob
    import tempfile
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = Table.create(cat, "db.s", schema_from_spark(df.schema))
    pattern = os.path.join(tempfile.gettempdir(), "iceberg_stage_*")
    before = set(glob.glob(pattern))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("k") < 25, mode="mor")
    assert t.to_df(spark).count() == 25
    assert set(glob.glob(pattern)) == before


def _make_exec_shim_class():
    """Executor-readable s3 shim, defined FUNCTION-LOCAL on purpose:
    cloudpickle serializes function-scope classes BY VALUE, so executor
    Python workers (which cannot import the tests package) still
    reconstruct it — exactly the deployment contract executor_reads
    documents: the FileIO instance must survive pickling into tasks.
    Every data-file read_bytes drops a pid marker in the backing store so
    the test can PROVE which process fetched the payload."""
    from iceberg_rust_spark.sources.io import FileIO

    class ExecS3ShimFileIO(FileIO):
        spark_native = False
        executor_reads = True

        def __init__(self, root):
            self.root = root

        def _local(self, path):
            from urllib.parse import urlparse
            u = urlparse(path)
            return os.path.join(self.root, u.netloc, u.path.lstrip("/"))

        def read_bytes(self, path, offset=None, length=None):
            if path.endswith(".parquet") and "/data/" in path:
                mark = os.path.join(self.root, ".access")
                os.makedirs(mark, exist_ok=True)
                open(os.path.join(mark, str(os.getpid())), "w").close()
            with open(self._local(path), "rb") as fh:
                if offset is not None:
                    fh.seek(offset)
                    return fh.read(length) if length is not None \
                        else fh.read()
                return fh.read()

        def write_bytes(self, path, data):
            p = self._local(path)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + f".upload{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, p)

        def create_exclusive(self, path, data):
            p = self._local(path)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)

        def rename(self, src, dst):
            self.write_bytes(dst, self.read_bytes(src))
            self.delete(src)

        def exists(self, path):
            return self.is_file(path) or self.is_dir(path)

        def is_file(self, path):
            return os.path.isfile(self._local(path))

        def is_dir(self, path):
            return os.path.isdir(self._local(path))

        def size(self, path):
            return os.path.getsize(self._local(path))

        def mtime_ns(self, path):
            return os.stat(self._local(path)).st_mtime_ns

        def delete(self, path):
            try:
                os.remove(self._local(path))
            except FileNotFoundError:
                pass

        def delete_prefix(self, prefix):
            shutil.rmtree(self._local(prefix), ignore_errors=True)

        def list_dir(self, path):
            p = self._local(path)
            return sorted(os.listdir(p)) if os.path.isdir(p) else []

        def list_files(self, prefix):
            base = self._local(prefix)
            out = []
            for dirpath, _dirs, fnames in os.walk(base):
                for n in fnames:
                    rel = os.path.relpath(os.path.join(dirpath, n),
                                          self.root)
                    bucket, _, key = rel.partition(os.sep)
                    out.append(f"s3://{bucket}/{key.replace(os.sep, '/')}")
            return sorted(out)

        def makedirs(self, path):
            pass

    return ExecS3ShimFileIO


@pytest.fixture()
def s3exec(tmp_path):
    root = str(tmp_path / "s3exec")
    cls = _make_exec_shim_class()
    register_file_io("s3", lambda path: cls(root))
    yield root
    unregister_file_io("s3")


def test_executor_side_fileio_reads(spark, s3exec):
    """End-to-end executor-side data plane for a registered FileIO scheme:
    create -> append -> scan (rows fetched by EXECUTOR workers through the
    pickled FileIO, proven by pid markers) -> filtered scan -> MOR delete
    applied through the executor-provided _file/_pos columns."""
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    t = Table.create(cat, "db.x", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("k") < 200))
    t = t.append(spark, df.where(F.col("k") >= 200))

    got = t.to_df(spark)
    # the scan plan must be the mapInPandas data plane, not a parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert sorted(r["k"] for r in got.collect()) == list(range(400))

    # payload bytes were fetched by worker processes, not the driver
    pids = {int(p) for p in os.listdir(os.path.join(s3exec, ".access"))}
    assert pids and os.getpid() not in pids

    # filtered scan through the same plane
    assert t.scan(row_filter=E.col("k") < 10).to_df(spark).count() == 10

    # MOR pos-delete: the anti-join keys on the executor-provided
    # _file/_pos, which must carry manifest URIs (not local paths)
    t = t.delete_where(spark, E.col("v") == 0, mode="mor")
    assert t.to_df(spark).count() == 300
    assert t.to_df(spark).where(F.col("v") == 0).count() == 0


def test_executor_side_reads_schema_evolution(spark, s3exec):
    """Old files read through the executor FileIO plane must pad columns
    added later with NULLs (schema-on-read parity with the native path),
    and new files written after the evolution read their real values."""
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    df = spark.range(0, 20).select(F.col("id").alias("k"))
    t = Table.create(cat, "db.ev", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.update_schema().add_column("w", "long").commit()
    t = t.append(spark, spark.range(20, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")))
    rows = {r["k"]: r["w"] for r in t.to_df(spark).collect()}
    assert len(rows) == 30
    assert all(rows[k] is None for k in range(20))
    assert all(rows[k] == k * 10 for k in range(20, 30))


def _write_foreign_parquet(fileio, uri, n_rows=300, row_group_size=None):
    """A parquet object written by a NON-Iceberg tool (no field ids):
    long k, string s, long w — uploaded into the shim store."""
    import io as _io

    import pyarrow as pa
    import pyarrow.parquet as pq
    tab = pa.table({
        "k": pa.array(range(n_rows), pa.int64()),
        "s": pa.array([f"doc-{i:05d}" for i in range(n_rows)], pa.string()),
        "w": pa.array([i * 7 for i in range(n_rows)], pa.int64()),
    })
    buf = _io.BytesIO()
    pq.write_table(tab, buf, row_group_size=row_group_size or n_rows)
    fileio.write_bytes(uri, buf.getvalue())
    return len(buf.getvalue())


def test_add_files_executor_reads(spark, s3exec):
    """add_files x executor_reads: a foreign id-less parquet behind the
    FileIO-only store is registered without rewriting, footer-scanned via
    range reads, and read back through the executor data plane with REAL
    types — the string column must round-trip (schema inference from a
    0-row pandas frame used to null it out), and filters must still work
    (footer bounds were collected through the FileIO)."""
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    io_impl = file_io_for(wh)
    foreign = f"s3://bucket-{uuid.uuid4().hex[:8]}/landing/part-000.parquet"
    _write_foreign_parquet(io_impl, foreign, n_rows=300)

    df = spark.createDataFrame([], "k long, s string, w long")
    t = Table.create(cat, "db.addf", schema_from_spark(df.schema))
    t = t.add_files(spark, [foreign])
    # manifest path must keep the URI verbatim (abspath would mangle it)
    assert {x.data_file.file_path
            for x in t.scan().plan_files().tasks} == {foreign}

    got = t.to_df(spark)
    assert "MapInPandas" in \
        got._jdf.queryExecution().executedPlan().toString()
    rows = {r["k"]: (r["s"], r["w"]) for r in got.collect()}
    assert len(rows) == 300
    assert rows[42] == ("doc-00042", 42 * 7)
    assert t.scan(row_filter=E.col("k") < 10).to_df(spark).count() == 10


def test_byte_range_splits_oversized_file(spark, s3exec):
    """Row-group splitting of oversized FileIO-read files: a multi-row-group
    object larger than max_split_bytes is read in >1 split via range reads,
    with rows and _pos identical to the whole-object read."""
    from iceberg_rust_spark.sources.executor_io import (FileIORandomFile,
                                                        _plan_splits,
                                                        fileio_parquet_df)
    io_impl = file_io_for("s3://x/y")
    uri = f"s3://bucket-{uuid.uuid4().hex[:8]}/big/huge.parquet"
    size = _write_foreign_parquet(io_impl, uri, n_rows=5000,
                                  row_group_size=500)

    # split planner: row-group-aligned runs, cumulative row0 offsets
    splits = _plan_splits([uri], io_impl, {uri: size}, max_split=size // 4)
    assert len(splits) > 1
    assert splits[0][1] == 0 and splits[0][3] == 0
    assert sum(s[2] for s in splits) == 10          # all 10 row groups
    for prev, cur in zip(splits, splits[1:]):
        assert cur[1] == prev[1] + prev[2]          # contiguous rg runs
        assert cur[3] > prev[3]                     # increasing row offsets

    # range reads through the seekable file object match the whole object
    import pyarrow.parquet as pq
    f = FileIORandomFile(io_impl, uri)
    assert f.size() == size
    assert pq.ParquetFile(f).metadata.num_row_groups == 10

    got = fileio_parquet_df(spark, [uri], None, io_impl, with_meta=True,
                            file_sizes={uri: size},
                            max_split_bytes=size // 4)
    rows = got.collect()
    assert len(rows) == 5000
    assert sorted(r["_pos"] for r in rows) == list(range(5000))
    by_pos = {r["_pos"]: r for r in rows}
    assert by_pos[4321]["k"] == 4321 and by_pos[4321]["s"] == "doc-04321"


def test_oversized_add_files_reads_in_multiple_tasks(spark, s3exec):
    """End-to-end: an oversized foreign file registered via add_files is
    read in >1 task when spark.sql.files.maxPartitionBytes is below the
    file size — task memory stays bounded by the split, not the object."""
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    io_impl = file_io_for(wh)
    uri = f"s3://bucket-{uuid.uuid4().hex[:8]}/landing/huge.parquet"
    size = _write_foreign_parquet(io_impl, uri, n_rows=4000,
                                  row_group_size=400)

    df = spark.createDataFrame([], "k long, s string, w long")
    t = Table.create(cat, "db.huge", schema_from_spark(df.schema))
    t = t.add_files(spark, [uri])
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(max(1024, size // 5)))
        got = t.to_df(spark)
        assert got.rdd.getNumPartitions() > 1
        assert got.count() == 4000
        assert got.where(F.col("k") == 3999).collect()[0]["s"] == "doc-03999"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_s3_mor_delete_with_special_char_partition_paths(spark, s3):
    """Special-character partition values put spaces into OBJECT KEYS; the
    localized mirror file inherits them, Spark's _metadata.file_path
    URI-encodes them (%20), and the remapped `_file` must still equal the
    manifest URI raw spelling — the decode gate sees the mirror paths and
    applies the url_decode before the remap."""
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.metadata import (PartitionField,
                                                     PartitionSpec)
    wh = f"s3://bucket-{uuid.uuid4().hex[:8]}/warehouse"
    cat = FileSystemCatalog(wh)
    rows = [(1, "NOT SPECIFIED", 1.0), (2, "A+B", 2.0),
            (3, "NOT SPECIFIED", 3.0), (4, "plain", 4.0)]
    df = spark.createDataFrame(rows, "id long, cat string, val double")
    schema = schema_from_spark(df.schema)
    fid = schema.field_by_name("cat").field_id
    spec = PartitionSpec(0, [PartitionField(fid, 1000, "cat",
                                            parse_transform("identity"))])
    t = Table.create(cat, "db.spaced", schema, partition_spec=spec)
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("id").isin([1, 2]), mode="mor")
    assert sorted(r["id"] for r in t.to_df(spark).collect()) == [3, 4]
    # and a second delete re-validates targets against manifests
    t = t.delete_where(spark, E.col("id") == 3, mode="mor")
    assert sorted(r["id"] for r in t.to_df(spark).collect()) == [4]


def test_pruned_read_sentinel_never_collides_with_projection(spark, s3exec):
    """ADVICE r9 regression: when NO projected column is file-backed, the
    executor read synthesizes a row-count sentinel table. Its column name
    must not collide with a projected name, or project() casts the int8
    null sentinel to the target type (crashing for array/struct targets)
    instead of null-padding."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from iceberg_rust_spark.sources.executor_io import fileio_parquet_df

    path = f"s3://bkt-{uuid.uuid4().hex[:8]}/data/f0.parquet"
    import io as _bio
    buf = _bio.BytesIO()
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], type=pa.int64())}),
                   buf)
    file_io_for(path).write_bytes(path, buf.getvalue())

    # projection names the old sentinel ("_rows") AND its first fallback
    # ("_rows_"), both absent from the file, one with a non-castable type
    schema = T.StructType([
        T.StructField("_rows", T.ArrayType(T.IntegerType())),
        T.StructField("_rows_", T.StringType())])
    got = fileio_parquet_df(spark, [path], schema,
                            file_io_for(path)).collect()
    assert len(got) == 3
    assert all(r["_rows"] is None and r["_rows_"] is None for r in got)
