"""Executor-side FileIO data plane: read parquet data files through a
pluggable FileIO on the CLUSTER, not the driver.

The reference streams data-file bytes through its FileIO trait on worker
threads (crates/iceberg/src/io/file_io.rs:63 with the opendal backends in
crates/storage/opendal); the Spark twin here ships a PICKLED FileIO
instance into a mapInPandas closure — each task GETs object bytes via
``read_bytes`` and decodes them with pyarrow, so payload bytes never touch
the driver. This is the plumbing an s3a://-less deployment would use:
production clusters normally configure the Hadoop connector and take the
spark_native path, but a custom store (an internal blob service, a
fixture shim) only needs a picklable FileIO with ``executor_reads=True``.

Scaling shape: one input row per SPLIT. Files our own writer rolls stay
whole-object (write.py bounds them at write.target-file-size-bytes), but
add_files-imported foreign parquet can be arbitrarily large — those are
split on ROW-GROUP boundaries (the reference's FileScanTask start/length,
scan/task.rs:55-118, consumed by the arrow reader's row-group selection in
arrow/reader/pipeline.rs:389-397): one driver-side footer read per
oversized file assigns contiguous row-group runs of ~max_split_bytes, and
each task range-GETs only its run's column chunks through a seekable
FileIO file object. Task memory is bounded by max_split_bytes, not by the
largest registered file; decode stays Arrow-batched.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class FileIORandomFile:
    """Read-only seekable file-like over FileIO range reads, for handing a
    remote object to ``pyarrow.parquet.ParquetFile``: pyarrow then reads
    the footer and exactly the column chunks a ``read_row_groups`` call
    needs as byte-range GETs, never the whole object. Unbuffered by design
    — pyarrow already coalesces its reads into few large ranges."""

    def __init__(self, fileio, path: str, size: Optional[int] = None):
        self._io = fileio
        self._path = path
        self._size = fileio.size(path) if size is None else size
        self._pos = 0
        self.closed = False

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = max(0, min(n, self._size - self._pos))
        if n == 0:
            return b""
        data = self._io.read_bytes(self._path, offset=self._pos, length=n)
        self._pos += len(data)
        return data

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _max_split_bytes(spark: SparkSession) -> int:
    """Split granularity: spark.sql.files.maxPartitionBytes (the same knob
    that bounds the native reader's splits), default 128 MiB."""
    try:
        s = str(spark.conf.get("spark.sql.files.maxPartitionBytes")).lower()
        if s.endswith("b"):
            s = s[:-1]                  # "128mb" / "134217728b" -> "128m"
        mul = {"k": 1024, "m": 1024 ** 2, "g": 1024 ** 3}.get(s[-1:], 1)
        if mul != 1:
            s = s[:-1]
        return max(1, int(float(s) * mul))
    except Exception:
        return 128 * 1024 * 1024


def _plan_splits(files: List[str], fileio,
                 file_sizes: Optional[Dict[str, int]],
                 max_split: int) -> List[tuple]:
    """(path, rg_lo, rg_n, row0) split rows. rg_lo == -1 means whole
    object (the common case: our writer rolls files under the target
    size). Only files with a KNOWN size above ``max_split`` pay a footer
    read — one driver-side metadata GET each, O(oversized files), which
    for Iceberg-written tables is zero."""
    import pyarrow.parquet as pq

    oversized = [p for p in files
                 if (file_sizes or {}).get(p) is not None
                 and file_sizes[p] > max_split]
    metas: Dict[str, object] = {}
    if oversized:
        # footer reads are remote range-GETs — thread them so planning
        # latency is one round-trip, not one per oversized file
        def _footer(p):
            with pq.ParquetFile(
                    FileIORandomFile(fileio, p, file_sizes[p])) as pf:
                return p, pf.metadata
        if len(oversized) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(16, len(oversized))) as ex:
                metas = dict(ex.map(_footer, oversized))
        else:
            metas = dict([_footer(oversized[0])])

    splits: List[tuple] = []
    for path in files:
        meta = metas.get(path)
        if meta is None:
            splits.append((path, -1, 0, 0))
            continue
        n_rg = meta.num_row_groups
        if n_rg <= 1:
            splits.append((path, -1, 0, 0))
            continue
        lo, acc, row0, rows_in_run = 0, 0, 0, 0
        for i in range(n_rg):
            rg = meta.row_group(i)
            if acc and acc + rg.total_byte_size > max_split:
                splits.append((path, lo, i - lo, row0))
                row0 += rows_in_run
                lo, acc, rows_in_run = i, 0, 0
            acc += rg.total_byte_size
            rows_in_run += rg.num_rows
        splits.append((path, lo, n_rg - lo, row0))
    return splits


def fileio_parquet_df(spark: SparkSession, files: List[str],
                      read_schema: Optional[T.StructType],
                      fileio, with_meta: bool = False,
                      file_sizes: Optional[Dict[str, int]] = None,
                      max_split_bytes: Optional[int] = None) -> DataFrame:
    """Read ``files`` (parquet object URIs) through ``fileio`` on the
    executors, projected/padded to ``read_schema`` (None infers the first
    file's physical schema driver-side — one footer GET). With
    ``with_meta`` the result carries ``_file`` (the manifest URI, exactly
    as passed) and ``_pos`` (row index within the file) — the columns the
    MOR delete joins and row-lineage inheritance key on. ``file_sizes``
    (manifest-known, no IO) enables row-group splitting of files larger
    than ``max_split_bytes`` (default spark.sql.files.maxPartitionBytes)."""
    import io as _io

    import pyarrow.parquet as pq

    if read_schema is None:
        # infer: physical arrow schema of the first object (footer only),
        # mapped through Spark's arrow type conversion. NOT via an empty
        # pandas round-trip: 0-row object-dtype columns infer as NullType
        # (or raise outright without arrow conversion), silently nulling
        # string/binary columns of id-less add_files tables.
        from pyspark.sql.pandas.types import from_arrow_schema
        read_schema = from_arrow_schema(
            pq.read_schema(FileIORandomFile(fileio, files[0])))

    out_schema = T.StructType(list(read_schema.fields))
    if with_meta:
        out_schema = out_schema.add(T.StructField("_file", T.StringType())) \
                               .add(T.StructField("_pos", T.LongType()))

    from pyspark.sql.pandas.types import to_arrow_schema
    target = to_arrow_schema(T.StructType(list(read_schema.fields)))
    col_names = [f.name for f in read_schema.fields]

    if max_split_bytes is None:
        max_split_bytes = _max_split_bytes(spark)
    splits = _plan_splits(files, fileio, file_sizes, max_split_bytes)

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        def project(tab, path, row0):
            arrays = []
            for field in target:
                if field.name in tab.column_names:
                    col = tab.column(field.name)
                    if col.type != field.type:
                        col = col.cast(field.type)
                    arrays.append(col)
                else:
                    # schema-on-read: absent column -> nulls (the
                    # spark.read.schema(...) behavior on the native path)
                    arrays.append(pa.nulls(len(tab), type=field.type))
            out = pa.table(arrays, schema=target).to_pandas()
            out.columns = col_names
            if with_meta:
                out["_file"] = path
                out["_pos"] = row0 + np.arange(len(out), dtype="int64")
            return out

        want = set(col_names)

        def pruned_read(pf, rgs):
            # COLUMN PRUNING at the FileIO read: only the projected
            # columns' chunks are decoded — and for range reads, only
            # their byte ranges are fetched (a 2-of-20-column projection
            # over a wide foreign table stops paying for the other 18).
            # Absent columns null-pad in project(); a projection with NO
            # file-backed columns still needs the row count, so read a
            # zero-column selection via the metadata row count.
            cols = [n for n in pf.schema_arrow.names if n in want]
            if not cols:
                n_rows = sum(pf.metadata.row_group(i).num_rows
                             for i in rgs) if rgs is not None \
                    else pf.metadata.num_rows
                # sentinel name must not collide with any projected
                # column, or project() would cast the int8 nulls instead
                # of null-padding the target type
                sentinel = "_rows"
                while sentinel in want:
                    sentinel += "_"
                return pa.table(
                    {sentinel: pa.nulls(n_rows, type=pa.int8())})
            if rgs is None:
                return pf.read(columns=cols)
            return pf.read_row_groups(rgs, columns=cols)

        # FileIOs backed by a real filesystem expose local_path: pyarrow
        # then opens the file directly and reads ONLY the projected column
        # chunks from disk — read_bytes would fetch the whole object into
        # memory before the pruned decode (matters for wide tables on the
        # many-small-files route)
        local_path = getattr(fileio, "local_path", None)

        for pdf in batches:
            for path, rg_lo, rg_n, row0 in zip(pdf["path"], pdf["rg_lo"],
                                               pdf["rg_n"], pdf["row0"]):
                if local_path is not None:
                    # context-managed: this route is the 10k+-small-files
                    # path, and relying on refcount rebinding leaks the
                    # OS handle on exception paths (ADVICE r12)
                    with pq.ParquetFile(local_path(path)) as pf:
                        tab = pruned_read(
                            pf, None if rg_lo < 0 else
                            list(range(int(rg_lo), int(rg_lo) + int(rg_n))))
                elif rg_lo < 0:
                    # whole object: one GET, decode (pruned) from memory
                    with pq.ParquetFile(
                            _io.BytesIO(fileio.read_bytes(path))) as pf:
                        tab = pruned_read(pf, None)
                else:
                    # row-group run of an oversized file: range-GETs for
                    # exactly this run's projected column chunks
                    with pq.ParquetFile(FileIORandomFile(fileio, path)) as pf:
                        tab = pruned_read(
                            pf, list(range(int(rg_lo),
                                           int(rg_lo) + int(rg_n))))
                yield project(tab, path, int(row0))

    paths_df = spark.createDataFrame(
        splits, "path string, rg_lo int, rg_n int, row0 long")
    # one task per split up to the session's parallelism: object GETs are
    # the latency axis, so spread splits across executors
    n = min(len(splits), spark.sparkContext.defaultParallelism)
    return paths_df.repartition(max(n, 1)).mapInPandas(gen, out_schema)
