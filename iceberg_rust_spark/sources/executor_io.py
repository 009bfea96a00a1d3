"""Executor-side FileIO data plane: read parquet data files through a
pluggable FileIO on the CLUSTER, not the driver.

The reference streams data-file bytes through its FileIO trait on worker
threads (crates/iceberg/src/io/file_io.rs:63 with the opendal backends in
crates/storage/opendal); the Spark twin here ships a PICKLED FileIO
instance into a mapInPandas closure — each task GETs whole objects via
``read_bytes`` and decodes them with pyarrow, so payload bytes never touch
the driver. This is the plumbing an s3a://-less deployment would use:
production clusters normally configure the Hadoop connector and take the
spark_native path, but a custom store (an internal blob service, a
fixture shim) only needs a picklable FileIO with ``executor_reads=True``.

Scaling shape: one input row per data file, repartitioned so each task
fetches a bounded number of objects; decode is Arrow-batched. Whole-object
GETs bound task memory by the table's target file size (write.py rolls
files at write.target-file-size-bytes). Range-split reads of single huge
files are future work — Iceberg's own writers never produce them.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def fileio_parquet_df(spark: SparkSession, files: List[str],
                      read_schema: Optional[T.StructType],
                      fileio, with_meta: bool = False) -> DataFrame:
    """Read ``files`` (parquet object URIs) through ``fileio`` on the
    executors, projected/padded to ``read_schema`` (None infers the first
    file's physical schema driver-side — one metadata GET). With
    ``with_meta`` the result carries ``_file`` (the manifest URI, exactly
    as passed) and ``_pos`` (row index within the file) — the columns the
    MOR delete joins and row-lineage inheritance key on."""
    import io as _io

    import pyarrow.parquet as pq

    if read_schema is None:
        # infer: physical arrow schema of the first object, mapped through
        # Spark's arrow conversion so worker output stays consistent
        buf = _io.BytesIO(fileio.read_bytes(files[0]))
        empty = pq.read_table(buf).slice(0, 0)
        read_schema = spark.createDataFrame(empty.to_pandas()).schema

    out_schema = T.StructType(list(read_schema.fields))
    if with_meta:
        out_schema = out_schema.add(T.StructField("_file", T.StringType())) \
                               .add(T.StructField("_pos", T.LongType()))

    from pyspark.sql.pandas.types import to_arrow_schema
    target = to_arrow_schema(T.StructType(list(read_schema.fields)))
    col_names = [f.name for f in read_schema.fields]

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            for path in pdf["path"]:
                data = fileio.read_bytes(path)
                tab = pq.read_table(_io.BytesIO(data))
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
                    out["_pos"] = np.arange(len(out), dtype="int64")
                yield out

    paths_df = spark.createDataFrame([(p,) for p in files], "path string")
    # one task per file up to the session's parallelism: object GETs are
    # the latency axis, so spread files across executors
    n = min(len(files), spark.sparkContext.defaultParallelism)
    return paths_df.repartition(max(n, 1)).mapInPandas(gen, out_schema)
