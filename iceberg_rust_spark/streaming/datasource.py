"""Spark 4 Python DataSource: `spark.read/readStream.format("iceberg_rust")`.

The Spark-native integration surface the reference exposes through DataFusion
table providers (crates/integrations/datafusion/src/table/mod.rs) — here via
PySpark's DataSource API, so the engine's tables plug into ANY Spark reader
pipeline, including Structured Streaming with offset tracking/recovery.

- Batch read: plans files with the 4-level pruning pipeline (a pushed-down
  filter can be given as `option("where", "<sql predicate>")` — parsed by
  plans/sql_pred.py into metadata pruning; Spark still re-applies its own
  filters on top, the Inexact contract).
- Stream read: offsets are table sequence numbers; each micro-batch is the
  set of data files appended by snapshots in (start, end] — exactly
  incremental.py's snapshot-diff semantics, but driven by Spark's own
  checkpointing instead of a side file. Append-only feeds (appends +
  merge/overwrite inserts surface their added files; historical deletes are
  not replayed — use streaming/changes.py for full CDC).

Executor-side reads go through pyarrow in Arrow-batch form (never
row-at-a-time Python tuples).

Register once per session::

    from iceberg_rust_spark.streaming.datasource import register
    register(spark)
    df = (spark.readStream.format("iceberg_rust")
          .option("warehouse", "/wh").option("table", "db.events").load())
"""

from __future__ import annotations

import os
from typing import Iterator, List, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: List[str]):
        self.path = path
        self.columns = columns


def _read_arrow(partition: _FilePartition):
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(partition.path)
    cols = [c for c in partition.columns if c in pf.schema_arrow.names]
    for batch in pf.iter_batches(columns=cols or None):
        yield batch


def _load_table(options):
    from ..sources.catalog import FileSystemCatalog
    from ..sources.table import Table

    if options.get("metadata_path"):
        return Table.from_metadata_path(options["metadata_path"])
    return Table.load(FileSystemCatalog(options["warehouse"]),
                      options["table"])


class _IcebergBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.columns = list(schema.fieldNames())

    def partitions(self) -> Sequence[InputPartition]:
        from ..plans.sql_pred import sql_to_predicate

        t = _load_table(self.options)
        pred = None
        if self.options.get("where"):
            pred = sql_to_predicate(self.options["where"])
        snap_id = self.options.get("snapshot_id")
        plan = t.scan(row_filter=pred,
                      snapshot_id=int(snap_id) if snap_id else None
                      ).plan_files()
        return [_FilePartition(task.data_file.file_path, self.columns)
                for task in plan.tasks]

    def read(self, partition: _FilePartition):
        return _read_arrow(partition)


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.columns = list(schema.fieldNames())
        self._table = _load_table(options)

    def initialOffset(self) -> dict:
        start = self.options.get("starting_sequence")
        return {"seq": int(start) if start is not None else 0}

    def latestOffset(self) -> dict:
        self._table = self._table.refresh()
        return {"seq": self._table.metadata.last_sequence_number}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from ..sources.manifest import CONTENT_DATA, STATUS_ADDED
        from ..sources.scan import load_manifest, load_manifest_list

        md = self._table.metadata
        out: List[_FilePartition] = []
        for snap in sorted(md.snapshots, key=lambda s: s.sequence_number):
            if not start["seq"] < snap.sequence_number <= end["seq"]:
                continue
            for mf in load_manifest_list(snap.manifest_list):
                if mf.content != 0 or mf.added_snapshot_id != snap.snapshot_id:
                    continue
                for e in load_manifest(mf.manifest_path):
                    if (e.status == STATUS_ADDED
                            and e.data_file.content == CONTENT_DATA
                            and e.snapshot_id == snap.snapshot_id):
                        out.append(_FilePartition(e.data_file.file_path,
                                                  self.columns))
        return out

    def read(self, partition: _FilePartition):
        return _read_arrow(partition)

    def commit(self, end: dict) -> None:
        pass


class IcebergDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_rust"

    def schema(self):
        return _load_table(self.options).schema.to_spark()

    def reader(self, schema: StructType) -> DataSourceReader:
        return _IcebergBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _IcebergStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(IcebergDataSource)
