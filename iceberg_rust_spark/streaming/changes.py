"""CDC changelog scan: row-level changes between snapshots.

The reference RESERVES the change-tracking columns `_change_type`,
`_change_ordinal`, `_commit_snapshot_id` (metadata_columns.rs:54-60) but
implements no CDC scan; this module does, from the same snapshot/manifest
machinery:

- append snapshot      -> added files' rows as ``insert``
- MOR delete snapshot  -> deleted rows reconstructed from the new positional
  / deletion-vector / equality delete files as ``delete``
- COW delete/overwrite -> removed files' rows as ``delete`` plus added
  files' rows as ``insert`` (file-granularity changelog; the net effect is
  exact, matching what Iceberg's Spark changelog procedure emits for
  overwrites)

Each emitted row carries (_change_type, _change_ordinal,
_commit_snapshot_id). Work is per-snapshot file-set diffs — metadata on the
driver, reads on the cluster.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.scan import load_manifest_list
from ..sources.manifest import (CONTENT_DATA, CONTENT_EQUALITY_DELETES,
                                CONTENT_POSITION_DELETES, DataFile)
from ..sources.scan import load_manifest
from ..sources.scan import load_manifest_list
from ..sources.manifest import read_manifest_list
from ..sources.table import Table

INSERT = "insert"
DELETE = "delete"


def _file_sets(table: Table, snapshot_id: Optional[int]):
    """(data files by path, delete files by path) at a snapshot."""
    data: Dict[str, DataFile] = {}
    dels: Dict[str, DataFile] = {}
    if snapshot_id is None:
        return data, dels
    snap = table.metadata.snapshot_by_id(snapshot_id)
    if snap is None:
        return data, dels
    for mf in load_manifest_list(snap.manifest_list):
        for e in load_manifest(mf.manifest_path):
            f = e.data_file
            if f.content == CONTENT_DATA:
                data[f.file_path] = f
            else:
                # DVs share one puffin path across blobs: key by (path, ref)
                dels[f"{f.file_path}#{f.referenced_data_file or ''}"] = f
    return data, dels


def changes_df(spark: SparkSession, table: Table,
               from_snapshot_id: Optional[int] = None,
               to_snapshot_id: Optional[int] = None) -> DataFrame:
    """Changelog rows for every snapshot in (from, to]; from=None starts at
    the table's first snapshot (its rows emit as inserts)."""
    md = table.metadata
    schema = md.schema()
    spark_schema = schema.to_spark()
    names = [f.name for f in schema.fields]

    snaps = sorted(md.snapshots, key=lambda s: s.sequence_number)
    if from_snapshot_id is not None:
        from_seq = md.snapshot_by_id(from_snapshot_id).sequence_number
        snaps = [s for s in snaps if s.sequence_number > from_seq]
    if to_snapshot_id is not None:
        to_seq = md.snapshot_by_id(to_snapshot_id).sequence_number
        snaps = [s for s in snaps if s.sequence_number <= to_seq]

    def read_files(paths: List[str], with_meta: bool = False) -> DataFrame:
        df = spark.read.schema(spark_schema).parquet(*paths)
        if with_meta:
            df = df.withColumn("_cf", F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/*", "/")) \
                .withColumn("_cp", F.col("_metadata.row_index"))
        return df

    def stamp(df: DataFrame, change: str, ordinal: int, snap_id: int) -> DataFrame:
        return df.select(*names) \
            .withColumn("_change_type", F.lit(change)) \
            .withColumn("_change_ordinal", F.lit(ordinal)) \
            .withColumn("_commit_snapshot_id", F.lit(snap_id))

    parts: List[DataFrame] = []
    for ordinal, snap in enumerate(snaps):
        parent = snap.parent_snapshot_id
        data_now, dels_now = _file_sets(table, snap.snapshot_id)
        data_prev, dels_prev = _file_sets(table, parent)

        added = [p for p in data_now if p not in data_prev]
        removed = [p for p in data_prev if p not in data_now]
        new_dels = [d for k, d in dels_now.items() if k not in dels_prev]

        if added:
            parts.append(stamp(read_files(added), INSERT, ordinal,
                               snap.snapshot_id))
        if removed:
            parts.append(stamp(read_files(removed), DELETE, ordinal,
                               snap.snapshot_id))
        if new_dels:
            pos_like = [d for d in new_dels
                        if d.content == CONTENT_POSITION_DELETES]
            eq = [d for d in new_dels if d.content == CONTENT_EQUALITY_DELETES]
            if pos_like:
                pairs = _pos_delete_pairs(spark, pos_like)
                targets = sorted({r for r, _ in pairs} & set(data_prev))
                if targets:
                    pair_df = spark.createDataFrame(
                        list(pairs), "_cf string, _cp long")
                    hit = read_files(targets, with_meta=True) \
                        .join(F.broadcast(pair_df), ["_cf", "_cp"], "left_semi")
                    parts.append(stamp(hit, DELETE, ordinal, snap.snapshot_id))
            if eq:
                prev_paths = sorted(data_prev)
                if prev_paths:
                    state = read_files(prev_paths)
                    for d in eq:
                        cols = [schema.field_by_id(i).name
                                for i in d.equality_ids
                                if schema.field_by_id(i) is not None]
                        keys = spark.read.parquet(d.file_path) \
                            .select(*cols).dropDuplicates()
                        hit = state.join(F.broadcast(keys), cols, "left_semi")
                        parts.append(stamp(hit, DELETE, ordinal,
                                           snap.snapshot_id))

    if not parts:
        empty = spark.createDataFrame([], spark_schema)
        return stamp(empty, INSERT, 0, 0).where(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pos_delete_pairs(spark: SparkSession,
                      pos_like: List[DataFile]) -> Set[tuple]:
    """(referenced file, position) pairs from parquet pos-deletes and Puffin
    deletion vectors (decoded driver-side; DVs are metadata-sized)."""
    pairs: Set[tuple] = set()
    parquet = [d.file_path for d in pos_like if d.file_format == "parquet"]
    if parquet:
        for r in spark.read.parquet(*sorted(set(parquet))) \
                .select("file_path", "pos").collect():
            pairs.add((r["file_path"], r["pos"]))
    from ..sources.puffin import BlobMetadata, deserialize_dv, read_blob
    for d in pos_like:
        if d.file_format != "puffin":
            continue
        blob = read_blob(d.file_path, BlobMetadata(
            type="deletion-vector-v1", fields=[], snapshot_id=0,
            sequence_number=0, offset=d.content_offset,
            length=d.content_size_in_bytes))
        for p in deserialize_dv(blob):
            pairs.add((d.referenced_data_file, int(p)))
    return pairs
