"""Incremental snapshot-diff reads (change feed for appends).

The reference has no streaming surface (SURVEY.md §2.6); its snapshot log +
sequence numbers enable exactly this: read only files appended between two
snapshots. We expose it as (a) a batch diff scan (Table.incremental_scan) and
(b) a driver-side micro-batch iterator with a file-based checkpoint, the
Trigger.AvailableNow shape — each yielded DataFrame is one consistent batch
of newly-appended rows.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..sources.table import Table


class IncrementalReader:
    """Checkpointed micro-batch reader over a table's append history."""

    def __init__(self, table: Table, checkpoint_path: str):
        self.table = table
        self.checkpoint_path = checkpoint_path

    def _load_state(self) -> Optional[int]:
        from ..sources.io import file_io_for
        fio = file_io_for(self.checkpoint_path)
        if fio.is_file(self.checkpoint_path):
            import io as _io
            with _io.StringIO(fio.read_text(self.checkpoint_path)) as fh:
                return json.load(fh).get("last_snapshot_id")
        return None

    def _save_state(self, snapshot_id: int) -> None:
        from ..sources.io import file_io_for
        fio = file_io_for(self.checkpoint_path)
        tmp = self.checkpoint_path + ".tmp"
        fio.write_text(tmp, json.dumps({"last_snapshot_id": snapshot_id}))
        fio.rename(tmp, self.checkpoint_path)

    def micro_batches(self, spark: SparkSession
                      ) -> Iterator[Tuple[int, DataFrame]]:
        """Yield (snapshot_id, appended-rows DataFrame) per unseen snapshot,
        committing the checkpoint after each yield (at-least-once)."""
        self.table.refresh()
        md = self.table.metadata
        last = self._load_state()
        snaps = sorted(md.snapshots, key=lambda s: s.sequence_number)
        for snap in snaps:
            if last is not None:
                last_snap = md.snapshot_by_id(last)
                if last_snap is not None and snap.sequence_number <= last_snap.sequence_number:
                    continue
            if snap.operation not in ("append", "overwrite"):
                # non-append snapshots are surfaced as empty batches for
                # ordering; a CDC feed would emit deletes here
                self._save_state(snap.snapshot_id)
                continue
            if last is None and snap.parent_snapshot_id is None:
                df = self.table.scan(snapshot_id=snap.snapshot_id).to_df(spark)
            else:
                parent = snap.parent_snapshot_id
                if parent is None or md.snapshot_by_id(parent) is None:
                    df = self.table.scan(snapshot_id=snap.snapshot_id).to_df(spark)
                else:
                    df = self.table.incremental_scan(
                        parent, snap.snapshot_id).to_df(spark)
            yield snap.snapshot_id, df
            self._save_state(snap.snapshot_id)
