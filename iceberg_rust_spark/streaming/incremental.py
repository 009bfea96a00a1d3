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

    def _load_state(self):
        from ..sources.io import file_io_for
        fio = file_io_for(self.checkpoint_path)
        if fio.is_file(self.checkpoint_path):
            d = json.loads(fio.read_text(self.checkpoint_path))
            return d.get("last_snapshot_id"), d.get("last_sequence_number")
        return None, None

    def _save_state(self, snapshot_id: int, sequence_number: int) -> None:
        from ..sources.io import file_io_for
        fio = file_io_for(self.checkpoint_path)
        tmp = self.checkpoint_path + ".tmp"
        # seq rides along so expire_snapshots removing the checkpointed
        # snapshot can't force a full replay (same fix as ChangesReader)
        fio.write_text(tmp, json.dumps({
            "last_snapshot_id": snapshot_id,
            "last_sequence_number": sequence_number}))
        fio.rename(tmp, self.checkpoint_path)

    def micro_batches(self, spark: SparkSession
                      ) -> Iterator[Tuple[int, DataFrame]]:
        """Yield (snapshot_id, appended-rows DataFrame) per unseen snapshot,
        committing the checkpoint after each yield (at-least-once). Walks
        MAIN's ancestry only — staged WAP-branch snapshots never surface."""
        from .changes import _ancestor_chain
        self.table.refresh()
        md = self.table.metadata
        last, last_seq = self._load_state()
        if last is not None and last_seq is None:
            # legacy checkpoint: recover seq while the id still resolves
            ls = md.snapshot_by_id(last)
            last_seq = ls.sequence_number if ls else None
        ref = md.refs.get("main")
        head = ref.snapshot_id if ref is not None else md.current_snapshot_id
        prev_seq = last_seq
        for snap in _ancestor_chain(md, head):
            if last_seq is not None and snap.sequence_number <= last_seq:
                continue
            if snap.operation not in ("append", "overwrite"):
                # non-append snapshots are surfaced as empty batches for
                # ordering; a CDC feed would emit deletes here
                self._save_state(snap.snapshot_id, snap.sequence_number)
                prev_seq = snap.sequence_number
                continue
            parent = snap.parent_snapshot_id
            if parent is not None and md.snapshot_by_id(parent) is not None:
                df = self.table.incremental_scan(
                    parent, snap.snapshot_id).to_df(spark)
            elif prev_seq is not None:
                # parent expired but the checkpoint remembers the consumed
                # sequence boundary: emit only files newer than it (a full
                # re-scan here would replay the whole retained state)
                scan = self.table.scan(snapshot_id=snap.snapshot_id)
                orig_plan, min_seq = scan.plan_files, prev_seq

                def plan_files(_orig=orig_plan, _min=min_seq):
                    p = _orig()
                    p.tasks = [t for t in p.tasks
                               if t.sequence_number > _min]
                    return p

                scan.plan_files = plan_files  # type: ignore[method-assign]
                df = scan.to_df(spark)
            else:
                # true initial batch: the snapshot's full state
                df = self.table.scan(snapshot_id=snap.snapshot_id).to_df(spark)
            yield snap.snapshot_id, df
            self._save_state(snap.snapshot_id, snap.sequence_number)
            prev_seq = snap.sequence_number
