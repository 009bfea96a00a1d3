"""plan_files() scale probe: is planning O(metadata) at 100k files?

Synthesizes tables of 1k / 10k / 100k FABRICATED data files (planning never
opens data files, so no parquet bytes are written) laid out 1000 files per
manifest with identity-partitioned, metrics-bounded entries, then measures
driver wall + RSS for three predicate shapes:

- partition-selective (p == K): FieldSummary pruning must skip ~all
  manifests, so wall tracks SURVIVING manifests, not total files;
- metrics-selective (v > hi-cut): no partition projection applies, so the
  planner must walk every entry — wall may be linear in files (the
  at-most-linear bound), with per-entry cost in the microseconds;
- none (full scan): the AlwaysTrue fast path — per-entry cost is a couple
  of dict/attr touches.

Reference counterpart: the concurrent 4-stage planning pipeline in
crates/iceberg/src/scan/mod.rs:381-499 (our thread-pool per-manifest
load+evaluate mirrors its manifest-level concurrency).

Usage: python tools/plan_scale_probe.py  (prints a markdown table; also
imported by tools/scale_probe.py to embed the same table in SCALE.md)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

FILES_PER_MANIFEST = 1000


def _rss_kb() -> int:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


def _build(n_files: int, root: str):
    """A table whose current snapshot lists ``n_files`` fabricated data
    files across n_files/1000 manifests; manifest i holds exactly
    partition p == i (tight FieldSummaries), column v spans
    [i*1000, i*1000+999] across its entries."""
    from iceberg_rust_spark import (FileSystemCatalog, PartitionField,
                                    PartitionSpec, Table)
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.manifest import DataFile
    from iceberg_rust_spark.sources.types import (Schema, NestedField, LONG)

    loc = os.path.join(root, f"n{n_files}")
    shutil.rmtree(loc, ignore_errors=True)
    cat = FileSystemCatalog(loc)
    schema = Schema([NestedField(1, "k", LONG, True),
                     NestedField(2, "p", LONG, True),
                     NestedField(3, "v", LONG, True)], 0)
    spec = PartitionSpec(0, [PartitionField(2, 1000, "p",
                                            parse_transform("identity"))])
    t = Table.create(cat, "db.plan", schema, partition_spec=spec)
    n_manifests = max(1, n_files // FILES_PER_MANIFEST)
    for m in range(n_manifests):
        files = [DataFile(
            file_path=f"/tmp/fake_plan_probe/m{m}/f{i}.parquet",
            record_count=1000, file_size_in_bytes=1 << 20,
            partition={"p": m},
            value_counts={"k": 1000, "p": 1000, "v": 1000},
            null_value_counts={"k": 0, "p": 0, "v": 0},
            lower_bounds={"k": 0, "p": m, "v": m * 1000 + i},
            upper_bounds={"k": 10 ** 9, "p": m, "v": m * 1000 + i},
            schema_id=0, spec_id=0)
            for i in range(n_files // n_manifests)]
        t = t._commit_retry(lambda md, fs=files: t._snapshot_update(
            md, "append", added=fs))
    return t


def run_probe(root: str = "/tmp/plan_scale_probe",
              sizes=(1_000, 10_000, 100_000)) -> list:
    from iceberg_rust_spark import expr as E
    rows = []
    for n in sizes:
        t0 = time.time()
        t = _build(n, root)
        build_s = round(time.time() - t0, 2)
        n_manifests = max(1, n // FILES_PER_MANIFEST)
        shapes = [
            ("partition-selective", E.col("p") == n_manifests // 2, 1000),
            # v bounds are a point per file, so v > n-10 keeps exactly
            # the files with v in [n-9, n-1]
            ("metrics-selective", E.col("v") > (n - 10), 9),
            ("full-scan", None, n),
        ]
        for name, pred, expect in shapes:
            # cold: includes manifest parquet decode; warm: cache hits —
            # the steady state of repeated planning on a live table
            walls = []
            rss0 = _rss_kb()
            for _rep in range(3):
                p0 = time.time()
                plan = t.scan(row_filter=pred).plan_files()
                walls.append(time.time() - p0)
            rss1 = _rss_kb()
            assert len(plan.tasks) == expect, \
                (name, n, len(plan.tasks), expect)
            rows.append({
                "files": n, "shape": name,
                "cold_s": round(walls[0], 3),
                "warm_s": round(min(walls[1:]), 3),
                "tasks": len(plan.tasks),
                "skipped_manifests": plan.skipped_manifests,
                "rss_delta_mb": round((rss1 - rss0) / 1024, 1),
                "build_s": build_s,
            })
    shutil.rmtree(root, ignore_errors=True)
    return rows


def markdown(rows: list) -> list:
    lines = [
        "| files | predicate shape | cold plan | warm plan | tasks | "
        "manifests skipped | RSS delta |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['files']:,} | {r['shape']} | {r['cold_s']}s | "
            f"{r['warm_s']}s | {r['tasks']} | {r['skipped_manifests']} | "
            f"{r['rss_delta_mb']} MB |")
    return lines


if __name__ == "__main__":
    rows = run_probe()
    print("\n".join(markdown(rows)))
    # acceptance: warm partition-selective plan at 100k files well under
    # a second; full-scan at-most-linear decade over decade
    sel = {r["files"]: r["warm_s"] for r in rows
           if r["shape"] == "partition-selective"}
    full = {r["files"]: r["warm_s"] for r in rows if r["shape"] == "full-scan"}
    print(f"\nselective@100k warm: {sel.get(100_000)}s; "
          f"full-scan e(10k->100k): "
          f"{math.log(max(full.get(100_000, 1e-3), 1e-3) / max(full.get(10_000, 1e-3), 1e-3)) / math.log(10):+.2f}")
