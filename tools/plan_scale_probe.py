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

Each tier also runs a MOR variant (--deletes default on): ~1.1x delete
files in the three real-world shapes (DV path-scoped, file_path-bounded
partition-scoped, equality) with per-task attachment counts asserted —
the delete index must stay O(matches) per survivor, and plan wall with
deletes at most ~2x the no-deletes row.

Reference counterpart: the concurrent 4-stage planning pipeline in
crates/iceberg/src/scan/mod.rs:381-499 and the partition-keyed delete
index in delete_file_index.rs:84-168 (our columnar decode + pool
prepare / serial eval split mirrors its manifest-level concurrency).

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


def _build(n_files: int, root: str, with_deletes: bool = False):
    """A table whose current snapshot lists ``n_files`` fabricated data
    files across n_files/1000 manifests; manifest i holds exactly
    partition p == i (tight FieldSummaries), column v spans
    [i*1000, i*1000+999] across its entries.

    ``with_deletes`` adds ~1.1x as many DELETE files, in the shapes real
    MOR tables produce (the reference streams these through the same
    concurrent planning pipeline, scan/mod.rs:420-465, and matches per
    data file in delete_file_index.rs:84-168):
      - one DV-style path-scoped positional delete per data file
        (referenced_data_file set) — exact-map matching;
      - one file_path-BOUNDED partition-scoped positional delete per run
        of 10 data files (disjoint [lower, upper] ranges, the shape a
        writer that sorts delete rows by path produces) — interval-stab
        matching;
      - one partition-scoped equality delete per manifest."""
    from iceberg_rust_spark import (FileSystemCatalog, PartitionField,
                                    PartitionSpec, Table)
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources.manifest import (
        CONTENT_EQUALITY_DELETES, CONTENT_POSITION_DELETES, DataFile)
    from iceberg_rust_spark.sources.types import (Schema, NestedField, LONG)

    loc = os.path.join(root, f"n{n_files}" + ("_mor" if with_deletes else ""))
    shutil.rmtree(loc, ignore_errors=True)
    cat = FileSystemCatalog(loc)
    schema = Schema([NestedField(1, "k", LONG, True),
                     NestedField(2, "p", LONG, True),
                     NestedField(3, "v", LONG, True)], 0)
    spec = PartitionSpec(0, [PartitionField(2, 1000, "p",
                                            parse_transform("identity"))])
    t = Table.create(cat, "db.plan", schema, partition_spec=spec)
    n_manifests = max(1, n_files // FILES_PER_MANIFEST)
    per = n_files // n_manifests

    def dpath(m, i):
        return f"/tmp/fake_plan_probe/m{m}/f{i:05d}.parquet"

    for m in range(n_manifests):
        files = [DataFile(
            file_path=dpath(m, i),
            record_count=1000, file_size_in_bytes=1 << 20,
            partition={"p": m},
            value_counts={"k": 1000, "p": 1000, "v": 1000},
            null_value_counts={"k": 0, "p": 0, "v": 0},
            lower_bounds={"k": 0, "p": m, "v": m * 1000 + i},
            upper_bounds={"k": 10 ** 9, "p": m, "v": m * 1000 + i},
            schema_id=0, spec_id=0)
            for i in range(per)]
        t = t._commit_retry(lambda md, fs=files: t._snapshot_update(
            md, "append", added=fs))
    if not with_deletes:
        return t
    for m in range(n_manifests):
        dels = [DataFile(                       # DV-style, path-scoped
            file_path=f"/tmp/fake_plan_probe/del/m{m}/dv{i:05d}.puffin",
            file_format="puffin", content=CONTENT_POSITION_DELETES,
            partition={"p": m}, record_count=10, file_size_in_bytes=64,
            referenced_data_file=dpath(m, i),
            content_offset=4, content_size_in_bytes=32,
            schema_id=0, spec_id=0) for i in range(per)]
        dels += [DataFile(                      # bounded, partition-scoped
            file_path=f"/tmp/fake_plan_probe/del/m{m}/pd{r:04d}.parquet",
            content=CONTENT_POSITION_DELETES,
            partition={"p": m}, record_count=100,
            file_size_in_bytes=1 << 12,
            lower_bounds={"file_path": dpath(m, r * 10)},
            upper_bounds={"file_path": dpath(m, r * 10 + 9)},
            schema_id=0, spec_id=0) for r in range(per // 10)]
        dels.append(DataFile(                   # equality, partition-scoped
            file_path=f"/tmp/fake_plan_probe/del/m{m}/eq.parquet",
            content=CONTENT_EQUALITY_DELETES,
            partition={"p": m}, record_count=5, file_size_in_bytes=512,
            equality_ids=[3], schema_id=0, spec_id=0))
        t = t._commit_retry(lambda md, fs=dels: t._snapshot_update(
            md, "delete", added_deletes=fs))
    return t


def run_probe(root: str = "/tmp/plan_scale_probe",
              sizes=(1_000, 10_000, 100_000),
              with_deletes: bool = True) -> list:
    from iceberg_rust_spark import expr as E
    rows = []
    variants = [False, True] if with_deletes else [False]
    for n in sizes:
        n_manifests = max(1, n // FILES_PER_MANIFEST)
        per = n // n_manifests
        shapes = [
            ("partition-selective", E.col("p") == n_manifests // 2, 1000),
            # v bounds are a point per file, so v > n-10 keeps exactly
            # the files with v in [n-9, n-1]
            ("metrics-selective", E.col("v") > (n - 10), 9),
            ("full-scan", None, n),
        ]
        for mor in variants:
            t0 = time.time()
            t = _build(n, root, with_deletes=mor)
            build_s = round(time.time() - t0, 2)
            for name, pred, expect in shapes:
                # cold: includes manifest parquet decode; warm: cache
                # hits — the steady state of repeated planning
                # r11: cold is now TRULY cold — the in-memory manifest
                # cache is cleared per shape, so every cold wall includes
                # the decode of all surviving manifests (previously shape
                # N's "cold" inherited shape N-1's cached decodes)
                from iceberg_rust_spark.sources.scan import _manifest_cache
                _manifest_cache.cache_clear()
                walls = []
                rss0 = _rss_kb()
                for _rep in range(3):
                    p0 = time.time()
                    plan = t.scan(row_filter=pred).plan_files()
                    walls.append(time.time() - p0)
                rss1 = _rss_kb()
                # cold PROCESS, warm DISK cache: restart-shaped planning
                # through the opt-in pickle cache (in-memory caches
                # cleared; decode satisfied from blobs)
                dcd = os.path.join(root, "_mcache")
                os.environ["ICEBERG_SPARK_MANIFEST_DISK_CACHE"] = dcd
                try:
                    t.scan(row_filter=pred).plan_files()   # write-back
                    _manifest_cache.cache_clear()
                    p0 = time.time()
                    t.scan(row_filter=pred).plan_files()
                    disk_warm = round(time.time() - p0, 3)
                finally:
                    del os.environ["ICEBERG_SPARK_MANIFEST_DISK_CACHE"]
                    _manifest_cache.cache_clear()
                assert len(plan.tasks) == min(expect, n), \
                    (name, n, len(plan.tasks), expect)
                n_pos = n_eq = 0
                if mor:
                    # every surviving file carries exactly its DV, the
                    # bounded delete covering its 10-file run, and the
                    # partition's eq delete — MOR attachment correctness
                    # at metadata scale
                    for task in plan.tasks:
                        n_pos += len(task.pos_deletes)
                        n_eq += len(task.eq_deletes)
                    assert n_pos == 2 * len(plan.tasks), (name, n, n_pos)
                    assert n_eq == len(plan.tasks), (name, n, n_eq)
                rows.append({
                    "files": n, "mor": mor, "shape": name,
                    "cold_s": round(walls[0], 3),
                    "warm_s": round(min(walls[1:]), 3),
                    "disk_s": disk_warm,
                    "tasks": len(plan.tasks),
                    "attached_deletes": n_pos + n_eq,
                    "skipped_manifests": plan.skipped_manifests,
                    "rss_delta_mb": round((rss1 - rss0) / 1024, 1),
                    "build_s": build_s,
                })
            if not mor:
                # commit wall at metadata scale, measured LAST so the
                # mutation can't disturb the shape asserts above:
                # appending one file to an n-file table must be
                # O(manifests) — one new manifest + a manifest-list
                # rewrite — never O(files) (no existing-manifest decode).
                # Cold cache = a restarted driver committing.
                from iceberg_rust_spark.sources.manifest import DataFile
                from iceberg_rust_spark.sources.scan import _manifest_cache
                _manifest_cache.cache_clear()
                extra = [DataFile(
                    file_path="/tmp/fake_plan_probe/extra.parquet",
                    record_count=10, file_size_in_bytes=100,
                    partition={"p": 0}, schema_id=0, spec_id=0)]
                c0 = time.time()
                t._commit_retry(lambda md: t._snapshot_update(
                    md, "append", added=extra))
                commit_s = round(time.time() - c0, 3)
                rows.append({"files": n, "mor": False,
                             "shape": "append-commit (cold driver)",
                             "cold_s": commit_s, "warm_s": commit_s,
                             "tasks": 1, "attached_deletes": 0,
                             "skipped_manifests": 0, "rss_delta_mb": 0.0,
                             "build_s": build_s})
    shutil.rmtree(root, ignore_errors=True)
    return rows


def markdown(rows: list) -> list:
    plain = {(r["files"], r["shape"]): r for r in rows if not r.get("mor")}
    lines = [
        "| files | predicate shape | cold plan | warm plan | disk-warm | "
        "tasks | manifests skipped | RSS delta |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if r.get("mor"):
            continue
        disk = f"{r['disk_s']}s" if "disk_s" in r else "—"
        lines.append(
            f"| {r['files']:,} | {r['shape']} | {r['cold_s']}s | "
            f"{r['warm_s']}s | {disk} | {r['tasks']} | "
            f"{r['skipped_manifests']} | {r['rss_delta_mb']} MB |")
    mor = [r for r in rows if r.get("mor")]
    if mor:
        lines += [
            "",
            "With ~1.1x delete files (DV path-scoped per data file + "
            "file_path-bounded per 10-file run + eq per partition); "
            "`xN` compares the same shape's wall without deletes:",
            "",
            "| files | predicate shape | cold plan | warm plan | disk-warm "
            "| tasks | attached deletes | RSS delta |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in mor:
            base = plain.get((r["files"], r["shape"]))
            ratio = ""
            if base:
                ratio = (f" (x{r['cold_s'] / max(base['cold_s'], 1e-3):.1f}"
                         f"/x{r['warm_s'] / max(base['warm_s'], 1e-3):.1f})")
            disk = f"{r['disk_s']}s" if "disk_s" in r else "—"
            lines.append(
                f"| {r['files']:,} | {r['shape']} | {r['cold_s']}s | "
                f"{r['warm_s']}s{ratio} | {disk} | "
                f"{r['tasks']} | "
                f"{r['attached_deletes']} | {r['rss_delta_mb']} MB |")
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
