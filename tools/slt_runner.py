"""Mini sqllogictest runner over the REFERENCE'S OWN test suites.

The reference ships sqllogictest files driving its DataFusion integration
(crates/sqllogictest/testdata/slts/df_test/*.slt). This runner parses the
same files and executes every statement/query through OUR SQL front door
(sources/sql.py run_sql) against a FileSystemCatalog — a direct "matches
the reference's results on its own test queries" check.

Conventions honored (sqllogictest wire format):
- ``statement ok`` / ``statement error`` / ``query <types> [rowsort]``
  records, expected rows after ``----``.
- Value formatting mirrors the DataFusion engine's: floats at 12 decimal
  places with trailing zeros trimmed, booleans ``true/false``, ``NULL``,
  binary as lowercase hex, timestamps as ISO-8601 with 'T'.
- INSERT "query" records compare the INSERTED ROW COUNT (DataFusion's
  insert result), not the rows.
- ``EXPLAIN`` records are engine-specific plan text and are skipped (the
  semantics they guard — pushdown — are covered by PLAN_AUDIT.md).
- ``default.default.<t>`` (catalog.namespace.table) is mapped to the
  ``slt`` namespace of the local warehouse.

Usage: python tools/slt_runner.py [slt_dir]
"""

from __future__ import annotations

import datetime as dt
import decimal
import os
import re
import sys
from typing import List, Optional, Tuple

sys.path.insert(0, "/root/repo")

REF_SLT_DIR = "/root/reference/crates/sqllogictest/testdata/slts/df_test"

# engine-specific suites that cannot apply: SHOW TABLES dumps DataFusion's
# information_schema catalog itself, not table data
SKIP_FILES = {"show_tables.slt"}


def parse_slt(path: str) -> List[Tuple[str, Optional[str], str, list]]:
    """-> [(kind, mode, sql, expected)]; kind in {statement, query},
    mode = ok|error for statements, sortmode|None for queries."""
    lines = open(path).read().splitlines()
    out, i = [], 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            mode = line.split()[1]
            i += 1
            sql = []
            while i < len(lines) and lines[i].strip() \
                    and not lines[i].startswith("#"):
                sql.append(lines[i])
                i += 1
            out.append(("statement", mode, "\n".join(sql), []))
        elif line.startswith("query"):
            parts = line.split()
            sortmode = parts[2] if len(parts) > 2 else None
            i += 1
            sql = []
            while i < len(lines) and lines[i].strip() not in ("----",) \
                    and lines[i].strip():
                sql.append(lines[i])
                i += 1
            expected = []
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i])
                    i += 1
            out.append(("query", sortmode, "\n".join(sql), expected))
        else:
            i += 1
    return out


def fmt_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (float, decimal.Decimal)):
        s = f"{float(v):.12f}".rstrip("0").rstrip(".")
        return "0" if s in ("-0", "") else s
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _norm(line: str) -> str:
    return " ".join(line.split())


def run_slt_file(spark, catalog, path: str) -> Tuple[int, int, List[str]]:
    """-> (n_checked, n_skipped, failures)."""
    from iceberg_rust_spark.sources.sql import run_sql

    n_ok = n_skip = 0
    failures: List[str] = []
    for kind, mode, sql, expected in parse_slt(path):
        sql = sql.replace("default.default.", "slt.")
        head = sql.lstrip().upper()
        if head.startswith("EXPLAIN"):
            n_skip += 1
            continue
        label = f"{os.path.basename(path)}: {sql.splitlines()[0][:70]}"
        if kind == "statement":
            try:
                run_sql(spark, catalog, sql).collect()
                err = None
            except Exception as exc:
                err = exc
            if mode == "ok" and err is not None:
                failures.append(f"{label} -> unexpected error: {err}")
            elif mode == "error" and err is None:
                failures.append(f"{label} -> expected an error, got success")
            else:
                n_ok += 1
            continue
        # query record
        try:
            df = run_sql(spark, catalog, sql)
            if head.startswith("INSERT"):
                actual = [str(df.count())]
            else:
                actual = [_norm(" ".join(fmt_value(v) for v in row))
                          for row in df.collect()]
        except Exception as exc:
            failures.append(f"{label} -> query error: {exc}")
            continue
        exp = [_norm(e) for e in expected]
        if mode == "rowsort":
            actual, exp = sorted(actual), sorted(exp)
        if actual != exp:
            failures.append(
                f"{label} -> rows differ\n  expected: {exp}\n  actual:   "
                f"{actual}")
        else:
            n_ok += 1
    return n_ok, n_skip, failures


def provision(catalog) -> None:
    """Pre-provisioned fixtures the reference's engine creates in code
    (sqllogictest/src/engine/datafusion.rs:108-165): an identity-partitioned
    table and a binary-column table (their DDL predates the engine's CREATE
    TABLE support)."""
    from iceberg_rust_spark import (PartitionField, PartitionSpec, Table)
    from iceberg_rust_spark.functions.transforms import parse_transform
    from iceberg_rust_spark.sources import types as ice
    from iceberg_rust_spark.sources.types import NestedField, Schema

    part_schema = Schema([
        NestedField(1, "id", ice.INT, required=True),
        NestedField(2, "category", ice.STRING, required=True),
        NestedField(3, "value", ice.STRING, required=False)])
    Table.create(catalog, "slt.test_partitioned_table", part_schema,
                 PartitionSpec(0, [PartitionField(
                     2, 1000, "category", parse_transform("identity"))]))
    bin_schema = Schema([
        NestedField(1, "id", ice.INT, required=True),
        NestedField(2, "data", ice.BINARY, required=False)])
    Table.create(catalog, "slt.test_binary_table", bin_schema)


def load_schedules(schedules_dir: str) -> List[Tuple[str, List[str]]]:
    """schedules/*.toml -> [(schedule name, [slt paths in step order])]."""
    import tomllib
    out = []
    for fname in sorted(os.listdir(schedules_dir)):
        if not fname.endswith(".toml"):
            continue
        with open(os.path.join(schedules_dir, fname), "rb") as fh:
            cfg = tomllib.load(fh)
        out.append((fname, [s["slt"] for s in cfg.get("steps", [])]))
    return out


def main() -> int:
    import shutil
    import uuid

    from iceberg_rust_spark import FileSystemCatalog
    from iceberg_rust_spark.session import get_spark

    slt_root = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(REF_SLT_DIR)
    schedules_dir = os.path.join(os.path.dirname(slt_root), "schedules") \
        if not os.path.isdir(os.path.join(slt_root, "..", "schedules")) \
        else os.path.abspath(os.path.join(slt_root, "..", "schedules"))
    spark = get_spark("slt", cpus=8, shuffle_partitions=8)
    total_ok = total_skip = 0
    all_failures: List[str] = []
    # one warehouse per SCHEDULE: steps within a schedule share state, just
    # like the reference runs them against one engine session
    for sched_name, steps in load_schedules(schedules_dir):
        steps = [s for s in steps if os.path.basename(s) not in SKIP_FILES]
        if not steps:
            continue
        wh = f"/tmp/slt_wh_{uuid.uuid4().hex[:8]}"
        catalog = FileSystemCatalog(wh)
        provision(catalog)
        for step in steps:
            path = os.path.join(slt_root, step)
            ok, skip, fails = run_slt_file(spark, catalog, path)
            print(f"{sched_name} / {step}: {ok} checked, {skip} skipped, "
                  f"{len(fails)} failed", file=sys.stderr)
            total_ok += ok
            total_skip += skip
            all_failures += fails
        shutil.rmtree(wh, ignore_errors=True)
    for f in all_failures:
        print("FAIL " + f, file=sys.stderr)
    print(f"{total_ok} checked, {total_skip} skipped (EXPLAIN/engine-"
          f"specific), {len(all_failures)} failed")
    spark.stop()
    return 1 if all_failures else 0


if __name__ == "__main__":
    sys.exit(main())
