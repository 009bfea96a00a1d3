"""Run the REFERENCE'S OWN sqllogictest suites through our SQL front door
(tools/slt_runner.py): the direct "matches the reference's results on its
own test queries" gate. Schedules share a warehouse per the reference's
engine sessions; EXPLAIN records (DataFusion plan text) are skipped."""

import os
import shutil
import uuid

import pytest

from tools.slt_runner import (REF_SLT_DIR, SKIP_FILES, load_schedules,
                              provision, run_slt_file)

SCHEDULES_DIR = os.path.join(os.path.dirname(REF_SLT_DIR), "..", "schedules")


@pytest.mark.skipif(not os.path.isdir(REF_SLT_DIR),
                    reason="reference slt suites not present")
def test_reference_sqllogictest_suites(spark):
    from iceberg_rust_spark import FileSystemCatalog
    total_checked = 0
    failures = []
    for sched, steps in load_schedules(os.path.abspath(SCHEDULES_DIR)):
        steps = [s for s in steps if os.path.basename(s) not in SKIP_FILES]
        if not steps:
            continue
        wh = f"/tmp/slt_test_wh_{uuid.uuid4().hex[:8]}"
        catalog = FileSystemCatalog(wh)
        provision(catalog)
        for step in steps:
            ok, _skip, fails = run_slt_file(
                spark, catalog, os.path.join(os.path.dirname(REF_SLT_DIR),
                                             step))
            total_checked += ok
            failures += fails
        shutil.rmtree(wh, ignore_errors=True)
    assert failures == []
    assert total_checked >= 120
