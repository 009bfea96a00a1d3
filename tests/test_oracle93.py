"""The full local correctness gate as a CI test: every `queries()` entry
must match its DuckDB oracle at sf0.01 — the same check the external
driver grades a rotating 50-query window of. Keeping it in the default
pytest run means the dual-SF CORRECTNESS_LOCAL artifacts cannot silently
go stale between closing runs (VERDICT r9 task 7).

Runs tools/check_correctness.py as a SUBPROCESS: the tool owns (and
stops) its own SparkSession, which must not touch the suite's session
fixture. Deselect with `-m "not oracle93"` for a quick loop.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.oracle93
def test_all_queries_match_oracle_sf001():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"),
         "/root/testdata/sf0.01"],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, \
        f"oracle gate failed (exit {proc.returncode}):\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 failed" in proc.stdout, tail
