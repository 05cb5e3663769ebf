"""Task-failure / retry evidence (north rule: resumable, idempotent at
the task level, not just the stage level).

The probe (tests/retry_probe.py) injects a first-attempt failure into a
pandas-UDF stage via TaskContext.attemptNumber() and runs under
``local[4, 2]`` (the second bracket arg is spark.task.maxFailures in
local mode — without it local tasks are fail-fast). What it pins down:

- a python-worker exception fails the TASK, Spark reschedules it, and
  the retried stage produces exactly the same result set (no dropped or
  duplicated partitions);
- the parquet write path is exactly-once under task retry: the failed
  attempt's output is never visible (task-commit protocol + v2
  committer), so a retried write stage cannot double-count rows — the
  property the KG pipeline's per-stage materialization (plans/kg.py)
  relies on when a 1000-executor run loses workers mid-stage;
- a shuffle consumer downstream of the retried stage sees each row
  exactly once.

It runs in a SUBPROCESS because maxFailures is fixed at SparkContext
creation: inside the pytest process, getOrCreate() would return the
suite's long-lived local[8] session (maxFailures=1) and the injected
failure would be fatal instead of retried.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys


def test_task_retry_properties():
    probe = pathlib.Path(__file__).parent / "retry_probe.py"
    repo = pathlib.Path(__file__).parent.parent
    proc = subprocess.run(
        [sys.executable, str(probe)],
        cwd=str(repo),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"retry probe failed:\n{proc.stdout}\n{proc.stderr}"
    for marker in ("OK identical_results", "OK exactly_once_write", "OK shuffle_consumer"):
        assert marker in proc.stdout, f"missing {marker}:\n{proc.stdout}"
