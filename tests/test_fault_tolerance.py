"""Task-failure / retry evidence (north rule: resumable, idempotent at
the task level, not just the stage level).

Every test injects a first-attempt failure into a pandas-UDF stage via
TaskContext.attemptNumber() and runs under ``local[4, 2]`` (the second
bracket arg is spark.task.maxFailures in local mode — without it local
tasks are fail-fast). What this pins down:

- a python-worker exception fails the TASK, Spark reschedules it, and
  the retried stage produces exactly the same result set (no dropped or
  duplicated partitions);
- the parquet write path is exactly-once under task retry: the failed
  attempt's output is never visible (task-commit protocol + v2
  committer), so a retried write stage cannot double-count rows — the
  property the KG pipeline's per-stage materialization (plans/kg.py)
  relies on when a 1000-executor run loses workers mid-stage.
"""

from __future__ import annotations

import glob

import pytest

from ner_spark.session import get_spark


@pytest.fixture(scope="module")
def retry_spark():
    spark = get_spark(
        master="local[4, 2]", app="retry-test", shuffle_partitions=4
    )
    yield spark
    spark.stop()


def _flaky_doubler(it):
    # fail the FIRST attempt of every task; succeed on the retry
    from pyspark import TaskContext

    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    for pdf in it:
        yield pdf.assign(v=pdf["id"] * 2)


def test_retried_tasks_produce_identical_results(retry_spark):
    df = retry_spark.range(0, 1000, numPartitions=4)
    out = df.mapInPandas(_flaky_doubler, "id long, v long")
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    assert rows == [(i, 2 * i) for i in range(1000)]


def test_parquet_write_is_exactly_once_under_retry(retry_spark, tmp_path):
    path = str(tmp_path / "retried_write")
    df = retry_spark.range(0, 1000, numPartitions=4)
    df.mapInPandas(_flaky_doubler, "id long, v long").write.parquet(path)
    back = retry_spark.read.parquet(path)
    assert back.count() == 1000  # no duplicated partition from attempt 0
    rows = sorted((r["id"], r["v"]) for r in back.collect())
    assert rows == [(i, 2 * i) for i in range(1000)]
    # only committed task files are visible (no attempt-0 leftovers)
    assert len(glob.glob(f"{path}/*.parquet")) == 4


def test_shuffle_consumer_survives_upstream_retry(retry_spark):
    # the retried map stage feeds a shuffle: the aggregate downstream of
    # the failure must still see each row exactly once
    df = retry_spark.range(0, 1000, numPartitions=4)
    mapped = df.mapInPandas(_flaky_doubler, "id long, v long")
    agg = mapped.groupBy((mapped["id"] % 7).alias("k")).count().collect()
    assert sum(r["count"] for r in agg) == 1000
