"""Subprocess body for tests/test_fault_tolerance.py.

Runs in its OWN python process so the SparkSession is guaranteed to be
``local[4, 2]`` (second bracket arg = spark.task.maxFailures in local
mode). Inside the pytest process `getOrCreate()` would silently return
the suite's long-lived ``local[8]`` session, whose maxFailures=1 makes
every injected first-attempt failure fatal — the exact flake this file
removes.

Exits 0 iff all three retry properties hold; prints one OK line per
check so the parent test can assert on markers, not just the exit code.
"""

from __future__ import annotations

import glob
import pathlib
import sys
import tempfile

# sys.path[0] is tests/ when invoked as `python tests/retry_probe.py`;
# the package lives one level up.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _flaky_doubler(it):
    # fail the FIRST attempt of every task; succeed on the retry
    from pyspark import TaskContext

    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    for pdf in it:
        yield pdf.assign(v=pdf["id"] * 2)


def main() -> int:
    from ner_spark.session import get_spark

    spark = get_spark(
        master="local[4, 2]", app="retry-probe", shuffle_partitions=4
    )
    try:
        expected = [(i, 2 * i) for i in range(1000)]

        # 1. retried map stage: identical result set, no dropped/dup parts
        df = spark.range(0, 1000, numPartitions=4)
        out = df.mapInPandas(_flaky_doubler, "id long, v long")
        rows = sorted((r["id"], r["v"]) for r in out.collect())
        assert rows == expected, "retried map stage diverged"
        print("OK identical_results")

        # 2. parquet write exactly-once under task retry (v2 committer:
        #    attempt-0 output never visible, no duplicated partition)
        path = tempfile.mkdtemp(prefix="retried_write_") + "/out"
        df = spark.range(0, 1000, numPartitions=4)
        df.mapInPandas(_flaky_doubler, "id long, v long").write.parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == 1000, "duplicated/lost partition after retry"
        rows = sorted((r["id"], r["v"]) for r in back.collect())
        assert rows == expected, "retried write stage diverged"
        assert len(glob.glob(f"{path}/*.parquet")) == 4, "attempt-0 leftovers"
        print("OK exactly_once_write")

        # 3. shuffle consumer downstream of the retried stage sees each
        #    row exactly once
        df = spark.range(0, 1000, numPartitions=4)
        mapped = df.mapInPandas(_flaky_doubler, "id long, v long")
        agg = mapped.groupBy((mapped["id"] % 7).alias("k")).count().collect()
        assert sum(r["count"] for r in agg) == 1000, "shuffle saw dup/lost rows"
        print("OK shuffle_consumer")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
