"""Multi-executor deployment gate (north rule: the pipeline "runs via
spark-submit --py-files on multi-executor clusters").

Submits the FULL production KG job with ``spark-submit --py-files
ner_spark.zip`` to a ``local-cluster`` master — real separate executor
JVMs with their own heaps and python workers, cross-process broadcast of
the gazetteer/model weights, and netty shuffle between processes — and
asserts the emitted triples are EXACTLY the oracle's. This is the class
of failure ``local[*]`` can never catch: driver-local path assumptions,
state that only works unserialized in one JVM, modules missing from the
--py-files zip, broadcast values that don't survive a process boundary.

The scaling harness (bench.py --scaling-cluster) measures this same
deployment shape at N vs 4N executors; this test keeps it CORRECT on
every ``python -m pytest`` run at fixture scale.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pyspark

from fixtures.gen import ensure_fixture_dir
from ner_spark.deploy import REPO_ROOT, build_pyfiles_zip
from oracle.ref_pipeline import run_on_dir

TRIPLE_KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _norm(pdf: pd.DataFrame, cols) -> pd.DataFrame:
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_spark_submit_local_cluster_triples_exact(tmp_path):
    fixture = ensure_fixture_dir("tiny")
    warehouse = str(tmp_path / "wh")
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(pyspark.__file__)), "bin", "spark-submit"
    )
    master = "local-cluster[2,1,1024]"
    cmd = [
        spark_submit,
        "--master", master,
        "--driver-memory", "2g",
        "--py-files", build_pyfiles_zip(),
        "--conf", "spark.executor.memory=900m",
        os.path.join(REPO_ROOT, "jobs", "build_kg.py"),
        "--fixture", "tiny",
        "--warehouse", warehouse,
        "--run-id", "cluster1",
        "--master", master,
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        cmd, cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    got = pd.read_parquet(os.path.join(warehouse, "triples"))
    exp = run_on_dir(fixture)["triples"]
    A = set(map(tuple, _norm(exp, TRIPLE_KEY).itertuples(index=False)))
    B = set(map(tuple, _norm(got, TRIPLE_KEY).itertuples(index=False)))
    assert A and A == B, (len(A - B), len(B - A))
