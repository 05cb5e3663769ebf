#!/usr/bin/env python
"""Batch curation pipeline entry point (plans/curation.py) — the
training-data twin of jobs/build_kg.py.

Cluster:
    spark-submit --master <cluster> --py-files kg.zip jobs/curate.py \
        --input s3://.../documents --warehouse s3://.../curation --run-id C7

Sandbox (same code path):
    python jobs/curate.py --input /root/testdata/sf0.01/documents.parquet \
        --warehouse /tmp/cur --run-id c1

The whole dataflow is JVM-side (no python workers), so no task-cpus
sizing is needed — slots equal cores. Idempotent resume: rerunning with
the same --warehouse/--run-id skips committed stages (a re-run after a
crash during clustering starts from the materialized signature table,
never re-scanning the corpus); --no-resume forces a full rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents table/path")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="c1")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--n-bands", type=int, default=8)
    ap.add_argument("--min-band-hits", type=int, default=2)
    ap.add_argument("--master", default=None)
    a = ap.parse_args()

    from ner_spark.plans.curation import curate
    from ner_spark.session import get_spark

    spark = get_spark(master=a.master, app=f"curation-{a.run_id}")
    t0 = time.perf_counter()
    out = curate(
        spark,
        spark.read.parquet(a.input),
        warehouse=a.warehouse,
        run_id=a.run_id,
        resume=not a.no_resume,
        n_bands=a.n_bands,
        min_band_hits=a.min_band_hits,
    )
    metrics = {
        "run_id": a.run_id,
        "warehouse": a.warehouse,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "rows": {name: df.count() for name, df in out.items()},
        "kept": out["decision"].where("keep").count(),
    }
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
