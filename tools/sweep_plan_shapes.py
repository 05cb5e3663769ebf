#!/usr/bin/env python
"""Sweep every registry query under count() and isEmpty() plan shapes.

Why this exists: differential tests compare via toPandas()/collect(),
but Spark compiles DIFFERENT physical plans for count() (zero-column
aggregate) and isEmpty() (limit-1) — and Spark 4.1's column pruning has
at least one class of bug those shapes expose that collect() never
does: cogroup().applyInPandas with both sides derived from one scan
misbinds the right side's attributes (fixed in join_asof_cogroup by
giving each side its own scan; regression-pinned in tests). Run this
each round at sf0.001 and sf0.01:

    python tools/sweep_plan_shapes.py [sf_dir]
"""
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

import __spark_entry__ as E  # noqa: E402
from ner_spark.session import get_spark  # noqa: E402

spark = get_spark()
failures = []
t0 = time.time()
for name, fn in E.queries().items():
    for shape in ("count", "isEmpty"):
        try:
            df = fn(spark, sf)
            _ = df.count() if shape == "count" else df.isEmpty()
        except Exception:
            failures.append((name, shape))
            print(f"FAIL {name} [{shape}]", flush=True)
            traceback.print_exc(limit=3)
print(
    f"swept {len(E.queries())} queries x2 shapes at {sf} in "
    f"{time.time() - t0:.1f}s; failures: {failures or 'none'}"
)
spark.stop()
sys.exit(1 if failures else 0)
