#!/usr/bin/env python
"""Value-level oracle sweep: run every oracle-backed registry query on
Spark AND DuckDB at a given sf dir and compare full results (sorted
columns, sorted rows, 1e-6 atol) — the same comparison the driver's
CORRECTNESS gate makes at sf0.01, but runnable at any scale. A sweep at
sf0.1 catches scale-dependent bugs the gate can't: thresholds that go
vacuous or explode, selectivity artifacts, accumulation-order noise
that outgrows its rounding.

    python tools/sweep_oracle_values.py [sf_dir] [only_name ...]

Optional trailing args restrict the sweep to the named entries (fast
iteration on a query under repair).
"""
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from ner_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

spark = get_spark()
con = duckdb.connect()
for tb in TABLES:
    con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf}/{tb}.parquet'")

oracles = E.oracle_sql()
only = sys.argv[2:]
if only:
    oracles = {k: v for k, v in oracles.items() if k in only}
failures, empties = [], []
t0 = time.time()
for name, sql in oracles.items():
    try:
        sdf = E.queries()[name](spark, sf).toPandas()
        odf = con.execute(sql).fetchdf()
        cols = sorted(sdf.columns)
        assert sorted(odf.columns) == cols, (cols, sorted(odf.columns))
        a = sdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = odf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-6)
        if len(a) == 0:
            empties.append(name)
    except Exception:
        failures.append(name)
        print(f"FAIL {name}", flush=True)
        traceback.print_exc(limit=3)
print(
    f"swept {len(oracles)} oracle-backed queries at {sf} in "
    f"{time.time() - t0:.1f}s; failures: {failures or 'none'}; "
    f"empty-result (vacuous pass): {empties or 'none'}"
)
spark.stop()
# an empty result is a vacuous pass — a gate-integrity failure, not a
# soft warning (run_gates.sh records "0 vacuous empties" off this code)
sys.exit(1 if failures or empties else 0)
