"""Golden-snapshot integrity (ner_spark/goldens.py): every declared
golden is committed, the sf selector keys match the live testdata
fingerprints, and the oracle registration actually attached. Value
correctness of the snapshots is covered by the DuckDB sweep /
test_queries_duckdb; this file catches the stale-artifact failure mode
(a golden deleted, regenerated against different testdata, or left
behind after an entry rename) without spinning Spark.
"""

from __future__ import annotations

import json
import os

import duckdb

from ner_spark.goldens import (
    GOLDEN_DIR,
    GOLDEN_FIXED,
    GOLDEN_PER_SF,
    GOLDEN_SF_DIRS,
    register_goldens,
)


def test_every_declared_golden_is_committed():
    missing = [
        n for n in GOLDEN_FIXED
        if not os.path.exists(os.path.join(GOLDEN_DIR, f"{n}.parquet"))
    ]
    missing += [
        f"{n}.{tag}"
        for n in GOLDEN_PER_SF
        for tag in GOLDEN_SF_DIRS
        if not os.path.exists(os.path.join(GOLDEN_DIR, f"{n}.{tag}.parquet"))
    ]
    assert not missing, f"regenerate with tools/make_goldens.py: {missing}"


def test_sf_keys_match_live_testdata():
    with open(os.path.join(GOLDEN_DIR, "sf_keys.json")) as f:
        keys = json.load(f)
    assert set(keys) == set(GOLDEN_SF_DIRS)
    for tag, sf_dir in GOLDEN_SF_DIRS.items():
        n_live, w_live = duckdb.sql(
            f"SELECT COUNT(*), SUM(doc_id * n_chars) "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchone()
        assert [int(n_live), int(w_live)] == keys[tag], (
            f"{tag}: testdata fingerprint changed — regenerate goldens"
        )


def test_registration_attaches_all():
    attached = set(register_goldens())
    assert attached == set(GOLDEN_FIXED) | set(GOLDEN_PER_SF)


def test_goldens_are_nonempty_and_scalar_columned():
    """The driver's canonicalizer cannot hash list cells — every golden
    must be flat scalar columns, and non-empty (vacuous-pass guard)."""
    import pandas as pd

    files = [os.path.join(GOLDEN_DIR, f) for f in os.listdir(GOLDEN_DIR)
             if f.endswith(".parquet")]
    assert files
    for path in files:
        df = pd.read_parquet(path)
        assert len(df) > 0, path
        bad = [
            c for c in df.columns
            if df[c].map(lambda v: isinstance(v, (list, dict))).any()
        ]
        assert not bad, (path, bad)
