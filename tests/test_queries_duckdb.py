"""Local mirror of the driver's DuckDB differential harness: every
queries() entry with an oracle_sql() runs on both engines at sf0.001 and
must match on row count, column names, and (order-insensitively) values.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if s.dtype.kind in "iu":
            out[c] = s.astype("int64")
        elif s.dtype.kind == "f":
            out[c] = s.astype("float64")
        elif s.dtype == object and len(s) and isinstance(
            s.dropna().iloc[0] if s.notna().any() else None, (list, np.ndarray)
        ):
            out[c] = s.map(lambda v: tuple(v) if v is not None else None)
        elif str(s.dtype).startswith("datetime64"):
            out[c] = s.astype("datetime64[us]")
    key = out.columns.tolist()
    return out.sort_values(key, kind="mergesort", na_position="first").reset_index(
        drop=True
    )


def _values_match(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _q_names():
    from __spark_entry__ import oracle_sql, queries

    q = queries()
    return [n for n in q if n in oracle_sql()]


@pytest.mark.parametrize("name", _q_names())
def test_query_vs_duckdb(spark, name):
    from __spark_entry__ import oracle_sql, queries

    sdf = queries()[name](spark, SF_DIR).toPandas()
    con = _connect(SF_DIR)
    odf = con.sql(oracle_sql()[name]).df()
    con.close()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv))
            if not _values_match(x, y)
            and not (x is None and y is None)
            and not (pd.isna(x) is True and pd.isna(y) is True)
        ]
        assert not bad, f"{name}.{c}: first diffs {bad[:5]}"


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["entity_id", "aliases", "ner_type", "n_mentions"]
