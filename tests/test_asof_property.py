"""Property test (hypothesis): the union+window asof_join operator is
equivalent to pandas.merge_asof (direction='backward',
allow_exact_matches=True) on arbitrary generated tables.

Right-side (key, ts) pairs are deduplicated by the strategy — with
duplicate timestamps per key the 'latest' row is ill-defined in both
engines (the production queries aggregate to unique (key, ts) first for
exactly this reason, see queries_relational.join_asof).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ner_spark.operators.relational import asof_join

_row = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=0, max_value=100),    # ts
    st.integers(min_value=-1000, max_value=1000),  # val
)


def _expected(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
    return pd.merge_asof(
        lpdf.sort_values(["ts", "lid"], kind="mergesort"),
        rpdf.sort_values("ts", kind="mergesort"),
        on="ts",
        by="key",
        direction="backward",
        allow_exact_matches=True,
    )


def test_asof_join_matches_pandas_merge_asof(spark):
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        left=st.lists(_row, min_size=1, max_size=25),
        right=st.lists(_row, max_size=25),
    )
    def run(left, right):
        lpdf = pd.DataFrame(left, columns=["key", "ts", "lval"])
        lpdf["lid"] = range(len(lpdf))  # unique row id: left dups are legal
        rpdf = (
            pd.DataFrame(right, columns=["key", "ts", "rval"])
            .astype("int64")  # empty frames default to object dtype
            .drop_duplicates(["key", "ts"], keep="last")
            .reset_index(drop=True)
        )
        ldf = spark.createDataFrame(lpdf, "key int, ts int, lval int, lid int")
        rdf = (
            spark.createDataFrame(rpdf, "key int, ts int, rval int")
            if len(rpdf)
            else spark.createDataFrame([], "key int, ts int, rval int")
        )
        got = (
            asof_join(ldf, rdf, ["key"], "ts", "ts", ["rval"])
            .toPandas()
            .sort_values("lid", kind="mergesort")
            .reset_index(drop=True)
        )
        exp = (
            _expected(lpdf, rpdf)
            .sort_values("lid", kind="mergesort")
            .reset_index(drop=True)
        )
        pd.testing.assert_series_equal(
            got["rval"].astype("Float64"),
            exp["rval"].astype("Float64"),
            check_names=False,
        )

    run()
